"""S2-style hierarchical cell index (pure numpy).

Public algorithm: project the sphere onto a cube (6 faces), apply the
S2 quadratic s/t transform for near-uniform cell areas, quantize to a
2^level x 2^level lattice per face, and order cells along a Hilbert
curve so spatially-near cells get near ids (good for range pruning and
partition locality at scale).

This is "S2-style", not bit-compatible with Google's s2geometry (no
library in this environment to match against); the properties the
engine relies on — hierarchy by id prefix (``parent``), locality, and
lattice neighbor steps — hold.  Cell id layout: ``face * 4^level + d``
where ``d`` is the Hilbert index of (i, j) on the face.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30  # 6 * 4^30 < 2^63, fits int64


def _ll_to_xyz(lat: np.ndarray, lon: np.ndarray):
    lat_r = np.radians(lat)
    lon_r = np.radians(lon)
    cl = np.cos(lat_r)
    return cl * np.cos(lon_r), cl * np.sin(lon_r), np.sin(lat_r)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay,
                    np.where(ax >= az, np.where(x >= 0, 0, 3), np.where(z >= 0, 2, 5)),
                    np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)))
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (unum, uden, vnum, vden) in enumerate([
        (lambda: y, lambda: x, lambda: z, lambda: x),      # face 0: +x
        (lambda: -x, lambda: y, lambda: z, lambda: y),     # face 1: +y
        (lambda: -x, lambda: z, lambda: -y, lambda: z),    # face 2: +z
        (lambda: z, lambda: x, lambda: y, lambda: x),      # face 3: -x  (x<0)
        (lambda: z, lambda: y, lambda: -x, lambda: y),     # face 4: -y  (y<0)
        (lambda: -y, lambda: z, lambda: -x, lambda: z),    # face 5: -z  (z<0)
    ]):
        m = face == f
        if np.any(m):
            u[m] = (unum()[m] / uden()[m])
            v[m] = (vnum()[m] / vden()[m])
    return face.astype(np.int64), u, v


def _face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    specs = [
        (lambda u, v: (np.ones_like(u), u, v)),       # +x: (1, u, v)
        (lambda u, v: (-u, np.ones_like(u), v)),      # +y: (-u, 1, v)
        (lambda u, v: (-u, -v, np.ones_like(u))),     # +z: (-u, -v, 1)
        (lambda u, v: (-np.ones_like(u), -v, -u)),    # -x
        (lambda u, v: (v, -np.ones_like(u), -u)),     # -y
        (lambda u, v: (v, u, -np.ones_like(u))),      # -z
    ]
    for f, fn in enumerate(specs):
        m = face == f
        if np.any(m):
            xx, yy, zz = fn(u[m], v[m])
            x[m], y[m], z[m] = xx, yy, zz
    return x, y, z


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2 quadratic projection: near-uniform cell areas."""
    with np.errstate(invalid="ignore"):  # unused branch may sqrt(<0)
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(s >= 0.5, (4.0 * s * s - 1.0) / 3.0, (1.0 - 4.0 * (1.0 - s) ** 2) / 3.0)


def _hilbert_d(i: np.ndarray, j: np.ndarray, level: int) -> np.ndarray:
    """Vectorized Hilbert xy -> d (standard public algorithm)."""
    x = i.astype(np.int64).copy()
    y = j.astype(np.int64).copy()
    n = np.int64(1) << level
    d = np.zeros_like(x)
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        rot = ry == 0
        flip = rot & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(rot, y_f, x_f), np.where(rot, x_f, y_f)
        s >>= 1
    return d


def _hilbert_xy(d: np.ndarray, level: int):
    """Vectorized Hilbert d -> (x, y) (inverse of _hilbert_d)."""
    d = d.astype(np.int64)
    n = np.int64(1) << level
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    t = d.copy()
    s = np.int64(1)
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        rot = ry == 0
        flip = rot & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(rot, y_f, x_f), np.where(rot, x_f, y_f)
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y


def cell_ij(lat, lon, level: int):
    """(lat, lon) -> (face, i, j) lattice coordinates at ``level``."""
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    face, u, v = _xyz_to_face_uv(*_ll_to_xyz(lat, lon))
    n = 1 << level
    i = np.clip((_uv_to_st(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip((_uv_to_st(v) * n).astype(np.int64), 0, n - 1)
    return face, i, j


def cell_id(lat, lon, level: int = 10) -> np.ndarray:
    """(lat, lon) -> int64 cell id = face * 4^level + hilbert(i, j)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    face, i, j = cell_ij(lat, lon, level)
    return face * (np.int64(1) << (2 * level)) + _hilbert_d(i, j, level)


def parent(cell: np.ndarray, level: int, parent_level: int) -> np.ndarray:
    """Cell id at ``level`` -> ancestor id at ``parent_level``.

    Hilbert ids nest: the d-index of the parent is d >> 2*(dl)."""
    if parent_level > level:
        raise ValueError("parent_level must be <= level")
    cell = np.asarray(cell, dtype=np.int64)
    per_face = np.int64(1) << (2 * level)
    face = cell // per_face
    d = cell % per_face
    return face * (np.int64(1) << (2 * parent_level)) + (d >> (2 * (level - parent_level)))


def cell_center(cell, level: int):
    """Cell id -> (lat, lon) of the cell center."""
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    per_face = np.int64(1) << (2 * level)
    face = cell // per_face
    i, j = _hilbert_xy(cell % per_face, level)
    n = np.float64(1 << level)
    u = _st_to_uv((i.astype(np.float64) + 0.5) / n)
    v = _st_to_uv((j.astype(np.float64) + 0.5) / n)
    x, y, z = _face_uv_to_xyz(face, u, v)
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def neighbors(cell, level: int) -> list[np.ndarray]:
    """8-ring neighbors per cell id.  Lattice steps on the same face;
    steps that leave the face re-project through the sphere (stepping
    one cell width past the edge and re-encoding), which handles cube
    corners/edges robustly."""
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    per_face = np.int64(1) << (2 * level)
    face = cell // per_face
    i, j = _hilbert_xy(cell % per_face, level)
    n = 1 << level
    inv = 1.0 / n
    out = []
    for di, dj in [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]:
        ii = i + di
        jj = j + dj
        on_face = (ii >= 0) & (ii < n) & (jj >= 0) & (jj < n)
        res = np.empty(cell.shape[0], dtype=np.int64)
        if np.any(on_face):
            res[on_face] = face[on_face] * per_face + _hilbert_d(ii[on_face], jj[on_face], level)
        off = ~on_face
        if np.any(off):
            # step past the face edge in (s,t), re-project via xyz
            s = (i[off].astype(np.float64) + 0.5 + di) * inv
            t = (j[off].astype(np.float64) + 0.5 + dj) * inv
            u = _st_to_uv(np.clip(s, -0.5, 1.5))
            v = _st_to_uv(np.clip(t, -0.5, 1.5))
            x, y, z = _face_uv_to_xyz(face[off], u, v)
            lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
            lon = np.degrees(np.arctan2(y, x))
            res[off] = cell_id(lat, lon, level)
        out.append(res)
    return [np.unique(np.array([o[k] for o in out])) for k in range(cell.shape[0])]
