"""H3-style hexagonal hierarchical cell index (pure numpy).

The reference engine has a single rectangular geohash grid
(/root/reference/GeoHash/geohash.cpp); the north rule asks for an
"H3/S2-style" cell system.  `s2_np.py` provides the quad-tree /
Hilbert-curve family; this module provides the hexagonal family:

* pointy-top hexagonal binning in the Web-Mercator plane,
* an APERTURE-7 resolution hierarchy: each finer resolution shrinks the
  hex edge by 1/sqrt(7) and rotates the grid by atan(sqrt(3)/5)
  (~19.1066 deg) — the same aperture/rotation H3 uses,
* exact axial k-ring / disk neighborhoods (the kNN candidate generator
  hexes are better at than rectangles: all 6 neighbors are
  equidistant),
* parent/child via center-point containment (in ANY aperture-7 system
  child hexes only approximately nest; H3 makes the same compromise).

Differences from real H3, stated plainly: H3 projects onto an
icosahedron (20 gnomonic faces) so cell areas stay within ~2x globally;
this kernel uses a single Web-Mercator plane, so cells are
area-distorted toward high latitudes and there are no pentagon cells.
The API surface (cell id, k-ring, parent, boundary) matches what the
engine needs from an H3-style index; swapping in the icosahedral
projection changes only `_project`/`_unproject`.

Cell id layout (int64): [4 bits res | 30 bits biased q | 30 bits biased r].
All 64 bits are used, so ids at res >= 8 can be negative (the sign bit
belongs to the res field) — ids are opaque; pack/unpack round-trip via
two's complement and are pinned by tests at every resolution.
"""

from __future__ import annotations

import math

import numpy as np

# base hex edge length at res 0, in mercator radians (~1/4 of the map)
BASE_SIZE = math.pi / 2.0
APERTURE_ROT = math.atan(math.sqrt(3.0) / 5.0)  # aperture-7 rotation
SQRT7 = math.sqrt(7.0)
SQRT3 = math.sqrt(3.0)

# res 9 hexes have ~25 cm edges — the finest resolution whose axial
# coordinates provably fit the 30-bit packed range at every mercator
# corner (|q|,|r| <= ~(|x|+|y|)/size < 2^29 requires 7^res <= ~1.2e8)
MAX_RES = 9
_BIAS = 1 << 29
_COORD_MASK = (1 << 30) - 1
_MAX_LAT = 85.05112878  # Web-Mercator clamp


def _project(lat, lon):
    """lat/lon degrees -> Web-Mercator (x, y) in radians."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -_MAX_LAT, _MAX_LAT)
    lon = np.asarray(lon, dtype=np.float64)
    x = np.radians(lon)
    la = np.radians(lat)
    y = np.log(np.tan(np.pi / 4.0 + la / 2.0))
    return x, y


def _unproject(x, y):
    lon = np.degrees(np.asarray(x, dtype=np.float64))
    lat = np.degrees(2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64))) - np.pi / 2.0)
    return lat, lon


def _res_size(res: int) -> float:
    return BASE_SIZE / (SQRT7 ** res)


def _res_rot(res: int) -> float:
    return APERTURE_ROT * res


def _to_axial(x, y, res: int):
    """Rotated-plane fractional axial coordinates at ``res``."""
    th = _res_rot(res)
    c, s = math.cos(th), math.sin(th)
    xr = c * x + s * y
    yr = -s * x + c * y
    size = _res_size(res)
    q = (SQRT3 / 3.0 * xr - 1.0 / 3.0 * yr) / size
    r = (2.0 / 3.0 * yr) / size
    return q, r


def _from_axial(q, r, res: int):
    size = _res_size(res)
    xr = size * (SQRT3 * q + SQRT3 / 2.0 * r)
    yr = size * (1.5 * r)
    th = _res_rot(res)
    c, s = math.cos(th), math.sin(th)
    return c * xr - s * yr, s * xr + c * yr


def _cube_round(q, r):
    """Round fractional axial coords to the containing hex (cube round)."""
    s = -q - r
    rq = np.round(q)
    rr = np.round(r)
    rs = np.round(s)
    dq = np.abs(rq - q)
    dr = np.abs(rr - r)
    ds = np.abs(rs - s)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    rq = np.where(fix_q, -rr - rs, rq)
    rr = np.where(fix_r, -rq - rs, rr)
    return rq.astype(np.int64), rr.astype(np.int64)


def pack(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    q = np.asarray(q, dtype=np.int64) + _BIAS
    r = np.asarray(r, dtype=np.int64) + _BIAS
    if np.any((q < 0) | (q > _COORD_MASK) | (r < 0) | (r > _COORD_MASK)):
        raise ValueError("axial coordinate out of packable range")
    return (np.int64(res) << np.int64(60)) | (q << np.int64(30)) | r


def unpack(cell: np.ndarray):
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> np.int64(60)) & np.int64(0xF)
    q = ((cell >> np.int64(30)) & np.int64(_COORD_MASK)) - _BIAS
    r = (cell & np.int64(_COORD_MASK)) - _BIAS
    return res, q, r


def hex_cell(lat, lon, res: int) -> np.ndarray:
    """Vectorized: lat/lon degrees -> hex cell id at ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    x, y = _project(lat, lon)
    q, r = _to_axial(x, y, res)
    qi, ri = _cube_round(q, r)
    return pack(res, qi, ri)


def cell_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """Cell id -> (lat, lon) of the hex center."""
    res, q, r = unpack(cell)
    res0 = int(np.atleast_1d(res)[0])
    x, y = _from_axial(q.astype(np.float64), r.astype(np.float64), res0)
    return _unproject(x, y)


def cell_boundary(cell) -> tuple[np.ndarray, np.ndarray]:
    """Cell id -> (6, ) lat / lon vertex arrays (single cell)."""
    res, q, r = (int(v[0]) for v in map(np.atleast_1d, unpack(cell)))
    cx, cy = _from_axial(float(q), float(r), res)
    size = _res_size(res)
    th = _res_rot(res)
    ang = np.radians(np.arange(6) * 60.0 + 30.0) + th
    return _unproject(cx + size * np.cos(ang), cy + size * np.sin(ang))


_DIRS = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)],
                 dtype=np.int64)


def neighbors(cell) -> np.ndarray:
    """The 6 adjacent hexes (exact — no (max+min)-style surprises,
    cf. the reference's broken neighbor table geohash.cpp:250-291)."""
    res, q, r = (np.atleast_1d(v) for v in unpack(cell))
    res0 = int(res[0])
    qs = q[:, None] + _DIRS[None, :, 0]
    rs = r[:, None] + _DIRS[None, :, 1]
    return pack(res0, qs.ravel(), rs.ravel()).reshape(len(q), 6)


def ring(cell, k: int) -> np.ndarray:
    """Exact hex ring at distance k (6k cells; k=0 -> the cell itself)."""
    res, q0, r0 = (int(np.atleast_1d(v)[0]) for v in unpack(cell))
    if k == 0:
        return np.atleast_1d(np.asarray(cell, dtype=np.int64))
    out_q, out_r = [], []
    q, r = q0 + k * _DIRS[4][0], r0 + k * _DIRS[4][1]  # start at corner
    for d in range(6):
        for _ in range(k):
            out_q.append(q)
            out_r.append(r)
            q += _DIRS[d][0]
            r += _DIRS[d][1]
    return pack(res, np.asarray(out_q), np.asarray(out_r))


def disk(cell, k: int) -> np.ndarray:
    """All hexes within hex-distance k (1 + 3k(k+1) cells)."""
    parts = [ring(cell, i) for i in range(k + 1)]
    return np.unique(np.concatenate(parts))


def hex_distance(a, b) -> np.ndarray:
    """Exact hex grid distance between same-res cells."""
    _res_a, qa, ra = unpack(a)
    _res_b, qb, rb = unpack(b)
    dq = qa - qb
    dr = ra - rb
    return ((np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2).astype(np.int64)


def parent(cell) -> np.ndarray:
    """Containing cell one resolution coarser (center-point containment
    — aperture-7 children only approximately nest, same as H3)."""
    res, q, r = (np.atleast_1d(v) for v in unpack(cell))
    res0 = int(res[0])
    if res0 == 0:
        raise ValueError("res-0 cells have no parent")
    lat, lon = cell_center(cell)
    return hex_cell(lat, lon, res0 - 1)


def children(cell) -> np.ndarray:
    """Approximate child set at res+1: the child containing the center
    plus its 6 neighbors (the aperture-7 family)."""
    res = int(np.atleast_1d(unpack(cell)[0])[0])
    lat, lon = cell_center(cell)
    c = hex_cell(lat, lon, res + 1)
    return np.unique(np.concatenate([np.atleast_1d(c), neighbors(c).ravel()]))
