"""H3-style hexagonal hierarchical cell index on an ICOSAHEDRON
(pure numpy).

The reference engine has a single rectangular geohash grid
(/root/reference/GeoHash/geohash.cpp); the north rule asks for an
"H3/S2-style" cell system.  `s2_np.py` provides the quad-tree /
Hilbert-curve family; this module provides the hexagonal family:

* the sphere is projected onto the 20 GNOMONIC faces of an icosahedron
  (the same base solid H3 uses), so cell areas stay within ~2x
  globally — the gnomonic area distortion is (1 + rho^2)^(3/2) and the
  face circumradius caps rho at tan(~37.38 deg) ~ 0.764, ratio ~1.99;
* pointy-top hexagonal binning in each face plane with an APERTURE-7
  resolution hierarchy: each finer resolution shrinks the hex edge by
  1/sqrt(7) and rotates the grid by atan(sqrt(3)/5) (~19.1066 deg) —
  the same aperture/rotation H3 uses;
* face-Voronoi ownership: a point belongs to its ARGMAX face by
  face-center dot product (ties: lowest face index), then to the hex
  its gnomonic projection cube-rounds to on that face's lattice — a
  true deterministic partition of the sphere.  Cells along a face edge
  are CLIPPED by the face boundary; a clipped cell's nominal center
  can lie on the neighboring face (like a crescent's centroid falling
  outside the crescent), so bin(center(cell)) == cell holds for all
  interior cells but not for the clipped band (~0.3% of cells at
  res 6, shrinking by 1/sqrt(7) per res — quantified by test);
* exact axial k-ring / disk neighborhoods WITHIN a face (all 6
  neighbors equidistant); axial neighbor/ring/distance queries across
  a face boundary are not defined (H3 solves this with its
  Class-II/III aligned grids and 12 pentagons; we trade that machinery
  for a SQL-replicable kernel) — CROSS-FACE neighborhoods go through
  ``disk_geodesic``, the center-distance disk that enumerates every
  nearby face's lattice and is gated under the q97 oracle;
* parent/child via center-point containment (in ANY aperture-7 system
  child hexes only approximately nest; H3 makes the same compromise).

Cell id layout (int64, always >= 0):
  [63] 0 | [62:59] res (4b) | [58:54] face (5b) |
  [53:27] q + 2^26 (27b) | [26:0] r + 2^26 (27b)
res 15 hexes have ~0.9 m edges; face-local axial coords provably fit
the 27-bit biased range at every gnomonic candidate with face-center
dot > 0.3 (|q| <= ~7.5 * 7^(15/2) < 2^26).  Ids are opaque;
pack/unpack round-trip is pinned by tests at every resolution.
"""

from __future__ import annotations

import math

import numpy as np

# base hex edge length at res 1 is BASE_SIZE/sqrt(7) (~0.126 rad);
# res 0 hexes (edge 1/3 rad) are comparable to a face and exist only
# as the hierarchy root — binning supports res in [MIN_RES, MAX_RES]
BASE_SIZE = 1.0 / 3.0
APERTURE_ROT = math.atan(math.sqrt(3.0) / 5.0)  # aperture-7 rotation
SQRT7 = math.sqrt(7.0)
SQRT3 = math.sqrt(3.0)

MIN_RES = 1
MAX_RES = 15
_BIAS = 1 << 26
_COORD_MASK = (1 << 27) - 1


def _icosahedron():
    """Deterministic icosahedron: 12 vertices from the golden ratio,
    20 faces enumerated in fixed (i < j < k) vertex order.  Returns
    (centers, e1, e2): unit face centers and an orthonormal tangent
    basis per face, shape (20, 3) each."""
    phi = (1.0 + math.sqrt(5.0)) / 2.0
    verts = []
    for a in (-1.0, 1.0):
        for b in (-phi, phi):
            verts += [(0.0, a, b), (a, b, 0.0), (b, 0.0, a)]
    v = np.asarray(verts, dtype=np.float64)
    v /= np.sqrt((v * v).sum(axis=1, keepdims=True))
    # faces = vertex triples that are mutually adjacent (chord of an
    # icosahedron edge: |vi - vj|^2 = 4/(phi*sqrt(5)) ~ 1.1056)
    edge2 = 4.0 / (phi * math.sqrt(5.0))
    d2 = ((v[:, None, :] - v[None, :, :]) ** 2).sum(axis=2)
    adj = np.abs(d2 - edge2) < 1e-9
    faces = [(i, j, k)
             for i in range(12) for j in range(i + 1, 12) if adj[i, j]
             for k in range(j + 1, 12) if adj[i, k] and adj[j, k]]
    assert len(faces) == 20
    tri = v[np.asarray(faces, dtype=np.int64)]          # (20, 3, 3)
    c = tri.sum(axis=1)
    c /= np.sqrt((c * c).sum(axis=1, keepdims=True))
    # tangent basis: e1 toward the face's first vertex, e2 = c x e1
    t = tri[:, 0, :] - c * (tri[:, 0, :] * c).sum(axis=1, keepdims=True)
    e1 = t / np.sqrt((t * t).sum(axis=1, keepdims=True))
    e2 = np.cross(c, e1)
    return c, e1, e2


FACE_CENTERS, FACE_E1, FACE_E2 = _icosahedron()


def _unit_vectors(lat, lon):
    """lat/lon degrees -> unit 3D vectors (component arrays).  The op
    sequence (cos/sin of radians, products) is mirrored literally by
    the DuckDB oracle — keep elementwise, no BLAS."""
    la = np.radians(np.asarray(lat, dtype=np.float64))
    lo = np.radians(np.asarray(lon, dtype=np.float64))
    cl = np.cos(la)
    return cl * np.cos(lo), cl * np.sin(lo), np.sin(la)


def _res_size(res: int) -> float:
    return BASE_SIZE / (SQRT7 ** res)


def _res_rot(res: int) -> float:
    return APERTURE_ROT * res


def _to_axial(x, y, res: int):
    """Rotated face-plane fractional axial coordinates at ``res``."""
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
    """Round fractional axial coords to the containing hex (cube round).

    Tie rule: floor(x + 0.5) (half-UP), NOT np.round — numpy rounds
    half-to-even while DuckDB's round() is half-away-from-zero, so an
    exact .5 fractional axial coordinate would bin to different cells
    cross-engine.  floor(x + 0.5) is one op, identical in numpy and
    SQL, and every oracle chain (q36/q78/q85/q97) mirrors it."""
    s = -q - r
    rq = np.floor(q + 0.5)
    rr = np.floor(r + 0.5)
    rs = np.floor(s + 0.5)
    dq = np.abs(rq - q)
    dr = np.abs(rr - r)
    ds = np.abs(rs - s)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    rq = np.where(fix_q, -rr - rs, rq)
    rr = np.where(fix_r, -rq - rs, rr)
    return rq.astype(np.int64), rr.astype(np.int64)


def pack(res: int, face, q, r) -> np.ndarray:
    face = np.asarray(face, dtype=np.int64)
    q = np.asarray(q, dtype=np.int64) + _BIAS
    r = np.asarray(r, dtype=np.int64) + _BIAS
    if np.any((q < 0) | (q > _COORD_MASK) | (r < 0) | (r > _COORD_MASK)):
        raise ValueError("axial coordinate out of packable range")
    if np.any((face < 0) | (face > 19)):
        raise ValueError("face out of range")
    return ((np.int64(res) << np.int64(59)) | (face << np.int64(54))
            | (q << np.int64(27)) | r)


def unpack(cell):
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> np.int64(59)) & np.int64(0xF)
    face = (cell >> np.int64(54)) & np.int64(0x1F)
    q = ((cell >> np.int64(27)) & np.int64(_COORD_MASK)) - _BIAS
    r = (cell & np.int64(_COORD_MASK)) - _BIAS
    return res, face, q, r


def _center3d(face, q, r, res: int):
    """Face-local axial ints -> UNNORMALIZED 3D center components.
    Op order (c + x*e1 + y*e2 per component) mirrors the oracle."""
    x, y = _from_axial(np.asarray(q, dtype=np.float64),
                       np.asarray(r, dtype=np.float64), res)
    c = FACE_CENTERS[face]
    e1 = FACE_E1[face]
    e2 = FACE_E2[face]
    ux = c[..., 0] + x * e1[..., 0] + y * e2[..., 0]
    uy = c[..., 1] + x * e1[..., 1] + y * e2[..., 1]
    uz = c[..., 2] + x * e1[..., 2] + y * e2[..., 2]
    return ux, uy, uz


def hex_cell(lat, lon, res: int) -> np.ndarray:
    """Vectorized: lat/lon degrees -> hex cell id at ``res``.

    Ownership rule (deterministic, SQL-replicable): ARGMAX face by
    face-center dot product (np.argmax — first/lowest face index on
    exact ties, mirrored by the oracle's ORDER BY dot DESC, face ASC),
    gnomonic projection onto that face, cube round on the rotated
    aperture-7 lattice."""
    if not MIN_RES <= res <= MAX_RES:
        raise ValueError(f"res must be in [{MIN_RES}, {MAX_RES}]")
    vx, vy, vz = (np.atleast_1d(a) for a in _unit_vectors(lat, lon))
    dots = (vx[:, None] * FACE_CENTERS[None, :, 0]
            + vy[:, None] * FACE_CENTERS[None, :, 1]
            + vz[:, None] * FACE_CENTERS[None, :, 2])
    face = np.argmax(dots, axis=1)
    d = np.take_along_axis(dots, face[:, None], axis=1)[:, 0]
    e1 = FACE_E1[face]
    e2 = FACE_E2[face]
    px = (vx * e1[:, 0] + vy * e1[:, 1] + vz * e1[:, 2]) / d
    py = (vx * e2[:, 0] + vy * e2[:, 1] + vz * e2[:, 2]) / d
    qf, rf = _to_axial(px, py, res)
    qi, ri = _cube_round(qf, rf)
    return pack(res, face, qi, ri)


def cell_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """Cell id -> (lat, lon) of the hex center (on the sphere)."""
    res, face, q, r = unpack(np.atleast_1d(cell))
    res0 = int(res[0])
    ux, uy, uz = _center3d(face, q, r, res0)
    nrm = np.sqrt(ux * ux + uy * uy + uz * uz)
    nx, ny, nz = ux / nrm, uy / nrm, uz / nrm
    lat = np.degrees(np.arctan2(nz, np.hypot(nx, ny)))
    lon = np.degrees(np.arctan2(ny, nx))
    return lat, lon


def cell_boundary(cell) -> tuple[np.ndarray, np.ndarray]:
    """Cell id -> (6,) lat / lon vertex arrays (single cell),
    gnomonic-plane hexagon corners lifted back to the sphere."""
    res, face, q, r = (int(np.atleast_1d(v)[0]) for v in unpack(cell))
    cx, cy = _from_axial(float(q), float(r), res)
    size = _res_size(res)
    th = _res_rot(res)
    ang = np.radians(np.arange(6) * 60.0 + 30.0) + th
    bx = cx + size * np.cos(ang)
    by = cy + size * np.sin(ang)
    c, e1, e2 = FACE_CENTERS[face], FACE_E1[face], FACE_E2[face]
    ux = c[0] + bx * e1[0] + by * e2[0]
    uy = c[1] + bx * e1[1] + by * e2[1]
    uz = c[2] + bx * e1[2] + by * e2[2]
    nrm = np.sqrt(ux * ux + uy * uy + uz * uz)
    nx, ny, nz = ux / nrm, uy / nrm, uz / nrm
    lat = np.degrees(np.arctan2(nz, np.hypot(nx, ny)))
    lon = np.degrees(np.arctan2(ny, nx))
    return lat, lon


_DIRS = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)],
                 dtype=np.int64)


def neighbors(cell) -> np.ndarray:
    """The 6 adjacent hexes on the SAME FACE (exact — no
    (max+min)-style surprises, cf. the reference's broken neighbor
    table geohash.cpp:250-291).  Face-local: see the module docstring
    for the cross-face caveat."""
    res, face, q, r = (np.atleast_1d(v) for v in unpack(cell))
    res0 = int(res[0])
    qs = q[:, None] + _DIRS[None, :, 0]
    rs = r[:, None] + _DIRS[None, :, 1]
    fs = np.repeat(face[:, None], 6, axis=1)
    return pack(res0, fs.ravel(), qs.ravel(), rs.ravel()).reshape(len(q), 6)


def ring(cell, k: int) -> np.ndarray:
    """Exact hex ring at distance k on the cell's face (6k cells;
    k=0 -> the cell itself)."""
    res, face, q0, r0 = (int(np.atleast_1d(v)[0]) for v in unpack(cell))
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
    f = np.full(len(out_q), face, dtype=np.int64)
    return pack(res, f, np.asarray(out_q), np.asarray(out_r))


def disk(cell, k: int) -> np.ndarray:
    """All hexes within hex-distance k on the cell's face
    (1 + 3k(k+1) cells).  Face-local: a disk near one of the 30
    icosahedron edges misses the neighbor face's cells — use
    ``disk_geodesic`` for the cross-face neighborhood."""
    parts = [ring(cell, i) for i in range(k + 1)]
    return np.unique(np.concatenate(parts))


def disk_geodesic(lat: float, lon: float, res: int, radius_rad: float,
                  dmin: float = 0.70, margin: int | None = None) -> np.ndarray:
    """CROSS-FACE geodesic disk: every cell at ``res`` — on ANY face —
    whose CENTER lies within great-circle angle ``radius_rad`` of the
    point.  This closes the face-local hole in ``disk``/``ring``: near
    an icosahedron edge the axial k-ring silently loses the neighbor
    face's cells, while this enumerates a candidate lattice box on
    EVERY face whose center-dot with the point exceeds ``dmin`` and
    keeps candidates by exact center distance.  Deterministic and
    SQL-replicable op for op (the q97 oracle mirrors each step);
    equality with a full-lattice brute force at edge/vertex points is
    pinned by tests.

    A face's lattice extends past its owned (Voronoi) region, so the
    result can include cells whose id no point ever bins to; membership
    is a pure center-distance predicate and those ids simply never
    match — harmless for disk-search joins, counted deterministically
    by both engines.

    Margin derivation (validated by the brute-force test): the
    gnomonic image of the spherical cap stretches by at most
    sec^2(theta_max + rho) < 2 inside the dmin >= 0.7 guard
    (theta_max = acos(0.7) ~ 45.6 deg only at the guard boundary,
    where the cap is already clipped), and one planar unit moves axial
    coordinates by at most (sqrt3/3 + 1/3)/size < 0.92/size, so
    ``2 * radius / size + 1`` covers both |dq| and |dr| after the
    cube-round +-1.  Single point; returns sorted unique cell ids."""
    if not MIN_RES <= res <= MAX_RES:
        raise ValueError(f"res must be in [{MIN_RES}, {MAX_RES}]")
    size = _res_size(res)
    if margin is None:
        margin = int(np.ceil(2.0 * radius_rad / size)) + 1
    vx, vy, vz = (float(np.atleast_1d(a)[0]) for a in _unit_vectors(lat, lon))
    cosr = math.cos(radius_rad)
    dq = np.arange(-margin, margin + 1, dtype=np.int64)
    dqg, drg = (a.ravel() for a in np.meshgrid(dq, dq, indexing="ij"))
    out = []
    for f in range(20):
        c, e1, e2 = FACE_CENTERS[f], FACE_E1[f], FACE_E2[f]
        dot = vx * c[0] + vy * c[1] + vz * c[2]
        if not dot > dmin:
            continue
        px = (vx * e1[0] + vy * e1[1] + vz * e1[2]) / dot
        py = (vx * e2[0] + vy * e2[1] + vz * e2[2]) / dot
        qf, rf = _to_axial(px, py, res)
        q0, r0 = _cube_round(np.asarray([qf]), np.asarray([rf]))
        qa = q0[0] + dqg
        ra = r0[0] + drg
        ux, uy, uz = _center3d(np.full(qa.shape, f, dtype=np.int64), qa, ra, res)
        nrm = np.sqrt(ux * ux + uy * uy + uz * uz)
        dd = (ux * vx + uy * vy + uz * vz) / nrm
        keep = dd >= cosr
        if keep.any():
            out.append(pack(res, np.full(int(keep.sum()), f, dtype=np.int64),
                            qa[keep], ra[keep]))
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(out))


def hex_distance(a, b) -> np.ndarray:
    """Exact hex grid distance between same-res SAME-FACE cells
    (cross-face pairs raise — the axial metric is face-local)."""
    _res_a, fa, qa, ra = unpack(a)
    _res_b, fb, qb, rb = unpack(b)
    if np.any(np.atleast_1d(fa) != np.atleast_1d(fb)):
        raise ValueError("hex_distance requires same-face cells")
    dq = qa - qb
    dr = ra - rb
    return ((np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2).astype(np.int64)


def parent(cell) -> np.ndarray:
    """Containing cell one resolution coarser (center-point containment
    — aperture-7 children only approximately nest, same as H3)."""
    res = int(np.atleast_1d(unpack(cell)[0])[0])
    if res <= MIN_RES:
        raise ValueError(f"res-{MIN_RES} cells have no parent")
    lat, lon = cell_center(cell)
    return hex_cell(lat, lon, res - 1)


def children(cell) -> np.ndarray:
    """Approximate child set at res+1: the child containing the center
    plus its 6 same-face neighbors (the aperture-7 family)."""
    res = int(np.atleast_1d(unpack(cell)[0])[0])
    lat, lon = cell_center(cell)
    c = hex_cell(lat, lon, res + 1)
    return np.unique(np.concatenate([np.atleast_1d(c), neighbors(c).ravel()]))
