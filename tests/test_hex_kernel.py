"""Icosahedral H3-style hexagonal kernel: identity, adjacency, rings,
hierarchy, and the global area-distortion bound."""

import numpy as np
import pytest

from geotile.kernel import hex_np


RNG = np.random.default_rng(7)
LAT = RNG.uniform(-89, 89, 500)
LON = RNG.uniform(-179, 179, 500)


def test_cell_round_trip_center():
    """Re-binning a cell's own center returns the same cell for every
    INTERIOR cell; the only exceptions are clipped face-boundary cells
    (whose nominal center legitimately lies on the neighboring face),
    a band that shrinks ~1/sqrt(7) per res."""
    for res, max_frac in ((1, 0.15), (3, 0.03), (6, 0.003), (9, 0.0005)):
        cells = hex_np.hex_cell(LAT, LON, res)
        clat, clon = hex_np.cell_center(cells)
        again = hex_np.hex_cell(clat, clon, res)
        bad = again != cells
        # every failure must be a face hop (clipped cell) — a same-face
        # mismatch would be a genuine rounding bug
        f1 = hex_np.unpack(cells)[1]
        f2 = hex_np.unpack(again)[1]
        assert not (bad & (f1 == f2)).any()
        assert bad.mean() <= max_frac


def test_pack_unpack_round_trip():
    for res in (1, 8, 15):
        cells = hex_np.hex_cell(LAT, LON, res)
        r, face, q, rr = hex_np.unpack(cells)
        assert (r == res).all()
        assert ((face >= 0) & (face <= 19)).all()
        assert (hex_np.pack(res, face, q, rr) == cells).all()
        assert (cells >= 0).all()          # bit 63 is always clear


def test_neighbors_are_distance_one_and_symmetric():
    c = hex_np.hex_cell(np.array([39.9286]), np.array([116.3895]), 6)
    nbrs = hex_np.neighbors(c).ravel()
    assert len(set(nbrs.tolist())) == 6
    assert (hex_np.hex_distance(np.repeat(c, 6), nbrs) == 1).all()
    # symmetry: c is a neighbor of each of its neighbors
    for nb in nbrs:
        back = hex_np.neighbors(np.array([nb])).ravel()
        assert int(c[0]) in set(back.tolist())


def test_ring_and_disk_sizes():
    c = hex_np.hex_cell(np.array([51.5074]), np.array([-0.1278]), 7)
    for k in (1, 2, 5):
        rk = hex_np.ring(c, k)
        assert len(rk) == 6 * k
        assert (hex_np.hex_distance(np.repeat(c, len(rk)), rk) == k).all()
    d = hex_np.disk(c, 3)
    assert len(d) == 1 + 3 * 3 * (3 + 1)  # 1 + 3k(k+1)


def _project_on_own_face(lat, lon):
    """Test helper: gnomonic plane coords of each point on its argmax
    face (the face hex_cell binned it to)."""
    vx, vy, vz = hex_np._unit_vectors(lat, lon)
    dots = (vx[:, None] * hex_np.FACE_CENTERS[None, :, 0]
            + vy[:, None] * hex_np.FACE_CENTERS[None, :, 1]
            + vz[:, None] * hex_np.FACE_CENTERS[None, :, 2])
    face = np.argmax(dots, axis=1)
    d = np.take_along_axis(dots, face[:, None], axis=1)[:, 0]
    e1, e2 = hex_np.FACE_E1[face], hex_np.FACE_E2[face]
    px = (vx * e1[:, 0] + vy * e1[:, 1] + vz * e1[:, 2]) / d
    py = (vx * e2[:, 0] + vy * e2[:, 1] + vz * e2[:, 2]) / d
    return face, px, py


def test_points_fall_inside_their_cell_boundary():
    """Each point is within the circumradius of its cell's center in
    the face plane — the in-plane binning is a true Voronoi partition."""
    res = 6
    cells = hex_np.hex_cell(LAT, LON, res)
    _res, face, q, r = hex_np.unpack(cells)
    pface, px, py = _project_on_own_face(LAT, LON)
    assert (pface == face).all()
    cx, cy = hex_np._from_axial(q.astype(float), r.astype(float), res)
    dist = np.hypot(px - cx, py - cy)
    assert (dist <= hex_np._res_size(res) + 1e-12).all()


def test_nearest_center_property():
    """Cube rounding assigns each point to the NEAREST hex center in
    its face plane — no same-face neighbor's center is closer."""
    res = 5
    lat, lon = LAT[:100], LON[:100]
    cells = hex_np.hex_cell(lat, lon, res)
    _pface, px, py = _project_on_own_face(lat, lon)
    _res, _f, q, r = hex_np.unpack(cells)
    cx, cy = hex_np._from_axial(q.astype(float), r.astype(float), res)
    own = np.hypot(px - cx, py - cy)
    nbrs = hex_np.neighbors(cells)  # (n, 6)
    _nr, _nf, nq, nr_ = hex_np.unpack(nbrs.ravel())
    nx, ny = hex_np._from_axial(nq.astype(float), nr_.astype(float), res)
    other = np.hypot(px.repeat(6) - nx, py.repeat(6) - ny).reshape(-1, 6)
    assert (own[:, None] <= other + 1e-12).all()


def test_parent_contains_child_center():
    cells = hex_np.hex_cell(LAT, LON, 7)
    par = hex_np.parent(cells)
    res = hex_np.unpack(par)[0]
    assert (res == 6).all()
    # the child's center bins into its parent at the parent's res
    clat, clon = hex_np.cell_center(cells)
    assert (hex_np.hex_cell(clat, clon, 6) == par).all()


def test_children_cover_parent_center():
    c = hex_np.hex_cell(np.array([-33.8568]), np.array([151.2153]), 4)
    ch = hex_np.children(c)
    assert 5 <= len(ch) <= 7
    res = hex_np.unpack(ch)[0]
    assert (res == 5).all()
    # center child's parent is c
    clat, clon = hex_np.cell_center(c)
    center_child = hex_np.hex_cell(clat, clon, 5)
    assert (hex_np.parent(center_child) == c).all()


def test_aperture_seven_area_ratio():
    """Successive resolutions shrink cell area by ~7x (edge by sqrt 7)."""
    a0 = hex_np._res_size(4) ** 2
    a1 = hex_np._res_size(5) ** 2
    assert a0 / a1 == pytest.approx(7.0)


def _spherical_polygon_area(lat_deg, lon_deg):
    """Girard spherical excess of the polygon (unit sphere steradians)."""
    la, lo = np.radians(lat_deg), np.radians(lon_deg)
    v = np.stack([np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo),
                  np.sin(la)], axis=1)
    n = len(v)
    ang = 0.0
    for i in range(n):
        a, b, c = v[(i - 1) % n], v[i], v[(i + 1) % n]
        t1 = a - b * (a @ b)
        t2 = c - b * (c @ b)
        ang += np.arccos(np.clip(
            (t1 @ t2) / np.sqrt((t1 @ t1) * (t2 @ t2)), -1.0, 1.0))
    return ang - (n - 2) * np.pi


def test_global_cell_area_ratio_within_two():
    """The icosahedral gnomonic projection bounds cell-area distortion
    globally: max/min spherical cell area <= (1 + tan^2(37.38 deg))^1.5
    ~ 1.99 (the face circumradius caps the gnomonic radius).  The old
    single-plane Web-Mercator kernel had UNBOUNDED ratio toward the
    poles; this pins the fix."""
    rng = np.random.default_rng(3)
    lat = rng.uniform(-89.9, 89.9, 2000)
    lon = rng.uniform(-180.0, 180.0, 2000)
    cells = np.unique(hex_np.hex_cell(lat, lon, 4))
    areas = np.array([_spherical_polygon_area(*hex_np.cell_boundary(
        np.array([c]))) for c in cells])
    ratio = areas.max() / areas.min()
    assert ratio < 2.0
    # and the sampled cells genuinely span the sphere (all 20 faces)
    assert len(np.unique(hex_np.unpack(cells)[1])) == 20


def test_deterministic_across_calls():
    a = hex_np.hex_cell(LAT, LON, 8)
    b = hex_np.hex_cell(LAT.copy(), LON.copy(), 8)
    assert (a == b).all()


def test_res_bounds_raise():
    with pytest.raises(ValueError):
        hex_np.hex_cell(LAT[:2], LON[:2], 0)
    with pytest.raises(ValueError):
        hex_np.hex_cell(LAT[:2], LON[:2], 16)
    c = hex_np.hex_cell(LAT[:2], LON[:2], hex_np.MIN_RES)
    with pytest.raises(ValueError):
        hex_np.parent(c)


def test_multi_res_udf_matches_kernel(spark):
    from pyspark.sql import functions as F

    from geotile import udfs

    df = spark.createDataFrame(
        [(float(la), float(lo)) for la, lo in zip(LAT[:50], LON[:50])],
        "lat double, lon double")
    got = df.select(udfs.hex_cells_multi_udf((3, 4, 5))(
        F.col("lat"), F.col("lon")).alias("cells")).collect()
    for row, la, lo in zip(got, LAT[:50], LON[:50]):
        for i, res in enumerate((3, 4, 5)):
            assert row["cells"][i] == int(hex_np.hex_cell(
                np.array([la]), np.array([lo]), res)[0])


# --------------------------------------------------------------------------
# cross-face geodesic disk (disk_geodesic)
# --------------------------------------------------------------------------


def _edge_vertex_center_points():
    """Adversarial query points for the cross-face disk: the first few
    icosahedron edge midpoints (two faces meet), one vertex direction
    (five faces meet), and one face center (interior control)."""
    c = hex_np.FACE_CENTERS
    pairs = [(i, j) for i in range(20) for j in range(i + 1, 20)
             if float(c[i] @ c[j]) > 0.7][:4]
    pts = [c[i] + c[j] for i, j in pairs]
    # an actual icosahedron vertex: five faces meet there (the golden-
    # ratio construction mirrors hex_np._icosahedron's first vertex)
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    pts.append(np.array([0.0, -1.0, -phi]))
    pts.append(c[0].copy())
    out = []
    for v in pts:
        v = v / np.sqrt((v * v).sum())
        out.append((float(np.degrees(np.arctan2(v[2], np.hypot(v[0], v[1])))),
                    float(np.degrees(np.arctan2(v[1], v[0])))))
    return out


def _reachable_cells_within(lat, lon, res, radius_rad):
    """Reference for COMPLETENESS: bin a dense spherical cap of sample
    points around the query and keep every cell points actually bin to
    whose center is within the radius.  Any owned cell disk_geodesic
    could miss shows up here."""
    v = np.array(hex_np._unit_vectors(np.array([lat]), np.array([lon]))).ravel()
    # orthonormal cap basis
    a = np.array([1.0, 0.0, 0.0]) if abs(v[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    t1 = np.cross(v, a)
    t1 /= np.linalg.norm(t1)
    t2 = np.cross(v, t1)
    # sample well past the radius so edge cells' interiors are hit
    rho = np.linspace(0.0, 1.6 * radius_rad, 60)
    ang = np.linspace(0.0, 2.0 * np.pi, 120, endpoint=False)
    rr, aa = np.meshgrid(rho, ang, indexing="ij")
    pts = (np.cos(rr.ravel())[:, None] * v[None, :]
           + np.sin(rr.ravel())[:, None] * (np.cos(aa.ravel())[:, None] * t1
                                            + np.sin(aa.ravel())[:, None] * t2))
    la = np.degrees(np.arctan2(pts[:, 2], np.hypot(pts[:, 0], pts[:, 1])))
    lo = np.degrees(np.arctan2(pts[:, 1], pts[:, 0]))
    cells = np.unique(hex_np.hex_cell(la, lo, res))
    cla, clo = hex_np.cell_center(cells)
    w = np.stack(hex_np._unit_vectors(cla, clo), axis=1)
    return set(cells[(w @ v) >= np.cos(radius_rad)].tolist())


def test_disk_geodesic_sound_and_complete_at_edges():
    radius = 2.5 * np.sqrt(3.0) * hex_np._res_size(2)
    for lat, lon in _edge_vertex_center_points():
        got = hex_np.disk_geodesic(lat, lon, 2, radius)
        # soundness: every returned center really is within the radius
        v = np.array(hex_np._unit_vectors(np.array([lat]), np.array([lon]))).ravel()
        cla, clo = hex_np.cell_center(got)
        w = np.stack(hex_np._unit_vectors(cla, clo), axis=1)
        assert ((w @ v) >= np.cos(radius)).all()
        # completeness: every bin-REACHABLE cell with center within the
        # radius is present (phantom extras from neighbor lattices are
        # allowed by contract; missing owned cells are not)
        assert _reachable_cells_within(lat, lon, 2, radius) <= set(got.tolist())


def test_disk_geodesic_spans_faces_at_edge():
    radius = 2.5 * np.sqrt(3.0) * hex_np._res_size(2)
    pts = _edge_vertex_center_points()
    for lat, lon in pts[:4]:          # edge midpoints: two faces meet
        reach = _reachable_cells_within(lat, lon, 2, radius)
        faces = set(hex_np.unpack(np.array(sorted(reach)))[1].tolist())
        assert len(faces) >= 2        # the face-local disk WOULD miss these
    vreach = _reachable_cells_within(*pts[4], 2, radius)
    vfaces = set(hex_np.unpack(np.array(sorted(vreach)))[1].tolist())
    assert len(vfaces) >= 3           # vertex: five faces meet
    # control: at a face center the query's own cell is present and owned
    own = int(hex_np.hex_cell(np.array([pts[5][0]]), np.array([pts[5][1]]), 2)[0])
    assert own in set(hex_np.disk_geodesic(*pts[5], 2, radius).tolist())


def test_disk_geodesic_covers_face_local_disk_interior():
    # at a face center the geodesic disk must contain the owner cell
    # and every center within range also found by axial rings
    lat, lon = _edge_vertex_center_points()[5]
    radius = 2.5 * np.sqrt(3.0) * hex_np._res_size(2)
    got = set(hex_np.disk_geodesic(lat, lon, 2, radius).tolist())
    cell = hex_np.hex_cell(np.array([lat]), np.array([lon]), 2)
    local = hex_np.disk(cell, 1)
    la, lo = hex_np.cell_center(local)
    v = np.array(hex_np._unit_vectors(np.array([lat]), np.array([lon]))).ravel()
    w = np.stack(hex_np._unit_vectors(la, lo), axis=1)
    within = (w @ v) >= np.cos(radius)
    assert set(local[within].tolist()) <= got
