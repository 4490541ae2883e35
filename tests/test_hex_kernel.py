"""H3-style hexagonal kernel: identity, adjacency, rings, hierarchy."""

import numpy as np
import pytest

from geotile.kernel import hex_np


RNG = np.random.default_rng(7)
LAT = RNG.uniform(-80, 80, 500)
LON = RNG.uniform(-179, 179, 500)


def test_cell_round_trip_center():
    """Re-binning a cell's own center returns the same cell."""
    for res in (0, 3, 6, 9):
        cells = hex_np.hex_cell(LAT, LON, res)
        clat, clon = hex_np.cell_center(cells)
        again = hex_np.hex_cell(clat, clon, res)
        assert (again == cells).all()


def test_pack_unpack_round_trip():
    cells = hex_np.hex_cell(LAT, LON, 8)
    res, q, r = hex_np.unpack(cells)
    assert (res == 8).all()
    assert (hex_np.pack(8, q, r) == cells).all()


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


def test_points_fall_inside_their_cell_boundary():
    """Each point is within the circumradius of its cell's center (in
    the projected plane) — the binning is a true Voronoi partition."""
    res = 6
    cells = hex_np.hex_cell(LAT, LON, res)
    _res, q, r = hex_np.unpack(cells)
    x, y = hex_np._project(LAT, LON)
    cx, cy = hex_np._from_axial(q.astype(float), r.astype(float), res)
    dist = np.hypot(x - cx, y - cy)
    assert (dist <= hex_np._res_size(res) + 1e-12).all()


def test_nearest_center_property():
    """Cube rounding assigns each point to the NEAREST hex center —
    no neighbor's center is closer."""
    res = 5
    lat, lon = LAT[:100], LON[:100]
    cells = hex_np.hex_cell(lat, lon, res)
    x, y = hex_np._project(lat, lon)
    _res, q, r = hex_np.unpack(cells)
    cx, cy = hex_np._from_axial(q.astype(float), r.astype(float), res)
    own = np.hypot(x - cx, y - cy)
    nbrs = hex_np.neighbors(cells)  # (n, 6)
    _nr, nq, nr_ = hex_np.unpack(nbrs.ravel())
    nx, ny = hex_np._from_axial(nq.astype(float), nr_.astype(float), res)
    other = np.hypot(x.repeat(6) - nx, y.repeat(6) - ny).reshape(-1, 6)
    assert (own[:, None] <= other + 1e-12).all()


def test_parent_contains_child_center():
    cells = hex_np.hex_cell(LAT, LON, 7)
    par = hex_np.parent(cells)
    res, _q, _r = hex_np.unpack(par)
    assert (res == 6).all()
    # the child's center bins into its parent at the parent's res
    clat, clon = hex_np.cell_center(cells)
    assert (hex_np.hex_cell(clat, clon, 6) == par).all()


def test_children_cover_parent_center():
    c = hex_np.hex_cell(np.array([-33.8568]), np.array([151.2153]), 4)
    ch = hex_np.children(c)
    assert 5 <= len(ch) <= 7
    res, _q, _r = hex_np.unpack(ch)
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


def test_deterministic_across_calls():
    a = hex_np.hex_cell(LAT, LON, 8)
    b = hex_np.hex_cell(LAT.copy(), LON.copy(), 8)
    assert (a == b).all()
