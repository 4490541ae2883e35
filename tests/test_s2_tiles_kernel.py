"""S2-style cell kernel + Web-Mercator tile kernel unit tests (pure
numpy — no Spark session)."""

import numpy as np
import pytest

from geotile.kernel import geohash_np as gh
from geotile.kernel import s2_np, tiles_np

RNG = np.random.default_rng(13)
LAT = RNG.uniform(-85.0, 85.0, 400)
LON = RNG.uniform(-179.0, 179.0, 400)


# ---------------------------------------------------------------------------
# S2-style cells
# ---------------------------------------------------------------------------


def test_s2_center_round_trip():
    """Re-encoding a cell's own center returns the same cell."""
    for level in (2, 6, 10, 14):
        cells = s2_np.cell_id(LAT, LON, level)
        clat, clon = s2_np.cell_center(cells, level)
        assert (s2_np.cell_id(clat, clon, level) == cells).all()


def test_s2_parent_nesting():
    """Hilbert ids nest: parent(cell) == direct encode at the coarser
    level for the CELL CENTER (center containment is exact — the
    Hilbert prefix IS the ancestor)."""
    cells = s2_np.cell_id(LAT, LON, 12)
    for pl in (10, 8, 4):
        par = s2_np.parent(cells, 12, pl)
        clat, clon = s2_np.cell_center(cells, 12)
        assert (s2_np.cell_id(clat, clon, pl) == par).all()


def test_s2_parent_consistent_with_point():
    """A point's cell at a coarse level equals the parent of its cell
    at a fine level (quad-tree nesting of the st-lattice)."""
    fine = s2_np.cell_id(LAT, LON, 12)
    coarse = s2_np.cell_id(LAT, LON, 7)
    assert (s2_np.parent(fine, 12, 7) == coarse).all()


def test_s2_hilbert_bijection():
    level = 6
    n = 1 << level
    ij = np.arange(n * n, dtype=np.int64)
    i = ij // n
    j = ij % n
    d = s2_np._hilbert_d(i, j, level)
    assert len(np.unique(d)) == n * n  # bijective
    i2, j2 = s2_np._hilbert_xy(d, level)
    assert (i2 == i).all() and (j2 == j).all()


def test_s2_hilbert_locality():
    """Consecutive Hilbert indices are lattice-adjacent (the property
    that makes range-partitioning by cell id spatially local)."""
    level = 6
    n = 1 << level
    d = np.arange(n * n, dtype=np.int64)
    i, j = s2_np._hilbert_xy(d, level)
    step = np.abs(np.diff(i)) + np.abs(np.diff(j))
    assert (step == 1).all()


def test_s2_neighbors_contain_nudged_points():
    level = 10
    pts_lat = np.array([39.9286, -33.8568, 51.5074, 0.6, -0.4])
    pts_lon = np.array([116.3895, 151.2153, -0.1278, 0.4, 179.2])
    cells = s2_np.cell_id(pts_lat, pts_lon, level)
    nbrs = s2_np.neighbors(cells, level)
    # nudge by ~1/4 cell: stays within self + 8-ring
    clat, clon = s2_np.cell_center(cells, level)
    eps = 90.0 / (1 << level) / 4.0
    for k in range(len(pts_lat)):
        allowed = set(nbrs[k].tolist()) | {int(cells[k])}
        for dla in (-eps, 0, eps):
            for dlo in (-eps, 0, eps):
                c = s2_np.cell_id(np.array([pts_lat[k] + dla]),
                                  np.array([pts_lon[k] + dlo]), level)
                assert int(c[0]) in allowed


def test_s2_faces_cover_sphere():
    faces = s2_np.cell_id(LAT, LON, 0)
    assert set(faces.tolist()) <= set(range(6))
    # all six faces appear over a wide sample
    assert len(set(faces.tolist())) == 6


# ---------------------------------------------------------------------------
# Web-Mercator tiles
# ---------------------------------------------------------------------------


def test_tile_round_trip_containment():
    for zoom in (3, 8, 12):
        x, y = tiles_np.tile_xy(LAT, LON, zoom)
        for k in range(0, len(LAT), 40):
            mnla, mxla, mnlo, mxlo = tiles_np.tile_bounds(zoom, int(x[k]), int(y[k]))
            assert mnlo <= LON[k] < mxlo + 1e-9
            la = np.clip(LAT[k], -tiles_np.MAX_MERC_LAT, tiles_np.MAX_MERC_LAT)
            assert mnla - 1e-9 <= la <= mxla + 1e-9


def test_tile_bounds_tile_cells_consistency():
    """Every point in a tile falls in one of the tile's covering cells."""
    zoom = 9
    qx, qy = tiles_np.tile_xy(np.array([39.9286]), np.array([116.3895]), zoom)
    z, x, y = zoom, int(qx[0]), int(qy[0])
    cells = set(str(c) for c in tiles_np.tile_cells(z, x, y, nchars=5))
    mnla, mxla, mnlo, mxlo = tiles_np.tile_bounds(z, x, y)
    rng = np.random.default_rng(5)
    la = rng.uniform(mnla, mxla - 1e-9, 200)
    lo = rng.uniform(mnlo, mxlo - 1e-9, 200)
    got = gh.encode(la, lo, 5)
    assert set(got.tolist()) <= cells


def test_tile_known_value():
    """Spot-check against the public slippy-map formula examples."""
    x, y = tiles_np.tile_xy(np.array([0.0]), np.array([0.0]), 1)
    assert (int(x[0]), int(y[0])) == (1, 1)
    x, y = tiles_np.tile_xy(np.array([85.0]), np.array([-179.9]), 2)
    assert (int(x[0]), int(y[0])) == (0, 0)
