"""Web-Mercator z/x/y raster tile math (pure numpy).

Standard slippy-map tiling (public formulas, cf. OpenStreetMap wiki
"Slippy map tilenames").  Used for the raster-tile <-> vector-cell
mapping operator: each tile maps to the set of geohash cells whose
bbox intersects the tile bbox, turning raster/vector joins into plain
cell equi-joins.
"""

from __future__ import annotations

import numpy as np

from . import geohash_np as gh

MAX_MERC_LAT = 85.05112878


def tile_xy(lat, lon, zoom: int):
    """(lat, lon) arrays -> integer tile (x, y) at ``zoom``."""
    lat = np.clip(np.atleast_1d(np.asarray(lat, dtype=np.float64)), -MAX_MERC_LAT, MAX_MERC_LAT)
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    n = 1 << zoom
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_r = np.radians(lat)
    y = np.floor((1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n).astype(np.int64)
    return np.clip(x, 0, n - 1), np.clip(y, 0, n - 1)


def tile_bounds(zoom: int, x: int, y: int):
    """Tile -> (min_lat, max_lat, min_lon, max_lon) degrees."""
    n = 1 << zoom
    min_lon = x / n * 360.0 - 180.0
    max_lon = (x + 1) / n * 360.0 - 180.0

    def _lat(yy):
        return np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * yy / n))))

    return _lat(y + 1), _lat(y), min_lon, max_lon


def tile_cells(zoom: int, x: int, y: int, nchars: int = 5, max_cells: int = 4096) -> np.ndarray:
    """Geohash cells at ``nchars`` intersecting the tile — the
    raster->vector mapping used by ``engine.raster_vector_join``."""
    mnla, mxla, mnlo, mxlo = tile_bounds(zoom, x, y)
    # shrink the upper edges epsilon-ward so we don't pull the adjacent
    # row/column of cells that merely touch the boundary
    eps = 1e-12
    return gh.cover_bbox(mnla, mxla - eps, mnlo, mxlo - eps, nchars, max_cells)
