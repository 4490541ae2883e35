"""Hilbert space-filling-curve index — pure-numpy vectorized kernel.

Why Hilbert on top of the existing Z-order surface (quadkey, q109):
Z-order (Morton) has unbounded jumps between consecutive keys at
quadrant boundaries, so a contiguous key range can cover a spatially
disconnected region; the Hilbert curve is the locality-optimal
space-filling curve — EVERY pair of consecutive indices is a
grid-adjacent cell pair (unit step, proven by
tests/test_hilbert.py::test_bijection_and_adjacency).  At 100 TB this
is the file-layout primitive: cluster/sort parquet files by
``hilbert_d`` and any rectangle query touches O(perimeter) key ranges
instead of Z-order's fragmented range set, which turns min/max column
stats into tight file-skipping bounds.

Algorithm: the classic xy2d quadrant-rotation walk (public domain,
as on the Wikipedia "Hilbert curve" page), vectorized over numpy
int64 arrays.  ``(x & s) > 0`` is computed as ``(x // s) % 2`` so the
DuckDB oracle can replicate the identical arithmetic without bit
operators (s is always a power of two) — see
``__spark_entry__._hilbert_cte_sql`` which unrolls the same loop into
chained CTE projections (linear, no expression blow-up).

Everything is exact int64 arithmetic end to end: no floats, no
cross-engine rounding exposure.
"""
from __future__ import annotations

import numpy as np

__all__ = ["hilbert_xy2d", "hilbert_d2xy", "hilbert_ranges"]


def hilbert_xy2d(ix, iy, order: int = 8) -> np.ndarray:
    """Map integer grid coordinates to the Hilbert index.

    ix, iy: array-like of int in [0, 2**order); returns int64 d in
    [0, 4**order).  Vectorized; ~O(order) passes over the batch.
    """
    x = np.asarray(ix, dtype=np.int64).copy()
    y = np.asarray(iy, dtype=np.int64).copy()
    n = np.int64(1) << order
    d = np.zeros_like(x)
    s = int(n) >> 1
    while s > 0:
        rx = ((x // s) % 2).astype(np.int64)
        ry = ((y // s) % 2).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate the quadrant: reflect when (rx=1, ry=0), then swap axes
        flip = (ry == 0) & (rx == 1)
        xf = np.where(flip, n - 1 - x, x)
        yf = np.where(flip, n - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        s >>= 1
    return d


def hilbert_ranges(ix0: int, ix1: int, iy0: int, iy1: int,
                   order: int = 8) -> list[tuple[int, int]]:
    """Contiguous Hilbert-index ranges covering the inclusive grid
    rectangle [ix0..ix1] x [iy0..iy1] — the query-side half of the
    locality claim: a rectangle maps to FEW contiguous key ranges
    (O(perimeter) for Hilbert vs a fragmented set for Z-order;
    quantified in tests/test_hilbert.py::test_ranges_beat_zorder).

    Driver-side planning helper: the rectangle is a query literal
    (viewport, geofence bbox), so the cell enumeration is bounded by
    the query area, never the data.  Returns inclusive (lo, hi)
    pairs, sorted."""
    if not (0 <= ix0 <= ix1 < (1 << order) and 0 <= iy0 <= iy1 < (1 << order)):
        raise ValueError("rectangle out of grid bounds")
    xs, ys = np.meshgrid(np.arange(ix0, ix1 + 1), np.arange(iy0, iy1 + 1),
                         indexing="ij")
    d = np.sort(hilbert_xy2d(xs.ravel(), ys.ravel(), order))
    cuts = np.flatnonzero(np.diff(d) > 1)
    lows = np.concatenate(([d[0]], d[cuts + 1]))
    highs = np.concatenate((d[cuts], [d[-1]]))
    return [(int(a), int(b)) for a, b in zip(lows, highs)]


def hilbert_d2xy(d, order: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Inverse map (index -> grid coordinates); used by the round-trip
    property test, not on any query path."""
    t = np.asarray(d, dtype=np.int64).copy()
    n = np.int64(1) << order
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    s = 1
    while s < int(n):
        rx = ((t // 2) % 2).astype(np.int64)
        ry = (t % 2).astype(np.int64) ^ rx
        # rotate back
        flip = (ry == 0) & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        x = x + s * rx
        y = y + s * ry
        t //= 4
        s <<= 1
    return x, y
