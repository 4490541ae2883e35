"""Hilbert curve kernel: the locality properties the 100-TB file-layout
claim rests on, plus UDF/kernel agreement."""

import numpy as np

from geotile import udfs
from geotile.kernel.hilbert_np import hilbert_d2xy, hilbert_xy2d


def test_bijection_and_adjacency():
    # Full order-4 grid (16x16): d is a bijection onto 0..255 and every
    # consecutive pair of indices is grid-adjacent (unit step) — the
    # defining Hilbert property (Z-order jumps at every quadrant seam).
    o, n = 4, 16
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = hilbert_xy2d(xs.ravel(), ys.ravel(), o)
    assert sorted(d.tolist()) == list(range(n * n))
    pos = np.empty((n * n, 2), dtype=np.int64)
    pos[d] = np.stack([xs.ravel(), ys.ravel()], axis=1)
    steps = np.abs(np.diff(pos, axis=0)).sum(axis=1)
    assert (steps == 1).all()


def test_zorder_is_not_unit_step():
    # The comparison the q121 docstring makes: Morton/Z-order (the q109
    # quadkey linearization) takes non-unit jumps, so equal-width key
    # ranges can cover spatially disconnected cells.
    o, n = 4, 16
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    x, y = xs.ravel(), ys.ravel()
    z = np.zeros_like(x)
    for b in range(o):
        z |= ((x >> b) & 1) << (2 * b + 1)
        z |= ((y >> b) & 1) << (2 * b)
    pos = np.empty((n * n, 2), dtype=np.int64)
    pos[z] = np.stack([x, y], axis=1)
    steps = np.abs(np.diff(pos, axis=0)).sum(axis=1)
    assert steps.max() > 1


def test_round_trip_order8():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 256, 4096)
    y = rng.integers(0, 256, 4096)
    d = hilbert_xy2d(x, y, 8)
    assert d.min() >= 0 and d.max() < 256 * 256
    x2, y2 = hilbert_d2xy(d, 8)
    assert (x2 == x).all() and (y2 == y).all()


def test_udf_matches_kernel(spark):
    df = spark.range(2000).selectExpr(
        "id", "(id * 37) % 256 AS ix", "(id * 101 + 13) % 256 AS iy")
    out = (df.withColumn("hd", udfs.hilbert_udf(8)("ix", "iy"))
           .orderBy("id").toPandas())
    want = hilbert_xy2d(out["ix"].to_numpy(), out["iy"].to_numpy(), 8)
    assert (out["hd"].to_numpy() == want).all()
