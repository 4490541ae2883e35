"""Skew hardening for windowed top-N selection.

A per-group window (``row_number() <= N``) sorts each group on ONE
task; a pathological group — a boilerplate-spewing host in
textops.source_quota, a mega-city cell in
engine.cell_stratified_sample — serializes the stage at corpus scale.

``salted_topn`` pre-thins in parallel before the exact window: stage 1
ranks within ``(group, salt)`` — salt is a deterministic hash of the
ordering key mod ``salt_mod`` — and keeps N per salted subgroup.  The
true per-group top-N always survives stage 1 (every global top-N row
is, a fortiori, in its own subgroup's top-N), so stage 2's exact
window runs over at most ``salt_mod * N`` rows per group and returns
EXACTLY the same rows and ranks as the plain window
(test_salted_topn_identical_results).  Cost: one extra shuffle — worth
it only when a single group can exceed an executor's sort budget, so
callers enable it explicitly via ``salt_mod``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_topn(df: DataFrame, group_cols: Sequence[str],
                order_by: Sequence[Column], salt_on: Sequence[Column],
                n: int, salt_mod: int = 0,
                rank_col: str = "rank") -> DataFrame:
    """Keep the top ``n`` rows per group under ``order_by`` (must be a
    TOTAL order — include a unique tie-break), emitting their 1-based
    rank as ``rank_col``.  ``salt_mod > 1`` enables the two-level
    salted pre-thin; ``salt_on`` are the raw expressions hashed into
    the salt (use the ordering key so the salt is deterministic)."""
    if salt_mod and salt_mod > 1:
        salt = F.pmod(F.xxhash64(*salt_on), F.lit(salt_mod))
        w1 = Window.partitionBy(*group_cols, salt).orderBy(*order_by)
        df = (df.withColumn("_srn", F.row_number().over(w1))
              .where(F.col("_srn") <= n).drop("_srn"))
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (df.withColumn(rank_col, F.row_number().over(w))
            .where(F.col(rank_col) <= n))
