"""Core engine operators (DataFrame-first, shuffle-aware).

Each operator documents (a) the reference behavior it generalizes
(file:line into /root/reference) and (b) the physical plan shape it is
designed to produce at 100 TB scale: which side broadcasts, what gets
pushed down to the scan, where the (single) shuffle lands, and how skew
is handled.  Distance/PIP refinement predicates are ALWAYS post-join
filters, never join conditions — a UDF in the join condition forces a
broadcast-nested-loop join.

Plan-shape discipline (SURVEY.md §4):
  * candidate cells are literals or a broadcast side -> partition/row
    pruning on the cell column reaches the parquet scan;
  * filter-refine = cheap cell equi-join, then exact predicate;
  * hot cells (dense urban tiles) -> two-level salted aggregation and
    AQE skew-join splitting (enabled in session.py).
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StringType,
                               StructField, StructType)

from . import udfs
from .kernel import geohash_np as gh
from .kernel import tiles_np

DEFAULT_NCHARS = 5  # ~= the reference's 12-bit "500 m" grid (mapinfo.h:13)

# meters per degree of latitude on the reference sphere
_M_PER_DEG = math.pi * gh.EARTH_RADIUS_M / 180.0


# ---------------------------------------------------------------------------
# Cell assignment (the reference's implicit Encode-on-every-op, mapinfo.cpp:116)
# ---------------------------------------------------------------------------


def with_cell(df: DataFrame, lat: str = "lat", lon: str = "lon",
              nchars: int = DEFAULT_NCHARS, out: str = "geohash") -> DataFrame:
    """Materialize the canonical geohash cell column.  Narrow map — no
    shuffle; at scale this column is also the table's partition key."""
    return df.withColumn(out, udfs.geohash_udf(nchars)(F.col(lat), F.col(lon)))


def with_cell_ref(df: DataFrame, lat: str = "lat", lon: str = "lon",
                  nbits: int = gh.GEO_PRECISION_BITS, out: str = "geohash") -> DataFrame:
    """Reference-exact cell column (compat mode; geohash.cpp:148-215)."""
    return df.withColumn(out, udfs.geohash_ref_udf(nbits)(F.col(lat), F.col(lon)))


# ---------------------------------------------------------------------------
# Keyed state: upsert / delete (AddPos / DelPos, mapinfo.cpp:97-382)
# ---------------------------------------------------------------------------


def upsert_positions(state: DataFrame, updates: DataFrame, key: str = "msisdn",
                     ts: str = "ts") -> DataFrame:
    """Last-write-wins upsert keyed by ``key`` (AddPos semantics,
    mapinfo.cpp:151-215: newer row replaces older in place; the cell
    column is derived so 'posting migration' is implicit).

    Batch form: union + window dedup.  The one wide shuffle is the
    ``partitionBy(key)`` exchange — at scale the stored table is
    bucketed by ``key`` so MERGE INTO touches only matching buckets.
    Ties on ``ts`` break toward the update (src=1) then arbitrary-but-
    deterministic.
    """
    s = state.withColumn("_src", F.lit(0))
    u = updates.withColumn("_src", F.lit(1))
    unioned = s.unionByName(u, allowMissingColumns=False)
    w = Window.partitionBy(key).orderBy(F.col(ts).desc(), F.col("_src").desc())
    return (unioned.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_src"))


def upsert_positions_merge(state: DataFrame, updates: DataFrame, key: str = "msisdn",
                           ts: str = "ts") -> DataFrame:
    """MERGE-shaped last-write-wins upsert: full-outer join on the key,
    newer ``ts`` wins per column (both sides must be key-unique — run
    the window dedup on raw updates first if needed).

    This is the form bucketed storage accelerates: with state and
    updates co-bucketed (and sorted) by ``key``
    (:func:`geotile.table.write_bucketed`), the sort-merge join runs
    with ZERO Exchange — the window-dedup form cannot benefit because
    its Union breaks hash-partitioning (a key lands in two partitions).
    Verified by plan assertion in tests/test_pipeline.py.
    """
    s = state.alias("s")
    u = updates.alias("u")
    take_u = F.col(f"u.{ts}").isNotNull() & (
        F.col(f"s.{ts}").isNull() | (F.col(f"u.{ts}") >= F.col(f"s.{ts}")))
    cols = [c for c in state.columns if c != key]
    j = s.join(u, key, "full_outer")
    return j.select(key, *[
        F.when(take_u, F.col(f"u.{c}")).otherwise(F.col(f"s.{c}")).alias(c)
        for c in cols])


def delete_positions(state: DataFrame, keys: DataFrame, key: str = "msisdn") -> DataFrame:
    """DelPos (mapinfo.cpp:308-382) as a left anti-join.  ``keys`` is
    small in practice -> Catalyst broadcasts it; empty-cell GC is
    implicit (cells are derived)."""
    return state.join(F.broadcast(keys.select(key).distinct()), key, "left_anti")


# ---------------------------------------------------------------------------
# Radius search (FindPos, mapinfo.cpp:417-471): filter-refine spatial join
# ---------------------------------------------------------------------------


def radius_search_compat(positions: DataFrame, qlat: float, qlon: float,
                         radius_m: float, cell_col: str = "geohash",
                         lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Reference-exact radius query: candidate cells from the compat
    grid scan (0 or 1 cells, mapinfo.cpp:384-415), probe the cell
    'index' (here: a pushed-down ``IN`` literal filter on the cell
    partition column), refine with the reference distance formula
    (``dDistance >= dCurrDistance``, mapinfo.cpp:455).  Unordered,
    unlimited results — exactly FindPos."""
    cells = gh.candidate_cells_ref(qlat, qlon, radius_m)
    if not cells:
        return positions.where(F.lit(False))
    dist = udfs.distance_ref_udf().asNondeterministic()(
        F.lit(qlat), F.lit(qlon), F.col(lat), F.col(lon))
    pred = F.col(cell_col).isin(cells)
    pp = _prefix_pruning(positions, cells)
    if pp is not None:
        pred = pp & pred
    return (positions.where(pred)
            .withColumn("dist_m", dist)
            .where(F.col("dist_m") <= radius_m))


def _fit_cover_bbox(min_lat: float, max_lat: float, min_lon: float, max_lon: float,
                    nchars: int, max_cells: int = 1024) -> tuple[int, list[str]]:
    """Cover the bbox at the finest precision <= nchars whose cover fits
    in ``max_cells`` — bounds candidate-set size regardless of query
    radius (big radii fall back to coarse cells + prefix join)."""
    for n in range(nchars, 0, -1):
        try:
            cells = gh.cover_bbox(min_lat, max_lat, min_lon, max_lon, n, max_cells)
            return n, [str(c) for c in cells]
        except ValueError:
            continue
    raise AssertionError("1-char cover (32 cells) always fits")


def _fit_cover_radius(qlat: float, qlon: float, radius_m: float,
                      nchars: int, max_cells: int = 1024) -> tuple[int, list[str]]:
    return _fit_cover_bbox(*gh.bbox_correct(qlat, qlon, radius_m), nchars, max_cells)


PREFIX_COL = "gh2"  # stored tables partition by the 2-char cell prefix


def _prefix_pruning(df: DataFrame, cells: Sequence[str]) -> Column | None:
    """Partition-pruning predicate on the table's cell-prefix partition
    column (PartitionFilters at the scan), when applicable."""
    if PREFIX_COL not in df.columns or not cells:
        return None
    if min(len(c) for c in cells) < 2:
        return None  # cover coarser than the partition prefix
    return F.col(PREFIX_COL).isin(sorted({c[:2] for c in cells}))


def radius_search(positions: DataFrame, qlat: float, qlon: float, radius_m: float,
                  nchars: int = DEFAULT_NCHARS, cell_col: str = "geohash",
                  lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Production radius query: TRUE covering cell set (literal IN ->
    partition/row-group pruning at the scan) + haversine refine.  One
    narrow scan of the pruned cell partitions, zero shuffles.  Large
    radii automatically coarsen the cover precision (prefix IN on the
    cell column) so the literal list stays small."""
    n, cells = _fit_cover_radius(qlat, qlon, radius_m, nchars)
    pred = (F.col(cell_col).isin(cells) if n == nchars
            else F.substring(F.col(cell_col), 1, n).isin(cells))
    pp = _prefix_pruning(positions, cells)
    if pp is not None:
        pred = pp & pred
    # native-expression refine: stays inside whole-stage codegen
    dist = udfs.haversine_col(F.lit(qlat), F.lit(qlon), F.col(lat), F.col(lon))
    return (positions.where(pred)
            .withColumn("dist_m", dist)
            .where(F.col("dist_m") <= radius_m))


def radius_join(positions: DataFrame, queries, nchars: int = DEFAULT_NCHARS,
                cell_col: str = "geohash", lat: str = "lat", lon: str = "lon",
                qid: str = "query_id", qlat: str = "qlat", qlon: str = "qlon",
                radius: str = "radius_m") -> DataFrame:
    """Many-query radius join.  Queries are the SMALL side by contract
    (POI sets, dims) — their covers are computed driver-side, grouped by
    the (adaptive) cover precision, and broadcast; each precision group
    equi-joins the big positions table on the cell prefix; exact
    haversine refine (a NATIVE expression — no Python in the hot path)
    follows the join.  Positions are never shuffled, and covers stay
    <= ~1k cells per query regardless of radius.

    ``queries``: either a DataFrame with (qid, qlat, qlon, radius)
    columns, or — the zero-round-trip path for driver-side-constant
    query sets — a sequence of (query_id, qlat, qlon, radius_m) tuples.
    The query attributes ride inside the broadcast cover rows, so the
    whole join is ONE broadcast hash join + codegen filter."""
    spark = positions.sparkSession
    if isinstance(queries, DataFrame):
        qrows = [(int(r[qid]), float(r[qlat]), float(r[qlon]), float(r[radius]))
                 for r in queries.select(qid, qlat, qlon, radius).collect()]
    else:
        qrows = [(int(a), float(b), float(c), float(d)) for a, b, c, d in queries]
    by_n: dict[int, list[tuple]] = {}
    for q_id, q_la, q_lo, q_r in qrows:
        n, cells = _fit_cover_radius(q_la, q_lo, q_r, nchars)
        by_n.setdefault(n, []).extend((q_id, c, q_la, q_lo, q_r) for c in cells)
    parts = []
    for n, rows in by_n.items():
        # pandas -> Arrow conversion path: driver-side covers can reach
        # ~1k cells x many queries; tuple-list conversion is slow
        cov = spark.createDataFrame(
            pd.DataFrame(rows, columns=[qid, "cell", qlat, qlon, radius]),
            f"{qid} long, cell string, {qlat} double, {qlon} double, {radius} double")
        key = F.col(cell_col) if n == nchars else F.substring(F.col(cell_col), 1, n)
        side = positions
        pp = _prefix_pruning(positions, [r[1] for r in rows])
        if pp is not None:
            side = side.where(pp)
        parts.append(side.join(F.broadcast(cov), key == cov["cell"], "inner").drop("cell"))
    if not parts:
        return (positions.where(F.lit(False))
                .withColumn(qid, F.lit(None).cast("long"))
                .withColumn(qlat, F.lit(None).cast("double"))
                .withColumn(qlon, F.lit(None).cast("double"))
                .withColumn(radius, F.lit(None).cast("double"))
                .withColumn("dist_m", F.lit(None).cast("double")))
    joined = parts[0]
    for p in parts[1:]:
        joined = joined.unionByName(p)
    dist = udfs.haversine_col(F.col(qlat), F.col(qlon), F.col(lat), F.col(lon))
    return (joined.withColumn("dist_m", dist)
            .where(F.col("dist_m") <= F.col(radius)))


# ---------------------------------------------------------------------------
# kNN join (north_rule extension; absent from the reference — SURVEY §2.4)
# ---------------------------------------------------------------------------


def _min_cell_extent_m(nchars: int, abs_lat_deg: float) -> float:
    """Conservative minimum extent (m) of a cell at this precision near
    ``abs_lat_deg`` — the ring-expansion distance guarantee unit."""
    lat_bits, lon_bits = gh._axis_bits(nchars)
    h_m = 180.0 / (1 << lat_bits) * _M_PER_DEG
    w_m = 360.0 / (1 << lon_bits) * _M_PER_DEG * max(math.cos(math.radians(min(abs_lat_deg, 89.9))), 1e-6)
    return min(h_m, w_m)


def knn_join(positions: DataFrame, queries: Sequence[tuple], k: int,
             nchars: int | None = None, cell_nchars: int = DEFAULT_NCHARS,
             cell_col: str = "geohash", lat: str = "lat", lon: str = "lon",
             id_col: str | None = None, start_ring: int = 1,
             max_ring: int = 512, n_total: int | None = None) -> DataFrame:
    """k-nearest-neighbors of each query point via expanding cell rings.

    ``queries``: sequence of (query_id, qlat, qlon).  Algorithm (the
    scale path — candidates stay a pruned cell equi-join against the
    cell-partitioned positions table):

      1. pick the search precision from data density (unless ``nchars``
         is forced): the finest cell size whose ring-1 disk is expected
         to hold >= ~4k points under a uniform prior — dense tables
         search fine cells, sparse tables immediately search coarse
         ones instead of doubling through dozens of empty rings;
      2. per query, candidates = points in the Chebyshev disk of cells
         of radius ``ring`` around the query cell (a literal ``IN`` on
         the cell prefix -> parquet pruning, then a broadcast join to
         tag query ids);
      3. a query is RESOLVED when it has >= k candidates AND its k-th
         candidate distance <= ring * min_cell_extent (no closer point
         can live outside the disk);
      4. unresolved queries double ``ring`` and repeat (only the
         unresolved subset re-joins);
      5. final top-k per query by (distance, point id) — deterministic
         under ties.

    The reference has no top-k at all (FindPos returns unordered,
    mapinfo.cpp:455-458); this is the north_rule's kNN operator.
    """
    spark = positions.sparkSession
    if nchars is None:
        if n_total is None:
            n_total = positions.count()
        # finest n with (2r+1)^2 * n_total / 2^(5n) >= 4k at ring=start
        budget = max((2 * start_ring + 1) ** 2 * max(n_total, 1) / max(4 * k, 1), 2.0)
        nchars = max(1, min(cell_nchars, int(math.log2(budget) // 5)))
    unresolved = list(queries)
    ring = start_ring
    resolved_parts: list[DataFrame] = []
    order_cols = [F.col("dist_m")] + ([F.col(id_col)] if id_col else [F.col(lat), F.col(lon)])
    w = Window.partitionBy("query_id").orderBy(*order_cols)
    key = (F.col(cell_col) if nchars == cell_nchars
           else F.substring(F.col(cell_col), 1, nchars))

    while unresolved and ring <= max_ring:
        rows = []
        for q_id, q_lat, q_lon in unresolved:
            i_lat, i_lon, _ = gh.decode_ij(gh.encode(q_lat, q_lon, nchars))
            cells = gh.disk(int(i_lat[0]), int(i_lon[0]), nchars, ring)
            rows.extend((int(q_id), float(q_lat), float(q_lon), str(c)) for c in cells)
        cand_cells = spark.createDataFrame(
            pd.DataFrame(rows, columns=["query_id", "qlat", "qlon", "cell"]),
            "query_id long, qlat double, qlon double, cell string")
        all_cells = sorted({r[3] for r in rows})
        # literal IN prefilter reaches the parquet scan; skip it when the
        # list would bloat the plan (the broadcast join still filters)
        pruned = positions.where(key.isin(all_cells)) if len(all_cells) <= 4096 else positions
        pp = _prefix_pruning(positions, all_cells)
        if pp is not None:
            pruned = pruned.where(pp)
        cand = pruned.join(F.broadcast(cand_cells), key == cand_cells["cell"], "inner")
        cand = (cand.withColumn("dist_m", udfs.haversine_col(
                    F.col("qlat"), F.col("qlon"), F.col(lat), F.col(lon)))
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= k)
                .persist())
        # guarantee check per query: k-th distance within the disk's safe radius
        stats = {r["query_id"]: (r["n"], r["kth"]) for r in
                 cand.groupBy("query_id").agg(F.count("*").alias("n"),
                                              F.max("dist_m").alias("kth")).collect()}
        still = []
        done_ids = []
        for q_id, q_lat, q_lon in unresolved:
            n, kth = stats.get(int(q_id), (0, None))
            guarantee = ring * _min_cell_extent_m(nchars, abs(q_lat))
            if n >= k and kth is not None and kth <= guarantee:
                done_ids.append(int(q_id))
            else:
                still.append((q_id, q_lat, q_lon))
        if done_ids:
            resolved_parts.append(cand.where(F.col("query_id").isin(done_ids)))
        if still and ring >= max_ring:
            # out of rings: accept best-effort for the remainder
            rest = [int(q[0]) for q in still]
            resolved_parts.append(cand.where(F.col("query_id").isin(rest)))
            still = []
        unresolved = still
        ring *= 2

    if not resolved_parts:
        return spark.createDataFrame([], positions.schema.add("query_id", LongType())
                                     .add("dist_m", DoubleType()))
    out = resolved_parts[0]
    for p in resolved_parts[1:]:
        out = out.unionByName(p)
    return out.drop("cell", "_rn")


def knn_join_bulk(positions: DataFrame, queries: DataFrame, k: int,
                  nchars: int | None = None, cell_nchars: int = DEFAULT_NCHARS,
                  cell_col: str = "geohash", lat: str = "lat", lon: str = "lon",
                  qid: str = "query_id", qlat: str = "qlat", qlon: str = "qlon",
                  id_col: str | None = None, start_ring: int = 1,
                  max_ring: int = 64, n_total: int | None = None) -> DataFrame:
    """kNN join for LARGE query sets — the fully distributed
    formulation (cf. the driver-side-cover :func:`knn_join`, which is
    the right shape only when queries are a small POI set).

    Per round: each unresolved query EXPLODES into its Chebyshev-disk
    cells (a vectorized UDF — no per-query driver work), equi-joins the
    cell-keyed positions table (one shuffle; AQE splits hot-cell skew),
    exact haversine refine (native expression), windowed top-k per
    query.  A query is resolved when it has >= k candidates AND its
    k-th distance is within the disk's guarantee radius — both computed
    as COLUMN expressions, so the resolution test is distributed too;
    the driver only counts unresolved per round (bounded rounds, ring
    doubles each time).  This is the standard parallel kNN-join design
    (hash by cell, candidates from expanding neighborhoods, verify by
    distance bound) from the MapReduce kNN-join literature.
    """
    spark = positions.sparkSession
    if nchars is None:
        if n_total is None:
            n_total = positions.count()
        budget = max((2 * start_ring + 1) ** 2 * max(n_total, 1) / max(4 * k, 1), 2.0)
        nchars = max(1, min(cell_nchars, int(math.log2(budget) // 5)))
    key = (F.col(cell_col) if nchars == cell_nchars
           else F.substring(F.col(cell_col), 1, nchars))
    order_cols = [F.col("dist_m")] + ([F.col(id_col)] if id_col else [F.col(lat), F.col(lon)])
    w = Window.partitionBy(qid).orderBy(*order_cols)
    # conservative min cell extent (m) at the query's latitude, as a
    # native column: no closer point can live outside a disk of
    # ring * extent meters
    lat_bits, lon_bits = gh._axis_bits(nchars)
    h_m = 180.0 / (1 << lat_bits) * _M_PER_DEG
    w_deg = 360.0 / (1 << lon_bits) * _M_PER_DEG
    extent = F.least(F.lit(h_m),
                     F.lit(w_deg) * F.greatest(F.cos(F.radians(F.col(qlat))), F.lit(1e-6)))

    unresolved = queries.select(qid, qlat, qlon)
    resolved_parts: list[DataFrame] = []
    ring = start_ring
    while True:
        cand_cells = unresolved.withColumn(
            "cell", F.explode(udfs.disk_cells_udf(nchars, ring)(F.col(qlat), F.col(qlon))))
        cand = positions.join(cand_cells, key == cand_cells["cell"], "inner").drop("cell")
        dist = udfs.haversine_col(F.col(qlat), F.col(qlon), F.col(lat), F.col(lon))
        topk = (cand.withColumn("dist_m", dist)
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= k)
                .withColumn("_guarantee", F.lit(float(ring)) * extent)
                .persist())
        stats = (topk.groupBy(qid)
                 .agg(F.count("*").alias("_n"), F.max("dist_m").alias("_kth"),
                      F.first("_guarantee").alias("_g")))
        ok = stats.where((F.col("_n") >= k) & (F.col("_kth") <= F.col("_g"))).select(qid)
        resolved_parts.append(topk.join(ok, qid, "left_semi"))
        unresolved = unresolved.join(ok, qid, "left_anti")
        ring *= 2
        if ring > max_ring:
            # out of rings: best-effort for the remainder
            resolved_parts.append(topk.join(unresolved.select(qid), qid, "left_semi"))
            break
        if unresolved.isEmpty():  # the one driver-side action per round
            break
    out = resolved_parts[0]
    for p in resolved_parts[1:]:
        out = out.unionByName(p)
    return out.drop("_rn", "_guarantee")


# ---------------------------------------------------------------------------
# Point-in-polygon join (north_rule extension)
# ---------------------------------------------------------------------------


def pip_join(points: DataFrame, polygons: DataFrame, nchars: int = DEFAULT_NCHARS,
             cell_col: str = "geohash", lat: str = "lat", lon: str = "lon",
             poly_id: str = "poly_id", poly_lat: str = "poly_lat",
             poly_lon: str = "poly_lon") -> DataFrame:
    """Point-in-polygon as cover + equi-join + exact ray-cast refine.

    ``polygons``: (poly_id, poly_lat: array<double>, poly_lon:
    array<double>) — the small dim side by contract.  Bbox covers are
    computed driver-side at adaptive precision (bounded cell count even
    for continent-sized polygons), grouped by precision, broadcast, and
    prefix-equi-joined against the points' cell column (pruned scan, no
    shuffle of the big side); the exact ray-cast refine is a vectorized
    pandas UDF grouped per polygon inside each Arrow batch.
    """
    spark = points.sparkSession
    prows = polygons.select(poly_id, poly_lat, poly_lon).collect()
    by_n: dict[int, list[tuple[int, str]]] = {}
    for r in prows:
        plat = np.asarray(r[poly_lat], dtype=np.float64)
        plon = np.asarray(r[poly_lon], dtype=np.float64)
        n, cells = _fit_cover_bbox(plat.min(), plat.max(), plon.min(), plon.max(), nchars)
        by_n.setdefault(n, []).extend((int(r[poly_id]), c) for c in cells)
    parts = []
    for n, rows in by_n.items():
        cov = spark.createDataFrame(
            pd.DataFrame(rows, columns=[poly_id, "cell"]), f"{poly_id} long, cell string")
        key = F.col(cell_col) if n == nchars else F.substring(F.col(cell_col), 1, n)
        side = points
        pp = _prefix_pruning(points, [r[1] for r in rows])
        if pp is not None:
            side = side.where(pp)
        parts.append(side.join(F.broadcast(cov), key == cov["cell"], "inner").drop("cell"))
    if not parts:
        return points.where(F.lit(False)).withColumn(poly_id, F.lit(None).cast("long"))
    j = parts[0]
    for p in parts[1:]:
        j = j.unionByName(p)

    # polygon vertices travel in the UDF CLOSURE keyed by poly_id (the
    # dim side is small by contract) — the join never ships vertex
    # arrays per row, and the refine groups rows by poly_id with
    # np.unique: one vectorized ray-cast per polygon per batch, no
    # per-row Python.
    verts = {int(r[poly_id]): (np.asarray(r[poly_lat], dtype=np.float64),
                               np.asarray(r[poly_lon], dtype=np.float64))
             for r in prows}

    @F.pandas_udf("boolean")
    def _pip(pid: pd.Series, plat: pd.Series, plon: pd.Series) -> pd.Series:
        out = np.zeros(len(plat), dtype=bool)
        lat_np = plat.to_numpy(np.float64)
        lon_np = plon.to_numpy(np.float64)
        pid_np = pid.to_numpy(np.int64)
        for p_val in np.unique(pid_np):
            idxs = np.nonzero(pid_np == p_val)[0]
            v_la, v_lo = verts[int(p_val)]
            out[idxs] = gh.point_in_polygon(lat_np[idxs], lon_np[idxs], v_la, v_lo)
        return pd.Series(out)

    return (j.withColumn("_inside", _pip.asNondeterministic()(
                F.col(poly_id), F.col(lat), F.col(lon)))
            .where(F.col("_inside"))
            .drop("_inside"))


# ---------------------------------------------------------------------------
# Raster tile <-> vector cell mapping (north_rule extension)
# ---------------------------------------------------------------------------


def with_tile(df: DataFrame, lat: str = "lat", lon: str = "lon",
              zoom: int = 12, out: str = "tile") -> DataFrame:
    """Assign each point its Web-Mercator z/x/y raster tile key."""
    return df.withColumn(out, udfs.tile_udf(zoom)(F.col(lat), F.col(lon)))


def raster_vector_join(points: DataFrame, tiles: Iterable[tuple[int, int, int]],
                       nchars: int = DEFAULT_NCHARS, cell_col: str = "geohash") -> DataFrame:
    """Select the points falling in a set of raster tiles by mapping
    each tile to its covering geohash cells (driver-side, tiny) and
    equi-joining on the pruned cell column, then refining by the exact
    tile bbox.  ``tiles``: iterable of (zoom, x, y)."""
    spark = points.sparkSession
    by_n: dict[int, list[tuple]] = {}
    for z, x, y in tiles:
        mnla, mxla, mnlo, mxlo = tiles_np.tile_bounds(z, x, y)
        eps = 1e-12
        n, cells = _fit_cover_bbox(float(mnla), float(mxla) - eps,
                                   float(mnlo), float(mxlo) - eps, nchars)
        by_n.setdefault(n, []).extend(
            (f"{z}/{x}/{y}", c, float(mnla), float(mxla), float(mnlo), float(mxlo))
            for c in cells)
    schema = ("tile string, cell string, t_mnla double, t_mxla double, "
              "t_mnlo double, t_mxlo double")
    parts = []
    for n, rows in by_n.items():
        cover = spark.createDataFrame(
            pd.DataFrame(rows, columns=["tile", "cell", "t_mnla", "t_mxla",
                                        "t_mnlo", "t_mxlo"]), schema)
        key = F.col(cell_col) if n == nchars else F.substring(F.col(cell_col), 1, n)
        side = points
        pp = _prefix_pruning(points, [r[1] for r in rows])
        if pp is not None:
            side = side.where(pp)
        parts.append(side.join(F.broadcast(cover), key == cover["cell"], "inner"))
    j = parts[0]
    for p in parts[1:]:
        j = j.unionByName(p)
    return (j.where((F.col("lat") >= F.col("t_mnla")) & (F.col("lat") < F.col("t_mxla"))
                    & (F.col("lon") >= F.col("t_mnlo")) & (F.col("lon") < F.col("t_mxlo")))
            .drop("cell", "t_mnla", "t_mxla", "t_mnlo", "t_mxlo"))


# ---------------------------------------------------------------------------
# Metrics / skew helpers
# ---------------------------------------------------------------------------


def pool_state(positions: DataFrame, cell_col: str = "geohash") -> DataFrame:
    """GetPoolState (mapinfo.cpp:473-497) generalized: occupancy metrics
    as a tiny aggregate — total rows ('pos pool used'), distinct cells
    ('area pool used'), and rows-with-cell ('poslink used')."""
    return positions.agg(
        F.count("*").alias("pos_used"),
        F.count_distinct(F.col(cell_col)).alias("area_used"),
        F.count(F.col(cell_col)).alias("link_used"))


def salted_cell_counts(df: DataFrame, cell_col: str = "geohash", nsalt: int = 16) -> DataFrame:
    """Per-cell counts with two-level salted aggregation: map-side
    partial on (cell, salt) then final on cell — bounds any single
    reducer's share of a hot cell to ~1/nsalt.  Equivalent result to a
    plain groupBy(cell).count(); different (skew-safe) physical shape."""
    salted = df.withColumn("_salt", F.pmod(F.crc32(F.coalesce(F.col(cell_col), F.lit(""))), F.lit(nsalt)))
    level1 = salted.groupBy(cell_col, "_salt").agg(F.count("*").alias("_c"))
    return level1.groupBy(cell_col).agg(F.sum("_c").alias("n"))


def format_positions_json(df: DataFrame, key: str = "msisdn", lat: str = "lat",
                          lon: str = "lon", ts: str = "ts") -> DataFrame:
    """Compat JSON sink (main.cpp:29,345-382): rows formatted as
    {"Msisdn":"...","Latitude":"%f",...} with %f = 6 decimal places."""
    return df.select(F.format_string(
        '{"Msisdn":"%s","Latitude":"%f","Longitude":"%f","CurrTime":"%d"}',
        F.col(key), F.col(lat), F.col(lon), F.col(ts).cast("long")).alias("json"))
