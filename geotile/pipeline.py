"""End-to-end pages pipeline: synth/ingest -> extract -> mentions ->
tile assignment -> spatial join -> cell rollup, every stage committed
through the manifest layer so a killed run resumes mid-job.

``spark-submit --py-files geotile.zip geotile/pipeline.py --n 1000000``
is the cluster entry; the same function runs in-process for tests and
bench.  Stage graph (each stage = one manifest-committed table):

  pages      synth_pages (or external ingest)        partition: none
  points     extract + mentions explode + cells      partition: gh2 (2-char prefix)
  joined     radius join vs the city POI set         partition: none (result)
  rollup     per-cell counts (salted aggregation)    partition: none
  store      latest point per url via MERGE INTO     bucketed catalog table (url)

At 100 TB the 'points' table is the big one; it is written partitioned
by the 2-char cell prefix so every later spatial join prunes partitions
at the scan.  Hot prefixes (Zipf cities) are handled by AQE skew
splitting + the salted rollup.
"""

from __future__ import annotations

import argparse
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import engine, extract, synth, table


def poi_queries(spark: SparkSession, radius_m: float = 50000.0) -> DataFrame:
    rows = [(i, name, lat, lon, radius_m) for i, (name, lat, lon) in enumerate(synth.CITIES)]
    return spark.createDataFrame(
        rows, "query_id long, poi string, qlat double, qlon double, radius_m double")


def stage_pages(spark: SparkSession, workdir: str, n: int, partitions: int | None = None) -> str:
    path = os.path.join(workdir, "pages")
    params = {"n": n}
    if not table.is_complete(path, params=params):
        # fixed fan-out independent of the session's core count: the
        # stored table's file/row-group layout (hence every downstream
        # scan's split balance) must not depend on the parallelism the
        # ingest happened to run at
        if partitions is None:
            partitions = int(os.environ.get("SPARK_GRAFT_PAGES_PARTITIONS", "16"))
        df = synth.synth_pages(spark, n, partitions)
        table.write_stage(df, path, parents=(), params=params)
    return path


POINTS_SCHEMA = ("url string, warc_ts timestamp, lat double, lon double, "
                 "geohash string, gh2 string, s2_cell long, tile string")


def _points_batches(nchars: int):
    """Fused pages -> points transform: html re-extraction + byte-
    identical check + mention parse + geohash/S2/tile assignment in ONE
    Arrow pass (five separate pandas-UDF stages would cross the JVM <->
    Python boundary five times; this crosses once)."""
    import numpy as np
    import pandas as pd

    from .kernel import geohash_np as gh
    from .kernel import s2_np, tiles_np

    def _tile_strings(lat, lon):
        x, y = tiles_np.tile_xy(lat, lon, 12)
        return pd.Series(x).astype(str).radd("12/").str.cat(
            pd.Series(y).astype(str), sep="/").to_numpy()

    def _fn(batches):
        for pdf in batches:
            text = extract.extract_text_pd(pdf["html"]).reset_index(drop=True)
            stored = pdf["text"].reset_index(drop=True)
            ok = (text == stored).to_numpy()
            t = text[ok].reset_index(drop=True)
            urls = pdf["url"].reset_index(drop=True)[ok].reset_index(drop=True)
            tss = pdf["warc_ts"].reset_index(drop=True)[ok].reset_index(drop=True)
            m = extract.parse_mentions_pd(t)
            if not len(m):
                yield pd.DataFrame({c.split(" ")[0]: [] for c in POINTS_SCHEMA.split(", ")})
                continue
            lat = m["lat"].to_numpy()
            lon = m["lon"].to_numpy()
            cells = gh.encode(lat, lon, nchars)
            yield pd.DataFrame({
                "url": urls.iloc[m["row_idx"]].to_numpy(),
                "warc_ts": tss.iloc[m["row_idx"]].to_numpy(),
                "lat": lat,
                "lon": lon,
                "geohash": cells,
                "gh2": pd.Series(cells).str[:2].to_numpy(),
                "s2_cell": s2_np.cell_id(lat, lon, 10).astype(np.int64),
                "tile": _tile_strings(lat, lon),
            })

    return _fn


def stage_points(spark: SparkSession, workdir: str, nchars: int = 5) -> str:
    pages_path = os.path.join(workdir, "pages")
    path = os.path.join(workdir, "points")
    params = {"nchars": nchars}
    if not table.is_complete(path, parents=[pages_path], params=params):
        pages = table.read_stage(spark, pages_path)
        # spread the UDF-heavy stage across every core even when the
        # input collapses into few splits (html compresses well)
        target = spark.sparkContext.defaultParallelism * 2
        if pages.rdd.getNumPartitions() < target:
            pages = pages.repartition(target)
        points = pages.mapInPandas(_points_batches(nchars), schema=POINTS_SCHEMA)
        # Two write layouts, both ending in a gh2-partitioned table:
        #
        # * "sorted" (default): sortWithinPartitions(gh2, geohash) then
        #   write — a NARROW per-task sort, no shuffle, no second pass
        #   over the UDF output.  File count = tasks x dirs-touched;
        #   rows inside each file are cell-clustered so row-group
        #   min/max stats prune later scans.  Small files are the
        #   table-format compactor's job at cluster scale (and the scan
        #   packs them into splits here).
        #
        # * "range": repartitionByRange(gh2, geohash) first — each task
        #   then holds a contiguous cell range, so file count ~ tasks
        #   and files are size-balanced even under hot-city skew.  The
        #   right choice for a 1000-executor run writing one file per
        #   task; costs a full extra pass (the range partitioner SAMPLES
        #   its child, so the UDF output must be persisted to avoid
        #   re-executing the extract stage) plus a shuffle of the table.
        cluster = os.environ.get("SPARK_GRAFT_CLUSTER_WRITE", "sorted")
        if cluster == "range":
            from pyspark import StorageLevel

            points = points.persist(StorageLevel.MEMORY_AND_DISK)
            try:
                clustered = points.repartitionByRange(
                    target, F.col("gh2"), F.col("geohash"))
                table.write_stage(clustered, path, partition_by=["gh2"],
                                  parents=[pages_path], params=params)
            finally:
                points.unpersist()
        else:
            clustered = points.sortWithinPartitions(F.col("gh2"), F.col("geohash"))
            table.write_stage(clustered, path, partition_by=["gh2"],
                              parents=[pages_path], params=params,
                              sort_by=["gh2", "geohash"])
    return path


def stage_join(spark: SparkSession, workdir: str, radius_m: float = 50000.0) -> str:
    points_path = os.path.join(workdir, "points")
    path = os.path.join(workdir, "joined")
    params = {"radius_m": radius_m}
    if not table.is_complete(path, parents=[points_path], params=params):
        points = table.read_stage(spark, points_path)
        # query set is a driver-side constant -> tuple fast path (no
        # createDataFrame/collect round-trip in the timed stage)
        qrows = [(i, lat, lon, radius_m)
                 for i, (_name, lat, lon) in enumerate(synth.CITIES)]
        joined = engine.radius_join(points, qrows)
        table.write_stage(joined.select("url", "query_id", "geohash", "dist_m"),
                          path, parents=[points_path], params=params)
    return path


def stage_rollup(spark: SparkSession, workdir: str) -> str:
    points_path = os.path.join(workdir, "points")
    path = os.path.join(workdir, "rollup")
    if not table.is_complete(path, parents=[points_path]):
        points = table.read_stage(spark, points_path)
        rollup = engine.salted_cell_counts(points)
        table.write_stage(rollup, path, parents=[points_path])
    return path


def stage_store(spark: SparkSession, workdir: str) -> str:
    """Keyed positions STORE maintained through the production MERGE
    API (table.merge_into): the latest mention per url, LWW on
    (warc_ts, payload), lands in a bucketed catalog table — the AddPos
    upsert surface (SURVEY.md S1) exercised inside the resumable
    pipeline rather than only in unit tests.

    Shape: the points stage splits into two deterministic micro-batches
    by xxhash64(url) parity — batch 0 SEEDS the store (bucketed write),
    batch 1 arrives through ``MERGE INTO`` (v2 catalog) or the
    zero-Exchange bucketed merge-join fallback, so every fresh run
    exercises both the create and the incremental-merge path, exactly
    how a daily crawl lands on the store at cluster scale.

    Resume contract: a manifest under ``workdir/store`` records the
    points lineage; when it matches AND the catalog table exists the
    stage is skipped.  A crash between merge_into's DROP and RENAME is
    repaired by recover_merge on the next entry (tested).  The catalog
    here is per-session (in-memory); a restart with a warm manifest but
    a cold catalog rebuilds the store — an Iceberg/Hive catalog makes
    that case a no-op."""
    import hashlib
    import json

    points_path = os.path.join(workdir, "points")
    path = os.path.join(workdir, "store")
    name = "geotile_store_" + hashlib.sha256(
        os.path.abspath(workdir).encode()).hexdigest()[:10]
    params = {"table": name}
    if table.is_complete(path, parents=[points_path], params=params) \
            and spark.catalog.tableExists(name):
        return path
    table.recover_merge(spark, name)
    points = table.read_stage(spark, points_path)
    upd = points.select(
        "url", F.col("warc_ts").alias("ts"), "lat", "lon", "geohash",
        F.pmod(F.xxhash64("url"), F.lit(2)).alias("_b"))
    seed = upd.where(F.col("_b") == 0).drop("_b")
    # LWW-dedup the seed batch exactly as merge_into dedups updates
    from pyspark.sql import Window

    tie = [F.col(c).desc() for c in seed.columns if c not in ("url", "ts")]
    w = Window.partitionBy("url").orderBy(F.col("ts").desc(), *tie)
    seed = (seed.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))
    table.write_bucketed(seed, name, "url")
    table.merge_into(spark, name, upd.where(F.col("_b") == 1).drop("_b"),
                     key="url", ts="ts")
    n = spark.table(name).count()
    # commit the stage manifest (data lives in the catalog/warehouse;
    # the manifest dir carries lineage + the row count metric)
    os.makedirs(path, exist_ok=True)
    pm = table.read_manifest(points_path)
    manifest = {"format_version": 1, "committed_at": time.time(),
                "lineage": table._lineage_hash(
                    [pm["lineage"] if pm else "missing:" + points_path], params),
                "partition_by": [], "partitions": {"": n},
                "total_rows": n, "params": params}
    tmp = os.path.join(path, table.MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, table.MANIFEST))
    return path


def warm_up(spark: SparkSession, workdir: str | None = None) -> None:
    """Pre-fork the Python UDF workers at full parallelism and JIT-warm
    the codegen/parquet/broadcast paths with a micro dry run.  On a real
    cluster executors (and their python daemons) are long-lived and the
    JVM is hot; in a fresh local JVM the first pandas stage pays ~0.5 s
    per worker fork and the first join/write pays seconds of JIT and
    codegen compilation, which pollutes scaling measurements."""
    p = spark.sparkContext.defaultParallelism
    spark.range(0, p, 1, p).mapInPandas(lambda it: it, schema="id bigint").count()
    if workdir is not None:
        scratch = os.path.join(workdir, "_warmup")
        pages = synth.synth_pages(spark, 2000, p)
        pts = pages.mapInPandas(_points_batches(5), schema=POINTS_SCHEMA)
        qrows = [(i, lat, lon, 50000.0)
                 for i, (_name, lat, lon) in enumerate(synth.CITIES)]
        j = engine.radius_join(pts, qrows)
        j.select("url", "query_id", "geohash", "dist_m").write.mode(
            "overwrite").parquet(os.path.join(scratch, "j"))
        engine.salted_cell_counts(pts).write.mode("overwrite").parquet(
            os.path.join(scratch, "r"))
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)


def run_pipeline(spark: SparkSession, workdir: str, n: int,
                 partitions: int | None = None) -> dict:
    """Run (or resume) all stages; returns timing + row metrics.

    ``joined`` and ``rollup`` are independent consumers of ``points``,
    so they run as CONCURRENT Spark jobs (two driver threads; the
    scheduler interleaves their tasks) — standard DAG-level parallelism
    that fills scheduling gaps instead of serializing two scans."""
    warm_up(spark, workdir)
    t0 = time.time()
    stage_pages(spark, workdir, n, partitions)
    t1 = time.time()
    stage_points(spark, workdir)
    t2 = time.time()
    from concurrent.futures import ThreadPoolExecutor

    def _timed(fn, *a):
        s = time.time()
        fn(*a)
        return time.time() - s

    with ThreadPoolExecutor(max_workers=2) as ex:
        f_join = ex.submit(_timed, stage_join, spark, workdir)
        f_rollup = ex.submit(_timed, stage_rollup, spark, workdir)
        d_join = f_join.result()
        d_rollup = f_rollup.result()
    t4 = time.time()
    # keyed positions store via the production MERGE path — timed
    # separately so t_total/pages_per_sec keep their round-comparable
    # definition (synth -> extract -> tile -> join/rollup)
    stage_store(spark, workdir)
    t5 = time.time()
    m_pages = table.read_manifest(os.path.join(workdir, "pages"))
    m_points = table.read_manifest(os.path.join(workdir, "points"))
    m_joined = table.read_manifest(os.path.join(workdir, "joined"))
    m_store = table.read_manifest(os.path.join(workdir, "store"))
    return {
        "pages": m_pages["total_rows"], "points": m_points["total_rows"],
        "joined": m_joined["total_rows"], "store": m_store["total_rows"],
        "t_pages": t1 - t0, "t_points": t2 - t1, "t_join": d_join,
        "t_rollup": d_rollup, "t_spatial": t4 - t2, "t_store": t5 - t4,
        "t_total": t4 - t0,
        "pages_per_sec": m_pages["total_rows"] / max(t4 - t0, 1e-9),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100000)
    ap.add_argument("--workdir", default="/tmp/geotile_pipeline")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()
    from .session import get_spark

    spark = get_spark("geotile-pipeline", cores=args.cores)
    metrics = run_pipeline(spark, args.workdir, args.n)
    import json

    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
