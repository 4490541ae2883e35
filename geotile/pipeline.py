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
        df = synth.synth_pages(spark, n, partitions)
        table.write_stage(df, path, parents=(), params=params)
    return path


POINTS_SCHEMA = ("url string, lat double, lon double, geohash string, "
                 "gh2 string, s2_cell long, tile string")


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
            m = extract.parse_mentions_pd(t)
            if not len(m):
                yield pd.DataFrame({c.split(" ")[0]: [] for c in POINTS_SCHEMA.split(", ")})
                continue
            lat = m["lat"].to_numpy()
            lon = m["lon"].to_numpy()
            cells = gh.encode(lat, lon, nchars)
            yield pd.DataFrame({
                "url": urls.iloc[m["row_idx"]].to_numpy(),
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
        # cluster rows by partition value (+ salt so a hot city cell
        # splits across tasks) BEFORE the partitioned write: bounds the
        # small-file count at tasks-per-cell instead of tasks*cells
        points = points.repartition(target, F.col("gh2"),
                                    F.pmod(F.xxhash64("url"), F.lit(8)))
        table.write_stage(points, path, partition_by=["gh2"],
                          parents=[pages_path], params=params)
    return path


def stage_join(spark: SparkSession, workdir: str, radius_m: float = 50000.0) -> str:
    points_path = os.path.join(workdir, "points")
    path = os.path.join(workdir, "joined")
    params = {"radius_m": radius_m}
    if not table.is_complete(path, parents=[points_path], params=params):
        points = table.read_stage(spark, points_path)
        joined = engine.radius_join(points, poi_queries(spark, radius_m))
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


def warm_up(spark: SparkSession) -> None:
    """Pre-fork the Python UDF workers at full parallelism.  On a real
    cluster executors (and their python daemons) are long-lived; in a
    fresh local JVM the first pandas stage would otherwise pay ~0.5 s
    per worker fork, which pollutes scaling measurements."""
    p = spark.sparkContext.defaultParallelism
    spark.range(0, p, 1, p).mapInPandas(lambda it: it, schema="id bigint").count()


def run_pipeline(spark: SparkSession, workdir: str, n: int,
                 partitions: int | None = None) -> dict:
    """Run (or resume) all stages; returns timing + row metrics."""
    warm_up(spark)
    t0 = time.time()
    stage_pages(spark, workdir, n, partitions)
    t1 = time.time()
    stage_points(spark, workdir)
    t2 = time.time()
    stage_join(spark, workdir)
    t3 = time.time()
    stage_rollup(spark, workdir)
    t4 = time.time()
    m_pages = table.read_manifest(os.path.join(workdir, "pages"))
    m_points = table.read_manifest(os.path.join(workdir, "points"))
    m_joined = table.read_manifest(os.path.join(workdir, "joined"))
    return {
        "pages": m_pages["total_rows"], "points": m_points["total_rows"],
        "joined": m_joined["total_rows"],
        "t_pages": t1 - t0, "t_points": t2 - t1, "t_join": t3 - t2,
        "t_rollup": t4 - t3, "t_total": t4 - t0,
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
