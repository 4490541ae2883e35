"""Synth determinism, extraction invariants, manifest resume."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geotile import engine, extract, pipeline, synth, table


def test_synth_deterministic_across_partitionings(spark):
    a = synth.synth_pages(spark, 500, partitions=1).orderBy("url").collect()
    b = synth.synth_pages(spark, 500, partitions=7).orderBy("url").collect()
    assert len(a) == 500
    for ra, rb in zip(a, b):
        assert ra == rb  # byte-identical rows incl. html bytes and text


def test_synth_text_matches_extraction(spark):
    df = synth.synth_pages(spark, 300, partitions=3)
    df = extract.with_text(df, out="text2")
    assert df.where(F.col("text") != F.col("text2")).count() == 0


def test_extract_text_canonical():
    html = pd.Series([b"<html><head><title>T</title><style>p{}</style></head>"
                      b"<body><h1>A&amp;B</h1> <p>x  y</p><script>s;</script></body></html>"])
    assert extract.extract_text_pd(html)[0] == "T A&B x y"


def test_extract_text_invalid_utf8_and_mixed_inputs():
    # the vectorized Series.str.decode path must match bytes.decode
    # ("utf-8", "replace") exactly, and already-str / null rows pass
    # through — pins the errors="replace" contract (U+FFFD per bad byte)
    bad = b"<p>caf\xe9 \xff\xfe ok</p>"
    html = pd.Series([bad, "<p>already str</p>", None])
    got = extract.extract_text_pd(html)
    assert got[0] == bad.decode("utf-8", "replace") \
        .replace("<p>", " ").replace("</p>", " ").strip()
    assert "�" in got[0]
    assert got[1] == "already str"
    assert pd.isna(got[2])


def test_parse_mentions():
    t = pd.Series(["near beijing at 39.928167, 116.389550 and 91.5, 10.5 end",
                   "no coords here", "at -33.856784,151.215297"])
    m = extract.parse_mentions_pd(t)
    got = list(zip(m["row_idx"], m["lat"], m["lon"]))
    # 91.5 is out of latitude range -> rejected
    assert got == [(0, 39.928167, 116.389550), (2, -33.856784, 151.215297)]


def test_zipf_skew_produces_hot_cells(spark):
    pts = extract.explode_mentions(extract.with_mentions(
        synth.synth_pages(spark, 3000, partitions=4)))
    cells = engine.with_cell(pts).groupBy("geohash").count().collect()
    counts = sorted((r["count"] for r in cells), reverse=True)
    assert counts[0] > 10 * counts[len(counts) // 2]  # heavy head


def test_manifest_write_resume(spark, tmp_path):
    wd = str(tmp_path)
    df = synth.synth_pages(spark, 200, partitions=2)
    p = os.path.join(wd, "pages")
    m1 = table.write_stage(df, p, params={"n": 200})
    assert m1["total_rows"] == 200
    assert table.is_complete(p, params={"n": 200})
    assert not table.is_complete(p, params={"n": 300})  # param change invalidates
    assert table.verify_counts(spark, p)


def test_pipeline_end_to_end_and_resume(spark, tmp_path):
    import hashlib

    wd = str(tmp_path)
    m = pipeline.run_pipeline(spark, wd, n=2000, partitions=4)
    assert m["pages"] == 2000
    assert m["points"] > 1000  # ~70% of pages have >=1 mention
    assert m["joined"] > 0
    for stage in ("pages", "points", "joined", "rollup"):
        assert table.verify_counts(spark, os.path.join(wd, stage))

    # the MERGE-maintained store holds exactly one row per distinct url
    store_name = "geotile_store_" + hashlib.sha256(
        os.path.abspath(wd).encode()).hexdigest()[:10]
    pts = table.read_stage(spark, os.path.join(wd, "points"))
    n_urls = pts.select("url").distinct().count()
    assert m["store"] == n_urls
    assert spark.table(store_name).count() == n_urls

    # resume: delete the joined stage only; rerun redoes just that stage
    mtime_points = os.path.getmtime(os.path.join(wd, "points", table.MANIFEST))
    mtime_store = os.path.getmtime(os.path.join(wd, "store", table.MANIFEST))
    os.remove(os.path.join(wd, "joined", table.MANIFEST))
    m2 = pipeline.run_pipeline(spark, wd, n=2000, partitions=4)
    assert m2["pages"] == m["pages"] and m2["joined"] == m["joined"]
    assert os.path.getmtime(os.path.join(wd, "points", table.MANIFEST)) == mtime_points
    # completed stages were skipped (fast) — including the MERGE store
    assert os.path.getmtime(os.path.join(wd, "store", table.MANIFEST)) == mtime_store
    assert m2["t_pages"] < 1.0 and m2["t_points"] < 1.0 and m2["t_store"] < 1.0

    # kill mid-merge: simulate a crash between merge_into's DROP and
    # RENAME (target gone, stage table holding the data), invalidate the
    # store manifest -> the next pipeline run self-heals and recommits
    spark.sql(f"ALTER TABLE {store_name} RENAME TO {store_name}__merge_stage")
    os.remove(os.path.join(wd, "store", table.MANIFEST))
    m3 = pipeline.run_pipeline(spark, wd, n=2000, partitions=4)
    assert m3["store"] == n_urls
    assert spark.table(store_name).count() == n_urls
    assert not spark.catalog.tableExists(f"{store_name}__merge_stage")


def test_join_rows_identical_across_parallelism(spark, tmp_path):
    """North-rule scaling-correctness: identical join output rows at
    different parallelism (same session, different shuffle partitioning)."""
    wd1, wd2 = str(tmp_path / "a"), str(tmp_path / "b")
    pipeline.run_pipeline(spark, wd1, n=1500, partitions=2)
    pipeline.run_pipeline(spark, wd2, n=1500, partitions=11)
    j1 = table.read_stage(spark, os.path.join(wd1, "joined"))
    j2 = table.read_stage(spark, os.path.join(wd2, "joined"))
    a = sorted(tuple(r) for r in j1.collect())
    b = sorted(tuple(r) for r in j2.collect())
    assert a == b


def test_compact_preserves_content_and_lineage(spark, tmp_path):
    from pyspark.sql import functions as F

    wd = str(tmp_path / "wd")
    pipeline.run_pipeline(spark, wd, n=3000, partitions=6)
    ppath = os.path.join(wd, "points")
    before = {tuple(r) for r in table.read_stage(spark, ppath)
              .select("url", "geohash").collect()}
    n_files_before = sum(1 for root, _d, fs in os.walk(ppath)
                         for f in fs if f.endswith(".parquet"))
    m = table.compact(spark, ppath, target_mb=128)
    n_files_after = sum(1 for root, _d, fs in os.walk(ppath)
                        for f in fs if f.endswith(".parquet"))
    assert n_files_after <= n_files_before
    after = {tuple(r) for r in table.read_stage(spark, ppath)
             .select("url", "geohash").collect()}
    assert after == before
    assert table.verify_counts(spark, ppath)
    # lineage unchanged -> downstream stages still see the stage complete
    assert table.is_complete(ppath, parents=[os.path.join(wd, "pages")],
                             params=m["params"])
    # sort clustering survives the rewrite (row-group min/max pruning
    # depends on it) and the crash-safe .bak sibling is gone
    import pyarrow.parquet as pq

    pfiles = sorted(os.path.join(root, f) for root, _d, fs in os.walk(ppath)
                    for f in fs if f.endswith(".parquet"))
    col = pq.read_table(pfiles[0], columns=["geohash"]).to_pandas()["geohash"]
    assert list(col) == sorted(col)
    assert not os.path.exists(ppath + ".compact.bak")


def test_bucketed_upsert_has_no_exchange(spark):
    """Co-bucketed storage removes the keyed upsert's wide shuffle:
    both scans report hash partitioning (and sort order) on the key,
    so the MERGE-shaped upsert and a co-bucketed join run with ZERO
    Exchange in the physical plan."""
    rows = [(f"m{i}", float(i % 90), float(i % 180), i) for i in range(1000)]
    df = spark.createDataFrame(rows, "msisdn string, lat double, lon double, ts long")
    # updates: newer ts for even keys + 50 brand-new keys
    upd_rows = [(f"m{i}", 1.0, 2.0, i + 1000) for i in range(0, 1000, 2)] + \
               [(f"n{i}", 3.0, 4.0, i) for i in range(50)]
    upd = spark.createDataFrame(upd_rows, "msisdn string, lat double, lon double, ts long")
    table.write_bucketed(df, "pos_bucketed", "msisdn", n_buckets=8)
    table.write_bucketed(upd, "upd_bucketed", "msisdn", n_buckets=8)
    state = spark.table("pos_bucketed")
    updates = spark.table("upd_bucketed")

    merged = engine.upsert_positions_merge(state, updates, key="msisdn", ts="ts")
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert merged.count() == 1050
    got = {r["msisdn"]: (r["lat"], r["ts"]) for r in merged.collect()}
    assert got["m0"] == (1.0, 1000)     # updated
    assert got["m1"] == (1.0, 1)        # untouched (lat = 1 % 90)
    assert got["n7"] == (3.0, 7)        # inserted

    # equivalence with the window-dedup form (which needs a shuffle)
    ref = {(r["msisdn"], r["lat"], r["ts"])
           for r in engine.upsert_positions(state, updates, key="msisdn", ts="ts").collect()}
    assert {(k, v[0], v[1]) for k, v in got.items()} == ref

    # a co-bucketed join never SHUFFLES either side (a BroadcastExchange
    # is fine — that's the optimal plan for a small side, not a shuffle)
    joined = state.join(updates.select("msisdn", F.col("ts").alias("ts2")), "msisdn")
    jplan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in jplan, jplan


def test_merge_into_bucketed_table(spark):
    """table.merge_into: the production MERGE INTO statement is tried
    first; on this sandbox's v1 parquet catalog it falls back to the
    merge-join form whose physical plan must be ZERO-Exchange over the
    co-bucketed scans, followed by the catalog swap.  End state equals
    the window-dedup upsert semantics."""
    rows = [(f"m{i}", float(i % 90), float(i % 180), i) for i in range(400)]
    df = spark.createDataFrame(rows, "msisdn string, lat double, lon double, ts long")
    upd_rows = [(f"m{i}", 1.0, 2.0, i + 400) for i in range(0, 400, 2)] + \
               [(f"n{i}", 3.0, 4.0, i) for i in range(20)]
    upd = spark.createDataFrame(upd_rows, "msisdn string, lat double, lon double, ts long")
    table.write_bucketed(df, "pos_merge_tgt", "msisdn", n_buckets=8)
    table.write_bucketed(upd, "pos_merge_upd", "msisdn", n_buckets=8)

    res = table.merge_into(spark, "pos_merge_tgt",
                           spark.table("pos_merge_upd"),
                           key="msisdn", ts="ts", n_buckets=8)
    # no v2 catalog in this sandbox -> the join fallback must have run,
    # and its merge computation must be shuffle-free
    assert res["path"] == "merge-join"
    assert "Exchange" not in res["plan"], res["plan"]

    got = {r["msisdn"]: (r["lat"], r["ts"])
           for r in spark.table("pos_merge_tgt").collect()}
    assert len(got) == 420
    assert got["m0"] == (1.0, 400)      # updated
    assert got["m1"] == (1.0, 1)        # untouched
    assert got["n7"] == (3.0, 7)        # inserted
    # merging the same updates again is idempotent
    upd2 = spark.createDataFrame(upd_rows, "msisdn string, lat double, lon double, ts long")
    table.write_bucketed(upd2, "pos_merge_upd", "msisdn", n_buckets=8)
    table.merge_into(spark, "pos_merge_tgt", spark.table("pos_merge_upd"),
                     key="msisdn", ts="ts", n_buckets=8)
    again = {r["msisdn"]: (r["lat"], r["ts"])
             for r in spark.table("pos_merge_tgt").collect()}
    assert again == got
    spark.sql("DROP TABLE IF EXISTS pos_merge_tgt")
    spark.sql("DROP TABLE IF EXISTS pos_merge_upd")


def test_compact_crash_recovery_all_states(spark, tmp_path):
    """Kill-between-steps: every on-disk state the compact swap can be
    interrupted in (tmp-only, bak+missing-path, bak+uncommitted-path,
    bak+committed-path) recovers via table.recover_compact to a stage
    that read_stage can read with conserved counts."""
    import shutil

    base = str(tmp_path / "stage")
    df = synth.synth_pages(spark, 300, partitions=3).select("url", "lang", "warc_ts")
    table.write_stage(df, base, partition_by=["lang"], params={"n": 300})
    m0 = table.read_manifest(base)
    golden = {tuple(r) for r in table.read_stage(spark, base).collect()}

    def clone(name):
        p = str(tmp_path / name)
        shutil.copytree(base, p)
        return p, p + ".compact.bak", p + ".compact.tmp"

    # state 1: crash after tmp written, before any swap
    p, bak, tmp = clone("s1")
    shutil.copytree(p, tmp)
    assert table.recover_compact(p) == "dropped_tmp"
    assert not os.path.exists(tmp)

    # state 2: crash between os.replace(path, bak) and os.replace(tmp, path)
    p, bak, tmp = clone("s2")
    shutil.copytree(p, tmp)
    os.replace(p, bak)
    assert table.recover_compact(p) == "restored_bak"
    assert not os.path.exists(bak) and not os.path.exists(tmp)

    # state 3: crash after new data moved in, before manifest commit
    p, bak, tmp = clone("s3")
    shutil.copytree(p, tmp)
    os.remove(os.path.join(tmp, table.MANIFEST))  # compact's tmp has no manifest
    os.replace(p, bak)
    os.replace(tmp, p)
    assert table.recover_compact(p) == "rolled_back"

    # state 4: crash after manifest commit, before bak cleanup
    p, bak, tmp = clone("s4")
    shutil.copytree(p, bak)
    assert table.recover_compact(p) == "dropped_bak"

    for name in ("s1", "s2", "s3", "s4"):
        p = str(tmp_path / name)
        assert table.recover_compact(p) == "clean"  # idempotent
        m = table.read_manifest(p)
        assert m is not None and m["partitions"] == m0["partitions"]
        assert {tuple(r) for r in table.read_stage(spark, p).collect()} == golden
        assert table.verify_counts(spark, p)


def test_merge_into_crash_recovery_and_dup_updates(spark):
    """(a) Raw updates with duplicate keys are LWW-deduped before the
    merge (the join fallback would otherwise emit duplicate keys);
    (b) a crash landing between DROP and RENAME (simulated by doing the
    swap by hand) is repaired by recover_merge on the next call."""
    rows = [(f"m{i}", 0.0, 0.0, i) for i in range(50)]
    df = spark.createDataFrame(rows, "msisdn string, lat double, lon double, ts long")
    table.write_bucketed(df, "pos_rec_tgt", "msisdn", n_buckets=4)
    # duplicate-key updates: the newer ts (lat=2.0) must win, once
    upd = spark.createDataFrame(
        [("m1", 1.0, 1.0, 100), ("m1", 2.0, 2.0, 200), ("x", 9.0, 9.0, 1)],
        "msisdn string, lat double, lon double, ts long")
    table.merge_into(spark, "pos_rec_tgt", upd, key="msisdn", ts="ts",
                     n_buckets=4)
    got = spark.table("pos_rec_tgt").where("msisdn = 'm1'").collect()
    assert len(got) == 1 and got[0]["lat"] == 2.0 and got[0]["ts"] == 200
    assert spark.table("pos_rec_tgt").count() == 51

    # simulate the crash window: stage exists, target dropped
    spark.sql("CREATE TABLE pos_rec_tgt__merge_stage AS SELECT * FROM pos_rec_tgt")
    spark.sql("DROP TABLE pos_rec_tgt")
    assert table.recover_merge(spark, "pos_rec_tgt") is True
    assert spark.table("pos_rec_tgt").count() == 51
    assert not spark.catalog.tableExists("pos_rec_tgt__merge_stage")
    # and merge_into itself self-heals on entry (no-op repair when fine)
    assert table.recover_merge(spark, "pos_rec_tgt") is False
    spark.sql("DROP TABLE IF EXISTS pos_rec_tgt")


def test_column_stats_exact(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (2, 7.5), (3, 5.0)],
        "k long, v double")
    got = {r["column"]: (r["n_rows"], r["n_null"], r["n_distinct"],
                         r["min"], r["max"])
           for r in table.column_stats(df, ["k", "v"]).collect()}
    assert got["k"] == (4, 0, 3, 1.0, 3.0)
    assert got["v"] == (4, 1, 2, 5.0, 7.5)


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "aaa", 10), (2, "bbb", 20), (3, "ccc", 30), (4, None, 40)],
        "k long, cell string, v long")
    new = spark.createDataFrame(
        [(2, "bbb", 20), (3, "cc2", 30), (4, None, 40), (5, "eee", 50)],
        "k long, cell string, v long")
    got = {r["k"]: (r["change"], r["old_cell"], r["new_cell"])
           for r in table.snapshot_diff(old, new, "k", ["cell", "v"]).collect()}
    assert got[1] == ("delete", "aaa", "")
    assert got[3] == ("update", "ccc", "cc2")
    assert got[5] == ("insert", "", "eee")
    # unchanged keys dropped — including the NULL == NULL (null-safe) one
    assert 2 not in got and 4 not in got
    # a NULL -> value transition is an update, not a false 'same'
    got2 = {r["k"]: r["change"] for r in table.snapshot_diff(
        old, new.withColumn("cell", F.when(F.col("k") == 4, "now")
                            .otherwise(F.col("cell"))),
        "k", ["cell"]).collect()}
    assert got2[4] == "update"


def test_snapshot_diff_bucketed_zero_exchange(spark):
    # with both snapshots bucketed by the key, the full-outer sort-merge
    # join needs NO Exchange — the same plan claim as the MERGE path
    old = spark.createDataFrame([(i, f"c{i}") for i in range(100)],
                                "k long, cell string")
    new = spark.createDataFrame([(i, f"c{i + (i % 7 == 0)}")
                                 for i in range(100)], "k long, cell string")
    table.write_bucketed(old, "sd_old", "k", n_buckets=4)
    table.write_bucketed(new, "sd_new", "k", n_buckets=4)
    try:
        o = spark.table("sd_old")
        n = spark.table("sd_new")
        out = table.snapshot_diff(o, n, "k", ["cell"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        changed = {r["k"] for r in out.collect()}
        assert changed == {i for i in range(100) if i % 7 == 0}
    finally:
        spark.sql("DROP TABLE IF EXISTS sd_old")
        spark.sql("DROP TABLE IF EXISTS sd_new")


def test_merge_rollup_ivm_identity(spark):
    """merge(base, delta) == direct recompute, including keys present
    in only one side."""
    from pyspark.sql import functions as F

    from geotile import table

    rows = [("a", 1, 10), ("a", 2, 20), ("b", 1, 5), ("c", 9, 9)]
    df = spark.createDataFrame(rows, "k string, part long, v long")

    def roll(d):
        return d.groupBy("k").agg(F.count("*").alias("n"),
                                  F.sum("v").alias("v_sum"))

    base = roll(df.where(F.col("part") < 2))    # a, b, c? (c part 9 no)
    delta = roll(df.where(F.col("part") >= 2))  # a, c
    merged = {r["k"]: (r["n"], r["v_sum"])
              for r in table.merge_rollup(base, delta,
                                          ["k"], ["n", "v_sum"]).collect()}
    direct = {r["k"]: (r["n"], r["v_sum"]) for r in roll(df).collect()}
    assert merged == direct
