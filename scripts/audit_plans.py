#!/usr/bin/env python
"""Plan-shape audit: .explain the core operators against a real
cell-partitioned points table and write PLANS.md with the evidence the
engine's scale claims rest on (pushdown, partition pruning, broadcast
joins, single-pass UDFs, shuffle count).

Usage: python scripts/audit_plans.py [--points /tmp/vfy_pipe/points]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = ("FileScan", "Exchange", "BroadcastHashJoin", "SortMergeJoin",
        "BroadcastNestedLoopJoin", "ArrowEvalPython", "FlatMapGroupsInPandas",
        "HashAggregate", "Window", "Filter", "InMemoryTableScan")


def summarize(df, title: str) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = []
    counts: dict[str, int] = {}
    for line in plan.splitlines():
        for k in KEYS:
            if k in line:
                counts[k] = counts.get(k, 0) + 1
    for line in plan.splitlines():
        if "FileScan" in line:
            pf = re.search(r"PartitionFilters: \[[^\]]*\]", line)
            push = re.search(r"PushedFilters: \[[^\]]{0,120}", line)
            rs = re.search(r"ReadSchema: [^,]{0,120}", line)
            lines.append(f"  scan: {pf.group(0) if pf else 'PartitionFilters: []'}")
            if push:
                lines.append(f"        {push.group(0)}...]")
            if rs:
                lines.append(f"        {rs.group(0)}")
    ops = ", ".join(f"{k}x{v}" for k, v in sorted(counts.items()))
    return f"### {title}\n\n```\n  ops: {ops}\n" + "\n".join(lines) + "\n```\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="/tmp/geotile_audit_points")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from geotile import engine, extract, synth, table
    from geotile.session import get_spark

    spark = get_spark("plan-audit", cores=8, shuffle_partitions=8)

    if not os.path.isdir(args.points):
        pages = synth.synth_pages(spark, 30000, partitions=8)
        pts = extract.explode_mentions(extract.with_mentions(pages))
        pts = engine.with_cell(pts).withColumn("gh2", F.substring("geohash", 1, 2))
        pts.write.mode("overwrite").partitionBy("gh2").parquet(args.points)
    points = spark.read.parquet(args.points)

    sections = []
    sections.append(summarize(
        engine.radius_search(points, 39.9286, 116.3895, 30000.0),
        "radius_search (scalar query): pruned scan + codegen refine, 0 shuffles, 0 Python"))
    qdf = spark.createDataFrame(
        [(0, 39.9286, 116.3895, 50000.0), (1, 51.5074, -0.1278, 50000.0)],
        "query_id long, qlat double, qlon double, radius_m double")
    sections.append(summarize(
        engine.radius_join(points, qdf),
        "radius_join (POI set): broadcast cover, big side never shuffles, 0 Python"))
    polys = spark.createDataFrame(
        [(0, [39.0, 41.0, 39.0], [115.0, 116.5, 118.0])],
        "poly_id long, poly_lat array<double>, poly_lon array<double>")
    sections.append(summarize(
        engine.pip_join(points, polys),
        "pip_join: pruned scan + broadcast cover + vectorized ray-cast refine"))
    state = points.select("url", "lat", "lon", "geohash").withColumn("ts", F.lit(0))
    upd = state.limit(100).withColumn("ts", F.lit(1))
    sections.append(summarize(
        engine.upsert_positions(state, upd, key="url", ts="ts"),
        "upsert (LWW dedup): the one deliberate wide shuffle, on the key"))
    sections.append(summarize(
        engine.salted_cell_counts(points),
        "salted_cell_counts: two-level aggregate (partial on (cell,salt))"))
    sections.append(summarize(
        engine.knn_join(points, [(0, 39.9286, 116.3895)], k=5, id_col="url",
                        n_total=30000),
        "knn_join (final ring iteration shown): pruned scan + broadcast candidates + windowed top-k"))
    # knn_join_bulk returns a materialized cached frame (its rounds run
    # eagerly), so audit the ROUND-1 plan shape directly: the same
    # pos-prepartition + annulus-explode + single-window rank/resolve
    # pipeline the engine loop builds (engine.knn_join_bulk)
    from pyspark.sql import Window

    from geotile import udfs as _udfs

    key2 = F.substring(F.col("geohash"), 1, 2)
    pos2 = points.withColumn("_pcell", key2).repartition(F.col("_pcell"))
    qb = (points.limit(50)
          .select(F.col("url").alias("query_id"),
                  F.col("lat").alias("qlat"), F.col("lon").alias("qlon")))
    cand_cells = qb.withColumn(
        "cell", F.explode(_udfs.annulus_cells_udf(2, -1, 1)(F.col("qlat"), F.col("qlon"))))
    wq = Window.partitionBy("query_id").orderBy(F.col("dist_m"), F.col("url"))
    wp = Window.partitionBy("query_id")
    bulk_round = (pos2.join(cand_cells, F.col("_pcell") == cand_cells["cell"], "inner")
                  .drop("cell", "_pcell")
                  .withColumn("dist_m", _udfs.haversine_col(
                      F.col("qlat"), F.col("qlon"), F.col("lat"), F.col("lon")))
                  .withColumn("_rn", F.row_number().over(wq))
                  .where(F.col("_rn") <= 5).drop("_rn")
                  .withColumn("_n", F.count("*").over(wp))
                  .withColumn("_kth", F.max("dist_m").over(wp)))
    sections.append(summarize(
        bulk_round,
        "knn_join_bulk (one round): positions pre-partitioned once, annulus side "
        "exchanges, rank + resolution test in a single qid window pass"))
    from geotile.kernel import tiles_np

    tx, ty = tiles_np.tile_xy(39.9286, 116.3895, 10)
    sections.append(summarize(
        engine.raster_vector_join(points, [(10, int(tx[0]), int(ty[0]))]),
        "raster_vector_join: tile -> cell cover, pruned scan, exact bbox refine"))
    sections.append(summarize(
        engine.radius_search_compat(points, 39.928167, 116.389550, 10000.0),
        "radius_search_compat (reference-exact): 0-or-1 candidate cell, pushed IN filter"))
    facts = points.select("url").withColumn("ep", (F.crc32("url") % 100000).cast("long"))
    wins = spark.createDataFrame(
        [(w, w * 9000, w * 9000 + 25000) for w in range(10)],
        "w_id long, start_ep long, end_ep long")
    sections.append(summarize(
        engine.range_join(facts, wins, ts="ep", bucket_s=10000),
        "range_join (interval): bucket-cover broadcast EQUI-join + BETWEEN refine "
        "(no BroadcastNestedLoopJoin from the inequality)"))

    # embedding operators against a real parquet table (column pruning
    # + the slim-key candidate join are the audit targets)
    emb_path = args.points + "_emb"
    if not os.path.isdir(emb_path):
        from geotile import textops
        docs = synth.synth_docs_skew(spark, 2000, partitions=8)
        (textops.text_embedding(docs, dim=32)
         .select(F.col("doc_id").alias("vec_id"), "embedding", F.lit("x").alias("extra"))
         .write.mode("overwrite").parquet(emb_path))
    emb = spark.read.parquet(emb_path)
    from geotile import simsearch, textops
    sections.append(summarize(
        simsearch.cosine_near_dup_pairs(emb, threshold=0.8),
        "cosine_near_dup_pairs: SLIM (id, t, bk) self-join — no vector payload in "
        "the candidate shuffle; vectors re-attach once per unique pair (scans "
        "prune to vec_id+embedding; 'extra' never read)"))
    docs_tbl = synth.synth_docs_skew(spark, 500, partitions=4)
    sections.append(summarize(
        textops.text_embedding(docs_tbl, dim=32),
        "text_embedding: ONE narrow Arrow pass, zero Exchange (map-only stage "
        "ahead of the bucketed ANN joins)"))

    sections.append(summarize(
        engine.tile_pyramid(points, min_zoom=3, max_zoom=8),
        "tile_pyramid: all zoom levels in ONE scan — native tile math, integer "
        "parent division, single partially-aggregated shuffle, zero Python"))
    # stored-index ANN probe: table partitioned by precomputed bucket
    bkt_path = args.points + "_bkt"
    if not os.path.isdir(bkt_path):
        (simsearch.with_lsh_bucket(emb.select("vec_id", "embedding"), 32, nbits=6)
         .write.mode("overwrite").partitionBy("bucket").parquet(bkt_path))
    stored = spark.read.parquet(bkt_path)
    qv = [float(x) for x in emb.select("embedding").first()[0]]
    sections.append(summarize(
        simsearch.lsh_bucket_topk(stored, qv, k=5, nbits=6),
        "lsh_bucket_topk (stored index): probe IN list prunes the bucket "
        "partition column at the scan — no Python, ~probes/2^nbits of data read"))

    # DBSCAN pair generation (the engine loop is eager — audit the
    # candidate-pair stage it builds: per-point eps-box cover explode,
    # cell equi-join, native haversine refine BEFORE any aggregation)
    pid_pts = points.select(F.col("url").alias("pid"), "lat", "lon")
    pts_c = engine.with_cell(pid_pts, nchars=2)
    cov = pts_c.select(
        F.col("pid").alias("a"), F.col("lat").alias("_alat"), F.col("lon").alias("_alon"),
        F.explode(_udfs.eps_cover_cells_udf(2, 300000.0)(F.col("lat"), F.col("lon"))).alias("geohash"))
    other = pts_c.select(F.col("pid").alias("b"), F.col("lat").alias("_blat"),
                         F.col("lon").alias("_blon"), "geohash")
    dbscan_pairs = (cov.join(other, "geohash")
                    .where(F.col("a") != F.col("b"))
                    .where(_udfs.haversine_col(F.col("_alat"), F.col("_alon"),
                                               F.col("_blat"), F.col("_blon")) <= 300000.0)
                    .groupBy("a").agg(F.count("*").alias("_n")))
    sections.append(summarize(
        dbscan_pairs,
        "dbscan (pair stage): eps-box cover explode -> ONE cell equi-join, native "
        "haversine refine map-side before the degree aggregate — never all-pairs"))

    sections.append(summarize(
        textops.bm25_topk(docs_tbl, ["the", "a"], k=5),
        "bm25_topk: tokens filtered to query terms BEFORE the (doc,term) shuffle; "
        "doc-frequency side broadcast; TakeOrdered top-k, no global sort (the one "
        "BroadcastNestedLoopJoin is the 1-ROW corpus-stats scalar attach — a "
        "constant cross join, not a predicate join)"))

    sections.append(summarize(
        textops.repetition_features(docs_tbl),
        "repetition_features: pure array expressions — map-only, ZERO Exchange, "
        "zero Python"))

    docs_src = docs_tbl.withColumn(
        "source", F.concat(F.lit("src"), (F.col("doc_id") % 5).cast("string")))
    sections.append(summarize(
        textops.source_quota(docs_src, quota=5),
        "source_quota: integer quality score in the map pass, ONE hash shuffle "
        "on the host key, windowed top-N — pruned scan reads only "
        "(doc_id, text, source)"))

    sections.append(summarize(
        textops.collocations(docs_tbl, min_count=2, k=20),
        "collocations: linear bigram explode, two partial-agg shuffles, "
        "vocabulary-sized unigram table BROADCAST to both join sides, "
        "TakeOrdered top-k (never a global sort), zero Python"))

    # multi-source BFS (graph.bfs_hops's loop is eager — audit ONE
    # round's shape: the SMALL frontier joins the persisted edge list,
    # then hash anti-joins the visited set; shuffle volume tracks the
    # frontier's out-edges, never the full corpus)
    ed_bfs = facts.select(F.col("ep").alias("u"),
                          (F.col("ep") * 7 % 100000).alias("v"))
    frontier = facts.select(F.col("ep").alias("node")).limit(64)
    dist_b = frontier.withColumn("hops", F.lit(0))
    bfs_round = (frontier.join(ed_bfs, frontier["node"] == ed_bfs["u"])
                 .select(F.col("v").alias("node")).distinct()
                 .join(dist_b, "node", "left_anti")
                 .withColumn("hops", F.lit(1)))
    sections.append(summarize(
        bfs_round,
        "bfs_hops (one round): frontier-sized join against the persisted edge "
        "list + anti-join on the visited set — per-round shuffle bounded by the "
        "frontier's out-edge count, never the corpus"))

    # behavioral analytics over an events-shaped frame
    from geotile import behavior

    ev_b = facts.select(F.col("url").alias("user_id"), "ep",
                        F.concat(F.lit("t"),
                                 (F.col("ep") % 3).cast("string")).alias("event_type"))
    sections.append(summarize(
        behavior.cohort_retention(ev_b, bucket_s=10000),
        "cohort_retention: (user, bucket) distinct partial-aggregates map-side, "
        "first-bucket table joins back, one (cohort, offset) count — no windows"))
    sections.append(summarize(
        behavior.funnel(ev_b, ["t0", "t1", "t2"]),
        "funnel: each step filtered to ONE event type before its shuffle, "
        "joined to the previous step's shrinking reached set; all step counts "
        "union into a single plan (one action)"))

    # trajectory / mobility operators (round 4)
    from geotile import graph as graph_mod
    from geotile import trajectory

    traj = facts.select(
        (F.col("ep") % 50).alias("user_id"), F.col("ep").alias("tts"),
        F.col("ep").alias("event_id"),
        ((F.col("ep") % 160) - 80.0).alias("lat"),
        ((F.col("ep") % 340) - 170.0).alias("lon"))
    sections.append(summarize(
        trajectory.speed_filter(traj, ts="tts"),
        "speed_filter: ONE per-key window shuffle, native haversine lag "
        "distance — zero Python, map-side everything else"))
    sections.append(summarize(
        trajectory.stay_points(traj, ts="tts"),
        "stay_points: lag -> boundary flag -> running sum -> one aggregate "
        "(sessionize's shape); snapped-int centroid sums are "
        "order-independent"))
    traj_c = engine.with_cell(traj)
    sections.append(summarize(
        trajectory.od_matrix(traj_c, ts="tts"),
        "od_matrix: per-key lag window, then the (o, d) count collapses "
        "map-side — the flow table is occupied-cell-pair sized"))
    sections.append(summarize(
        trajectory.colocation_pairs(traj_c, ts="tts"),
        "colocation_pairs: DISTINCT (key, cell, bucket) first, hot buckets "
        "capped and dropped, THEN the bucket self-join — quadratic fan-out "
        "bounded per bucket, never all-pairs"))

    ed_tri = facts.select(F.col("ep").alias("src"),
                          (F.col("ep") * 7 % 100000).alias("dst"))
    sections.append(summarize(
        graph_mod.triangle_counts(ed_tri),
        "triangle_counts: canonical low->high edge set persisted (3 readers), "
        "ordered-wedge join closed against it, corners credited via explode — "
        "per-key fan-out bounded by low-vertex degree (degree orientation is "
        "the documented 100 TB upgrade)"))

    sections.append(summarize(
        textops.char_entropy(docs_tbl),
        "char_entropy: the per-character explode NEVER shuffles — the "
        "(doc, char) groupBy partial-aggregates map-side, so the exchange "
        "carries doc x alphabet rows; integer nano terms sum "
        "order-independently"))

    sections.append(summarize(
        trajectory.session_trip_stats(traj, ts="tts"),
        "session_trip_stats: session boundary + leg haversine fused in ONE "
        "window pass — a single per-key shuffle + one aggregate"))

    blp = textops.bigram_logprob(docs_tbl)
    sections.append(summarize(
        blp,
        "bigram_logprob: narrow bigram explode recomputed for the scoring "
        "join (cheaper than caching the corpus-sized intermediate); the "
        "persisted distinct-bigram stats table is the only cached frame"))
    from geotile import cache as _cache2

    _cache2.release(blp)

    hh = textops.heavy_hitter_tokens(docs_tbl, phi=0.01)
    sections.append(summarize(
        hh,
        "heavy_hitter_tokens: Misra-Gries candidates via mapInPandas (no "
        "shuffle), then ONE aggregation where non-candidates collapse into "
        "a NULL bucket — map-side partials are <= k+1 keys; total attaches "
        "as a 1-row broadcast"))
    from geotile import cache as _cache

    _cache.release(hh)

    from geotile import simsearch as _ss

    emb_tbl = spark.read.parquet(os.path.join(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        "embeddings.parquet")) if os.path.exists(os.path.join(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        "embeddings.parquet")) else None
    if emb_tbl is not None:
        sections.append(summarize(
            _ss.scalar_quantize(emb_tbl),
            "scalar_quantize: posexplode pass + DIM-sized min/max aggregate "
            "broadcast back — the join side is 64 rows, never a shuffle of "
            "the vectors"))

    # round-5 operators
    from geotile.kernel import hex_np as _hex

    rad97 = 2.5 * 3.0 ** 0.5 * _hex._res_size(2)
    cells97 = _hex.disk_geodesic(10.8123, 58.2825, 2, rad97)
    ddf97 = spark.createDataFrame([(0, int(c)) for c in cells97],
                                  "query_id long, h2 long")
    posh = points.withColumn("h2", _udfs.hex_cell_udf(2)(F.col("lat"), F.col("lon")))
    sections.append(summarize(
        posh.join(F.broadcast(ddf97), "h2")
        .groupBy("query_id").agg(F.count("*").alias("n")),
        "crossface_hex_disk (q97 shape): driver-built geodesic disk BROADCAST "
        "to the hex-binned positions — the points table never shuffles; Python "
        "only in the binning kernel (one Arrow pass)"))

    tri_o = graph_mod.triangle_counts_oriented(ed_tri)
    sections.append(summarize(
        tri_o,
        "triangle_counts_oriented: degree-rank orientation — same wedge/close "
        "join core as triangle_counts, but per-key fan-out is the ORIENTED "
        "out-degree, bounded O(sqrt m) under any hub skew (bench records the "
        "wedge counts under both orientations)"))

    blp2 = textops.bigram_logprob(docs_tbl, min_count=2)
    sections.append(summarize(
        blp2,
        "bigram_logprob(min_count=2): identical plan plus ONE Filter on the "
        "stats aggregate — at corpus scale the floored model table is bounded "
        "and broadcastable"))
    _cache2.release(blp2)

    sections.append(summarize(
        engine.morans_i(points.select("lat", "lon")),
        "morans_i: points touched ONCE by the lattice count; all later "
        "frames are occupied-cell-sized; corpus stats attach as 1-row "
        "broadcasts (the BroadcastNestedLoopJoins are constant attaches, "
        "not predicate joins)"))

    sections.append(summarize(
        textops.decontaminate(
            docs_tbl.where(F.col("doc_id") % 29 != 0),
            docs_tbl.where(F.col("doc_id") % 29 == 0), n=3),
        "decontaminate: eval gram set BROADCAST, corpus side map-only explode "
        "+ broadcast semi-join — the corpus NEVER shuffles; the only exchange "
        "is the per-doc countDistinct over MATCHED grams, and the hit counts "
        "broadcast back onto the id spine"))

    if emb_tbl is not None:
        sdd = _ss.semdedup(emb_tbl, threshold=0.35, n_centroids=8, sample=512)
        sections.append(summarize(
            sdd,
            "semdedup: k-means bucket assignment (one Arrow pass), "
            "within-bucket pair join on the cluster id (quadratic cost "
            "bounded per bucket — raise n_centroids at scale, never "
            "all-pairs), components via star-contraction; the spine "
            "joins are deliberately UNHINTED SortMergeJoins — the dup "
            "population can be corpus-scale (SemDeDup drops ~50%), so "
            "AQE decides at runtime from the checkpointed CC output's "
            "real size, converting to broadcast when it is small"))
        kg = _ss.knn_graph(emb_tbl, k=5)
        sections.append(summarize(
            kg,
            "knn_graph: bucketed candidate join (never all-pairs), "
            "per-vector top-k via a bucket-local ROW_NUMBER window — "
            "the sort operand is one vector's candidate list, no "
            "global sort"))
        _cache.release(kg)
        _cache.release(sdd)

        pq_cents = _ss.train_pq(emb_tbl, m=4, ksub=8, sample=128)
        pq_q = [0.0] * (pq_cents.shape[0] * pq_cents.shape[2])
        sections.append(summarize(
            _ss.pq_adc_topk(emb_tbl, pq_q, pq_cents, topk=10),
            "pq_adc_topk (q119): one narrow Arrow encoding pass, then a "
            "map-only literal-LUT scan (no join, no shuffle) feeding "
            "TakeOrdered — the codes table is ~64x smaller than the raw "
            "vectors at scale"))

    # round-5 late additions (q108-q110)
    fence = ["9q", "9r"]
    sections.append(summarize(
        trajectory.geofence_transitions(
            engine.with_cell(traj, nchars=6), fence, nchars=2, ts="tts"),
        "geofence_transitions (q108): membership = substring-isin against a "
        "tiny literal prefix set (geohash prefixes nest — no spatial join at "
        "transition time); ONE per-key window shuffle, transition filter "
        "before anything downstream"))

    qk = engine.with_quadkey(traj, zoom=8)
    sections.append(summarize(
        qk.groupBy(F.substring("quadkey", 1, 4).alias("qk4"))
        .agg(F.count("*").alias("n")),
        "quadkey rollup (q109): base-4 Mercator key is unrolled native "
        "shift/concat expressions (zero Python, zero shuffle to tile); the "
        "zoom-4 ancestor is substring, so every pyramid level is a map over "
        "the same column + one aggregate"))

    sections.append(summarize(
        textops.boilerplate_ngrams(
            docs_tbl.withColumn("source",
                                (F.col("doc_id") % 7).cast("string"))),
        "boilerplate_ngrams (q110): per-source gram df via one distinct "
        "shuffle, the df-thresholded BOILERPLATE set (template-sized, tiny) "
        "joins back by BROADCAST — the corpus gram frame never shuffles a "
        "third time; per-source doc counts attach as a |sources|-row "
        "broadcast"))

    sections.append(summarize(
        textops.pack_sequences(
            docs_tbl.withColumn("source",
                                (F.col("doc_id") % 7).cast("string")),
            ctx=512),
        "pack_sequences (q111): ONE per-source window shuffle carries the "
        "running token offset; token count and both chunk indices are "
        "native expressions (size/split, integer DIV) inside whole-stage "
        "codegen — no second pass, no Python"))

    sections.append(summarize(
        textops.source_mixing_weights(
            docs_tbl.withColumn("source",
                                (F.col("doc_id") % 7).cast("string")),
            alpha=0.5),
        "source_mixing_weights (q112): one count aggregate (map-side "
        "partials) collapses the corpus to a |sources|-row frame; the "
        "corpus totals attach as a 1-row BROADCAST, every weight is "
        "integer arithmetic on that micro-frame"))

    sections.append(summarize(
        trajectory.bearing_sectors(traj, nsect=8, ts="tts"),
        "bearing_sectors (q113): the SAME single per-key window exchange "
        "every trajectory operator rides (lag lat/lon), bearing + sector "
        "all native trig expressions, then a (key, sector) aggregate that "
        "partial-aggregates map-side — zero Python"))

    # trivial-lineage input so the op counts show the OPERATOR's shape,
    # not the audit fixture's upstream expressions
    visits = spark.range(0, 20000).select(
        (F.col("id") % 500).alias("user_id"),
        F.concat(F.lit("g"), (F.col("id") % 300).cast("string"))
        .alias("geohash"))
    cj = trajectory.covisit_jaccard(visits, nchars=4, max_cell_users=100,
                                    min_shared=2)
    sections.append(summarize(
        cj,
        "covisit_jaccard (q114): DISTINCT (key, cell) collapse map-side "
        "then persisted — the cap guard, both posting-join sides, and the "
        "size table all read the ONE materialized visit frame at runtime "
        "(EXPLAIN reprints the cached lineage under each reference, so "
        "raw op counts here overstate the executed plan); df-capped "
        "posting self-join (never all-pairs — fan-out per cell bounded "
        "by the cap), min_shared filter BEFORE the two slim size-attach "
        "joins"))
    _cache.release(cj)

    sections.append(summarize(
        trajectory.radius_of_gyration(traj),
        "radius_of_gyration (q115): one keyed centroid aggregate, one "
        "same-key join to re-attach centroids, one keyed final aggregate — "
        "haversine native, every aggregate operand an exact int64"))

    sections.append(summarize(
        trajectory.visit_entropy(visits, nchars=4),
        "visit_entropy (q116): the (key, cell) count partial-aggregates "
        "map-side (first shuffle operand = key x distinct-cells, not the "
        "fix log); totals re-attach by a slim same-key join; nano-bit "
        "terms floor to ints before the order-independent final sum"))

    sections.append(summarize(
        trajectory.anchor_cells(
            visits.withColumn("ep", (F.col("user_id") * 7919) % 86400),
            nchars=4),
        "anchor_cells (q117): the fix log is touched once by a "
        "(key, daypart, cell) count that partial-aggregates map-side; "
        "the row_number argmax and the two-column pivot shuffle only "
        "the collapsed count frame"))

    go = engine.getis_ord(points.select("lat", "lon"))
    sections.append(summarize(
        go,
        "getis_ord (q118): inherits cell_density_smooth's shape — points "
        "touched once by the lattice count, every later shuffle moves "
        "occupied-cell frames bounded by 2^13; the corpus moments attach "
        "as a 1-row broadcast"))
    _cache.release(go)

    # round-5 final additions (q120-q122)
    from geotile import udfs as _udfs

    docs_cells = synth.synth_docs_skew(spark, 2000, partitions=8).select(
        "text",
        _udfs.geohash_udf(1)(
            (((F.col("doc_id") * 7919 + 11) % 160000) / F.lit(1000.0) - 80.0),
            (((F.col("doc_id") * 104729 + 5) % 340000) / F.lit(1000.0) - 170.0),
        ).alias("cell"))
    ctt = textops.cell_top_terms(docs_cells, k=5)
    sections.append(summarize(
        ctt,
        "cell_top_terms (q120): ONE corpus-token shuffle builds the "
        "(cell, term) tf frame (count partial-aggregates map-side), "
        "PERSISTED — its three consumers (score join, df_t, N_cells) "
        "read the materialized frame at runtime (EXPLAIN reprints the "
        "cached lineage under each reference, so raw op counts here "
        "overstate the executed plan); the idf join is collapsed-frame "
        "x vocab and the top-k window sorts only the collapsed frame"))
    _cache.release(ctt)

    hil = (points.select(
        F.expr("CAST(floor((lat + 90.0) * (256.0/180.0)) AS BIGINT) AS ix"),
        F.expr("CAST(floor((lon + 180.0) * (256.0/360.0)) AS BIGINT) AS iy"))
        .withColumn("hd", _udfs.hilbert_udf(8)(F.col("ix"), F.col("iy")))
        .withColumn("curve_bucket", F.expr("hd DIV 256")))
    sections.append(summarize(
        hil,
        "hilbert_locality (q121): map-only — native integer quantization "
        "feeds one Arrow pass (the bit-interleave kernel family), bucket "
        "key a native DIV; NO exchange anywhere.  At 100 TB the index is "
        "written as a sort/cluster key so rectangle queries prune to "
        "O(perimeter) contiguous bucket ranges"))

    from functools import reduce as _reduce
    from operator import or_ as _or
    from geotile.kernel.hilbert_np import hilbert_ranges as _hranges

    _rng = _hranges(100, 140, 33, 87, order=8)
    sections.append(summarize(
        hil.where(_reduce(_or, [F.col("hd").between(a, b) for a, b in _rng])),
        "hilbert_range_scan (q123): the q121 map-only plan plus a "
        "driver-side literal range predicate (44 BETWEENs for this box "
        "— bounded by query area, never data) — still zero exchanges; "
        "on a Hilbert-clustered table the same predicate prunes files "
        "by min/max stats before any row is read"))

    klo = textops.source_kl_drift(
        synth.synth_docs_skew(spark, 2000, partitions=8).withColumn(
            "source", F.concat(F.lit("s"), (F.col("doc_id") % 8).cast("string"))))
    sections.append(summarize(
        klo,
        "source_kl_drift (q122): ONE corpus-token shuffle builds the "
        "(source, token) count frame, PERSISTED — corpus totals, "
        "per-source totals, and the term join all read the materialized "
        "frame at runtime (EXPLAIN reprints cached lineage; raw op "
        "counts overstate the executed plan); the token-keyed re-join "
        "moves two vocab-sized frames, never the corpus; per-source sum "
        "of int64 nano-nat terms"))
    _cache.release(klo)

    dsw = textops.dsir_weights(
        synth.synth_docs_skew(spark, 2000, partitions=8).withColumn(
            "source", F.concat(F.lit("s"), (F.col("doc_id") % 8).cast("string"))),
        target=F.col("source") == "s0")
    sections.append(summarize(
        dsw,
        "dsir_weights (q124): the bigram explode is a NARROW recompute "
        "per consumer (q94 discipline — cheaper than caching a "
        "corpus-sized frame); the full-corpus stats table is the one "
        "PERSISTED intermediate (EXPLAIN reprints cached lineage); the "
        "term table is target-vocab-sized — a seed set's bigrams — so "
        "at 100 TB it broadcasts into the scoring join"))
    _cache.release(dsw)

    hll = textops.hll_registers(
        synth.synth_docs_skew(spark, 2000, partitions=8).withColumn(
            "source", F.concat(F.lit("s"), (F.col("doc_id") % 8).cast("string"))),
        group="source")
    sections.append(summarize(
        hll,
        "hll_registers (q125): ONE narrow Arrow hash pass then ONE "
        "partially-aggregated shuffle whose operand collapses map-side "
        "to <= groups x 64 register rows per task — the mergeable-sketch "
        "minimum; rank via native conv() bit length, no UDF after the "
        "shared token hash"))

    from geotile import graph as _graph
    _docs_g = synth.synth_docs_skew(spark, 2000, partitions=8) \
        .select("doc_id")
    _edges_g = _docs_g.select(
        F.col("doc_id").alias("src"),
        F.pmod(F.xxhash64(F.col("doc_id") * 3), F.lit(2000)).alias("dst")) \
        .where(F.col("src") != F.col("dst")) \
        .withColumn("w", F.pmod(F.xxhash64(F.col("src") + F.col("dst")),
                                F.lit(9)) + 1)
    ssp = _graph.shortest_paths(
        _edges_g, _docs_g.where(F.col("doc_id") % 500 == 0)
        .select(F.col("doc_id").alias("node")), max_rounds=4)
    sections.append(summarize(
        ssp,
        "shortest_paths (q126): frontier-only Bellman-Ford — per round "
        "the shuffle is the IMPROVED frontier's out-edges joined against "
        "the persisted edge list (InMemoryTableScan), min-candidate "
        "collapsed map-side, micro-frames coalesced + lineage-truncated "
        "(the bfs_hops discipline); the printed plan is the final-round "
        "checkpoint scan, which is the point — no O(rounds) lineage"))
    _cache.release(ssp)

    pmeas = engine.polygon_measures(spark.createDataFrame(
        [(i, [10.0 + i, 20.0 + i, 10.5 + i], [40.0, 45.0, 50.0])
         for i in range(200)],
        "poly_id long, poly_lat array<double>, poly_lon array<double>"))
    sections.append(summarize(
        pmeas,
        "polygon_measures (q128): MAP-ONLY — zero exchanges, zero "
        "UDFs; the shoelace fold is native transform/aggregate over "
        "the vertex arrays inside whole-stage codegen, so a "
        "billion-polygon table streams through scan-project"))

    bdocs = synth.synth_docs_skew(spark, 2000, partitions=8)
    bwords = textops.bloom_build(bdocs.where(F.col("doc_id") % 2 == 0))
    bwords.persist().count()
    bm = textops.bloom_member(bdocs, bwords)
    sections.append(summarize(
        bm,
        "bloom_member (q129): the words table (<= m/64 rows) BROADCASTS "
        "(BroadcastHashJoin) so the probe side never shuffles for the "
        "lookup — one map-side k-row explode and a per-doc min; "
        "bloom_build itself is one bit_or aggregate whose exchange "
        "operand is <= m/64 rows per task"))
    bwords.unpersist()

    strat = textops.stratified_split(
        synth.synth_docs_skew(spark, 2000, partitions=8).withColumn(
            "source", F.concat(F.lit("s"), (F.col("doc_id") % 8)
                               .cast("string"))), seed=3)
    sections.append(summarize(
        strat,
        "stratified_split (q130): ONE window shuffle on the stratum key "
        "— rank in xxhash order plus the per-stratum count ride the SAME "
        "window exchange; the exact-count contract is what buys the "
        "sort, and membership stays a pure function of (key, seed) so "
        "repartitioning never moves a doc (q49's Bernoulli split is the "
        "shuffle-free approximate dual)"))

    eh = engine.emerging_hotspots(
        engine.with_cell(traj).withColumn("ep", F.col("tts")))
    sections.append(summarize(
        eh,
        "emerging_hotspots (q131): raw fixes collapse to the (cell, day) "
        "count frame in ONE partially-aggregated shuffle; the Mann-"
        "Kendall pair self-join runs on that persisted COLLAPSED frame "
        "(InMemoryTableScan x2) with per-cell fan-out days^2 — "
        "independent of how many billions of events a cell saw"))
    _cache.release(eh)

    sd_old = traj.select("user_id", F.col("tts").alias("ts"),
                         F.col("lat").cast("string").alias("cell")) \
        .groupBy("user_id").agg(F.max("cell").alias("cell"))
    sd_new = sd_old.withColumn(
        "cell", F.when(F.col("user_id") % 7 == 0, F.lit("moved"))
        .otherwise(F.col("cell")))
    sections.append(summarize(
        table.snapshot_diff(sd_old, sd_new, "user_id", ["cell"]),
        "snapshot_diff (q132): ONE co-partitioned full-outer shuffle on "
        "the key (plain USING-join — an eqNullSafe key would disable "
        "bucket co-partitioning); with both snapshots bucketed the SMJ "
        "runs with ZERO Exchange (plan-asserted in test_pipeline), and "
        "the output is churn-sized, never table-sized"))

    mm_lines = spark.createDataFrame(
        [(0, [10.0, 10.5, 11.0], [20.0, 20.5, 20.0]),
         (1, [-30.0, -30.5], [40.0, 40.5])],
        "line_id long, line_lat array<double>, line_lon array<double>")
    sections.append(summarize(
        engine.map_match(engine.with_cell(traj), mm_lines, radius_m=20000.0),
        "map_match (q134): the q51 broadcast-cover prefix join "
        "(BroadcastHashJoin, pruned scan — segments are the small dim "
        "side by contract), native equirect refine, then ONE struct-min "
        "aggregate on the point key — partial-aggregates map-side, so "
        "the exchange operand is one row per matched point and there is "
        "NO window shuffle anywhere"))

    hp = trajectory.hausdorff_pairs(traj, scale=16)
    sections.append(summarize(
        hp,
        "hausdorff_pairs (q133): fixes collapse to DISTINCT (key, cell) "
        "first (persisted — the q131 discipline), so the candidate self-"
        "join and the |A|x|B| cross frame are bounded by activity AREAS, "
        "not fix counts; the cross frame persists once and feeds both "
        "directed max-min ladders; distances are native haversine over "
        "cell centers, floored to exact integer meters"))
    _cache.release(hp)

    sections.append(summarize(
        trajectory.route_ngrams(engine.with_cell(traj), ts="tts", min_count=1),
        "route_ngrams (q135): ONE per-key window shuffle carries the "
        "dwell-collapse lag AND both leads (same partitioning reused — "
        "no second exchange between the windows); the trigram count "
        "partial-aggregates map-side to the corridor vocabulary"))

    sections.append(summarize(
        trajectory.od_travel_times(engine.with_cell(traj), ts="tts"),
        "od_travel_times (q137): identical shape to od_matrix — one "
        "per-key window (lag x2 in the same frame), then one (o, d) "
        "aggregate whose exchange operand has already collapsed "
        "map-side to the occupied-cell-pair frame"))

    co = trajectory.cell_occupancy(engine.with_cell(traj), ts="tts")
    sections.append(summarize(
        co,
        "cell_occupancy (q140): ONE fix-sized shuffle (the per-key "
        "window; the visit groupBy reuses its hash partitioning — "
        "user_id is a subset of the grouping key); the sweep deltas, "
        "per-cell running sum, and both final aggregates all run on "
        "the visit-BOUNDARY frame (2 rows per visit), so a hot cell "
        "costs its visit count, never its fix count"))
    _cache.release(co)

    sections.append(summarize(
        textops.feature_corr(
            spark.range(0, 5000).select(
                (F.col("id") % 6).cast("string").alias("source"),
                F.pmod(F.xxhash64("id"), F.lit(500)).alias("x"),
                F.pmod(F.xxhash64(F.col("id") + 9), F.lit(500)).alias("y")),
            "x", "y"),
        "feature_corr (q155): ONE partially-aggregated Exchange "
        "carries all five moment sums; the rational moments and the "
        "micro-r are map-side projections over the k-group frame"))

    sections.append(summarize(
        engine.rendezvous_shards(
            spark.range(0, 5000).withColumnRenamed("id", "doc_id")),
        "rendezvous_shards (q156): the HRW scoring is a literal "
        "9-element array_max over native xxhash64 columns — map-only, "
        "no join, no explode; the ONLY Exchange is the final "
        "8x9-key movement-matrix aggregate"))

    sections.append(summarize(
        trajectory.turn_stats(traj, ts="tts"),
        "turn_stats (q157): ONE per-key window shuffle carries both "
        "lags; the integer cross product and its sign classes are "
        "map-side projections and the per-key rollup partial-"
        "aggregates — no trig, no Python, no second exchange"))

    sections.append(summarize(
        textops.prefix_policy(
            spark.range(0, 5000).select(
                F.concat(F.lit("h"), (F.col("id") % 9).cast("string"),
                         F.lit(".com/p/"),
                         (F.col("id") % 13).cast("string")).alias("url")),
            [(1, "h1.com/", "allow"), (2, "h1.com/p/3", "deny"),
             (3, "h2.com/p/", "throttle")]),
        "prefix_policy (q158): the LPM probe is literal maps per "
        "prefix length coalesced longest-first — ZERO joins, ZERO "
        "explode, map-only until the single rule-count aggregate"))

    sections.append(summarize(
        textops.kwic(
            spark.range(0, 3000).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("alpha beta hit gamma "),
                         (F.col("id") % 7).cast("string")).alias("text")),
            ["hit"]),
        "kwic (q159): ZERO Exchange — posexplode of the token array "
        "pipelines into the literal-term filter; contexts are native "
        "slice/array_join on the same array, no self-join, no window"))

    sections.append(summarize(
        engine.polygon_overlap(
            spark.createDataFrame(
                [(0, [0.01, 0.01, 10.01, 10.01], [0.01, 10.01, 10.01, 0.01]),
                 (1, [5.01, 5.01, 15.01, 15.01], [5.01, 15.01, 15.01, 5.01])],
                "poly_id long, poly_lat array<double>,"
                " poly_lon array<double>"),
            scale=2),
        "polygon_overlap (q160): the fills are zero-exchange generated "
        "lattices; the overlay shuffles on the CELL key only (one "
        "equi-join + one pair aggregate) and the size table broadcasts "
        "— geometry never joins geometry"))

    sections.append(summarize(
        textops.postings_compression(
            spark.range(0, 4000).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("tok"), (F.col("id") % 700).cast("string"),
                         F.lit(" common")).alias("text"))),
        "postings_compression (q161): distinct collapse, lag window, "
        "and per-token aggregate ALL key on the token; the bucket "
        "rollup exchanges <= 21 rows — no float log, no Python"))

    sections.append(summarize(
        engine.parse_latlon(
            spark.range(0, 4000).select(
                F.concat((F.col("id") % 200 - 100).cast("string"),
                         F.lit(".5,"),
                         (F.col("id") % 400 - 200).cast("string"),
                         F.lit(".25")).alias("raw"))),
        "parse_latlon (q162): ZERO Exchange — regexp_extract, "
        "try_cast, the class CASE, and the micro-degree snap are all "
        "map-side native expressions"))

    sections.append(summarize(
        textops.dup_chunk_ratio(synth.synth_docs_skew(
            spark, 1500, partitions=8)),
        "dup_chunk_ratio (q163): chunk multiplicity and the join back "
        "share the chunk key (group sizes = duplication factor); the "
        "per-doc rollup is the only other exchange — no Python, no "
        "collect"))

    sections.append(summarize(
        textops.mad_outliers(
            spark.range(0, 5000).select(
                (F.col("id") % 6).cast("string").alias("source"),
                F.pmod(F.xxhash64("id"), F.lit(900)).alias("x"))),
        "mad_outliers (q164): every exchange keys on the group — two "
        "rank windows for the low medians, two one-row-per-group join "
        "backs, one rollup; no interpolation, no Python"))

    import shutil as _sh
    import tempfile as _tf
    _pdir = os.path.join(_tf.gettempdir(), "geotile_audit_q165")
    _sh.rmtree(_pdir, ignore_errors=True)
    spark.range(0, 2000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 8).alias("bucket")).write.partitionBy(
        "bucket").parquet(_pdir)
    sections.append(summarize(
        spark.read.parquet(_pdir).where(F.col("bucket").isin(1, 3, 6))
        .groupBy("bucket").agg(F.count("*").alias("n")),
        "partition_pruned_scan (q165): the bucket IN filter lands in "
        "PartitionFilters — directory pruning, five of eight "
        "partitions never scanned (see the scan line below)"))
    _sh.rmtree(_pdir, ignore_errors=True)

    from geotile import graph as _lp_graph

    _lp_nodes = spark.range(0, 3000).select(F.col("id").alias("node"))
    _lp_edges = spark.range(0, 3000).select(
        F.col("id").alias("src"),
        F.pmod(F.xxhash64("id"), F.lit(3000)).alias("dst")).where(
        F.col("src") != F.col("dst"))
    _lp = _lp_graph.label_propagation(_lp_nodes, _lp_edges, iters=3)
    sections.append(summarize(
        _lp,
        "label_propagation (q166): one edge-keyed join + one vote "
        "aggregate + one argmin-struct pick per round — the "
        "pagerank/bfs one-shuffle-per-round budget; edges persisted "
        "once, labels lineage-truncated"))
    _cache.release(_lp)

    sections.append(summarize(
        trajectory.revisit_rates(engine.with_cell(traj), ts="tts"),
        "revisit_rates (q154): the shared q140 visit collapse (one "
        "fix-sized window shuffle), then the return-gap lag and the "
        "per-cell aggregate run on INTERVAL rows — a cell's cost is "
        "its visit count, never its fix count"))

    ed = textops.edit_verified_pairs(
        synth.synth_docs_skew(spark, 1500, partitions=8), max_dist=150)
    sections.append(summarize(
        ed,
        "edit_verified_pairs (q153): the banded-MinHash generator "
        "produces slim deduped (a, b) candidates FIRST; text attaches "
        "once per unique pair and the native levenshtein verify is "
        "map-side — the O(|a| x |b|) cost never touches a non-"
        "candidate pair"))
    _cache.release(ed)

    sections.append(summarize(
        trajectory.cell_trend(engine.with_cell(traj), ts="tts"),
        "cell_trend (q151): one (cell, day) partial-agg collapses the "
        "fixes, one (cell) aggregate collapses the days; the OLS "
        "slope is five integer sums in the same aggregate — no "
        "window, no sort, no iteration"))

    sections.append(summarize(
        engine.k_anonymize_cells(engine.with_cell(traj), k=5),
        "k_anonymize_cells (q149): each ladder rung is one DISTINCT "
        "(cell_p, user) partial-agg collapsed to an occupied-cell "
        "support table that BROADCASTS; the fixes stream ONCE through "
        "the chained BroadcastHashJoins and one aggregate groups the "
        "published cells — no fix-sized shuffle after the rungs"))

    cm = textops.count_min(synth.synth_docs_skew(spark, 2000, partitions=8))
    sections.append(summarize(
        cm,
        "count_min (q148): one exact (token, n) partial-agg shuffle "
        "(persisted — truth and sketch both read it); the <= depth x "
        "width counter table BROADCASTS into the probe join, so "
        "estimation never shuffles the vocabulary again"))
    _cache.release(cm)

    sections.append(summarize(
        engine.polygon_fill(
            spark.createDataFrame(
                [(0, [20.00037, 60.00071, 20.00049],
                  [90.00031, 120.00017, 150.00023])],
                "poly_id long, poly_lat array<double>,"
                " poly_lon array<double>"),
            scale=2),
        "polygon_fill (q147): ZERO Exchange — each polygon is one "
        "spark.range over its bbox lattice (div/mod to 2-D) filtered "
        "by the literal-vertex ray cast entirely inside "
        "whole-stage codegen; parts union without a shuffle"))

    sections.append(summarize(
        textops.boolean_search(
            synth.synth_docs_skew(spark, 2000, partitions=8),
            spark.createDataFrame([(1, "the"), (1, "of"), (2, "zz")],
                                  "query_id long, term string")),
        "boolean_search (q146): the broadcast query-term join filters "
        "the inverted-index frame BEFORE the (query, doc) Exchange — "
        "only matching postings shuffle, never the corpus; both "
        "BroadcastHashJoins, zero sort"))

    tb = textops.token_bursts(
        synth.synth_docs_skew(spark, 2000, partitions=8)
        .withColumn("day", (F.col("doc_id") % 14).cast("long")))
    sections.append(summarize(
        tb,
        "token_bursts (q145): one token explode into ONE partially-"
        "aggregated (token, day) sketch (persisted); token totals "
        "re-aggregate the sketch, day totals broadcast back, and the "
        "burst test is a map-side DECIMAL(38,0) cross-multiply — the "
        "corpus never shuffles twice"))
    _cache.release(tb)

    sections.append(summarize(
        trajectory.resample_track(traj, ts="tts"),
        "resample_track (q144): ONE per-key window shuffle (the lag), "
        "then the grid-tick sequence-explode and the interpolation are "
        "map-only — fan-out bounded by max_gap/step per fix pair, the "
        "caller's densification knob, never data-dependent blowup"))

    sections.append(summarize(
        engine.skyline(
            spark.range(0, 5000).select(
                F.col("id").alias("doc_id"),
                (F.col("id") % 4).cast("string").alias("source"),
                F.pmod(F.xxhash64("id"), F.lit(1000)).alias("x"),
                F.pmod(F.xxhash64(F.col("id") + 1), F.lit(1000)).alias("y")),
            "x", "y", group="source"),
        "skyline (q143): BOTH windows (strict-greater-x range frame + "
        "exact-x tie max) ride ONE Exchange on the group key — the "
        "second window is a partition-local re-sort, never a second "
        "shuffle, and there is no self-join anywhere"))

    from geotile import simsearch as _ss_mod

    km = _ss_mod.kmeans_lloyd(
        spark.range(0, 400).select(
            F.col("id").alias("vec_id"),
            F.array(*[(F.pmod(F.xxhash64(F.col("id") + i), F.lit(1000))
                       / 500.0 - 1.0) for i in range(8)]).alias("embedding")),
        k=3, iters=1)
    sections.append(summarize(
        km,
        "kmeans_lloyd (q142): the final assignment pass — centroids are "
        "LITERAL arrays (no join, no broadcast, no shuffle to score), so "
        "the only Exchange is the k-row output aggregate; each training "
        "iteration adds one k x d partial-agg collect, never a "
        "vector-frame shuffle"))
    _cache.release(km)

    sections.append(summarize(
        textops.url_dedup(
            spark.range(0, 3000).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("https://s"), (F.col("id") % 40),
                         F.lit(".ex.com/p/"), (F.col("id") % 7),
                         F.lit("?id="), (F.col("id") % 280),
                         F.when(F.col("id") % 3 == 0,
                                F.lit("&utm_source=x"))
                         .otherwise(F.lit(""))).alias("url"))),
        "url_dedup (q141): the canonicalizer is ONE map-only projection "
        "(regexp + higher-order list ops, no Python anywhere), so the "
        "single Exchange is the canonical-key aggregate — count / "
        "count-distinct / min all partial-aggregate map-side"))

    sections.append(summarize(
        textops.hist_quantiles(synth.synth_docs_skew(spark, 2000,
                                                     partitions=8)
                               .withColumn("source",
                                           F.concat(F.lit("s"),
                                                    (F.col("doc_id") % 8)
                                                    .cast("string")))
                               .withColumn("n_chars", F.length("text"))),
        "hist_quantiles (q138): ONE partially-aggregated shuffle "
        "collapses the corpus to <= groups x 256 bin counts; the "
        "cumulative window and ceil-rank argmin run on that sketch-"
        "sized frame — disjoint shards merge by adding counts"))

    from geotile import simsearch as _ss
    emb_a = spark.range(0, 2000).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.pmod(F.xxhash64(F.col("id") + i), F.lit(1000))
                   / 500.0 - 1.0) for i in range(8)]).alias("embedding"),
        F.pmod(F.col("id"), F.lit(5)).cast("int").alias("label"))
    sections.append(summarize(
        _ss.knn_classify(emb_a.where(F.col("vec_id") % 25 != 0),
                         emb_a.where(F.col("vec_id") % 25 == 0),
                         k=10, salt_mod=4),
        "knn_classify (q139): probes BROADCAST (BroadcastNestedLoop on "
        "the tiny eval side is the intended cross join — the train "
        "corpus never shuffles for scoring); the per-probe top-k runs "
        "through salted_topn's two-level pre-thin so no single probe "
        "sorts the corpus; votes and majority aggregate the k-row "
        "frame"))

    from geotile import behavior as _bh
    from geotile import graph as _gr
    from geotile import trajectory as _tj

    walk = spark.range(0, 20000).select(
        F.col("id").alias("event_id"),
        F.pmod(F.col("id"), F.lit(200)).alias("user_id"),
        (F.col("id") * 7).alias("ep"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(12000)) / 100.0 - 60.0)
        .alias("lat"),
        (F.pmod(F.xxhash64(F.col("id") + 1), F.lit(30000)) / 100.0 - 150.0)
        .alias("lon"))
    wcell = engine.with_cell(walk)

    sections.append(summarize(
        _tj.markov_transitions(wcell, nchars=4),
        "markov_transitions (q167): one per-key window (lag) on the "
        "trajectory exchange, one (o, d) count that partial-aggregates "
        "map-side, then the per-origin total/rank window runs on the "
        "COLLAPSED pair table — the fixes shuffle exactly once"))

    sections.append(summarize(
        _bh.time_weighted_avg(walk.select("user_id", "event_id", "ep",
                                          (F.pmod(F.col("event_id"), F.lit(400))
                                           / 2.0).alias("value"))),
        "time_weighted_avg (q168): ONE per-key window shuffle + one "
        "per-key aggregate; every operand an exact int64 — no Python, "
        "no second exchange"))

    sections.append(summarize(
        textops.phrase_search(synth.synth_docs_skew(spark, 2000, partitions=8),
                              ["the quick", "data point"]),
        "phrase_search (q171): the posexplode feeds a literal-array "
        "filter MAP-SIDE, so only query-term postings ever shuffle; "
        "phrase legs join on (doc, pos+offset) — near-unique keys, no "
        "skew; the filtered postings persist once across legs"))

    sections.append(summarize(
        engine.adaptive_cover(wcell, threshold=100),
        "adaptive_cover (q172): the points shuffle ONCE into the finest "
        "cell counts; every coarser level is a substring rollup of the "
        "collapsed cell table and the overflow walk joins BROADCAST "
        "parent lists (look for BroadcastHashJoin, no second "
        "points-sized Exchange)"))

    _edges = spark.range(0, 5000).select(
        F.pmod(F.col("id") * 7, F.lit(1000)).alias("src"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(1000)).alias("dst"))
    sections.append(summarize(
        _gr.kcore_peel(spark.range(0, 1000).select(F.col("id").alias("node")),
                       _edges, k=5, rounds=2),
        "kcore_peel (q177): per round one degree aggregate over the "
        "surviving edges + semi-joins on the shrinking alive set; the "
        "symmetrized edge list persists once (InMemoryTableScan), "
        "alive sets localCheckpoint so no round re-reads the raw edges"))

    sections.append(summarize(
        textops.source_js_pairs(
            synth.synth_docs_skew(spark, 2000, partitions=8)
            .withColumn("source", F.concat(F.lit("s"),
                                           (F.col("doc_id") % 10)
                                           .cast("string")))),
        "source_js_pairs (q179): one (source, token) count shuffle; the "
        "pair list and totals are broadcast-sized; per-pair KL terms "
        "come from the COLLAPSED count table joined to the tiny pair "
        "frame — fan-out quadratic in sources only, never in tokens"))

    sections.append(summarize(
        _tj.cell_changepoint(wcell, day0=0, ndays=20, nchars=4),
        "cell_changepoint (q180): the fixes shuffle once into (cell, "
        "day) counts; the days^3-per-cell pair/prefix expansion is a "
        "CONSTANT of the window, generated map-side from the collapsed "
        "table; the argmax window sorts <= ndays rows per cell"))

    sections.append(summarize(
        _tj.poi_visits(walk, [(0, 10.0, 20.0, 50000.0),
                              (1, -30.0, 40.0, 50000.0)]),
        "poi_visits (q181): stays are the collapsed dwell table (one "
        "window shuffle); the POI side is a BROADCAST literal and the "
        "haversine refine is native — the fixes never shuffle again"))

    sections.append(summarize(
        engine.spacetime_join(
            walk.select(F.col("event_id").alias("a_id"), "ep", "lat", "lon")
            .where(F.col("a_id") % 50 == 0),
            walk.select(F.col("event_id").alias("b_id"), "ep", "lat", "lon"),
            eps_m=200000.0, tau_s=3600, nchars=2),
        "spacetime_join (q190): the A side explodes to eps-box cover "
        "cells x 3 adjacent time buckets (Arrow pass + explode), the B "
        "side carries its stored (cell, bucket) — ONE equi-join with "
        "native haversine+|dt| refine, never a cross join"))

    sections.append(summarize(
        textops.quantile_normalize(
            synth.synth_docs_skew(spark, 2000, partitions=8)
            .withColumn("source", F.concat(F.lit("s"),
                                           (F.col("doc_id") % 8)
                                           .cast("string")))
            .withColumn("n_chars", F.length("text"))),
        "quantile_normalize (q186): one per-group rank window; the "
        "global side is the value-collapsed cumulative table (bounded "
        "by DISTINCT values) BROADCAST into the ceil-rank lookup — no "
        "global row_number, no single-partition sort of the corpus"))

    sections.append(summarize(
        engine.l_diversify_cells(
            engine.with_cell(walk).withColumn(
                "event_type", F.concat(F.lit("t"),
                                       (F.col("event_id") % 5)
                                       .cast("string"))), l_min=3),
        "l_diversify_cells (q195, residual ladder): per-rung DISTINCT "
        "partial-aggs over the shrinking residual, all broadcast "
        "joins (rung supports + anti-joins + final assignment) — the "
        "fixes never shuffle; same shape as k_anonymize_cells (q149)"))

    sections.append(summarize(
        engine.idw_interpolate(
            engine.with_cell(walk).withColumn(
                "value", (F.col("event_id") % 100) / 2.0),
            [(0, 10.0, 20.0, 300000.0)]),
        "idw_interpolate (q196): the q21 broadcast-cover radius join "
        "(positions never shuffle, covers driver-side) + ONE per-query "
        "aggregate of exact int64 weight terms"))

    sections.append(summarize(
        _tj.convoys(wcell, bucket_s=3600, nchars=4, min_len=2),
        "convoys (q204): the colocation discipline (distinct collapse, "
        "hot-bucket cap, bucketed self-join) + per-PAIR run windows "
        "over the tiny distinct co-bucket table — the fixes shuffle "
        "once into the persisted bucket frame"))

    sections.append(summarize(
        _gr.harmonic_centrality(
            spark.range(0, 1000).select(F.col("id").alias("node")),
            _edges, max_hops=2),
        "harmonic_centrality (q203): per hop one edge-keyed join from "
        "the frontier + anti-joins against the seen set; frontiers "
        "localCheckpoint per hop (deg^h truncation documented)"))

    sections.append(summarize(
        engine.heat_peaks(walk),
        "heat_peaks (q208): points touched once (one count aggregate); "
        "the occupied-cell table explodes x8 and re-aggregates with "
        "MAX — both remaining exchanges move cell-sized frames"))

    sections.append(summarize(
        textops.budget_apportionment(
            synth.synth_docs_skew(spark, 2000, partitions=8)
            .withColumn("source", F.concat(F.lit("s"),
                                           (F.col("doc_id") % 8)
                                           .cast("string"))), total=997),
        "budget_apportionment (q207): one count aggregate; the floor/"
        "remainder/seat windows run on the GROUP table (single "
        "partition by design — groups are dozens, never rows)"))

    # ---- q205/q206/q209-q214: audit the REAL gated entry plans against
    # the sf0.001 parquet tables (these queries are composed inline in
    # __spark_entry__.py, so the entry function IS the operator; using
    # the parquet source also evidences scan pushdown/pruning).
    import __spark_entry__ as _entry

    _sf = os.environ.get("SPARK_GRAFT_AUDIT_SF", "/root/testdata/sf0.001")
    for _fn, _desc in (
        (_entry._q205_graph_mixing,
         "graph_mixing (q205): one reverse-key self-join on the distinct "
         "edge set (reciprocity) + one degree aggregate whose exact "
         "integer moments collapse to a 1-row frame — edges shuffle "
         "twice, nothing row-sized after that"),
        (_entry._q206_hll_error_audit,
         "hll_error_audit (q206): the register table is a 64-row-per-"
         "group aggregate of the token explode; the estimator runs as "
         "native int64 shifts on that tiny frame; the exact side is one "
         "countDistinct over the SAME explode — two corpus-sized "
         "exchanges total, both keyed aggregates"),
        (_entry._q209_stickiness,
         "stickiness (q209): distinct (user, day) collapse first, then "
         "the DAU aggregate and the 7-day rolling window both run on "
         "the collapsed actives table — one corpus exchange, windows on "
         "day-sized frames"),
        (_entry._q210_ivm_merge,
         "ivm_merge (q210): base and delta rollups each partial-"
         "aggregate map-side; the merge is a full-outer join of two "
         "CELL-sized tables with null-safe adds — the IVM contract "
         "never rescans history"),
        (_entry._q211_fence_dwell,
         "fence_dwell (q211): cell-cover prefilter map-side, membership "
         "lag in ONE per-user window, segment sum partial-aggregates — "
         "a single keyed exchange end to end"),
        (_entry._q212_cover_selectivity,
         "cover_selectivity (q212): covers fit driver-side from the "
         "literal query set, candidates via broadcast cover join, exact "
         "in-radius via native haversine — positions never shuffle"),
        (_entry._q213_nearest_poi,
         "nearest_poi (q213): per-point argmin over fixed-shape literal "
         "haversines — pure map-side scalar expressions, ZERO joins; "
         "the only exchange is the per-POI rollup"),
        (_entry._q214_attribution,
         "attribution (q214): one user-keyed view x purchase range join "
         "filtered in the join condition, per-purchase argmin/argmax in "
         "the same aggregate, then 1-row model summaries"),
        (_entry._q215_compaction_plan,
         "compaction_plan (q215): file stats partial-aggregate to a "
         "MANIFEST-sized frame; the greedy NFD walk runs per partition "
         "group in one pandas pass over file metadata — the data itself "
         "is never read"),
        (_entry._q216_cell_blobs,
         "cell_blobs (q216): ONE data-sized rasterizing aggregate; "
         "adjacency is an equi-join on shifted integer keys over the "
         "occupied-cell frame (grid-bounded); CC star-contraction "
         "shuffles only the shrinking blob edge set"),
        (_entry._q217_ks_distance,
         "ks_distance (q217): one histogram shuffle bounded by value "
         "cardinality; the grid, cumulative windows, and pair join all "
         "run on the collapsed histogram — no data-sized sort anywhere"),
        (_entry._q218_first_digits,
         "first_digits (q218): map-only synthesis + regexp extraction "
         "in whole-stage codegen; the only exchange is the <=9-rows-"
         "per-group digit aggregate"),
        (_entry._q219_hourly_acf,
         "hourly_acf (q219): one (cell, hour) partial aggregation; the "
         "zero-fill grid is cells x hours from a broadcast 1-row span; "
         "lag products are one window over that bounded grid"),
        (_entry._q220_spearman,
         "spearman (q220): two rank windows per group (the unavoidable "
         "exact-rank sort), tie rollups partial-aggregate; emitted "
         "moments are exact integers"),
        (_entry._q221_mutual_knn,
         "mutual_knn (q221): the kNN graph's slim k*N edge list self-"
         "joined against its reverse — never N^2; vectors never attach "
         "to the pair join"),
        (_entry._q222_track_simplify,
         "track_simplify (q222): one shuffle groups each track; the DP "
         "loop is output-sized (one iteration per kept vertex) with "
         "vectorized interior scans and exact big-int split tests"),
        (_entry._q223_commute_anchors,
         "commute_anchors (q223): one (user, cell, daypart) partial "
         "aggregation; top-1 windows and day-level joins run on "
         "collapsed frames only"),
        (_entry._q224_convex_hulls,
         "convex_hulls (q224): one shuffle groups each key; QuickHull "
         "recursion is output-sized with vectorized farthest-point "
         "scans; shoelace area is one lead/first window over hull-sized "
         "frames"),
        (_entry._q225_weighted_sample,
         "weighted_sample (q225): map-only hash priority + one per-"
         "group top-k window — the q75 salted pre-thin composes when a "
         "group exceeds an executor's sort"),
        (_entry._q226_zonal_stats,
         "zonal_stats (q226): points partial-aggregate to cell counts "
         "once; the zone lattice is polygon-bbox-sized and joins the "
         "collapsed raster on integer keys"),
        (_entry._q227_path_crossings,
         "path_crossings (q227): segments from one per-user window; "
         "candidates via bbox-cell equi-join (never a theta join); the "
         "exact orientation test filters BEFORE the pair-dedup "
         "exchange"),
        (_entry._q228_haar_energy,
         "haar_energy (q228): one sparse groupBy per level over the "
         "observed (cell, hour) histogram — absent hours contribute "
         "zero, so no dense grid exists"),
        (_entry._q229_label_centroids,
         "label_centroids (q229): posexplode + broadcast extrema "
         "quantization, then ONE (label, dim) aggregate — output is "
         "labels x dims rows"),
        (_entry._q231_gazetteer_mentions,
         "gazetteer_mentions (q231): map-only tokenize, broadcast "
         "gazetteer equi-join, one (group, name) aggregate; geocoding "
         "is the narrow kernel UDF on the dim-sized result"),
        (_entry._q232_half_sample_bootstrap,
         "half_sample_bootstrap (q232): replicate explode is map-side "
         "(8x narrow), native xxhash64 keep filter, one (source, "
         "replicate) partial aggregate"),
        (_entry._q233_vocab_growth,
         "vocab_growth (q233): one token-type min-doc aggregate (the "
         "vocabulary build's own shuffle), broadcast 1-row max, "
         "10-row window"),
        (_entry._q234_corridor_raster,
         "corridor_raster (q234): segments from one per-user window; "
         "column/row explodes bounded by step length / cell size; "
         "traversal dedup on slim (u, s, cell) keys before the cell "
         "rollup — never a theta join, never bigint division"),
        (_entry._q235_t_closeness,
         "t_closeness (q235): one (cell, type) partial aggregation; "
         "grid, cum windows, and EMD all run on the collapsed "
         "cell x 5-type frame with two broadcast dims"),
        (_entry._q236_integrity_audit,
         "integrity_audit (q236): each FK rule is a broadcast "
         "anti-join or filter count; all eight rules land as 1-row "
         "aggregates unioned"),
        (_entry._q238_topk_churn,
         "topk_churn (q238): one (half, token) aggregate, two 50-row "
         "top-k windows, sentinel full-outer join on 100 rows max"),
        (_entry._q239_geary_c,
         "geary_c (q239): one data-sized count aggregate; neighbor "
         "pairs and moments all on the occupied-cell frame with 1-row "
         "broadcast stats (the q105 shape)"),
        (_entry._q240_ripley_pairs,
         "ripley_pairs (q240): ONE 3x3 bucketed candidate join serves "
         "every radius; the exact integer disk test and radius CASE "
         "run map-side before the bounded rollup"),
        (_entry._q241_theil_sen,
         "theil_sen (q241): pair self-join on the COLLAPSED (cell, "
         "day) frame, slopes floored map-side, one bounded median "
         "window"),
        (_entry._q242_clustering_coeff,
         "clustering_coeff (q242): canonical edge set persisted once "
         "feeds degree aggregate and the two wedge/close joins; final "
         "join moves node-sized frames only"),
        (_entry._q243_rake_keywords,
         "rake_keywords (q243): one per-doc segmentation window, "
         "vocabulary-sized word stats joined back by word, global "
         "top-15 window on the phrase frame"),
        (_entry._q244_chi2_audit,
         "chi2_audit (q244): one count aggregate; the grid is "
         "categories x categories from the two marginal frames with a "
         "1-row broadcast total"),
        (_entry._q245_kde_heat,
         "kde_heat (q245): bounded 81-cell stencil explode, semi-join "
         "against occupied cells BEFORE the mass aggregate; weights "
         "exact integers in codegen"),
        (_entry._q246_step_directions,
         "step_directions (q246): ONE per-user lag window + one "
         "per-user aggregate; unit components floored per element "
         "map-side"),
        (_entry._q247_nn_distance_hist,
         "nn_distance_hist (q247): q240's bucketed join, per-point "
         "min BEFORE the bounded ring histogram; lonely points via a "
         "1-row count diff, never an anti-join on pairs"),
        (_entry._q248_kendall_tau,
         "kendall_tau (q248): slim (id, x, y) per-group self-join; "
         "the sign census partial-aggregates over the pair stream"),
        (_entry._q249_gravity_residuals,
         "gravity_residuals (q249): rides od_matrix's collapsed flow "
         "frame; marginals re-aggregate it and the total broadcasts"),
        (_entry._q250_blob_profile,
         "blob_profile (q250): ONE rasterizing aggregate persisted; "
         "each threshold rung filters the grid-bounded cell frame and "
         "runs star-contraction on a shrinking edge set"),
        (_entry._q252_time_decay_attribution,
         "time_decay_attribution (q252): q214's user-keyed range "
         "join; bit-shift weights map-side; per-purchase totals join "
         "back before the bounded bucket rollup"),
        (_entry._q253_emerging_gi,
         "emerging_gi (q253): one (day, cell) partial aggregation; "
         "ring sums day-local equi-joins on the collapsed frame; "
         "day moments broadcast; MK pairs fan out days^2 per cell"),
        (_entry._q254_knox_test,
         "knox_test (q254): spatial census via the 3x3 bucket join, "
         "temporal census via the 1-D bucket join; both filters run "
         "map-side before 1-row aggregates"),
        (_entry._q255_local_morans,
         "local_morans (q255): q105's shape — occupied-cell frames "
         "only after the one count aggregate; ring sums equi-join on "
         "shifted keys; moments broadcast"),
        (_entry._q256_percentile_bands,
         "percentile_bands (q256): one (cell, day) partial "
         "aggregation; rank picks in one bounded per-cell window and "
         "a conditional pivot"),
        (_entry._q257_viewshed,
         "viewshed (q257): one count aggregate finds observers; the "
         "sight-line frame is GENERATED (observers x window x steps, "
         "data-independent) with elevation inlined as native xxhash64 "
         "— no lookup join"),
        (_entry._q258_ndcg_eval,
         "ndcg_eval (q258): three term-filtered BM25 TakeOrdereds; "
         "relevance, gains, and both discount chains are map-side "
         "expressions over the 30-row ranked union"),
        (_entry._q259_link_prediction,
         "link_prediction (q259): one degree aggregate; wedges from "
         "the symmetric adjacency self-joined on the middle; existing "
         "edges leave via one slim anti-join; top-20 TakeOrdered"),
        (_entry._q260_polygon_validity,
         "polygon_validity (q260): rings explode to edges once; the "
         "edge-pair census is per-ring vertex-quadratic (dozens of "
         "rows), never data-sized"),
        (_entry._q261_ipf_fit,
         "ipf_fit (q261): rides od_matrix's collapsed flow frame; "
         "each Furness scaling is one margin aggregate joined back "
         "on the cell-quadratic grid"),
        (_entry._q262_activity_streaks,
         "activity_streaks (q262): one distinct (cell, day) "
         "aggregation; islands window and run rollups on the "
         "collapsed frame"),
        (_entry._q263_follow_patterns,
         "follow_patterns (q263): one per-(user, day) index window; "
         "the pattern join runs on the collapsed (user, day, cell) "
         "frame — fan-out bounded by daily distinct cells"),
        (_entry._q264_ams_f2,
         "ams_f2 (q264): one token-hash explode + one type-count "
         "aggregate; the estimator explode multiplies the TYPE frame "
         "only; signed sums partial-aggregate map-side"),
        (_entry._q265_catchment_access,
         "catchment_access (q265): literal supply broadcast, demand "
         "touched twice map-side, one aggregate per 2SFCA step, "
         "bounded histogram output"),
        (_entry._q266_session_gap_sweep,
         "session_gap_sweep (q266): per rung one keyed sessionize "
         "window + a session-level rollup; the census median runs on "
         "the collapsed session frame"),
        (_entry._q267_viterbi_paths,
         "viterbi_paths (q267): DP entirely on the collapsed "
         "transition frame — one join + one struct-max aggregate per "
         "step; fixes touched once by markov_transitions"),
        (_entry._q268_fair_share,
         "fair_share (q268): one count aggregate; sort, prefix "
         "window, and the 1-row water level on the cell frame; level "
         "broadcasts back"),
        (_entry._q269_triplet_audit,
         "triplet_audit (q269): label-sized broadcast pick tables + "
         "two id-keyed vector lookups; distance folds are per-row "
         "array expressions — zero pair joins"),
        (_entry._q270_novelty_profile,
         "novelty_profile (q270): two windows on ONE keyed exchange "
         "(first-visit rank + visit index) + a per-key rollup"),
        (_entry._q271_seq_entropy,
         "seq_entropy (q271): one keyed lag window, transition counts "
         "partial-aggregate, ln floors on the origin-sized frame"),
        (_entry._q272_zipf_fit,
         "zipf_fit (q272): one token-count shuffle; the rank window "
         "and OLS moments run on the type-sized frame"),
        (_entry._q273_distance_decay,
         "distance_decay (q273): one keyed lag window, exact d2 map-"
         "side, ring rollup bounded by ring count"),
        (_entry._q274_cell_sync,
         "cell_sync (q274): (cell, hour) partial aggregation, zero-"
         "fill grid from a broadcast span, hour-keyed pair join on "
         "the bounded series frame — never raw fixes"),
        (_entry._q275_peak_hours,
         "peak_hours (q275): one (cell, hour-of-day) aggregation "
         "(<=24 rows per cell), struct-argmax rollup"),
        (_entry._q276_debounce_audit,
         "debounce_audit (q276): per rung one keyed lag/flag/running-"
         "sum window on the SAME exchange key + a bounded rollup"),
        (_entry._q277_drainage_basins,
         "drainage_basins (q277): ONE data-sized aggregate picks the "
         "hot cell; the D8 grid and parent table are window-sized; "
         "pointer doubling is log2(625) tiny self-joins, checkpointed"),
        (_entry._q278_join_counts,
         "join_counts (q278): one occupancy distinct; BB via shifted "
         "self-join on the occupied set; BW/WW by identities on 1-row "
         "aggregates — the empty universe is never enumerated"),
        (_entry._q279_hull_diameter,
         "hull_diameter (q279): one applyInPandas hull shuffle; the "
         "pair scan is per-key quadratic in HULL size only"),
        (_entry._q280_nb_classify,
         "nb_classify (q280): one (label, token) count shuffle trains; "
         "the dense model joins token-keyed with map-side partial "
         "sums; priors/V are 1-row broadcasts"),
        (_entry._q281_ddsketch_quantiles,
         "ddsketch_quantiles (q281): one (group, log-bucket) count "
         "shuffle — bucket count is log(range)/alpha regardless of "
         "volume; rank walk on the sketch only"),
        (_entry._q282_map_mrr_eval,
         "map_mrr_eval (q282): term-filtered explode + TakeOrdered "
         "per query; the integer metric chain runs on queries x k "
         "rows"),
        (_entry._q283_isotonic_calibration,
         "isotonic_calibration (q283): one bucket-count shuffle "
         "collapses the corpus to <=51 rows; PAVA runs in one Arrow "
         "batch on that bucket table"),
        (_entry._q284_huff_shares,
         "huff_shares (q284): one occupancy aggregate; stores are a "
         "4-row broadcast so the demand x store expansion is map-side"),
        (_entry._q286_dtw_consistency,
         "dtw_consistency (q286): one keyed window ranks days/fixes; "
         "k-point selection is a filter on the same exchange; the DP "
         "is 64 numpy steps vectorized ACROSS users in one batch"),
        (_entry._q287_lz_matches,
         "lz_matches (q287): one keyed window truncates to n_max; the "
         "suffix-match DP runs on n_max-row groups in applyInPandas"),
        (_entry._q288_prefix_recall,
         "prefix_recall (q288): each ranking is a narrow scan + "
         "TakeOrdered; joins on queries x k rows"),
        (_entry._q289_kmv_intersect,
         "kmv_intersect (q289): one token shuffle builds sketches; "
         "all pair logic runs on pairs x 2k sketch ROWS with the "
         "pair list broadcast"),
        (_entry._q290_greedy_dispatch,
         "greedy_dispatch (q290): one occupancy aggregate; four "
         "argmin+filter rounds on a generated 4x20 candidate table, "
         "lineage-truncated"),
        (_entry._q291_ewma_alerts,
         "ewma_alerts (q291): one (cell, hour) count shuffle; the "
         "zero-filled grid is cells x span (TIME-bounded); the "
         "sequential recurrence runs per cell in applyInPandas"),
        (_entry._q292_source_mst,
         "source_mst (q292): KMV sketches one token shuffle; Boruvka "
         "rounds aggregate the shrinking cross-component edge set "
         "with comp labels checkpointed — O(log V) rounds"),
        (_entry._q293_visit_motifs,
         "visit_motifs (q293): three windows on one (user, day) "
         "exchange + a signature rollup — nothing leaves the keyed "
         "partition"),
        (_entry._q294_rbo_eval,
         "rbo_eval (q294): two ranking window scans per query; depth "
         "expansion on queries x k rows, all-integer terms"),
        (_entry._q295_perm_test,
         "perm_test (q295): ALL 42 conditional sums in one map-only "
         "aggregate row (no explode, no shuffle); the per-perm table "
         "unpivots from the materialized 1-row frame"),
        (_entry._q296_curation_funnel,
         "curation_funnel (q296): one content-keyed dedup window, "
         "map-side filters, one source-keyed quota rank on the "
         "thinned survivors; five 1-row stage counts"),
        (_entry._q297_km_survival,
         "km_survival (q297): one user-keyed aggregate collapses to "
         "lifetimes; the reverse-cumulative risk window runs on the "
         "lifetime-value-sized frame"),
        (_entry._q298_eb_rates,
         "eb_rates (q298): one group aggregate + a 1-row global "
         "broadcast; shrinkage is a single integer DIV expression"),
        (_entry._q299_jain_fairness,
         "jain_fairness (q299): occupancy aggregate -> 1-row moments "
         "-> one DIV; nothing else"),
        (_entry._q300_cell_hour_mi,
         "cell_hour_mi (q300): one bounded (cell, hour) contingency "
         "shuffle; marginals and the nano-nat terms run on it"),
        (_entry._q301_fdr_screen,
         "fdr_screen (q301): doc x 199-perm explode filtered by the "
         "broadcast threshold table (~docs x perms rows total), one "
         "(group, perm) aggregate, BH as two windows on the "
         "group-sized frame"),
        (_entry._q302_ppr_cells,
         "ppr_cells (q302): transition census on one keyed lag "
         "window; four mass rounds of edge join + destination "
         "aggregate on the cell-sized frames, checkpointed"),
        (_entry._q303_cdc_chunks,
         "cdc_chunks (q303): one Arrow chunking pass (8 shifted "
         "vector products per row, numpy-vectorized), one "
         "chunk-keyed census shuffle, 1-row rollup"),
        (_entry._q304_variogram,
         "variogram (q304): one occupancy aggregate; the lag "
         "expansion is an equi-join of the occupied set against "
         "itself per generated offset — grid-bounded, never "
         "data-sized"),
        (_entry._q305_recurrence_det,
         "recurrence_det (q305): rank/truncate window, cell-equality "
         "pair join bounded by n_max^2 per key, two position "
         "equi-joins for the diagonal probes"),
        (_entry._q306_consensus_line,
         "consensus_line (q306): one 24-row profile aggregate; all "
         "276 candidate lines x 24 points evaluated as native "
         "integer expressions on generated rows"),
        (_entry._q307_unicity_audit,
         "unicity_audit (q307): one (key, cell) count shuffle + a "
         "rank window; each p's census groups the key-sized "
         "signature table"),
        (_entry._q308_token_bucket,
         "token_bucket (q308): one keyed window orders events; the "
         "sequential refill/spend replay runs per key inside "
         "applyInPandas"),
    ):
        try:
            sections.append(summarize(_fn(spark, _sf), _desc))
        except Exception as e:  # audit must not die on one entry
            print(f"  audit skip {_desc.split(' ')[0]}: {e}", file=sys.stderr)

    header = """# PLANS — audited physical plans for the core operators

Generated by `python scripts/audit_plans.py` against a gh2-partitioned
points table.  What to look for (SURVEY.md §4 discipline):

- `PartitionFilters: [... gh2 ...]` — covers prune partitions at the scan
- `PushedFilters: [In(geohash, ...)]` — cell candidates reach parquet
- `BroadcastHashJoin` (never `BroadcastNestedLoopJoin`) — refine
  predicates stay OUT of join conditions
- ZERO `ArrowEvalPython` in the distance-refine paths — the haversine
  refine is a native column expression inside whole-stage codegen
  (Python appears only where a numpy kernel is genuinely needed:
  geohash encode, ray-cast PIP refine)
- `Exchange` only where the operator's semantics require a shuffle
  (keyed dedup, final aggregate)
"""
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write(header + "\n" + "\n".join(sections))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
