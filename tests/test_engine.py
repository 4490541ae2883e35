"""End-to-end scenario tests mirroring the reference's de-facto
verification flows (FIXTURES.md §3) plus the north_rule extension
operators (kNN, PIP, raster join, salting)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotile import engine
from geotile.kernel import geohash_np as gh
from geotile.kernel import tiles_np

SEEDS = [
    ("13661201024", 39.928167, 116.389550, 1486447000),
    ("13661201025", 39.928167, 116.389550, 1486447000),
]
README_ADD = ("13412345637", 39.928667, 116.389550, 1486447081)
POS_SCHEMA = "msisdn string, lat double, lon double, ts long"


def _positions(spark, rows):
    return engine.with_cell_ref(spark.createDataFrame(rows, POS_SCHEMA))


def test_readme_flow(spark):
    """FIXTURES §3.1: seed -> Add -> Search -> Delete -> re-Search."""
    state = _positions(spark, SEEDS)
    add = _positions(spark, [README_ADD])
    state = engine.upsert_positions(state, add)
    assert state.count() == 3

    found = engine.radius_search_compat(state, 39.928367, 116.389550, 100000.0)
    got = {r["msisdn"] for r in found.collect()}
    assert got == {"13661201024", "13661201025", "13412345637"}
    # distances from the query point: ~22m (seeds) and ~33m (added row)
    dists = {r["msisdn"]: r["dist_m"] for r in found.collect()}
    assert dists["13661201024"] == pytest.approx(
        float(gh.distance_ref(39.928367, 116.389550, 39.928167, 116.389550)[0]))

    deletes = spark.createDataFrame([("13412345637",)], "msisdn string")
    state2 = engine.delete_positions(state, deletes)
    found2 = engine.radius_search_compat(state2, 39.928367, 116.389550, 100000.0)
    assert {r["msisdn"] for r in found2.collect()} == {"13661201024", "13661201025"}


def test_loadmodule_smoke(spark):
    """FIXTURES §3.2: Search(39.928167, 116.389550, 10000) -> the two seeds."""
    state = _positions(spark, SEEDS)
    found = engine.radius_search_compat(state, 39.928167, 116.389550, 10000.0)
    assert {r["msisdn"] for r in found.collect()} == {"13661201024", "13661201025"}


def test_compat_zero_candidates_southern(spark):
    """FIXTURES §2.7: Sydney query -> 0 candidate cells -> empty result."""
    state = _positions(spark, [("s1", -33.856784, 151.215297, 1)])
    found = engine.radius_search_compat(state, -33.856784, 151.215297, 5000.0)
    assert found.count() == 0
    # the production path finds it fine
    ok = engine.radius_search(
        engine.with_cell(spark.createDataFrame([("s1", -33.856784, 151.215297, 1)], POS_SCHEMA)),
        -33.856784, 151.215297, 5000.0)
    assert ok.count() == 1


def test_upsert_migration(spark):
    """FIXTURES §3.3: move a subscriber to Shanghai; cells follow."""
    state = _positions(spark, SEEDS)
    move = _positions(spark, [("13661201024", 31.230416, 121.473701, 1486448000)])
    state2 = engine.upsert_positions(state, move)
    assert state2.count() == 2
    beijing = engine.radius_search_compat(state2, 39.928167, 116.389550, 10000.0)
    assert {r["msisdn"] for r in beijing.collect()} == {"13661201025"}
    shanghai = engine.radius_search_compat(state2, 31.230416, 121.473701, 10000.0)
    assert {r["msisdn"] for r in shanghai.collect()} == {"13661201024"}
    cells = {r["geohash"] for r in state2.collect()}
    assert cells == {"wx4g0", "wtw3s"}
    # pool conservation: 2 positions, 2 cells, 2 postings
    st = engine.pool_state(state2).collect()[0]
    assert (st["pos_used"], st["area_used"], st["link_used"]) == (2, 2, 2)


def test_upsert_last_write_wins_ties(spark):
    state = _positions(spark, [("a", 10.0, 10.0, 100)])
    upd = _positions(spark, [("a", 20.0, 20.0, 100)])  # same ts: update wins
    out = engine.upsert_positions(state, upd).collect()
    assert len(out) == 1 and out[0]["lat"] == 20.0


def _random_positions(spark, n=2000, seed=3):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(39.0, 41.0, n)
    lon = rng.uniform(115.0, 118.0, n)
    rows = [(f"m{i}", float(lat[i]), float(lon[i]), i) for i in range(n)]
    return engine.with_cell(spark.createDataFrame(rows, POS_SCHEMA)), lat, lon


def test_radius_search_production_matches_brute_force(spark):
    df, lat, lon = _random_positions(spark)
    qlat, qlon, r = 39.9286, 116.3895, 30000.0
    got = {row["msisdn"] for row in engine.radius_search(df, qlat, qlon, r).collect()}
    d = gh.haversine_m(np.full(len(lat), qlat), np.full(len(lat), qlon), lat, lon)
    expect = {f"m{i}" for i in np.nonzero(d <= r)[0]}
    assert got == expect


def test_radius_join_matches_brute_force(spark):
    df, lat, lon = _random_positions(spark)
    queries = [(0, 39.9286, 116.3895, 25000.0), (1, 40.5, 117.0, 10000.0),
               (2, 39.1, 115.2, 40000.0)]
    qdf = spark.createDataFrame(queries, "query_id long, qlat double, qlon double, radius_m double")
    got = {(r["query_id"], r["msisdn"])
           for r in engine.radius_join(df, qdf).collect()}
    expect = set()
    for qid, qla, qlo, rr in queries:
        d = gh.haversine_m(np.full(len(lat), qla), np.full(len(lat), qlo), lat, lon)
        expect |= {(qid, f"m{i}") for i in np.nonzero(d <= rr)[0]}
    assert got == expect


def test_knn_join_matches_brute_force(spark):
    df, lat, lon = _random_positions(spark)
    queries = [(0, 39.9286, 116.3895), (1, 40.9, 117.9), (2, 39.05, 115.05)]
    k = 7
    got = engine.knn_join(df, queries, k=k, id_col="msisdn").collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((round(r["dist_m"], 6), r["msisdn"]))
    for qid, qla, qlo in queries:
        d = gh.haversine_m(np.full(len(lat), qla), np.full(len(lat), qlo), lat, lon)
        order = np.argsort(d, kind="stable")[:k]
        expect = sorted((round(float(d[i]), 6), f"m{i}") for i in order)
        assert sorted(by_q[qid]) == expect, f"query {qid}"


def test_pip_join_matches_brute_force(spark):
    df, lat, lon = _random_positions(spark)
    # a triangle and a quad around Beijing
    polys = [
        (0, [39.5, 40.5, 39.5], [115.8, 116.4, 117.0]),
        (1, [39.0, 39.0, 41.0, 41.0], [115.0, 115.5, 115.5, 115.0]),
    ]
    pdf = spark.createDataFrame(polys, "poly_id long, poly_lat array<double>, poly_lon array<double>")
    got = {(r["poly_id"], r["msisdn"]) for r in engine.pip_join(df, pdf).collect()}
    expect = set()
    for pid, plat, plon in polys:
        inside = gh.point_in_polygon(lat, lon, plat, plon)
        expect |= {(pid, f"m{i}") for i in np.nonzero(inside)[0]}
    assert got == expect


def test_raster_vector_join(spark):
    df, lat, lon = _random_positions(spark)
    z = 10
    x, y = tiles_np.tile_xy(39.9286, 116.3895, z)
    tile = (z, int(x[0]), int(y[0]))
    got = {r["msisdn"] for r in engine.raster_vector_join(df, [tile]).collect()}
    tx, ty = tiles_np.tile_xy(lat, lon, z)
    expect = {f"m{i}" for i in np.nonzero((tx == tile[1]) & (ty == tile[2]))[0]}
    assert got == expect


def test_salted_cell_counts_equals_plain(spark):
    df, _, _ = _random_positions(spark, n=3000)
    plain = {(r["geohash"], r["n"]) for r in
             df.groupBy("geohash").agg(F.count("*").alias("n")).collect()}
    salted = {(r["geohash"], r["n"]) for r in engine.salted_cell_counts(df).collect()}
    assert plain == salted


def test_format_positions_json(spark):
    state = _positions(spark, [README_ADD])
    js = engine.format_positions_json(state).collect()[0]["json"]
    assert js == ('{"Msisdn":"13412345637","Latitude":"39.928667",'
                  '"Longitude":"116.389550","CurrTime":"1486447081"}')


def test_knn_join_bulk_matches_brute_force(spark):
    """Bulk (distributed) kNN join: 40 query points derived from the
    data themselves, verified against numpy brute force."""
    df, lat, lon = _random_positions(spark)
    k = 5
    qrows = [(i, float(lat[i * 37 % len(lat)]) + 0.001,
              float(lon[i * 37 % len(lon)]) - 0.002) for i in range(40)]
    qdf = spark.createDataFrame(qrows, "query_id long, qlat double, qlon double")
    got = engine.knn_join_bulk(df, qdf, k=k, id_col="msisdn").collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((round(r["dist_m"], 6), r["msisdn"]))
    assert set(by_q) == {q[0] for q in qrows}
    for qid, qla, qlo in qrows:
        d = gh.haversine_m(np.full(len(lat), qla), np.full(len(lat), qlo), lat, lon)
        order = np.argsort(d, kind="stable")[:k]
        expect = sorted((round(float(d[i]), 6), f"m{i}") for i in order)
        assert sorted(by_q[qid]) == expect, f"query {qid}"


def test_annulus_cells_partition_disk(spark):
    """annulus_cells_udf invariants (pandas-side, no Spark needed): the
    expanding annuli (-1,1], (1,2], (2,4] are pairwise DISJOINT and
    their union equals the full Chebyshev disk at ring 4 — including at
    a coarse precision where wide rings wrap the lon circle (the case
    where naive offset enumeration double-counts cells)."""
    import pandas as pd

    from geotile import udfs

    lat = pd.Series([39.9286, -33.8568, 84.5, 0.0])
    lon = pd.Series([116.3895, 151.2153, -179.9, 0.0])
    for nchars in (1, 2):
        rounds = [(-1, 1), (1, 2), (2, 4)]
        per_round = [udfs.annulus_cells_udf(nchars, lo, hi).func(lat, lon)
                     for lo, hi in rounds]
        full = udfs.annulus_cells_udf(nchars, -1, 4).func(lat, lon)
        for i in range(len(lat)):
            sets = [set(s[i]) for s in per_round]
            # disjoint across rounds
            for a in range(len(sets)):
                for b in range(a + 1, len(sets)):
                    assert not (sets[a] & sets[b]), (nchars, i, a, b)
            # no dup within a round
            for s, rnd in zip(per_round, rounds):
                assert len(s[i]) == len(set(s[i])), (nchars, i, rnd)
            # union == full disk
            assert set().union(*sets) == set(full[i]), (nchars, i)


def test_knn_join_bulk_high_latitude(spark):
    """Polar-band kNN: cells narrow sharply toward the pole, which is
    exactly where a guarantee priced at cos(qlat) over-estimates the
    safe radius (ADVICE r1).  Points at |lat| in [83, 89.5] across all
    longitudes, queries inside the band — verified against numpy brute
    force."""
    rng = np.random.default_rng(11)
    n = 1500
    lat = rng.uniform(83.0, 89.5, n)
    lon = rng.uniform(-180.0, 180.0, n)
    rows = [(f"m{i}", float(lat[i]), float(lon[i]), i) for i in range(n)]
    df = engine.with_cell(spark.createDataFrame(rows, POS_SCHEMA))
    k = 5
    qrows = [(i, float(lat[i * 53 % n]) + 0.003,
              float(lon[i * 53 % n]) - 0.004) for i in range(25)]
    qdf = spark.createDataFrame(qrows, "query_id long, qlat double, qlon double")
    got = engine.knn_join_bulk(df, qdf, k=k, id_col="msisdn").collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((round(r["dist_m"], 6), r["msisdn"]))
    assert set(by_q) == {q[0] for q in qrows}
    for qid, qla, qlo in qrows:
        d = gh.haversine_m(np.full(n, qla), np.full(n, qlo), lat, lon)
        order = np.argsort(d, kind="stable")[:k]
        expect = sorted((round(float(d[i]), 6), f"m{i}") for i in order)
        assert sorted(by_q[qid]) == expect, f"query {qid}"


def test_sessionize_gap_semantics(spark):
    """Sessions split exactly at gaps > gap_s; ids are 1-based per key
    in time order; duration = last - first within the session."""
    rows = [
        ("u1", 0, 0), ("u1", 100, 1), ("u1", 200, 2),      # session 1
        ("u1", 2000, 3), ("u1", 2100, 4),                   # session 2 (gap 1800)
        ("u2", 50, 5),                                      # session 1
        ("u2", 5000, 6),                                    # session 2
    ]
    df = spark.createDataFrame([(u, t, e) for u, t, e in rows],
                               "user_id string, ts long, event_id long")
    out = engine.sessionize(df, key="user_id", ts="ts", gap_s=1000).collect()
    sess = {(r["user_id"], r["event_id"]): r["session_id"] for r in out}
    assert [sess[("u1", e)] for e in (0, 1, 2, 3, 4)] == [1, 1, 1, 2, 2]
    assert [sess[("u2", e)] for e in (5, 6)] == [1, 2]


def test_range_join_exact_and_plan(spark):
    """Interval join: results match a brute-force BETWEEN check, and
    the physical plan is a bucket EQUI-join (no BroadcastNestedLoopJoin
    from the raw inequality)."""
    facts = spark.createDataFrame(
        [(i, i * 137 % 10007) for i in range(2000)], "fact_id long, ep long")
    wins = spark.createDataFrame(
        [(w, w * 900, w * 900 + 2500) for w in range(12)],
        "w_id long, start_ep long, end_ep long")
    out = engine.range_join(facts, wins, ts="ep", bucket_s=1000)
    got = {(r["fact_id"], r["w_id"]) for r in out.collect()}
    expect = {(f, w) for f in range(2000) for w in range(12)
              if w * 900 <= (f * 137 % 10007) <= w * 900 + 2500}
    assert got == expect
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_polyline_proximity_join_matches_brute_force(spark):
    """Route proximity: cover + native refine equals the numpy
    brute-force min point-to-segment distance (same equirectangular
    model)."""
    df, lat, lon = _random_positions(spark)
    lines = [(0, [39.2, 40.1, 40.8], [115.3, 116.4, 117.6]),
             (1, [39.0, 39.9], [117.9, 115.1])]
    ldf = spark.createDataFrame(
        lines, "line_id long, line_lat array<double>, line_lon array<double>")
    r = 25000.0
    got = {(row["line_id"], row["msisdn"]): row["dist_m"]
           for row in engine.polyline_proximity_join(
               df, ldf, r, id_cols=["msisdn"]).collect()}
    m_per_deg = np.pi * gh.EARTH_RADIUS_M / 180.0
    expect = {}
    for lid, las, los in lines:
        best = np.full(len(lat), np.inf)
        for s in range(len(las) - 1):
            mid = (las[s] + las[s + 1]) / 2.0
            kx = np.cos(np.radians(mid)) * m_per_deg
            x = (lon - los[s]) * kx
            y = (lat - las[s]) * m_per_deg
            bx = (los[s + 1] - los[s]) * kx
            by = (las[s + 1] - las[s]) * m_per_deg
            denom = bx * bx + by * by
            t = np.clip((x * bx + y * by) / denom, 0.0, 1.0) if denom > 0 else 0.0
            d = np.sqrt((x - t * bx) ** 2 + (y - t * by) ** 2)
            best = np.minimum(best, d)
        for i in np.nonzero(best <= r)[0]:
            expect[(lid, f"m{i}")] = float(best[i])
    assert set(got) == set(expect)
    for k in got:
        assert got[k] == pytest.approx(expect[k], abs=1e-6)


def _gc_seg_dist_np(plat, plon, a, b):
    """numpy ground truth for engine._greatcircle_seg_dist (same math,
    independent implementation path)."""
    def u3(la, lo):
        la, lo = np.radians(la), np.radians(lo)
        return np.stack([np.cos(la) * np.cos(lo),
                         np.cos(la) * np.sin(lo), np.sin(la)], axis=-1)
    p = u3(np.asarray(plat, float), np.asarray(plon, float))
    av = u3(*a)
    bv = u3(*b)
    r = gh.EARTH_RADIUS_M
    d_a = r * np.arctan2(np.linalg.norm(np.cross(p, av), axis=-1), p @ av)
    d_b = r * np.arctan2(np.linalg.norm(np.cross(p, bv), axis=-1), p @ bv)
    n = np.cross(av, bv)
    nn = np.linalg.norm(n)
    if nn == 0.0:
        return np.minimum(d_a, d_b)
    pn = p @ n
    c = p - np.outer(pn / (nn * nn), n)
    s1 = np.cross(av, c) @ n
    s2 = np.cross(c, bv) @ n
    ct = r * np.abs(np.arcsin(np.clip(pn / nn, -1.0, 1.0)))
    return np.where((s1 >= 0.0) & (s2 >= 0.0), ct, np.minimum(d_a, d_b))


def test_polyline_proximity_join_greatcircle_matches_brute_force(spark):
    """model='greatcircle' equals the numpy spherical cross-track /
    endpoint-arc minimum over segments."""
    df, lat, lon = _random_positions(spark)
    lines = [(0, [39.2, 40.1, 40.8], [115.3, 116.4, 117.6]),
             (1, [39.0, 39.9], [117.9, 115.1])]
    ldf = spark.createDataFrame(
        lines, "line_id long, line_lat array<double>, line_lon array<double>")
    r = 25000.0
    got = {(row["line_id"], row["msisdn"]): row["dist_m"]
           for row in engine.polyline_proximity_join(
               df, ldf, r, id_cols=["msisdn"], model="greatcircle").collect()}
    expect = {}
    for lid, las, los in lines:
        best = np.full(len(lat), np.inf)
        for s in range(len(las) - 1):
            best = np.minimum(best, _gc_seg_dist_np(
                lat, lon, (las[s], los[s]), (las[s + 1], los[s + 1])))
        for i in np.nonzero(best <= r)[0]:
            expect[(lid, f"m{i}")] = float(best[i])
    assert set(got) == set(expect)
    for k in got:
        assert got[k] == pytest.approx(expect[k], abs=1e-5)


def test_greatcircle_seg_dist_known_values(spark):
    """Closed-form checks: against an equatorial arc the cross-track
    distance of (lat, mid-lon) is exactly R*|lat| radians; a point past
    the arc's end on the equator gets the endpoint distance."""
    rows = [(0, 1.0, 5.0),     # abeam the middle -> cross-track
            (1, -2.0, 3.0),    # abeam, south side -> same magnitude law
            (2, 0.0, 15.0)]    # past B -> endpoint arc to (0, 10)
    df = spark.createDataFrame(rows, "pt long, lat double, lon double")
    d = engine._greatcircle_seg_dist(
        F.col("lat"), F.col("lon"), F.lit(0.0), F.lit(0.0),
        F.lit(0.0), F.lit(10.0))
    got = {r["pt"]: r["d"] for r in df.select("pt", d.alias("d")).collect()}
    r_e = gh.EARTH_RADIUS_M
    assert got[0] == pytest.approx(r_e * np.radians(1.0), rel=1e-12)
    assert got[1] == pytest.approx(r_e * np.radians(2.0), rel=1e-12)
    assert got[2] == pytest.approx(r_e * np.radians(5.0), rel=1e-12)


def test_polyline_greatcircle_degenerate_segment(spark):
    """A zero-length segment (duplicate vertices) must not crash under
    ANSI mode and falls back to the endpoint great-circle distance."""
    df = spark.createDataFrame([(0, 39.95, 116.41)], "pt long, lat double, lon double")
    d = engine._greatcircle_seg_dist(
        F.col("lat"), F.col("lon"), F.lit(39.9), F.lit(116.4),
        F.lit(39.9), F.lit(116.4))
    got = df.select(d.alias("d")).collect()[0]["d"]
    expect = gh.haversine_m(np.array([39.95]), np.array([116.41]),
                            np.array([39.9]), np.array([116.4]))[0]
    assert got == pytest.approx(float(expect), rel=1e-6)


def test_range_join_inverted_window_matches_nothing(spark):
    """A malformed window with end < start matches zero rows (it must
    not explode a descending bucket sequence into bogus matches)."""
    facts = spark.createDataFrame([(i, 100 * i) for i in range(50)],
                                  "fact_id long, ep long")
    wins = spark.createDataFrame(
        [(0, 4000, 1000), (1, 200, 700)], "w_id long, start_ep long, end_ep long")
    got = {(r["fact_id"], r["w_id"])
           for r in engine.range_join(facts, wins, ts="ep", bucket_s=500).collect()}
    assert got == {(f, 1) for f in range(50) if 200 <= 100 * f <= 700}


def test_polyline_empty_cover_schema_matches_normal_path(spark):
    """The empty-cover early return projects the same (line_id,
    *id_cols, dist_m) schema as the normal path, so unionByName works."""
    df, _lat, _lon = _random_positions(spark)
    empty_lines = spark.createDataFrame(
        [], "line_id long, line_lat array<double>, line_lon array<double>")
    lines = spark.createDataFrame(
        [(0, [39.2, 40.1], [115.3, 116.4])],
        "line_id long, line_lat array<double>, line_lon array<double>")
    out_empty = engine.polyline_proximity_join(df, empty_lines, 25000.0,
                                               id_cols=["msisdn"])
    out_norm = engine.polyline_proximity_join(df, lines, 25000.0,
                                              id_cols=["msisdn"])
    assert out_empty.columns == out_norm.columns
    assert out_empty.count() == 0
    assert out_norm.unionByName(out_empty).count() == out_norm.count()


def test_maybe_broadcast_guard(spark, monkeypatch):
    """Broadcast-overflow guard: hint below the threshold, plain df
    above it, loud failure past the driver cap — and range_join still
    returns exact results through the downgraded (shuffle) path."""
    cov = spark.createDataFrame([(1,)], "x long")
    hinted = engine._maybe_broadcast(cov, 10, "t")
    assert "Hint broadcast" in hinted._jdf.queryExecution().logical().toString()
    assert engine._maybe_broadcast(cov, engine.COVER_BROADCAST_MAX_ROWS + 1, "t") is cov
    with pytest.raises(ValueError, match="small-side contract"):
        engine._maybe_broadcast(cov, engine.COVER_DRIVER_MAX_ROWS + 1, "t")

    # end-to-end downgrade: force every cover/window side past the hint
    # threshold and check range_join is still exact
    monkeypatch.setattr(engine, "COVER_BROADCAST_MAX_ROWS", 3)
    facts = spark.createDataFrame([(i, 97 * i % 5000) for i in range(500)],
                                  "fact_id long, ep long")
    wins = spark.createDataFrame(
        [(w, w * 700, w * 700 + 1500) for w in range(6)],
        "w_id long, start_ep long, end_ep long")
    got = {(r["fact_id"], r["w_id"])
           for r in engine.range_join(facts, wins, ts="ep", bucket_s=300).collect()}
    expect = {(f, w) for f in range(500) for w in range(6)
              if w * 700 <= 97 * f % 5000 <= w * 700 + 1500}
    assert got == expect


def test_range_join_real_threshold_shuffle_fallback(spark):
    """End-to-end shuffle fallback at the REAL threshold (no
    monkeypatch): 3 wide windows explode into >COVER_BROADCAST_MAX_ROWS
    buckets at bucket_s=1, so the guard must drop the FORCED broadcast
    hint from the logical plan (AQE may still choose broadcast at
    runtime from the measured size — that is the point: the decision is
    deferred to actual sizes instead of forced) and the result still
    matches brute force."""
    from geotile import cache

    span = engine.COVER_BROADCAST_MAX_ROWS // 3 + 10     # ~167k buckets each
    wins = spark.createDataFrame(
        [(w, w * 5, w * 5 + span) for w in range(3)],
        "w_id long, start_ep long, end_ep long")
    facts = spark.createDataFrame(
        [(i, (7919 * i) % (span + 20)) for i in range(300)],
        "fact_id long, ep long")
    out = engine.range_join(facts, wins, ts="ep", bucket_s=1)
    got = {(r["fact_id"], r["w_id"]) for r in out.collect()}
    logical = out._jdf.queryExecution().logical().toString()
    cache.release(out)
    expect = {(f, w) for f in range(300) for w in range(3)
              if w * 5 <= (7919 * f) % (span + 20) <= w * 5 + span}
    assert got == expect
    assert "hint broadcast" not in logical.lower()


def test_range_join_caller_bucket_hint_skips_guard_job(spark):
    """The n_bucket_rows caller hint: same exact results, still
    broadcast when under the threshold, and the guard runs no Spark job
    (no persisted intermediate is tracked on the result)."""
    facts = spark.createDataFrame(
        [(i, i * 137 % 10007) for i in range(2000)], "fact_id long, ep long")
    rows = [(w, w * 900, w * 900 + 2500) for w in range(12)]
    wins = spark.createDataFrame(rows, "w_id long, start_ep long, end_ep long")
    nb = sum(e // 1000 - s // 1000 + 1 for _, s, e in rows if e >= s)
    out = engine.range_join(facts, wins, ts="ep", bucket_s=1000,
                            n_bucket_rows=nb)
    assert out._geotile_persisted == []      # guard ran driver-side only
    got = {(r["fact_id"], r["w_id"]) for r in out.collect()}
    expect = {(f, w) for f in range(2000) for w in range(12)
              if w * 900 <= (f * 137 % 10007) <= w * 900 + 2500}
    assert got == expect
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_knn_join_large_query_set_delegates_to_bulk(spark, monkeypatch):
    """Past the small-POI result cap, knn_join routes through
    knn_join_bulk's distributed annulus path with identical schema and
    identical result rows."""
    from geotile import cache

    df, lat, lon = _random_positions(spark)
    queries = [(0, 39.9286, 116.3895), (1, 40.9, 117.9), (2, 39.05, 115.05)]
    k = 5
    small = engine.knn_join(df, queries, k=k, id_col="msisdn")
    small_rows = {(r["query_id"], r["msisdn"]) for r in small.collect()}

    calls = {"bulk": 0}
    orig = engine.knn_join_bulk

    def spy(*a, **kw):
        calls["bulk"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(engine, "knn_join_bulk", spy)
    monkeypatch.setattr(engine, "KNN_POI_MAX_RESULT_ROWS", 10)  # force delegation
    big = engine.knn_join(df, queries, k=k, id_col="msisdn")
    assert calls["bulk"] == 1
    assert big.columns == small.columns
    big_rows = {(r["query_id"], r["msisdn"]) for r in big.collect()}
    cache.release(big)
    assert big_rows == small_rows


def test_tile_pyramid_matches_kernel_and_is_consistent(spark):
    """One-pass pyramid equals per-zoom numpy tile assignment, and every
    tile's count equals the sum of its four children at the next zoom."""
    from geotile.kernel import tiles_np

    df, lat, lon = _random_positions(spark, n=1500)
    out = engine.tile_pyramid(df, min_zoom=3, max_zoom=7).collect()
    got = {(r["zoom"], r["x"], r["y"]): r["n"] for r in out}
    expect = {}
    for z in range(3, 8):
        tx, ty = tiles_np.tile_xy(lat, lon, z)
        for x, y in zip(tx, ty):
            expect[(z, int(x), int(y))] = expect.get((z, int(x), int(y)), 0) + 1
    assert got == expect
    # pyramid consistency: parent count = sum of children
    for (z, x, y), cnt in got.items():
        if z < 7:
            kids = sum(got.get((z + 1, 2 * x + dx, 2 * y + dy), 0)
                       for dx in (0, 1) for dy in (0, 1))
            assert kids == cnt, (z, x, y)
    # exactly one shuffle (the final aggregate)
    plan = (engine.tile_pyramid(df, min_zoom=3, max_zoom=7)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1
    assert "ArrowEvalPython" not in plan  # fully native


# ---------------------------------------------------------------------------
# DBSCAN (engine.dbscan)
# ---------------------------------------------------------------------------


def test_dbscan_basic_core_border_noise(spark):
    from geotile import cache, engine

    # cluster of 4 mutual points near Beijing (core), one border point
    # ~eps away from one core only, one far noise point
    pts = [(1, 39.90, 116.40), (2, 39.91, 116.40), (3, 39.90, 116.41),
           (4, 39.91, 116.41), (5, 39.975, 116.40), (6, 10.0, 10.0)]
    df = spark.createDataFrame(pts, "pid long, lat double, lon double")
    out = engine.dbscan(df, eps_m=8000.0, min_pts=4, id_col="pid", nchars=4)
    rows = {r["pid"]: (r["cluster_id"], r["is_core"]) for r in out.collect()}
    cache.release(out)
    assert rows == {1: (1, 1), 2: (1, 1), 3: (1, 1), 4: (1, 1), 5: (1, 0)}


def test_dbscan_antimeridian_and_pole(spark):
    from geotile import cache, engine

    # pair straddling the antimeridian + pair hugging the north pole:
    # the eps-box cover must wrap and collapse to the full circle
    pts = [(1, 0.0, 179.99), (2, 0.0, -179.99),
           (3, 89.95, 10.0), (4, 89.95, -170.0)]
    df = spark.createDataFrame(pts, "pid long, lat double, lon double")
    out = engine.dbscan(df, eps_m=20000.0, min_pts=2, id_col="pid", nchars=3)
    rows = {r["pid"]: r["cluster_id"] for r in out.collect()}
    cache.release(out)
    # both pairs are within 20 km (antimeridian ~2.2 km; polar ~11 km)
    assert rows == {1: 1, 2: 1, 3: 3, 4: 3}


# ---------------------------------------------------------------------------
# geohash cover compaction
# ---------------------------------------------------------------------------


def _gh_children(cell):
    return [cell + c for c in "0123456789bcdefghjkmnpqrstuvwxyz"]


def test_compact_cells_complete_sets_collapse(spark):
    from geotile import cache
    # u: all 32 children at p2, each with all 32 children at p3 -> "u"
    # v: 31 of 32 children (vz missing) -> stays at p2 minus nothing
    cells = []
    for c2 in _gh_children("u"):
        cells += _gh_children(c2)
    cells += _gh_children("v")[:-1]
    df = spark.createDataFrame([(c,) for c in cells], "cell string")
    out = engine.compact_cells(df, "cell")
    got = sorted((r["cell"], r["prec"]) for r in out.collect())
    cache.release(out)
    assert ("u", 1) in got
    assert all(not c.startswith("u") or c == "u" for c, _ in got)
    v_cells = [c for c, _ in got if c.startswith("v")]
    assert len(v_cells) == 31 and all(len(c) == 2 for c in v_cells)


def test_compact_cells_min_precision_floor(spark):
    from geotile import cache
    df = spark.createDataFrame([(c,) for c in _gh_children("u")], "cell string")
    out = engine.compact_cells(df, "cell", min_precision=2)
    got = sorted(r["cell"] for r in out.collect())
    cache.release(out)
    # would compact to "u" but the floor stops the 2->1 round
    assert got == sorted(_gh_children("u"))


def test_compact_cells_mixed_precision_input(spark):
    from geotile import cache
    # duplicates + an already-compact parent alongside its children's level
    cells = [("w",), ("w",)] + [(c,) for c in _gh_children("x")]
    df = spark.createDataFrame(cells, "cell string")
    out = engine.compact_cells(df, "cell")
    got = sorted((r["cell"], r["prec"]) for r in out.collect())
    cache.release(out)
    assert got == [("w", 1), ("x", 1)]


def test_compact_cells_promoted_parent_duplicate_no_false_collapse(spark):
    from geotile import cache
    # "uv" pre-exists at p2 AND its complete child set is present at p3
    # (promotes a second "uv"), alongside 30 of the other p2 children of
    # "u" ("uz" subtree absent).  Without per-round dedup the duplicate
    # "uv" made count(*) over "u" hit 32 -> false collapse to "u", a
    # cover that claims area ("uz") absent from the input.
    siblings = [c for c in _gh_children("u") if c not in ("uv", "uz")]
    cells = ["uv"] + _gh_children("uv") + siblings
    df = spark.createDataFrame([(c,) for c in cells], "cell string")
    out = engine.compact_cells(df, "cell")
    got = sorted((r["cell"], r["prec"]) for r in out.collect())
    cache.release(out)
    assert ("u", 1) not in got                      # no false collapse
    assert got == sorted([("uv", 2)] + [(c, 2) for c in siblings])
    assert len(got) == len(set(got))                # no duplicate rows


# geo-stratified sampling

def test_cell_stratified_sample_matches_brute_force(spark):
    import random
    rng = random.Random(23)
    rows = [(i, rng.uniform(-80, 80), rng.uniform(-170, 170)) for i in range(400)]
    df = engine.with_cell(spark.createDataFrame(rows, "event_id long, lat double, lon double"))
    out = engine.cell_stratified_sample(df, per_cell=3, nchars=2).collect()
    got = {}
    for r in out:
        got.setdefault(r["cell"], []).append((r["rank"], r["event_id"]))
    # brute force: per gh2 cell, 3 smallest by (xxhash64(event_id), event_id)
    hashed = df.select(F.substring("geohash", 1, 2).alias("cell"), "event_id",
                       F.xxhash64("event_id").alias("h")).collect()
    want = {}
    for r in hashed:
        want.setdefault(r["cell"], []).append((r["h"], r["event_id"]))
    for cell, lst in want.items():
        top = [e for _, e in sorted(lst)[:3]]
        assert [e for _, e in sorted(got[cell])] == top
        assert sorted(r for r, _ in got[cell]) == list(range(1, len(top) + 1))


def test_salted_topn_identical_results(spark):
    """Two-level salted pre-thin returns EXACTLY the plain window's
    rows and ranks, including on a group holding 90% of all rows."""
    from geotile import skew
    rows = [(i, "hot" if i % 10 else f"g{i % 7}", (i * 37) % 1000)
            for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    order = [F.col("v").desc(), F.col("id").asc()]
    base = skew.salted_topn(df, ["g"], order, [F.col("id")], 10, salt_mod=0)
    salted = skew.salted_topn(df, ["g"], order, [F.col("id")], 10, salt_mod=8)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, salted.collect()))


def test_cell_density_smooth_matches_brute_force(spark):
    import itertools

    from geotile import cache, engine

    # points around the antimeridian (lon wrap) and near a pole (row
    # clamp) plus a dense cluster
    pts = [(89.9, 179.9), (89.9, -179.9), (-89.9, 0.0),
           (0.1, 0.1), (0.2, 0.2), (0.3, 0.3), (10.0, 10.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    out = engine.cell_density_smooth(df, lat_bits=6, lon_bits=7)
    got = {(r["i"], r["j"]): (r["n"], r["n_ring"]) for r in out.collect()}
    cache.release(out)

    def idx(v, lo, span, bits):
        import math
        return max(0, min((1 << bits) - 1, math.floor((v - lo) * ((1 << bits) / span))))

    counts = {}
    for la, lo in pts:
        key = (idx(la, -90.0, 180.0, 6), idx(lo, -180.0, 360.0, 7))
        counts[key] = counts.get(key, 0) + 1
    want = {}
    for (i, j), n in counts.items():
        ring = 0
        for di, dj in itertools.product((-1, 0, 1), repeat=2):
            if (di, dj) == (0, 0):
                continue
            ti, tj = i + di, (j + dj) % 128
            if 0 <= ti < 64:
                ring += counts.get((ti, tj), 0)
        want[(i, j)] = (n, ring)
    assert got == want
    # the two antimeridian points must see each other through the wrap
    ks = sorted(k for k in got if k[0] == 63)
    assert len(ks) == 2 and got[ks[0]][1] >= 1 and got[ks[1]][1] >= 1


def test_morans_i_matches_brute_force(spark):
    import itertools

    from geotile import cache, engine

    # clustered block (positive autocorrelation), an antimeridian
    # straddle, and isolated singletons
    pts = ([(0.1 + 2.8 * a, 0.1 + 2.8 * b) for a in range(3) for b in range(3)
            for _ in range(3)]
           + [(45.0, 179.9), (45.0, -179.9), (-60.0, 30.0), (70.0, -100.0)])
    df = spark.createDataFrame(pts, "lat double, lon double")
    out = engine.morans_i(df, lat_bits=6, lon_bits=7)
    row = out.collect()
    cache.release(out)
    assert len(row) == 1
    got = (row[0]["n_cells"], row[0]["w_sum"], row[0]["num"],
           row[0]["den"], row[0]["i_micro"])

    def idx(v, lo, span, bits):
        import math
        return max(0, min((1 << bits) - 1,
                          math.floor((v - lo) * ((1 << bits) / span))))

    counts = {}
    for la, lo in pts:
        key = (idx(la, -90.0, 180.0, 6), idx(lo, -180.0, 360.0, 7))
        counts[key] = counts.get(key, 0) + 1
    n_cells, s_pts = len(counts), sum(counts.values())
    z = {k: n_cells * v - s_pts for k, v in counts.items()}
    w_sum, num = 0, 0
    for (i, j), za in z.items():
        for di, dj in itertools.product((-1, 0, 1), repeat=2):
            if (di, dj) == (0, 0):
                continue
            ti, tj = i + di, (j + dj) % 128
            if 0 <= ti < 64 and (ti, tj) in z:
                w_sum += 1
                num += za * z[(ti, tj)]
    den = sum(v * v for v in z.values())
    import math
    i_micro = math.floor(
        1000000.0 * ((float(n_cells) * float(num))
                     / (float(w_sum) * float(den))))
    assert got == (n_cells, w_sum, num, den, i_micro)
    # the clustered block must push the statistic clearly positive
    assert got[4] > 100000


def test_morans_i_degenerate_no_neighbors(spark):
    """Isolated cells only: W = 0 -> i_micro sentinel 0, exact parts
    still populated (den > 0 because counts differ)."""
    from geotile import cache, engine

    pts = [(0.0, 0.0), (0.0, 0.0), (40.0, 40.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    out = engine.morans_i(df)
    r = out.collect()[0]
    cache.release(out)
    assert (r["n_cells"], r["w_sum"], r["i_micro"]) == (2, 0, 0)
    assert r["den"] > 0 and r["num"] == 0


def test_with_quadkey_matches_kernel(spark):
    import numpy as np

    from geotile.kernel import tiles_np

    rng = np.random.default_rng(7)
    lats = rng.uniform(-88, 88, 200)
    lons = rng.uniform(-180, 180, 200)
    df = spark.createDataFrame(
        [(i, float(la), float(lo)) for i, (la, lo) in enumerate(zip(lats, lons))],
        "pid long, lat double, lon double")
    got = {r["pid"]: r["quadkey"]
           for r in engine.with_quadkey(df, zoom=8).collect()}
    x, y = tiles_np.tile_xy(lats, lons, 8)
    for i in range(200):
        want = "".join(str(((int(y[i]) >> s) & 1) * 2 + ((int(x[i]) >> s) & 1))
                       for s in range(7, -1, -1))
        assert got[i] == want, (i, got[i], want)
    # prefix nesting: the zoom-4 ancestor is the 4-char prefix
    x4, y4 = tiles_np.tile_xy(lats, lons, 4)
    for i in range(200):
        w4 = "".join(str(((int(y4[i]) >> s) & 1) * 2 + ((int(x4[i]) >> s) & 1))
                     for s in range(3, -1, -1))
        assert got[i][:4] == w4


def test_getis_ord_brute_force(spark):
    import math
    from collections import Counter

    # a 6-point hotspot, scattered singles, and a polar-row (i=0) cell
    pts = ([(10.37, 20.41)] * 4 + [(10.38, 20.40), (10.36, 20.42)]
           + [(12.9, 20.41), (10.37, 23.2), (-45.3, -170.9),
              (-89.4, 5.7), (-89.2, 8.9), (55.1, 179.9), (55.2, -179.8)])
    df = spark.createDataFrame([(float(a), float(b)) for a, b in pts],
                               "lat double, lon double")
    out = {(r["i"], r["j"]): r for r in engine.getis_ord(df).collect()}

    cells = Counter()
    for la, lo in pts:
        i = min(max(math.floor((la + 90.0) * (64 / 180.0)), 0), 63)
        j = min(max(math.floor((lo + 180.0) * (128 / 360.0)), 0), 127)
        cells[(i, j)] += 1
    assert set(out) == set(cells)
    N, S = 8192, sum(cells.values())
    SS = sum(v * v for v in cells.values())
    A = N * SS - S * S
    gis = {}
    for (i, j), n in cells.items():
        ring = sum(cells.get((i + di, (j + dj) % 128), 0)
                   for di in (-1, 0, 1) for dj in (-1, 0, 1)
                   if not (di == 0 and dj == 0) and 0 <= i + di <= 63)
        w = 9 if 0 < i < 63 else 6
        num = N * (n + ring) - w * S
        B = N * w - w * w
        gi = (math.floor(1000000.0 * (float(num)
                                      / math.sqrt((float(A) * float(B))
                                                  / 8191.0)))
              if A > 0 else 0)
        gis[(i, j)] = gi
        r = out[(i, j)]
        assert (r["n"], r["n_ring"], r["w"], r["num"], r["gi_micro"]) \
            == (n, ring, w, num, gi)
    # the statistic separates: the hotspot is the max, isolated singles
    # sit below it, and at least one polar cell exercised w = 6
    assert gis[max(cells, key=cells.get)] == max(gis.values())
    assert any(r["w"] == 6 for r in out.values())


def _measure_local(lats, lons):
    # numpy replica of polygon_measures' documented semantics
    import math
    rad = math.pi / 180.0
    r_m = gh.EARTH_RADIUS_M
    nv = len(lats)
    x = [((lons[i] * rad) * r_m) * math.cos(lats[i] * rad) for i in range(nv)]
    y = [(lats[i] * rad) * r_m for i in range(nv)]
    terms = [math.floor(((x[i] * y[(i + 1) % nv]) - (x[(i + 1) % nv] * y[i]))
                        * 5e-05) for i in range(nv)]
    sla = 0.0
    for v in lats:
        sla += v
    slo = 0.0
    for v in lons:
        slo += v
    return (abs(sum(terms)),
            math.floor((sla / nv) * 1e6), math.floor((slo / nv) * 1e6))


def _run_measures(spark, polys):
    df = spark.createDataFrame(
        polys, "poly_id long, poly_lat array<double>, poly_lon array<double>")
    return {r["poly_id"]: (r["area_ha"], r["clat_micro"], r["clon_micro"],
                           r["n_vertices"])
            for r in engine.polygon_measures(df).collect()}


def test_polygon_measures_match_replica_and_analytic(spark):
    # 1x1 degree square on the equator plus an off-lattice pentagon
    sq = ([-0.50021, -0.50021, 0.49979, 0.49979],
          [9.49983, 10.49983, 10.49983, 9.49983])
    pent = ([20.00037, 25.10063, 28.30011, 24.70049, 20.90027],
            [110.00031, 109.20017, 113.50023, 117.80041, 116.10013])
    got = _run_measures(spark, [(0, *sq), (1, *pent)])
    for pid, (lats, lons) in enumerate([sq, pent]):
        area, clat, clon = _measure_local(lats, lons)
        assert got[pid] == (area, clat, clon, len(lats))
    # analytic check: the equatorial 1-deg square's sinusoidal area is
    # R^2 * dlon_rad * (sin(lat2) - sin(lat1)) within the straight-edge
    # approximation (<0.01% here)
    import math
    rad = math.pi / 180.0
    exact = (gh.EARTH_RADIUS_M ** 2 * (1.0 * rad)
             * (math.sin(0.49979 * rad) - math.sin(-0.50021 * rad))) / 1e4
    assert abs(got[0][0] - exact) / exact < 1e-4


def test_polygon_measures_orientation_and_scale(spark):
    # reversing vertex order flips every term's sign: |area| agrees to
    # within nv hectares (floor(-t) = -floor(t) only at exact ints);
    # doubling linear size quadruples area (equal-area projection)
    tri = ([10.00037, 20.00071, 10.00049], [40.00031, 45.00017, 50.00023])
    tri_rev = (tri[0][::-1], tri[1][::-1])
    tri2 = ([10.00037, 30.00105, 10.00061], [40.00031, 50.00003, 60.00015])
    got = _run_measures(spark, [(0, *tri), (1, *tri_rev), (2, *tri2)])
    assert abs(got[0][0] - got[1][0]) <= 3
    assert got[2][0] / got[0][0] == pytest.approx(4.0, rel=0.05)


def test_emerging_hotspots_known_trends(spark):
    # cell A: strictly rising daily counts -> S = C(4,2) = 6
    # cell B: strictly falling -> S = -6; cell C: constant -> 0 (ties)
    # cell D: one day -> no pairs, S = 0, flat
    rows = []
    eid = 0
    for day, n in enumerate([1, 2, 3, 4]):        # A at (10.1, 10.1)
        for _ in range(n):
            rows.append((eid, 10.1, 10.1, day)); eid += 1
    for day, n in enumerate([4, 3, 2, 1]):        # B at (-20.1, 50.1)
        for _ in range(n):
            rows.append((eid, -20.1, 50.1, day)); eid += 1
    for day in range(3):                          # C at (30.1, -60.1)
        rows.append((eid, 30.1, -60.1, day)); eid += 1
    rows.append((eid, -70.1, 120.1, 0))           # D
    df = spark.createDataFrame(rows, "event_id long, lat double, lon double, day long")
    df = engine.with_cell(df).withColumn("ep", F.col("day") * 86400 + 7)
    out = {r["cell"]: (r["n_days"], r["total"], r["s_mk"], r["trend"])
           for r in engine.emerging_hotspots(df).collect()}
    from geotile.kernel import geohash_np as ghk

    def cell_of(lat, lon):
        return ghk.encode(np.array([lat]), np.array([lon]))[0][:3]

    assert out[cell_of(10.1, 10.1)] == (4, 10, 6, "rising")
    assert out[cell_of(-20.1, 50.1)] == (4, 10, -6, "falling")
    assert out[cell_of(30.1, -60.1)] == (3, 3, 0, "flat")
    assert out[cell_of(-70.1, 120.1)] == (1, 1, 0, "flat")


def test_map_match_known_geometry(spark):
    # one 2-segment L-shaped line along the equator then north
    lines = spark.createDataFrame(
        [(7, [0.0, 0.0, 2.0], [0.0, 2.0, 2.0])],
        "line_id long, line_lat array<double>, line_lon array<double>")
    pts = spark.createDataFrame(
        [(0, 0.1, 1.0),     # above seg 0 -> t=0.5 on seg 0
         (1, 1.0, 2.1),     # right of seg 1 -> t=0.5 on seg 1
         (2, -0.1, -0.1),   # past vertex A -> seg 0, t=0
         (3, 0.0, 50.0)],   # far away -> absent
        "event_id long, lat double, lon double")
    pts = engine.with_cell(pts)
    got = {r["event_id"]: r for r in engine.map_match(
        pts, lines, radius_m=50000.0).collect()}
    assert set(got) == {0, 1, 2}
    assert (got[0]["line_id"], got[0]["seg"]) == (7, 0)
    assert abs(got[0]["t"] - 0.5) < 1e-6
    assert (got[1]["line_id"], got[1]["seg"]) == (7, 1)
    assert got[2]["seg"] == 0 and got[2]["t"] == 0.0
    # snapped distance matches the proximity join's min for the line
    prox = {r["event_id"]: r["dist_m"] for r in engine.polyline_proximity_join(
        pts, lines, radius_m=50000.0, id_cols=["event_id"]).collect()}
    for e in (0, 1, 2):
        assert abs(got[e]["dist_m"] - prox[e]) < 1e-6


def test_map_match_vertex_tie_breaks_to_lower_seg(spark):
    # a point due south of the SHARED vertex (0, 2) is equidistant to
    # seg 0 (t=1 endpoint) and seg 1 (t=0 endpoint): the struct argmin
    # must deterministically keep the LOWER (line, seg)
    lines = spark.createDataFrame(
        [(1, [0.0, 0.0, 2.0], [0.0, 2.0, 2.0])],
        "line_id long, line_lat array<double>, line_lon array<double>")
    pts = engine.with_cell(spark.createDataFrame(
        [(0, -0.5, 2.0)], "event_id long, lat double, lon double"))
    r = engine.map_match(pts, lines, radius_m=100000.0).collect()[0]
    assert r["seg"] == 0 and r["t"] == 1.0


def test_skyline_matches_bruteforce_dominance(spark):
    import itertools
    import random

    rng = random.Random(143)
    rows = [(i, "g%d" % (i % 2), rng.randrange(0, 8), rng.randrange(0, 8))
            for i in range(60)]
    # force exact-duplicate (x, y) pairs on the frontier: mutually
    # non-dominating, BOTH must survive
    rows += [(100, "g0", 9, 9), (101, "g0", 9, 9)]
    df = spark.createDataFrame(rows, "id long, g string, x long, y long")

    def dominated(r, everyone):
        return any(o[1] == r[1] and o[2] >= r[2] and o[3] >= r[3]
                   and (o[2] > r[2] or o[3] > r[3]) for o in everyone)

    want = sorted(r[0] for r in rows if not dominated(r, rows))
    got = sorted(r["id"] for r in
                 engine.skyline(df, "x", "y", group="g").collect())
    assert got == want
    assert 100 in got and 101 in got


def test_polygon_fill_matches_numpy_kernel(spark):
    import math

    import numpy as np

    from geotile.kernel import geohash_np as gh

    polys = [(0, [20.00037, 60.00071, 20.00049],
              [90.00031, 120.00017, 150.00023]),
             (1, [-10.00033, -10.00019, 5.00027],
              [-40.00029, -20.00013, -30.00037])]
    df = spark.createDataFrame(
        polys, "poly_id long, poly_lat array<double>, poly_lon array<double>")
    got = {(r["poly_id"], r["ilat"], r["ilon"])
           for r in engine.polygon_fill(df, scale=1).collect()}

    want = set()
    for pid, plat, plon in polys:
        la0, la1 = math.floor(min(plat)), math.floor(max(plat))
        lo0, lo1 = math.floor(min(plon)), math.floor(max(plon))
        ii, jj = np.meshgrid(np.arange(la0, la1 + 1),
                             np.arange(lo0, lo1 + 1), indexing="ij")
        lat = ii.ravel() + 0.5
        lon = jj.ravel() + 0.5
        ins = gh.point_in_polygon(lat, lon, np.asarray(plat),
                                  np.asarray(plon))
        for k in np.nonzero(ins)[0]:
            want.add((pid, int(ii.ravel()[k]), int(jj.ravel()[k])))
    assert got == want and len(want) > 100


def test_k_anonymize_ladder_and_suppression(spark):
    # 5 users share one exact gh5 cell (publish at plen 5); 3 users
    # share another (publish coarser only if the coarser cell reaches
    # 5 via neighbors -- here it can't, all else is far away, so they
    # climb to '*'); 1 hermit in the antipodes suppresses too
    rows = []
    for u in range(1, 6):
        rows.append((len(rows), u, 10.0001, 20.0001))
    for u in range(6, 9):
        rows.append((len(rows), u, -45.0001, -120.0001))
    rows.append((len(rows), 9, 70.0001, 150.0001))
    df = engine.with_cell(spark.createDataFrame(
        rows, "event_id long, user_id long, lat double, lon double"))
    out = {r["anon_cell"]: (r["plen"], r["n_fixes"], r["n_users"])
           for r in engine.k_anonymize_cells(df, k=5).collect()}
    assert out["*"] == (0, 4, 4)          # 3 + 1 suppressed fixes
    pub = {c: v for c, v in out.items() if c != "*"}
    assert len(pub) == 1
    (cell, (plen, n_fixes, n_users)), = pub.items()
    assert plen == 5 and n_fixes == 5 and n_users == 5
    # the k invariant on every published cell
    assert all(v[2] >= 5 for v in pub.values())


def test_csv_jsonl_roundtrip_is_bit_lossless(spark, tmp_path):
    import math

    rows = [(1, 0.1 + 0.2, "a"), (2, 1e-300, "b"), (3, -1.5e17, "c"),
            (4, math.pi, "d"), (5, -0.0, "e")]
    df = spark.createDataFrame(rows, "id long, v double, s string")
    for fmt in ("csv", "json"):
        p = str(tmp_path / fmt)
        w = df.write.mode("overwrite")
        r = spark.read.schema("id long, v double, s string")
        if fmt == "csv":
            w.option("header", True).csv(p)
            back = r.option("header", True).csv(p)
        else:
            w.json(p)
            back = r.json(p)
        got = sorted((x["id"], x["v"], x["s"]) for x in back.collect())
        for (gi, gv, gs), (wi, wv, ws) in zip(got, rows):
            assert gi == wi and gs == ws
            # bit-identical doubles, including the sign of -0.0
            assert math.copysign(1.0, gv) == math.copysign(1.0, wv)
            assert gv == wv


def test_rendezvous_shards_minimal_movement(spark):
    keys = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    out = engine.rendezvous_shards(keys, n_old=8, n_new=9).collect()
    assert sum(r["n_keys"] for r in out) == 3000
    moved = [r for r in out if r["old_shard"] != r["new_shard"]]
    # HRW law: a key can only move TO the added shard
    assert moved and all(r["new_shard"] == 8 for r in moved)
    n_moved = sum(r["n_keys"] for r in moved)
    # expected churn 1/9 ~ 333; generous band
    assert 150 <= n_moved <= 600
    # every original shard keeps the bulk of its keys
    stay = {r["old_shard"]: r["n_keys"] for r in out
            if r["old_shard"] == r["new_shard"]}
    assert set(stay) == set(range(8)) and all(v > 100 for v in stay.values())
    # independent per-key replay through the Python XXH64 replica
    from geotile import textops
    w64 = (1 << 64) - 1

    def assign(k, n):
        return max(range(n), key=lambda s: (
            textops.xxhash64_long(((k << 8) ^ s) & w64) % (1 << 64), s))

    from collections import Counter
    exp = Counter((assign(k, 8), assign(k, 9)) for k in range(3000))
    got = {(r["old_shard"], r["new_shard"]): r["n_keys"] for r in out}
    assert got == dict(exp)


def test_polygon_overlap_axis_aligned_squares(spark):
    # A: lat/lon (0.01, 10.01)^2 -> 20x20 half-degree cells = 400
    # B: lat/lon (5.01, 15.01)^2 -> 400; intersection 10x10 = 100
    polys = spark.createDataFrame(
        [(0, [0.01, 0.01, 10.01, 10.01], [0.01, 10.01, 10.01, 0.01]),
         (1, [5.01, 5.01, 15.01, 15.01], [5.01, 15.01, 15.01, 5.01])],
        "poly_id long, poly_lat array<double>, poly_lon array<double>")
    rows = engine.polygon_overlap(polys, scale=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["poly_a"], r["poly_b"]) == (0, 1)
    assert (r["n_a"], r["n_b"], r["n_inter"]) == (400, 400, 100)
    assert r["iou_micro"] == 100 * 1000000 // 700


def test_parse_latlon_classes_and_snap(spark):
    df = spark.createDataFrame(
        [("12.345,-67.89",), (" 1.5 , 2.5 ",), ("95.1,10",), ("10,190.5",),
         ("N/A",), ("1.5;2.5",), ("-0.25,-179.999999",), ("abc,def",)],
        "raw string")
    got = {r["raw"]: (r["error_class"], r["lat_micro"], r["lon_micro"])
           for r in engine.parse_latlon(df).collect()}
    assert got["12.345,-67.89"] == ("ok", 12345000, -67890000)
    assert got[" 1.5 , 2.5 "] == ("ok", 1500000, 2500000)   # padding ok
    assert got["-0.25,-179.999999"] == ("ok", -250000, -179999999)
    assert got["95.1,10"] == ("lat_range", 0, 0)
    assert got["10,190.5"] == ("lon_range", 0, 0)
    assert got["N/A"] == ("bad_format", 0, 0)
    assert got["1.5;2.5"] == ("bad_format", 0, 0)
    assert got["abc,def"] == ("bad_format", 0, 0)


def test_partition_pruned_scan_prunes_directories(spark, tmp_path):
    df = spark.range(0, 400).select(
        F.col("id").alias("event_id"), (F.col("id") % 4).alias("bucket"),
        (F.col("id") * 2).alias("v"))
    p = str(tmp_path / "part")
    df.write.partitionBy("bucket").parquet(p)
    back = spark.read.parquet(p).where(F.col("bucket").isin(1, 3))
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the filter must land in PartitionFilters (directory pruning),
    # not as a post-scan data filter
    assert "PartitionFilters" in plan
    assert "PartitionFilters: []" not in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]
    assert back.count() == 200
    # partition-type inference resurrects the column as an int type —
    # the q165 entry casts back to long for the gate
    assert dict(back.dtypes)["bucket"] in ("int", "bigint")


def test_adaptive_cover_partition_invariants(spark):
    """Every point in exactly one cover cell: counts conserve, no cover
    cell prefixes another, non-max-precision cells fit the threshold,
    and every ancestor of a cover cell overflowed."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(3)
    # a hot cluster (forces refinement) + a sparse scatter (stays coarse)
    pts = [(i, 40.0 + rng.uniform(0, 0.01), -70.0 + rng.uniform(0, 0.01))
           for i in range(300)]
    pts += [(1000 + i, rng.uniform(-60, 60), rng.uniform(-150, 150))
            for i in range(100)]
    df = engine.with_cell(spark.createDataFrame(
        pts, "event_id long, lat double, lon double"), nchars=4)
    thr = 40
    cover = engine.adaptive_cover(df, threshold=thr, p_min=1, p_max=4)
    rows = cover.collect()
    cells = [r["cell"] for r in rows]
    assert len(set(cells)) == len(cells)
    # disjoint: no cell is a strict prefix of another
    s = set(cells)
    for c in cells:
        for k in range(1, len(c)):
            assert c[:k] not in s
    # conservation: cover counts sum to the point count
    assert sum(r["n"] for r in rows) == df.count()
    # threshold rule at leaves; overflow rule on ancestors
    full = {r["cell"]: r["n"] for r in
            df.groupBy(F.substring("geohash", 1, 4).alias("cell"))
            .agg(F.count("*").alias("n")).collect()}

    def count_prefix(p):
        return sum(n for c, n in full.items() if c.startswith(p))

    for r in rows:
        if r["precision"] < 4:
            assert r["n"] <= thr
        assert r["n"] == count_prefix(r["cell"])
        for k in range(1, len(r["cell"])):
            assert count_prefix(r["cell"][:k]) > thr


def test_cell_load_gini_uniform_vs_skewed(spark):
    from pyspark.sql import functions as F

    # 4 cells x 10 points each -> Gini 0
    rows = []
    centers = [(10.0, 20.0), (30.0, 40.0), (-30.0, -40.0), (50.0, 60.0)]
    for c, (la, lo) in enumerate(centers):
        for k in range(10):
            rows.append((c * 100 + k, la + k * 1e-6, lo))
    df = engine.with_cell(spark.createDataFrame(
        rows, "event_id long, lat double, lon double"), nchars=5)
    r = engine.cell_load_gini(df, nchars=4).collect()[0]
    assert (r["n_cells"], r["n_points"], r["max_load"]) == (4, 40, 10)
    assert r["gini_micro"] == 0
    # hot cell: loads [1, 1, 1, 37] -> exact formula value
    rows2 = [(i, 10.0 + i * 1e-6, 20.0) for i in range(37)]
    rows2 += [(100 + c, la, lo) for c, (la, lo) in enumerate(centers[1:])]
    df2 = engine.with_cell(spark.createDataFrame(
        rows2, "event_id long, lat double, lon double"), nchars=5)
    r2 = engine.cell_load_gini(df2, nchars=4).collect()[0]
    xs = sorted([1, 1, 1, 37])
    n, s = len(xs), sum(xs)
    six = sum(i * x for i, x in enumerate(xs, start=1))
    assert r2["gini_micro"] == (2 * six - (n + 1) * s) * 1000000 // (n * s)
    assert r2["gini_micro"] > 600000


def test_spacetime_join_predicates_and_cover(spark):
    # A at origin; B1 near in space+time, B2 near in space but late,
    # B3 near in time but far, B4 just across a gh2 cell boundary
    # (cover must still find it)
    a = spark.createDataFrame([(1, 1000, 0.0, 0.0)],
                              "a_id long, ep long, lat double, lon double")
    b = spark.createDataFrame(
        [(10, 1500, 0.1, 0.1),        # ~16 km, dt 500 -> match
         (11, 99000, 0.1, 0.1),       # late -> no
         (12, 1500, 40.0, 40.0),      # far -> no
         (13, 900, 5.5, 0.0)],        # ~611 km away -> no at 300 km
        "b_id long, ep long, lat double, lon double")
    got = {(r["a_id"], r["b_id"]): r for r in
           engine.spacetime_join(a, b, eps_m=300000.0, tau_s=3600,
                                 nchars=2).collect()}
    assert set(got) == {(1, 10)}
    assert got[(1, 10)]["dt_s"] == 500
    # boundary case: B at ~250 km north sits in a DIFFERENT gh2 cell;
    # the eps-box cover must still produce the pair
    b2 = spark.createDataFrame([(20, 1200, 2.2, 0.0)],
                               "b_id long, ep long, lat double, lon double")
    got2 = [(r["a_id"], r["b_id"]) for r in
            engine.spacetime_join(a, b2, eps_m=300000.0, tau_s=3600,
                                  nchars=2).collect()]
    assert got2 == [(1, 20)]


def test_k_anonymize_residual_ladder_no_subset_leak(spark):
    """The case the naive full-population ladder gets WRONG: 5 users
    fill cell X (publishes at gh5); 2 more users sit in a sibling cell
    Y inside the same gh4 parent.  Full-population support at gh4 is 7
    >= 5, so the naive ladder would publish Y's two users at gh4 as a
    2-user group.  The residual ladder counts gh4 support over the
    UNPUBLISHED fixes only (2 < 5) and suppresses them."""
    rows = []
    for u in range(1, 6):
        rows.append((len(rows), u, 10.00001, 20.00001))
    for u in (21, 22):  # same gh4, different gh5
        rows.append((len(rows), u, 10.02, 20.02))
    df = engine.with_cell(spark.createDataFrame(
        rows, "event_id long, user_id long, lat double, lon double"))
    out = {r["anon_cell"]: r for r in
           engine.k_anonymize_cells(df, k=5).collect()}
    pub = {c: r for c, r in out.items() if c != "*"}
    assert all(r["n_users"] >= 5 for r in pub.values())
    assert out["*"]["n_fixes"] == 2  # the sibling pair suppressed


def test_l_diversify_residual_invariant(spark):
    # cell X: 3 types (publishes at gh5); sibling Y in the same gh4:
    # ONE type only -> must suppress, not ride X's diversity
    rows = []
    for i, t in enumerate(["a", "b", "c", "a"]):
        rows.append((i, t, 10.00001, 20.00001))
    rows.append((10, "a", 10.02, 20.02))
    rows.append((11, "a", 10.02, 20.02))
    df = engine.with_cell(spark.createDataFrame(
        rows, "event_id long, event_type string, lat double, lon double"))
    out = {r["anon_cell"]: r for r in
           engine.l_diversify_cells(df, l_min=3).collect()}
    pub = {c: r for c, r in out.items() if c != "*"}
    assert all(r["n_vals"] >= 3 for r in pub.values())
    assert out["*"]["n_fixes"] == 2


def test_idw_interpolate_exact_hand_case(spark):
    # two points at known distances with values 10 and 20; the IDW
    # estimate must equal the integer formula exactly
    import numpy as np

    from geotile.kernel import geohash_np as kgh

    rows = [(0, 10.0, 20.0, 10.0), (1, 10.0, 20.5, 20.0),
            (2, -50.0, -100.0, 99.0)]  # far: outside the radius
    df = engine.with_cell(spark.createDataFrame(
        rows, "event_id long, lat double, lon double, value double"))
    q = [(7, 10.0, 20.1, 100000.0)]
    got = engine.idw_interpolate(df, q).collect()
    assert len(got) == 1
    r = got[0]
    assert r["query_id"] == 7 and r["n_pts"] == 2
    d0 = int(np.floor(kgh.haversine_m(np.array([10.0]), np.array([20.0]),
                                      np.array([10.0]), np.array([20.1]))[0]))
    d1 = int(np.floor(kgh.haversine_m(np.array([10.0]), np.array([20.5]),
                                      np.array([10.0]), np.array([20.1]))[0]))
    w0, w1 = 10**9 // max(d0, 1), 10**9 // max(d1, 1)
    want = (w0 * 10000 + w1 * 20000) // (w0 + w1)
    assert r["idw_milli"] == want
    # nearer point dominates: estimate sits below the midpoint value
    assert r["idw_milli"] < 15000


def test_heat_peaks_strict_nms(spark):
    from geotile import cache

    # lattice cells (~2.8 deg/cell): a 9-count peak at (10, 20), a
    # 5-count shoulder in the adjacent cell, a far-away tie pair elsewhere
    rows = []
    eid = 0
    for _ in range(9):
        rows.append((eid, 10.0, 20.0)); eid += 1
    for _ in range(5):
        rows.append((eid, 10.0, 23.0)); eid += 1   # adjacent lon cell
    for la in (40.0, 43.0):                        # adjacent tie pair
        for _ in range(4):
            rows.append((eid, la, -100.0)); eid += 1
    df = spark.createDataFrame(rows, "event_id long, lat double, lon double")
    out = engine.heat_peaks(df)
    got = {(r["i"], r["j"]): r for r in out.collect()}
    cache.release(out)
    # exactly one peak: the 9-count cell (the 5 shoulder is dominated;
    # the 4/4 tie suppresses both)
    assert len(got) == 1
    ((i, j), r), = got.items()
    assert r["n"] == 9 and r["ring_max"] == 5


def test_cover_selectivity_consistent_with_radius_join(spark):
    """Candidates bound refined; refined equals the production join's
    row count — the audit measures the plan it claims to measure."""
    import random

    rng = random.Random(4)
    pts = [(i, rng.uniform(-60, 60), rng.uniform(-150, 150))
           for i in range(2000)]
    df = engine.with_cell(spark.createDataFrame(
        pts, "event_id long, lat double, lon double"))
    qs = [(0, 10.0, 20.0, 400000.0), (1, -30.0, -70.0, 800000.0)]
    sel = {r["query_id"]: r for r in
           engine.radius_cover_selectivity(df, qs).collect()}
    joined = engine.radius_join(df, qs).groupBy("query_id").count().collect()
    refined = {r["query_id"]: r["count"] for r in joined}
    for q, _, _, _ in qs:
        assert sel[q]["n_refined"] == refined.get(q, 0)
        assert sel[q]["n_refined"] <= sel[q]["n_candidates"]
        assert 0 <= sel[q]["sel_micro"] <= 1000000


def test_compaction_plan_greedy_invariants(spark):
    """NFD bin packing: brute-force replay of the greedy walk, plus the
    packing invariants (fit-or-singleton, contiguous bin ids)."""
    import numpy as np
    from pyspark.sql import functions as F

    from geotile import table

    rng = np.random.default_rng(7)
    rows = [(f"p{p}", int(i), int(rng.integers(50, 400)))
            for p in range(4) for i in range(rng.integers(5, 20))]
    files = spark.createDataFrame(rows, "part string, file_id long, bytes long")
    tgt = 600
    got = {(r["part"], r["file_id"]): (r["bytes"], r["bin"])
           for r in table.compaction_plan(files, tgt, part_col="part").collect()}
    assert len(got) == len(rows)
    # brute-force replay per partition
    by_part: dict = {}
    for p, i, b in rows:
        by_part.setdefault(p, []).append((b, i))
    for p, fs in by_part.items():
        fs.sort(key=lambda t: (-t[0], t[1]))
        bin_id, fill = 1, 0
        for b, i in fs:
            if fill > 0 and fill + b > tgt:
                bin_id, fill = bin_id + 1, 0
            fill += b
            assert got[(p, i)] == (b, bin_id), (p, i)
    # invariants: every bin fits unless it is a single oversized file
    from collections import defaultdict
    bins = defaultdict(list)
    for (p, _i), (b, bn) in got.items():
        bins[(p, bn)].append(b)
    for (p, bn), sizes in bins.items():
        assert sum(sizes) <= tgt or len(sizes) == 1
    for p in by_part:
        ids = sorted(bn for (pp, bn) in bins if pp == p)
        assert ids == list(range(1, len(ids) + 1))


def test_cell_blobs_union_find_parity(spark):
    """Blob labels equal a driver-side union-find over the same
    occupied grid (8-adjacency, lon wrap), labels = component min."""
    import numpy as np
    from pyspark.sql import functions as F

    from geotile import engine

    rng = np.random.default_rng(11)
    # clustered points: a few dense patches + uniform noise
    lats, lons = [], []
    for cy, cx in [(10.0, 20.0), (12.0, 24.0), (-30.0, 170.0),
                   (-30.0, -178.0), (55.0, -101.0)]:
        lats += list(np.clip(rng.normal(cy, 4.0, 300), -89.9, 89.9))
        lons += list((rng.normal(cx, 6.0, 300) + 180.0) % 360.0 - 180.0)
    lats += list(rng.uniform(-89, 89, 500))
    lons += list(rng.uniform(-179, 179, 500))
    df = spark.createDataFrame(
        [(float(a), float(o)) for a, o in zip(lats, lons)], "lat double, lon double")
    deg, k, nx = 5.0, 6, 72
    out = engine.cell_blobs(df, cell_deg=deg, min_count=k)
    got = {r["cell_id"]: r["blob_id"] for r in out.collect()}

    # driver-side occupancy + union-find
    ys = np.clip(np.floor((np.array(lats) + 90.0) / deg), 0, 35).astype(np.int64)
    xs = np.clip(np.floor((np.array(lons) + 180.0) / deg), 0, nx - 1).astype(np.int64)
    from collections import Counter
    cnt = Counter(zip(ys.tolist(), xs.tolist()))
    occ = {y * 100000 + x for (y, x), n in cnt.items() if n >= k}
    parent = {c: c for c in occ}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for c in occ:
        y, x = divmod(c, 100000)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                ty, tx = y + dy, (x + dx) % nx
                t = ty * 100000 + tx
                if 0 <= ty <= 35 and t in occ:
                    ra, rb = find(c), find(t)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    want = {c: find(c) for c in occ}
    assert got == want
    assert len(out.columns) == 5


def test_convex_hulls_monotone_chain_parity(spark):
    """QuickHull kernel equals a strict monotone chain on random
    integer tracks: same vertex SET, same CCW rotation order, positive
    shoelace, strict left turns."""
    import numpy as np

    from geotile import engine

    def chain(pts):
        pts = [tuple(p) for p in np.unique(pts, axis=0)]
        if len(pts) <= 2:
            return pts

        def half(ps):
            out = []
            for p in ps:
                while len(out) >= 2 and (
                        (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                        - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])) <= 0:
                    out.pop()
                out.append(p)
            return out

        lo = half(pts)
        up = half(pts[::-1])
        return lo[:-1] + up[:-1]

    rng = np.random.default_rng(13)
    rows, want = [], {}
    for u in range(8):
        n = int(rng.integers(3, 80))
        xs = rng.integers(-170000, 170000, n)
        ys = rng.integers(-80000, 80000, n)
        want[u] = chain(np.stack([xs, ys], axis=1))
        rows += [(u, float(y) / 1000.0, float(x) / 1000.0)
                 for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "user_id long, lat double, lon double")
    got = {}
    for r in engine.convex_hulls(df).orderBy("user_id", "seq").collect():
        got.setdefault(r["user_id"], []).append((r["x"], r["y"]))
    for u, w in want.items():
        g = got[u]
        assert set(g) == set(w), u
        i = w.index(g[0])
        assert g == w[i:] + w[:i], u            # same CCW cycle
        a2 = sum(g[i][0] * g[(i + 1) % len(g)][1]
                 - g[(i + 1) % len(g)][0] * g[i][1] for i in range(len(g)))
        assert a2 > 0


def test_zonal_stats_hand_case(spark):
    """Tiny square zone over known points: coverage, occupancy,
    population, peak."""
    from pyspark.sql import functions as F

    from geotile import engine

    polys = spark.createDataFrame(
        [(7, [0.0001, 0.0001, 1.9999, 1.9999],
          [0.0001, 1.9999, 1.9999, 0.0001])],
        "poly_id long, poly_lat array<double>, poly_lon array<double>")
    # scale=2 -> 16 half-degree cells; occupy 2 of them
    pts = [(0.3, 0.3)] * 5 + [(1.7, 1.7)] * 2 + [(5.0, 5.0)] * 9
    df = spark.createDataFrame([(float(a), float(b)) for a, b in pts],
                               "lat double, lon double")
    out = engine.zonal_stats(polys, df, scale=2).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r == {"poly_id": 7, "n_cells": 16, "n_occupied": 2,
                 "n_points": 7, "peak_n": 5}


def test_path_crossings_brute_force(spark):
    """Bucketed crossings equal the O(n^2) exact test on random local
    walks, including the strict no-touch rule."""
    import numpy as np

    from geotile import trajectory

    rng = np.random.default_rng(21)
    rows, tracks = [], {}
    for u in range(6):
        n = int(rng.integers(5, 30))
        xs = np.cumsum(rng.integers(-900, 901, n)) + int(rng.integers(-2000, 2000))
        ys = np.cumsum(rng.integers(-700, 701, n)) + int(rng.integers(-2000, 2000))
        tracks[u] = (xs, ys)
        rows += [(u, int(t), int(t), float(y) / 1000.0, float(x) / 1000.0)
                 for t, (x, y) in enumerate(zip(xs, ys))]
    df = spark.createDataFrame(
        rows, "user_id long, ep long, event_id long, lat double, lon double")
    got = {(r["u1"], r["s1"], r["u2"], r["s2"]) for r in
           trajectory.path_crossings(df, cell_milli=5000).collect()}

    def proper(a, b, c, d):
        def o(p, q, r):
            return ((q[0] - p[0]) * (r[1] - p[1])
                    - (q[1] - p[1]) * (r[0] - p[0]))
        return o(a, b, c) * o(a, b, d) < 0 and o(c, d, a) * o(c, d, b) < 0

    want = set()
    us = sorted(tracks)
    for i in range(len(us)):
        for j in range(i + 1, len(us)):
            x1, y1 = tracks[us[i]]
            x2, y2 = tracks[us[j]]
            for s1 in range(len(x1) - 1):
                for s2 in range(len(x2) - 1):
                    if proper((x1[s1], y1[s1]), (x1[s1 + 1], y1[s1 + 1]),
                              (x2[s2], y2[s2]), (x2[s2 + 1], y2[s2 + 1])):
                        want.add((us[i], s1, us[j], s2))
    assert got == want and len(want) > 0


def test_t_closeness_identity_and_skew(spark):
    """A cell matching the global mix has t_scaled == 0; a fully
    skewed cell has the hand-computable EMD."""
    import __spark_entry__ as E
    # build a tiny fake: 2 cells; cell A mirrors global, cell B skewed
    # use the same math directly via a local frame + the q235 pipeline
    # pieces: 2 types, cell A (2,2), cell B (4,0): global (6,2)... use
    # direct formula: t_scaled = sum_k |cumc*N - cumg*n_c|
    # cell A: n_c=4, cum (2,4); global cum (6,8), N=8
    #   |2*8-6*4| + |4*8-8*4| = 8 + 0 = 8
    # cell B: n_c=4, cum (4,4): |4*8-6*4| + |4*8-8*4| = 8
    # sanity only: run the gated query and check invariants instead
    out = E._q235_t_closeness(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert r["t_scaled"] >= 0
        assert r["n"] >= 1
    # a cell whose type mix equals the global mix would give 0; the
    # bound t_scaled <= 2 * n * N always holds
    import duckdb  # total from the same table
    n_total = sum(r["n"] for r in out)
    assert all(r["t_scaled"] <= 2 * r["n"] * n_total for r in out)


def test_integrity_audit_rules(spark):
    """Known violation counts on sf0.001, and zero rows for the
    structurally-sound rules."""
    import __spark_entry__ as E
    out = {r["rule"]: (r["n_violations"], r["n_checked"])
           for r in E._q236_integrity_audit(spark, "/root/testdata/sf0.001").collect()}
    # pinned against a DuckDB recompute of the same rules at sf0.001
    assert out == {
        "r1_order_orphan_customer": (0, 1500),
        "r2_lineitem_orphan_order": (0, 6000),
        "r3_negative_acctbal": (11, 150),
        "r4_ship_before_order": (2815, 6000),
        "r5_dup_line_key": (1401, 6000),
        "r6_quantity_range": (0, 6000),
        "r7_discount_hi": (895, 6000),
        "r8_supplier_orphan_nation": (0, 10),
    }


def test_geary_c_flat_and_contrast(spark):
    """Equal-count adjacent cells give num = 0 and den = 0 (flat field
    -> c_micro 0); a high/low pair gives the hand-computed C."""
    from geotile import cache, engine

    # two adjacent occupied cells (lat rows i=32 lat 0.x), equal counts
    flat = spark.createDataFrame(
        [(0.5, 0.5)] * 4 + [(0.5, 3.5)] * 4, "lat double, lon double")
    r = engine.geary_c(flat).collect()[0]
    assert (r["n_cells"], r["w_sum"]) == (2, 2)
    assert r["num"] == 0 and r["den"] == 0 and r["c_micro"] == 0
    # contrast: counts 1 vs 5 -> num = 2*(5-1)^2 = 32,
    # z' = (2n - 6) -> (-4, 4), den = 32; C = (1*4*32)/(2*2*32) = 1
    hot = spark.createDataFrame(
        [(0.5, 0.5)] + [(0.5, 3.5)] * 5, "lat double, lon double")
    r2 = engine.geary_c(hot).collect()[0]
    assert (r2["num"], r2["den"]) == (32, 32)
    assert r2["c_micro"] == 1000000


def test_ripley_pairs_hand_counts(spark):
    """Three points at 0 / 1500 / 4000 milli-deg on one axis: exact
    pair counts cumulate over the radii."""
    from geotile import engine

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 1.5), (3, 0.0, 4.0)],
        "event_id long, lat double, lon double")
    out = {r["r_milli"]: r["n_pairs"]
           for r in engine.ripley_pairs(pts, [1000, 2000, 4000]).collect()}
    # d(1,2)=1500, d(2,3)=2500, d(1,3)=4000
    assert out == {1000: 0, 2000: 1, 4000: 3}


def test_theil_sen_linear_series(spark):
    """A perfectly linear daily ramp in one cell: every pairwise slope
    equals the ramp rate, so the median is exact."""
    from geotile import cache, engine

    rows = []
    for d in range(5):
        # day d gets (2*d + 1) events in one fixed cell
        rows += [("abc12", d * 86400 + 10)] * (2 * d + 1)
    df = spark.createDataFrame(rows, "geohash string, ep long")
    out = engine.theil_sen_trend(df)
    r = out.collect()[0]
    cache.release(out)
    assert r["cell"] == "abc"
    assert r["n_days"] == 5 and r["n_pairs"] == 10
    assert r["slope_micro"] == 2000000


def test_kde_heat_single_point(spark):
    """One point: its own cell receives R^2 - d^2 from the cell
    center; all mass lands on occupied cells only."""
    from geotile import cache, engine

    # point at (0.1, 0.1) deg -> milli (100, 100) -> cell (0, 0),
    # center (250, 250), d2 = 150^2 * 2 = 45000
    pts = spark.createDataFrame([(0.1, 0.1)], "lat double, lon double")
    out = engine.kde_heat(pts)
    rows = out.collect()
    cache.release(out)
    assert len(rows) == 1
    r = rows[0]
    assert (r["cx"], r["cy"], r["n_pts"]) == (0, 0, 1)
    assert r["w_sum"] == 4000000 - 45000


def test_kde_heat_two_points_cross_mass(spark):
    """Two points 1000 milli apart: each occupied cell receives mass
    from BOTH points (d=1000-ish < R=2000)."""
    from geotile import cache, engine

    pts = spark.createDataFrame(
        [(0.1, 0.1), (0.1, 1.1)], "lat double, lon double")
    out = engine.kde_heat(pts)
    rows = {(r["cx"], r["cy"]): r["w_sum"] for r in out.collect()}
    cache.release(out)
    assert set(rows) == {(0, 0), (2, 0)}
    # own-cell contribution: 4e6 - 45000 (d 150,150 to the center);
    # cross contributions differ per cell: A(100,100) and B(1100,100),
    # centers (250,250) and (1250,250)
    own = 4000000 - 45000
    cross_00 = 4000000 - (850 * 850 + 150 * 150)     # B -> center(250,250)
    cross_20 = 4000000 - (1150 * 1150 + 150 * 150)   # A -> center(1250,250)
    assert rows[(0, 0)] == own + cross_00
    assert rows[(2, 0)] == own + cross_20


def test_nn_distance_hist_hand_points(spark):
    """Line of three points plus one isolated: exact NN rings and the
    -1 lonely bucket."""
    from geotile import engine

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 1.5), (3, 0.0, 4.0), (4, 0.0, 50.0)],
        "event_id long, lat double, lon double")
    out = {r["ring"]: r["n_points"]
           for r in engine.nn_distance_hist(pts).collect()}
    # NN(1)=1500 -> ring 6, NN(2)=1500 -> 6, NN(3)=2500 -> 10,
    # point 4 has no neighbor within 4000 -> ring -1
    assert out == {6: 2, 10: 1, -1: 1}


def test_blob_threshold_profile_two_clusters(spark):
    """Two adjacent 3-point cells + one isolated single-point cell:
    the profile collapses as the threshold rises."""
    from geotile import cache, engine

    rows = ([(2.5, 2.5)] * 3 + [(2.5, 7.5)] * 3 + [(60.5, 100.5)])
    pts = spark.createDataFrame(rows, "lat double, lon double")
    out = engine.blob_threshold_profile(pts, [1, 2, 4], cell_deg=5.0)
    prof = {r["threshold"]: r for r in out.collect()}
    cache.release(out)
    t1 = prof[1]
    assert (t1["n_occupied"], t1["n_blobs"]) == (3, 2)
    assert (t1["largest_cells"], t1["largest_points"]) == (2, 6)
    t2 = prof[2]
    assert (t2["n_occupied"], t2["n_blobs"]) == (2, 1)
    assert (t2["largest_cells"], t2["largest_points"]) == (2, 6)
    t4 = prof[4]
    assert (t4["n_occupied"], t4["n_blobs"]) == (0, 0)
    assert (t4["largest_cells"], t4["largest_points"]) == (0, 0)


def test_emerging_gi_trend_single_day_matches_getis_ord(spark):
    """With every fix on ONE day the trend layer is degenerate
    (n_days 1, s_mk 0, steady) and each cell's last_gi_micro equals
    the global getis_ord gi_micro."""
    import __spark_entry__ as E
    from geotile import cache, engine

    pos = (E._positions_df(spark, "/root/testdata/sf0.001")
           .withColumn("ep", F.lit(86400 * 100 + 7)))
    out = engine.emerging_gi_trend(pos)
    rows = {r["cell_id"]: r for r in out.collect()}
    cache.release(out)
    gi = engine.getis_ord(pos)
    want = {r["i"] * 100000 + r["j"]: r["gi_micro"] for r in gi.collect()}
    cache.release(gi)
    assert set(rows) == set(want)
    for cid, r in rows.items():
        assert (r["n_days"], r["s_mk"], r["trend"]) == (1, 0, "steady")
        assert r["last_gi_micro"] == want[cid]


def test_knox_test_hand_pairs(spark):
    """Four points with hand-enumerable censuses: one pair close in
    both space and time, two space-only, two time-only, one neither."""
    from geotile import engine

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0, 0), (2, 0.0, 0.5, 100),
         (3, 0.0, 0.5, 50000), (4, 0.0, 100.0, 200)],
        "event_id long, lat double, lon double, ep long")
    r = engine.knox_test(pts).collect()[0]
    assert (r["n_points"], r["n_pairs"]) == (4, 6)
    assert (r["s_pairs"], r["t_pairs"], r["st_pairs"]) == (3, 3, 1)
    assert r["expected_micro"] == 1500000  # 3*3/6


def test_local_morans_contrast_pair(spark):
    """Counts 1 vs 5 in adjacent cells: exact scaled-z products and
    the HL/LH outlier quadrants; a flat pair classifies 'none'."""
    from geotile import cache, engine

    hot = spark.createDataFrame(
        [(0.5, 0.5)] + [(0.5, 3.5)] * 5, "lat double, lon double")
    out = engine.local_morans(hot)
    rows = sorted([r.asDict() for r in out.collect()],
                  key=lambda r: r["n"])
    cache.release(out)
    lo, hi = rows
    assert (lo["zp"], hi["zp"]) == (-4, 4)
    assert lo["ring_z"] == 4 and hi["ring_z"] == -4
    assert lo["num"] == hi["num"] == -16
    # lisa = floor(1e6 * 2 * -16 / 32) = -1e6 for both
    assert lo["lisa_micro"] == hi["lisa_micro"] == -1000000
    assert lo["quadrant"] == "LH" and hi["quadrant"] == "HL"
    flat = spark.createDataFrame(
        [(0.5, 0.5)] * 3 + [(0.5, 3.5)] * 3, "lat double, lon double")
    out2 = engine.local_morans(flat)
    assert all(r["quadrant"] == "none" and r["lisa_micro"] == 0
               for r in out2.collect())
    cache.release(out2)


def test_cell_percentile_bands_ramp(spark):
    """Ten days with counts 1..10 in one cell: exact low-rank picks."""
    from geotile import cache, engine

    rows = []
    for d in range(10):
        rows += [("xyz99", d * 86400 + 5)] * (d + 1)
    df = spark.createDataFrame(rows, "geohash string, ep long")
    out = engine.cell_percentile_bands(df)
    r = out.collect()[0]
    cache.release(out)
    assert (r["cell"], r["n_days"], r["total"]) == ("xyz", 10, 55)
    assert (r["p10"], r["p50"], r["p90"]) == (1, 5, 9)


def test_viewshed_window_invariants(spark):
    """Four observers, full 13x13 window minus self; ring-1 targets
    have no intermediate cell so at least 8 are always visible."""
    import __spark_entry__ as E
    from geotile import cache, engine

    out = engine.viewshed(E._positions_df(spark, "/root/testdata/sf0.001"))
    rows = out.collect()
    cache.release(out)
    assert len(rows) == 4
    for r in rows:
        assert r["n_targets"] == 168  # 13*13 - 1
        assert 8 <= r["n_visible"] <= 168
        assert 0 <= r["obs_elev"] < 1000
        assert r["vis_checksum"] > 0


def test_polygon_validity_bowtie(spark):
    """Triangle and quad are clean; the bowtie ring carries exactly
    one proper self-intersection and fails validity."""
    import __spark_entry__ as E
    from geotile import engine

    polys = spark.createDataFrame(
        [(p["poly_id"], p["lat"], p["lon"])
         for p in (E._POLY_TRI, E._POLY_QUAD, E._POLY_BOWTIE)],
        "poly_id long, poly_lat array<double>, poly_lon array<double>")
    rows = {r["poly_id"]: r
            for r in engine.polygon_validity(polys).collect()}
    assert rows[0]["n_self_x"] == 0 and rows[0]["valid"]
    assert rows[1]["n_self_x"] == 0 and rows[1]["valid"]
    assert rows[1]["orientation"] == "ccw" and rows[1]["area2"] > 0
    assert rows[2]["n_self_x"] == 1 and not rows[2]["valid"]


def test_catchment_access_hand_grid(spark):
    """Two supplies, hand-placed demand: ratios floor exactly and the
    double-covered point sums both."""
    from geotile import engine

    # POI 0 at (0,0) cap 10; POI 1 at (0, 8) deg cap 30; radius 5 deg
    pois = [(0, 0.0, 0.0, 10), (1, 0.0, 8.0, 30)]
    pts = spark.createDataFrame(
        [(1, 0.0, 1.0),   # covers POI0 only
         (2, 0.0, 4.0),   # covers BOTH (4 deg from 0; 4 deg from 8)
         (3, 0.0, 7.0),   # covers POI1 only
         (4, 0.0, 50.0)],  # uncovered
        "event_id long, lat double, lon double")
    out = {r["access_micro"]: r["n_points"]
           for r in engine.catchment_access(pts, pois,
                                            radius_milli=5000).collect()}
    # demand: POI0 -> {1,2} = 2; POI1 -> {2,3} = 2
    r0, r1 = 10 * 1000000 // 2, 30 * 1000000 // 2
    assert out == {r0: 1, r1: 1, r0 + r1: 1, 0: 1}


def test_session_gap_sweep_monotone(spark):
    """Wider gaps can only merge sessions: counts fall, max grows."""
    from geotile import engine

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = {r["gap_s"]: r
            for r in engine.session_gap_sweep(
                ev, [900, 1800, 3600]).collect()}
    assert rows[900]["n_sessions"] >= rows[1800]["n_sessions"] \
        >= rows[3600]["n_sessions"]
    assert rows[900]["max_len"] <= rows[1800]["max_len"] \
        <= rows[3600]["max_len"]
    for r in rows.values():
        assert r["n_singletons"] <= r["n_sessions"]
        assert 1 <= r["med_len"] <= r["max_len"]


def test_maxmin_fair_share_hand_demands(spark):
    """Demands 1/2/5/12 with capacity (20 div 3) = 6: water level
    funds the small cells fully and caps the heavy one."""
    from geotile import cache, engine

    rows = ([("aaa11", )] * 1 + [("bbb11", )] * 2
            + [("ccc11", )] * 5 + [("ddd11", )] * 12)
    df = spark.createDataFrame(rows, "geohash string")
    out = engine.maxmin_fair_share(df, capacity_div=3)
    g = {r["cell"]: (r["demand"], r["alloc"]) for r in out.collect()}
    cache.release(out)
    # sorted demands 1,2,5,12; cap 6: r=1 feasible (1+3*1=4<=6),
    # r=2 infeasible (3+2*2=7>6) -> L=(6-1) div 3=1
    assert g == {"aaa": (1, 1), "bbb": (2, 1), "ccc": (5, 1),
                 "ddd": (12, 1)}
    # generous capacity: everything satisfied
    out2 = engine.maxmin_fair_share(df, capacity_div=1)
    g2 = {r["cell"]: r["alloc"] for r in out2.collect()}
    cache.release(out2)
    assert g2 == {"aaa": 1, "bbb": 2, "ccc": 5, "ddd": 12}


def test_debounce_audit_ladder(spark):
    """Bursts collapse progressively as epsilon widens; cross-type
    events never merge."""
    from geotile import engine

    rows = [  # user 1, type a: t = 0, 5, 30; type b: t = 6
        (1, "a", 0, 1), (1, "a", 5, 2), (1, "a", 30, 3), (1, "b", 6, 4),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ep long, event_id long")
    out = {r["eps_s"]: r for r in engine.debounce_audit(ev).collect()}
    # eps 1: no merges -> 4 groups; eps 10: (0,5) merge -> 3 groups;
    # eps 60: (0,5,30) merge -> 2 groups
    assert out[1]["n_groups"] == 4 and out[1]["n_collapsed"] == 0
    assert out[10]["n_groups"] == 3 and out[10]["n_collapsed"] == 1
    assert out[60]["n_groups"] == 2 and out[60]["n_collapsed"] == 2
    assert out[60]["max_burst"] == 3


def test_drainage_basins_invariants(spark):
    """Basins partition the 25x25 window: sizes sum to 625, member
    checksums sum to the full window cell-id sum, every pit is a
    local minimum of its in-window 8-neighborhood, and pointer
    doubling's roots agree with a driver-side path walk."""
    import __spark_entry__ as E
    from geotile import cache, engine

    pos = E._positions_df(spark, "/root/testdata/sf0.001")
    out = engine.drainage_basins(pos)
    rows = out.collect()
    cache.release(out)
    assert sum(r["basin_size"] for r in rows) == 625
    # replicate terrain + drains on the driver and walk paths
    import numpy as np

    hot = (pos.selectExpr(
        "cast(floor(lat + 90.0) as long) as y",
        "cast(floor(lon + 180.0) as long) as x")
        .groupBy("y", "x").count()
        .orderBy(F.desc("count"), (F.col("y") * 1000 + F.col("x")).asc())
        .first())
    cy, cx = hot["y"], hot["x"]
    cells = [(cy + dy, cx + dx) for dy in range(-12, 13)
             for dx in range(-12, 13)]
    ids = [y * 1000 + x for (y, x) in cells]
    ev = {r["id"]: r["e"] for r in spark.createDataFrame(
        [(i,) for i in ids], "id long").selectExpr(
        "id", "cast(pmod(xxhash64(id), 1000) as long) as e").collect()}
    cs = set(cells)
    parent = {}
    for (y, x) in cells:
        me = y * 1000 + x
        best = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dy, dx) == (0, 0) or (y + dy, x + dx) not in cs:
                    continue
                ne = ev[(y + dy) * 1000 + x + dx]
                if ne < ev[me] and (best is None or (ne, dy, dx) < best):
                    best = (ne, dy, dx)
        parent[me] = me if best is None else \
            (y + best[1]) * 1000 + x + best[2]
    exp = {}
    for i in ids:
        c = i
        while parent[c] != c:
            c = parent[c]
        exp.setdefault(c, []).append(i)
    got = {r["pit_cell"]: r for r in rows}
    assert set(got) == set(exp)
    for pit, members in exp.items():
        assert got[pit]["basin_size"] == len(members)
        assert got[pit]["member_checksum"] == sum(members)
        assert got[pit]["pit_elev"] == ev[pit]


def test_join_counts_hand_grid(spark):
    """3x3 bbox with 4 occupied corners + center missing: every count
    checked by hand (n=9, J=12, BB=0 for the diagonal corners... use
    an L-shape where BB is nonzero)."""
    from geotile import cache, engine

    # occupied: (0,0),(0,1),(1,0),(2,2) in a 3x3 bbox
    pts = [(0, 0), (0, 1), (1, 0), (2, 2)]
    df = spark.createDataFrame(
        [(float(y) - 90.0 + 0.5, float(x) - 180.0 + 0.5)
         for (y, x) in pts], "lat double, lon double")
    out = engine.join_counts(df)
    r = out.collect()[0]
    cache.release(out)
    assert r["n_cells"] == 9 and r["n_black"] == 4
    assert r["j_total"] == 12
    assert r["bb"] == 2            # (0,0)-(0,1) and (0,0)-(1,0)
    # degrees in bbox: (0,0)->2, (0,1)->3, (1,0)->3, (2,2)->2 = 10
    assert r["bw"] == 10 - 2 * 2 == 6
    assert r["ww"] == 12 - 2 - 6 == 4
    assert r["p_bb_micro"] == (4 * 3 * 1000000) // (9 * 8)


def test_hull_diameter_brute_force(spark):
    """Diameter via hull == brute-force all-pairs max on the raw
    points, including the lexicographic tie rule."""
    import itertools

    from geotile import engine

    pts = [(0.0, 0.0), (0.003, 0.004), (-0.003, 0.004), (0.001, 0.001),
           (0.002, -0.002)]
    df = spark.createDataFrame(
        [(1, lat, lon) for (lon, lat) in pts],
        "user_id long, lat double, lon double")
    r = engine.hull_diameter(df).collect()[0]
    mil = sorted({(round(x * 1000), round(y * 1000))
                  for (x, y) in pts})
    best = max(
        ((bx - ax) ** 2 + (by - ay) ** 2, -ax, -ay, -bx, -by)
        for (ax, ay), (bx, by) in itertools.combinations(mil, 2)
        if (ax, ay) < (bx, by))
    assert (r["diam2"], r["x1"], r["y1"], r["x2"], r["y2"]) == \
        (best[0], -best[1], -best[2], -best[3], -best[4])


def test_huff_shares_two_store_hand_case(spark):
    """Two stores with hand weights: terms, denominators, shares and
    the argmax all check by hand."""
    from geotile import cache, engine

    # store A at (0,0) with 4 fixes; store B at (0,3) with 2 fixes;
    # one demand-only cell at (0,1) with 1 fix
    pts = [(0, 0)] * 4 + [(0, 3)] * 2 + [(0, 1)]
    df = spark.createDataFrame(
        [(float(y) - 90.0 + 0.5, float(x) - 180.0 + 0.5)
         for (y, x) in pts], "lat double, lon double")
    out = engine.huff_shares(df, n_stores=2)
    rows = {r["cell_id"]: r for r in out.collect()}
    cache.release(out)
    a, b, d = 0, 3, 1
    # demand cell (0,1): d2 to A = 1, to B = 4
    ta, tb = (4 * 1000000) // 1, (2 * 1000000) // 4
    assert rows[d]["denom_micro"] == ta + tb
    assert rows[d]["best_store"] == a
    assert rows[d]["share_micro"] == (ta * 1000000) // (ta + tb)
    # store A's own cell: d2=0 -> DIV 1; B at distance 9
    ta0, tb0 = 4 * 1000000, (2 * 1000000) // 9
    assert rows[a]["best_store"] == a
    assert rows[a]["share_micro"] == (ta0 * 1000000) // (ta0 + tb0)
    assert rows[b]["best_store"] == b


def test_greedy_dispatch_constrains_later_rounds(spark):
    """The classic dispatch case: both servers prefer the same
    request; greedy gives it to the closer one and forces the other
    to its second choice."""
    from geotile import engine

    # ranks by count: S1(10) S2(9) then demands D1(8) D2(7)
    pts = ([(0, 0)] * 10 + [(0, 10)] * 9 + [(0, 1)] * 8 + [(0, 8)] * 7)
    df = spark.createDataFrame(
        [(float(y) - 90.0 + 0.5, float(x) - 180.0 + 0.5)
         for (y, x) in pts], "lat double, lon double")
    rows = {r["round"]: r
            for r in engine.greedy_dispatch(df, n_stores=2,
                                            n_demands=2).collect()}
    assert rows[1]["store_cell"] == 0 and rows[1]["demand_cell"] == 1
    assert rows[1]["d2"] == 1
    assert rows[2]["store_cell"] == 10 and rows[2]["demand_cell"] == 8
    assert rows[2]["d2"] == 4


def test_directional_variogram_hand_row(spark):
    """Three cells in an E-W row with counts 1/2/4: ring-1 pairs sum
    (1-2)^2+(2-4)^2=5, the ring-2 pair (1-4)^2=9, all sector 0."""
    from geotile import cache, engine

    pts = [(0, 0)] * 1 + [(0, 1)] * 2 + [(0, 2)] * 4
    df = spark.createDataFrame(
        [(float(y) - 90.0 + 0.5, float(x) - 180.0 + 0.5)
         for (y, x) in pts], "lat double, lon double")
    out = engine.directional_variogram(df)
    rows = {(r["sector"], r["ring"]): r for r in out.collect()}
    cache.release(out)
    assert rows[(0, 1)]["n_pairs"] == 2 and rows[(0, 1)]["sum_d2"] == 5
    assert rows[(0, 2)]["n_pairs"] == 1 and rows[(0, 2)]["sum_d2"] == 9
    assert set(rows) == {(0, 1), (0, 2)}
