"""Cohort retention + ordered funnel (geotile/behavior.py) vs
pure-Python ground truth on hand-built and randomized event logs."""

import random

from pyspark.sql import functions as F

from geotile import behavior


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ep long, event_type string")


def test_cohort_retention_hand_case(spark):
    # u1 first at day 0, active days 0,1,3; u2 first at day 1, active 1,1,2
    rows = [(1, 10, "x"), (1, 86400 + 5, "x"), (1, 3 * 86400, "x"),
            (2, 86400 + 50, "x"), (2, 86400 + 60, "x"), (2, 2 * 86400, "x")]
    got = {(r["cohort"], r["offset"]): r["n_users"]
           for r in behavior.cohort_retention(_ev(spark, rows)).collect()}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (1, 0): 1, (1, 1): 1}


def test_cohort_retention_matches_local_on_random(spark):
    rng = random.Random(5)
    rows = [(rng.randrange(20), rng.randrange(10 * 86400), "x")
            for _ in range(400)]
    got = {(r["cohort"], r["offset"]): r["n_users"]
           for r in behavior.cohort_retention(_ev(spark, rows)).collect()}
    act = {(u, ep // 86400) for u, ep, _ in rows}
    first = {}
    for u, b in act:
        first[u] = min(first.get(u, b), b)
    want = {}
    for u, b in act:
        k = (first[u], b - first[u])
        want[k] = want.get(k, 0) + 1
    assert got == want


def _local_funnel(rows, steps):
    by_user = {}
    for u, ep, t in rows:
        by_user.setdefault(u, []).append((ep, t))
    counts = [0] * len(steps)
    for evs in by_user.values():
        prev_t = None
        for i, s in enumerate(steps):
            cand = [ep for ep, t in evs
                    if t == s and (prev_t is None or ep > prev_t)]
            if not cand:
                break
            prev_t = min(cand)
            counts[i] += 1
    return counts


def test_funnel_strict_ordering(spark):
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "buy"),   # full funnel
        (2, 10, "view"), (2, 5, "click"),                     # click BEFORE view
        (3, 10, "view"),                                      # view only
        (4, 10, "click"), (4, 20, "buy"),                     # never viewed
        (5, 10, "view"), (5, 10, "click"),                    # same second: not strict
    ]
    got = {r["step"]: r["n_users"]
           for r in behavior.funnel(_ev(spark, rows), ["view", "click", "buy"]).collect()}
    assert got == {"view": 4, "click": 1, "buy": 1}


def test_funnel_matches_local_on_random(spark):
    rng = random.Random(9)
    types = ["view", "click", "buy"]
    rows = [(rng.randrange(30), rng.randrange(1000), rng.choice(types))
            for _ in range(600)]
    steps = ["view", "click", "buy"]
    out = behavior.funnel(_ev(spark, rows), steps).collect()
    got = [r["n_users"] for r in sorted(out, key=lambda r: r["step_idx"])]
    assert got == _local_funnel(rows, steps)


def _evv(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ep long, value double")


def test_time_weighted_avg_hand_case(spark):
    # u1: value 10 for 100 s then 20 for 100 s -> twa = 15
    # (trapezoid of the step pairs: (10+20)*100 + (20+20)*0 ... exact)
    rows = [(1, 0, 0, 10.0), (1, 1, 100, 20.0), (1, 2, 200, 20.0)]
    out = {r["user_id"]: r for r in
           behavior.time_weighted_avg(_evv(spark, rows)).collect()}
    r = out[1]
    assert r["n_fixes"] == 3 and r["span_s"] == 200
    # num = (10000+20000)*100 + (20000+20000)*100 = 7_000_000
    assert r["twa_milli"] == 7_000_000 // (2 * 200)


def test_time_weighted_avg_drops_zero_span(spark):
    rows = [(1, 0, 50, 10.0),              # single fix -> dropped
            (2, 1, 10, 1.0), (2, 2, 10, 9.0),  # all-equal ts -> dropped
            (3, 3, 0, 5.0), (3, 4, 10, 5.0)]
    out = {r["user_id"]: r for r in
           behavior.time_weighted_avg(_evv(spark, rows)).collect()}
    assert set(out) == {3}
    assert out[3]["twa_milli"] == 5000  # constant signal -> itself


def test_time_weighted_avg_matches_local_on_random(spark):
    import random

    rng = random.Random(11)
    rows = []
    eid = 0
    for u in range(8):
        for _ in range(rng.randrange(2, 30)):
            rows.append((u, eid, rng.randrange(0, 5000), rng.uniform(0, 400)))
            eid += 1
    got = {r["user_id"]: (r["n_fixes"], r["span_s"], r["twa_milli"])
           for r in behavior.time_weighted_avg(_evv(spark, rows)).collect()}
    import math

    by_user = {}
    for u, e, t, v in rows:
        by_user.setdefault(u, []).append((t, e, math.floor(v * 1000)))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        ts = [t for t, _, _ in evs]
        vs = [v for _, _, v in evs]
        span = max(ts) - min(ts)
        if span <= 0:
            continue
        num = sum((vs[i] + vs[i - 1]) * (ts[i] - ts[i - 1])
                  for i in range(1, len(vs)))
        want[u] = (len(evs), span, num // (2 * span))
    assert got == want


def test_event_type_lift_exact(spark):
    # users: 1 does {a,b}, 2 does {a,b}, 3 does {a}, 4 does {b,c}
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"),
            (4, "b"), (4, "c"), (1, "a")]
    ev = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(rows)],
        "event_id long, user_id long, event_type string")
    out = behavior.event_type_lift(ev)
    got = {(r["ta"], r["tb"]): r for r in out.collect()}
    from geotile import cache

    cache.release(out)
    r = got[("a", "b")]
    # N=4, n_a=3, n_b=3, n_ab=2
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (2, 3, 3)
    assert r["support_micro"] == 2 * 1000000 // 4
    assert r["lift_micro"] == (2 * 4 * 1000000) // 9
    r2 = got[("b", "c")]
    assert r2["n_ab"] == 1 and r2["lift_micro"] == (1 * 4 * 1000000) // 3
    assert ("a", "c") not in got


def test_rolling_active_users_exact(spark):
    # u1 active day 0 and 2; u2 active day 2 only
    ev = spark.createDataFrame(
        [(1, 10), (1, 2 * 86400 + 5), (2, 2 * 86400 + 9), (2, 2 * 86400 + 11)],
        "user_id long, ep long")
    got = {r["day"]: r["n_active"] for r in
           behavior.rolling_active_users(ev, window_days=3).collect()}
    # day 0-2 supported by u1@0; day 2-4 by u1@2 and u2@2
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 2}


def test_lateness_audit_inversions_and_p99(spark):
    # arrival order = event_id; u1: ts regress at events 2 and 4
    rows = [(1, 0, 100), (1, 1, 200), (1, 2, 150),   # late by 50
            (1, 3, 300), (1, 4, 240),                # late by 60
            (2, 10, 5), (2, 11, 6)]                  # clean
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ep long")
    got = {r["user_id"]: r for r in behavior.lateness_audit(ev).collect()}
    r1 = got[1]
    assert (r1["n_events"], r1["n_late"], r1["max_late_s"]) == (5, 2, 60)
    # p99 over lates [50, 60]: ceil(2*99/100)=2 -> the 60
    assert r1["p99_late_s"] == 60
    r2 = got[2]
    assert (r2["n_late"], r2["max_late_s"], r2["p99_late_s"]) == (0, 0, 0)


def test_stickiness_ratio_exact(spark):
    # day 0: u1,u2 active; day 1: u1 -> wau(1) = {u1,u2} -> 1/2
    ev = spark.createDataFrame(
        [(1, 10), (2, 20), (1, 86400 + 5)], "user_id long, ep long")
    out = behavior.stickiness(ev, window_days=7)
    got = {r["day"]: r for r in out.collect()}
    from geotile import cache

    cache.release(out)
    assert (got[0]["dau"], got[0]["wau"]) == (2, 2)
    assert got[0]["stickiness_micro"] == 1000000
    assert (got[1]["dau"], got[1]["wau"]) == (1, 2)
    assert got[1]["stickiness_micro"] == 500000


def test_attribution_first_vs_last_touch_lags(spark):
    import __spark_entry__ as entrymod  # noqa: F401 (shape reference)
    # replicate the q214 logic on a hand case through the same ops
    from pyspark.sql import functions as F

    rows = [  # user 1: views at 100, 200; purchase at 250
        (0, 1, "view", 100), (1, 1, "view", 200), (2, 1, "purchase", 250),
        # user 2: view too old (outside 24h) -> unattributed
        (3, 2, "view", 0), (4, 2, "purchase", 90000),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ep long")
    views = (ev.where(F.col("event_type") == "view")
             .select(F.col("user_id").alias("u"), F.col("ep").alias("vts")))
    buys = (ev.where(F.col("event_type") == "purchase")
            .select("user_id", F.col("ep").alias("bts"),
                    F.col("event_id").alias("bid")))
    j = buys.join(views, (buys["user_id"] == views["u"])
                  & (views["vts"] <= buys["bts"])
                  & (views["vts"] > buys["bts"] - 86400))
    cred = (j.groupBy("user_id", "bid")
            .agg(F.max("bts").alias("bts"), F.max("vts").alias("last_v"),
                 F.min("vts").alias("first_v")))
    r = cred.collect()
    assert len(r) == 1  # only user 1's purchase attributes
    row = r[0]
    assert row["bts"] - row["last_v"] == 50     # last-touch lag
    assert row["bts"] - row["first_v"] == 150   # first-touch lag


def test_time_decay_attribution_hand_events(spark):
    """One purchase, three views at known ages: exact bit-shift
    weights and floored shares."""
    from geotile import behavior
    from pyspark.sql import functions as F

    rows = [
        (1, "purchase", 10000, 100),
        (1, "view", 9900, 1),    # age 0
        (1, "view", 6000, 2),    # age 1
        (1, "view", 5900, 3),    # age 1
        (2, "view", 9000, 4),    # other user: never credited
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ep long, event_id long")
    out = {r["age_bucket"]: r for r in
           behavior.time_decay_attribution(ev).collect()}
    assert set(out) == {0, 1}
    # weights: age0 -> 2^23; age1 -> 2^22 each; tot = 2^24
    assert out[0]["n_touches"] == 1
    assert out[0]["credit_sum"] == 1 << 23
    assert out[0]["share_micro_sum"] == 500000
    assert out[1]["n_touches"] == 2
    assert out[1]["credit_sum"] == 1 << 23
    assert out[1]["share_micro_sum"] == 500000  # 250000 + 250000


def test_km_survival_hand_lifetimes(spark):
    """Four users: deaths at t=0 and t=5, censored at t=26 and t=29
    (horizon day 29); risk sets check by hand."""
    from geotile import behavior

    spans = {1: (0, 29), 2: (0, 5), 3: (2, 2), 4: (3, 29)}
    rows = []
    eid = 0
    for u, (a, b) in spans.items():
        for d in (a, b):
            eid += 1
            rows.append((u, eid, d * 86400))
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ep long")
    got = {r["t"]: r for r in behavior.km_survival_table(ev).collect()}
    assert got[0]["n_risk"] == 4 and got[0]["n_deaths"] == 1 \
        and got[0]["n_censored"] == 0
    assert got[5]["n_risk"] == 3 and got[5]["n_deaths"] == 1
    assert got[26]["n_risk"] == 2 and got[26]["n_censored"] == 1
    assert got[29]["n_risk"] == 1 and got[29]["n_censored"] == 1
