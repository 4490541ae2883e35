"""Connected-components resolution (geotile/graph.py) — the pairs ->
clusters step of corpus dedup.  Verified against a local union-find
oracle on structured and randomized edge lists."""

import random

import pytest

from geotile import cache, graph


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    out = graph.connected_components(df)
    rows = {r["node"]: r["cluster_id"] for r in out.collect()}
    cache.release(out)
    return rows


def test_chain_clique_and_isolated_pair(spark):
    # chain 1-2-3-4-5, clique {10,11,12}, pair {20,21}; self-loop dropped
    edges = [(1, 2), (2, 3), (3, 4), (4, 5),
             (10, 11), (11, 12), (10, 12),
             (21, 20), (7, 7)]
    rows = _run(spark, edges)
    assert rows == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                    10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_matches_union_find_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(50)]
        edges = [e for e in edges if e[0] != e[1]]
        expect = _uf_components(edges)
        assert _run(spark, edges) == expect


def test_long_chain_converges(spark):
    # worst-case diameter for min-propagation: a 30-node descending chain
    edges = [(i + 1, i) for i in range(30)]
    rows = _run(spark, edges)
    assert set(rows.values()) == {0}


def test_non_convergence_raises(spark):
    df = spark.createDataFrame([(i + 1, i) for i in range(10)], "a long, b long")
    with pytest.raises(RuntimeError):
        graph.connected_components(df, max_iter=2)
