"""Connected components over pair graphs (operators/graph.py).

Converged components are a pure function of the edge set, so exactness
is testable against a plain BFS oracle on randomized graphs — including
the adversarial shape for label propagation, a long path (one-hop
propagation alone needs O(length) rounds; path halving must cut that to
O(log)).
"""
from __future__ import annotations

import random

import pytest

from etl_rs_spark.operators.graph import connected_components, dedup_survivors


def _bfs_components(edges):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out, seen = {}, set()
    for n in adj:
        if n in seen:
            continue
        comp, stack = set(), [n]
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x)
            stack.extend(adj[x] - comp)
        rep = min(comp)
        for x in comp:
            out[x] = rep
        seen |= comp
    return out


def _spark_cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_l long, id_r long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def test_cc_basic_shapes(spark):
    edges = [
        (1, 2), (2, 3),          # path
        (10, 11), (10, 12), (10, 13),  # star
        (20, 21),                # pair
        (30, 30),                # self-loop: ignored entirely
        (1, 2),                  # duplicate edge
    ]
    got = _spark_cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}
    assert 30 not in got  # self-loop only => no pair evidence


def test_cc_long_path_converges_fast(spark):
    """A 40-node path: one-hop propagation alone would need ~40 rounds;
    with path halving the budget of 10 must be plenty."""
    edges = [(i, i + 1) for i in range(100, 140)]
    got = _spark_cc(spark, edges, max_iter=10)
    assert got == {i: 100 for i in range(100, 141)}


def test_cc_matches_bfs_on_random_graphs(spark):
    random.seed(5)
    for trial in range(3):
        nodes = list(range(trial * 1000, trial * 1000 + 120))
        edges = [
            (random.choice(nodes), random.choice(nodes)) for _ in range(90)
        ]
        edges = [(u, v) for u, v in edges if u != v]
        assert _spark_cc(spark, edges) == _bfs_components(edges)


def test_cc_nonconvergence_raises(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "id_l long, id_r long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iter=1)


def test_dedup_survivors_one_per_cluster(spark):
    edges = [(5, 9), (9, 7), (21, 22)]
    df = spark.createDataFrame(edges, "id_l long, id_r long")
    rows = {r["node"]: (r["component"], r["is_survivor"])
            for r in dedup_survivors(df).collect()}
    assert rows == {
        5: (5, True), 9: (5, False), 7: (5, False),
        21: (21, True), 22: (21, False),
    }
    # exactly one survivor per component
    comps = {}
    for n, (c, s) in rows.items():
        comps.setdefault(c, []).append(s)
    assert all(sum(v) == 1 for v in comps.values())


def test_cc_over_embedding_near_dup_pairs(spark):
    """The other pair source: embedding near-dup edges (q27's operator)
    resolve into components — every edge's two ends share a component,
    exactly one survivor per cluster, and all endpoint ids appear."""
    import __spark_entry__ as entry

    pairs = entry.q27_embedding_near_dups(spark, "/root/testdata/sf0.001")
    edges = {(r["id_l"], r["id_r"]) for r in pairs.collect()}
    assert edges, "fixture regression: q27 found no pairs at sf0.001"
    out = {r["node"]: (r["component"], r["is_survivor"])
           for r in dedup_survivors(pairs).collect()}
    assert set(out) == {n for e in edges for n in e}
    for u, v in edges:
        assert out[u][0] == out[v][0]
    comps = {}
    for _n, (c, surv) in out.items():
        comps[c] = comps.get(c, 0) + int(surv)
    assert all(v == 1 for v in comps.values())
    assert out == _bfs_components_survivors(edges)


def _bfs_components_survivors(edges):
    cc = _bfs_components(edges)
    return {n: (c, n == c) for n, c in cc.items()}


def test_cc_string_ids(spark):
    """Doc ids are strings in the CDC shape; min is lexicographic."""
    df = spark.createDataFrame(
        [("db", "da"), ("da", "dc"), ("x2", "x1")], "id_l string, id_r string"
    )
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"da": "da", "db": "da", "dc": "da", "x1": "x1", "x2": "x1"}
