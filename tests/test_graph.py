"""Connected components + dedup representative tests."""

from __future__ import annotations

import pytest

from applications_analytics_midas_hbase_metrics_spark.operators import graph as G


def test_chain_and_triangle_components(spark):
    # chain 1-2-3-4, triangle 10-11-12, isolated pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["id_a", "id_b"],
    )
    got = {r.id: r.cluster_id for r in G.connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_converges(spark):
    # diameter 19: needs many supersteps
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 119)], ["id_a", "id_b"]
    )
    got = {r.id: r.cluster_id for r in G.connected_components(edges).collect()}
    assert set(got.values()) == {100}
    assert len(got) == 20


def test_dedup_representatives(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in [1, 2, 3, 50, 60]], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    kept = sorted(r.id for r in G.dedup_representatives(docs, pairs).collect())
    # cluster {1,2,3} -> keep 1; 50 and 60 unpaired -> kept
    assert kept == [1, 50, 60]


def test_quality_representatives(spark):
    # cluster {1,2,3}: doc 2 scores highest -> keep 2 (NOT min id);
    # cluster {10,11}: tie on score -> keep lower id 10;
    # 50 unpaired -> singleton, always kept
    scored = spark.createDataFrame(
        [(1, 0.3), (2, 0.9), (3, 0.5), (10, 0.7), (11, 0.7), (50, 0.1)],
        ["id", "quality_score"],
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
    comps = G.connected_components(pairs)
    out = {
        r.id: (r.cluster_id, r.keep)
        for r in G.quality_representatives(scored, comps).collect()
    }
    assert out == {
        1: (1, 0),
        2: (1, 1),
        3: (1, 0),
        10: (10, 1),
        11: (10, 0),
        50: (50, 1),
    }
    # plan contract (round 13): argmax is the max-struct aggregation +
    # equi join, never a per-cluster window funnel
    plan = (
        G.quality_representatives(scored, comps)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_quality_representatives_extreme_ids_and_null_scores(spark):
    """Edge hardening (round 13): the tie-break field is ~id (bitwise
    NOT), which unlike -id cannot overflow at Long.MIN_VALUE; an
    all-NULL-score cluster still keeps exactly its min id (null-safe
    winner equality)."""
    lo = -(2**63)
    scored = spark.createDataFrame(
        [(lo, 0.5), (7, 0.5), (20, None), (21, None)],
        "id long, quality_score double",
    )
    comps = spark.createDataFrame(
        [(lo, 1), (7, 1), (20, 2), (21, 2)], "id long, cluster_id long"
    )
    out = {
        r.id: r.keep
        for r in G.quality_representatives(scored, comps).collect()
    }
    # score tie in cluster 1 -> min id wins, even at Long.MIN_VALUE
    assert out == {lo: 1, 7: 0, 20: 1, 21: 0}


def _pr_ref(edges, n_iter=5, d=0.85):
    """Pure-Python power iteration, same contract as graph.pagerank."""
    nodes = sorted({x for e in edges for x in e})
    out = {}
    for s, t in set(edges):
        out.setdefault(s, []).append(t)
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        nxt = {v: (1 - d) / n for v in nodes}
        for s, ts in out.items():
            share = r[s] / len(ts)
            for t in ts:
                nxt[t] += d * share
        r = nxt
    return r


def test_pagerank_matches_reference_on_small_graphs(spark):
    from applications_analytics_midas_hbase_metrics_spark.operators.graph import (
        pagerank,
    )

    graphs = [
        [(1, 2), (2, 1)],                          # 2-cycle: 0.5 / 0.5
        [(1, 2), (2, 3), (3, 1)],                  # 3-cycle: uniform
        # symmetrized star: hub 1 <-> leaves 2..5
        [(1, k) for k in (2, 3, 4, 5)]
        + [(k, 1) for k in (2, 3, 4, 5)],
        # asymmetric but every node has an out-edge
        [(1, 2), (2, 3), (3, 1), (1, 3), (3, 2)],
    ]
    for edges in graphs:
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: r.rank
            for r in pagerank(df, n_iter=5).collect()  # driver-ok: tiny graph
        }
        want = _pr_ref(edges)
        assert set(got) == set(want)
        for v, x in want.items():
            assert got[v] == pytest.approx(x, abs=1e-12), (edges, v)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_checkpointing_is_value_identical(spark):
    from applications_analytics_midas_hbase_metrics_spark.operators.graph import (
        pagerank,
    )

    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    plain = {
        r.node: r.rank
        for r in pagerank(df, n_iter=6).collect()  # driver-ok: tiny graph
    }
    ck = {
        r.node: r.rank
        for r in pagerank(
            df, n_iter=6, checkpoint_every=2
        ).collect()  # driver-ok: tiny graph
    }
    assert ck == plain


def test_bfs_distances_chain_and_min_path(spark):
    """Chain 1-2-3-4-5 plus a shortcut 1-4: node 4 settles at its
    MINIMUM depth (1 via the shortcut, not 3 via the chain); node 5
    follows at 2; hop cap cuts the tail; isolated seeds report 0."""
    from applications_analytics_midas_hbase_metrics_spark.operators.graph import bfs_distances

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(1,), (99,)], "node bigint")
    got = {
        (r.node, r.dist)
        for r in bfs_distances(e, seeds, max_hops=10).collect()
    }
    assert got == {(1, 0), (99, 0), (2, 1), (4, 1), (3, 2), (5, 2)}
    capped = {
        (r.node, r.dist)
        for r in bfs_distances(e, seeds, max_hops=1).collect()
    }
    assert capped == {(1, 0), (99, 0), (2, 1), (4, 1)}
    # max_hops=0: seeds only
    zero = {
        (r.node, r.dist)
        for r in bfs_distances(e, seeds, max_hops=0).collect()
    }
    assert zero == {(1, 0), (99, 0)}


def test_bfs_distances_early_exit_and_dup_seeds(spark):
    """Duplicate seed rows collapse; the loop exits when the frontier
    empties (hop budget far beyond the graph diameter still returns
    the exact reachable set)."""
    from applications_analytics_midas_hbase_metrics_spark.operators.graph import bfs_distances

    e = spark.createDataFrame([(1, 2), (2, 1)], "src bigint, dst bigint")
    seeds = spark.createDataFrame([(1,), (1,)], "node bigint")
    got = {
        (r.node, r.dist)
        for r in bfs_distances(e, seeds, max_hops=50).collect()
    }
    assert got == {(1, 0), (2, 1)}


def test_bfs_empty_seeds_and_no_edges(spark):
    from applications_analytics_midas_hbase_metrics_spark.operators.graph import bfs_distances

    e = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    no_seeds = spark.createDataFrame([], "node bigint")
    assert bfs_distances(e, no_seeds, max_hops=3).collect() == []
    seeds = spark.createDataFrame([(7,)], "node bigint")
    no_edges = spark.createDataFrame([], "src bigint, dst bigint")
    got = {(r.node, r.dist) for r in bfs_distances(no_edges, seeds, max_hops=3).collect()}
    assert got == {(7, 0)}
