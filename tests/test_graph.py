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
