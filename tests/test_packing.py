"""Sequence-packing operator: the distributed prefix sum must equal the
single-window formulation exactly, and pack assignment must satisfy the
concat-and-chunk invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from applications_analytics_midas_hbase_metrics_spark.operators import packing as P


def test_global_prefix_sum_matches_window(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(1, 501)]
    df = spark.createDataFrame(rows, ["k", "v"]).repartition(8)
    got = {
        r.k: r.cum
        for r in P.global_prefix_sum(df, "v", "k", num_partitions=6).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {r.k: r.cum for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == want


def test_assign_packs_invariants(spark):
    rows = [(i, (i * 13) % 40 + 1) for i in range(1, 301)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    packed = P.assign_packs(df, budget=100).collect()
    by_id = sorted(packed, key=lambda r: r.doc_id)
    cum = 0
    for r in by_id:
        # pack = chunk the doc STARTS in; offset = position inside it
        assert r.pack_id == cum // 100, r
        assert r.pack_offset == cum % 100, r
        cum += r.n_tokens
        assert r.cum_tokens == cum, r
    # monotone pack ids in doc order, no gaps
    ids = [r.pack_id for r in by_id]
    assert ids == sorted(ids)
    assert set(range(max(ids) + 1)) == set(ids)


def test_pack_summary_conserves_tokens(spark):
    rows = [(i, (i * 7) % 25 + 1) for i in range(1, 201)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    packed = P.assign_packs(df, budget=64)
    summary = P.pack_summary(packed)
    total = summary.agg(
        F.sum("pack_tokens").alias("t"), F.sum("n_docs").alias("d")
    ).collect()[0]
    assert total.t == sum(v for _, v in rows)
    assert total.d == len(rows)


def test_prefix_sum_plan_has_no_global_window(spark):
    """The scale property itself: no single-partition exchange feeds the
    running-sum window (a global ORDER BY window would show
    Exchange SinglePartition -> Window)."""
    rows = [(i, i % 5 + 1) for i in range(1, 201)]
    df = spark.createDataFrame(rows, ["k", "v"]).repartition(8)
    out = P.global_prefix_sum(df, "v", "k", num_partitions=6)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # the only SinglePartition exchange allowed is for the tiny
    # per-partition offsets frame (feeds its own Window over |parts| rows)
    windows = plan.count("Window")
    assert windows >= 1
    main_window_single = re.search(
        r"Exchange SinglePartition[^\n]*\n[^\n]*Sort[^\n]*\n[^\n]*_local",
        plan,
    )
    assert main_window_single is None, plan
