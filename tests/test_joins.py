"""As-of join + salted aggregation tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from applications_analytics_midas_hbase_metrics_spark.operators import joins as J


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:05", 100),
            (1, "2024-01-01 10:00:10", 200),
            (1, "2024-01-01 09:00:00", 50),   # before any quote
            (2, "2024-01-01 10:00:07", 300),
        ],
        ["sym", "ts", "qty"],
    ).withColumn("ts", F.to_timestamp("ts"))
    quotes = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 10.0),
            (1, "2024-01-01 10:00:10", 11.0),  # equal ts must match (<=)
            (2, "2024-01-01 10:00:06", 20.0),
        ],
        ["sym", "ts", "px"],
    ).withColumn("ts", F.to_timestamp("ts"))
    return trades, quotes


def test_asof_join_backward_semantics(trades_quotes):
    trades, quotes = trades_quotes
    out = J.asof_join(trades, quotes, on=["sym"], right_payload=["px"], how="left")
    got = {(r.sym, r.qty): r.right_px for r in out.collect()}
    assert got[(1, 100)] == 10.0   # latest quote at/before 10:00:05
    assert got[(1, 200)] == 11.0   # equal-timestamp quote matches
    assert got[(1, 50)] is None    # no prior quote -> null (left join)
    assert got[(2, 300)] == 20.0


def test_asof_join_inner_drops_unmatched(trades_quotes):
    trades, quotes = trades_quotes
    out = J.asof_join(trades, quotes, on=["sym"], right_payload=["px"], how="inner")
    assert out.count() == 3


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = J.salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "n": ("count", F.lit(1)),
            "qty_sum": ("sum", F.col("l_quantity").cast("decimal(18,2)")),
            "qty_max": ("max", F.col("l_quantity")),
            "qty_min": ("min", F.col("l_quantity")),
        },
        buckets=8,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_sum"),
        F.max("l_quantity").alias("qty_max"),
        F.min("l_quantity").alias("qty_min"),
    )
    s = {r.l_returnflag: (r.n, float(r.qty_sum), r.qty_max, r.qty_min) for r in salted.collect()}
    p = {r.l_returnflag: (r.n, float(r.qty_sum), r.qty_max, r.qty_min) for r in plain.collect()}
    assert s == p


def test_approx_distinct_within_rsd(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    r = (
        li.agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("a"),
            F.count_distinct("l_partkey").alias("e"),
        )
        .first()
    )
    assert abs(r.a - r.e) / r.e < 0.1  # well within 5 sigma of rsd=0.02


def test_salted_agg_spreads_hot_key(spark):
    # one key, many rows: phase 1 must produce multiple partial groups
    df = spark.range(0, 10000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    out = J.salted_agg(df, ["k"], {"n": ("count", F.lit(1))}, buckets=8)
    r = out.first()
    assert (r.k, r.n) == ("hot", 10000)

def test_interval_join_boundaries_and_plan(spark):
    from applications_analytics_midas_hbase_metrics_spark.operators.joins import (
        interval_join,
    )

    pts = spark.createDataFrame(
        [(1, 0), (2, 99), (3, 100), (4, 250), (5, 349), (6, 350), (7, 1000)],
        ["pid", "t"],
    )
    ivs = spark.createDataFrame(
        [(10, 100, 349),   # spans buckets 1..3 at bucket=100, ends mid-bucket
         (11, 0, 0),       # degenerate single-instant interval
         (12, 340, 360)],  # overlaps 10's tail
        ["iid", "lo", "hi"],
    )
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(pts, ivs, "t", "lo", "hi", bucket=100).collect()
    )
    # inclusive on BOTH ends; each qualifying pair exactly once
    # (point 5 at t=349 sits in BOTH overlapping windows 10 and 12)
    assert got == [(1, 11), (3, 10), (4, 10), (5, 10), (5, 12), (6, 12)]
    # the scale property: an equi-join plan — never nested-loop/cartesian
    out = interval_join(pts, ivs, "t", "lo", "hi", bucket=100)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
