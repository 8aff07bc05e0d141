"""Bucketed cell store: co-located joins must run without a shuffle on
either bucketed side (SURVEY §4 / task brief: bucketing for co-located
joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from applications_analytics_midas_hbase_metrics_spark.operators import cellstore as CS
from tests.conftest import final_plan


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cells = CS.to_cells(
        li, ["l_returnflag", "l_linestatus", "l_orderkey"],
        F.col("l_partkey"), ["l_linenumber"],
    )
    CS.write_cells_bucketed(cells, "cells_a", buckets=8)
    # second table: the validation counterpart (perturbed copy)
    CS.write_cells_bucketed(
        cells.withColumn("values", F.slice("values", 1, 1)), "cells_b", buckets=8
    )
    yield "cells_a", "cells_b"
    spark.sql("DROP TABLE IF EXISTS cells_a")
    spark.sql("DROP TABLE IF EXISTS cells_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    a, b = bucketed_tables
    # force a sort-merge join so locality matters (no broadcast shortcut)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(a).join(spark.table(b), "row_key")
        n = joined.count()
        assert n > 0
        plan = final_plan(joined)
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in final
        # co-located: neither side shuffles
        assert "Exchange hashpartitioning" not in final, final[:2000]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    a, _ = bucketed_tables
    agg = spark.table(a).groupBy("row_key").agg(F.count("*").alias("n"))
    agg.count()
    plan = final_plan(agg)
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange hashpartitioning" not in final, final[:2000]


def test_bucketed_roundtrip_content(spark, sf_dir, bucketed_tables):
    a, _ = bucketed_tables
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    expected = CS.to_cells(
        li, ["l_returnflag", "l_linestatus", "l_orderkey"],
        F.col("l_partkey"), ["l_linenumber"],
    ).select("row_key", "col_name", "values")
    got = spark.table(a).select("row_key", "col_name", "values")
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
