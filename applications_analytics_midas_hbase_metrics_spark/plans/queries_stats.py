"""Statistics + temporal-feature queries: exact percentiles, approximate
distinct counts (rows-only — approximation algorithms differ by engine),
and calendar-part extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register, register_extra, t


@register(
    "quantiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS p50,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90,
           round(quantile_cont(l_quantity, 0.99), 6) AS p99
    FROM lineitem GROUP BY 1
    """,
)
def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont`` definition); rounded to absorb last-bit
    interpolation differences."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("l_quantity", F.lit(0.99)), 6).alias("p99"),
    )


@register_extra("approx_distinct")  # HLL differs per engine → rows-only; pytest tier
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to the exact count so
    the rows-only check still validates shape; the test suite asserts
    the approximation error bound instead."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count_distinct("l_partkey").cast("bigint").alias("exact_parts"),
    )


@register_extra(
    # retired to the pytest tier: pure projection over ts (the windowed
    # aggregations gate the time-bucketing math)
    "time_features",
    oracle="""
    SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
           CAST(dayofweek(ts) AS INT) AS dow, CAST(hour(ts) AS INT) AS h,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(date_trunc('day', ts)) AS TIMESTAMP) AS first_day
    FROM events GROUP BY 1, 2, 3, 4
    """,
)
def q_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-part extraction + date_trunc (F14-family surface).
    DuckDB dayofweek is 0=Sunday..6; Spark dayofweek is 1=Sunday..7 —
    normalized here to the DuckDB convention."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("h"),
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.min(F.date_trunc("day", F.col("ts"))).alias("first_day"),
    )
