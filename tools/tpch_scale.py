"""TPC-H heavy-shape growth curves: q12 (fact-fact non-equi join),
q16 (broadcast anti + count-distinct expand), q21 (EXISTS + NOT-EXISTS
triple self-join) over sf0.1 replicated 1x/4x/16x.

Replication offsets the ORDER key space per replica (orderkey' =
orderkey*rep + r on BOTH lineitem and orders), so each replica is a
disjoint order universe: per-order group sizes stay constant while row
volume grows — the regime a 100 TB cluster sees.  Suppliers/parts are
shared across replicas (dimension tables don't grow with the fact).

The three bodies mirror plans/queries_tpch.py q12/q16/q21 operator-for-
operator (same join types, same residuals); they are inlined here only
because the registered queries read from parquet paths and this harness
must inject replicated frames.

Usage: python tools/tpch_scale.py [replications_csv]   (default 1,4,16)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
REPS = (
    [int(x) for x in sys.argv[1].split(",")]
    if len(sys.argv) > 1
    else [1, 4, 16]
)


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(app_name="tpch-scale", cpus=32)
    li_base = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_quantity",
        "l_returnflag", "l_shipdate",
    )
    ord_base = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    supp = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")

    for rep in REPS:
        li, orders = li_base, ord_base
        if rep > 1:
            r = spark.range(rep).select(F.col("id").alias("_r"))
            li = li_base.crossJoin(r).select(
                (F.col("l_orderkey") * rep + F.col("_r")).alias("l_orderkey"),
                "l_suppkey", "l_partkey", "l_quantity",
                "l_returnflag", "l_shipdate",
            )
            orders = ord_base.crossJoin(r).select(
                (F.col("o_orderkey") * rep + F.col("_r")).alias("o_orderkey"),
                "o_orderdate", "o_orderpriority",
            )
        li = li.localCheckpoint(eager=True)
        orders = orders.localCheckpoint(eager=True)
        n_li = li.count()

        # -- q12 shape: lineitem x orders equi + non-equi residual ----
        t0 = time.time()
        high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        q12 = (
            li.filter(
                (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            )
            .join(
                orders,
                (F.col("l_orderkey") == F.col("o_orderkey"))
                & (
                    F.col("l_shipdate")
                    >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
                ),
            )
            .groupBy("l_returnflag")
            .agg(
                F.sum(F.when(high, 1).otherwise(0)).alias("high_cnt"),
                F.sum(F.when(high, 0).otherwise(1)).alias("low_cnt"),
            )
        )
        rows12 = q12.collect()
        t12 = time.time() - t0

        # -- q16 shape: broadcast LeftAnti blocklist + countDistinct --
        t0 = time.time()
        blocked = supp.filter(F.col("s_nationkey") == 0).select("s_suppkey")
        p = part.filter(F.col("p_brand") != "Brand#1")
        q16 = (
            li.join(
                F.broadcast(blocked),
                F.col("l_suppkey") == F.col("s_suppkey"),
                "left_anti",
            )
            .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        )
        n16 = q16.count()
        t16 = time.time() - t0

        # -- q21 shape: returned line + EXISTS other supplier
        #    + NOT EXISTS other supplier's return (triple self-join) --
        t0 = time.time()
        l1 = li.filter(F.col("l_returnflag") == "R")
        l2 = li.select(
            F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
        )
        l3 = li.filter(F.col("l_returnflag") == "R").select(
            F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
        )
        q21 = (
            l1.join(
                l2,
                (l1.l_orderkey == F.col("k2"))
                & (l1.l_suppkey != F.col("s2")),
                "left_semi",
            )
            .join(
                l3,
                (l1.l_orderkey == F.col("k3"))
                & (l1.l_suppkey != F.col("s3")),
                "left_anti",
            )
            .join(F.broadcast(supp), l1.l_suppkey == supp.s_suppkey)
            .groupBy("s_name")
            .agg(F.count("*").alias("numwait"))
        )
        total_wait = q21.agg(F.sum("numwait")).first()[0]
        t21 = time.time() - t0

        print(
            f"rep={rep:2d} lineitem={n_li:9,d}  "
            f"q12={t12:6.2f}s ({sum(r.high_cnt + r.low_cnt for r in rows12):,} lines)  "
            f"q16={t16:6.2f}s ({n16:,} groups)  "
            f"q21={t21:6.2f}s (numwait={total_wait:,})"
        )
        for df in (li, orders):
            df.unpersist()


if __name__ == "__main__":
    main()
