"""Measure bfs_distances growth: replicate the sparse supplier<->part
graph into k DISJOINT copies (id offsets), one seed set per copy.

Expectations at factor k:
- result rows scale EXACTLY linearly (each copy reaches the same set —
  an exactness check, not a timing one);
- superstep count stays constant (diameter is per-copy);
- wall time grows ~linearly in edges (each superstep is a keyed
  frontier join + dedup + anti-join, no all-pairs term anywhere).

Usage: python tools/bfs_scale.py [max_factor]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
MAX_FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 16
OFFSET = 10_000_000


def graph(spark, factor: int):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(
        F.col("l_quantity") < 5
    )
    fwd = li.select(
        F.col("l_suppkey").cast("bigint").alias("src"),
        (F.col("l_partkey") + 1_000_000).cast("bigint").alias("dst"),
    )
    e1 = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    reps = spark.range(factor).select((F.col("id") * OFFSET).alias("off"))
    e = e1.crossJoin(reps).select(
        (F.col("src") + F.col("off")).alias("src"),
        (F.col("dst") + F.col("off")).alias("dst"),
    )
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet").filter(
        F.col("s_suppkey") % 17 == 0
    )
    seeds = sup.crossJoin(reps).select(
        (F.col("s_suppkey") + F.col("off")).alias("node")
    )
    return e.repartition(32), seeds


def main() -> None:
    from applications_analytics_midas_hbase_metrics_spark.operators import graph as G
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(app_name="bfs-scale", cpus=32)
    base_rows = None
    factor = 1
    while factor <= MAX_FACTOR:
        e, seeds = graph(spark, factor)
        e = e.localCheckpoint(eager=True)
        seeds = seeds.localCheckpoint(eager=True)
        n_edges = e.count()
        t0 = time.time()
        rows = G.bfs_distances(e, seeds, max_hops=4).count()
        dt = time.time() - t0
        if base_rows is None:
            base_rows = rows
        linear = rows == base_rows * factor
        print(
            f"factor {factor:3d}: {n_edges:9d} edges  bfs {dt:6.2f}s  "
            f"rows {rows} (exactly {factor}x base: {linear})"
        )
        assert linear
        factor *= 4


if __name__ == "__main__":
    main()
