"""PageRank growth: per-run wall vs edge count on replicated graphs.

The claim (operators/graph.py): each round is one key-partitioned join
+ one map-side-combined aggregate, so a fixed-iteration run scales
linearly in |E| — no all-pairs step, no rank vector on the driver.
Replicas are id-offset copies of the sf0.1 supplier<->part graph
(disconnected components, so ranks stay well-defined) — |E| and |V|
both scale by the factor.

Usage: python tools/pagerank_scale.py [factors ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators.graph import (
        pagerank,
    )
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="pagerank-scale", cpus=32)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    fwd = li.select(
        F.col("l_suppkey").cast("bigint").alias("src"),
        (F.col("l_partkey") + 1_000_000).cast("bigint").alias("dst"),
    )
    base = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    for f in factors:
        e = base
        if f > 1:
            reps = spark.range(f).select((F.col("id") * 10_000_000).alias("o"))
            e = base.crossJoin(reps).select(
                (F.col("src") + F.col("o")).alias("src"),
                (F.col("dst") + F.col("o")).alias("dst"),
            )
        e = e.repartition(32).localCheckpoint()  # isolate iteration cost
        n_e = e.count()
        t0 = time.time()
        out = pagerank(e, n_iter=5, checkpoint_every=3)
        n_v = out.count()
        wall = time.time() - t0
        s = out.agg(F.sum("rank")).collect()[0][0]  # driver-ok: 1 row
        print(
            f"factor={f:3d} edges={n_e:10,d} nodes={n_v:8,d} "
            f"rank_sum={s:.6f} wall={wall:6.2f}s"
        )


if __name__ == "__main__":
    main()
