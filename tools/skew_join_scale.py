"""AQE skew-join measurement: a sort-merge join with one hot key, AQE
skewJoin ON vs OFF.

operators/joins.py's salted aggregation handles AGGREGATION skew
manually because AQE does not cover it; for JOIN skew the engine's
answer is AQE's skewedJoin rewrite (split the oversized partition,
replicate the matching build side).  This harness verifies the claim
the docstring makes — that join skew needs no manual salting on this
engine — with a measurement: a fact table whose hot key owns ~30% of
all rows, joined to a dim too big to broadcast, timed with the rewrite
enabled and disabled, plus the max/median post-shuffle partition-size
skew AQE reports.

Usage: python tools/skew_join_scale.py [n_rows] [hot_frac]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
HOT_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
N_KEYS = 50_000


def main() -> None:
    import re

    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(app_name="skew-join-scale", cpus=32)

    # fact: HOT_FRAC of rows on key 0, the rest uniform over N_KEYS;
    # a fat payload column so the hot partition's BYTES trip the
    # skew detector, not just its row count
    fact = spark.range(N_ROWS).select(
        F.when(
            (F.col("id") % 1_000_000) < int(HOT_FRAC * 1_000_000), F.lit(0)
        )
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("attr"),
    )

    def run(skew_on: bool, label: str) -> None:
        conf = {
            "spark.sql.adaptive.skewJoin.enabled": str(skew_on).lower(),
            # make the splitter see the hot partition at fixture scale
            # (defaults target multi-GB partitions)
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # keep AQE from fusing everything into few partitions first
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        }
        old = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            t0 = time.monotonic()
            out = fact.join(dim, "k").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
            )
            row = out.collect()[0]  # driver-ok: 1-row aggregate
            wall = round(time.monotonic() - t0, 2)
            plan = out._jdf.queryExecution().executedPlan().toString()
            markers = len(re.findall(r"skew", plan, re.IGNORECASE))
            join_kind = (
                "SMJ" if "SortMergeJoin" in plan
                else "SHJ" if "ShuffledHashJoin" in plan
                else "?"
            )
            print(
                f"{label} skewJoin={'on ' if skew_on else 'off'} "
                f"wall={wall:6.2f}s rows={row.n} join={join_kind} "
                f"plan_skew_markers={markers}"
            )
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    run(False, "warmup ")  # JIT + shuffle-service warm; discard
    for label in ("r1", "r2", "r3"):
        run(False, label)
        run(True, label)


if __name__ == "__main__":
    main()
