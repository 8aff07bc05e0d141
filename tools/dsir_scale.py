"""Scaling check for DSIR importance weighting
(operators/importance.py) under corpus replication and a hot-bucket
regime — the two ways the hashed-bag shape could degrade at 100 TB.

What must hold:
- weight-scoring wall grows ~linearly with corpus size (gram explode +
  two partial aggs + one broadcast join; nothing quadratic, no window);
- a degenerate vocabulary (90% of documents dominated by ONE repeated
  phrase, so one bucket carries ~90% of the corpus gram mass) shifts
  work into the partial aggregation's map-side combine — wall must
  stay flat vs the uniform corpus at the same size;
- the log-ratio side stays <= buckets rows and the scoring join stays
  broadcast (asserted from the plan).

Usage: python tools/dsir_scale.py [replications_csv]   (default 1,2,4)
xxhash64 mode is used here — the production flag; the oracle-parity
java fold is verified by the differential gate, not re-timed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import importance as IM
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    reps = [
        int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,2,4").split(",")
    ]
    spark = get_spark(
        app_name="dsir-scale", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )

    def replicated(mult: int, hot: bool):
        r = spark.range(mult).select(F.col("id").alias("rep"))
        d = base.crossJoin(F.broadcast(r)).select(
            (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"), "text"
        )
        if not hot:
            return d
        # 90% of docs become ONE phrase repeated 40x: a single gram
        # (and so a single bucket) carries ~90% of all gram mass
        phrase = " ".join(["hot phrase loop"] * 40)
        return d.select(
            "doc_id",
            F.when(F.col("doc_id") % 10 < 9, F.lit(phrase))
            .otherwise(F.col("text"))
            .alias("text"),
        )

    for mult in reps:
        for hot in (False, True):
            docs = replicated(mult, hot).repartition(64).localCheckpoint(
                eager=True
            )
            target = docs.filter(F.col("doc_id") % 5 == 0)
            t0 = time.monotonic()
            w = IM.dsir_log_weights(
                docs, target, buckets=4096, hash_mode="xxhash64"
            )
            n = w.count()
            wall = time.monotonic() - t0
            plan = w._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" in plan and "Window" not in plan
            print(
                f"mult={mult} hot={int(hot)} docs={n:>7} "
                f"wall={wall:.2f}s load={os.getloadavg()[0]:.1f}"
            )
    print("plans: broadcast ratio join, window-free (asserted each run)")


if __name__ == "__main__":
    main()
