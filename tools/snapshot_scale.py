"""End-to-end corpus_snapshot growth (round-7 verdict item #7): the
full gated chain — quality filter -> exact dedup -> 80/10/10 split ->
per-split sequence packing — timed as ONE composed pipeline on
1x/4x/16x/64x replicas of the sf0.1 documents corpus, closing the
composition story whose per-STAGE curves SCALE.md already records.

Usage: python tools/snapshot_scale.py [max_factor]   (default 64)
Prints one JSON line per factor.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    max_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.plans.queries_curation import (
        corpus_snapshot_frame,
    )
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(
        app_name="midas-snapshot-scale",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.count()

    factor = 1
    while factor <= max_factor:
        # a replica-unique suffix keeps replicas out of each other's
        # exact-dup groups — bare copies would all be deduped away and
        # the split/pack stages would never grow with the factor
        corpus = (
            docs.crossJoin(spark.range(factor).select(F.col("id").alias("rep")))
            .select(
                (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
                F.concat("text", F.lit(" r"), F.col("rep")).alias("text"),
            )
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True)  # time the chain, not the union
        )
        n_docs = corpus.count()
        t0 = time.monotonic()
        rows = corpus_snapshot_frame(corpus).collect()
        dt = time.monotonic() - t0
        out = {r.split: (r.n_docs, r.n_tokens, r.n_packs) for r in rows}
        print(
            json.dumps(
                {
                    "factor": factor,
                    "n_docs": n_docs,
                    "end_to_end_sec": round(dt, 2),
                    "splits": out,
                }
            )
        )
        sys.stdout.flush()
        factor *= 4


if __name__ == "__main__":
    main()
