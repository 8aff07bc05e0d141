"""quality_sharded_snapshot end-to-end at replication scale: time the
composed chain (NB score → per-source rank → rank² keep → exact dedup
→ 8-shard shuffle → manifest) on 1×/4×/16× replicas of the sf0.1
documents corpus and check the manifest stays consistent — kept
fraction near the analytic 1/3 of the rank² sampler, shard doc counts
balanced, and wall time growing near-linearly (every stage is a
map-side expression, a token-keyed join, or a partitioned window —
nothing quadratic anywhere in the chain).

Replicas perturb the text with a replica-suffix so the exact-dedup
stage doesn't collapse them (which would make later factors trivially
cheap) while the classifier's vocabulary stays natural.

Usage: python tools/qsnap_scale.py [max_factor]   (default 16)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
MAX_FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import (
        classify as CL,
    )
    from applications_analytics_midas_hbase_metrics_spark.operators.sampling import (
        fibonacci_bucket,
    )
    from applications_analytics_midas_hbase_metrics_spark.plans.queries_curation import (
        quality_sharded_snapshot_frame,
    )
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(app_name="midas-qsnap-scale", cpus="32")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    n0 = base.groupBy().agg(F.max("doc_id")).first()[0] + 1  # driver-ok: bounded argmax
    factor = 1
    while factor <= MAX_FACTOR:
        docs = (
            base.crossJoin(spark.range(factor).select(F.col("id").alias("rep")))
            .select(
                (F.col("doc_id") + F.col("rep") * n0).alias("doc_id"),
                F.when(
                    F.col("rep") == 0, F.col("text")
                ).otherwise(
                    F.concat("text", F.lit(" rep"), F.col("rep").cast("string"))
                ).alias("text"),
                "source",
            )
            .withColumn("label", (F.col("source") == "src0").cast("int"))
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True)
        )
        n_docs = docs.count()
        t0 = time.monotonic()
        model = CL.nb_quality_train(
            docs.filter(fibonacci_bucket("doc_id") < 80)
        ).localCheckpoint(eager=True)
        t_train = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        manifest = quality_sharded_snapshot_frame(docs, model).collect()
        t_chain = round(time.monotonic() - t0, 2)
        kept = sum(r.n_docs for r in manifest)
        sizes = sorted(r.n_docs for r in manifest)
        print(
            json.dumps(
                {
                    "factor": factor,
                    "n_docs": n_docs,
                    "train_sec": t_train,
                    "chain_sec": t_chain,
                    "n_kept": kept,
                    "kept_frac": round(kept / n_docs, 3),
                    "shard_min_max": [sizes[0], sizes[-1]],
                }
            )
        )
        sys.stdout.flush()
        factor *= 4


if __name__ == "__main__":
    main()
