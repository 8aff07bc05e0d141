"""Winnowing gram-hash cost: java polynomial fold vs native xxhash64
at 80k documents.

The gram hash dominates the MOSS pipeline's per-character cost (one
hash per character position per document); the java fold is an O(k)
interpreted expression per gram kept for DuckDB replay, while
``hash_fn="xxhash64"`` is one native call per gram with the identical
plan shape.  This harness replicates the sf0.1 documents table to 80k
docs and times the full fingerprint projection (count() over the
exploded fps) under both hash fns, plus the detection join end-to-end.

Usage: python tools/winnow_hash_scale.py   (env SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
FACTOR = 16


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import text as T
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(
        app_name="midas-winnow-hash",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs
    for i in range(1, FACTOR):
        # replicas share text -> the overlap join would explode; suffix
        # a replica marker so the timing measures the hash/selection
        # projection, not a degenerate quadratic join
        corpus = corpus.union(
            docs.select(
                (F.col("doc_id") + 1_000_000 * i).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text"),
            )
        )
    corpus = corpus.repartition(
        spark.sparkContext.defaultParallelism
    ).localCheckpoint(eager=True)
    n_docs = corpus.count()

    for hash_fn in ("java", "xxhash64"):
        # fingerprint projection (the map-side cost the hash dominates)
        for _ in range(2):  # warm then measured
            t0 = time.monotonic()
            n_fps = T.winnow_fingerprints(corpus, k=8, w=4, hash_fn=hash_fn).count()
            t_fp = time.monotonic() - t0
        t0 = time.monotonic()
        n_pairs = T.winnow_overlap_pairs(
            corpus, k=8, w=4, max_df=20, hash_fn=hash_fn
        ).count()
        t_pairs = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "hash_fn": hash_fn,
                    "n_docs": n_docs,
                    "n_fps": n_fps,
                    "fingerprint_sec": round(t_fp, 2),
                    "n_pairs": n_pairs,
                    "detect_sec": round(t_pairs, 2),
                }
            )
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
