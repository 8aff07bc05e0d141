"""Measure what ABTT buys similarity search on an anisotropic corpus.

Setup: the sf0.1 embeddings are the clean truth; a constant bias
direction (the anisotropy real sentence-embedding corpora exhibit —
Mu & Viswanath '18, Ethayarajh '19) is added to every vector.  Ground
truth = exact cosine top-10 on the CLEAN vectors.  Compared retrieval:
(a) exact cosine top-10 on the BIASED vectors, (b) the same after
pca_power_top + abtt_remove_top strips the dominant direction.

If ABTT works, (b)'s recall vs truth should recover most of what (a)
lost to the shared-bias term dominating every cosine.

Usage: python tools/abtt_quality.py [bias_scale]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
BIAS = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
K = 10
N_QUERIES = 50


def recall(spark, corpus, truth, label):
    from applications_analytics_midas_hbase_metrics_spark.operators.similarity import (
        brute_force_topk,
    )
    from pyspark.sql import functions as F

    queries = corpus.filter(F.col("vec_id") % 100 == 0).limit(N_QUERIES)
    t0 = time.time()
    got = {
        (r.query_id, r.corpus_id)
        for r in brute_force_topk(corpus, queries, k=K).collect()
    }
    dt = time.time() - t0
    hit = len(got & truth)
    print(
        f"{label:24s} recall@{K} = {hit}/{len(truth)} "
        f"({hit / len(truth):.3f})  ({dt:.1f}s)"
    )
    return hit / len(truth)


def main() -> None:
    from applications_analytics_midas_hbase_metrics_spark.operators.clustering import (
        abtt_remove_top,
        pca_power_top,
    )
    from applications_analytics_midas_hbase_metrics_spark.operators.similarity import (
        brute_force_topk,
    )
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="abtt-quality", cpus=32)
    clean = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
        .localCheckpoint(eager=True)
    )
    d = len(clean.first()["embedding"])  # driver-ok: one row
    # deterministic unit bias direction: alternating-sign ramp
    import math

    raw = [((-1) ** i) * (1.0 + (i % 7)) for i in range(d)]
    nrm = math.sqrt(sum(x * x for x in raw))
    bias = [BIAS * x / nrm for x in raw]
    biased = clean.select(
        "vec_id",
        F.zip_with(
            "embedding",
            F.array(*[F.lit(b) for b in bias]),
            lambda a, b: a + b,
        ).alias("embedding"),
    ).localCheckpoint(eager=True)

    q_clean = clean.filter(F.col("vec_id") % 100 == 0).limit(N_QUERIES)
    truth = {
        (r.query_id, r.corpus_id)
        for r in brute_force_topk(clean, q_clean, k=K).collect()
    }
    print(f"corpus {clean.count()} vectors, d={d}, bias |b|={BIAS}")
    recall(spark, biased, truth, "biased (no correction)")
    loading = pca_power_top(
        biased.withColumnRenamed("embedding", "e"), iters=5, d=d
    )
    corrected = abtt_remove_top(
        biased.withColumnRenamed("embedding", "e"), loading
    ).select(
        F.col("id").alias("vec_id"), F.col("corrected").alias("embedding")
    ).localCheckpoint(eager=True)
    recall(spark, corrected, truth, "ABTT-corrected")


if __name__ == "__main__":
    main()
