"""IVF recall-vs-nprobe curve at a production-size codebook (C=256):
the accuracy side of the accuracy/cost trade whose COST side
tools/ivf_scale.py pins (search exchanges constant in C).

Ground truth is the exact brute-force cosine top-k over the replicated
corpus; recall@k = |ivf_topk ∩ brute_topk| / |brute_topk| pooled over
all queries.  One codebook (1 sampled-Lloyd step) is built per run and
reused across the nprobe sweep, matching a deployment (the index is the
persisted artifact; nprobe is the per-query knob).

Usage: python tools/ivf_recall.py [factor] [C]   (default 16 256)
Prints one JSON line per nprobe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import (
        similarity as S,
    )
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(
        app_name="midas-ivf-recall", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    # Deterministic 5% per-component jitter on top of the replication
    # nudge: WITHOUT it each query's true top-10 is its own replica
    # family, which lands in one inverted list and saturates recall at
    # nprobe=1-2 (measured: 0.97 @ nprobe=1 on the bare replicas) —
    # the jitter spreads neighbor families across list boundaries so
    # the nprobe knob is actually exercised.
    jitter = F.transform(
        F.col("embedding"),
        lambda x, i: x
        * (1.0 + 0.05 * F.sin(F.col("vec_id") * (i.cast("double") + 1.0))),
    )
    corpus = (
        S.replicate_embeddings(emb, factor)
        .select("vec_id", jitter.alias("embedding"))
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    n_vecs = corpus.count()
    queries = corpus.filter(F.col("vec_id") % 200 == 0).localCheckpoint(eager=True)
    n_q = queries.count()

    truth = {
        (r.query_id, r.corpus_id)
        for r in S.brute_force_topk(corpus, queries, k=10).collect()
    }
    cents = S.build_ivf_centroids(
        corpus, num_centroids=c, lloyd_steps=1
    ).localCheckpoint(eager=True)
    index = S.ivf_index(corpus, cents).localCheckpoint(eager=True)
    for nprobe in (1, 2, 4, 8, 16, 32):
        t0 = time.monotonic()
        got = {
            (r.query_id, r.corpus_id)
            for r in S.ivf_topk(
                corpus, queries, cents, k=10, nprobe=nprobe, index=index
            ).collect()
        }
        dt = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "factor": factor,
                    "n_vecs": n_vecs,
                    "n_queries": n_q,
                    "C": c,
                    "nprobe": nprobe,
                    "recall_at_10": round(len(got & truth) / len(truth), 4),
                    "search_sec": round(dt, 2),
                }
            )
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
