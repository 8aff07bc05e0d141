"""IVF codebook-growth evidence: the ann_ivf plan at production-ish
codebook sizes.

The gated query runs C=16/nprobe=4 over the fixture's 2k vectors; a
production IVF runs hundreds of lists.  The scaling claim to pin is
that CODEBOOK GROWTH DOES NOT MULTIPLY EXCHANGES: the codebook rides
every stage as a broadcast (centroid assignment is a map-side
cross-score + max_by aggregation whose exchange carries one row per
input row regardless of C; probe selection is a per-query window over
nprobe x |queries| rows), so a bigger C changes per-row compute, never
the shuffle structure.

This harness replicates the embeddings corpus (id offsets + a
deterministic per-replica first-component nudge, so replicas do not
collapse into exact cosine ties), then for each (C, nprobe, factor)
builds a codebook (1 Lloyd step) and runs ivf_topk end-to-end, timing
the run and counting Exchange nodes in the FINAL AQE plan of both the
codebook build and the search.

Usage: python tools/ivf_scale.py [max_factor]   (default 16)
Prints one JSON line per config to stdout; env SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # count materialized shuffle boundaries only: not broadcast
    # distribution, and not ReusedExchange nodes (references to an
    # already-materialized exchange, broadcast or shuffle — counting
    # them would overstate the shuffle totals recorded in SCALE.md)
    return sum(
        line.count("Exchange")
        - line.count("BroadcastExchange")
        - line.count("ReusedExchange")
        for line in plan.splitlines()
    )


def main() -> None:
    max_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import (
        similarity as S,
    )
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(
        app_name="midas-ivf-scale", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    emb.count()  # warm footers

    for factor in (1, 4, max_factor):
        corpus = S.replicate_embeddings(emb, factor)
        corpus = corpus.repartition(spark.sparkContext.defaultParallelism)
        corpus = corpus.localCheckpoint(eager=True)  # time IVF, not the union
        n_vecs = corpus.count()
        queries = corpus.filter(F.col("vec_id") % 40 == 0)

        for c, nprobe in ((16, 4), (64, 8), (256, 16)):
            t0 = time.monotonic()
            cents = S.build_ivf_centroids(
                corpus, num_centroids=c, lloyd_steps=1
            ).localCheckpoint(eager=True)
            t_codebook = time.monotonic() - t0
            # index build: the query-independent |corpus| x C assignment
            # a deployment runs once per snapshot and persists
            t0 = time.monotonic()
            index = S.ivf_index(corpus, cents).localCheckpoint(eager=True)
            t_index = time.monotonic() - t0
            # search against the prebuilt index: the recurring per-query-
            # batch cost, which must scale with the PROBED candidates
            # (~ |q| x |corpus| x nprobe/C), not with C
            t0 = time.monotonic()
            topk = S.ivf_topk(corpus, queries, cents, k=10, nprobe=nprobe, index=index)
            n_out = topk.count()
            t_search = time.monotonic() - t0
            print(
                json.dumps(
                    {
                        "factor": factor,
                        "n_vecs": n_vecs,
                        "C": c,
                        "nprobe": nprobe,
                        "codebook_sec": round(t_codebook, 2),
                        "index_sec": round(t_index, 2),
                        "search_sec": round(t_search, 2),
                        "search_exchanges": _exchanges(topk),
                        "n_out": n_out,
                    }
                )
            )
            sys.stdout.flush()


if __name__ == "__main__":
    main()
