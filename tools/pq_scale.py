"""PQ accuracy/cost evidence: recall-vs-(m, ksub, shortlist) at 32k
vectors, plus the composed IVF-PQ search against plain IVF and plain PQ
at the production-ish C=256 codebook.

The gated ann_pq/ann_ivf_pq queries pin ONE configuration's recall
floor; the scaling questions a deployment actually asks are (a) how
recall@10 moves with code budget (m codes x log2(ksub) bits) and
shortlist width — the knobs that trade index memory and rerank I/O for
accuracy — and (b) what the IVF x PQ composition costs and recovers
relative to either half alone at a codebook sized for real corpora.

Corpus: sf0.1 embeddings (2k) replicated x16 -> 32k vectors (replicas
are near- but not exact-duplicates, see replicate_embeddings).  Truth
is exact brute-force top-10 for ~50 queries; every config reports mean
recall@10 against it.

Usage: python tools/pq_scale.py          # full sweep (one JSON line per config)
       python tools/pq_scale.py quick    # m=16/ksub=32 only (smoke)
Env: SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
FACTOR = 16
K = 10


def main() -> None:
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"

    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import (
        similarity as S,
    )
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(
        app_name="midas-pq-scale", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    corpus = S.replicate_embeddings(emb, FACTOR)
    corpus = corpus.repartition(spark.sparkContext.defaultParallelism)
    corpus = corpus.localCheckpoint(eager=True)
    n_vecs = corpus.count()
    queries = corpus.filter(F.col("vec_id") % 631 == 17)  # ~50, spread over replicas
    n_q = queries.count()

    truth = {
        (r.query_id, r.corpus_id)
        for r in S.brute_force_topk(corpus, queries, k=K).collect()
    }

    def recall(found) -> tuple[float, float]:
        t0 = time.monotonic()
        got = {(r.query_id, r.corpus_id) for r in found.collect()}
        dt = time.monotonic() - t0
        return round(len(got & truth) / len(truth), 3), round(dt, 2)

    # -- (a) the PQ knob sweep: code budget x shortlist width ------------
    grid = (
        [(16, 32)]
        if quick
        else [(8, 16), (8, 32), (16, 16), (16, 32), (32, 32)]
    )
    for m, ksub in grid:
        t0 = time.monotonic()
        books = S.pq_train(corpus, m=m, ksub=ksub, lloyd_steps=1).localCheckpoint(
            eager=True
        )
        t_train = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        codes = S.pq_encode(corpus, books, m=m).localCheckpoint(eager=True)
        t_encode = round(time.monotonic() - t0, 2)
        for shortlist in (K, 4 * K, 16 * K):
            r, dt = recall(
                S.pq_topk(
                    queries, books, codes, k=K, m=m,
                    rerank=corpus, shortlist=shortlist,
                )
            )
            print(
                json.dumps(
                    {
                        "kind": "pq",
                        "n_vecs": n_vecs,
                        "n_queries": n_q,
                        "m": m,
                        "ksub": ksub,
                        "code_bits": m * max(1, (ksub - 1).bit_length()),
                        "shortlist": shortlist,
                        "recall@10": r,
                        "train_sec": t_train,
                        "encode_sec": t_encode,
                        "search_sec": dt,
                    }
                )
            )
            sys.stdout.flush()

    # -- (b) IVF vs PQ vs IVF-PQ at C=256 --------------------------------
    c, nprobe, m, ksub = 256, 16, 16, 32
    t0 = time.monotonic()
    cents = S.build_ivf_centroids(
        corpus, num_centroids=c, lloyd_steps=1
    ).localCheckpoint(eager=True)
    t_cents = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    books = S.pq_train(corpus, m=m, ksub=ksub, lloyd_steps=1).localCheckpoint(
        eager=True
    )
    t_books = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    ivf_idx = S.ivf_index(corpus, cents).localCheckpoint(eager=True)
    t_ivf_idx = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    codes = S.pq_encode(corpus, books, m=m).localCheckpoint(eager=True)
    t_codes = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    ivfpq_idx = (
        ivf_idx.select("corpus_id", "list_id")
        .join(codes.withColumnRenamed("id", "corpus_id"), "corpus_id")
        .select("corpus_id", "list_id", "codes")
        .localCheckpoint(eager=True)
    )
    t_ivfpq_idx = round(time.monotonic() - t0, 2)

    r_ivf, dt_ivf = recall(
        S.ivf_topk(corpus, queries, cents, k=K, nprobe=nprobe, index=ivf_idx)
    )
    r_pq, dt_pq = recall(
        S.pq_topk(queries, books, codes, k=K, m=m, rerank=corpus)
    )
    r_ivfpq, dt_ivfpq = recall(
        S.ivf_pq_topk(
            queries, cents, books, ivfpq_idx, k=K, nprobe=nprobe, m=m,
            rerank=corpus,
        )
    )
    print(
        json.dumps(
            {
                "kind": "composed",
                "n_vecs": n_vecs,
                "n_queries": n_q,
                "C": c,
                "nprobe": nprobe,
                "m": m,
                "ksub": ksub,
                "build_sec": {
                    "centroids": t_cents,
                    "books": t_books,
                    "ivf_index": t_ivf_idx,
                    "codes": t_codes,
                    "ivfpq_join": t_ivfpq_idx,
                },
                "ivf": {"recall@10": r_ivf, "search_sec": dt_ivf},
                "pq": {"recall@10": r_pq, "search_sec": dt_pq},
                "ivf_pq": {"recall@10": r_ivfpq, "search_sec": dt_ivfpq},
            }
        )
    )


if __name__ == "__main__":
    main()
