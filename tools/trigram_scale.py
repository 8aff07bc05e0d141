"""Measure trigram_substring_search pruning vs the full contains scan.

The index answers "which docs contain q" by intersecting the posting
lists of q's rarest trigrams and verifying only the survivors; the
baseline scans every document's text per query.  As the corpus grows,
the baseline reads every byte x queries, the index reads the posting
build once (amortized over the query batch) plus candidate-sized
verify joins.

Usage: python tools/trigram_scale.py [max_factor]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
MAX_FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_BUCKETS = 256

QUERIES = [
    (0, "table value"),
    (1, "merge batch"),
    (2, "slow filter"),
    (3, "the line sort"),
    (4, "zebra"),
    (5, "fast spark a"),
    (6, "window table table"),
    (7, "customer query line"),
]


def corpus(spark, factor: int):
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n = base.groupBy().agg(F.max("doc_id")).first()[0] + 1  # driver-ok: bounded argmax
    return (
        base.crossJoin(spark.range(factor).select(F.col("id").alias("rep")))
        .select(
            (F.col("doc_id") + F.col("rep") * n).alias("doc_id"), "text"
        )
        .repartition(32)
    )


def contains_scan(docs, queries):
    from pyspark.sql import functions as F

    return docs.crossJoin(F.broadcast(queries)).filter(
        F.instr(F.lower("text"), F.lower(F.col("q"))) > 0
    ).select("qid", "doc_id")


def main() -> None:
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators.retrieval import (
        trigram_index_build,
        trigram_search_indexed,
    )
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(app_name="trigram-scale", cpus=32)
    queries = spark.createDataFrame(QUERIES, "qid bigint, q string")
    root = tempfile.mkdtemp(prefix="trigram_scale_")
    factor = 1
    while factor <= MAX_FACTOR:
        docs = corpus(spark, factor).localCheckpoint(eager=True)
        n = docs.count()
        idx = os.path.join(root, f"idx_{factor}")
        t0 = time.time()
        trigram_index_build(docs, idx, n_buckets=N_BUCKETS)
        dt_build = time.time() - t0
        # recurring path: stored-index search (selected-bucket pruned)
        t0 = time.time()
        hits = {
            (r.qid, r.doc_id)
            for r in trigram_search_indexed(
                spark, idx, queries, docs, k_grams=4, n_buckets=N_BUCKETS
            ).collect()
        }
        dt_idx = time.time() - t0
        # production gram keys: 8-byte hashed postings, same result
        # (exactness rests on the contains verify, never the key)
        idx_h = os.path.join(root, f"idxh_{factor}")
        t0 = time.time()
        trigram_index_build(
            docs, idx_h, n_buckets=N_BUCKETS, gram_key="xxhash64"
        )
        dt_build_h = time.time() - t0
        t0 = time.time()
        hits_h = {
            (r.qid, r.doc_id)
            for r in trigram_search_indexed(
                spark, idx_h, queries, docs, k_grams=4,
                n_buckets=N_BUCKETS, gram_key="xxhash64",
            ).collect()
        }
        dt_idx_h = time.time() - t0
        assert hits_h == hits, f"hashed gram keys diverge at {factor}x"
        t0 = time.time()
        base = {(r.qid, r.doc_id) for r in contains_scan(docs, queries).collect()}
        dt_scan = time.time() - t0
        # IO proxy: posting rows in the pruned buckets vs total
        total_post = spark.read.parquet(os.path.join(idx, "postings")).count()
        from applications_analytics_midas_hbase_metrics_spark.operators.retrieval import (
            _norm_substring_queries,
            _select_rarest_grams,
        )

        sel, _ = _select_rarest_grams(
            _norm_substring_queries(queries, "qid", "q"),
            spark.read.parquet(os.path.join(idx, "gram_df")),
            4,
        )
        sel_buckets = {
            r.bkt
            for r in sel.select(
                F.pmod(F.xxhash64("g"), F.lit(N_BUCKETS)).alias("bkt")
            )
            .distinct()
            .collect()
        }
        pruned_post = (
            spark.read.parquet(os.path.join(idx, "postings"))
            .filter(F.col("g_bucket").isin(list(sel_buckets)))
            .count()
        )
        exact_post = (
            spark.read.parquet(os.path.join(idx, "postings"))
            .join(F.broadcast(sel.select("g").distinct()), "g")
            .count()
        )
        agree = hits == base
        print(
            f"factor {factor:3d}: {n:7d} docs  build {dt_build:6.2f}s  "
            f"indexed-search {dt_idx:6.2f}s  contains-scan {dt_scan:6.2f}s  "
            f"postings {total_post} -> buckets {pruned_post} "
            f"({total_post / max(pruned_post, 1):.1f}x) -> grams {exact_post} "
            f"({total_post / max(exact_post, 1):.0f}x)  "
            f"matches {len(hits)}  agree {agree}"
        )
        print(
            f"           hashed grams: build {dt_build_h:6.2f}s  "
            f"indexed-search {dt_idx_h:6.2f}s  (identical result set)"
        )
        assert agree
        shutil.rmtree(idx, ignore_errors=True)
        shutil.rmtree(idx_h, ignore_errors=True)
        factor *= 4
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
