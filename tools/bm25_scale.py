"""BM25 scale probe: wall time and shuffled-posting volume vs corpus
replication at sf0.1.

The scale claim to verify: the per-query cost is governed by the
postings of QUERIED terms (broadcast semi-filter before the tf
aggregation), not by total corpus tokens — so doubling the corpus
doubles the filtered posting stream (linear) while the downstream
joins stay broadcast and the ranking stays two-phase.

Usage: python tools/bm25_scale.py [factors ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators.retrieval import (
        _postings,
        bm25_topk,
    )
    from applications_analytics_midas_hbase_metrics_spark.plans.queries_features import (
        _BM25_QUERIES,
    )
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="bm25-scale", cpus=32)
    queries = spark.createDataFrame(
        [(qid, term) for qid, ts in _BM25_QUERIES for term in ts],
        "query_id long, term string",
    )
    terms = [term for _, ts in _BM25_QUERIES for term in ts]

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    for f in factors:
        docs = base
        if f > 1:
            reps = spark.range(f).select(
                (F.col("id") * 10_000_000).alias("off")
            )
            docs = base.crossJoin(reps).select(
                (F.col("doc_id") + F.col("off")).alias("doc_id"), "text"
            )
        docs = docs.repartition(32).localCheckpoint()  # isolate search cost
        n_docs = docs.count()

        post = _postings(docs, "doc_id", "text")
        total_postings = post.count()
        filtered = post.filter(F.col("tok").isin(terms)).count()

        t0 = time.time()
        out = bm25_topk(docs, queries, k=10)
        n_out = out.count()
        wall = time.time() - t0

        # stored-index path: one-time build, then the pruned search
        import tempfile

        from applications_analytics_midas_hbase_metrics_spark.operators.retrieval import (
            bm25_index_build,
            bm25_topk_indexed,
        )

        idx_root = tempfile.mkdtemp(prefix="bm25_idx_")
        idx = idx_root + "/idx"
        t0 = time.time()
        bm25_index_build(docs, idx, n_buckets=64)
        t_build = time.time() - t0
        t0 = time.time()
        n_idx = bm25_topk_indexed(spark, idx, queries, k=10).count()
        t_search = time.time() - t0
        assert n_idx == n_out
        import shutil

        shutil.rmtree(idx_root, ignore_errors=True)
        print(
            f"factor={f:3d} docs={n_docs:8,d} postings={total_postings:12,d} "
            f"queried-term postings={filtered:10,d} "
            f"({100.0 * filtered / total_postings:.1f}%) "
            f"topk rows={n_out} inline={wall:.2f}s "
            f"index build={t_build:.2f}s search={t_search:.2f}s"
        )


if __name__ == "__main__":
    main()
