"""Stored-index persistence across a session restart.

The bm25_indexed / trigram_indexed / ann_ivf_pq_indexed gates all
build-and-read their index within one session, which cannot catch an
artifact that silently depends on session state (temp views, session
catalog, registry pins, conf overrides).  These tests write every
artifact a deployment would persist (index files AND model frames:
centroids, codebooks), then search from a FRESH ``spark.newSession()``
— new session state, empty temp catalog, no pins — recreating the
query/doc frames on the new session, and require the stored-path
result to reproduce the original session's inline result exactly.

(``newSession()`` shares the JVM/SparkContext — a full process restart
differs only in caches the artifact never touches: everything the
search reads is re-read from parquet here.)
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

_DOCS = [
    (1, "alpha beta gamma delta"),
    (2, "beta delta epsilon"),
    (3, "gamma rays and alpha particles collide"),
    (4, "nothing relevant here at all"),
    (5, "alpha alpha beta"),
]
_QUERIES = [(0, "alpha"), (1, "beta delta"), (2, "gamma")]


def _mk_docs(s):
    return s.createDataFrame(_DOCS, "doc_id bigint, text string")


def _mk_queries(s, cols):
    return s.createDataFrame(_QUERIES, cols)


def test_bm25_index_survives_session_restart(spark, tmp_path):
    from applications_analytics_midas_hbase_metrics_spark.operators.retrieval import (
        bm25_index_build,
        bm25_topk,
        bm25_topk_indexed,
    )

    idx = str(tmp_path / "bm25")
    bm25_index_build(_mk_docs(spark), idx, n_buckets=8)
    inline = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_topk(
            _mk_docs(spark), _mk_queries(spark, "query_id long, term string"), k=3
        ).collect()
    )
    s2 = spark.newSession()
    assert s2 is not spark and not s2.catalog.listTables()
    stored = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_topk_indexed(
            s2, idx, _mk_queries(s2, "query_id long, term string"),
            k=3, n_buckets=8,
        ).collect()
    )
    assert stored == inline and len(stored) > 0


def test_trigram_index_survives_session_restart(spark, tmp_path):
    from applications_analytics_midas_hbase_metrics_spark.operators.retrieval import (
        trigram_index_build,
        trigram_search_indexed,
        trigram_substring_search,
    )

    idx = str(tmp_path / "tri")
    trigram_index_build(_mk_docs(spark), idx, n_buckets=8)
    inline = sorted(
        (r.qid, r.doc_id)
        for r in trigram_substring_search(
            _mk_docs(spark), _mk_queries(spark, "qid bigint, q string"), k_grams=4
        ).collect()
    )
    s2 = spark.newSession()
    stored = sorted(
        (r.qid, r.doc_id)
        for r in trigram_search_indexed(
            s2, idx, _mk_queries(s2, "qid bigint, q string"),
            _mk_docs(s2), k_grams=4, n_buckets=8,
        ).collect()
    )
    assert stored == inline and len(stored) > 0


def test_ivf_pq_index_survives_session_restart(spark, tmp_path):
    """ALL persisted artifacts (coarse centroids, PQ codebooks, the
    partitioned composite index) re-read by the new session; the
    stored-path search must reproduce the original session's triples
    and cosines exactly."""
    from applications_analytics_midas_hbase_metrics_spark.operators import (
        similarity as SIM,
    )

    m, dim = 4, 8
    emb = spark.createDataFrame(
        [
            (i, [float(((i * 7 + j * 13) % 19) - 9) for j in range(dim)])
            for i in range(80)
        ],
        "vec_id bigint, embedding array<double>",
    ).localCheckpoint(eager=True)
    cents = SIM.build_ivf_centroids(emb, num_centroids=4, lloyd_steps=1)
    books = SIM.pq_train(emb, m=m, ksub=8, lloyd_steps=1)
    index = SIM.ivf_pq_index(emb, cents, books, m=m)

    root = str(tmp_path / "ivfpq")
    cents.write.parquet(os.path.join(root, "cents"))
    books.write.parquet(os.path.join(root, "books"))
    index.write.partitionBy("list_id").parquet(os.path.join(root, "index"))

    queries = emb.filter(F.col("vec_id") < 5)
    key = lambda r: (r.query_id, r.corpus_id, r.rank, round(r.cos, 6))  # noqa: E731
    inline = sorted(
        map(
            key,
            SIM.ivf_pq_topk(
                queries, cents, books, index, k=5, nprobe=2, m=m
            ).collect(),
        )
    )

    s2 = spark.newSession()
    emb2 = s2.createDataFrame(
        [
            (i, [float(((i * 7 + j * 13) % 19) - 9) for j in range(dim)])
            for i in range(80)
        ],
        "vec_id bigint, embedding array<double>",
    )
    cents2 = s2.read.parquet(os.path.join(root, "cents"))
    books2 = s2.read.parquet(os.path.join(root, "books"))
    index2 = s2.read.parquet(os.path.join(root, "index"))
    stored = sorted(
        map(
            key,
            SIM.ivf_pq_topk(
                emb2.filter(F.col("vec_id") < 5), cents2, books2, index2,
                k=5, nprobe=2, m=m,
            ).collect(),
        )
    )
    assert stored == inline and len(stored) > 0
