"""BM25 lexical retrieval: inverted-index scoring + two-phase top-k.

The reference engine (reference Utils.scala — no retrieval surface)
stops at scans/joins/aggregations; this module is part of the
training-data-pipeline extension surface: lexical top-k retrieval is
the standard recall path for decontamination-by-retrieval, targeted
quality probes, and seed-set expansion over a 100 TB corpus.

Scale shape (the whole point of BM25 on Spark):

- The posting list is never materialized for the full vocabulary.  The
  query term set is broadcast and the semi-filter runs BEFORE the
  (doc, term) aggregation, so the only rows that ever shuffle are
  postings of queried terms — for a q-term query load that is
  O(q x df) rows out of O(total tokens).
- Corpus statistics (N, avgdl) reduce to one scalar row, joined back
  by broadcast; document length joins on doc_id AFTER the tf
  aggregation, so the big side of that join is already term-filtered.
- Per-query ranking reuses the two-phase TakeOrderedAndProject shape
  of :func:`..operators.similarity._topk_per_query` — no task ever
  sees a query's full score set, so a query matching half the corpus
  cannot funnel through one reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens
from .similarity import _topk_per_query

__all__ = ["bm25_scores", "bm25_topk"]


def _postings(docs: DataFrame, doc_id: str, text: str) -> DataFrame:
    """(doc_id, tok) one row per token OCCURRENCE, plus doc length."""
    return docs.select(
        F.col(doc_id).cast("bigint").alias("doc_id"),
        tokens(text).alias("_toks"),
    ).select(
        "doc_id",
        F.size("_toks").cast("double").alias("dl"),
        F.explode("_toks").alias("tok"),
    )


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-(query, doc) BM25 score for every doc matching >= 1 term.

    ``queries`` is (query_id, term), small by construction (a retrieval
    batch), broadcast twice: once as the distinct-term filter on the
    posting stream, once to fan per-term partials out to the queries
    that contain the term.  IDF uses the standard Robertson/Sparck
    Jones smoothed form ``ln((N - df + 0.5) / (df + 0.5) + 1)`` —
    non-negative for every df, so stop-term postings can only dilute,
    never flip, a ranking.

    Returns (query_id, doc_id, score) with score unrounded; callers
    that compare across engines round at the edge
    (:func:`bm25_topk`)."""
    q = queries.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.lower(F.col("term")).alias("term"),
    )
    terms = q.select("term").distinct()

    post = _postings(docs, doc_id, text)
    # Semi-filter before the tf aggregation: only queried-term postings
    # ever reach a shuffle.
    hits = post.join(F.broadcast(terms), post["tok"] == terms["term"]).drop(
        "term"
    )
    tf = hits.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("tf"),
        F.first("dl").alias("dl"),
    )
    # One row per (doc, tok) after the agg => count(*) IS the document
    # frequency.
    dft = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("dft"))

    # Corpus scalars: N over ALL docs (not just matching ones) and the
    # corpus-wide mean token length — one-row aggregate, broadcast back.
    stats = docs.select(
        F.col(doc_id).cast("bigint").alias("doc_id"),
        F.size(tokens(text)).cast("double").alias("dl"),
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    idf = F.log(
        (F.col("n_docs") - F.col("dft") + F.lit(0.5))
        / (F.col("dft") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    part = (
        tf.join(F.broadcast(dft), "tok")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "tok", (idf * tf_norm).alias("part"))
    )
    return (
        part.join(F.broadcast(q), part["tok"] == q["term"])
        .groupBy("query_id", "doc_id")
        .agg(F.sum("part").alias("score"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Top-k docs per query by BM25, rank total-ordered by
    (round(score, 6) DESC, doc_id) so the output is engine-comparable:
    ranking on the ROUNDED score means a sub-1e-6 summation-order
    difference between engines cannot flip two near-tied docs.

    Two-phase ranking via similarity._topk_per_query (partition-local
    top-k, then global top-k over <= k x n_partitions rows per
    query)."""
    scored = bm25_scores(
        docs, queries, k1=k1, b=b, doc_id=doc_id, text=text
    ).select(
        "query_id",
        F.col("doc_id").alias("corpus_id"),
        F.round("score", 6).alias("cos"),
    )
    out = _topk_per_query(scored, k)
    return out.select(
        "query_id",
        F.col("rank"),
        F.col("corpus_id").alias("doc_id"),
        F.col("cos").alias("score"),
    )
