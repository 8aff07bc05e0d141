"""Graph queries: near-duplicate clustering (connected components over
minhash pair edges) and end-to-end corpus deduplication — the
iterative-algorithm tier, oracle-checked via recursive CTEs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import graph as G
from .queries import register
from .queries_ext import (
    MINHASH_PAIRS_SQL,
    _neardup_docs,
    _neardup_docs_sql,
    minhash_pairs_sql,
)


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({MINHASH_PAIRS_SQL}),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
    )
    SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → clusters: min-label propagation must agree with the
    oracle's recursive-CTE transitive closure (min reachable id)."""
    corpus = _neardup_docs(spark, sf_dir)
    pairs = D.minhash_near_duplicates(corpus, threshold=0.5)
    return G.connected_components(pairs)


_DEDUP_CORPUS_SQL = _neardup_docs_sql("doc_id % 5 = 0")


@register(
    "dedup_corpus",
    oracle=f"""
    WITH RECURSIVE pairs AS ({minhash_pairs_sql(_DEDUP_CORPUS_SQL)}),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
    ),
    comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
    corpus AS ({_DEDUP_CORPUS_SQL})
    SELECT c.doc_id AS id
    FROM corpus c LEFT JOIN comp ON comp.id = c.doc_id
    WHERE coalesce(comp.cluster_id, c.doc_id) = c.doc_id
    """,
)
def q_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end product operation: near-dup pairs → clusters → keep
    ONE representative (min id) per cluster plus every unpaired doc.
    The oracle recomputes the kept set from brute-force pairs + a
    recursive-CTE transitive closure.  Runs on a 1-in-5 subset — the
    pipeline shape is corpus-size-independent and dedup_clusters already
    gates the full-corpus component labeling."""
    corpus = _neardup_docs(spark, sf_dir, keep_mod=5)
    pairs = D.minhash_near_duplicates(corpus, threshold=0.5)
    return G.dedup_representatives(corpus, pairs, id_col="doc_id").select(
        F.col("id").cast("bigint").alias("id")
    )
