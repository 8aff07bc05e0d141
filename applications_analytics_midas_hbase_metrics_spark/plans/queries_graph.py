"""Graph queries: near-duplicate clustering (connected components over
minhash pair edges) and end-to-end corpus deduplication — the
iterative-algorithm tier, oracle-checked via recursive CTEs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import graph as G
from .queries import claim_deferred, persist_deferred, register
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
    oracle's recursive-CTE transitive closure (min reachable id).

    The pair table is claimed from the registry when dedup_minhash just
    materialized it (same key = same logical plan) — the LSH DAG then
    runs zero times here; otherwise it is built lazily and pinned under
    the same key for the next family member."""
    key = f"minhash_pairs:{sf_dir}"
    pairs = claim_deferred(key, spark)
    if pairs is None:
        corpus = _neardup_docs(spark, sf_dir)
        pairs = persist_deferred(
            D.minhash_near_duplicates(corpus, threshold=0.5, materialize=False),
            key=key,
        )
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
    # LSH verification is strictly PAIRWISE (band collisions and exact
    # Jaccard each depend only on the two endpoint docs), and the
    # keep_mod=5 corpus is exactly the full corpus filtered to
    # id % 5 == 0 (copy ids are +100000, and 100000 % 5 == 0) — so the
    # subset pair table IS the full pair table filtered on both
    # endpoints.  When the sibling queries just materialized the full
    # table, filter it instead of re-running LSH on the subset.
    full = claim_deferred(f"minhash_pairs:{sf_dir}", spark)
    if full is not None:
        pairs = full.filter((F.col("id_a") % 5 == 0) & (F.col("id_b") % 5 == 0))
    else:
        pairs = D.minhash_near_duplicates(corpus, threshold=0.5, materialize=False)
        pairs = persist_deferred(pairs, key=f"minhash_pairs_mod5:{sf_dir}")
    return G.dedup_representatives(corpus, pairs, id_col="doc_id").select(
        F.col("id").cast("bigint").alias("id")
    )
