"""Graph queries: near-duplicate clustering (connected components over
minhash pair edges) — the iterative-algorithm tier, oracle-checked via a
recursive CTE."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import dedup as D
from ..operators import graph as G
from .queries import register
from .queries_ext import MINHASH_PAIRS_SQL, _neardup_docs


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
