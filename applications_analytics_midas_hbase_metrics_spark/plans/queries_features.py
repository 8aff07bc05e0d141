"""Feature-engineering queries: TF-IDF, label centroids, L2 norms."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import embeddings as EMB
from ..operators.text import LANG_PROFILES
from .queries import register, register_extra, t
from .queries_ext import _EMB_D, _TOKS, _dot_sql, _spread

_TERMS = LANG_PROFILES["en"]
_TERMS_SQL = ", ".join(repr(w) for w in _TERMS)


@register(
    "tfidf_stopwords",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS id, unnest({_TOKS}) AS tok FROM documents
    ),
    counts AS (
        SELECT id, tok, CAST(count(*) AS BIGINT) AS c FROM toks
        WHERE tok IN ({_TERMS_SQL}) GROUP BY 1, 2
    ),
    dfreq AS (SELECT tok, count(*) AS df FROM counts GROUP BY 1),
    dlen AS (SELECT doc_id AS id, len({_TOKS}) AS n_toks FROM documents),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
    SELECT counts.id, counts.tok AS term,
           round((CAST(c AS DOUBLE) / n_toks) * ln(n_docs / CAST(df AS DOUBLE)), 6)
               AS tfidf
    FROM counts JOIN dfreq USING (tok) JOIN dlen ON counts.id = dlen.id, n
    """,
)
def q_tfidf_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark, t(spark, sf_dir, "documents"))
    return EMB.tfidf_for_terms(docs, _TERMS)


@register(
    "label_centroid_features",
    oracle=f"""
    WITH vecs AS (SELECT vec_id, label, {_EMB_D} AS v FROM embeddings),
    dims AS (
        SELECT label, u.i AS pos, avg(v[u.i]) AS m
        FROM vecs, (SELECT unnest(range(1, 65)) AS i) u
        GROUP BY 1, 2
    ),
    cents AS (
        SELECT label, list(m ORDER BY pos) AS centroid FROM dims GROUP BY 1
    )
    SELECT v.vec_id AS id, v.label,
           round({_dot_sql('v.v', 'c.centroid')}
                 / (sqrt({_dot_sql('v.v', 'v.v')})
                    * sqrt({_dot_sql('c.centroid', 'c.centroid')})), 6)
               AS cos_to_centroid
    FROM vecs v JOIN cents c ON v.label = c.label
    """,
)
def q_label_centroid_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    return EMB.centroid_features(emb)


@register_extra(
    # retired to the pytest tier: norm/dot math is gated by ann_topk,
    # dedup_embedding and label_centroid_features
    "vector_norms",
    # CTE stages so the norm is computed once per vector — inlining the
    # dot product inside list_transform re-evaluates it per ELEMENT
    # (64x blowup measured as a 239s oracle run)
    oracle=f"""
    WITH v AS (SELECT vec_id, {_EMB_D} AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt({_dot_sql('v', 'v')}) AS l2 FROM v),
    w AS (SELECT vec_id, l2,
                 CASE WHEN l2 = 0 THEN v
                      ELSE list_transform(v, x -> x / l2) END AS w
          FROM n)
    SELECT vec_id, round(l2, 6) AS l2_norm,
           round(sqrt({_dot_sql('w', 'w')}), 6) AS normalized_norm
    FROM w
    """,
)
def q_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _dot

    emb = t(spark, sf_dir, "embeddings")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    normed = EMB.normalize(F.col("embedding"))
    return emb.select(
        "vec_id",
        F.round(F.sqrt(_dot(vd, vd)), 6).alias("l2_norm"),
        F.round(F.sqrt(_dot(normed, normed)), 6).alias("normalized_norm"),
    )
