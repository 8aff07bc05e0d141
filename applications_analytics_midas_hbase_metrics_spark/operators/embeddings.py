"""Embedding-column operators beyond search: normalization, per-label
centroids, centroid-distance features, TF-IDF — the feature-engineering
tier of a training-data pipeline.

All element-wise math uses strict left-folds / posexplode partial means
so an external SQL engine reproduces values to rounding precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _dot, cosine, tokens


def normalize(vec: Column) -> Column:
    """L2-normalize an array<numeric> column (zero vectors pass through
    unchanged rather than dividing by zero)."""
    d = F.transform(vec, lambda x: x.cast("double"))
    norm = F.sqrt(_dot(d, d))
    return F.when(norm == 0, d).otherwise(F.transform(d, lambda x: x / norm))


def label_centroids(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label mean vector via posexplode + per-(label, dim) means —
    partial aggregation everywhere, no per-group array folds.  Returns
    (label, centroid array<double>, n)."""
    base = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "pos", "val"
        ),
    )
    return (
        base.groupBy("label", "pos")
        .agg(F.avg("val").alias("m"), F.count("*").alias("n"))
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"),
            F.max("n").alias("n"),
        )
        .select(
            "label",
            F.transform(F.col("pm"), lambda s: s["m"]).alias("centroid"),
            F.col("n").cast("bigint").alias("n"),
        )
    )


def centroid_features(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Each vector's cosine to its own label centroid — the outlier /
    label-noise detection feature.  Centroid table broadcasts."""
    cents = label_centroids(df, vec_col, label_col)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        df.select(
            F.col(id_col).cast("bigint").alias("id"),
            F.col(label_col).alias("label"),
            vd.alias("v"),
        )
        .join(F.broadcast(cents), "label")
        .select(
            "id",
            "label",
            F.round(cosine(F.col("v"), F.col("centroid")), 6).alias("cos_to_centroid"),
        )
    )


def tfidf_for_terms(
    df: DataFrame,
    terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TF-IDF of a fixed term set per document: tf = term count / doc
    tokens; idf = ln(N / df).  Fixed vocabulary keeps the output
    deterministic (no ranking over float near-ties).  One explode +
    two small aggregations."""
    toks = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.explode(tokens(text_col)).alias("tok"),
    ).filter(F.col("tok").isin(*terms))
    doc_len = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.size(tokens(text_col)).alias("n_toks"),
    )
    # corpus size as a lazy broadcast scalar — no driver-side action
    n_docs = df.agg(F.count("*").cast("double").alias("n_docs"))
    counts = toks.groupBy("id", "tok").agg(F.count("*").alias("c"))
    dfreq = counts.groupBy("tok").agg(F.count("*").alias("df"))
    return (
        counts.join(F.broadcast(dfreq), "tok")
        .join(doc_len, "id")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            F.col("tok").alias("term"),
            F.round(
                (F.col("c").cast("double") / F.col("n_toks"))
                * F.log(F.col("n_docs") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )


def hashed_embedding(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Model-free text embedding via the hashing trick (HashingTF
    shape): token → ``java_hash mod dim`` bucket, per-bucket term
    counts, L2-normalized.  Output is LONG-FORM ``(id, dim_idx,
    value)`` — the sparse representation: only occupied dimensions
    materialize (a 64-dim hashed vector of a 40-token doc has ≤ 40
    non-zeros), shuffles stay narrow, and a SQL engine replays it as a
    plain GROUP BY.  :func:`dense_from_sparse` converts to
    array<double> for the ANN/semantic operators.

    The bucket hash is the reference's Java-hash (functions.keys) —
    byte-exact in DuckDB via duckdb_java_hash_sql, so the embedding is
    engine-reproducible end-to-end, which a model embedding can never
    be.  The expression fold is interpreted (CodegenFallback); for a
    100 TB hot path swap in the Arrow-vectorized closed form
    (functions.keys.java_hash_vec) — bit-identical by golden test.

    Scale shape: explode → one (id, bucket) hash-aggregate (map-side
    combined) → per-id norm window.  Nothing is ever corpus-wide."""
    from ..functions.keys import java_hash
    from pyspark.sql.window import Window

    tf = (
        df.select(
            F.col(id_col).cast("bigint").alias("id"),
            F.explode(tokens(text_col)).alias("tok"),
        )
        .select("id", F.pmod(java_hash("tok"), F.lit(dim)).cast("int").alias("dim_idx"))
        .groupBy("id", "dim_idx")
        .agg(F.count("*").alias("c"))
    )
    # per-id L2 norm via a window partitioned by id: the frame is the
    # doc's ≤ dim buckets, never the corpus
    w = Window.partitionBy("id")
    return tf.withColumn(
        "value", F.round(F.col("c") / F.sqrt(F.sum(F.col("c") * F.col("c")).over(w)), 6)
    ).select("id", "dim_idx", "value")


def dense_from_sparse(
    sparse: DataFrame,
    dim: int,
    id_col: str = "id",
    idx_col: str = "dim_idx",
    val_col: str = "value",
) -> DataFrame:
    """(id, dim_idx, value) long-form → (id, embedding array<double>)
    with zeros filled — the bridge from :func:`hashed_embedding` to the
    ANN / semantic-dedup operators.  One hash-aggregate; the (idx →
    value) map is built ONCE per row in the aggregate and the
    per-dimension transform only does lookups — Spark does not hoist
    loop-invariant expressions out of higher-order-function lambdas,
    so building the map inside the lambda would reconstruct it dim
    times per row (O(dim·nnz) instead of O(dim+nnz)).  Map lookups
    ignore entry order, so no sort is needed.  No corpus-wide op, no
    UDF."""
    entries = F.map_from_entries(
        F.collect_list(F.struct(F.col(idx_col).alias("i"), F.col(val_col).alias("v")))
    )
    return (
        sparse.groupBy(F.col(id_col).alias("id"))
        .agg(entries.alias("_m"))
        .select(
            "id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("_m"), i.cast("int")), F.lit(0.0)
                ),
            ).alias("embedding"),
        )
    )
