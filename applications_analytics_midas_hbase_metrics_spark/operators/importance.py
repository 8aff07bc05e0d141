"""DSIR-style data selection: hashed n-gram importance weights.

The public recipe of Xie et al. 2023 ("Data Selection for Language
Models via Importance Resampling"): featurize every document as a bag
of hashed word n-grams, fit two smoothed multinomial bag models — one
on a small TARGET corpus (the distribution you want more of), one on
the RAW corpus — and weight each raw document by its log likelihood
ratio under the two models.  Resampling the raw corpus by these
weights tilts it toward the target distribution; composed with the
deterministic samplers in :mod:`.sampling` (``weighted_sample_topk``,
``rank_importance_sample``) it is the standard "make the web corpus
look like Wikipedia/books" selection pass.

Cross-engine exactness: per-bucket log ratios are QUANTIZED to integer
micro-units (round(x * 1e6) as int64) before any per-document math, so
the per-document weight is an exact integer dot product — no float
summation-order divergence between Spark and an external SQL oracle.
libm ``ln`` itself may differ in the last ulp across engines, but at
1e-6 quantization a flip needs the true value within ~1e-10 of a
boundary (the ``weighted_sample_topk`` quantization argument).

Scale shape (100 TB raw corpus):

- gram explode is ∝ tokens, never pairs; the (id, bucket) count and the
  per-id weight sum are both partial-aggregating shuffles keyed by the
  document id — a degenerate document costs its shuffle share;
- the bucket model is ≤ ``buckets`` rows by construction (default 4096)
  → the log-ratio table rides BROADCAST onto the raw gram stream; corpus
  totals are 1-row broadcast cross joins (the repo-wide scalar pattern);
- no window anywhere; selection composes with the two-phase top-k in
  :mod:`.sampling`.

Hashing: default is the oracle-replayable reference fold
(:func:`..functions.keys.java_hash` — ``duckdb_java_hash_sql`` is its
SQL twin), an interpreted HOF per gram.  Production corpora should pass
``hash_mode="xxhash64"`` (JVM codegen, ~10x cheaper, same distribution
quality) exactly like the retrieval index's bucket layout
(operators/retrieval.py) — the weights change, the selection quality
does not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.keys import java_hash
from .dedup import tokens

#: Micro-unit quantization of per-bucket log ratios (1e-6, the repo's
#: cross-engine float discipline).
_MICRO = 1_000_000


def _bucket_expr(gram: Column, buckets: int, hash_mode: str) -> Column:
    if hash_mode == "java":
        # abs on the LONG-widened hash: non-ANSI int abs(Integer.MIN_VALUE)
        # overflows back to MIN_VALUE and would emit a negative bucket;
        # the DuckDB twin (duckdb_java_hash_sql) is BIGINT-exact, so the
        # long cast keeps the differential bit-exact (same discipline as
        # functions/keys.salt_bucket).
        return (F.abs(java_hash(gram).cast("long")) % F.lit(buckets)).cast("int")
    if hash_mode == "xxhash64":
        return F.pmod(F.xxhash64(gram), F.lit(buckets)).cast("int")
    raise ValueError(f"hash_mode must be 'java' or 'xxhash64', got {hash_mode!r}")


def hashed_ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    ns: tuple[int, ...] = (1, 2),
    hash_mode: str = "java",
) -> DataFrame:
    """(id, bucket, cnt): hashed bag-of-n-grams features, one row per
    non-empty (document, bucket).  Grams are space-joined runs of the
    module-wide lower-cased whitespace tokens; every ``n`` in ``ns``
    feeds the same bucket space (the DSIR featurizer).

    The token array is hoisted into its own projection before the
    per-position gram lambdas reference it (the O(tokens²) HOF trap —
    see ngram_repetition_battery, operators/text.py)."""
    toked = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        tokens(text_col).alias("_toks"),
    )
    toks = F.col("_toks")

    def grams_at(n: int) -> Column:
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    grams = toked.select(
        "id",
        F.explode(F.flatten(F.array(*[grams_at(n) for n in ns]))).alias(
            "gram"
        ),
    )
    return (
        grams.select("id", _bucket_expr(F.col("gram"), buckets, hash_mode).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def dsir_bucket_logratio(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, ratio_micro): add-``alpha`` smoothed log-likelihood
    ratio of the two hashed-bag multinomials, quantized to integer
    micro-units —

        round(1e6 * [ln(t_b + α) − ln(T + αB) − ln(r_b + α) + ln(R + αB)])

    where t_b/r_b are bucket gram counts and T/R corpus totals.  Inputs
    are ``hashed_ngram_counts`` outputs (any id granularity — only the
    per-bucket sums matter).  At most ``buckets`` rows come back, so
    the caller can always broadcast the result.

    Buckets unseen in BOTH corpora get ratio_micro ABSENT (not zero
    rows): such a bucket can never be joined by a raw document either,
    so materializing it would be pure padding.  Buckets seen in one
    corpus only are present via the outer join with the absent side
    smoothed to α."""
    t_b = target_counts.groupBy("bucket").agg(F.sum("cnt").alias("t_cnt"))
    r_b = raw_counts.groupBy("bucket").agg(F.sum("cnt").alias("r_cnt"))
    t_tot = target_counts.agg(F.sum("cnt").alias("t_total"))
    r_tot = raw_counts.agg(F.sum("cnt").alias("r_total"))
    per_bucket = t_b.join(r_b, "bucket", "full_outer")
    # 1-row totals ride broadcast (the repo-wide scalar-frame pattern)
    both = per_bucket.crossJoin(F.broadcast(t_tot)).crossJoin(
        F.broadcast(r_tot)
    )
    a = float(alpha)
    ab = a * buckets
    ratio = (
        F.log(F.coalesce(F.col("t_cnt"), F.lit(0)).cast("double") + F.lit(a))
        - F.log(F.col("t_total").cast("double") + F.lit(ab))
        - F.log(F.coalesce(F.col("r_cnt"), F.lit(0)).cast("double") + F.lit(a))
        + F.log(F.col("r_total").cast("double") + F.lit(ab))
    )
    return both.select(
        "bucket",
        F.round(ratio * F.lit(_MICRO)).cast("bigint").alias("ratio_micro"),
    )


def dsir_log_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    ns: tuple[int, ...] = (1, 2),
    alpha: float = 1.0,
    hash_mode: str = "java",
) -> DataFrame:
    """(id, n_grams, log_weight): the DSIR importance weight of every
    raw document — Σ_b cnt_b(x) · log-ratio_b as an exact integer dot
    product, reported as a 6-decimal double.  Documents with no grams
    (empty text) weigh 0.0 and still get a row.

    The weight is the paper's UNNORMALIZED log likelihood ratio, so it
    is length-coupled (a long document accumulates more mass than a
    short one of the same gram mix); callers ranking across mixed
    lengths can divide by ``n_grams`` for a per-gram score — both
    columns are returned so either policy is one expression away.

    The raw gram counts are computed ONCE and reused for both the raw
    bag model and the per-document dot product (the frame is returned
    by one plan; callers composing further stages should pin it).  The
    log-ratio side is ≤ ``buckets`` rows and joins BROADCAST."""
    raw_counts = hashed_ngram_counts(
        raw_docs, text_col, id_col, buckets, ns, hash_mode
    )
    target_counts = hashed_ngram_counts(
        target_docs, text_col, id_col, buckets, ns, hash_mode
    )
    ratios = dsir_bucket_logratio(target_counts, raw_counts, buckets, alpha)
    scored = (
        raw_counts.join(F.broadcast(ratios), "bucket")
        .groupBy("id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_grams"),
            F.sum(F.col("cnt") * F.col("ratio_micro")).alias("w_micro"),
        )
    )
    return (
        raw_docs.select(F.col(id_col).cast("bigint").alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.round(
                F.coalesce(F.col("w_micro"), F.lit(0)).cast("double")
                / F.lit(float(_MICRO)),
                6,
            ).alias("log_weight"),
        )
    )


def dsir_select_topk(weights: DataFrame, k: int) -> DataFrame:
    """(id, n_grams, log_weight, selected): flag the ``k``
    highest-weight documents (ties broken by lowest id, so the
    selection is a total order and oracle-comparable).

    The winner set is ``orderBy(...).limit(k)``, which Spark plans as
    TakeOrderedAndProject — per-partition top-k heads reduced on the
    driver side, never a global sort materialization and never an
    unpartitioned window (a constant-group window would be
    constant-folded into exactly that).  Winners are ≤ k rows and ride
    broadcast back onto the weight frame."""
    # order key: weight descending, id ascending.  The micro-quantized
    # weight is recovered exactly from the 6-decimal log_weight, so the
    # bigint sort key is exact; the id column breaks ties totally.
    nw = (-F.round(F.col("log_weight") * F.lit(_MICRO))).cast("bigint")
    winners = (
        weights.select("id", nw.alias("_nw"))
        .orderBy("_nw", "id")
        .limit(int(k))
        .select("id", F.lit(1).alias("selected"))
    )
    return weights.join(F.broadcast(winners), "id", "left").select(
        "id",
        "n_grams",
        "log_weight",
        F.coalesce("selected", F.lit(0)).cast("int").alias("selected"),
    )
