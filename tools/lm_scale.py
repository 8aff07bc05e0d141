"""Measure ngram_lm_score under Zipfian bigram skew (round-7 verdict
item #4): the score join shuffles on (a, b), and a natural corpus's
hottest bigram concentrates in one task pre-AQE.

Harness: replicate the sf0.1 documents corpus with id offsets and
append a run of one ultra-hot bigram ("zq zx" * 40) to half the
replicas — the worst-case: one bigram holds a large share of all pair
occurrences.  Times the SHIPPED operator (doc-side pairs pre-aggregated
to (id, a, b, cnt) before the join) against the naive per-occurrence
join it replaced, at growing replication factors.

Usage: python tools/lm_scale.py [max_factor]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
MAX_FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def skewed_corpus(spark, factor: int):
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n = base.groupBy().agg(F.max("doc_id")).first()[0] + 1  # driver-ok: bounded argmax
    hot = " " + "zq zx " * 40
    return (
        base.crossJoin(
            spark.range(factor).select(F.col("id").alias("rep"))
        )
        .select(
            (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
            F.when(F.col("rep") % 2 == 0, F.concat("text", F.lit(hot)))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .repartition(32)
    )


def naive_lm_score(df):
    """The pre-round-8 formulation: per-OCCURRENCE doc pairs feed the
    gram-keyed score join (kept here only as the measurement baseline)."""
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators.dedup import (
        adjacent_pairs,
        tokens,
    )

    base = df.select(
        F.col("doc_id").cast("bigint").alias("id"), tokens("text").alias("tks")
    ).localCheckpoint(eager=True)
    pairs = (
        base.filter(F.size("tks") >= 2)
        .select("id", F.explode(adjacent_pairs("tks")).alias("p"))
        .select("id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    ).localCheckpoint(eager=True)
    uni = (
        base.select(F.explode("tks").alias("a")).groupBy("a").agg(F.count("*").alias("u"))
    ).localCheckpoint(eager=True)
    vocab = uni.groupBy().agg(F.count("*").alias("v"))
    big = pairs.groupBy("a", "b").agg(F.count("*").alias("bc"))
    scored = (
        pairs.join(big, ["a", "b"])
        .join(uni, "a")
        .crossJoin(F.broadcast(vocab))
        .select("id", F.log((F.col("bc") + 1) / (F.col("u") + F.col("v"))).alias("lp"))
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(F.avg("lp"), 6).alias("lm_score"),
        )
    )
    return base.select("id").join(scored, "id", "left").select(
        "id",
        F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
        "lm_score",
    )


def main() -> None:
    from applications_analytics_midas_hbase_metrics_spark.operators import text as T
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(app_name="lm-scale", cpus=32)
    factor = 1
    while factor <= MAX_FACTOR:
        corpus = skewed_corpus(spark, factor).localCheckpoint(eager=True)
        n = corpus.count()
        t0 = time.time()
        shipped = T.ngram_lm_score(corpus).count()
        dt_shipped = time.time() - t0
        t0 = time.time()
        naive = naive_lm_score(corpus).count()
        dt_naive = time.time() - t0
        print(
            f"factor {factor:3d}: {n:7d} docs  shipped {dt_shipped:6.2f}s  "
            f"naive(per-occurrence) {dt_naive:6.2f}s  rows {shipped}=={naive}"
        )
        assert shipped == naive
        factor *= 4


if __name__ == "__main__":
    main()
