"""Measure pmi_collocations under Zipfian token skew and corpus growth.

The shipped operator aggregates occurrences to (a, b) / unigram COUNT
tables before any join — map-side combine bounds every shuffle row set
at the vocabulary, so a hot token ("the", here an injected "zq zx" run
in half the replicas) adds scan work but NOT join fanout.  The naive
comparator joins the unigram table onto per-OCCURRENCE pair rows before
counting (the formulation a first draft writes): every occurrence of
the hot token ships through the gram-keyed join into one partition.

Usage: python tools/pmi_scale.py [max_factor]
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
        base.crossJoin(spark.range(factor).select(F.col("id").alias("rep")))
        .select(
            (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
            F.when(F.col("rep") % 2 == 0, F.concat("text", F.lit(hot)))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .repartition(32)
    )


def naive_pmi(df, min_count: int = 5, top_k: int = 100):
    """First-draft formulation: unigram counts join per-OCCURRENCE pair
    rows, the (a, b) aggregate runs AFTER the joins (measurement
    baseline only)."""
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators.dedup import (
        adjacent_pairs,
        tokens,
    )

    base = df.select(tokens("text").alias("tks")).localCheckpoint(eager=True)
    occ = (
        base.filter(F.size("tks") >= 2)
        .select(F.explode(adjacent_pairs("tks")).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    uni = (
        base.select(F.explode("tks").alias("a"))
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("u"))
    ).localCheckpoint(eager=True)
    n_tot = uni.groupBy().agg(F.sum("u").alias("n"))
    joined = (
        occ.join(uni.select("a", F.col("u").alias("ua")), "a")
        .join(uni.select(F.col("a").alias("b"), F.col("u").alias("ub")), "b")
        .groupBy("a", "b", "ua", "ub")
        .agg(F.count(F.lit(1)).alias("bc"))
    )
    m_tot = joined.groupBy().agg(F.sum("bc").alias("m"))
    pmi = (F.col("bc") / F.col("m")) / (
        (F.col("ua") / F.col("n")) * (F.col("ub") / F.col("n"))
    )
    return (
        joined.filter(F.col("bc") >= min_count)
        .crossJoin(F.broadcast(n_tot))
        .crossJoin(F.broadcast(m_tot))
        .select(
            F.col("a").alias("term_a"),
            F.col("b").alias("term_b"),
            F.col("bc").cast("bigint").alias("pair_count"),
            F.floor(F.log(pmi) * F.lit(1_000_000_000.0))
            .cast("bigint")
            .alias("pmi_q"),
        )
        .orderBy(F.col("pmi_q").desc(), F.col("term_a"), F.col("term_b"))
        .limit(top_k)
    )


def main() -> None:
    from applications_analytics_midas_hbase_metrics_spark.operators import text as T
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(app_name="pmi-scale", cpus=32)
    factor = 1
    while factor <= MAX_FACTOR:
        corpus = skewed_corpus(spark, factor).localCheckpoint(eager=True)
        n = corpus.count()
        t0 = time.time()
        shipped = T.pmi_collocations(corpus, min_count=5, top_k=100)
        s_rows = {(r.term_a, r.term_b, r.pair_count) for r in shipped.collect()}
        dt_shipped = time.time() - t0
        t0 = time.time()
        naive = naive_pmi(corpus)
        n_rows = {(r.term_a, r.term_b, r.pair_count) for r in naive.collect()}
        dt_naive = time.time() - t0
        agree = s_rows == n_rows
        print(
            f"factor {factor:3d}: {n:7d} docs  shipped {dt_shipped:6.2f}s  "
            f"naive(join-then-count) {dt_naive:6.2f}s  topk-agree {agree}"
        )
        assert agree
        factor *= 4


if __name__ == "__main__":
    main()
