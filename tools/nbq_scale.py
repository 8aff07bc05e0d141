"""Measure the NB quality scorer under Zipfian token skew: the score
join shuffles on the token, and a natural corpus's hottest token ("the")
concentrates in one task.  The shipped operator pre-aggregates the doc
side to (id, token, c) so a hot token contributes ONE join row per
document; the naive per-occurrence join it avoids fans out one row per
OCCURRENCE into a single partition.

Harness: replicate sf0.1 documents with id offsets and append a run of
one ultra-hot token ("zzhot" * 60 occurrences) to half the replicas,
train the model once, then time shipped vs naive scoring at growing
factors.  Same verdicts as tools/lm_scale.py built for the bigram LM.

Usage: python tools/nbq_scale.py [max_factor]   (default 16)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
MAX_FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def skewed_corpus(spark, factor: int):
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    n = base.groupBy().agg(F.max("doc_id")).first()[0] + 1  # driver-ok: bounded argmax
    hot = " " + "zzhot " * 60
    return (
        base.crossJoin(spark.range(factor).select(F.col("id").alias("rep")))
        .select(
            (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
            F.when(F.col("rep") % 2 == 0, F.concat("text", F.lit(hot)))
            .otherwise(F.col("text"))
            .alias("text"),
            "source",
        )
        .repartition(32)
    )


def naive_score(df, model):
    """Per-OCCURRENCE weight join (the formulation the shipped operator
    avoids) — measurement baseline only."""
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators.dedup import tokens

    consts = F.broadcast(
        model.groupBy().agg(
            F.first("w_oov").alias("w_oov"), F.first("prior").alias("prior")
        )
    )
    base = df.select(
        F.col("doc_id").cast("bigint").alias("id"), tokens("text").alias("tks")
    )
    occs = base.select("id", F.explode("tks").alias("tk"))
    return (
        occs.join(model.select("tk", "w"), "tk", "left")
        .crossJoin(consts)
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(
                F.first("prior") + F.sum(F.coalesce(F.col("w"), F.col("w_oov"))),
                6,
            ).alias("score"),
        )
    )


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import (
        classify as CL,
    )
    from applications_analytics_midas_hbase_metrics_spark.operators.sampling import (
        fibonacci_bucket,
    )
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(app_name="midas-nbq-scale", cpus="32")
    factor = 1
    while factor <= MAX_FACTOR:
        docs = skewed_corpus(spark, factor).localCheckpoint(eager=True)
        n_docs = docs.count()
        labeled = docs.withColumn(
            "label", (F.col("source") == "src0").cast("int")
        )
        model = CL.nb_quality_train(
            labeled.filter(fibonacci_bucket("doc_id") < 80)
        ).localCheckpoint(eager=True)

        t0 = time.monotonic()
        n1 = CL.nb_quality_score(docs, model).count()
        t_shipped = time.monotonic() - t0
        t0 = time.monotonic()
        n2 = naive_score(docs, model).count()
        t_naive = time.monotonic() - t0
        assert n1 == n_docs and n2 == n_docs
        print(
            json.dumps(
                {
                    "factor": factor,
                    "n_docs": n_docs,
                    "shipped_sec": round(t_shipped, 2),
                    "naive_sec": round(t_naive, 2),
                }
            )
        )
        sys.stdout.flush()
        factor *= 4


if __name__ == "__main__":
    main()
