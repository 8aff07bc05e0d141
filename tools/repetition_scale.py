"""Scaling check for the Gopher repetition operators (round 12):
ngram_repetition_battery (word n-grams, n=2..10 in one tagged union)
and line_repetition_features (line/paragraph granularity).

What must hold for the 100 TB claim:
- wall grows ~linearly with corpus size: the gram stream is ONE union
  explode (rows ∝ tokens x |ns|) into two partial-aggregating shuffles,
  both keyed by the document id — nothing quadratic, no window;
- a degenerate document repeating ONE phrase millions of times is
  absorbed map-side (its (id, n, gram) keys partial-aggregate before
  the exchange), so the hot document costs its scan share, never a
  single reducer's sort.

Usage: python tools/repetition_scale.py [replications_csv]  (default 1,4,16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import text as T
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    reps = [
        int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,4,16").split(",")
    ]
    spark = get_spark(
        app_name="repetition-scale", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )

    for mult in reps:
        r = spark.range(mult).select(F.col("id").alias("rep"))
        docs = (
            base.crossJoin(F.broadcast(r))
            .select(
                (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"), "text"
            )
            .repartition(64)
            .localCheckpoint(eager=True)
        )
        n = docs.count()
        t0 = time.monotonic()
        out = T.ngram_repetition_battery(docs)
        n_out = out.count()
        wall = time.monotonic() - t0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan[:2000]
        assert n_out == n, (n_out, n)
        print(f"mult={mult:>2} docs={n:>7}: battery wall={wall:.2f}s")

    # hot-document regime: one doc is a single phrase repeated 200k
    # times — every one of its n-grams is the SAME gram per n, so one
    # (id, n, gram) key holds ~200k x 9 occurrences.  Checkpoint the
    # fixture (constant-folded literal, see lines_scale.py).
    phrase = "the same five word phrase"
    hot = (
        spark.range(1)
        .select(
            F.lit(0).cast("bigint").alias("doc_id"),
            F.array_join(
                F.array_repeat(F.lit(phrase), 200_000), " "
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    mixed = hot.unionByName(
        base.select((F.col("doc_id") + 1).alias("doc_id"), "text")
    ).repartition(spark.sparkContext.defaultParallelism)
    t0 = time.monotonic()
    row = (
        T.ngram_repetition_battery(mixed).filter(F.col("id") == 0).first()
    )
    wall = time.monotonic() - t0
    # 1M tokens of a 5-token loop: the 2-gram mass splits over the 5
    # distinct wrap-around 2-grams (top ≈ 1/5 by chars), and every
    # 5..10-gram is a duplicate
    assert row["top2_char_frac"] > 0.15 and row["dup5_char_frac"] > 0.99, row
    print(f"hot-doc 200k-phrase repeats (1M tokens): wall={wall:.2f}s")


if __name__ == "__main__":
    main()
