"""Line-level boilerplate removal (operators/lines.py) scaling check:
strip_boilerplate over a replicated multi-line corpus at 1x/4x/16x,
raw-line keys vs xxhash64 keys.

What must hold for the 100 TB claim:
- wall time grows ~linearly with corpus size (every stage is one
  aggregate or one broadcast join — nothing quadratic);
- the boilerplate dictionary stays SMALL and constant (it is the set
  of frequent lines, not a function of corpus size) — that is what
  keeps the doc-side join a broadcast;
- the hashed-key variant matches the raw variant's output counts
  (collision-free at these scales) while shuffling 8-byte keys.

Usage: python tools/lines_scale.py [replications_csv]   (default 1,4,16)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
REPS = (
    [int(x) for x in sys.argv[1].split(",")]
    if len(sys.argv) > 1
    else [1, 4, 16]
)


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import lines as L
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(app_name="lines-scale", cpus=32)
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    for rep in REPS:
        docs = base
        if rep > 1:
            # replica bodies must stay UNIQUE (suffix the text): verbatim
            # copies would push every body line over min_doc_freq at
            # rep >= 5 and the measurement would degenerate to
            # strip-everything (observed before this suffix existed:
            # 10,010 dictionary lines and 100% removal at 16x)
            docs = base.crossJoin(
                spark.range(rep).select(F.col("id").alias("_r"))
            ).select(
                (F.col("doc_id") * rep + F.col("_r")).alias("doc_id"),
                "source",
                "lang",
                # tag BOTH ends: the staging step splits the text into
                # two half-lines, and each half must differ per replica
                F.concat(
                    F.lit("r"), F.col("_r"), F.lit(" "),
                    F.col("text"),
                    F.lit(" r"), F.col("_r"),
                ).alias("text"),
            )
        staged = docs.select(
            "doc_id",
            F.concat_ws(
                "\n",
                F.concat(F.lit("=== "), F.col("source"), F.lit(" ===")),
                F.expr("substring(text, 1, length(text) div 2)"),
                F.concat(F.lit("lang: "), F.col("lang")),
                F.expr("substring(text, length(text) div 2 + 1, length(text))"),
                F.lit("--- corpus footer ---"),
            ).alias("text"),
        ).localCheckpoint(eager=True)

        n_dict = L.boilerplate_lines(staged, min_doc_freq=5).count()

        t0 = time.time()
        raw = L.strip_boilerplate(staged, min_doc_freq=5)
        n_docs, n_removed = raw.agg(
            F.count(F.lit(1)), F.sum("n_removed")
        ).first()
        t_raw = time.time() - t0

        t0 = time.time()
        hashed = L.strip_boilerplate(staged, min_doc_freq=5, hash_lines=True)
        n_docs_h, n_removed_h = hashed.agg(
            F.count(F.lit(1)), F.sum("n_removed")
        ).first()
        t_hash = time.time() - t0

        assert (n_docs, n_removed) == (n_docs_h, n_removed_h), (
            f"hashed path diverges at {rep}x"
        )
        print(
            f"{rep:>2}x ({n_docs} docs): raw {t_raw:.1f}s  hashed {t_hash:.1f}s"
            f"  dict_lines={n_dict}  removed={n_removed}"
        )

    # --- line_repetition_features under a degenerate hot document ---
    # The battery's target workload includes documents that repeat ONE
    # line enormously (generation loops).  All N occurrences share one
    # (id, line) key; the claim is that the partial-aggregating groupBy
    # absorbs them map-side (wall ~linear in N), with no per-key window
    # funnel.  A window form would sort all N rows in one task.
    for n in (100_000, 400_000, 1_600_000):
        # localCheckpoint the FIXTURE: Catalyst constant-folds the
        # array_repeat into a literal n-element array that would
        # otherwise ride every task binary of every measured stage
        # (observed: 43s at 1.6M un-severed vs 2.1s severed — all of
        # it 40 MB plan-literal broadcast, none of it operator work)
        hot = spark.range(1).select(
            F.lit(0).cast("bigint").alias("doc_id"),
            F.array_join(
                F.array_repeat(F.lit("the same boilerplate line"), n), "\n"
            ).alias("text"),
        ).localCheckpoint(eager=True)
        # pair the hot doc with a normal corpus slice so the stage has
        # real parallel work beside the hot key
        mixed = hot.unionByName(
            base.select((F.col("doc_id") + 1).alias("doc_id"), "text")
        ).repartition(spark.sparkContext.defaultParallelism)
        t0 = time.time()
        row = (
            L.line_repetition_features(mixed)
            .filter(F.col("id") == 0)
            .first()
        )
        t_hot = time.time() - t0
        # tolerance, not equality: Spark rounds HALF_UP, Python rounds
        # half-to-even — round(1 - 1/400000, 6) differs in the last digit
        assert row["n_lines"] == n and abs(
            row["dup_line_frac"] - (1.0 - 1.0 / n)
        ) < 2e-6, row
        print(f"hot-doc {n:>9,} repeated lines: {t_hot:.1f}s")


if __name__ == "__main__":
    main()
