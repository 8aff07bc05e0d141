"""Measure the batched BPE trainer's scheduler efficiency: Spark jobs
per learned merge at a production-shaped merge count, plus wall time vs
the sequential (batch_candidates=1) loop at a smaller count.

The round-7 verdict's concern: one shuffle + localCheckpoint per merge
means a 32k-merge vocabulary = 32k sequential Spark jobs — hours of
scheduler overhead at any data size.  The batched trainer keeps the
merge table EXACT (tests/test_bpe.py) while collapsing rounds.

Usage: python tools/bpe_scale.py [n_merges] [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 400
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"


def n_jobs(sc) -> int:
    ids = sc.statusTracker().getJobIdsForGroup(None)
    return (max(ids) + 1) if ids else 0


def main() -> None:
    from applications_analytics_midas_hbase_metrics_spark.operators import bpe as B
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(app_name="bpe-scale", cpus=8)
    sc = spark.sparkContext
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()  # warm the scan

    # 1. equality spot-check at a bench-scale merge count
    t0 = time.time()
    seq = B.train_bpe_merges(docs, n_merges=60, batch_candidates=1)
    t_seq = time.time() - t0
    t0 = time.time()
    bat = B.train_bpe_merges(docs, n_merges=60, batch_candidates=64)
    t_bat = time.time() - t0
    assert bat == seq, "batched merge table diverged from sequential"
    print(f"60 merges: sequential {t_seq:.1f}s, batched {t_bat:.1f}s "
          f"(speedup {t_seq / t_bat:.1f}x), tables identical")

    # 2. jobs/merge at the production-shaped count, both modes
    for label, kw in [
        ("strict/exact", dict(strict=True)),
        ("relaxed", dict(strict=False)),
    ]:
        j0 = n_jobs(sc)
        t0 = time.time()
        merges = B.train_bpe_merges(
            docs, n_merges=N_MERGES, batch_candidates=512, min_pair_freq=2, **kw
        )
        dt = time.time() - t0
        dj = n_jobs(sc) - j0
        print(
            f"{label}: {len(merges)} merges in {dt:.1f}s, {dj} Spark jobs -> "
            f"{dj / max(1, len(merges)):.3f} jobs/merge"
        )
    vocab_bench(spark, sc, N_MERGES)


def synthetic_vocab_docs(spark, n_vocab: int = 20000):
    """A Zipf-frequency vocabulary of base-26 words — the fixture
    corpus has only 31 distinct words (BPE exhausts at ~89 merges), so
    production-shaped merge counts need a production-shaped vocabulary.
    Deterministic: word i = base-26 digits of i, freq ~ n_vocab/i."""
    from pyspark.sql import functions as F

    ids = spark.range(1, n_vocab + 1).select(F.col("id").cast("int"))
    # hash-spread base-26 words (7 letters over the full a-z alphabet):
    # a digits->10-letter mapping was tried first and capped the
    # symbol-DISJOINT batch width at ~5 pairs regardless of algorithm —
    # the alphabet, not the trainer, was the bottleneck
    h = (F.col("id") * F.lit(2654435761)) % F.lit(2**31)
    word = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.lit(6)),
            lambda k: F.char(
                (F.floor(h / F.pow(F.lit(26.0), k)) % 26).cast("int")
                + F.ascii(F.lit("a"))
            ),
        ),
    )
    freq = F.greatest(F.lit(1), (F.lit(n_vocab) / F.col("id")).cast("int"))
    return (
        ids.select(word.alias("w"), freq.alias("f"))
        .select(F.explode(F.sequence(F.lit(1), F.col("f"))).alias("i"), "w")
        .select(F.col("w").alias("text"))
        .repartition(32)
    )


def vocab_bench(spark, sc, n_merges: int) -> None:
    from applications_analytics_midas_hbase_metrics_spark.operators import bpe as B
    import time

    docs = synthetic_vocab_docs(spark)
    docs.count()
    for label, kw in [
        ("vocab strict/exact", dict(strict=True)),
        ("vocab relaxed", dict(strict=False)),
    ]:
        j0 = n_jobs(sc)
        t0 = time.time()
        merges = B.train_bpe_merges(
            docs, n_merges=n_merges, batch_candidates=1024, min_pair_freq=2, **kw
        )
        dt = time.time() - t0
        dj = n_jobs(sc) - j0
        print(
            f"{label}: {len(merges)} merges in {dt:.1f}s, {dj} Spark jobs -> "
            f"{dj / max(1, len(merges)):.3f} jobs/merge"
        )


if __name__ == "__main__":
    main()
