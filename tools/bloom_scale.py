"""Runtime bloom-filter join pruning: the engine's answer for a
SELECTIVE dim join where the dim is too big to broadcast.

operators/ keeps small dims broadcast (semi-join reduction for free);
when the dim side exceeds broadcast size but carries a selective
predicate, Spark's runtime bloom filter builds a compact filter from
the dim's join keys and pushes `might_contain(...)` into the FACT scan
— the rows that would never survive the join die before the shuffle.
This harness verifies the mechanism fires on this engine's session
config and measures it: a 10M-row parquet fact joined to a 1M-row dim
filtered ~1/256 selective, broadcast disabled (the too-big-to-
broadcast regime), bloom ON vs OFF.

Thresholds are scaled to fixture size the way skew_join_scale.py
scales the skew detector: production defaults target a 10 GB
application side, which local test data never reaches — the DEFAULTS
stay untouched in the engine session, where they are right for the
100 TB regime.

Usage: python tools/bloom_scale.py [fact_rows] [dim_rows]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

FACT_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
DIM_ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(app_name="bloom-scale", cpus=32)
    d = tempfile.mkdtemp(prefix="bloom_scale_")
    (
        spark.range(FACT_ROWS)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(DIM_ROWS)).alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/fact")
    )
    (
        spark.range(DIM_ROWS)
        .select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("attr"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/dim")
    )
    # the regime under test: dim too big to broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "10MB",
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )

    def run(bloom_on: bool) -> None:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            str(bloom_on).lower(),
        )
        fact = spark.read.parquet(f"{d}/fact")
        sel = spark.read.parquet(f"{d}/dim").filter(
            F.col("attr").startswith("00")
        )
        j = fact.join(sel, "k").agg(
            F.count("*").alias("n"), F.sum("v").alias("s")
        )
        t0 = time.time()
        row = j.first()
        wall = time.time() - t0
        plan = j._jdf.queryExecution().executedPlan().toString()
        injected = "might_contain" in plan
        print(
            f"bloom={'ON ' if bloom_on else 'OFF'}  wall={wall:6.2f}s  "
            f"joined_rows={row.n:,}  might_contain_in_plan={injected}"
        )
        assert injected == bloom_on, "bloom filter did not (de)activate"

    for _ in range(2):  # second pass = warm JIT/IO, the comparable pair
        run(False)
        run(True)
    # the quantity the wall clock hides on a single box: fact rows that
    # enter the shuffle.  OFF shuffles every fact row; ON shuffles only
    # the bloom survivors (true matches + ~3% default-FPP noise).
    survivors = (
        spark.read.parquet(f"{d}/fact")
        .join(
            spark.read.parquet(f"{d}/dim")
            .filter(F.col("attr").startswith("00"))
            .select("k"),
            "k",
            "left_semi",
        )
        .count()
    )
    print(
        f"fact rows shuffled: OFF={FACT_ROWS:,} -> ON~={survivors:,} "
        f"(+<=3% bloom false positives): {FACT_ROWS / max(survivors, 1):,.0f}x "
        f"reduction — on a cluster this is network bytes, not local memcpy"
    )
    # restore session defaults for any later user of this process
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
    shutil.rmtree(d)


if __name__ == "__main__":
    main()
