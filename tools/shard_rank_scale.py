"""Single-task-funnel scaling check for the round-13 two-phase rank
rewrites (operators/sampling.py shuffle_shards +
stratified_percent_rank) — the last two window funnels the round-12
verdict flagged.

Regimes (the operators' own TARGET workloads):
- shuffle_shards with FEW shards (8): every shard holds ~rows/8 — the
  old per-shard ``row_number`` window sorted each shard in ONE task
  (100 GB+/task at corpus scale); the two-phase rank spreads a shard's
  rank work across every range partition it spans.
- stratified_percent_rank with a 90%-hot stratum (per-SOURCE
  percentile normalization has FEW, HUGE strata): same funnel, same
  fix.
- token_budget_mixture with a 90%-hot budgeted source: the per-source
  running-token window → _two_phase_cumsum.  This section is ALSO the
  regression harness for the exchange-reuse determinism trap (SCALE.md
  round-13 addendum): with per-RDD-seed range boundaries the kept-row
  count varied run to run; round 14 removes the trap at the root — the
  bucket is a pure expression over DETERMINISTIC broadcast boundaries
  (sampling._det_range_bucket), so no pin is needed at all.
- quality_representatives with a 90%-hot cluster (the viral
  boilerplate near-dup class): per-cluster argmax window →
  max-struct aggregation + equi join, plan asserted Window-free.

What must hold for the 100 TB claim:
- results are BIT-IDENTICAL to the single-window shape (checked per
  multiplier, not assumed — the rank key ends in a unique id, so
  offset + partition-local rank equals the global rank exactly);
- every full-row ``row_number`` window in the new plans partitions by
  the deterministic range bucket (``_tp_b``) — bucket-bounded sorts, no
  per-group funnel (the only group-wide window left runs on the tiny
  counts frame, input rows = n_groups + n_buckets);
- wall grows ~linearly with rows (the work is the scan + narrow
  shuffles), never with the hot group's size; the PRE-rewrite window
  shape is timed at each multiplier so the gap is measured.

Usage: python tools/shard_rank_scale.py [replications_csv]  (default 1,4,16)
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def _row_number_windows_partition_bounded(plan: str) -> bool:
    """Every row_number window spec in the plan must carry _tp_b in its
    partition clause (bucket-local sort), or belong to no window at
    all."""
    for spec in re.findall(r"row_number\(\).*?windowspecdefinition\(([^)]*)\)", plan):
        if "_tp_b" not in spec:
            return False
    return True


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from applications_analytics_midas_hbase_metrics_spark.operators import sampling as S
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    reps = [
        int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,4,16").split(",")
    ]
    spark = get_spark(
        app_name="shard-rank-scale", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )

    def corpus(mult: int):
        """90% of rows land in ONE stratum; deterministic score."""
        r = spark.range(mult).select(F.col("id").alias("rep"))
        d = base.crossJoin(F.broadcast(r)).select(
            (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"), "text"
        )
        hot = F.col("doc_id") % 10 < 9
        return d.select(
            "doc_id",
            "text",
            F.when(hot, F.lit("megasource"))
            .otherwise(F.concat(F.lit("s"), (F.col("doc_id") % 7).cast("string")))
            .alias("source"),
            F.round((F.col("doc_id") * 2654435761 % 1000003) / 1000003.0, 9).alias(
                "score"
            ),
        )

    def old_shards(df, n_shards: int):  # pre-round-13 funnel shape
        h = F.pmod(
            F.pmod(F.col("doc_id").cast("bigint"), F.lit(S._MIX_DOMAIN))
            * F.lit(S._SHARD_PRIME),
            F.lit(S._MIX_DOMAIN),
        )
        with_h = df.withColumn("_h", h).withColumn(
            "shard",
            F.floor(F.col("_h") * n_shards / F.lit(S._MIX_DOMAIN)).cast("int"),
        )
        w = Window.partitionBy("shard").orderBy("_h", "doc_id")
        return with_h.withColumn(
            "pos", F.row_number().over(w).cast("bigint")
        ).drop("_h")

    def old_pct(df):  # pre-round-13 funnel shape
        w = Window.partitionBy("source").orderBy("score", "doc_id")
        return df.withColumn("pct_rank", F.round(F.percent_rank().over(w), 6))

    def old_budget(df, budgets):  # pre-round-13 funnel shape
        b = F.create_map(*[F.lit(x) for kv in budgets.items() for x in kv])
        h = F.pmod(
            F.pmod(F.col("doc_id").cast("bigint"), F.lit(S._MIX_DOMAIN))
            * F.lit(S._BUDGET_PRIME),
            F.lit(S._MIX_DOMAIN),
        )
        w = (
            Window.partitionBy("source")
            .orderBy("_h", "doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            df.withColumn("_b", b[F.col("source")])
            .filter(F.col("_b").isNotNull())
            .withColumn("_h", h)
            .withColumn(
                "cum_tokens", F.sum(F.col("n_tokens").cast("bigint")).over(w)
            )
            .filter(F.col("cum_tokens") <= F.col("_b"))
            .drop("_h", "_b")
        )

    def checksum(df, cols):
        return df.select(
            F.bit_xor(F.xxhash64(*cols)).alias("c"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]

    for mult in reps:
        docs = corpus(mult).repartition(64).localCheckpoint(eager=True)
        rows_in = docs.count()

        t0 = time.monotonic()
        sh = S.shuffle_shards(docs, n_shards=8)
        cs_new = checksum(sh, ["doc_id", "shard", "pos"])
        t_sh = time.monotonic() - t0
        plan = sh._jdf.queryExecution().executedPlan().toString()
        assert _row_number_windows_partition_bounded(plan), plan[:2000]

        t0 = time.monotonic()
        cs_old = checksum(old_shards(docs, 8), ["doc_id", "shard", "pos"])
        t_sh_old = time.monotonic() - t0
        assert tuple(cs_new) == tuple(cs_old), (cs_new, cs_old)

        t0 = time.monotonic()
        pr = S.stratified_percent_rank(docs, "source", "score", "doc_id")
        cs_pnew = checksum(pr, ["doc_id", "pct_rank"])
        t_pr = time.monotonic() - t0
        pplan = pr._jdf.queryExecution().executedPlan().toString()
        assert _row_number_windows_partition_bounded(pplan), pplan[:2000]

        t0 = time.monotonic()
        cs_pold = checksum(old_pct(docs), ["doc_id", "pct_rank"])
        t_pr_old = time.monotonic() - t0
        assert tuple(cs_pnew) == tuple(cs_pold), (cs_pnew, cs_pold)

        # token-budget prefix sum under the same mega-source regime:
        # ~90% of rows (and tokens) belong to ONE budgeted source
        bdocs = docs.withColumn(
            "n_tokens", (F.col("doc_id") % 37 + 1).cast("bigint")
        )
        budgets = {"megasource": rows_in * 2, "s1": rows_in, "s3": 50}
        t0 = time.monotonic()
        tb = S.token_budget_mixture(bdocs, budgets, weight_col="n_tokens")
        cs_bnew = checksum(tb, ["doc_id", "cum_tokens"])
        t_tb = time.monotonic() - t0
        bplan = tb._jdf.queryExecution().executedPlan().toString()
        assert _row_number_windows_partition_bounded(bplan), bplan[:2000]

        t0 = time.monotonic()
        cs_bold = checksum(
            old_budget(bdocs, budgets), ["doc_id", "cum_tokens"]
        )
        t_tb_old = time.monotonic() - t0
        assert tuple(cs_bnew) == tuple(cs_bold), (cs_bnew, cs_bold)

        # quality_representatives under a 90%-hot CLUSTER (the viral
        # boilerplate near-dup class): argmax by max-struct agg + join
        # vs the pre-round-13 per-cluster window
        from applications_analytics_midas_hbase_metrics_spark.operators import (
            graph as G,
        )

        comps = docs.select(
            F.col("doc_id").alias("id"),
            F.when(F.col("source") == "megasource", F.lit(1))
            .otherwise(F.col("doc_id"))
            .cast("bigint")
            .alias("cluster_id"),
        )
        scored = docs.select(
            F.col("doc_id").alias("id"), F.col("score").alias("q")
        )
        t0 = time.monotonic()
        qr = G.quality_representatives(scored, comps, score_col="q")
        cs_qnew = checksum(qr, ["id", "cluster_id", "keep"])
        t_qr = time.monotonic() - t0
        qplan = qr._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in qplan, qplan[:2000]

        wq = Window.partitionBy("cluster_id").orderBy(
            F.col("q").desc(), F.col("id")
        )
        old_qr = (
            scored.join(comps, "id", "left")
            .withColumn("cluster_id", F.coalesce("cluster_id", F.col("id")))
            .select(
                "id",
                "cluster_id",
                "q",
                (F.row_number().over(wq) == 1).cast("bigint").alias("keep"),
            )
        )
        t0 = time.monotonic()
        cs_qold = checksum(old_qr, ["id", "cluster_id", "keep"])
        t_qr_old = time.monotonic() - t0
        assert tuple(cs_qnew) == tuple(cs_qold), (cs_qnew, cs_qold)

        print(
            f"mult={mult:>3} rows={rows_in:>9} | "
            f"shards two-phase {t_sh:6.2f}s vs window {t_sh_old:6.2f}s | "
            f"pct_rank two-phase {t_pr:6.2f}s vs window {t_pr_old:6.2f}s | "
            f"token_budget two-phase {t_tb:6.2f}s vs window {t_tb_old:6.2f}s | "
            f"representatives agg {t_qr:6.2f}s vs window {t_qr_old:6.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
