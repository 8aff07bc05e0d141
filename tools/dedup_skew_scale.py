"""Hot-key scaling check for the keep-first dedup shapes
(operators/dedup.py drop_exact_duplicates + exact_duplicates,
operators/web.py url_dedup) under the 90%-one-key regime — the
operator's own TARGET workload (a boilerplate document or canonical
URL duplicated across most of a crawl), mirroring web_scale.py's
mega-domain regime.

What must hold for the 100 TB claim (round-12 rewrite):
- NO window on the dedup key: a ``row_number`` window funnels every
  copy of the hot key through ONE task's sort (AQE skew handling
  covers joins, not windows).  The executed plans are asserted
  Window/Sort-free.
- drop_exact_duplicates / url_dedup are ``groupBy(key).agg(min_by(row,
  id))``: map-side partial merge hands the reducer one candidate per
  key per map partition, so wall grows ~linearly with rows (the work
  is the scan), never with the hot group's size.
- exact_duplicates pre-reduces per (hash, spark_partition_id) — the
  whole phase-1 group lives in one input partition, so the exchange
  moves pre-aggregated rows, never per-copy ids.

The tool also times the PRE-rewrite window shape at each multiplier so
the flat-vs-funnel gap is measured, not asserted from theory.

Usage: python tools/dedup_skew_scale.py [replications_csv]  (default 1,4,16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from applications_analytics_midas_hbase_metrics_spark.operators import dedup as D
    from applications_analytics_midas_hbase_metrics_spark.operators import lines as L
    from applications_analytics_midas_hbase_metrics_spark.operators import versions as V
    from applications_analytics_midas_hbase_metrics_spark.operators import web as W
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    reps = [
        int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,4,16").split(",")
    ]
    spark = get_spark(
        app_name="dedup-skew-scale", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )

    def skewed_docs(mult: int):
        """90% of rows carry ONE text (the hot content key); the rest
        keep their own text.  Same 90/10 split for the URL column."""
        r = spark.range(mult).select(F.col("id").alias("rep"))
        d = base.crossJoin(F.broadcast(r)).select(
            (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"), "text"
        )
        hot = F.col("doc_id") % 10 < 9
        return d.select(
            "doc_id",
            F.when(hot, F.lit("the hot boilerplate document body"))
            .otherwise(F.col("text"))
            .alias("text"),
            F.when(hot, F.lit("http://megasite.com/landing?b=2&a=1"))
            .otherwise(
                F.concat(
                    F.lit("http://site"),
                    F.col("doc_id").cast("string"),
                    F.lit(".com/p"),
                )
            )
            .alias("url"),
        )

    def window_drop(df):  # the PRE-round-12 funnel shape, for comparison
        key = F.sha2(F.col("text"), 256)
        w = Window.partitionBy(key).orderBy(F.col("doc_id"))
        return (
            df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )

    for mult in reps:
        docs = skewed_docs(mult).repartition(64).localCheckpoint(eager=True)
        rows_in = docs.count()

        t0 = time.monotonic()
        kept_df = D.drop_exact_duplicates(docs)
        n_kept = kept_df.count()
        t_drop = time.monotonic() - t0
        plan = kept_df._jdf.queryExecution().executedPlan().toString()
        # no per-key window funnel; the exchange must sit ABOVE a
        # partial min_by (map-side combine -> one candidate row per key
        # per partition crosses the wire).  min_by's struct buffer
        # compiles to SortAggregate — the sorts are partition-LOCAL and
        # spillable, not a per-key funnel.
        assert "Window" not in plan and "partial_min_by" in plan, plan[:2000]

        t0 = time.monotonic()
        n_groups = D.exact_duplicates(docs).count()
        t_groups = time.monotonic() - t0
        gplan = (
            D.exact_duplicates(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in gplan, gplan[:2000]

        t0 = time.monotonic()
        url_df = W.url_dedup(docs)
        n_urls = url_df.count()
        t_url = time.monotonic() - t0
        uplan = url_df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in uplan and "partial_min_by" in uplan, uplan[:2000]

        t0 = time.monotonic()
        n_old = window_drop(docs).count()
        t_old = time.monotonic() - t0
        assert n_old == n_kept, (n_old, n_kept)

        # round-12 addendum: dedupe_chunks under the same regime — the
        # hot text is ONE 5-token chunk repeated by ~90% of all docs,
        # so the owner table's hot key carries ~0.9 x rows instances;
        # the groupBy owner + join-back shape must stay window-free
        t0 = time.monotonic()
        ch_df = V.dedupe_chunks(docs, chunk_tokens=5)
        n_docs_ch = ch_df.count()
        t_ch = time.monotonic() - t0
        cplan = ch_df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in cplan, cplan[:2000]
        assert n_docs_ch == rows_in, (n_docs_ch, rows_in)

        # late round-12: corpus-wide keep-first paragraph dedup under
        # the same regime — ~90% of documents share ONE paragraph, so
        # the unit keeper table has a key carrying ~0.9 x rows
        # occurrences; the min-key aggregation + equi join must stay
        # window-free and the join-back is AQE-skew-splittable
        para_docs = docs.select(
            "doc_id",
            F.concat(
                F.col("text"), F.lit("\n\n"), F.lit("hot shared paragraph")
            ).alias("text"),
        )
        t0 = time.monotonic()
        pd_df = L.dedup_units_across_corpus(para_docs)
        n_docs_pd = pd_df.count()
        t_pd = time.monotonic() - t0
        pplan = pd_df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in pplan, pplan[:2000]
        assert n_docs_pd == rows_in, (n_docs_pd, rows_in)

        print(
            f"mult={mult:>2} rows_in={rows_in:>8} (90% one key): "
            f"drop_exact kept={n_kept} wall={t_drop:.2f}s "
            f"(old window shape {t_old:.2f}s)  "
            f"exact_groups={n_groups} wall={t_groups:.2f}s  "
            f"url_dedup kept={n_urls} wall={t_url:.2f}s  "
            f"chunk_dedup wall={t_ch:.2f}s  "
            f"para_dedup wall={t_pd:.2f}s  "
            f"load={os.getloadavg()[0]:.1f}"
        )
    print("plans: window-free, map-side partial agg (asserted each step)")


if __name__ == "__main__":
    main()
