"""URL/domain web-curation (operators/web.py) scaling check: host
canonicalization, the deterministic per-domain cap, the volume rollup
and the per-domain temperature mixture over a replicated URL corpus at
1x/4x/16x.

What must hold for the 100 TB claim:
- host/domain extraction is a map-side projection (ZERO exchanges of
  its own — its stage fuses into whatever consumes it);
- the cap is the broadcast two-phase top-K: wall stays ~flat as the
  corpus grows while the domain count is fixed, because only <= n
  candidates per (domain, task) reach the winner resolution and the
  winner set comes back as a broadcast semi join (never a global
  sort — asserted on the executed plan per step);
- the rollup and the mixture are one partial-aggregated shuffle each;
  the mixture's derived thresholds frame is |domains| rows broadcast
  back (keep-decision stays map-side).

Replication multiplies documents, not domains (ids spread across the
same ~3000 registrable domains), matching the real regime: corpus
grows, the web's domain population doesn't.

Usage: python tools/web_scale.py [replications_csv]   (default 1,4,16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import web as W
    from applications_analytics_midas_hbase_metrics_spark.operators.sampling import (
        temperature_mixture,
    )
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    reps = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,4,16").split(",")]
    spark = get_spark(app_name="web-scale", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n_base = base.count()

    def urls(mult: int):
        r = spark.range(mult).select(F.col("id").alias("rep"))
        d = base.crossJoin(F.broadcast(r)).select(
            (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"), "text"
        )
        # ~3000 registrable domains regardless of corpus size; the URL
        # carries the usual canonicalization junk so extraction is real
        return d.withColumn(
            "url",
            F.concat(
                F.lit("HTTPS://user@www.Site"),
                (F.col("doc_id") % 997).cast("string"),
                F.element_at(
                    F.array(F.lit(".com"), F.lit(".org"), F.lit(".co.uk")),
                    (F.col("doc_id") % 3 + 1).cast("int"),
                ),
                F.lit(":8080/p/"),
                F.col("doc_id").cast("string"),
                F.lit("?b=2&a=1#frag"),
            ),
        )

    def skewed_urls(mult: int):
        # mega-domain regime: ~90% of documents land on ONE registrable
        # domain (the templated-site pathology the cap exists for); the
        # rest spread over ~1000.  The two-phase top-K must stay flat:
        # the partition-local window leaves <= n candidate rows per
        # (domain, task) no matter how hot the domain is, so the hot
        # key never funnels through one reducer.
        r = spark.range(mult).select(F.col("id").alias("rep"))
        d = base.crossJoin(F.broadcast(r)).select(
            (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"), "text"
        )
        site = F.when(
            F.col("doc_id") % 10 < 9, F.lit("megasite")
        ).otherwise(F.concat(F.lit("site"), (F.col("doc_id") % 997).cast("string")))
        return d.withColumn(
            "url", F.concat(F.lit("http://"), site, F.lit(".com/p"))
        )

    for mult in reps:
        sk = W.with_domain(skewed_urls(mult)).repartition(64).localCheckpoint(
            eager=True
        )
        t0 = time.monotonic()
        n_sk = W.domain_cap(sk, n=10).count()
        t_sk = time.monotonic() - t0
        print(
            f"mult={mult:>2} SKEW(90% one domain): rows_in={sk.count():>7} "
            f"kept={n_sk} wall={t_sk:.2f}s"
        )

    for mult in reps:
        dom = W.with_domain(urls(mult)).repartition(64).localCheckpoint(eager=True)
        rows_in = dom.count()

        t0 = time.monotonic()
        capped = W.domain_cap(dom, n=10)
        n_kept = capped.count()
        t_cap = time.monotonic() - t0
        plan = capped._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan[:2000]
        assert "rangepartitioning" not in plan.lower(), plan[:2000]

        t0 = time.monotonic()
        n_dom = W.domain_stats(dom).count()
        t_stats = time.monotonic() - t0

        t0 = time.monotonic()
        n_mix = temperature_mixture(dom, alpha=0.5, strat_col="domain").count()
        t_mix = time.monotonic() - t0

        print(
            f"mult={mult:>2} rows_in={rows_in:>7} "
            f"cap: kept={n_kept} wall={t_cap:.2f}s (plan: broadcast semi, no range sort)  "
            f"stats: domains={n_dom} wall={t_stats:.2f}s  "
            f"mixture: kept={n_mix} wall={t_mix:.2f}s  "
            f"load={os.getloadavg()[0]:.1f}"
        )
    print(f"base corpus: {n_base} docs from {SF_DIR}")


if __name__ == "__main__":
    main()
