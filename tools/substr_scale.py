"""Exact substring dedup (operators/text.py exact_substring_*) scaling
check: the ExactSubstr pipeline over a replicated corpus at 1x/4x/16x,
exact-text keys vs xxhash64 keys.

What must hold for the 100 TB claim:
- shuffle ROWS are proportional to corpus SHINGLES (== tokens), never
  to document pairs: the only shuffles are the shingle-frequency count
  (map-side combine) and the positions-vs-hot semi join, both keyed on
  the shingle — measured here as shingle rows per replication step
  growing exactly linearly while wall time stays ~linear;
- the two shuffles are the ONLY exchanges in the detection plan (plan
  exchange count printed per step, constant in corpus size);
- the 8-byte xxhash64 key path marks the identical span set while
  shuffling fixed-width keys instead of ~k-token strings.

Replication keeps the DUPLICATION STRUCTURE constant per replica:
every token is suffixed with the replica id, so replicas share no
shingles with each other and each replica reproduces exactly the base
corpus's duplicated spans — corpus size scales, the duplicated
fraction does not (verbatim replication would instead make EVERY
interior shingle hot and degenerate the measurement to cut-everything).

Usage: python tools/substr_scale.py [replications_csv]   (default 1,4,16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
K = 20
REPS = (
    [int(x) for x in sys.argv[1].split(",")]
    if len(sys.argv) > 1
    else [1, 4, 16]
)


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        line.count("Exchange")
        - line.count("BroadcastExchange")
        - line.count("ReusedExchange")
        for line in plan.splitlines()
    )


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import text as T
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(app_name="substr-scale", cpus=32)
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    for rep in REPS:
        docs = base
        if rep > 1:
            docs = base.crossJoin(
                spark.range(rep).select(F.col("id").alias("_r"))
            ).select(
                (F.col("doc_id") * rep + F.col("_r")).alias("doc_id"),
                # per-TOKEN replica suffix: replicas share no k-shingles,
                # so each replica carries the base corpus's own
                # duplicated spans and nothing more
                F.expr(
                    "array_join(transform(split(text, '\\\\s+'),"
                    " t -> concat(t, '_', _r)), ' ')"
                ).alias("text"),
            )
        docs = docs.localCheckpoint(eager=True)

        # shuffle volume: shingle rows (the only rows either shuffle
        # ever carries — positions to the count, positions to the join)
        n_shingles = (
            docs.select(
                F.greatest(
                    F.size(F.split(F.trim(F.col("text")), r"\s+")) - (K - 1),
                    F.lit(0),
                ).alias("n")
            )
            .agg(F.sum("n"))
            .first()[0]
        )

        spans = T.exact_substring_spans(docs, k=K)
        n_exch = _exchanges(spans)

        t0 = time.time()
        out = T.exact_substring_dedup(docs, k=K)
        n_docs, touched, cut = out.agg(
            F.count(F.lit(1)),
            F.sum((F.col("n_spans") > 0).cast("int")),
            F.sum("cut_chars"),
        ).first()
        t_exact = time.time() - t0

        t0 = time.time()
        out_h = T.exact_substring_dedup(docs, k=K, key_fn="xxhash64")
        touched_h, cut_h = out_h.agg(
            F.sum((F.col("n_spans") > 0).cast("int")), F.sum("cut_chars")
        ).first()
        t_hash = time.time() - t0

        t0 = time.time()
        out_2 = T.exact_substring_dedup(docs, k=K, two_phase=True)
        touched_2, cut_2 = out_2.agg(
            F.sum((F.col("n_spans") > 0).cast("int")), F.sum("cut_chars")
        ).first()
        t_two = time.time() - t0

        assert (touched, cut) == (touched_h, cut_h), (
            f"xxhash64 path diverges at {rep}x"
        )
        assert (touched, cut) == (touched_2, cut_2), (
            f"two-phase exact diverges at {rep}x"
        )
        print(
            f"{rep:>2}x ({n_docs} docs): shingle_rows={n_shingles}"
            f"  detect_exchanges={n_exch}  exact {t_exact:.1f}s"
            f"  two-phase-exact {t_two:.1f}s  xxhash64 {t_hash:.1f}s"
            f"  touched={touched}  cut_chars={cut}"
        )

    # -----------------------------------------------------------------
    # Incremental vs full-union rebuild: a FIXED batch cut against a
    # GROWING history.  The store (distinct shingle keys) is built once
    # per history size — the one-time artifact; the recurring cost is
    # the batch cut, whose only history-proportional work is shuffling
    # one fixed-width key per distinct history shingle.  The full-union
    # rebuild re-shingles and re-counts the whole history every batch.
    # -----------------------------------------------------------------
    print("-- incremental cut (fixed batch) vs full-union rebuild --")
    from applications_analytics_midas_hbase_metrics_spark.plans.queries_curation import (
        _substr_batch,
    )

    batch = _substr_batch(spark, SF_DIR).localCheckpoint(eager=True)
    n_batch = batch.count()
    for rep in REPS:
        hist = docsrep(spark, base, rep).localCheckpoint(eager=True)
        t0 = time.time()
        keys = T.substring_shingle_keys(hist, k=K, key_fn="xxhash64")
        keys = keys.localCheckpoint(eager=True)  # the persisted artifact
        n_keys = keys.count()
        t_store = time.time() - t0

        t0 = time.time()
        inc = T.exact_substring_dedup_incremental(
            batch, keys, k=K, key_fn="xxhash64"
        )
        inc_cut = inc.agg(F.sum("cut_chars")).first()[0]
        t_inc = time.time() - t0

        t0 = time.time()
        full = T.exact_substring_dedup(
            hist.unionByName(batch), k=K, key_fn="xxhash64"
        )
        full_cut = (
            full.filter(F.col("id") >= 1_000_000)
            .agg(F.sum("cut_chars"))
            .first()[0]
        )
        t_full = time.time() - t0
        # free differential: (in-hist >= 1) OR (in-batch >= 2) must cut
        # exactly what the union corpus's (count >= 2) cuts from batch
        assert inc_cut == full_cut, f"incremental diverges at {rep}x"
        print(
            f"{rep:>2}x history ({n_keys} store keys, {n_batch}-doc batch):"
            f"  store-build {t_store:.1f}s  incremental-cut {t_inc:.1f}s"
            f"  full-rebuild {t_full:.1f}s  cut_chars inc={inc_cut}"
            f" full={full_cut}"
        )


def docsrep(spark, base, rep: int):
    from pyspark.sql import functions as F

    if rep == 1:
        return base.select("doc_id", "text")
    return base.crossJoin(
        spark.range(rep).select(F.col("id").alias("_r"))
    ).select(
        (F.col("doc_id") * rep + F.col("_r")).alias("doc_id"),
        F.expr(
            "array_join(transform(split(text, '\\\\s+'),"
            " t -> concat(t, '_', _r)), ' ')"
        ).alias("text"),
    )


if __name__ == "__main__":
    main()
