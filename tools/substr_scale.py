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

        assert (touched, cut) == (touched_h, cut_h), (
            f"xxhash64 path diverges at {rep}x"
        )
        print(
            f"{rep:>2}x ({n_docs} docs): shingle_rows={n_shingles}"
            f"  detect_exchanges={n_exch}  exact {t_exact:.1f}s"
            f"  xxhash64 {t_hash:.1f}s  touched={touched}  cut_chars={cut}"
        )


if __name__ == "__main__":
    main()
