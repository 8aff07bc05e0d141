"""Stream-stream join state growth: does the state store track the LAG
WINDOW or the STREAM LENGTH?

The operator's 100 TB claim (streaming/join_stream.py): with a
watermark and a finite time-range condition, the symmetric hash join
evicts state the range condition proves unmatchable, so state size is
bounded by (key cardinality x lag window x arrival rate) — NOT by how
long the stream has been running.  This harness streams the sf0.1
events month as N time-split micro-batches and reads
stateOperators.numRowsTotal from each progress event: the claim holds
if state PLATEAUS after the first batch instead of accumulating the
whole input.

Usage: python tools/ssj_scale.py [n_batches] [provider]
(defaults: 8 batches, hdfs; provider "rocksdb" switches the state
store to RocksDBStateStoreProvider — the production choice once state
outgrows executor heap: state lives off-heap/on-disk with changelog
checkpointing instead of full-snapshot JVM maps)

SSJ_MULT=m (round 16) replicates the events corpus m times into
DISJOINT user universes (user_id + 1e9*rep) before splitting — input
volume, per-key state and join output all scale exactly x m by
construction, so the measured per-batch wall + numRowsTotal series
answers the VOLUME-scaling question (is the operator linear in input
at fixed batch count?) rather than the stream-length question the
default answers.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import uuid

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
PROVIDER = sys.argv[2] if len(sys.argv) > 2 else "hdfs"


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.session import (
        get_spark,
        scoped_shuffle_partitions,
    )
    from applications_analytics_midas_hbase_metrics_spark.streaming.join_stream import (
        stream_interval_join,
    )

    spark = get_spark(app_name="ssj-scale", cpus=32)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    mult = int(os.environ.get("SSJ_MULT", "1"))
    if mult > 1:
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        ev = ev.crossJoin(reps).select(
            (F.col("event_id") + F.col("rep") * 10**9).alias("event_id"),
            (F.col("user_id") + F.col("rep") * 10**9).alias("user_id"),
            "event_type",
            "ts",
        )
    lo, hi = ev.agg(
        F.min("ts").alias("a"), F.max("ts").alias("b")
    ).collect()[0]  # driver-ok: 1 row

    def split_copy(df, d):
        os.makedirs(d)
        span = (hi - lo) / N
        for i in range(N):
            a = lo + i * span
            part = df.filter(
                (F.col("ts") >= a) & ((F.col("ts") < a + span) | (F.lit(i == N - 1)))
            )
            tmp = os.path.join(d, f"_t{i}")
            part.coalesce(1).write.parquet(tmp)
            f = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(d, f"{i:02d}.parquet")
            shutil.move(f, dst)
            shutil.rmtree(tmp)
            os.utime(dst, (1_700_000_000 + i,) * 2)
        return d

    root = tempfile.mkdtemp(prefix="ssj_scale_")
    # the raw parquet reads back TIMESTAMP_NTZ; watermarks need TIMESTAMP
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    vsrc = split_copy(views, os.path.join(root, "v"))
    csrc = split_copy(clicks, os.path.join(root, "c"))
    n_views, n_clicks = views.count(), clicks.count()

    sv = (
        spark.readStream.schema(spark.read.parquet(vsrc).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(vsrc)
        .withColumnRenamed("ts", "v_ts")
    )
    sc = (
        spark.readStream.schema(spark.read.parquet(csrc).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(csrc)
        .withColumnRenamed("ts", "c_ts")
    )
    j = stream_interval_join(
        sv, sc, key="user_id", left_ts="v_ts", right_ts="c_ts",
        max_lag_seconds=6 * 3600, watermark="1 hour",
    )
    if PROVIDER == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    sink = f"ssjsc_{uuid.uuid4().hex[:10]}"
    with scoped_shuffle_partitions(spark, 8):
        q = (
            j.writeStream.format("memory").queryName(sink)
            .outputMode("append").trigger(availableNow=True).start()
        )
        if not q.awaitTermination(560):
            q.stop()
            raise RuntimeError("stream timed out")
        prog = [json.loads(str(p)) for p in q.recentProgress]
    rows = spark.table(sink).count()
    per_batch = [
        {
            "input": p.get("numInputRows", 0),
            "state_rows": sum(
                so["numRowsTotal"] for so in p.get("stateOperators", [])
            ),
            "sec": round(p["durationMs"]["triggerExecution"] / 1000, 2),
        }
        for p in prog
        if p.get("numInputRows", 0) > 0
    ]
    print(
        json.dumps(
            {
                "provider": PROVIDER,
                "n_batches": N,
                "mult": mult,
                "views": n_views,
                "clicks": n_clicks,
                "joined_rows": rows,
                "per_batch": per_batch,
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
