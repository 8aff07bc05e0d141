"""Streaming windows: batch/stream parity via availableNow on the same
data — the same window expression must produce the same result in both
execution modes (the whole point of Structured Streaming)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from applications_analytics_midas_hbase_metrics_spark.streaming import windows as W


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from applications_analytics_midas_hbase_metrics_spark.plans.queries import t

    return t(spark, sf_dir, "events")


def test_tumbling_counts_totals(events):
    out = W.tumbling_counts(events, "1 hour")
    total = out.agg(F.sum("n")).first()[0]
    assert total == events.count()


def test_sliding_counts_double_count(events):
    out = W.sliding_counts(events, "1 hour", "30 minutes")
    total = out.agg(F.sum("n")).first()[0]
    assert total == 2 * events.count()  # every event in exactly 2 windows


def test_session_window_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 1.0),  # same session (10m gap)
        (1, "2024-01-01 01:00:00", 1.0),  # new session (50m gap)
        (2, "2024-01-01 00:00:00", 1.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = W.session_aggregate(df, "30 minutes")
    sess = sorted(
        [(r.user_id, r.n_events) for r in out.collect()]
    )
    assert sess == [(1, 1), (1, 2), (2, 1)]


def test_user_activity_features(events):
    out = W.user_activity_features(events)
    r = out.first()
    assert r.n_events > 0 and r.active_span_s >= 0


def test_stream_to_cells_matches_batch_build(spark, sf_dir, tmp_path):
    from applications_analytics_midas_hbase_metrics_spark.operators.cellstore import to_cells
    from applications_analytics_midas_hbase_metrics_spark.streaming import ingest_stream as IS

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    src = str(tmp_path / "li_src")
    li.repartition(3).write.parquet(src)  # 3 files -> 3 micro-batches
    stream = spark.readStream.schema(li.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out, ckpt = str(tmp_path / "cells_out"), str(tmp_path / "ckpt")
    q = IS.stream_to_cells(
        stream, out, ckpt,
        key_cols=["l_returnflag", "l_linestatus", "l_orderkey"],
        col_name="l_partkey",
        value_cols=["l_linenumber", "l_suppkey"],
        trigger_available_now=True,
    )
    q.awaitTermination(180)
    stored = spark.read.parquet(out)
    # per-batch grouping: regroup across batches and compare to the
    # single-shot batch build (order-insensitive on the value arrays)
    regrouped = (
        stored.select("row_key", "col_name", F.explode("values").alias("v"))
        .groupBy("row_key", "col_name")
        .agg(F.array_sort(F.collect_list("v")).alias("values"))
    )
    batch = to_cells(
        li, ["l_returnflag", "l_linestatus", "l_orderkey"],
        F.col("l_partkey"), ["l_linenumber", "l_suppkey"],
    ).select("row_key", "col_name", "values")
    assert regrouped.count() == batch.count()
    assert regrouped.exceptAll(batch).count() == 0


def test_mupr_corrupt_record_capture(spark, tmp_path):
    from applications_analytics_midas_hbase_metrics_spark.sources import ingest as I

    D = "\x00"
    p = tmp_path / "bad.mupr"
    p.write_text(
        "\n".join(
            [
                D.join(["101", "S", "1", "5", "1.5", "7", "3.25", "A", "P", "M", "t1"]),
                D.join(["NOT_AN_INT", "S", "1", "5", "1.5", "7", "x", "A", "P", "M", "t2"]),
            ]
        )
    )
    # cache required: Spark disallows referencing only _corrupt_record
    # on an un-materialized CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    df = I.read_mupr(spark, str(p), keep_corrupt=True).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 1 and bad.count() == 1
    assert bad.first()._corrupt_record.startswith("NOT_AN_INT")
    # default mode unchanged: no extra column
    plain = I.read_mupr(spark, str(p))
    assert "_corrupt_record" not in plain.columns


def test_stateful_running_totals_equal_batch(spark, events, tmp_path):
    from applications_analytics_midas_hbase_metrics_spark.streaming import stateful as S

    src = str(tmp_path / "events_state_src")
    # 4 files + maxFilesPerTrigger=1 → 4 micro-batches, so the state
    # genuinely carries across batches
    events.select("user_id", "value", "ts").repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        S.running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM running_totals").toPandas()
    # update mode re-emits per batch; the final (max n_events) row per
    # user is the running total after all input
    final = got.sort_values("n_events").groupby("user_id").last()
    batch = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("value_sum"))
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    for uid, row in batch.iterrows():
        assert final.loc[uid, "n_events"] == row["n_events"]
        assert abs(final.loc[uid, "value_sum"] - row["value_sum"]) < 1e-6


def test_stream_dedupe(spark, tmp_path):
    from applications_analytics_midas_hbase_metrics_spark.streaming import stateful as S

    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:00:00", 1.0),  # exact duplicate
        (2, "2024-01-01 00:01:00", 2.0),
        (2, "2024-01-01 00:05:00", 2.5),  # same key, later ts -> still a dup
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "value"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    src = str(tmp_path / "dedupe_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        S.stream_dedupe(stream, key="event_id")
        .writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM deduped").collect()
    assert sorted(r.event_id for r in got) == [1, 2]


def test_stream_equals_batch(spark, events, tmp_path):
    # materialize events as a file stream source, run the streaming agg
    # with availableNow, compare against the batch expression
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = W.stream_tumbling_counts(stream, "1 hour", watermark="0 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("stream_tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM stream_tumbling")
    batch = (
        W.tumbling_counts(events, "1 hour")
        .select("window_start", "event_type", "n")
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_source_copy_writes_once(spark, sf_dir):
    """The streaming queries' derived file-source copies are written once
    per interpreter and reused: a second call must return the same path
    without rewriting (mtime unchanged), and the data must round-trip."""
    import os
    import time

    from applications_analytics_midas_hbase_metrics_spark.plans.queries import t
    from applications_analytics_midas_hbase_metrics_spark.plans.queries_streaming import _source_copy

    ev = t(spark, sf_dir, "events").select("event_id")
    p1 = _source_copy(ev, "srccopy_test", sf_dir, nfiles=2)
    success = os.path.join(p1, "_SUCCESS")
    assert os.path.exists(success)
    mtime = os.path.getmtime(success)
    time.sleep(0.05)
    p2 = _source_copy(ev, "srccopy_test", sf_dir, nfiles=2)
    assert p2 == p1
    assert os.path.getmtime(success) == mtime, "second call must not rewrite"
    assert spark.read.parquet(p1).count() == ev.count()
    # a different sf tag or file count gets its own directory
    p3 = _source_copy(ev, "srccopy_test", sf_dir, nfiles=3)
    assert p3 != p1


def test_bench_contract_importable():
    """bench.py is the driver's perf contract — it must import cleanly
    and expose main() (a syntax error there would void the round's
    BENCH record)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_contract_check", os.path.join("/root/repo", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.main)


def test_sessionize_state_carries_across_batches(spark, tmp_path):
    """A session OPEN at the end of batch 0 must be extended by batch 1
    through GroupState (one merged session), while a batch-1 event past
    the gap closes it and opens a new one — the deterministic miniature
    of the stream_sessionize gate."""
    import os

    from applications_analytics_midas_hbase_metrics_spark.streaming import (
        stateful as ST,
    )

    # user 1: batch0 ends t=100,160; batch1 continues 200 (same session),
    #         then 1000 (gap>300 -> new session)
    # user 2: lives entirely in batch0
    b0 = [(1, 100, 1.0), (1, 160, 2.0), (2, 50, 5.0)]
    b1 = [(1, 200, 4.0), (1, 1000, 8.0)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    import glob as _g
    import shutil

    for i, rows in enumerate((b0, b1)):
        tmp = str(tmp_path / f"tmp{i}")
        spark.createDataFrame(
            rows, "user_id long, t long, value double"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        dst = os.path.join(src, f"{i:02d}.parquet")
        shutil.move(_g.glob(tmp + "/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        ST.sessionize(stream, gap_seconds=300)
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    final = {
        (r.user_id, r.session_start): (r.n_events, r.value_sum)
        for r in spark.table("sess_test")
        .groupBy("user_id", "session_start")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("value_sum", "n_events").alias("value_sum"),
        )
        .collect()
    }
    assert final == {
        (1, 100): (3, 7.0),    # merged ACROSS the batch boundary
        (1, 1000): (1, 8.0),   # opened by the gap break in batch 1
        (2, 50): (1, 5.0),
    }


def test_stream_incremental_dedup_cross_batch_only(spark, tmp_path):
    """The store-growth contract: a batch-2 copy of a batch-1 doc is
    flagged (the store grew between batches); two copies INSIDE one
    batch are not flagged against each other (the store is read before
    it is appended); history dups are flagged from batch 0 on; and the
    signature store ends holding history + all batches."""
    import glob
    import os
    import shutil

    from applications_analytics_midas_hbase_metrics_spark.streaming import (
        dedup_stream as DS,
    )

    hist = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "completely different history text here")],
        ["doc_id", "text"],
    )
    batches = {
        0: [(10, "alpha beta gamma delta epsilon zeta"),   # exact dup of hist 1
            (11, "fresh unseen content number eleven ok"),
            (12, "twin text inside one single batch yes"),
            (13, "twin text inside one single batch yes")],  # intra-batch twin of 12
        1: [(20, "fresh unseen content number eleven ok"),   # exact dup of batch-0 doc 11
            (21, "another brand new document appears now")],
        2: [(30, "twin text inside one single batch yes")],  # dup of batch-0 twins
    }
    d = str(tmp_path)
    src_dir = os.path.join(d, "src")
    os.makedirs(src_dir)
    for k, rows in batches.items():
        tmp = os.path.join(d, f"tmp{k}")
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src_dir, f"b{k}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000_000 + 1000 * k,) * 2)
        shutil.rmtree(tmp)
    store = os.path.join(d, "store")
    DS.seed_signature_store(hist, store, num_hashes=32)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = DS.stream_incremental_dedup(
        stream, store, os.path.join(d, "verdicts"), os.path.join(d, "ckpt"),
        num_hashes=32, trigger_available_now=True,
    )
    assert q.awaitTermination(300)
    got = {
        r.doc_id: (r.verdict, r.ingest_batch)
        for r in spark.read.parquet(os.path.join(d, "verdicts")).collect()
    }
    assert got[10] == ("exact_dup", 0)         # vs history
    assert got[11][0] == "new"
    assert got[12][0] == "new" and got[13][0] == "new"  # intra-batch: unseen
    assert got[20] == ("exact_dup", 1)         # vs batch 0
    assert got[21][0] == "new"
    assert got[30] == ("exact_dup", 2)         # vs batch-0 twins
    # the store grew by every batch: 2 hist + 7 batch hash rows
    n_hashes = spark.read.parquet(os.path.join(store, "hashes")).count()
    assert n_hashes == 9


def test_stream_incremental_dedup_restart_idempotent(spark, tmp_path):
    """Exactly-once on the verdict log across restarts: re-starting the
    availableNow job on the SAME checkpoint with no new source files
    must add zero verdict rows and zero store rows; a new file after
    restart is processed exactly once against the grown store."""
    import glob
    import os
    import shutil

    from applications_analytics_midas_hbase_metrics_spark.streaming import (
        dedup_stream as DS,
    )

    hist = spark.createDataFrame(
        [(1, "history document first and only text")], ["doc_id", "text"]
    )
    d = str(tmp_path)
    src_dir = os.path.join(d, "src")
    os.makedirs(src_dir)

    def add_file(k, rows):
        tmp = os.path.join(d, f"tmp{k}")
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src_dir, f"b{k}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000_000 + 1000 * k,) * 2)
        shutil.rmtree(tmp)

    add_file(0, [(10, "history document first and only text"), (11, "something new")])
    store = os.path.join(d, "store")
    DS.seed_signature_store(hist, store, num_hashes=32)

    def run():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = DS.stream_incremental_dedup(
            stream, store, os.path.join(d, "verdicts"), os.path.join(d, "ckpt"),
            num_hashes=32, trigger_available_now=True,
        )
        assert q.awaitTermination(300)

    run()
    vd = os.path.join(d, "verdicts")
    assert spark.read.parquet(vd).count() == 2
    n_store = spark.read.parquet(os.path.join(store, "hashes")).count()
    run()  # restart, nothing new -> nothing re-processed
    assert spark.read.parquet(vd).count() == 2
    assert spark.read.parquet(os.path.join(store, "hashes")).count() == n_store
    add_file(1, [(20, "something new")])  # dup of doc 11 from batch 0
    run()
    got = {r.doc_id: r.verdict for r in spark.read.parquet(vd).collect()}
    assert len(got) == 3 and got[20] == "exact_dup"
