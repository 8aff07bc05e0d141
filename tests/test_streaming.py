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
