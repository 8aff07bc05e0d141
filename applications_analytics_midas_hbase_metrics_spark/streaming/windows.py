"""Event-stream operators over the ``events`` table: tumbling, sliding,
and session windows, with batch and Structured Streaming entry points
(SURVEY.md §2.6 note / §7 phase 7).

The reference declares a spark-streaming dependency but has no streaming
code (build.sbt:25-28); this module is the extension surface.  The same
window expressions drive both ``spark.read`` (oracle-checkable batch)
and ``spark.readStream`` (watermarked incremental) — one definition, two
execution modes, which is exactly how Structured Streaming is meant to
be used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tumbling_counts(
    events: DataFrame,
    width: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(window, event_type) count + value sum over tumbling windows.
    Decimal-exact sum cast to double at the end (hash-stable)."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), width).alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "value_sum"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window event counts (each event lands in width/slide
    windows)."""
    return (
        events.groupBy(F.window(F.col(ts_col), width, slide).alias("w"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_aggregate(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity.  Batch mode uses the session_window expression (same one
    streaming uses), producing (user_id, session_start, n_events,
    value_sum)."""
    return (
        events.groupBy(
            F.col(key_col), F.session_window(F.col(ts_col), gap).alias("w")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "value_sum"
            ),
        )
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            "n_events",
            "value_sum",
        )
    )


def user_activity_features(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Per-user analytic-window features: event count, first/last event
    gap, average inter-event gap in seconds — the window-function surface
    (lag over event-time)."""
    w = Window.partitionBy("user_id").orderBy(F.col(ts_col))
    gaps = events.withColumn(
        "gap_s",
        F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w).cast("double"),
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.avg("gap_s"), 6).alias("avg_gap_s"),
            F.round(
                F.max(F.col(ts_col)).cast("double")
                - F.min(F.col(ts_col)).cast("double"),
                6,
            ).alias("active_span_s"),
        )
    )


def stream_tumbling_counts(
    stream: DataFrame,
    width: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming variant: watermarked tumbling aggregation.  Late rows
    beyond ``watermark`` are dropped; state for closed windows is
    reclaimed — the piece that makes this run forever at 100 TB/day."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), width).alias("w"), F.col("event_type"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
