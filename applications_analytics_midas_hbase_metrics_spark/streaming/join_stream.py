"""Watermarked stream-stream interval join.

The reference engine (reference Utils.scala — batch joins only, J1-J4)
has no streaming join; this is part of the streaming extension surface:
correlating two live event streams (impression -> conversion, request
-> response, view -> click) within a bounded event-time lag is the
canonical stream-stream workload.

Scale shape: Spark's symmetric hash join keeps BOTH sides' state keyed
by the join key in the state store, partitioned by key across
executors.  The watermark plus the bounded time-range condition give
the state store a provable eviction rule — a left row is dropped once
no future right row can land inside ``(l_ts, l_ts + max_lag]`` given
the watermark, so state size is bounded by (key cardinality x lag
window x arrival rate), NOT by stream length.  Without the range
condition the state would grow without bound; this operator therefore
REQUIRES a finite ``max_lag_seconds``.

Exactness contract (what the differential gate relies on): for
in-event-time-order arrival (each micro-batch's minimum event time is
>= the previous watermark), the inner interval join emits exactly the
batch join's rows — eviction only ever removes left state older than
``watermark - max_lag``, which the range condition already excludes
from matching any future right row.  The gate feeds time-split files
(oldest first), so this holds by construction; out-of-order sources
trade completeness for the watermark bound exactly as documented by
Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_interval_join"]


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    max_lag_seconds: int,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` x ``right`` on ``key`` where
    ``right_ts in (left_ts, left_ts + max_lag_seconds]``.

    ``how="left_outer"`` additionally emits each unmatched left row
    (right columns null) once the watermark proves no future right row
    can match it — i.e. when the global watermark passes
    ``left_ts + max_lag``.  The emission is therefore DELAYED by
    design: an unmatched row near the head of the stream flushes as
    soon as the watermark moves past its window; one near the tail is
    withheld until later input advances the watermark (batch replay of
    the same data emits exactly the rows whose windows close strictly
    before ``min over sources(max event time) - watermark_delay`` —
    the rule the differential gate's oracle encodes).

    Both inputs may be streaming or batch frames (the same expression
    tree runs as a symmetric hash join under a stream, a broadcast/SMJ
    under batch — which is how the oracle twin replays it).  Column
    names other than ``key`` must be disjoint; ``left_ts``/``right_ts``
    must be timestamps.  Watermarks are applied to BOTH sides (required
    for state cleanup on each)."""
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(f"non-key column overlap: {sorted(overlap)}")
    if "_rkey" in left.columns or "_rkey" in right.columns:
        raise ValueError("'_rkey' is reserved by stream_interval_join")
    l = left
    r = right.withColumnRenamed(key, "_rkey")
    if left.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if right.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    cond = (
        (F.col(key) == F.col("_rkey"))
        & (F.col(right_ts) > F.col(left_ts))
        & (
            F.col(right_ts)
            <= F.col(left_ts)
            + F.expr(f"INTERVAL {int(max_lag_seconds)} SECONDS")
        )
    )
    return l.join(r, cond, how).drop("_rkey")
