"""Custom stateful streaming operators via ``applyInPandasWithState`` —
the arbitrary-state tier of Structured Streaming (task brief: custom
stateful operators).

Two operators:
  * running_user_totals — per-key running aggregates that survive across
    micro-batches (the canonical GroupState pattern).
  * stream_dedupe — exact streaming dedup with watermark-bounded state
    (built-in dropDuplicates, included for surface completeness).

State is per-key and bounded: totals keep O(1) per user; dedup state is
reclaimed by the watermark.  Both run with availableNow for batch parity
testing (tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # This function runs once per (group, micro-batch) — at realistic
    # active-user counts the per-call constant dominates the job, so it
    # stays allocation-lean: numpy-backed sum, one single-row frame out.
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].to_numpy().sum())
    state.update((int(n), float(total)))
    yield pd.DataFrame(
        {"user_id": (user_id,), "n_events": (n,), "value_sum": (total,)}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in GroupState —
    each micro-batch emits the updated totals for users seen in it.
    State is O(1) per user; at 100 TB/day the state store holds one
    small tuple per active user and the shuffle is on user_id only."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedupe(
    stream: DataFrame, key: str = "event_id", watermark: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Exact streaming dedup on ``key`` ALONE — two events with the same
    key but different event times are still duplicates.  Uses
    ``dropDuplicatesWithinWatermark`` so state holds one entry per key
    inside the watermark horizon and is reclaimed beyond it (plain
    ``dropDuplicates([key])`` would grow state forever; adding ``ts`` to
    the key set would only dedup exact (key, ts) pairs)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key]
    )
