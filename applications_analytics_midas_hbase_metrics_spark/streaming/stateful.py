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


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

#: State: the user's OPEN session — (start, last_t, n, sum).
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last_t", LongType()),
        StructField("n", LongType()),
        StructField("s", DoubleType()),
    ]
)


def _sessionize_update(gap: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        # arrival order within a batch is shuffle order — sort by event
        # time; cross-batch order is the SOURCE's contract (time-split
        # files), exactly like any watermark-ordered session stream
        rows = rows.sort_values("t")
        if state.exists:
            start, last_t, n, s = state.get
        else:
            start = last_t = None
            n, s = 0, 0.0
        out = []
        for t, v in zip(rows["t"].to_numpy(), rows["value"].to_numpy()):
            t = int(t)
            if last_t is not None and t - last_t > gap:
                out.append((user_id, start, n, s))  # closed: final row
                start, n, s = t, 0, 0.0
            if start is None:
                start = t
            last_t = t
            n += 1
            s += float(v)
        state.update((int(start), int(last_t), int(n), float(s)))
        # the still-open session emits provisionally; a later batch that
        # extends it re-emits the same (user, start) with larger n — the
        # reader keeps the max-n version per key (same convergence trick
        # as running_user_totals)
        out.append((user_id, start, n, s))
        yield pd.DataFrame(
            out, columns=["user_id", "session_start", "n_events", "value_sum"]
        )

    return update


def sessionize(stream: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization with explicit cross-batch state: events
    more than ``gap_seconds`` apart start a new session per user; the
    OPEN session (start, last_t, count, sum) carries in GroupState
    across micro-batches — the custom stateful operator a built-in
    session window cannot express when you need provisional emission
    plus custom per-session accumulators.  Input: (user_id, t
    epoch-seconds, value).  Emits closed sessions as final rows and the
    open session provisionally each batch; group the sink by
    (user_id, session_start) keeping the max-n_events row to converge.
    State is O(1) per active user, same as running_user_totals."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_update(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
