"""Join operators Spark lacks natively — the custom-operator tier of the
task brief (as-of join) plus the skew-handling aggregation pattern.

Both are compositions of existing DataFrame ops (no UDFs): the as-of
join is the union+ordered-window "piecewise last" construction; the
salted aggregation is the classic two-phase combine for skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    how: str = "left",
) -> DataFrame:
    """As-of (backward) join: for every left row, attach the payload of
    the right row with the greatest ``right_ts <= left_ts`` within the
    same ``on`` key (DuckDB ``ASOF LEFT JOIN`` semantics; equal
    timestamps match).

    Plan shape: tag + union + one window (sort within key) + filter —
    a single shuffle on the key, no range cross-join blowup.  At 100 TB
    both inputs shuffle once on the join key; the window sort is local
    per partition.  ``how='inner'`` drops unmatched left rows.
    """
    on = list(on)
    payload = list(right_payload) or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_payload",
        F.lit(None).cast(
            right.select(F.struct(*payload).alias("s")).schema["s"].dataType
        ),
    ).withColumn("_is_right", F.lit(0))
    r_tagged = (
        right.select(
            *on,
            F.col(right_ts).alias("_ts"),
            F.struct(*payload).alias("_payload"),
        )
        .withColumn("_is_right", F.lit(1))
    )
    l_cols = [c for c in left.columns]
    everything = l_tagged.select(
        *on,
        "_ts",
        "_is_right",
        "_payload",
        *[F.col(c) for c in l_cols if c not in on],
    ).unionByName(r_tagged, allowMissingColumns=True)

    # right rows sort before left rows at equal _ts so ties match (<=)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = everything.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = matched.filter(F.col("_is_right") == 0).select(
        *on,
        *[F.col(c) for c in l_cols if c not in on],
        *[F.col("_match").getField(p).alias(f"right_{p}") for p in payload],
        F.when(F.col("_match").isNotNull(), True).otherwise(False).alias("_matched"),
    )
    if how == "inner":
        out = out.filter(F.col("_matched"))
    return out.drop("_matched")


#: phase-1 aggregate and phase-2 combiner per decomposable kind
_AGG_KINDS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "max": (F.max, F.max),
    "min": (F.min, F.min),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    salt_col: Column | None = None,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups on (keys + deterministic salt) so one hot key spreads
    over ``buckets`` reducers; phase 2 combines the partials.  ``aggs``
    maps output name → (kind, column) with kind one of sum/count/max/min
    (the decomposable aggregates).

    Results are identical to a plain groupBy — this exists so a hot key
    never lands on a single reducer.  (Spark's AQE skew handling covers
    joins; aggregation skew still needs the manual pattern.)
    """
    keys = list(keys)
    if salt_col is None:
        # deterministic per-row spread without rand(): hash every column
        salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    phase1_aggs = []
    for name, (kind, col) in aggs.items():
        p1, _ = _AGG_KINDS[kind]
        phase1_aggs.append(p1(col).alias(f"_p_{name}"))
    phase1 = df.withColumn("_salt", salt_col).groupBy(*keys, "_salt").agg(*phase1_aggs)
    phase2_aggs = []
    for name, (kind, _col) in aggs.items():
        _, p2 = _AGG_KINDS[kind]
        phase2_aggs.append(p2(F.col(f"_p_{name}")).alias(name))
    return phase1.groupBy(*keys).agg(*phase2_aggs)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str,
    lo_col: str,
    hi_col: str,
    bucket: int = 3600,
) -> DataFrame:
    """Range (interval containment) join: every (point, interval) pair
    with ``lo <= t <= hi``, as an EQUI-join Spark can shuffle-partition
    — the native formulation (a theta join) falls back to
    BroadcastNestedLoopJoin or a cartesian product, both scale-killers
    once neither side broadcasts.

    The bucket trick: intervals explode into every ``bucket``-width
    time slot they touch (``sequence(lo div B, hi div B)``); a point
    lands in exactly ONE slot, so the slot equi-join emits each
    qualifying pair exactly once (no dedup pass) and the residual
    ``BETWEEN`` filter runs post-join on slot-co-located rows only.
    Shuffle width is |points| + Σ(interval spans / B) rows of narrow
    keys.

    Pick ``bucket`` near the MEDIAN interval length: too small
    multiplies the interval-side explosion, too large funnels many
    intervals into few slots (a hot slot is AQE-skew-splittable, since
    the join is a plain hash join).  Columns of ``points`` and
    ``intervals`` must not collide (select/alias first — the usual
    pre-join discipline)."""
    p = points.withColumn("_slot", F.floor(F.col(t_col) / bucket))
    iv = intervals.withColumn(
        "_slot",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket), F.floor(F.col(hi_col) / bucket)
            )
        ),
    )
    return (
        p.join(iv, "_slot")
        .filter((F.col(t_col) >= F.col(lo_col)) & (F.col(t_col) <= F.col(hi_col)))
        .drop("_slot")
    )
