"""Time-series regularization: dense-bucket gap-fill with forward fill
(extension tier — the resample/ffill operation metric pipelines apply
before rate comparisons and joins against regular series; no reference
counterpart, but it generalizes the reference's windowed metric rollups
to gapped inputs).

Scale design (100 TB of events): the observed frame aggregates to one
row per (key, bucket) FIRST — map-side combinable, so raw event volume
never reaches the spine join — and the spine is generated per key from
its (min, max) bucket pair, so spine width is data-dependent, not a
global calendar cross join.  The forward fill is one window per key
ordered by bucket; partitioning is by series key, so a key's whole
spine must fit a partition — true for any per-user/per-device series
(bounded buckets/key), while a single global series at nanosecond
buckets would instead use the two-phase prefix propagation
sequence_packing ships (operators/packing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_forward(
    obs: DataFrame,
    *,
    key_col: str,
    bucket_col: str,
    value_col: str,
    count_col: str | None = None,
) -> DataFrame:
    """Densify ``obs`` (one row per (key, integer bucket)) to every
    bucket in each key's [min, max] range and forward-fill the value.

    Returns one row per (key, bucket) with the observation count
    (0 on generated gap rows, column ``n_obs`` unless ``count_col``
    names an existing count) and ``<value_col>_filled`` — the most
    recent observed value at or before the bucket.  The first bucket
    per key is observed by construction, so the filled column is never
    null."""
    bounds = obs.groupBy(key_col).agg(
        F.min(bucket_col).alias("_mn"), F.max(bucket_col).alias("_mx")
    )
    spine = bounds.select(
        key_col,
        F.explode(F.sequence(F.col("_mn"), F.col("_mx"))).alias(bucket_col),
    )
    if count_col is None:
        count_col = "n_obs"
        obs = obs.withColumn(count_col, F.lit(1).cast("bigint"))
    joined = spine.join(obs, [key_col, bucket_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        bucket_col,
        F.coalesce(F.col(count_col), F.lit(0)).cast("bigint").alias(count_col),
        F.last(value_col, ignorenulls=True)
        .over(w)
        .alias(f"{value_col}_filled"),
    )


def debounce_bursts(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: float,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse bursts: consecutive rows of the same key closer than
    ``gap_seconds`` apart form one burst (gaps-and-islands); returns one
    row per burst with its start time and size — the debounce pass
    telemetry pipelines apply to retry storms and double-clicks before
    rate metrics.

    One window pass computes the island boundaries (lag + running sum of
    boundary flags), one per-key-burst aggregate emits the result; both
    partition by the series key, so no global sort and no driver state.
    ``order_cols`` breaks timestamp ties deterministically (defaults to
    the timestamp alone)."""
    order = [ts_col] + list(order_cols or [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    sec = F.col(ts_col).cast("double")
    start = (
        F.lag(sec).over(w).isNull()
        | ((sec - F.lag(sec).over(w)) > float(gap_seconds))
    ).cast("bigint")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = df.withColumn("_island", F.sum(start).over(wsum))
    return islands.groupBy(*key_cols, "_island").agg(
        F.min(ts_col).alias("burst_start"),
        F.max(ts_col).alias("burst_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    ).drop("_island")


def ewma_smooth(
    df: DataFrame,
    key_col: str = "user_id",
    order_col: str = "hour",
    value_cents: str = "xq",
    window_rows: int = 12,
) -> DataFrame:
    """Exponentially-weighted moving average (decay 1/2 per step) over
    the trailing ``window_rows`` observations of each key's series —
    the smoothing pass a monitoring/trend pipeline runs before
    thresholding, as the time-DECAY sibling of the uniform sliding
    window (window_sliding) and the z-score detector
    (hourly_anomalies).

    ``ewma_t = (sum over lag l of x_{t-l} * 2^-l) / (sum of 2^-l)``.

    Determinism is the design: inputs arrive as integer CENTS
    (``value_cents``), the dyadic weights are exact powers of two, and
    both sums run in bigint via one indexed-lambda fold over the
    frame-ordered value list — so the only floating-point op is the
    final division, identical in any engine and any partitioning.  A
    float-weighted formulation (pow(0.5, l) * x summed as doubles)
    would be partial-aggregation-order-dependent and could never hash
    against an oracle.

    Scale shape: ONE window per key (rows-frame, no range scan), the
    fold is a JVM higher-order function over <= window_rows elements —
    map-side after the window sort, no extra shuffle, no UDF.

    Returns the input columns plus (n_obs, ewma).

    Overflow bound: the numerator multiplies each value by up to
    ``2^(window_rows-1)`` in bigint (Java long WRAPS silently on
    overflow — no error).  The window is therefore capped at 40, which
    keeps the weighted sum exact for |value_cents| up to ~2^22 per
    observation (~$42k in cents) with 2^63 headroom for the fold —
    realistic cent magnitudes.  The previous [1, 62] advertisement was
    unsafe: at 62, |value| >= 5 already wrapped."""
    if not (1 <= window_rows <= 40):
        raise ValueError(
            "window_rows must be in [1, 40]: the dyadic weights shift "
            "values left by up to window_rows-1 bits in bigint, and "
            "beyond 40 realistic cent magnitudes silently wrap"
        )
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    vals = F.collect_list(value_cents).over(w)
    r = window_rows
    num = F.expr(
        f"aggregate(transform(_vals, (x, i) -> x * shiftleft(1L,"
        f" {r} - size(_vals) + i)), 0L, (a, b) -> a + b)"
    )
    den = (
        F.expr(f"shiftleft(1L, {r}) - shiftleft(1L, {r} - size(_vals))")
    ).cast("double") * 100.0
    return (
        df.withColumn("_vals", vals)
        .withColumn("n_obs", F.size("_vals").cast("bigint"))
        .withColumn("ewma", F.round(num.cast("double") / den, 6))
        .drop("_vals")
    )
