"""Stream-stream interval join: cross-batch state retention, batch
equivalence, and input validation."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from applications_analytics_midas_hbase_metrics_spark.streaming.join_stream import (
    stream_interval_join,
)

_MID = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m, 0)


# (id, user, ts): one cross-batch pair (view 10:00 -> click 13:30), one
# same-batch-1 pair (10:00 -> 10:30), one same-batch-2 pair (13:00 ->
# 13:10), a click BEFORE its view (9:00) and one beyond the 6 h lag
# (20:00) — both excluded.
_VIEWS = [(1, 100, _ts(10)), (2, 200, _ts(13))]
_CLICKS = [
    (11, 100, _ts(10, 30)),
    (12, 100, _ts(13, 30)),
    (13, 200, _ts(13, 10)),
    (14, 100, _ts(9)),
    (15, 100, _ts(20)),
]
_EXPECT = {(1, 11), (1, 12), (2, 13)}  # (view_id, click_id)


def _two_file_source(spark, rows, cols, ts_col, out_dir) -> str:
    """Write rows time-split at _MID into two parquet files with mtimes
    forcing oldest-first pickup (the same arrival contract the gated
    query builds)."""
    df = spark.createDataFrame(rows, cols)
    os.makedirs(out_dir)
    for i, part in enumerate(
        (df.filter(F.col(ts_col) < _MID), df.filter(F.col(ts_col) >= _MID))
    ):
        tmp = os.path.join(out_dir, f"_tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(out_dir, f"{i:02d}.parquet")
        shutil.move(src, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return out_dir


def _run_streamed(spark, vsrc, csrc, watermark="1 hour"):
    sv = (
        spark.readStream.schema(spark.read.parquet(vsrc).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(vsrc)
    )
    sc = (
        spark.readStream.schema(spark.read.parquet(csrc).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(csrc)
    )
    joined = stream_interval_join(
        sv,
        sc,
        key="user_id",
        left_ts="v_ts",
        right_ts="c_ts",
        max_lag_seconds=6 * 3600,
        watermark=watermark,
    )
    sink = f"tssj_{uuid.uuid4().hex[:10]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    return spark.table(sink)


@pytest.fixture(scope="module")
def sources(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ssj"))
    vsrc = _two_file_source(
        spark, _VIEWS, "view_id long, user_id long, v_ts timestamp",
        "v_ts", os.path.join(root, "views"),
    )
    csrc = _two_file_source(
        spark, _CLICKS, "click_id long, user_id long, c_ts timestamp",
        "c_ts", os.path.join(root, "clicks"),
    )
    return vsrc, csrc


def test_cross_batch_pair_survives_state_store(spark, sources):
    """The batch-1 view (10:00) must still be in the join state when its
    batch-2 click (13:30) arrives — and the 1 h watermark's eviction
    must not have dropped it."""
    out = _run_streamed(spark, *sources)
    got = {(r.view_id, r.click_id) for r in out.collect()}  # driver-ok: 3 rows
    assert got == _EXPECT
    # the pair that proves cross-batch retention is present specifically
    assert (1, 12) in got


def test_streamed_equals_batch_twin(spark, sources):
    """Same operator, batch frames: the streamed result must equal the
    batch interval join row-for-row (the exactness contract the
    differential gate relies on)."""
    vsrc, csrc = sources
    out = _run_streamed(spark, vsrc, csrc)
    batch = stream_interval_join(
        spark.read.parquet(vsrc),
        spark.read.parquet(csrc),
        key="user_id",
        left_ts="v_ts",
        right_ts="c_ts",
        max_lag_seconds=6 * 3600,
    )
    key = lambda r: (r.view_id, r.click_id, r.user_id)  # noqa: E731
    assert sorted(map(key, out.collect())) == sorted(  # driver-ok: 3 rows
        map(key, batch.collect())  # driver-ok: 3 rows
    )


def test_overlapping_non_key_columns_rejected(spark):
    a = spark.createDataFrame([(1, _ts(10), 1.0)], "user_id long, ts timestamp, value double")
    b = spark.createDataFrame([(1, _ts(11), 2.0)], "user_id long, ts timestamp, value double")
    with pytest.raises(ValueError, match="non-key column overlap"):
        stream_interval_join(
            a, b, key="user_id", left_ts="ts", right_ts="ts",
            max_lag_seconds=60,
        )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_streamed_equals_batch_on_random_fixture(spark, tmp_path, seed):
    """Randomized equivalence: random users/timestamps around the split
    plus crafted boundary rows (ts == mid on both sides; lag exactly at
    the <= 6 h edge; c_ts == v_ts, excluded by the strict >) — the
    streamed interval join must equal the batch twin row-for-row."""
    import random

    rng = random.Random(seed)
    day = dt.datetime(2024, 1, 1)

    def rts():
        return day + dt.timedelta(seconds=rng.randrange(0, 86_400))

    views = [(i, rng.randrange(1, 5), rts()) for i in range(40)]
    clicks = [(100 + i, rng.randrange(1, 5), rts()) for i in range(60)]
    # boundary rows: both exactly at the split; a pair exactly 6 h
    # apart (included by <=); a pair at zero lag (excluded by >)
    views += [(90, 9, _MID), (91, 9, _MID - dt.timedelta(hours=6))]
    clicks += [(190, 9, _MID), (191, 9, _MID + dt.timedelta(hours=1))]
    root = str(tmp_path)
    vsrc = _two_file_source(
        spark, views, "view_id long, user_id long, v_ts timestamp",
        "v_ts", os.path.join(root, "v"),
    )
    csrc = _two_file_source(
        spark, clicks, "click_id long, user_id long, c_ts timestamp",
        "c_ts", os.path.join(root, "c"),
    )
    out = _run_streamed(spark, vsrc, csrc)
    batch = stream_interval_join(
        spark.read.parquet(vsrc),
        spark.read.parquet(csrc),
        key="user_id", left_ts="v_ts", right_ts="c_ts",
        max_lag_seconds=6 * 3600,
    )
    key = lambda r: (r.view_id, r.click_id)  # noqa: E731
    got = sorted(map(key, out.collect()))  # driver-ok: bounded fixture
    want = sorted(map(key, batch.collect()))  # driver-ok: bounded fixture
    assert got == want
    # the crafted rows: view@mid-6h matches click@mid exactly at the
    # lag edge; view@mid matches neither (c>v strict vs click@mid,
    # click@mid+1h is a genuine cross-batch... same-batch-2 match)
    assert (91, 190) in got
    assert (90, 190) not in got
    assert (90, 191) in got


def test_left_outer_emits_only_watermark_closed_unmatched(spark, tmp_path):
    """Outer semantics on a crafted boundary: an unmatched view whose
    6 h window the final watermark has closed emits with a null click;
    an unmatched view near the stream tail stays WITHHELD (its window
    could still be matched by future input); matches emit as usual."""
    views = [(1, 7, _ts(0)), (2, 7, _ts(8)), (3, 7, _ts(22))]
    clicks = [(11, 7, _ts(10, 30)), (12, 7, _ts(10))]
    root = str(tmp_path)
    vsrc = _two_file_source(
        spark, views, "view_id long, user_id long, v_ts timestamp",
        "v_ts", os.path.join(root, "v"),
    )
    csrc = _two_file_source(
        spark, clicks, "click_id long, user_id long, c_ts timestamp",
        "c_ts", os.path.join(root, "c"),
    )
    sv = (
        spark.readStream.schema(spark.read.parquet(vsrc).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(vsrc)
    )
    sc = (
        spark.readStream.schema(spark.read.parquet(csrc).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(csrc)
    )
    joined = stream_interval_join(
        sv, sc, key="user_id", left_ts="v_ts", right_ts="c_ts",
        max_lag_seconds=6 * 3600, watermark="1 hour", how="left_outer",
    )
    sink = f"tlo_{uuid.uuid4().hex[:10]}"
    q = (
        joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.view_id, r.click_id)
        for r in spark.table(sink).collect()  # driver-ok: 3-row fixture
    }
    # final watermark = min(max v_ts, max c_ts) - 1h = 9:30:
    # view 1 (0:00): window closed at 6:00 < 9:30 -> (1, None)
    # view 2 (8:00): matched by both clicks
    # view 3 (22:00): unmatched but window open until 28:00 -> withheld
    assert got == {(1, None), (2, 11), (2, 12)}


def test_invalid_how_rejected(spark):
    a = spark.createDataFrame([(1, _ts(10))], "user_id long, a_ts timestamp")
    b = spark.createDataFrame([(1, _ts(11))], "user_id long, b_ts timestamp")
    with pytest.raises(ValueError, match="how must be"):
        stream_interval_join(
            a, b, key="user_id", left_ts="a_ts", right_ts="b_ts",
            max_lag_seconds=60, how="full_outer",
        )
