"""Sequence-packing operator: the distributed prefix sum must equal the
single-window formulation exactly, and pack assignment must satisfy the
concat-and-chunk invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from applications_analytics_midas_hbase_metrics_spark.operators import packing as P


def test_global_prefix_sum_matches_window(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(1, 501)]
    df = spark.createDataFrame(rows, ["k", "v"]).repartition(8)
    got = {
        r.k: r.cum
        for r in P.global_prefix_sum(df, "v", "k", num_partitions=6).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {r.k: r.cum for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == want


def test_assign_packs_invariants(spark):
    rows = [(i, (i * 13) % 40 + 1) for i in range(1, 301)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    packed = P.assign_packs(df, budget=100).collect()
    by_id = sorted(packed, key=lambda r: r.doc_id)
    cum = 0
    for r in by_id:
        # pack = chunk the doc STARTS in; offset = position inside it
        assert r.pack_id == cum // 100, r
        assert r.pack_offset == cum % 100, r
        cum += r.n_tokens
        assert r.cum_tokens == cum, r
    # monotone pack ids in doc order, no gaps
    ids = [r.pack_id for r in by_id]
    assert ids == sorted(ids)
    assert set(range(max(ids) + 1)) == set(ids)


def test_pack_summary_conserves_tokens(spark):
    rows = [(i, (i * 7) % 25 + 1) for i in range(1, 201)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    packed = P.assign_packs(df, budget=64)
    summary = P.pack_summary(packed)
    total = summary.agg(
        F.sum("pack_tokens").alias("t"), F.sum("n_docs").alias("d")
    ).collect()[0]
    assert total.t == sum(v for _, v in rows)
    assert total.d == len(rows)


def test_prefix_sum_plan_has_no_global_window(spark):
    """The scale property itself: no single-partition exchange feeds the
    running-sum window (a global ORDER BY window would show
    Exchange SinglePartition -> Window)."""
    rows = [(i, i % 5 + 1) for i in range(1, 201)]
    df = spark.createDataFrame(rows, ["k", "v"]).repartition(8)
    out = P.global_prefix_sum(df, "v", "k", num_partitions=6)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # the only SinglePartition exchange allowed is for the tiny
    # per-partition offsets frame (feeds its own Window over |parts| rows)
    windows = plan.count("Window")
    assert windows >= 1
    main_window_single = re.search(
        r"Exchange SinglePartition[^\n]*\n[^\n]*Sort[^\n]*\n[^\n]*_local",
        plan,
    )
    assert main_window_single is None, plan


def test_emit_packed_chunks_invariants(spark):
    # mix of tiny docs, exact-budget docs, and docs spanning 2+ packs
    rows = [(i, [3, 100, 250, 1, 97][i % 5] + (i % 7)) for i in range(1, 121)]
    rows.append((121, 0))  # zero-token doc: must emit no chunks
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    B = 100
    packed = P.assign_packs(df, budget=B)
    chunks = P.emit_packed_chunks(packed, budget=B).collect()

    # 1. zero-token docs emit nothing
    assert all(r.doc_id != 121 for r in chunks)
    # 2. per-document: chunk_idx contiguous from 0, chunk_len sums to
    #    n_tokens, doc_start is the running chunk_len prefix
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    tokens = dict(rows)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rs] == list(range(len(rs)))
        assert sum(r.chunk_len for r in rs) == tokens[doc_id]
        start = 0
        for r in rs:
            assert r.doc_start == start, r
            # continuation chunks start exactly at their pack's head
            if r.chunk_idx > 0:
                assert r.pack_offset == 0, r
            start += r.chunk_len
        # consecutive chunks land in consecutive packs
        assert [r.pack_id for r in rs] == list(
            range(rs[0].pack_id, rs[0].pack_id + len(rs))
        )
    # 3. per-pack: every non-tail pack holds EXACTLY the budget, chunks
    #    tile the pack with no overlap (offset+len boundaries meet)
    by_pack: dict[int, list] = {}
    for r in chunks:
        by_pack.setdefault(r.pack_id, []).append(r)
    last_pack = max(by_pack)
    for pack_id, rs in by_pack.items():
        rs.sort(key=lambda r: r.pack_offset)
        pos = 0
        for r in rs:
            assert r.pack_offset == pos, (pack_id, r)
            pos += r.chunk_len
        if pack_id != last_pack:
            assert pos == B, (pack_id, pos)


def test_emit_packed_chunks_adds_no_shuffle(spark):
    """Chunk emission is map-side arithmetic + explode over the prefix
    sum — the chunked plan must have exactly as many exchanges as the
    pack assignment it consumes."""
    rows = [(i, i % 250 + 1) for i in range(1, 201)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"]).repartition(4)
    packed = P.assign_packs(df, budget=100)
    packed.collect()  # execute both so AQE finalizes both plan strings
    base = packed._jdf.queryExecution().executedPlan().toString()
    chunked = P.emit_packed_chunks(packed, budget=100)
    chunked.collect()
    got = chunked._jdf.queryExecution().executedPlan().toString()
    assert got.count("Exchange") == base.count("Exchange"), got


def test_length_bucket_stats_integer_caps(spark):
    """Bucket caps are exact powers of two from integer bit math:
    boundary values (0, 1, 2, powers of two, one past) land in the
    right bucket, and padding/waste are hand-checkable."""
    rows = [(i, n) for i, n in enumerate([0, 1, 2, 3, 4, 5, 8, 9, 16, 17])]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    got = {
        r.bucket_cap: (r.n_docs, r.sum_tokens, r.padding, r.waste_frac)
        for r in P.length_bucket_stats(df).collect()
    }
    assert got == {
        1: (2, 1, 1, 0.5),          # n=0,1
        2: (1, 2, 0, 0.0),          # n=2
        4: (2, 7, 1, 0.125),        # n=3,4
        8: (2, 13, 3, 0.1875),      # n=5,8
        16: (2, 25, 7, 0.21875),    # n=9,16
        32: (1, 17, 15, 0.46875),   # n=17
    }
