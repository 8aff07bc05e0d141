"""Signature-store compaction: verdict identity across the rewrite,
replay-duplicate folding, bounded file counts, and swap atomicity
artifacts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from applications_analytics_midas_hbase_metrics_spark.streaming.dedup_stream import (
    _prepared,
    classify_against_store,
    compact_signature_store,
    seed_signature_store,
)
from tests.conftest import load

_NH = 96


def _append_batch(df, store: str) -> None:
    """The two store appends a processed micro-batch performs."""
    df.select(
        F.col("doc_id").cast("bigint").alias("id"),
        F.sha2(F.col("text"), 256).alias("sha"),
    ).write.mode("append").parquet(os.path.join(store, "hashes"))
    from applications_analytics_midas_hbase_metrics_spark.operators import (
        dedup as D,
    )

    D.minhash_signature_frame(_prepared(df), _NH).write.mode(
        "append"
    ).parquet(os.path.join(store, "sigs"))


def _probe(spark, docs):
    """One guaranteed exact_dup, one near_dup (70% prefix), one new."""
    seeded = docs.orderBy("doc_id").limit(2).collect()  # driver-ok: 2-row fixture
    rows = [
        (900001, seeded[0].text),
        (900002, seeded[1].text[: int(len(seeded[1].text) * 0.7)]),
        (900003, "zq xv qj zzz unseen gibberish tokens qqq www eee rrr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _verdicts(spark, store, probe):
    out = classify_against_store(
        probe,
        spark.read.parquet(os.path.join(store, "hashes")),
        spark.read.parquet(os.path.join(store, "sigs")),
        num_hashes=_NH,
    )
    return sorted(
        (r.doc_id, r.verdict) for r in out.collect()  # driver-ok: 3-row probe
    )


@pytest.fixture(scope="module")
def compacted(spark, sf_dir, tmp_path_factory):
    """Seeded store + 3 batch appends + one REPLAYED append (batch 0
    appended twice — the sanctioned exactly-once recovery artifact),
    probed before AND after compaction."""
    store = str(tmp_path_factory.mktemp("sigstore"))
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    seed_signature_store(docs, store, num_hashes=_NH)
    for b in range(3):
        batch = docs.filter(F.col("doc_id") % 7 == b).select(
            (F.col("doc_id") + 10_000 * (b + 1)).alias("doc_id"), "text"
        )
        _append_batch(batch, store)
        if b == 0:
            _append_batch(batch, store)  # replay
    probe = _probe(spark, docs)
    before = _verdicts(spark, store, probe)
    n_unique_h = (
        spark.read.parquet(os.path.join(store, "hashes"))
        .dropDuplicates(["id", "sha"])
        .count()
    )
    stats = compact_signature_store(spark, store, files_per_table=4)
    after = _verdicts(spark, store, probe)
    return store, before, after, stats, n_unique_h


def test_probe_labels_and_verdict_identity(compacted):
    _, before, after, _, _ = compacted
    assert [v for _, v in before] == ["exact_dup", "near_dup", "new"]
    assert after == before


def test_file_bounds_and_swap_clean(compacted):
    store, _, _, stats, _ = compacted
    for table in ("hashes", "sigs"):
        assert stats[table]["files_after"] <= 4
        assert stats[table]["files_after"] < stats[table]["files_before"]
        assert not os.path.exists(os.path.join(store, table + ".tmp"))
        assert not os.path.exists(os.path.join(store, table + ".old"))


def test_replay_duplicates_folded(spark, compacted):
    """Compaction must fold the replayed append: unique rows only, and
    the row count matches the pre-compaction distinct count."""
    store, _, _, stats, n_unique_h = compacted
    assert stats["hashes"]["rows"] == n_unique_h
    for table, keys in (("hashes", ["id", "sha"]), ("sigs", ["id"])):
        df = spark.read.parquet(os.path.join(store, table))
        assert df.count() == df.dropDuplicates(keys).count(), table


def test_recover_signature_store_all_crash_states(spark, tmp_path):
    """Simulate every state the swap window can leave and verify the
    idempotent resolutions — including verdict equivalence after a
    mid-swap restore (the pre-compaction store answers identically)."""
    from applications_analytics_midas_hbase_metrics_spark.streaming.dedup_stream import (
        recover_signature_store,
    )
    from tests.conftest import SF_SMOKE

    store = str(tmp_path / "store")
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    seed_signature_store(docs, store, num_hashes=_NH)
    probe = _probe(spark, docs)
    healthy = _verdicts(spark, store, probe)

    # state 1: residue next to a healthy table
    os.makedirs(os.path.join(store, "hashes.tmp"))
    os.makedirs(os.path.join(store, "sigs.old"))
    acts = recover_signature_store(store)
    assert acts == {"hashes": "residue_cleared", "sigs": "residue_cleared"}
    assert not os.path.exists(os.path.join(store, "hashes.tmp"))
    assert not os.path.exists(os.path.join(store, "sigs.old"))

    # state 2: crashed between renames — table gone, .old holds the data
    os.rename(os.path.join(store, "hashes"), os.path.join(store, "hashes.old"))
    acts = recover_signature_store(store)
    assert acts["hashes"] == "restored_pre_compaction"
    assert acts["sigs"] == "ok"
    spark.catalog.refreshByPath(os.path.join(store, "hashes"))
    assert _verdicts(spark, store, probe) == healthy

    # state 3: only a fully-written tmp remains
    os.rename(os.path.join(store, "sigs"), os.path.join(store, "sigs.tmp"))
    acts = recover_signature_store(store)
    assert acts["sigs"] == "promoted_tmp"
    spark.catalog.refreshByPath(os.path.join(store, "sigs"))
    assert _verdicts(spark, store, probe) == healthy

    # idempotent on a healthy store
    assert recover_signature_store(store) == {"hashes": "ok", "sigs": "ok"}


def test_shingle_store_compaction_verdict_identity(spark, tmp_path):
    """The shingle-key store compaction folds replay duplicates into a
    bounded per-bucket layout while the incremental cut's verdicts stay
    byte-identical — the semi join is set-semantics, so compaction is
    pure space reclamation (the signature-store contract, applied to
    the ExactSubstr artifact)."""
    import os

    from applications_analytics_midas_hbase_metrics_spark.operators import text as T
    from applications_analytics_midas_hbase_metrics_spark.streaming.dedup_stream import (
        compact_shingle_store,
    )
    from pyspark.sql import functions as F

    history = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff"), (2, "gg hh ii jj kk")], ["doc_id", "text"]
    )
    store = str(tmp_path / "store")
    keys = T.substring_shingle_keys(history, k=3).withColumn(
        "sh_bucket", F.pmod(F.xxhash64("_sh"), F.lit(4))
    ).withColumn("ingest_batch", F.lit(0))
    # three "micro-batches", the last a replay duplicate
    for b in range(3):
        keys.withColumn("ingest_batch", F.lit(min(b, 1))).write.mode(
            "append"
        ).partitionBy("sh_bucket").parquet(os.path.join(store, "keys"))

    batch = spark.createDataFrame(
        [(10, "xx aa bb cc dd yy"), (11, "novel words only here")],
        ["doc_id", "text"],
    )

    def cut():
        return sorted(
            tuple(r)
            for r in T.exact_substring_dedup_incremental(
                batch, spark.read.parquet(os.path.join(store, "keys")), k=3
            ).collect()
        )

    before = cut()
    stats = compact_shingle_store(spark, store, files_per_bucket=1)
    after = cut()
    assert after == before
    assert stats["files_after"] < stats["files_before"]
    # folded to the distinct key count
    assert stats["rows"] == keys.select("_sh").distinct().count()
    # later appends keep a uniform schema and still work
    keys.withColumn("ingest_batch", F.lit(9)).write.mode("append").partitionBy(
        "sh_bucket"
    ).parquet(os.path.join(store, "keys"))
    assert cut() == before


def _mk_shingle_store(spark, tmp_path):
    """(store_dir, batch, cut) fixture body for the shingle-store
    recovery tests: a two-doc history's distinct 3-token shingle keys
    in the stream_shingle_ingest layout, plus a probe batch and a
    cut() thunk over the read-back store."""
    from applications_analytics_midas_hbase_metrics_spark.operators import text as T

    history = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff"), (2, "gg hh ii jj kk")], ["doc_id", "text"]
    )
    store = str(tmp_path / "shstore")
    keys = (
        T.substring_shingle_keys(history, k=3)
        .withColumn("sh_bucket", F.pmod(F.xxhash64("_sh"), F.lit(4)))
        .withColumn("ingest_batch", F.lit(0))
    )
    keys.write.partitionBy("sh_bucket").parquet(os.path.join(store, "keys"))
    batch = spark.createDataFrame(
        [(10, "xx aa bb cc dd yy"), (11, "novel words only here")],
        ["doc_id", "text"],
    )

    def cut():
        path = os.path.join(store, "keys")
        spark.catalog.refreshByPath(path)
        return sorted(
            tuple(r)
            for r in T.exact_substring_dedup_incremental(
                batch, spark.read.parquet(path), k=3
            ).collect()
        )

    return store, batch, cut


def test_recover_shingle_store_all_crash_states(spark, tmp_path):
    """recover_shingle_store heals every state compact_shingle_store's
    swap window can leave — the keys/ sibling of the signature-store
    recovery (which does NOT touch keys/), closing the hole where a
    crash between the two renames left the store headless and the next
    ingest would have rebuilt an EMPTY history."""
    from applications_analytics_midas_hbase_metrics_spark.streaming.dedup_stream import (
        recover_shingle_store,
    )

    store, _, cut = _mk_shingle_store(spark, tmp_path)
    keys = os.path.join(store, "keys")
    healthy = cut()
    assert any(r[2] > 0 for r in healthy)  # history really cuts

    # state 1: residue next to a healthy table
    os.makedirs(keys + ".tmp")
    assert recover_shingle_store(store) == {"keys": "residue_cleared"}
    assert not os.path.exists(keys + ".tmp")

    # state 2: crashed between renames — keys/ gone, .old holds history
    os.rename(keys, keys + ".old")
    assert recover_shingle_store(store) == {"keys": "restored_pre_compaction"}
    assert cut() == healthy

    # state 3: only a fully-written tmp remains
    os.rename(keys, keys + ".tmp")
    assert recover_shingle_store(store) == {"keys": "promoted_tmp"}
    assert cut() == healthy

    # idempotent on a healthy store
    assert recover_shingle_store(store) == {"keys": "ok"}


def test_shingle_ingest_refuses_headless_store(spark, tmp_path):
    """stream_shingle_ingest must REFUSE to append when keys.old exists
    without keys/ (mid-compaction crash): appending would recreate an
    empty store on top of the recoverable history.  After
    recover_shingle_store the same ingest succeeds and the store holds
    history + the new batch's keys."""
    import glob
    import shutil

    from applications_analytics_midas_hbase_metrics_spark.operators import text as T
    from applications_analytics_midas_hbase_metrics_spark.streaming.dedup_stream import (
        recover_shingle_store,
        stream_shingle_ingest,
    )

    store, batch, cut = _mk_shingle_store(spark, tmp_path)
    keys = os.path.join(store, "keys")
    healthy = cut()

    # one-file parquet source for the availableNow stream
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    tmp = str(tmp_path / "b0")
    batch.coalesce(1).write.parquet(tmp)
    shutil.move(
        glob.glob(os.path.join(tmp, "part-*.parquet"))[0],
        os.path.join(src_dir, "b0.parquet"),
    )

    def ingest(ckpt: str):
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .parquet(src_dir)
        )
        q = stream_shingle_ingest(
            stream,
            store,
            str(tmp_path / ckpt),
            k=3,
            n_buckets=4,
            trigger_available_now=True,
        )
        q.awaitTermination(120)

    # headless state: keys.old present, keys/ absent
    os.rename(keys, keys + ".old")
    with pytest.raises(Exception, match="recover_shingle_store"):
        ingest("ckpt1")
    assert not os.path.exists(keys)  # nothing was appended

    assert recover_shingle_store(store) == {"keys": "restored_pre_compaction"}
    assert cut() == healthy
    ingest("ckpt2")
    spark.catalog.refreshByPath(keys)
    stored = {r._sh for r in spark.read.parquet(keys).select("_sh").collect()}
    batch_keys = {
        r._sh for r in T.substring_shingle_keys(batch, k=3).collect()
    }
    assert batch_keys <= stored  # the refused batch landed after recovery
    assert any(r[2] > 0 for r in cut())  # history still cuts


def test_retrieval_index_atomic_build_and_recovery(spark, tmp_path):
    """The multi-table retrieval indexes publish as ONE generation
    (round-12 store audit): a rebuild that dies anywhere in the swap
    window can never leave mixed-generation tables (new postings + old
    stats = silently wrong rankings).  Simulate every crash state,
    verify recover_index_store's resolutions, the headless-search
    refusal, and ranking identity after a mid-swap restore."""
    import shutil

    from applications_analytics_midas_hbase_metrics_spark.operators.retrieval import (
        _INDEX_COMMITTED,
        bm25_index_build,
        bm25_topk_indexed,
        recover_index_store,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} " + ("gamma " * (i % 4))) for i in range(40)],
        "doc_id bigint, text string",
    )
    queries = spark.createDataFrame(
        [(1, "alpha"), (1, "gamma"), (2, "beta"), (2, "doc7")],
        "query_id long, term string",
    )
    idx = str(tmp_path / "bm25")
    bm25_index_build(docs, idx, n_buckets=8)
    assert os.path.exists(os.path.join(idx, _INDEX_COMMITTED))
    healthy = sorted(
        tuple(r)
        for r in bm25_topk_indexed(spark, idx, queries, k=5, n_buckets=8).collect()
    )

    # state 1: residue next to a healthy index (crash after the swap,
    # before cleanup)
    os.makedirs(idx + ".old")
    assert recover_index_store(idx) == {"index": "residue_cleared"}
    assert not os.path.exists(idx + ".old")

    # state 2: crashed between the renames — index gone, .old holds the
    # previous generation; searching must REFUSE until recovery
    os.rename(idx, idx + ".old")
    import pytest

    with pytest.raises(RuntimeError, match="recover_index_store"):
        bm25_topk_indexed(spark, idx, queries, k=5, n_buckets=8)
    with pytest.raises(RuntimeError, match="recover_index_store"):
        bm25_index_build(docs, idx, n_buckets=8)  # rebuild also refuses
    assert recover_index_store(idx) == {"index": "restored_previous"}
    spark.catalog.refreshByPath(idx)
    got = sorted(
        tuple(r)
        for r in bm25_topk_indexed(spark, idx, queries, k=5, n_buckets=8).collect()
    )
    assert got == healthy

    # state 3: crashed after the old-index rename with a COMMITTED tmp —
    # the new generation is complete, roll forward
    os.rename(idx, idx + ".build_tmp")
    assert recover_index_store(idx) == {"index": "promoted_tmp"}
    assert os.path.exists(os.path.join(idx, _INDEX_COMMITTED))

    # state 4: an UNCOMMITTED tmp alone (builder died mid-table-write):
    # tables may be torn — discard, never promote
    os.rename(idx, idx + ".build_tmp")
    os.remove(os.path.join(idx + ".build_tmp", _INDEX_COMMITTED))
    assert recover_index_store(idx) == {"index": "incomplete_build_discarded"}
    assert recover_index_store(idx) == {"index": "missing"}

    # a rebuild over a LIVE index swaps generations atomically
    bm25_index_build(docs, idx, n_buckets=8)
    bm25_index_build(docs.limit(20), idx, n_buckets=8)
    assert not os.path.exists(idx + ".old")
    assert not os.path.exists(idx + ".build_tmp")
    n_docs_row = spark.read.parquet(os.path.join(idx, "stats")).first()
    assert n_docs_row.n_docs == 20.0  # the NEW generation, whole


def test_trigram_index_atomic_build(spark, tmp_path):
    """Same generation contract for the trigram substring index."""
    import pytest

    from applications_analytics_midas_hbase_metrics_spark.operators.retrieval import (
        _INDEX_COMMITTED,
        recover_index_store,
        trigram_index_build,
        trigram_search_indexed,
    )

    docs = spark.createDataFrame(
        [(i, f"needle{i} in a haystack of text") for i in range(20)],
        "doc_id bigint, text string",
    )
    queries = spark.createDataFrame([(1, "needle7")], "qid bigint, q string")
    idx = str(tmp_path / "tri")
    trigram_index_build(docs, idx, n_buckets=8)
    assert os.path.exists(os.path.join(idx, _INDEX_COMMITTED))
    assert [
        r.doc_id
        for r in trigram_search_indexed(
            spark, idx, queries, docs, k_grams=4, n_buckets=8
        ).collect()
    ] == [7]

    os.rename(idx, idx + ".old")
    with pytest.raises(RuntimeError, match="recover_index_store"):
        trigram_search_indexed(
            spark, idx, queries, docs, k_grams=4, n_buckets=8
        )
    assert recover_index_store(idx) == {"index": "restored_previous"}
    spark.catalog.refreshByPath(idx)
    assert [
        r.doc_id
        for r in trigram_search_indexed(
            spark, idx, queries, docs, k_grams=4, n_buckets=8
        ).collect()
    ] == [7]
