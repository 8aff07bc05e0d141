"""End-to-end pipeline tests: the reference's entry-point flows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from applications_analytics_midas_hbase_metrics_spark.operators import cellstore as CS
from applications_analytics_midas_hbase_metrics_spark.plans import pipelines as P

D = "\x00"


@pytest.fixture(scope="module")
def mupr_batch(tmp_path_factory):
    d = tmp_path_factory.mktemp("batch")
    rows = [
        D.join(["101", "SUB_A", "1", "5", "1.5", "7", "3.25", "AC", "PF", "MV", "t_volt"]),
        D.join(["101", "SUB_A", "1", "6", "2.5", "8", "4.5", "AC", "PF", "MV", "t_volt"]),
        D.join(["102", "SUB_B", "2", "1", "2.0", "9", "0.125", "IC", "FF", "MK", "t_amp"]),
    ]
    (d / "f1.mupr").write_text("\n".join(rows))
    (d / "trig.csv").write_text(
        "File_Name,Lot,Lato_Start_WW,Lots_seq_key\nf1.mupr,LOT_A,202233,9001\n"
    )
    return d


def test_ingest_mupr_roundtrip(spark, mupr_batch, tmp_path):
    store = str(tmp_path / "store")
    cells = P.ingest_mupr_to_store(
        spark, str(mupr_batch / "f1.mupr"), str(mupr_batch / "trig.csv"), store,
        mode="overwrite",
    )
    # two units x one test name each -> 2 cells; unit 101 has 2 values
    assert cells.count() == 2
    back = CS.read_cells(spark, store)
    assert back.count() == 2
    r101 = back.filter(F.col("row_key").contains("101")).first()
    assert r101.col_name == "t_volt" and len(r101.values) == 2
    assert r101.row_key.split(D) == ["LOT_A", "202233", "9001", "101"]
    # value blob layout must match the reference byte-for-byte
    # (Utils.scala:203-211): Measurement_Value, Substructure_ID,
    # Test_Result_Order_Num, Sub_Session_Seq_Num, Active, Pass_Fail,
    # Mask, Test_Result_Array_Seq_Num
    assert sorted(r101.values)[0].split(D) == [
        "3.25", "SUB_A", "5", "1", "AC", "PF", "MV", "1.5"
    ]


def test_validate_load_clean_and_corrupted(spark, mupr_batch, tmp_path):
    store = str(tmp_path / "store2")
    P.ingest_mupr_to_store(
        spark, str(mupr_batch / "f1.mupr"), str(mupr_batch / "trig.csv"), store,
        mode="overwrite",
    )
    summary = {
        r.verdict: r.n
        for r in P.validate_load(
            spark, str(mupr_batch / "f1.mupr"), str(mupr_batch / "trig.csv"), store
        ).collect()
    }
    assert summary == {"match": 2}

    # corrupt the store: drop one cell
    cells = CS.read_cells(spark, store)
    CS.write_cells(
        cells.filter(~F.col("row_key").contains("102")), store + "_bad",
        mode="overwrite",
    )
    summary_bad = {
        r.verdict: r.n
        for r in P.validate_load(
            spark, str(mupr_batch / "f1.mupr"), str(mupr_batch / "trig.csv"),
            store + "_bad",
        ).collect()
    }
    assert summary_bad == {"match": 1, "missing_in_table": 1}


def test_mucr_ingest(spark, tmp_path):
    d = tmp_path
    (d / "f1.mucr").write_text(
        D.join(["201", "1", "prog_x", "P", "SUB_A", "2", "CNT1", "3", "11", "C2", "4", "12"])
    )
    (d / "trig.csv").write_text(
        "File_Name,Lot,Lato_Start_WW,Lots_seq_key\nf1.mucr,LOT_B,202234,9002\n"
    )
    store = str(d / "mucr_store")
    cells = P.ingest_mucr_to_store(
        spark, str(d / "f1.mucr"), str(d / "trig.csv"), store, mode="overwrite"
    )
    rows = cells.collect()
    got = {r.col_name for r in rows}
    assert got == {"P4CNT1", "P2C2"}
    # MUCR value blob layout (Utils.scala:551): Unit_Counter_Seq_Num,
    # Substructure_ID, Repeating_Counter_Occurrences
    by_name = {r.col_name: r.values for r in rows}
    assert by_name["P4CNT1"] == ["11" + D + "SUB_A" + D + "3"]
    assert by_name["P2C2"] == ["12" + D + "SUB_A" + D + "4"]


def test_job_status_report(spark, tmp_path):
    log = tmp_path / "submit.log"
    log.write_text(
        "the spark submit job is successful for 12345678 with code 0\n"
        "noise line\n"
    )
    status_cells = spark.createDataFrame(
        [("IF12345678", "LOADSTATUS", "OK"), ("IF99999999", "LOADSTATUS", "OLD")],
        ["row_key", "col_name", "value"],
    )
    out = P.job_status_report(spark, str(log), status_cells).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.job_seq_key, r.job_status, r.value) == ("12345678", "successful", "OK")


def test_curation_pipeline_full_pin_modes(spark):
    """The 10-stage pretraining build must produce an IDENTICAL
    manifest under all three pin modes: the footprint-aware default
    (round 15 — operators.pinning.FootprintPin: post-reduction sites
    checkpoint-or-disk by plan-time estimate, the ExactSubstr shingle
    frame NEVER pinned), the pre-round-15 blanket eager
    localCheckpoint, and the blanket DISK_ONLY escape hatch
    (text.disk_persist_pin, lineage kept) — pins are semantics-neutral
    by contract, and this is the contract's test."""
    from applications_analytics_midas_hbase_metrics_spark.operators import (
        text as T,
    )
    from applications_analytics_midas_hbase_metrics_spark.plans import (
        queries_curation as QC,
    )
    from tests.conftest import SF_SMOKE

    base = sorted(
        tuple(r)
        for r in QC.q_curation_pipeline_full(spark, SF_SMOKE).collect()
    )

    ckpt = sorted(
        tuple(r)
        for r in QC.q_curation_pipeline_full(
            spark, SF_SMOKE, pin=lambda d: d.localCheckpoint(eager=True)
        ).collect()
    )
    assert base == ckpt

    pinned = []

    def disk_pin(df):
        out = T.disk_persist_pin(df)
        pinned.append(out)
        return out

    try:
        alt = sorted(
            tuple(r)
            for r in QC.q_curation_pipeline_full(
                spark, SF_SMOKE, pin=disk_pin
            ).collect()
        )
    finally:
        for f in pinned:
            f.unpersist(blocking=True)

    assert len(pinned) >= 8, len(pinned)  # every pin site took the hatch
    assert base == alt


def test_curation_pipeline_full_footprint_disk_mode(spark):
    """Round 16: the all-disk FootprintPin path — the rung's mode —
    engages the stage-incremental drop accounting (eager drop-frame
    pins, early predecessor releases) over plan-truncating ckpt_disk
    pins.  The manifest must equal the default path's, every accounted
    drop stage must appear in the decisions audit trail, and with the
    deterministic checkpoint-RDD release a mis-scheduled early release
    FAILS the query outright (the blocks are gone, no lineage to
    recompute) — so this passing IS the consumers-first ordering
    proof.  release() must then leave none of the policy's pins in the
    block manager."""
    from applications_analytics_midas_hbase_metrics_spark.operators.pinning import (
        FootprintPin,
    )
    from applications_analytics_midas_hbase_metrics_spark.plans import (
        queries_curation as QC,
    )
    from tests.conftest import SF_SMOKE

    base = sorted(
        tuple(r)
        for r in QC.q_curation_pipeline_full(spark, SF_SMOKE).collect()
    )

    pol = FootprintPin(small_bytes=None)  # every pin site goes to disk
    try:
        alt = sorted(
            tuple(r)
            for r in QC.q_curation_pipeline_full(
                spark, SF_SMOKE, pin=pol
            ).collect()
        )
    finally:
        tracked = [jr.id() for jr in pol._ckpt_rdds.values()]
        pol.release()
    assert base == alt
    labels = {d[3] for d in pol.decisions if d[3]}
    assert labels >= {
        f"drop:{s}"
        for s in (
            "quality", "exact_dup", "near_dup",
            "decontaminated", "domain_cap", "mixture",
        )
    }, labels
    live = {
        i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    assert not (live & set(tracked)), live & set(tracked)


def test_curation_pipeline_full_manifest_anti_join_shape(spark):
    """The drop-accounting branches must stay LEFT ANTI joins of
    consecutive pinned frames (never a full-materialize-and-subtract):
    pinned on the FULL executed-plan string because tools/plan_audit.py
    slices its audited plan at the first '== Initial Plan ==' marker,
    and the round-15 FootprintPin's disk persist at the `mixed` site
    nests an AQE render early enough to push every anti join beyond
    the audited slice (the dsir_weights caveat there)."""
    from applications_analytics_midas_hbase_metrics_spark.plans import (
        queries_curation as QC,
    )
    from tests.conftest import SF_SMOKE

    df = QC.q_curation_pipeline_full(spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one anti join per accounted drop stage: quality, exact_dup,
    # near_dup, decontaminated, domain_cap, mixture
    assert plan.count("LeftAnti") >= 6, plan.count("LeftAnti")
    # ... and they must ride BROADCAST, never sort-merge: the drop
    # frames join tiny id sets against stage frames, and a regression
    # to SortMergeJoin LeftAnti would add a full-width sort + exchange
    # per drop branch (ADVICE r15)
    anti_lines = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti_lines and all(
        "BroadcastHashJoin" in ln for ln in anti_lines
    ), anti_lines


def test_footprint_pin_policy(spark):
    """FootprintPin unit contract: small frames checkpoint; large
    frames take the round-16 default ckpt_disk flavor (eager DISK_ONLY
    localCheckpoint — plan truncated at the pin, release deterministic
    via the tracked checkpoint RDD) or, under ``lineage=True``, the
    round-15 DISK_ONLY persist with lineage kept; pre() never pins."""
    from pyspark import StorageLevel

    from applications_analytics_midas_hbase_metrics_spark.operators.pinning import (
        FootprintPin,
        plan_size_estimate,
    )

    df = spark.range(1000).selectExpr("id", "id * 2 as v")
    assert plan_size_estimate(df) is not None

    pol = FootprintPin(small_bytes=1 << 30)
    small = pol.post(df)
    assert pol.decisions[-1][2] == "checkpoint"
    assert small.count() == 1000

    # lineage=True: the round-15 flavor — persist, lineage survives
    pol2 = FootprintPin(small_bytes=1, lineage=True)
    big = pol2.post(df)
    assert pol2.decisions[-1][2] == "disk"
    assert big.storageLevel == StorageLevel.DISK_ONLY
    assert big.count() == 1000
    # pre() is identity — the frame is NOT pinned
    assert pol2.pre(df) is df
    pol2.release()
    assert big.storageLevel == StorageLevel.NONE
    # lineage survived the release: the frame still evaluates
    assert big.count() == 1000

    # default (round 16): plan-truncating DISK_ONLY localCheckpoint.
    # DataFrame.unpersist is a CacheManager no-op for checkpointed
    # frames, so release must go through the tracked RDD handle — the
    # block must LEAVE the block manager, not wait for GC.
    pol3 = FootprintPin(small_bytes=1)
    big2 = pol3.post(df, label="unit")
    assert pol3.decisions[-1][2:] == ("ckpt_disk", "unit")
    assert big2.count() == 1000
    assert pol3.is_disk(big2) and not pol3.is_disk(df)
    jsc = spark.sparkContext._jsc.sc()
    rid = pol3._ckpt_rdds[id(big2)].id()
    assert rid in {i.id() for i in jsc.getRDDStorageInfo()}
    pol3.release()
    assert rid not in {i.id() for i in jsc.getRDDStorageInfo()}
    assert not pol3.is_disk(big2)

    # small_bytes=None: every post pin goes to disk regardless
    pol4 = FootprintPin(small_bytes=None)
    forced = pol4.post(df)
    assert pol4.decisions[-1][2] == "ckpt_disk"
    assert forced.count() == 1000
    pol4.release()


def test_gopher_quality_pipeline_stages(spark):
    """The composed round-12 quality pipeline (NFC -> C4 -> line
    battery -> n-gram battery -> quality rules): every document gets
    exactly one row, all five stage classes are live at smoke SF (a
    degenerate class would make the differential oracle vacuous for
    it), the NFC flag fires exactly on the %4 injection (the corpus is
    ASCII salad), and the plan carries no per-key window sort — every
    signal is a partial-aggregating groupBy."""
    from applications_analytics_midas_hbase_metrics_spark.plans import (
        queries_curation as QC,
    )
    from tests.conftest import SF_SMOKE

    df = QC.q_gopher_quality_pipeline(spark, SF_SMOKE)
    out = df.collect()
    n_docs = spark.read.parquet(SF_SMOKE + "/documents.parquet").count()
    assert len(out) == n_docs
    assert {r.stage for r in out} == {
        "c4",
        "line_repetition",
        "ngram_repetition",
        "quality_rules",
        "kept",
    }
    for r in out:
        assert r.nfc_changed == (1 if r.id % 4 == 0 else 0), r
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_gopher_quality_pipeline_pin_modes(spark):
    """Identical manifest under the default deferred memory pin and the
    100 TB DISK_ONLY escape hatch (the curation_pipeline_full pin
    contract extended to the composed quality pipeline)."""
    from applications_analytics_midas_hbase_metrics_spark.operators import (
        text as T,
    )
    from applications_analytics_midas_hbase_metrics_spark.plans import (
        queries_curation as QC,
    )
    from tests.conftest import SF_SMOKE

    base = sorted(
        tuple(r)
        for r in QC.q_gopher_quality_pipeline(spark, SF_SMOKE).collect()
    )
    pinned = []

    def disk_pin(df):
        out = T.disk_persist_pin(df)
        pinned.append(out)
        return out

    try:
        alt = sorted(
            tuple(r)
            for r in QC.q_gopher_quality_pipeline(
                spark, SF_SMOKE, pin=disk_pin
            ).collect()
        )
    finally:
        for f in pinned:
            f.unpersist(blocking=True)

    assert len(pinned) == 1  # the one multi-consumer site took the hatch
    assert base == alt
