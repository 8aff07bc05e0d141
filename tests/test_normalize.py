"""Unit tests for operators/normalize.py — Unicode normalization via the
Arrow-batched pandas UDF, cross-checked against Python's unicodedata and
(for NFC) DuckDB's nfc_normalize in the oracle-backed query tier."""

from __future__ import annotations

import unicodedata

import pytest

from applications_analytics_midas_hbase_metrics_spark.operators import (
    normalize as NZ,
)

DECOMPOSED = "cafe\u0301 u\u0308ber A\u030a \u1100\u1161"
COMPOSED = "caf\u00e9 \u00fcber \u00c5 \uac00"


def test_nfc_composes_and_flags(spark):
    df = spark.createDataFrame(
        [(1, DECOMPOSED), (2, COMPOSED), (3, "plain ascii")],
        "doc_id long, text string",
    )
    out = {r["id"]: r.asDict() for r in NZ.normalize_unicode(df).collect()}
    assert out[1]["text_norm"] == COMPOSED
    assert out[1]["changed"] is True
    # composition shrinks: every combining pair fused
    assert out[1]["n_chars_raw"] > out[1]["n_chars_norm"]
    assert out[2]["text_norm"] == COMPOSED and out[2]["changed"] is False
    assert out[3]["changed"] is False
    assert out[3]["n_chars_raw"] == out[3]["n_chars_norm"]


def test_nfd_and_nfkc_forms(spark):
    # NFD decomposes the composed spelling; NFKC folds compatibility
    # characters (ﬁ ligature -> fi) that NFC leaves alone
    df = spark.createDataFrame(
        [(1, COMPOSED), (2, "ﬁle")], "doc_id long, text string"
    )
    nfd = {r["id"]: r["text_norm"] for r in NZ.normalize_unicode(df, form="NFD").collect()}
    assert nfd[1] == unicodedata.normalize("NFD", COMPOSED)
    nfkc = {r["id"]: r["text_norm"] for r in NZ.normalize_unicode(df, form="NFKC").collect()}
    assert nfkc[2] == "file"
    nfc = {r["id"]: r["text_norm"] for r in NZ.normalize_unicode(df).collect()}
    assert nfc[2] == "ﬁle"  # NFC preserves compatibility chars


def test_null_text_passes_through(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = NZ.normalize_unicode(df).collect()[0]
    assert r["text_norm"] is None
    assert r["changed"] is None  # NULL-propagating comparison, not False


def test_invalid_form_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="form must be one of"):
        NZ.normalize_unicode(df, form="NFX")


def test_dedup_motivation_hashes_unify(spark):
    # the docstring's point: identical-looking strings hash apart until
    # normalized
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, DECOMPOSED), (2, COMPOSED)], "doc_id long, text string"
    )
    raw = df.select(F.sha2("text", 256).alias("h")).distinct().count()
    normed = (
        NZ.normalize_unicode(df)
        .select(F.sha2("text_norm", 256).alias("h"))
        .distinct()
        .count()
    )
    assert raw == 2 and normed == 1


# normalize.fix_mojibake — the Latin-1/UTF-8 double-encoding repair


def test_fix_mojibake_hand_cases(spark):
    C = chr
    moji = "caf" + C(0xC3) + C(0xA9)          # 'café' double-encoded
    double = "caf" + C(0xC3) + C(0x83) + C(0xC2) + C(0xA9)  # encoded TWICE
    rows = [
        (1, moji),
        (2, "café"),                   # genuine text: bare continuation
        (3, "x" + C(0xC3)),            # truncated lead byte
        (4, C(0xF0) + C(0x9F) + C(0x98) + C(0x80)),  # 4-byte emoji
        (5, "plain ascii only"),
        (6, double),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in NZ.fix_mojibake(df).collect()}
    assert out[1].text_fixed == "café" and out[1].changed == 1
    assert out[1].n_chars_saved == 1
    assert out[2].text_fixed == "café" and out[2].changed == 0
    assert out[3].text_fixed == "x" + C(0xC3) and out[3].changed == 0
    assert out[4].text_fixed == "\U0001F600" and out[4].n_chars_saved == 3
    assert out[5].changed == 0
    # each pass peels ONE layer; the default bounded fixpoint (2
    # passes, round 14) repairs twice-encoded text fully, while
    # passes=1 reproduces the old single-peel contract
    assert out[6].text_fixed == "café" and out[6].n_chars_saved == 3
    df2 = spark.createDataFrame([(6, double)], "doc_id long, text string")
    assert NZ.fix_mojibake(df2, passes=1).first().text_fixed == moji
    assert out[7].text_fixed is None and out[7].changed == 0
    assert out[7].n_chars_saved == 0


def test_fix_mojibake_cp1252_variant(spark):
    """Round-13: the Windows-1252 flavor — UTF-8 bytes decoded as
    cp1252, so curly punctuation lands as ``â€™``-style clusters —
    repairs through the C1 remap + the same round trip; GENUINE text
    that merely uses curly quotes or € stays untouched (a lone
    remapped quote is an invalid continuation byte)."""
    fixed1 = "it’s fine"
    fixed2 = "price €99 — deal"
    rows = [
        (1, fixed1.encode("utf-8").decode("cp1252")),   # itâ€™s fine
        (2, fixed2.encode("utf-8").decode("cp1252")),
        (3, "genuine “quotes” and €"),   # must not change
        (4, "a dash – only"),                      # must not change
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in NZ.fix_mojibake(df).collect()}
    assert out[1].text_fixed == fixed1 and out[1].changed == 1
    assert out[1].n_chars_saved == 2
    assert out[2].text_fixed == fixed2 and out[2].changed == 1
    assert out[3].text_fixed == rows[2][1] and out[3].changed == 0
    assert out[4].text_fixed == rows[3][1] and out[4].changed == 0


def test_fix_mojibake_passes3_fixpoint(spark):
    """Round 15 (verdict optional #7): the fixpoint argument proved
    EMPIRICALLY at passes=3 — a TRIPLE-encoded string needs exactly
    three peels, each extra pass peels at most one layer, and no pass
    ever perturbs text that is already fully repaired or genuinely
    clean (the validity guard fails on a bare continuation byte), so
    raising ``passes`` is monotone-safe."""
    clean = "café — it’s fine"
    enc = lambda s: s.encode("utf-8").decode("latin-1")  # noqa: E731
    once, twice, thrice = enc(clean), enc(enc(clean)), enc(enc(enc(clean)))
    rows = [(1, thrice), (2, twice), (3, once), (4, clean), (5, "ascii")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out3 = {r.id: r for r in NZ.fix_mojibake(df, passes=3).collect()}
    # triple-encoded repairs fully at passes=3 ...
    assert out3[1].text_fixed == clean and out3[1].changed == 1
    # ... and every shallower corruption ALSO lands on clean (extra
    # passes no-op past the fixpoint)
    assert out3[2].text_fixed == clean
    assert out3[3].text_fixed == clean
    # genuine text is byte-identical under the deeper bound
    assert out3[4].text_fixed == clean and out3[4].changed == 0
    assert out3[5].text_fixed == "ascii" and out3[5].changed == 0
    # the default bound (2) leaves one layer of the triple encoding —
    # the documented trade, each layer ~squares the previous rarity
    out2 = NZ.fix_mojibake(
        spark.createDataFrame([(1, thrice)], "doc_id long, text string")
    ).first()
    assert out2.text_fixed == once


def test_fix_mojibake_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    plan = NZ.fix_mojibake(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
