"""Unicode normalization for curation pipelines (extension tier — no
reference counterpart; the technique is the standard first step of every
public web-text pipeline: canonicalize combining sequences so that
visually identical strings hash, dedup, and tokenize identically).

Spark has no built-in Unicode-normalization expression, so this is one
of the repo's few sanctioned Python boundaries: an Arrow-batched pandas
UDF applying :func:`unicodedata.normalize` per batch.  The UDF is a pure
per-row string map — no state, no shuffle — so the stage fuses into the
scan and costs one Arrow round trip proportional to payload bytes, the
same budget as the multimodal decoders (operators/multimodal.py).

Why it matters for dedup at 100 TB: "café" composed (U+00E9) and
"café" decomposed (e + U+0301) are DIFFERENT byte strings — different
SHA-256, different shingles, different minhash bands — so a crawl that
mixes producers silently double-counts every accented document unless
a canonical form is fixed before any content hash.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: The four Unicode normal forms.  NFC is the web canonical form (and
#: the only one DuckDB exposes, hence the oracle checks NFC).
FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def _norm_udf(form: str):
    @pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        # ASCII fast path: every ASCII string is invariant under all
        # four normal forms (no combining sequences, no compatibility
        # decompositions below U+0080), and str.isascii is a C-speed
        # length scan — orders of magnitude cheaper than normalize.
        # Post-extraction web text is majority-ASCII, so at corpus
        # scale most rows never enter the normalizer at all.
        return s.map(
            lambda x: x
            if x is None or x.isascii()
            else unicodedata.normalize(form, x)
        )

    return norm


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    form: str = "NFC",
) -> DataFrame:
    """(id, text_norm, changed, n_chars_raw, n_chars_norm): the ``form``
    normalization of ``text_col`` plus a change flag and codepoint
    counts (composition shrinks decomposed sequences, so the counts
    differ exactly when composition happened).

    The UDF result is computed ONCE and the change flag derived from the
    projected column — no double evaluation of the Python boundary.
    """
    if form not in FORMS:
        raise ValueError(f"form must be one of {FORMS}, got {form!r}")
    normed = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(text_col).alias("_raw"),
        _norm_udf(form)(F.col(text_col)).alias("text_norm"),
    )
    return normed.select(
        "id",
        "text_norm",
        (F.col("_raw") != F.col("text_norm")).alias("changed"),
        F.length("_raw").cast("bigint").alias("n_chars_raw"),
        F.length("text_norm").cast("bigint").alias("n_chars_norm"),
    )


# ---------------------------------------------------------------------------
# Mojibake repair (UTF-8 read as Latin-1, re-encoded) — pure expressions.
# ---------------------------------------------------------------------------

def _chr_range(a: int, b: int) -> str:
    """Regex char-class fragment for the inclusive codepoint range —
    built with chr() so this source file stays pure ASCII (several of
    the continuation-range codepoints are C1 control characters)."""
    return f"{chr(a)}-{chr(b)}"


#: One UTF-8 continuation byte as a Latin-1 character class.
_CONT = f"[{_chr_range(0x80, 0xBF)}]"

#: RFC 3629 well-formed UTF-8, expressed over the Latin-1 characters
#: standing in for bytes: 2-byte C2-DF, 3-byte with the E0-overlong and
#: ED-surrogate exclusions, 4-byte with the F0-overlong and F4-range
#: exclusions.  A string of mis-decoded UTF-8 matches; real Latin-1
#: text with a bare accented letter does not.
_UTF8_VALID_RE = (
    f"^(?:[{_chr_range(0x00, 0x7F)}]"
    f"|[{_chr_range(0xC2, 0xDF)}]{_CONT}"
    f"|{chr(0xE0)}[{_chr_range(0xA0, 0xBF)}]{_CONT}"
    f"|[{_chr_range(0xE1, 0xEC)}{chr(0xEE)}{chr(0xEF)}]{_CONT}{{2}}"
    f"|{chr(0xED)}[{_chr_range(0x80, 0x9F)}]{_CONT}"
    f"|{chr(0xF0)}[{_chr_range(0x90, 0xBF)}]{_CONT}{{2}}"
    f"|[{_chr_range(0xF1, 0xF3)}]{_CONT}{{3}}"
    f"|{chr(0xF4)}[{_chr_range(0x80, 0x8F)}]{_CONT}{{2}}"
    ")*$"
)

#: At least one multi-byte sequence actually present (an all-ASCII
#: string is trivially valid UTF-8 but has nothing to repair).
_MOJIBAKE_SIG_RE = f"[{_chr_range(0xC2, 0xF4)}]{_CONT}"

#: cp1252's displaced C1 range: byte 0x80-0x9F decoded as Windows-1252
#: yields punctuation/letters (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ' ' " " • –
#: — ˜ ™ š › œ ž Ÿ) instead of the C1 controls Latin-1 keeps.  The
#: 27 defined mappings below undo that displacement; the five
#: undefined bytes (81 8D 8F 90 9D) pass through as literal C1 chars
#: in lenient decoders and need no remap.
_CP1252_BYTE_TO_CHAR = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E,
    0x85: 0x2026, 0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6,
    0x89: 0x2030, 0x8A: 0x0160, 0x8B: 0x2039, 0x8C: 0x0152,
    0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019, 0x93: 0x201C,
    0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A,
    0x9C: 0x0153, 0x9E: 0x017E, 0x9F: 0x0178,
}
_CP1252_FROM = "".join(chr(u) for u in _CP1252_BYTE_TO_CHAR.values())
_CP1252_TO = "".join(chr(b) for b in _CP1252_BYTE_TO_CHAR)


def _repair_once(text: "F.Column") -> "F.Column":
    """One guarded repair pass: the Latin-1 round trip when the whole
    string spells well-formed multi-byte UTF-8, else the cp1252 C1
    remap + round trip when the REMAPPED string does, else identity.
    Pure expressions — the validity guard proves decodability before
    ``decode`` runs, so the ANSI malformed-coding error can't fire."""
    cand = text.rlike(_UTF8_VALID_RE) & text.rlike(_MOJIBAKE_SIG_RE)
    remap = F.translate(text, _CP1252_FROM, _CP1252_TO)
    cand_cp = remap.rlike(_UTF8_VALID_RE) & remap.rlike(_MOJIBAKE_SIG_RE)
    return (
        F.when(cand, F.decode(F.encode(text, "ISO-8859-1"), "UTF-8"))
        .when(cand_cp, F.decode(F.encode(remap, "ISO-8859-1"), "UTF-8"))
        .otherwise(text)
    )


def fix_mojibake(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passes: int = 2,
) -> DataFrame:
    """(id, text_fixed, changed, n_chars_saved): repair the classic
    double-encoding corruption — UTF-8 bytes decoded as Latin-1 and
    re-encoded ("cafÃ©" for "café", the single most common mojibake in
    web crawls) — by re-encoding to Latin-1 and decoding as UTF-8.

    The repair fires ONLY when the text (a) contains Latin-1
    characters that spell at least one well-formed multi-byte UTF-8
    sequence and (b) is VALID UTF-8 in its entirety under the byte
    reading (the RFC 3629 regex above).  Genuine Latin-1/Unicode text
    fails (b) (a bare ``é`` is a lone continuation byte), so it passes
    through untouched — and because the guard proves validity before
    ``decode`` runs, the expression never trips the engine's
    malformed-coding error (ANSI-safe with no try/except boundary).
    Characters above U+00FF make (a)'s byte reading impossible and the
    row passes through.

    cp1252-FLAVORED mojibake (round 13) — UTF-8 bytes decoded as
    Windows-1252, the ``â€™``-for-``'`` corruption, the second-most
    common real-crawl variant — is repaired by the same round trip
    after a :func:`~pyspark.sql.functions.translate` that undoes
    cp1252's C1 displacement (the 27 defined punctuation/letter
    mappings back to U+0080-U+009F; the five undefined bytes pass
    through as literal C1 chars in lenient decoders and are already in
    place).  The SAME validity guard runs on the remapped string, so
    GENUINE Windows-1252 text — a bare curly quote is a lone
    continuation byte after remap — fails it and passes through
    untouched.

    DOUBLE-mojibake (round 14, closing the round-13 gap): the repair
    iterates to a FIXPOINT bounded at ``passes`` (default 2) — a
    doubly-encoded string (``Ã¢â‚¬â„¢``-class: two rounds of
    UTF-8-as-Latin-1/cp1252, mixed flavors included) repairs one layer
    per pass, while any string the first pass fully repaired fails the
    validity guard on the second (a bare ``é`` or curly quote is a
    lone continuation byte) and passes through byte-identical — so
    raising ``passes`` never perturbs already-clean output.  Triple
    encodings are out of the default bound by the same argument that
    bounded the original at one: each extra layer is ~the square of
    the previous layer's rarity.

    Scale shape: ZERO shuffles, no UDF — per pass a translate, four
    regex probes and a conditional charset round trip, all fused into
    the scan via chained projections; the common all-ASCII row
    short-circuits on the signature probe."""
    if passes < 1:
        raise ValueError(f"passes must be >= 1, got {passes}")
    out = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(text_col).alias("_mj_raw"),
        F.col(text_col).alias("_mj_t"),
    )
    for _ in range(passes):
        # chained projections, not nested expressions: each pass reads
        # the previous pass's column once (no exponential expression
        # blow-up); Catalyst collapses the projections into one stage
        out = out.withColumn("_mj_t", _repair_once(F.col("_mj_t")))
    raw, fixed = F.col("_mj_raw"), F.col("_mj_t")
    return out.select(
        "id",
        fixed.alias("text_fixed"),
        F.coalesce((fixed != raw).cast("int"), F.lit(0)).alias("changed"),
        F.coalesce(
            (F.length(raw) - F.length(fixed)).cast("bigint"), F.lit(0)
        ).alias("n_chars_saved"),
    )
