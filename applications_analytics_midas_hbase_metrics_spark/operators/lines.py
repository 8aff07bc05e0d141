"""Line-level boilerplate removal (extension tier — no reference
counterpart; the technique is the public CCNet / RefinedWeb line-dedup
pass: drop lines that repeat across many documents — headers, footers,
navigation chrome — while preserving the order of the surviving lines).

Scale design (100 TB): the line-frequency table is keyed by the line
TEXT, whose hot keys are exactly the boilerplate we are hunting — but
the aggregation is a two-phase count with map-side combine (the first
shuffle is keyed by (line, doc_id) for the distinct-doc count, so no
single reducer sees a hot line's full fan-in), and only lines with
``doc_freq >= min_doc_freq`` survive the filter, so the frame joined
back against the corpus is the SMALL boilerplate dictionary, not the
full line table.  That join broadcasts; the only big shuffles are the
(line, doc) distinct aggregation and the per-doc reassembly groupBy.

At very large corpora the line text itself is a wide shuffle key;
``hash_lines=True`` shuffles ``xxhash64(line)`` instead (8 bytes/key)
for both the frequency count and the dictionary join — the standard
fingerprint substitution, collision-safe at corpus scale for a 64-bit
space in the same way the chunk-dedup hash is (operators/versions.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _split_lit(col: F.Column | str, sep: str) -> F.Column:
    """``F.split`` with ``sep`` treated as a LITERAL string.  Every
    ``sep`` in this module is also handed to ``array_join`` (literal
    semantics) on the way back out, so the split must match: an
    unescaped regex-metacharacter separator ('.', '|') would silently
    corrupt the split/rejoin round trip (round-11 ADVICE)."""
    return F.split(F.col(col) if isinstance(col, str) else col, re.escape(sep))


def boilerplate_lines(
    docs: DataFrame,
    *,
    min_doc_freq: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    hash_lines: bool = False,
) -> DataFrame:
    """The boilerplate dictionary: (``line``, ``doc_freq``) for every
    line occurring in at least ``min_doc_freq`` DISTINCT documents.

    With ``hash_lines`` the output key column is ``line_h``
    (xxhash64) instead of the raw text — the narrow-shuffle form.
    """
    lines = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(_split_lit(text_col, sep)).alias("line"),
    )
    if hash_lines:
        lines = lines.select("_doc", F.xxhash64("line").alias("line_h"))
        key = "line_h"
    else:
        key = "line"
    return (
        lines.select(key, "_doc")
        .distinct()  # (line, doc) pairs — shuffle key includes doc: no hot-line reducer
        .groupBy(key)
        .agg(F.count(F.lit(1)).cast("bigint").alias("doc_freq"))
        .filter(F.col("doc_freq") >= int(min_doc_freq))
    )


def strip_boilerplate(
    docs: DataFrame,
    *,
    min_doc_freq: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    hash_lines: bool = False,
) -> DataFrame:
    """Remove boilerplate lines (doc_freq >= ``min_doc_freq``) from every
    document, preserving the original order of the kept lines.

    Returns (id, ``clean_text``, ``n_kept``, ``n_removed``) — one row
    per input document (a document whose every line is boilerplate
    yields an empty ``clean_text`` and ``n_kept = 0``).

    The reassembly sorts each doc's surviving (pos, line) structs with
    ``array_sort`` inside one aggregation — no window, no second
    shuffle beyond the per-doc groupBy.
    """
    bad = boilerplate_lines(
        docs,
        min_doc_freq=min_doc_freq,
        id_col=id_col,
        text_col=text_col,
        sep=sep,
        hash_lines=hash_lines,
    ).withColumn("_bad", F.lit(1))

    lines = docs.select(
        F.col(id_col).alias(id_col),
        F.posexplode(_split_lit(text_col, sep)).alias("pos", "line"),
    )
    if hash_lines:
        join_key = ["line_h"]
        lines = lines.withColumn("line_h", F.xxhash64("line"))
    else:
        join_key = ["line"]
    # the dictionary is the FILTERED frequent set — small by
    # construction; let AQE/broadcast pick it up (hinted explicitly:
    # a boilerplate dictionary that does not fit in an executor means
    # min_doc_freq was set to ~1 and the operator is being misused)
    flagged = lines.join(
        F.broadcast(bad.select(*join_key, "_bad")), join_key, "left"
    )
    keep_struct = F.when(
        F.col("_bad").isNull(), F.struct(F.col("pos"), F.col("line"))
    )
    out = flagged.groupBy(id_col).agg(
        F.array_sort(F.collect_list(keep_struct)).alias("_kept"),
        F.count(F.lit(1)).cast("bigint").alias("_n_lines"),
    )
    return out.select(
        id_col,
        F.array_join(
            F.transform(F.col("_kept"), lambda s: s["line"]), sep
        ).alias("clean_text"),
        F.size("_kept").cast("bigint").alias("n_kept"),
        (F.col("_n_lines") - F.size("_kept")).cast("bigint").alias("n_removed"),
    )


def c4_line_filters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """The C4 cleaning rules (the public line/page heuristics of Raffel
    et al. 2020 §2.2), one map-side pass:

    line level (evaluated on the trimmed line, original line kept):
      - keep only lines ending in terminal punctuation (``. ! ? "``);
      - keep only lines with at least ``min_words_per_line`` words;
      - drop any line containing the word "javascript" (case-blind).
    page level:
      - drop pages containing "lorem ipsum" (case-blind) or ``{``;
      - drop pages whose KEPT lines contain fewer than
        ``min_sentences`` sentence terminators (``[.!?]`` count — the
        operational sentence proxy; documented deviation from prose
        sentence segmentation).

    Returns (id, clean_text, n_kept, n_removed, n_sentences, keep) —
    one row per input page, ``keep`` as int 0/1 so downstream mixture
    math can sum it; pages are flagged, not dropped, so the caller
    chooses between filtering and auditing.

    Scale shape: ZERO shuffles — one split, one per-line filter, two
    substring probes, one regexp count, all fused into the scan.  The
    per-line regex/word-count lambda is CodegenFallback (interpreted
    per line), the inherent cost of per-line predicates; cost stays
    proportional to payload bytes with no exchange at any corpus size.
    """
    lines_arr = _split_lit(text_col, sep)
    punct_ok = lambda t: t.rlike('[.!?"]$')  # noqa: E731
    kept = F.filter(
        lines_arr,
        lambda l: (
            punct_ok(F.trim(l))
            & (F.size(F.split(F.trim(l), r"\s+")) >= int(min_words_per_line))
            & ~F.lower(l).contains("javascript")
        ),
    )
    clean = F.array_join(kept, sep)
    n_sent = F.regexp_count(clean, F.lit("[.!?]")).cast("bigint")
    text = F.col(text_col)
    page_ok = (
        ~F.lower(text).contains("lorem ipsum")
        & ~text.contains("{")
        & (n_sent >= int(min_sentences))
    )
    return docs.select(
        F.col(id_col).cast("bigint").alias("id"),
        clean.alias("clean_text"),
        F.size(kept).cast("bigint").alias("n_kept"),
        (F.size(lines_arr) - F.size(kept)).cast("bigint").alias("n_removed"),
        n_sent.alias("n_sentences"),
        page_ok.cast("int").alias("keep"),
    )


def _unit_repetition(
    units: DataFrame, id_col: str, prefix: str
) -> DataFrame:
    """Per-document repetition aggregates over one unit granularity.

    ``units`` is (``id_col``, ``u``) with one row per unit OCCURRENCE.
    Returns (id, n_<prefix>s, dup_<prefix>_frac, dup_<prefix>_char_frac)
    where dup_frac = fraction of unit occurrences that are repeats
    (1 − distinct/total) and dup_char_frac = characters inside the
    occurrences AFTER the first of each distinct unit / total unit
    characters — the Gopher "fraction of characters in duplicate
    lines/paragraphs" signal.

    Scale shape: explode → count per (id, unit) → per-id aggregate.
    Both shuffles carry the document id in the key and both are
    partial-aggregating (map-side combine), so a degenerate document
    that repeats one line a million times costs its shuffle share —
    there is no per-key window and no hot-unit reducer.
    """
    per_unit = (
        units.groupBy(id_col, "u")
        .agg(F.count(F.lit(1)).alias("occ"))
        .withColumn("len", F.length("u").cast("bigint"))
    )
    per_doc = per_unit.groupBy(id_col).agg(
        F.sum("occ").cast("bigint").alias("n_units"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum((F.col("occ") - 1) * F.col("len")).cast("bigint").alias("dup_chars"),
        F.sum(F.col("occ") * F.col("len")).cast("bigint").alias("total_chars"),
    )
    total = F.col("n_units").cast("double")
    chars = F.col("total_chars").cast("double")
    return per_doc.select(
        F.col(id_col),
        F.col("n_units").alias(f"n_{prefix}s"),
        F.round(
            F.when(
                F.col("n_units") > 0, F.lit(1.0) - F.col("n_distinct") / total
            ).otherwise(F.lit(0.0)),
            6,
        ).alias(f"dup_{prefix}_frac"),
        F.round(
            F.when(
                F.col("total_chars") > 0, F.col("dup_chars") / chars
            ).otherwise(F.lit(0.0)),
            6,
        ).alias(f"dup_{prefix}_char_frac"),
    )


def line_repetition_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
    para_sep: str = "\n\n",
) -> DataFrame:
    """Gopher-style line/paragraph repetition battery (the public
    repetition filters of Rae et al. 2021 §A1.1, complementing the word
    n-gram signals in :func:`..text.repetition_features`): per document

      - ``n_lines``, ``dup_line_frac``, ``dup_line_char_frac``
      - ``n_paras``, ``dup_para_frac``, ``dup_para_char_frac``

    ``dup_*_frac`` is the fraction of unit occurrences that are repeats
    of an earlier unit in the same document; ``dup_*_char_frac`` is the
    fraction of unit characters sitting inside those repeat occurrences.
    Pretraining curation drops documents above thresholds on any of the
    six (boilerplate chrome and degenerate generation loops score high;
    exact/near dedup never sees them because the document as a whole is
    unique).

    Empty units (the artifacts of splitting a ``para_sep`` boundary by
    ``line_sep``) are dropped before counting on BOTH granularities, so
    paragraph boundaries do not count as duplicate empty lines.

    Returns one row per input document (documents with no units score
    0.0 on every fraction).  Separators are literal strings, not
    regexes (module-wide contract, see :func:`_split_lit`).
    """
    base = docs.select(F.col(id_col).cast("bigint").alias("id"), F.col(text_col))
    # array_remove, not the filter HOF: same result (split yields no
    # NULL elements), but the HOF lambda is CodegenFallback while
    # array_remove stays inside whole-stage codegen
    nonempty = lambda arr: F.array_remove(arr, "")  # noqa: E731
    lines = base.select(
        "id", F.explode(nonempty(_split_lit(text_col, line_sep))).alias("u")
    )
    paras = base.select(
        "id", F.explode(nonempty(_split_lit(text_col, para_sep))).alias("u")
    )
    line_feats = _unit_repetition(lines, "id", "line")
    para_feats = _unit_repetition(paras, "id", "para")
    zero = F.lit(0.0)
    return (
        base.select("id")
        .join(line_feats, "id", "left")
        .join(para_feats, "id", "left")
        .select(
            "id",
            F.coalesce("n_lines", F.lit(0)).cast("bigint").alias("n_lines"),
            F.coalesce("dup_line_frac", zero).alias("dup_line_frac"),
            F.coalesce("dup_line_char_frac", zero).alias("dup_line_char_frac"),
            F.coalesce("n_paras", F.lit(0)).cast("bigint").alias("n_paras"),
            F.coalesce("dup_para_frac", zero).alias("dup_para_frac"),
            F.coalesce("dup_para_char_frac", zero).alias("dup_para_char_frac"),
        )
    )


def dedup_lines_within_doc(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """INTRA-document line dedup: keep the FIRST occurrence of each
    distinct line within a document, preserving order — the in-page
    cleanup pass for repeated chrome inside ONE page (a menu block
    rendered top and bottom, duplicated cookie banners), complementary
    to :func:`strip_boilerplate`'s cross-corpus frequency rule, which
    cannot see a line that repeats only within a single document.

    Pure array math over one split — a map-side projection with ZERO
    shuffles (the per-line first-occurrence test is
    ``array_position(lines, x) == index``), so at 100 TB the stage
    fuses into the scan.  The position scan is O(lines²) per document,
    fine at page-scale line counts (tens to hundreds).

    Returns (id, clean_text, n_kept, n_removed)."""
    arr = _split_lit(text_col, sep)
    kept = F.filter(arr, lambda x, i: F.array_position(arr, x) == i + 1)
    return docs.select(
        F.col(id_col),
        F.array_join(kept, sep).alias("clean_text"),
        F.size(kept).cast("bigint").alias("n_kept"),
        (F.size(arr) - F.size(kept)).cast("bigint").alias("n_removed"),
    )


#: Packed (doc_id, pos) order key domain: positions occupy the low
#: POS_DOMAIN range, so keep-first order is doc_id-major.  One bigint
#: key instead of a struct keeps the min-aggregate and its external-SQL
#: replay bit-identical with no struct-ordering semantics to match.
_POS_DOMAIN = 1_000_000

#: Largest |doc_id| whose packed key ``id * _POS_DOMAIN + pos`` still
#: fits int64 for every in-domain pos.
_MAX_PACK_ID = (2**63 - 1) // _POS_DOMAIN


def dedup_units_across_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    hash_units: bool = False,
) -> DataFrame:
    """CORPUS-wide keep-first unit dedup (the CCNet paragraph-dedup
    pass): split every document into units on the literal ``sep``
    (paragraphs by default, lines with ``sep="\\n"``), keep each
    distinct unit's FIRST occurrence in (doc_id, position) order, drop
    every later occurrence anywhere in the corpus, and reassemble each
    document from its surviving units in original order.  Unlike
    :func:`strip_boilerplate` (frequency threshold, removes ALL
    occurrences including the first) this is an order-respecting dedup:
    exactly one copy of every distinct unit survives somewhere.

    Blank units (split artifacts, empty paragraphs) are dropped before
    dedup on both sides of the math — they are separators' residue, not
    content, and keep-first over them would teleport one doc's blank
    line into another's count.

    Returns (id, clean_text, n_units, n_kept, n_removed) — one row per
    input document, ``n_units`` the non-blank unit count before dedup.

    Scale shape: occurrence rows ∝ corpus units.  The keeper table is a
    partial-aggregating ``groupBy(unit).agg(min(key))`` — NO per-key
    window, so a paragraph duplicated a hundred million times costs its
    shuffle share (the round-12 skew-safe keep-first rule); the
    join-back is an equi join AQE can skew-split.  Reassembly is a
    per-doc ``collect_list`` bounded by document size.  At 100 TB pass
    ``hash_units=True`` to shuffle/join on ``xxhash64(unit)`` (8
    bytes/key) instead of the unit text — the :func:`boilerplate_lines`
    fingerprint substitution, 64-bit collision-safe at corpus scale.

    Position contract: per-document unit positions must stay below
    1e6 (the packed order-key domain) — far above any page-scale
    document; ids must fit ``id * 1e6`` in int64.  ENFORCED: a
    document with >= 1e6 units or an id beyond the packable range
    raises (``raise_error`` fused into the key projection, so it
    cannot be pruned away) instead of silently bleeding into the next
    id's key range and corrupting keep-first order."""
    base = docs.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(text_col)
    )
    units_arr = F.array_remove(_split_lit(text_col, sep), "")
    occ = base.select(
        "id",
        F.posexplode(units_arr).alias("pos", "u"),
    ).select(
        "id",
        "pos",
        "u",
        # explicit two-sided range check, NOT abs(): non-ANSI
        # abs(Long.MIN_VALUE) overflows back negative, so id = -2^63
        # would pass an abs guard and okey = id*1e6+pos would then
        # overflow silently — the same abs-overflow class fixed in
        # importance.py (round-13 advice item, closed round 14)
        F.when(
            (F.col("pos") >= F.lit(_POS_DOMAIN))
            | (F.col("id") > F.lit(_MAX_PACK_ID))
            | (F.col("id") < F.lit(-_MAX_PACK_ID)),
            F.raise_error(
                F.format_string(
                    "dedup_units_across_corpus packed-key contract: "
                    "pos=%s (must be < 1000000) id=%s (|id| must be <= "
                    f"{_MAX_PACK_ID})",
                    F.col("pos"),
                    F.col("id"),
                )
            ).cast("bigint"),
        )
        .otherwise(F.col("id") * F.lit(_POS_DOMAIN) + F.col("pos"))
        .alias("okey"),
        (F.xxhash64("u") if hash_units else F.col("u")).alias("ukey"),
    )
    keepers = occ.groupBy("ukey").agg(F.min("okey").alias("keep_key"))
    kept = (
        occ.join(keepers, "ukey")
        .filter(F.col("okey") == F.col("keep_key"))
        .select("id", "pos", "u")
    )
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("u")))
                ),
                lambda s: s["u"],
            ),
            sep,
        ).alias("clean_text"),
    )
    totals = base.select(
        "id", F.size(units_arr).cast("bigint").alias("n_units")
    )
    return (
        totals.join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_units",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            (
                F.col("n_units")
                - F.coalesce("n_kept", F.lit(0)).cast("bigint")
            ).alias("n_removed"),
        )
    )
