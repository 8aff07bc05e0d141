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
