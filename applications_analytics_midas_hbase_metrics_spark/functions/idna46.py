"""UTS-46-style IDN host encoding (non-transitional) — pure Python,
shared by the web family's host normalizer (operators.web.punycode_host)
and the PSL loader's A-label rule twins (operators.web_psl).

Why not the stdlib ``idna`` codec: that codec implements IDNA 2003
(nameprep), whose mapping diverges from what every modern browser and
resolver does (UTS #46, non-transitional processing) on a small set of
codepoints — most famously the DEVIATION set:

  ==========  ==========================  =======================
  codepoint   IDNA 2003 (stdlib codec)    UTS-46 non-transitional
  ==========  ==========================  =======================
  U+00DF ß    folds to ``ss``             kept (``xn--zca``)
  U+03C2 ς    folds to ``σ``              kept (distinct A-label)
  U+200C ZWNJ deleted                     kept (CONTEXTJ)
  U+200D ZWJ  deleted                     kept (CONTEXTJ)
  ==========  ==========================  =======================

plus U+1E9E (capital sharp S), which UTS-46 maps to ``ß`` while IDNA
2003 folds it to ``ss``.

Implementation note (honest scope): the mapping step approximates the
published IdnaMappingTable as ``NFKC → full case fold → NFKC`` with the
deviation codepoints protected and U+1E9E pre-mapped — exactly the
composition the table is generated from for the mapped/valid classes.
The table's *disallowed*-class enforcement (symbols, punctuation) and
the CONTEXTJ join-type checks are NOT replicated: a crawl normalizer
must never error a 100 TB pass, so anything the punycode step cannot
encode (or that violates the 63-octet label bound) falls back to the
raw host — the same graceful-degradation contract the IDNA-2003 path
had.  Hosts valid under UTS-46 encode exactly as a browser would;
the IDNA-2003 delta is the table above.

Public references: UTS #46 (unicode.org/reports/tr46), RFC 3492
(punycode, via the stdlib ``punycode`` codec), RFC 5890 (A/U-labels).
"""

from __future__ import annotations

import unicodedata

#: UTS-46 deviation codepoints — kept verbatim under non-transitional
#: processing (IDNA 2003 / transitional folds or deletes them).
UTS46_DEVIATIONS = frozenset("ßς‌‍")

#: Max octets in one A-label (RFC 5890 / DNS label bound).
_MAX_LABEL_OCTETS = 63


def uts46_map(s: str) -> str:
    """The UTS-46 mapping step (non-transitional): NFKC-compatibility
    map + full case fold with deviation codepoints preserved, plus the
    ideographic label separators mapped to ``.``.

    NFKC alone folds U+FF0E fullwidth full stop to ``.`` and U+FF61
    halfwidth ideographic full stop to U+3002 — but U+3002 IDEOGRAPHIC
    FULL STOP itself is NFKC-stable, while the IdnaMappingTable maps it
    to ``.``; the explicit replace after normalization closes exactly
    that gap (and catches U+FF61 via its NFKC image), so
    ``example。com`` splits into two labels like every browser does."""
    s = s.replace("ẞ", "ß")  # capital sharp S -> ß per table
    s = unicodedata.normalize("NFKC", s)
    folded = "".join(
        ch if ch in UTS46_DEVIATIONS else ch.casefold() for ch in s
    )
    return unicodedata.normalize("NFKC", folded).replace("。", ".")


def uts46_label_to_ascii(label: str) -> str:
    """One U-label → A-label (``xn--`` + punycode); ASCII labels pass
    through already-mapped.  Raises UnicodeError/ValueError on labels
    punycode cannot carry or that exceed the DNS label bound — callers
    decide the fallback policy."""
    if label.isascii():
        return label
    ace = "xn--" + label.encode("punycode").decode("ascii")
    if len(ace) > _MAX_LABEL_OCTETS:
        raise ValueError(f"A-label exceeds {_MAX_LABEL_OCTETS} octets")
    return ace


def uts46_host_to_ascii(host: str) -> str:
    """Whole host → ASCII form under the UTS-46-style mapping.  Label
    separator is ``.`` — by the time labels split, :func:`uts46_map`
    has folded every ideographic/fullwidth dot variant (U+3002, U+FF0E,
    U+FF61) to ASCII ``.``.  Raises on unencodable labels — callers
    fall back to the raw host."""
    mapped = uts46_map(host)
    return ".".join(uts46_label_to_ascii(lab) for lab in mapped.split("."))
