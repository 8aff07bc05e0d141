"""URL/domain-aware web curation: canonical host extraction, a simple
documented registrable-domain rule, the deterministic per-domain cap,
and per-domain rollups — the C4-style (Raffel et al. 2020) /
RefinedWeb-style (Penedo et al. 2023) stage a 100 TB web pipeline runs
right after HTML extraction: cap documents per registrable domain so
no single site dominates the mix, and track per-domain quality/volume
for the mixture stage.

Spark-first shape:

* host/domain are ONE map-side regexp/string projection (no UDF, no
  shuffle) — at 100 TB they fuse into the extraction scan stage;
* the cap never globally sorts: it is the two-phase broadcast top-K
  (``operators.sampling.top_k_per_group`` — partition-local window
  prunes to ≤ N per (domain, task), tiny winner set broadcast back as
  a semi join), keyed on an engine-exact multiplicative hash of the
  doc id so "which N documents survive" is reproducible across runs
  and engines with no RNG;
* the rollup is one partial-aggregated groupBy(domain).

Extension surface (no counterpart in the reference — the reference's
ingest is HBase metrics, reference Utils.scala:1-876 has no web
stage); semantics follow the public C4/RefinedWeb recipes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .sampling import _MIX_DOMAIN, _SHARD_PRIME, top_k_per_group

#: Multi-label public suffixes the simple registrable-domain rule
#: recognizes: for these, the registrable domain is the last THREE
#: host labels (site.co.uk), otherwise the last two (site.com).  A
#: DELIBERATELY small, documented subset of the Public Suffix List —
#: production swaps in the full PSL as a broadcast join table (a few
#: thousand rows), which is the identical operator shape: the rule
#: below is a broadcast lookup on the last-2-label string either way.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in",
    "co.nz", "net.nz", "org.nz",
    "co.za", "org.za", "web.za",
    "com.mx", "com.ar", "com.tr", "com.tw", "co.kr", "or.kr",
    "com.sg", "com.hk", "com.my", "co.id", "co.th",
)


def host_expr(url_col: str | Column) -> Column:
    """Canonical host of a raw URL, as one chain of JVM string ops:
    drop the scheme (``http://``, ``HTTPS://``, any RFC-3986 scheme),
    cut the authority at the first ``/``, ``?`` or ``#``, drop
    userinfo (everything through the last ``@`` of the authority) and
    a trailing ``:port``, lowercase, strip ONE leading ``www.`` and
    any trailing dot.  IPv6 bracket hosts pass through as opaque keys
    (the port strip only matches ``:digits`` after the closing ``]``,
    and no bracket host can start with ``www.`` or end with ``.``).
    Unicode (IDN) hosts arrive as-is here — compose with
    :func:`punycode_host` / ``with_domain(idn=True)`` when the corpus
    mixes ``xn--`` and Unicode spellings of the same host.  NULL/empty
    URLs yield an empty host rather than NULL so downstream group keys
    are total."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    h = F.regexp_replace(
        F.coalesce(c, F.lit("")), r"^[A-Za-z][A-Za-z0-9+.\-]*://", ""
    )
    h = F.regexp_extract(h, r"^([^/?#]*)", 1)  # authority only
    h = F.regexp_replace(h, r"^.*@", "")  # userinfo (last @ wins, RFC 3986)
    h = F.regexp_replace(h, r":\d*$", "")  # port (possibly empty)
    h = F.lower(F.trim(h))
    h = F.regexp_replace(h, r"^www\.", "")
    return F.regexp_replace(h, r"\.$", "")


def registrable_domain_expr(host_col: str | Column) -> Column:
    """Registrable domain of a canonical host: the last two labels,
    or the last three when the last-two string is a known multi-label
    public suffix (:data:`MULTI_LABEL_SUFFIXES`) — ``a.b.site.co.uk``
    → ``site.co.uk``, ``blog.site.com`` → ``site.com``.  Hosts with
    fewer than two labels (``localhost``, empty) pass through
    unchanged, and so do IP-literal authorities — an IPv4 dotted quad
    or a ``[``-bracketed IPv6 host is its own opaque domain key (the
    label rule would otherwise shear ``1.2.3.4`` into ``3.4`` and
    mangle ``[::ffff:1.2.3.4]``; round-12 fix).  Pure array math over
    one split — no UDF, no lookup join at this suffix-set size (the
    literal IN list compiles into the projection)."""
    h = F.col(host_col) if isinstance(host_col, str) else host_col
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.slice(parts, -2, 2))
    last3 = F.concat_ws(".", F.slice(parts, -3, 3))
    opaque = h.startswith("[") | h.rlike(r"^(\d{1,3}\.){3}\d{1,3}$")
    return (
        F.when(opaque, h)
        .when((n >= 3) & last2.isin(*MULTI_LABEL_SUFFIXES), last3)
        .when(n >= 2, last2)
        .otherwise(h)
    )


def punycode_host(
    host_col: str | Column, mode: str = "uts46"
) -> Column:
    """IDN normalization of a canonical host: Unicode labels →
    punycode (``xn--``) via ToASCII, so ``münchen.de`` and
    ``xn--mnchen-3ya.de`` — two crawls' spellings of the SAME host —
    dedup and cap as one domain.  Already-ASCII hosts (the vast
    majority of any crawl) short-circuit inside the Arrow batch with a
    single ``isascii()`` check, so the Python cost is paid only on the
    IDN slice; hosts the encoder rejects (over-long labels, stray
    whitespace) fall back to their raw form rather than erroring a
    100 TB pass.  The one Python boundary in the web family — a
    vectorized pandas UDF, applied to the host projection, never to
    payloads.

    ``mode`` (round 14 — closes the round-13 UTS-46 gap):

    * ``"uts46"`` (default): UTS #46 non-transitional-style mapping
      (functions.idna46) — matches modern browser/resolver A-labels,
      including the deviation codepoints the legacy codec mangles
      (``ß`` → ``xn--zca…`` not ``ss``, final sigma kept, ZWNJ/ZWJ
      kept).  Cross-SYSTEM host parity with a UTS-46 resolver holds.
    * ``"idna2003"``: Python's legacy ``idna`` codec, kept for
      reproducing pre-round-14 host keys; the per-codepoint delta is
      tabulated in functions/idna46.py's module docstring."""
    if mode not in ("uts46", "idna2003"):
        raise ValueError(f"unknown IDN mode {mode!r}")
    use_uts46 = mode == "uts46"

    @pandas_udf("string")
    def _puny(s: pd.Series) -> pd.Series:
        from ..functions.idna46 import uts46_host_to_ascii

        def enc(h):
            if h is None or h.isascii():
                return h
            try:
                if use_uts46:
                    return uts46_host_to_ascii(h)
                return h.encode("idna").decode("ascii")
            except (UnicodeError, ValueError):
                return h

        return s.map(enc)

    c = F.col(host_col) if isinstance(host_col, str) else host_col
    return _puny(c)


def with_domain(
    df: DataFrame,
    url_col: str = "url",
    host_out: str = "host",
    domain_out: str = "domain",
    idn: bool = False,
) -> DataFrame:
    """Attach canonical ``host`` and registrable ``domain`` columns —
    the projection every downstream domain stage (cap, stats, mixture)
    keys on.  ``idn=True`` additionally punycode-normalizes the host
    (:func:`punycode_host`) so Unicode and ``xn--`` spellings agree —
    off by default to keep the default path pure-JVM."""
    h = host_expr(url_col)
    if idn:
        h = punycode_host(h)
    out = df.withColumn(host_out, h)
    return out.withColumn(domain_out, registrable_domain_expr(host_out))


def _cap_order(id_col: str) -> Column:
    """Engine-exact deterministic order key for the per-domain cap:
    the Fibonacci-style multiplicative hash over the doc id (same
    exact-int64 arithmetic as sampling.fibonacci_bucket, SHARD prime
    so the survivor set is decorrelated from mixture keep-decisions),
    tie-broken by the unique id itself.  Replayable bit-for-bit in any
    SQL engine — no RNG, no engine-private hash."""
    h = F.pmod(
        F.pmod(F.col(id_col).cast("bigint"), F.lit(_MIX_DOMAIN))
        * F.lit(_SHARD_PRIME),
        F.lit(_MIX_DOMAIN),
    )
    return F.struct(h.alias("h"), F.col(id_col).cast("bigint").alias("i"))


def domain_cap(
    df: DataFrame,
    n: int,
    domain_col: str = "domain",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``n`` documents per registrable domain, chosen by
    deterministic hash order over the doc id — the C4/RefinedWeb
    anti-boilerplate cap that stops one templated site from dominating
    a 100 TB crawl.  Input must already carry ``domain_col`` (see
    :func:`with_domain`).

    Scale shape: delegates to the two-phase top-K — a partition-local
    window leaves ≤ n candidates per (domain, task), the global winner
    set (n × |domains| rows) resolves on that pruned frame and comes
    back as a BROADCAST semi join, so the corpus-side pass is
    map-side; there is never a global sort and never an all-to-one
    window."""
    tagged = df.withColumn("_cap_ord", _cap_order(id_col))
    return top_k_per_group(tagged, domain_col, "_cap_ord", n).drop(
        "_cap_ord"
    )


def domain_stats(
    df: DataFrame,
    domain_col: str = "domain",
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain rollup feeding the mixture stage: document count,
    distinct hosts, total text chars, and the corpus share — one
    partial-aggregated groupBy plus a broadcast-hinted 1-row total (the
    repo's scalar-crossJoin convention).  Returns (domain, n_docs,
    n_hosts, total_chars, doc_share)."""
    per = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct(host_col).cast("bigint").alias("n_hosts"),
        F.sum(F.length(F.col(text_col))).cast("bigint").alias("total_chars"),
    )
    total = df.select(
        F.count(F.lit(1)).cast("double").alias("_total_docs")
    )
    return per.crossJoin(F.broadcast(total)).select(
        domain_col,
        "n_docs",
        "n_hosts",
        "total_chars",
        F.round(F.col("n_docs") / F.col("_total_docs"), 6).alias(
            "doc_share"
        ),
    )


def canonical_url_expr(url_col: str | Column) -> Column:
    """Aggressive crawl-dedup URL canonicalization — the key URL-level
    exact dedup groups on (two crawls of ``HTTP://www.Site.com/p/?b=2&a=1#top``
    and ``http://site.com/p?a=1&b=2`` are the same fetch):

    * scheme lowercased, missing scheme -> ``http``;
    * host through :func:`host_expr` (userinfo/port dropped, lowercase,
      one leading ``www.`` and trailing dot stripped);
    * fragment dropped;
    * query parameters SORTED (order never changes the resource) and
      empty params dropped; an empty query drops its ``?``;
    * trailing ``/`` runs stripped from the path.

    Dropping ports entirely is the deliberate aggressive choice (a
    crawl that needs port-distinct origins removes that rule); all
    string ops are one map-side JVM projection."""
    c = F.coalesce(
        F.col(url_col) if isinstance(url_col, str) else url_col, F.lit("")
    )
    scheme = F.lower(
        F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    scheme = F.when(scheme == "", F.lit("http")).otherwise(scheme)
    rest = F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    after_auth = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_replace(
        F.regexp_extract(after_auth, r"^([^?#]*)", 1), r"/+$", ""
    )
    query = F.regexp_extract(after_auth, r"\?([^#]*)", 1)
    params = F.filter(F.split(query, "&"), lambda p: p != F.lit(""))
    qsorted = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host_expr(c),
        path,
        F.when(qsorted != "", F.concat(F.lit("?"), qsorted)).otherwise(
            F.lit("")
        ),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level exact dedup: keep the lowest-id document per
    CANONICAL URL (:func:`canonical_url_expr`) — the first dedup pass
    of a crawl pipeline, upstream of any content hashing, since two
    fetches of the same canonical URL are duplicates before their
    bytes are even compared.  Returns the surviving rows plus their
    ``canonical_url``.

    URL-less rows (NULL/empty URL, i.e. an empty canonical host) pass
    through UNCHANGED, one survivor each: their canonical form
    degenerates to the single key ``http://``, and deduping on that
    would silently drop every URL-less document but one on a
    partially-URL'd corpus.  Their dedup key is salted with the unique
    id (``\\x00`` prefix — unreachable from any real canonical URL, so
    no collision with the URL'd keys).

    Hot-key shape (rewritten round 12, with dedup.drop_exact_duplicates):
    ``groupBy(key).agg(min_by(row, id))``, not a ``row_number`` window —
    a canonical URL fetched tens of millions of times is this operator's
    target workload, and min_by's map-side partial merge hands the
    reducer one candidate per key per map partition instead of
    serializing the whole hot group through one task's window sort."""
    tagged = df.withColumn("canonical_url", canonical_url_expr(url_col))
    key = F.when(
        host_expr(url_col) == "",
        F.concat(F.lit("\x00"), F.col(id_col).cast("string")),
    ).otherwise(F.col("canonical_url"))
    row = F.struct(*[F.col(c) for c in tagged.columns])
    return (
        tagged.groupBy(key.alias("_k"))
        .agg(F.min_by(row, F.col(id_col)).alias("_r"))
        .select("_r.*")
    )


def domain_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    domain_col: str = "domain",
) -> DataFrame:
    """Drop documents whose registrable domain is on a blocklist — the
    spam/adult/SEO-farm domain drop every crawl pipeline runs right
    after domain extraction.  The blocklist is curated data (thousands
    to low millions of rows — UT1-style category lists), so it rides
    BROADCAST as an ANTI join and the corpus-side pass stays map-side;
    a blocklist too large to broadcast degrades to a shuffled anti
    join on ``domain`` under AQE with the same semantics.  Input must
    already carry ``domain_col`` (see :func:`with_domain`); match is
    exact on the registrable domain, so blocking ``spam.com`` blocks
    ``www.spam.com`` and ``a.spam.com`` (they canonicalize to the same
    registrable domain) but not ``notspam.com``."""
    bl = blocklist.select(F.col("domain").alias(domain_col)).distinct()
    return df.join(F.broadcast(bl), domain_col, "left_anti")
