"""Property-based tests (hypothesis) for the parity-critical primitives:
salt hash, trailing-empty split, blob codec.  Spark round-trips run on
batched examples to keep job count low."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from applications_analytics_midas_hbase_metrics_spark.functions import keys as K

# text without surrogates (Spark/Java strings are UTF-8 encodable here)
safe_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
)
ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)


@given(safe_text)
@settings(max_examples=300, deadline=None)
def test_java_hash_py_is_int32(s):
    h = K.java_hash_py(s)
    assert -(2**31) <= h < 2**31


@given(safe_text)
@settings(max_examples=300, deadline=None)
def test_salt_py_in_range(s):
    # abs after mod (Utils.scala:94): every key, any hash sign → 0..23
    assert 0 <= K.salt_py(s) < K.SALT_BUCKETS


@given(ascii_text)
@settings(max_examples=100, deadline=None)
def test_duckdb_salt_matches_python(s):
    con = duckdb.connect()
    quoted = "'" + s.replace("'", "''") + "'"
    got = con.execute("SELECT " + K.duckdb_salt_sql(quoted)).fetchone()[0]
    assert got == K.salt_py(s), s


@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=8,
        ),
        max_size=6,
    )
)
@settings(max_examples=50, deadline=None)
def test_join_split_roundtrip_py(parts):
    # python-level model of row_key/split_preserve: \x00-join then
    # limit=-1 split must round-trip any field list (incl. trailing "")
    joined = "\x00".join(parts)
    if parts:
        assert joined.split("\x00") == parts


def test_spark_hash_matches_python_on_random_batch(spark):
    import random

    rng = random.Random(7)
    alphabet = "abcXYZ019 _é中"
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(s,) for s in cases], ["k"])
    rows = df.select("k", K.java_hash("k").alias("h"), K.salt_bucket("k").alias("s")).collect()
    for r in rows:
        assert r.h == K.java_hash_py(r.k), repr(r.k)
        assert r.s == K.salt_py(r.k), repr(r.k)


def test_simhash_banding_equals_brute_force_random(spark):
    # pigeonhole recall guarantee, property-checked: banded blocking over
    # random 32-bit fingerprints must find EXACTLY the brute-force pair
    # set at every max_hamming the band layout covers
    import itertools
    import random

    from applications_analytics_midas_hbase_metrics_spark.operators import dedup as D

    rng = random.Random(13)
    # clustered fingerprints so near pairs actually occur
    seeds = [rng.getrandbits(32) for _ in range(6)]
    fps = []
    for i in range(120):
        base = seeds[i % len(seeds)]
        flips = rng.sample(range(32), rng.randrange(0, 5))
        v = base
        for b in flips:
            v ^= 1 << b
        fps.append((i, v))
    df = spark.createDataFrame(fps, "id long, simhash long")
    for max_h in (1, 3):
        got = {
            (r.id_a, r.id_b)
            for r in D.simhash_pairs_from_fingerprints(
                df, bits=32, max_hamming=max_h
            ).collect()
        }
        want = {
            (a, b)
            for (a, va), (b, vb) in itertools.combinations(fps, 2)
            if bin(va ^ vb).count("1") <= max_h
        }
        assert got == want, f"max_hamming={max_h}"


def test_top_k_per_group_equals_brute_force_random(spark):
    import random

    from applications_analytics_midas_hbase_metrics_spark.operators.sampling import top_k_per_group

    rng = random.Random(17)
    rows = [(i, rng.choice("pqrs")) for i in rng.sample(range(10000), 400)]
    df = spark.createDataFrame(rows, ["doc_id", "source"]).repartition(16)
    got = sorted((r.source, r.doc_id) for r in top_k_per_group(df, "source", "doc_id", 7).collect())
    want = []
    by_g: dict[str, list[int]] = {}
    for i, g in rows:
        by_g.setdefault(g, []).append(i)
    for g, ids in by_g.items():
        want += [(g, i) for i in sorted(ids)[:7]]
    assert got == sorted(want)


def test_scrub_pii_matches_python_re_on_random_batch(spark):
    """Cross-dialect regex property: Spark's Java-regex scrub must agree
    with Python re (a third dialect) on generated text mixing real
    emails/phones, near-misses, and noise — match boundaries, counts,
    and replacement output all compared."""
    import random
    import re

    from applications_analytics_midas_hbase_metrics_spark.operators import text as T

    rng = random.Random(23)
    pieces = [
        "a@b.io", "x.y+z@mail-host.org", "user99@example.com",  # emails
        "a@b", "@nope", "a@@b.com", "a@.com",                   # near-misses
        "555-123-4567", "123.456.7890", "555-12-4567",          # phone + near
        "10.0.3.77", "192.168.1.1", "1.2.3", "1.2.3.4.5",       # ip + near
        "v1.2", "8.8.8.8:53",
        "plain", "words", "12345", "-", ".", "@",
    ]
    cases = [
        " ".join(rng.choice(pieces) for _ in range(rng.randrange(0, 8)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], ["doc_id", "text"])
    got = {r.id: r for r in T.scrub_pii(df).collect()}
    email, phone = re.compile(T.EMAIL_RE), re.compile(T.PHONE_RE)
    ip = re.compile(T.IPV4_RE)
    for i, s in enumerate(cases):
        want = ip.sub("<IP>", phone.sub("<PHONE>", email.sub("<EMAIL>", s)))
        assert got[i].text == want, s
        assert got[i].n_emails == len(email.findall(s)), s
        assert got[i].n_phones == len(phone.findall(s)), s
        assert got[i].n_ips == len(ip.findall(s)), s


def test_scrub_pii_idempotent(spark):
    """Scrubbing already-scrubbed text is a no-op: the placeholders must
    not themselves match either pattern."""
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "mail a@b.io or 555-123-4567 from 10.0.0.1 twice a@b.io")],
        ["doc_id", "text"],
    )
    once = T.scrub_pii(df).select(F.col("id").alias("doc_id"), "text")
    twice = T.scrub_pii(once).first()
    assert twice.text == "mail <EMAIL> or <PHONE> from <IP> twice <EMAIL>"
    assert twice.n_emails == 0 and twice.n_phones == 0 and twice.n_ips == 0


def test_repetition_features_match_python_model(spark):
    """Distributed per-doc n-gram mode vs a brute-force Python model on
    random token streams: totals, duplicate fraction, and top fraction
    must agree exactly (modulo the 6-decimal rounding both apply)."""
    import collections
    import random

    from applications_analytics_midas_hbase_metrics_spark.operators import text as T

    rng = random.Random(29)
    vocab = ["aa", "bb", "cc", "dd"]
    cases = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 12)))
        for _ in range(150)
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], ["doc_id", "text"])
    got = {r.id: r for r in T.repetition_features(df).collect()}
    for i, s in enumerate(cases):
        toks = [t for t in s.lower().split() if t]
        grams = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        assert got[i].n_grams == len(grams), s
        if grams:
            counts = collections.Counter(grams)
            assert got[i].dup_ngram_frac == round(1 - len(counts) / len(grams), 6), s
            assert got[i].top_ngram_frac == round(max(counts.values()) / len(grams), 6), s
        else:
            assert got[i].dup_ngram_frac == 0.0 and got[i].top_ngram_frac == 0.0


def test_ngram_decontaminate_matches_python_model(spark):
    """Distributed decontamination (broadcast gram join + one groupBy)
    vs a brute-force Python set model on random token streams: distinct
    gram counts, hit counts, and the contaminated flag must agree."""
    import random

    from applications_analytics_midas_hbase_metrics_spark.operators import text as T

    rng = random.Random(37)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    def stream():
        return " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 14)))

    corpus = [(i, stream()) for i in range(120)]
    bench = [(1000 + i, stream()) for i in range(15)]
    n = 3

    def grams(s):
        toks = [t for t in s.lower().split() if t]
        return {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}

    bench_grams = set().union(*(grams(s) for _, s in bench))
    cdf = spark.createDataFrame(corpus, ["doc_id", "text"])
    bdf = spark.createDataFrame(bench, ["doc_id", "text"])
    got = {r.id: r for r in T.ngram_decontaminate(cdf, bdf, n=n).collect()}
    assert len(got) == len(corpus)
    for i, s in corpus:
        g = grams(s)
        hits = len(g & bench_grams)
        assert got[i].n_grams == len(g), s
        assert got[i].n_hits == hits, s
        assert got[i].contaminated == (1 if hits else 0), s


def test_tokens_codegen_form_equals_filter_form(spark):
    """dedup.tokens' codegen-friendly collapse-trim-split must equal the
    direct filter(split(.., '\\s+')) form on adversarial whitespace:
    leading/trailing runs, tabs/newlines, unicode NBSP (which Java \\s
    does NOT match — both forms must keep it inside tokens), and
    empty/whitespace-only strings."""
    import random

    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators.dedup import tokens

    rng = random.Random(31)
    atoms = ["foo", "BAR", "b z", "1", "", " ", "  ", "\t", "\n", "\r\n"]
    cases = [
        "".join(rng.choice(atoms) for _ in range(rng.randrange(0, 10)))
        for _ in range(300)
    ] + ["", " ", "\t\n ", " ", "   "]
    df = spark.createDataFrame([(s,) for s in cases], ["text"])
    filter_form = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    rows = df.select(
        "text", tokens("text").alias("new"), filter_form.alias("old")
    ).collect()
    for r in rows:
        assert r.new == r.old, repr(r.text)


def test_spark_blob_codec_roundtrip_random(spark):
    import random

    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import cellstore as CS

    rng = random.Random(11)
    rows = []
    for _ in range(100):
        vals = sorted(
            "".join(rng.choice("abc0\x001") for _ in range(rng.randrange(1, 10)))
            for _ in range(rng.randrange(1, 6))
        )
        rows.append((vals,))
    df = spark.createDataFrame(rows, "values array<string>")
    out = df.select(
        "values",
        CS.decode_blob(CS.encode_blob("values")).alias("back"),
    ).collect()
    for r in out:
        # values containing raw newlines would not round-trip (reference
        # format limitation); our generator avoids \n, like the reference's
        # field contract
        assert r.back == r.values


# ---------------------------------------------------------------------------
# Binary media codecs (pure Python/numpy — no Spark jobs)
# ---------------------------------------------------------------------------

_dims = st.tuples(st.integers(1, 12), st.integers(1, 12))


@given(_dims, st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(dims, seed):
    import numpy as np

    from applications_analytics_midas_hbase_metrics_spark.operators import (
        multimodal as MM,
    )

    h, w = dims
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    d = MM.decode_png(MM.encode_png(px))
    assert (d["width"], d["height"]) == (w, h)
    # mean equality over all h*w*3 bytes == pixel-exact up to mean
    # collisions; combined with the filter cycle (rows hit all 5 types
    # as h grows) this pins every unfilter branch against its encoder
    assert abs(d["mean_byte"] - float(px.mean())) < 1e-9


@given(st.integers(1, 80), st.integers(1, 4), st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(n, ch, seed):
    import numpy as np

    from applications_analytics_midas_hbase_metrics_spark.operators import (
        multimodal as MM,
    )

    s = np.random.default_rng(seed).integers(-(2**15), 2**15, (n, ch)).astype(
        np.int16
    )
    d = MM.decode_wav(MM.encode_wav(s, 16000))
    assert (d["n_samples"], d["n_channels"]) == (n, ch)
    assert d["n_bytes"] == 44 + 2 * n * ch
    assert abs(d["mean_abs"] - float(np.abs(s.astype(np.int32)).mean())) < 1e-9


@given(
    st.lists(st.integers(0, 300), min_size=1, max_size=40),
    st.integers(1, 64),
)
@settings(max_examples=60, deadline=None)
def test_pack_chunk_arithmetic_property(token_counts, budget):
    """Pure-Python replay of emit_packed_chunks' interval math: chunks
    tile every pack exactly and conserve per-doc tokens for ANY corpus
    shape and budget (the Spark plan computes the same closed form)."""
    b = 0
    per_doc: dict[int, int] = {}
    per_pack: dict[int, int] = {}
    for i, n in enumerate(token_counts):
        if n > 0:
            for pk in range(b // budget, (b + n - 1) // budget + 1):
                lo, hi = max(b, pk * budget), min(b + n, (pk + 1) * budget)
                per_doc[i] = per_doc.get(i, 0) + (hi - lo)
                per_pack[pk] = per_pack.get(pk, 0) + (hi - lo)
        b += n
    for i, n in enumerate(token_counts):
        if n > 0:
            assert per_doc[i] == n
    if per_pack:
        last = max(per_pack)
        for pk, tot in per_pack.items():
            assert tot == budget or pk == last


def test_subvectors_concat_roundtrip_random(spark):
    """PQ's _subvectors must partition the vector exactly: for every
    divisible (d, m), concatenating the m subvectors reproduces the
    input, each slice is d/m wide, and nothing is dropped (the
    truncation bug the round-8 guard exists for, proven structurally
    on random vectors in one batched job)."""
    import random

    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators.similarity import (
        _subvectors,
    )

    rng = random.Random(7)
    cases = []
    rid = 0
    for d, m in ((8, 2), (8, 4), (12, 3), (64, 16), (64, 8), (6, 6), (5, 1)):
        for _ in range(4):
            cases.append((rid, m, [rng.uniform(-2, 2) for _ in range(d)]))
            rid += 1
    by_m = {}
    for r, m, v in cases:
        by_m.setdefault(m, []).append((r, v))
    for m, rows in by_m.items():
        df = spark.createDataFrame(rows, "rid int, v array<double>")
        out = df.select(
            "rid",
            "v",
            F.flatten(_subvectors(F.col("v"), m)).alias("back"),
            F.transform(_subvectors(F.col("v"), m), F.size).alias("widths"),
        ).collect()
        for r in out:
            assert r.back == r.v, (m, r.rid)
            assert all(w == len(r.v) // m for w in r.widths), (m, r.rid)


def test_winnow_guarantee_random_both_hashes(spark):
    """The winnowing guarantee on random corpora, for BOTH gram
    hashes: plant a shared substring of length >= k+w-1 into pairs of
    otherwise-random docs — every planted pair must share at least one
    fingerprint; unrelated random doc pairs (different alphabets) must
    not collide.  One batched job per hash_fn."""
    import random
    import string

    from applications_analytics_midas_hbase_metrics_spark.operators import text as T

    k, w = 8, 4
    rng = random.Random(11)

    def rand(alpha, n):
        return "".join(rng.choice(alpha) for _ in range(n))

    rows = []
    planted = []
    for i in range(12):
        shared = rand(string.ascii_lowercase, k + w - 1 + rng.randrange(6))
        a = rand(string.ascii_lowercase, rng.randrange(5, 25)) + " " + shared
        b = shared + " " + rand(string.ascii_lowercase, rng.randrange(5, 25))
        rows += [(2 * i, a), (2 * i + 1, b)]
        planted.append((2 * i, 2 * i + 1))
    # disjoint-alphabet controls: can share no 8-gram with the above
    rows += [(1000, rand("0123456789", 40)), (1001, rand("QRSTUV", 40))]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for hash_fn in ("java", "xxhash64"):
        fps = {}
        for r in T.winnow_fingerprints(docs, k=k, w=w, hash_fn=hash_fn).collect():
            fps.setdefault(r.id, set()).add(r.fp)
        for a, b in planted:
            assert fps[a] & fps[b], (hash_fn, a, b)
        assert not (fps[1000] & fps[1001]), hash_fn
        assert not (fps[0] & fps[1000]), hash_fn


def test_heavy_hitters_cms_verdicts_and_order(spark):
    """The CMS gate's contract on the smoke corpus: truth descending
    with the (count DESC, tok) tiebreak, every bound verdict ok (CMS
    never undercounts; eps*N caps the overcount), and the 8-shard
    merged sketch estimating IDENTICALLY to the one-pass sketch (CMS
    merge is exact counter addition at equal seed/width/depth)."""
    from applications_analytics_midas_hbase_metrics_spark.plans.queries_stats import (
        q_heavy_hitters_cms,
    )
    from tests.conftest import SF_SMOKE

    rows = q_heavy_hitters_cms(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    keys = [(-r.true_count, r.tok) for r in rows]
    assert keys == sorted(keys)
    assert all(r.bound_check == "ok" for r in rows), rows
    assert all(r.merge_check == "ok" for r in rows), rows


def test_exact_substring_dedup_matches_python_model(spark):
    """Full ExactSubstr semantics on a random corpus vs an independent
    Python reference: normalize, k-token shingles with char offsets,
    global frequency >= 2 marks every occurrence, merge intervals, cut
    — text_cut / cut_chars / n_spans must match byte-for-byte.  The
    tiny alphabet + short docs force heavy cross- and within-doc
    duplication, covering merge chains the fixture never hits."""
    import random
    import re

    from applications_analytics_midas_hbase_metrics_spark.operators import text as T

    rng = random.Random(77)
    vocab = ["aa", "bb", "cc", "dd"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 14))))
        for i in range(60)
    ]
    k = 3

    def model(corpus):
        shingled = {}  # doc -> list[(s, e, sh)]
        freq = {}
        for did, text in corpus:
            nm = re.sub(r"\s+", " ", text.lower()).strip()
            toks = nm.split(" ") if nm else []
            offs, cur = [], 1
            for t in toks:
                offs.append(cur)
                cur += len(t) + 1
            sp = []
            if nm and len(toks) >= k:
                for i in range(len(toks) - k + 1):
                    s = offs[i]
                    e = offs[i + k] - 2 if i + k < len(offs) else len(nm)
                    sh = nm[s - 1 : e]
                    sp.append((s, e, sh))
                    freq[sh] = freq.get(sh, 0) + 1
            shingled[did] = (nm, sp)
        out = {}
        for did, (nm, sp) in shingled.items():
            ivs = sorted((s, e) for s, e, sh in sp if freq[sh] >= 2)
            merged = []
            for s, e in ivs:
                if merged and s <= merged[-1][1] + 1:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e))
                else:
                    merged.append((s, e))
            kept, cur = [], 1
            cut = 0
            for s, e in merged:
                if s > cur:
                    kept.append(nm[cur - 1 : s - 1])
                cut += e - max(s, cur) + 1
                cur = max(cur, e + 1)
            kept.append(nm[cur - 1 :])
            out[did] = (len(ivs), cut, "".join(kept))
        return out

    want = model(rows)
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.id: (r.n_spans, r.cut_chars, r.text_cut)
        for r in T.exact_substring_dedup(docs, k=k).collect()
    }
    assert got == want
    # non-degenerate: the random corpus really has cuts AND survivors
    assert any(c > 0 for _, c, _ in want.values())
    assert any(c == 0 and t for _, c, t in want.values())


def test_html_extract_matches_python_model_on_random_markup(spark):
    """Regex-dialect triangulation for html_extract: random HTML-ish
    strings (broken tags, nested anchors, entities, unclosed blocks,
    comment edge cases) through Spark's Java regex must match an
    independent Python re model of the same chain — with the fixture
    oracle already pinning DuckDB's RE2, all three dialects agree on
    the shipped patterns.  ASCII alphabet by design: Java's \\s is
    ASCII-only while Python's is unicode, a KNOWN dialect split the
    operator never relies on."""
    import random
    import re

    from applications_analytics_midas_hbase_metrics_spark.operators import text as T

    ents = [
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ]

    def clean(x):
        x = re.sub(r"(?s)<[^>]*>", " ", x)
        for ent, ch in ents:
            x = x.replace(ent, ch)
        return re.sub(r"\s+", " ", x).strip()

    def model(html):
        nb = re.sub(r"(?is)<head[^>]*>.*?</head>", " ", html)
        nb = re.sub(r"(?is)<script[^>]*>.*?</script>", " ", nb)
        nb = re.sub(r"(?is)<style[^>]*>.*?</style>", " ", nb)
        nb = re.sub(r"(?s)<!--.*?-->", " ", nb)
        m = re.search(r"(?is)<title[^>]*>(.*?)</title>", html)
        anchors = re.findall(r"(?is)<a(?:\s[^>]*)?>(.*?)</a>", nb)
        text = clean(nb)
        link = sum(len(clean(a)) for a in anchors)
        return (
            clean(m.group(1)) if m else "",
            text,
            len(anchors),
            round(link / max(len(text), 1), 6),
        )

    rng = random.Random(1234)
    frags = [
        "<a href='x'>", "</a>", "<A>", "<script>", "</script>", "<ScRiPt a>",
        "<style>", "</style>", "<head>", "</head>", "<title>", "</title>",
        "<!--", "-->", "<b>", "</b>", "<", ">", "&amp;", "&lt;", "&nbsp;",
        "&amp;lt;", "word", "x y", "  ", "1", "/", '"', "'", "<p attr='v'>",
        # non-anchor a* tags: must NOT open an anchor (the '<a[^>]*>'
        # bug this model triangulates against)
        "<abbr>", "<aside>", "<article>", "<audio controls>", "</abbr>",
    ]
    rows = [
        (i, "".join(rng.choice(frags) for _ in range(rng.randrange(0, 18))))
        for i in range(200)
    ]
    want = {i: model(h) for i, h in rows}
    df = spark.createDataFrame(rows, "doc_id bigint, html string")
    got = {
        r.id: (r.title, r.text, r.n_links, r.link_density)
        for r in T.html_extract(df).collect()
    }
    assert got == want
    # non-degenerate: titles, links, and cuts all occurred somewhere
    assert any(t for t, _, _, _ in want.values())
    assert any(n > 0 for _, _, n, _ in want.values())


def test_url_parsing_matches_python_model_on_random_urls(spark):
    """Regex-dialect triangulation for the URL family (operators/web):
    random URL-ish strings assembled from adversarial fragments through
    Spark's Java regex must match an independent Python re model of
    host_expr / registrable_domain_expr / canonical_url_expr — the same
    three-dialect strategy as the html_extract fuzz (the DuckDB side is
    pinned by the generative oracles)."""
    import random
    import re

    from applications_analytics_midas_hbase_metrics_spark.operators import web as W

    SUF = set(W.MULTI_LABEL_SUFFIXES)

    def host_model(u):
        h = re.sub(r"^[A-Za-z][A-Za-z0-9+.\-]*://", "", u or "")
        m = re.match(r"^([^/?#]*)", h)
        h = m.group(1)
        h = re.sub(r"^.*@", "", h)
        h = re.sub(r":\d*$", "", h)
        h = h.strip().lower()
        h = re.sub(r"^www\.", "", h)
        return re.sub(r"\.$", "", h)

    def domain_model(h):
        parts = h.split(".")
        if len(parts) >= 3 and ".".join(parts[-2:]) in SUF:
            return ".".join(parts[-3:])
        if len(parts) >= 2:
            return ".".join(parts[-2:])
        return h

    def canonical_model(u):
        u = u or ""
        m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*)://", u)
        scheme = m.group(1).lower() if m else "http"
        rest = re.sub(r"^[A-Za-z][A-Za-z0-9+.\-]*://", "", u)
        after = re.sub(r"^[^/?#]*", "", rest)
        path = re.sub(r"/+$", "", re.match(r"^([^?#]*)", after).group(1))
        qm = re.search(r"\?([^#]*)", after)
        params = [p for p in (qm.group(1).split("&") if qm else []) if p]
        q = "&".join(sorted(params))
        return scheme + "://" + host_model(u) + path + ("?" + q if q else "")

    rng = random.Random(99)
    frags = [
        "http://", "HTTPS://", "hTtP://", "ftp+x://", "",
        "user@", "a:b@", "@", "www.", "WWW.", "blog.", "a.b.",
        "Site7", "x", "localhost", "", ".com", ".co.uk", ".org", ".",
        ":8080", ":", "/p/1", "/p//", "/", "?b=2&a=1", "?", "?a=1&",
        "#f", "#", "&", "=",
    ]
    cases = [
        "".join(rng.choice(frags) for _ in range(rng.randrange(0, 9)))
        for i in range(300)
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(cases)], "doc_id bigint, url string"
    )
    got = {
        r.doc_id: (r.host, r.domain, r.c)
        for r in W.with_domain(df)
        .withColumn("c", W.canonical_url_expr("url"))
        .collect()
    }
    for i, u in enumerate(cases):
        h = host_model(u)
        assert got[i] == (h, domain_model(h), canonical_model(u)), repr(u)
    # non-degenerate: schemes, multi-label suffixes and queries occurred
    assert any("co.uk" in (g[1] or "") for g in got.values())
    assert any("?" in g[2] for g in got.values())


def test_line_repetition_matches_python_model(spark):
    """Distributed line/paragraph battery vs a brute Counter model on
    random multi-line texts (random line vocab, mixed \\n and \\n\\n
    separators): all six signals must agree within the 6-decimal
    rounding (tolerance covers HALF_UP vs half-even at the last digit)."""
    import collections
    import random

    from applications_analytics_midas_hbase_metrics_spark.operators import (
        lines as L,
    )

    rng = random.Random(41)
    vocab = ["alpha", "bb", "the same line", "x y z", "q"]
    cases = []
    for _ in range(150):
        n = rng.randrange(0, 9)
        parts = [rng.choice(vocab) for _ in range(n)]
        seps = [rng.choice(["\n", "\n\n"]) for _ in range(max(0, n - 1))]
        text = "".join(
            p + s for p, s in zip(parts, seps + [""])
        )
        cases.append(text)
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], ["doc_id", "text"]
    )
    got = {r.id: r for r in L.line_repetition_features(df).collect()}

    def model(units):
        counts = collections.Counter(units)
        total = len(units)
        if not total:
            return 0, 0.0, 0.0
        dup_chars = sum((occ - 1) * len(u) for u, occ in counts.items())
        total_chars = sum(occ * len(u) for u, occ in counts.items())
        return (
            total,
            1.0 - len(counts) / total,
            (dup_chars / total_chars) if total_chars else 0.0,
        )

    for i, s in enumerate(cases):
        lines = [x for x in s.split("\n") if x]
        paras = [x for x in s.split("\n\n") if x]
        n_l, df_l, cf_l = model(lines)
        n_p, df_p, cf_p = model(paras)
        r = got[i]
        assert r.n_lines == n_l and r.n_paras == n_p, repr(s)
        for have, want in (
            (r.dup_line_frac, df_l),
            (r.dup_line_char_frac, cf_l),
            (r.dup_para_frac, df_p),
            (r.dup_para_char_frac, cf_p),
        ):
            assert abs(have - want) < 2e-6, (repr(s), have, want)


def test_normalize_unicode_matches_unicodedata_random(spark):
    """The Arrow-batched normalizer vs Python's unicodedata on random
    text seeded with combining marks, ligatures, and Hangul jamo — and,
    for NFC, vs DuckDB's independent nfc_normalize implementation.
    Also pins idempotence: norm(norm(x)) == norm(x)."""
    import random
    import unicodedata

    from applications_analytics_midas_hbase_metrics_spark.operators import (
        normalize as NZ,
    )

    rng = random.Random(43)
    pieces = [
        "é", "é", "ü", "ü", "Å", "Å",
        "가", "가", "ﬁ", "fi", "ascii", " ", "1.2",
        "́",  # orphan combining mark (no base)
    ]
    cases = [
        "".join(rng.choice(pieces) for _ in range(rng.randrange(0, 10)))
        for _ in range(150)
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], ["doc_id", "text"]
    )
    for form in ("NFC", "NFKC"):
        got = {
            r.id: r.text_norm
            for r in NZ.normalize_unicode(df, form=form).collect()
        }
        for i, s in enumerate(cases):
            want = unicodedata.normalize(form, s)
            assert got[i] == want, (form, repr(s))
            assert unicodedata.normalize(form, got[i]) == got[i]
    con = duckdb.connect()
    for i, s in enumerate(cases):
        duck = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert duck == unicodedata.normalize("NFC", s), repr(s)


def test_ngram_battery_matches_python_model(spark):
    """Full Gopher n-gram battery vs a brute Counter model on random
    token streams with forced phrase repeats (so the 5..10-gram dup
    signals actually fire): top{2,3,4} and dup{5..10} char fractions
    all agree within the rounding tolerance, and the deterministic
    top-gram tie-break (count, then length, then lexicographic) is
    replayed exactly."""
    import collections
    import random

    from applications_analytics_midas_hbase_metrics_spark.operators import text as T

    rng = random.Random(47)
    vocab = ["aa", "bbb", "c", "dd", "eee"]
    cases = []
    for _ in range(120):
        toks = [rng.choice(vocab) for _ in range(rng.randrange(0, 16))]
        if toks and rng.random() < 0.5:
            reps = toks[: rng.randrange(1, min(12, len(toks)) + 1)]
            toks = toks + reps * rng.randrange(1, 3)
        cases.append(" ".join(toks))
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], ["doc_id", "text"]
    )
    top_ns, dup_ns = (2, 3, 4), (5, 6, 7, 8, 9, 10)
    got = {
        r.id: r
        for r in T.ngram_repetition_battery(
            df, top_ns=top_ns, dup_ns=dup_ns
        ).collect()
    }
    for i, s in enumerate(cases):
        toks = [x for x in s.split() if x]
        row = got[i]
        for n in sorted(set(top_ns) | set(dup_ns)):
            grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
            counts = collections.Counter(grams)
            total = sum(occ * len(g) for g, occ in counts.items())
            if total:
                top_g = max(counts, key=lambda g: (counts[g], len(g), g))
                top = counts[top_g] * len(top_g) / total
                dup = (
                    sum(occ * len(g) for g, occ in counts.items() if occ > 1)
                    / total
                )
            else:
                top = dup = 0.0
            if n in top_ns:
                assert abs(row[f"top{n}_char_frac"] - top) < 2e-6, (s, n)
            if n in dup_ns:
                assert abs(row[f"dup{n}_char_frac"] - dup) < 2e-6, (s, n)
