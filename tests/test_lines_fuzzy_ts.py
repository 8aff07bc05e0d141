"""Unit tests for the round-9 batch-2 operators: line-level boilerplate
removal (operators/lines.py), deletion-neighborhood fuzzy pairs
(operators/fuzzy.py), gap-fill forward (operators/timeseries.py), and
triangle counting (operators/graph.py)."""

from __future__ import annotations

import pytest

from applications_analytics_midas_hbase_metrics_spark.operators import fuzzy as FZ
from applications_analytics_midas_hbase_metrics_spark.operators import graph as G
from applications_analytics_midas_hbase_metrics_spark.operators import lines as L
from applications_analytics_midas_hbase_metrics_spark.operators import (
    timeseries as TS,
)

# ---------------------------------------------------------------------------
# lines.strip_boilerplate
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_strip_boilerplate_threshold_and_order(spark):
    # "HDR" appears in 3 docs, "FTR" in 2; min_doc_freq=3 strips only HDR
    docs = _docs(
        spark,
        [
            (1, "HDR\nalpha\nbeta\nFTR"),
            (2, "HDR\ngamma\nFTR"),
            (3, "HDR\ndelta"),
        ],
    )
    out = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
        for r in L.strip_boilerplate(docs, min_doc_freq=3).collect()
    }
    assert out == {
        1: ("alpha\nbeta\nFTR", 3, 1),
        2: ("gamma\nFTR", 2, 1),
        3: ("delta", 1, 1),
    }


def test_strip_boilerplate_all_lines_removed(spark):
    docs = _docs(spark, [(i, "same\nsame2") for i in range(1, 6)])
    out = L.strip_boilerplate(docs, min_doc_freq=2).collect()
    assert all(r.clean_text == "" and r.n_kept == 0 and r.n_removed == 2 for r in out)
    assert len(out) == 5


def test_strip_boilerplate_doc_freq_is_distinct_docs(spark):
    # a line repeated 10x INSIDE one doc is not boilerplate (doc_freq=1)
    docs = _docs(
        spark,
        [(1, "\n".join(["echo"] * 10) + "\nunique"), (2, "other")],
    )
    out = {r.doc_id: r.n_removed for r in
           L.strip_boilerplate(docs, min_doc_freq=2).collect()}
    assert out == {1: 0, 2: 0}


def test_strip_boilerplate_hashed_path_identical(spark):
    docs = _docs(
        spark,
        [(i, f"HDR\nbody {i}\nmid\nFTR {i % 2}") for i in range(1, 9)],
    )
    raw = sorted(
        (r.doc_id, r.clean_text, r.n_kept, r.n_removed)
        for r in L.strip_boilerplate(docs, min_doc_freq=3).collect()
    )
    hashed = sorted(
        (r.doc_id, r.clean_text, r.n_kept, r.n_removed)
        for r in L.strip_boilerplate(
            docs, min_doc_freq=3, hash_lines=True
        ).collect()
    )
    assert raw == hashed


def test_boilerplate_lines_dictionary(spark):
    docs = _docs(spark, [(1, "a\nb"), (2, "a\nc"), (3, "a\nb")])
    got = {
        r.line: r.doc_freq
        for r in L.boilerplate_lines(docs, min_doc_freq=2).collect()
    }
    assert got == {"a": 3, "b": 2}


# ---------------------------------------------------------------------------
# fuzzy.fuzzy_pairs
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_pairs_known_cases(spark):
    vocab = spark.createDataFrame(
        [("cat",), ("car",), ("cart",), ("at",), ("dog",), ("dig",), ("ab",), ("ba",)],
        ["term"],
    )
    got = sorted((r.a, r.b) for r in FZ.fuzzy_pairs(vocab).collect())
    # substitution cat/car, insertion car/cart + cat/cart? lev(cat,cart)=1
    # (insert r), deletion cat/at, dog/dig substitution; ab/ba is lev 2
    # (shares deletion key "a"/"b") and MUST be filtered out
    expect = sorted(
        (a, b)
        for a in ["cat", "car", "cart", "at", "dog", "dig", "ab", "ba"]
        for b in ["cat", "car", "cart", "at", "dog", "dig", "ab", "ba"]
        if a < b and _lev(a, b) == 1
    )
    assert got == expect
    assert ("ab", "ba") not in got


def test_fuzzy_pairs_matches_brute_force_random(spark):
    # deterministic pseudo-random vocabulary over a 3-letter alphabet:
    # dense enough that every edit-kind pair occurs
    import itertools

    vocab_terms = sorted(
        {
            "".join(w)
            for n in (1, 2, 3, 4)
            for w in itertools.product("abc", repeat=n)
        }
    )
    vocab = spark.createDataFrame([(t,) for t in vocab_terms], ["term"])
    got = sorted((r.a, r.b) for r in FZ.fuzzy_pairs(vocab).collect())
    expect = sorted(
        (a, b)
        for i, a in enumerate(vocab_terms)
        for b in vocab_terms[i + 1 :]
        if _lev(a, b) == 1
    )
    assert got == expect
    assert len(got) > 100  # non-degenerate


def test_fuzzy_pairs_position_keys_identical(spark):
    # The (variant, deletion-position) production keying must enumerate
    # the IDENTICAL pair set as the plain-variant keying: equal-length
    # distance-1 pairs share the deletion key at their differing
    # position; length±1 pairs meet through the shorter term's
    # self-form, emitted at every position.  The dense 3-letter
    # alphabet exercises every edit kind AND the hot-short-variant
    # buckets the refinement exists to split.
    import itertools

    vocab_terms = sorted(
        {
            "".join(w)
            for n in (1, 2, 3, 4)
            for w in itertools.product("abc", repeat=n)
        }
    )
    vocab = spark.createDataFrame([(t,) for t in vocab_terms], ["term"])
    plain = sorted((r.a, r.b) for r in FZ.fuzzy_pairs(vocab).collect())
    positional = sorted(
        (r.a, r.b)
        for r in FZ.fuzzy_pairs(vocab, position_keys=True).collect()
    )
    assert plain == positional
    assert len(plain) > 100


def test_canonicalize_vocab_id_fn_invariant(spark):
    # The xxhash64 id swap (no global rank window) must produce the
    # IDENTICAL (term, canonical, cluster_size) output as the rank ids:
    # the canonical member reduces from term STRINGS per cluster, so id
    # order never leaks into the result.  Chain a->b->c (distance 2
    # endpoints) collapses into one cluster either way.
    vocab = spark.createDataFrame(
        [("cat",), ("cot",), ("coat",), ("dog",), ("lonely",)], ["term"]
    )
    by_rank = sorted(
        tuple(r) for r in FZ.canonicalize_vocab(vocab, id_fn="rank").collect()
    )
    by_hash = sorted(
        tuple(r) for r in FZ.canonicalize_vocab(vocab, id_fn="xxhash64").collect()
    )
    assert by_rank == by_hash
    assert by_rank == [
        ("cat", "cat", 3),
        ("coat", "cat", 3),
        ("cot", "cat", 3),
        ("dog", "dog", 1),
        ("lonely", "lonely", 1),
    ]
    with pytest.raises(ValueError):
        FZ.canonicalize_vocab(vocab, id_fn="md5")


def test_fuzzy_pairs_dedupes_vocab_and_skips_empty(spark):
    vocab = spark.createDataFrame(
        [("aa",), ("aa",), ("ab",), ("",), (None,)], ["term"]
    )
    got = sorted((r.a, r.b) for r in FZ.fuzzy_pairs(vocab).collect())
    assert got == [("aa", "ab")]


# ---------------------------------------------------------------------------
# timeseries.gapfill_forward
# ---------------------------------------------------------------------------


def test_gapfill_forward_fills_and_counts(spark):
    obs = spark.createDataFrame(
        [("u1", 10, 1.5, 2), ("u1", 13, 9.0, 1), ("u2", 5, 4.0, 3)],
        ["k", "b", "v", "n_obs"],
    )
    out = {
        (r.k, r.b): (r.n_obs, r.v_filled)
        for r in TS.gapfill_forward(
            obs, key_col="k", bucket_col="b", value_col="v", count_col="n_obs"
        ).collect()
    }
    assert out == {
        ("u1", 10): (2, 1.5),
        ("u1", 11): (0, 1.5),
        ("u1", 12): (0, 1.5),
        ("u1", 13): (1, 9.0),
        ("u2", 5): (3, 4.0),
    }


def test_gapfill_forward_default_count_col(spark):
    obs = spark.createDataFrame([("u", 1, 2.0), ("u", 3, 7.0)], ["k", "b", "v"])
    rows = TS.gapfill_forward(
        obs, key_col="k", bucket_col="b", value_col="v"
    ).collect()
    got = {(r.b): (r.n_obs, r.v_filled) for r in rows}
    assert got == {1: (1, 2.0), 2: (0, 2.0), 3: (1, 7.0)}


# ---------------------------------------------------------------------------
# graph.cooccurrence_edges + triangle_node_counts
# ---------------------------------------------------------------------------


def test_cooccurrence_edges_support_and_orientation(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "y"), (2, "x"), (3, "x"), (3, "z"), (1, "x")],
        ["g", "i"],
    )
    e1 = sorted(
        (r.a, r.b)
        for r in G.cooccurrence_edges(
            df, group_col="g", item_col="i", min_support=1
        ).collect()
    )
    assert e1 == [("x", "y"), ("x", "z")]
    e2 = sorted(
        (r.a, r.b)
        for r in G.cooccurrence_edges(
            df, group_col="g", item_col="i", min_support=2
        ).collect()
    )
    assert e2 == [("x", "y")]  # x,y share groups 1 and 2


def test_triangle_node_counts(spark):
    # two triangles sharing edge (1,2): {1,2,3} and {1,2,4}; plus a
    # dangling chain 5-6 that is in no triangle
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (5, 6)], ["a", "b"]
    )
    got = {r.node: r.n_tri for r in G.triangle_node_counts(edges).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}
    assert sum(got.values()) % 3 == 0  # each triangle contributes 3


def test_debounce_bursts_islands(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    rows = [
        # burst A: three events within gap
        ("u1", ts(0), 1), ("u1", ts(50), 2), ("u1", ts(90), 3),
        # burst B: exactly gap+1 after last -> new island
        ("u1", ts(191), 4),
        # boundary: exactly gap apart is SAME burst (strict >)
        ("u1", ts(291), 5),
        # other key unaffected
        ("u2", ts(10), 6),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "eid"])
    out = sorted(
        (r.k, r.burst_start, r.burst_end, r.n_events)
        for r in TS.debounce_bursts(
            df, key_cols=["k"], ts_col="ts", gap_seconds=100,
            order_cols=["eid"],
        ).collect()
    )
    assert out == [
        ("u1", ts(0), ts(90), 3),
        ("u1", ts(191), ts(291), 2),
        ("u2", ts(10), ts(10), 1),
    ]


def test_debounce_single_events_pass_through(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [("u", base + dt.timedelta(hours=i), i) for i in range(5)]
    df = spark.createDataFrame(rows, ["k", "ts", "eid"])
    out = TS.debounce_bursts(
        df, key_cols=["k"], ts_col="ts", gap_seconds=60, order_cols=["eid"]
    ).collect()
    assert len(out) == 5
    assert all(r.n_events == 1 and r.burst_start == r.burst_end for r in out)


# ---------------------------------------------------------------------------
# clustering.kmeans_fixed + sampling.weighted_sample_topk
# ---------------------------------------------------------------------------


def test_kmeans_fixed_separated_clusters(spark):
    from applications_analytics_midas_hbase_metrics_spark.operators import (
        clustering as CLU,
    )

    # two tight groups far apart; seeds (lowest ids 0,1) start one in
    # each group, so 2 rounds converge to the exact means
    pts = [
        (0, [0.0, 0.0]), (2, [1.0, 0.0]), (4, [0.0, 1.0]),
        (1, [100.0, 100.0]), (3, [101.0, 100.0]), (5, [100.0, 101.0]),
    ]
    vecs = spark.createDataFrame(pts, ["vec_id", "e"])
    out = {r.vec_id: (r.cluster, r.dist) for r in
           CLU.kmeans_fixed(vecs, k=2, iters=2).collect()}
    assert {i: out[i][0] for i in sorted(out)} == {
        0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1,
    }
    # centroid of group A is (1/3, 1/3): dist for (0,0) is 2*(1/3)^2
    assert abs(out[0][1] - 2 * (1 / 3) ** 2) < 1e-5


def test_kmeans_fixed_deterministic(spark):
    from applications_analytics_midas_hbase_metrics_spark.operators import (
        clustering as CLU,
    )
    from pyspark.sql import functions as F

    vecs = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"),
            (F.col("id") % 11).cast("double"),
        ).alias("e"),
    )
    a = sorted(map(tuple, CLU.kmeans_fixed(vecs, k=4, iters=3).collect()))
    b = sorted(map(tuple, CLU.kmeans_fixed(vecs, k=4, iters=3).collect()))
    assert a == b
    assert len(a) == 40


def test_weighted_sample_topk_prefers_heavy_and_is_deterministic(spark):
    from applications_analytics_midas_hbase_metrics_spark.operators.sampling import (
        weighted_sample_topk,
    )
    from pyspark.sql import functions as F

    # 200 light docs (w=1) + 200 heavy docs (w=50) in one stratum
    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.lit("s").alias("source"),
        F.when(F.col("id") < 200, F.lit(1)).otherwise(F.lit(50))
        .cast("bigint").alias("w"),
    )
    kept = weighted_sample_topk(
        df, 40, weight_col="w", strat_col="source", key_col="doc_id"
    )
    rows = kept.collect()
    assert len(rows) == 40
    n_heavy = sum(1 for r in rows if r.doc_id >= 200)
    assert n_heavy >= 30  # 50x weight must dominate the kept set
    again = sorted(r.doc_id for r in weighted_sample_topk(
        df, 40, weight_col="w", strat_col="source", key_col="doc_id"
    ).collect())
    assert again == sorted(r.doc_id for r in rows)


def test_weighted_sample_topk_small_group_returns_all(spark):
    from applications_analytics_midas_hbase_metrics_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 1), (3, "b", 9)], ["doc_id", "source", "w"]
    )
    out = weighted_sample_topk(
        df, 10, weight_col="w", strat_col="source", key_col="doc_id"
    )
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 3]


def test_vocab_canonicalize_chain_collapses(spark):
    # typo chain cat - cot - coat: cat/coat are distance 2 apart but
    # must land in ONE cluster through the cot bridge; dog isolated
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    vocab = spark.createDataFrame(
        [("cat",), ("cot",), ("coat",), ("dog",)], ["term"]
    )
    ids = vocab.select(
        "term",
        F.row_number().over(Window.orderBy("term")).cast("bigint").alias("tid"),
    )
    pairs = FZ.fuzzy_pairs(vocab)
    edges = (
        pairs.join(ids.withColumnRenamed("term", "a"), "a")
        .withColumnRenamed("tid", "id_a")
        .join(ids.withColumnRenamed("term", "b").withColumnRenamed("tid", "id_b"), "b")
        .select("id_a", "id_b")
    )
    labels = {r.id: r.cluster_id for r in G.connected_components(edges).collect()}
    tid = {r.term: r.tid for r in ids.collect()}
    assert labels[tid["cat"]] == labels[tid["cot"]] == labels[tid["coat"]]
    assert tid["dog"] not in labels  # no edges -> not in the pair graph


def test_zorder_value_known_and_locality(spark):
    from applications_analytics_midas_hbase_metrics_spark.operators.layout import (
        zorder_value,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(3, 5), (7, 2), (0, 0), (255, 255)], ["x", "y"]
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_value(["x", "y"]).alias("z")).collect()
    }
    # hand-interleaved references (x bits -> even positions, y -> odd)
    assert got == {(3, 5): 39, (7, 2): 29, (0, 0): 0, (255, 255): 65535}

    # locality: any 256-value z-range spans at most 16 values per axis
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("int").alias("y")
    )
    spans = (
        grid.select(zorder_value(["x", "y"]).alias("z"), "x", "y")
        .groupBy((F.col("z") / 256).cast("int").alias("zb"))
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .agg(F.max("dx"), F.max("dy"))
        .first()
    )
    assert spans[0] <= 15 and spans[1] <= 15


def test_ewma_smooth_exact_dyadic(spark):
    """EWMA replays the closed form exactly: weights are powers of 1/2
    over the frame, ties to a pure-Python reference on cents."""
    from applications_analytics_midas_hbase_metrics_spark.operators.timeseries import (
        ewma_smooth,
    )

    series = [(1, i, (i * 37) % 500 + 1) for i in range(1, 31)]
    df = spark.createDataFrame(series, "user_id bigint, hour bigint, xq bigint")
    got = {r.hour: (r.n_obs, r.ewma) for r in ewma_smooth(df, window_rows=12).collect()}
    xs = {h: x for _, h, x in series}
    for t in range(1, 31):
        lo = max(1, t - 11)
        vals = [xs[i] for i in range(lo, t + 1)]  # oldest -> newest
        num = sum(v * 0.5 ** (len(vals) - 1 - i) for i, v in enumerate(vals))
        den = sum(0.5 ** (len(vals) - 1 - i) for i in range(len(vals))) * 100
        assert got[t][0] == len(vals)
        assert got[t][1] == pytest.approx(num / den, abs=1e-6)


def test_ewma_window_rows_guard(spark):
    from applications_analytics_midas_hbase_metrics_spark.operators.timeseries import (
        ewma_smooth,
    )

    df = spark.createDataFrame([(1, 1, 1)], "user_id bigint, hour bigint, xq bigint")
    with pytest.raises(ValueError):
        ewma_smooth(df, window_rows=0)
    # [1, 62] was the old advertised range, but beyond 40 the dyadic
    # bigint weights silently WRAP for realistic cent magnitudes
    # (|x| >= 5 at 62) — the bound is now the safe one.
    with pytest.raises(ValueError):
        ewma_smooth(df, window_rows=41)


def test_ewma_no_overflow_at_max_window(spark):
    # At the cap (40) a large-cent series must stay exact: 41 rows of
    # +/- 4_000_000 cents ($40k) through the full 40-row frame; every
    # EWMA is bounded by max|x|/100 dollars — a silent bigint wrap
    # would blow far past it.
    rows = [(1, h, 4_000_000 if h % 2 else -4_000_000) for h in range(41)]
    df = spark.createDataFrame(rows, "user_id bigint, hour bigint, xq bigint")
    from applications_analytics_midas_hbase_metrics_spark.operators.timeseries import (
        ewma_smooth,
    )

    out = ewma_smooth(df, window_rows=40).collect()
    assert len(out) == 41
    assert all(abs(r.ewma) <= 40_000.0 for r in out)


def test_pca_power_converges_on_gapped_matrix(spark):
    """On a matrix with a genuine dominant direction, 5 quantized
    power rounds align with numpy's SVD top singular vector to
    cos >= 0.999; the returned direction is unit-norm."""
    import numpy as np

    from applications_analytics_midas_hbase_metrics_spark.operators.clustering import (
        pca_power_top,
    )

    rng = np.random.default_rng(7)
    d, n = 16, 300
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    X = np.outer(rng.normal(size=n) * 5.0, u) + rng.normal(size=(n, d)) * 0.3
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id bigint, e array<double>",
    )
    v = np.array(
        [r.loading for r in sorted(
            pca_power_top(df, iters=5, d=d).collect(), key=lambda r: r.pos
        )]
    )
    _, _, vt = np.linalg.svd(X, full_matrices=False)
    assert abs(float(v @ vt[0])) / float(np.linalg.norm(v)) >= 0.999
    assert float(np.linalg.norm(v)) == pytest.approx(1.0, abs=1e-4)


def test_pca_power_iters_guard(spark):
    from applications_analytics_midas_hbase_metrics_spark.operators.clustering import (
        pca_power_top,
    )

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id bigint, e array<double>")
    with pytest.raises(ValueError):
        pca_power_top(df, iters=0, d=2)


def test_abtt_removes_component_and_reconstructs(spark):
    """After correction, every vector is orthogonal to the removed
    direction (within rounding), and component*v + corrected
    reconstructs the input."""
    import numpy as np

    from applications_analytics_midas_hbase_metrics_spark.operators.clustering import (
        abtt_remove_top,
        pca_power_top,
    )

    rng = np.random.default_rng(11)
    d, n = 8, 120
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    X = np.outer(rng.normal(size=n) * 4.0, u) + rng.normal(size=(n, d)) * 0.2
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id bigint, e array<double>",
    )
    loading = pca_power_top(df, iters=5, d=d)
    v = np.array([r.loading for r in sorted(loading.collect(), key=lambda r: r.pos)])
    out = abtt_remove_top(df, loading).collect()
    for r in out:
        c = np.array(r.corrected)
        assert abs(float(c @ v)) < 1e-3          # orthogonal (quantized)
        recon = c + r.component * v
        assert np.allclose(recon, X[r.id], atol=1e-4)


def test_dedup_lines_within_doc_hand_checked(spark):
    """Keep-first intra-doc rule: second occurrences drop wherever
    they sit, order of survivors preserved, all-unique docs pass
    through, and an all-duplicate doc collapses to one line."""
    from applications_analytics_midas_hbase_metrics_spark.operators import lines as L

    rows = [
        (1, "a\nb\na\nc\nb"),   # dups at 3 and 5
        (2, "x\ny\nz"),          # untouched
        (3, "w\nw\nw"),          # collapses
        (4, ""),                 # one empty line, kept
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
        for r in L.dedup_lines_within_doc(df).collect()
    }
    assert got == {
        1: ("a\nb\nc", 3, 2),
        2: ("x\ny\nz", 3, 0),
        3: ("w", 1, 2),
        4: ("", 1, 0),
    }


def test_line_ops_metachar_separator_is_literal(spark):
    """A regex-metacharacter separator ('.', '|') must behave as a
    LITERAL in every lines-module split: split and array_join use the
    same semantics, so the split/rejoin round trip is exact (round-11
    ADVICE — the split used to get regex semantics and silently
    shredded the text char-by-char on sep='.')."""
    from applications_analytics_midas_hbase_metrics_spark.operators import lines as L

    df = spark.createDataFrame([(1, "a.b.a.c")], ["doc_id", "text"])
    r = L.dedup_lines_within_doc(df, sep=".").first()
    assert (r.clean_text, r.n_kept, r.n_removed) == ("a.b.c", 3, 1)

    docs = spark.createDataFrame(
        [(i, "menu|body%d|menu" % i) for i in range(4)], ["doc_id", "text"]
    )
    out = {
        r.doc_id: (r.clean_text, r.n_kept)
        for r in L.strip_boilerplate(docs, min_doc_freq=3, sep="|").collect()
    }
    assert out[0] == ("body0", 1)  # 'menu' is cross-doc boilerplate


# lines.line_repetition_features — the Gopher line/paragraph battery


def test_line_repetition_known_fractions(spark):
    # doc 1: lines a,b,a,a  (4 occ, 2 distinct -> dup_frac 0.5;
    #        dup chars = 2*len(a)=2, total = 4 -> char_frac 0.5)
    #        paragraphs: "a\nb" and "a\na" -> 2 occ, 2 distinct -> 0.0
    # doc 2: all unique lines -> zeros
    docs = spark.createDataFrame(
        [(1, "a\nb\n\na\na"), (2, "x\ny\n\nz")],
        "doc_id long, text string",
    )
    out = {r["id"]: r.asDict() for r in L.line_repetition_features(docs).collect()}
    d1 = out[1]
    assert d1["n_lines"] == 4
    assert d1["dup_line_frac"] == 0.5
    assert d1["dup_line_char_frac"] == 0.5
    assert d1["n_paras"] == 2
    assert d1["dup_para_frac"] == 0.0
    assert d1["dup_para_char_frac"] == 0.0
    d2 = out[2]
    assert d2["n_lines"] == 3
    assert (d2["dup_line_frac"], d2["dup_line_char_frac"]) == (0.0, 0.0)


def test_line_repetition_char_frac_weighs_length(spark):
    # long line duplicated once among short unique lines: occurrence
    # fraction is 1/4 but the char fraction is dominated by its length
    long = "w" * 96
    docs = spark.createDataFrame(
        [(7, f"{long}\na\nb\n{long}")], "doc_id long, text string"
    )
    r = L.line_repetition_features(docs).collect()[0]
    assert r["n_lines"] == 4
    assert r["dup_line_frac"] == 0.25
    # dup chars = 96 (second occurrence), total = 96+1+1+96 = 194
    assert r["dup_line_char_frac"] == round(96 / 194, 6)


def test_line_repetition_empty_and_boundary_units(spark):
    # empty text -> no units, all-zero row still present; paragraph
    # separator artifacts (the '' between \n\n) never count as lines
    docs = spark.createDataFrame(
        [(1, ""), (2, "a\n\na")], "doc_id long, text string"
    )
    out = {r["id"]: r.asDict() for r in L.line_repetition_features(docs).collect()}
    assert out[1]["n_lines"] == 0 and out[1]["dup_line_frac"] == 0.0
    # doc 2: lines are [a, a] (the empty split artifact dropped)
    assert out[2]["n_lines"] == 2
    assert out[2]["dup_line_frac"] == 0.5
    # but as paragraphs they are two distinct-position identical paras
    assert out[2]["n_paras"] == 2 and out[2]["dup_para_frac"] == 0.5


def test_line_repetition_no_window_in_plan(spark):
    # scale contract: the battery is two partial-aggregating shuffles,
    # never a per-key window sort
    docs = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    plan = L.line_repetition_features(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# lines.c4_line_filters — the Raffel-2020 cleaning rules


def test_c4_line_rules_hand_checked(spark):
    docs = spark.createDataFrame(
        [
            # keeps: 3+ words + terminal punctuation; drops the rest
            (1, 'one two three.\nshort.\nno punct here\nfour five six ok!\nends in quote says "her."'),
            # javascript line dropped case-blind
            (2, "enable JavaScript to view this.\na b c.\nd e f.\ng h i.\nj k l.\nm n o."),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r.asDict() for r in L.c4_line_filters(docs).collect()}
    d1 = out[1]
    assert d1["clean_text"].split("\n") == [
        "one two three.",
        "four five six ok!",
        'ends in quote says "her."',
    ]
    assert (d1["n_kept"], d1["n_removed"]) == (3, 2)
    # 3 terminators in kept lines (two . and one !) -> fails min 5
    assert d1["n_sentences"] == 3 and d1["keep"] == 0
    d2 = out[2]
    assert d2["n_kept"] == 5 and d2["n_removed"] == 1
    assert d2["n_sentences"] == 5 and d2["keep"] == 1


def test_c4_page_rules(spark):
    body = "\n".join(f"line number {i} is long enough." for i in range(6))
    docs = spark.createDataFrame(
        [
            (1, body),
            (2, body + "\nvar x = { a: 1 }"),       # curly brace page
            (3, body + "\nLorem Ipsum dolor sit."),  # lorem ipsum page
            (4, "only two sentences here.\nsecond one is fine too."),
        ],
        "doc_id long, text string",
    )
    keeps = {r["id"]: r["keep"] for r in L.c4_line_filters(docs).collect()}
    assert keeps == {1: 1, 2: 0, 3: 0, 4: 0}


def test_c4_zero_shuffle_plan(spark):
    docs = spark.createDataFrame([(1, "a b c.")], "doc_id long, text string")
    plan = L.c4_line_filters(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Window" not in plan


# lines.dedup_units_across_corpus — CCNet keep-first paragraph dedup


def test_corpus_unit_dedup_keep_first(spark):
    docs = spark.createDataFrame(
        [(1, "a\n\nb"), (2, "b\n\nc\n\nb"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r.asDict()
        for r in L.dedup_units_across_corpus(docs).collect()
    }
    # 'b' first occurs at (1, pos 1): doc 1 keeps both units, doc 2
    # loses BOTH its copies (cross-doc and in-doc resolved by one rule)
    assert out[1]["clean_text"] == "a\n\nb"
    assert (out[1]["n_units"], out[1]["n_kept"], out[1]["n_removed"]) == (2, 2, 0)
    assert out[2]["clean_text"] == "c"
    assert (out[2]["n_units"], out[2]["n_kept"], out[2]["n_removed"]) == (3, 1, 2)
    assert out[3] == {
        "id": 3, "clean_text": "", "n_units": 0, "n_kept": 0, "n_removed": 0
    }


def test_corpus_unit_dedup_order_and_hash_mode(spark):
    docs = spark.createDataFrame(
        [(5, "x\n\ny\n\nx\n\nz")], "doc_id long, text string"
    )
    r = L.dedup_units_across_corpus(docs).collect()[0]
    assert r["clean_text"] == "x\n\ny\n\nz"  # survivors keep original order
    rh = L.dedup_units_across_corpus(docs, hash_units=True).collect()[0]
    assert rh["clean_text"] == r["clean_text"]


def test_corpus_unit_dedup_no_window_plan(spark):
    # skew contract: keep-first is a min aggregation + equi join, never
    # a per-unit window sort (a viral paragraph must cost its shuffle
    # share, not one reducer)
    docs = spark.createDataFrame([(1, "a\n\nb")], "doc_id long, text string")
    plan = (
        L.dedup_units_across_corpus(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_corpus_unit_dedup_packed_key_guard_fires(spark):
    """The packed-key contract (pos < 1e6, |id| packable in int64) is
    ENFORCED, not just documented: a pathological 1e6-unit document and
    an out-of-range id both raise instead of silently corrupting
    keep-first order (round-13 guard, lines.py)."""
    from pyspark.sql import functions as F

    # 1,000,001 distinct units built server-side so pos reaches 1e6
    monster = spark.range(1).select(
        F.lit(1).cast("long").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(1_000_000)),
                lambda i: F.concat(F.lit("u"), i.cast("string")),
            ),
            "\n",
        ).alias("text"),
    )
    with pytest.raises(Exception, match="packed-key contract"):
        L.dedup_units_across_corpus(monster, sep="\n").collect()

    big_id = spark.createDataFrame(
        [(2**62, "a\n\nb")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="packed-key contract"):
        L.dedup_units_across_corpus(big_id).collect()

    # in-domain inputs are untouched by the guard
    ok = spark.createDataFrame(
        [(L._MAX_PACK_ID, "a\n\nb\n\na")], "doc_id long, text string"
    )
    row = L.dedup_units_across_corpus(ok).collect()[0]
    assert (row.n_units, row.n_kept, row.n_removed) == (3, 2, 1)
