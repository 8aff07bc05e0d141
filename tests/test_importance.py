"""DSIR hashed n-gram importance weighting (operators/importance.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from applications_analytics_midas_hbase_metrics_spark.operators import importance as IM


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_hashed_ngram_counts_gram_mass(spark):
    # "a b c" -> 3 unigrams + 2 bigrams = 5 gram occurrences
    out = IM.hashed_ngram_counts(_df(spark, [(1, "a b c"), (2, "")]))
    mass = {r.id: r.total for r in out.groupBy("id").agg(F.sum("cnt").alias("total")).collect()}
    assert mass[1] == 5
    assert 2 not in mass  # empty doc has no gram rows
    # both hash modes bucket every gram (same mass, possibly different spread)
    out_xx = IM.hashed_ngram_counts(_df(spark, [(1, "a b c")]), hash_mode="xxhash64")
    assert out_xx.agg(F.sum("cnt")).first()[0] == 5


def test_dsir_weights_tilt_toward_target(spark):
    # target is all-cat text; cat-heavy raw docs must outweigh dog docs
    cats = "cat cat purr cat whiskers cat"
    dogs = "dog dog bark dog fetch dog"
    raw = _df(spark, [(1, cats), (2, dogs), (3, cats + " " + dogs), (4, "")])
    target = _df(spark, [(10, cats), (11, "purr whiskers cat cat")])
    w = {r.id: r for r in IM.dsir_log_weights(raw, target).collect()}
    # same gram count (11 each): the cat doc must outweigh the dog doc;
    # the mixed doc (23 grams) sits below the pure cat doc.  No claim
    # about mixed-vs-dog: the weight is the paper's UNNORMALIZED sum,
    # so longer docs accumulate more (negative) mass.
    assert w[1].log_weight > w[2].log_weight
    assert w[1].log_weight > w[3].log_weight
    assert w[4].log_weight == 0.0 and w[4].n_grams == 0
    assert w[1].n_grams == 11  # 6 unigrams + 5 bigrams


def test_dsir_weight_is_exact_integer_dot_product(spark):
    # one-doc corpora: weight must equal the hand-computed smoothed
    # ratio sum over the doc's buckets (quantized at 1e-6)
    raw = _df(spark, [(1, "x y")])
    target = _df(spark, [(2, "x y")])
    B = 16
    w = IM.dsir_log_weights(raw, target, buckets=B).first()
    # grams: x, y, "x y" -> 3 occurrences; identical corpora, so every
    # bucket has t_b == r_b and T == R: every ratio is exactly 0
    assert w.log_weight == 0.0 and w.n_grams == 3
    # disjoint texts (buckets may still collide across corpora):
    # recompute the smoothed ratios from the two count tables with
    # plain Python floats and check the dot product bit-for-bit
    target2 = _df(spark, [(2, "p q")])
    w2 = IM.dsir_log_weights(raw, target2, buckets=B).first()
    rc = {
        r.bucket: r.cnt
        for r in IM.hashed_ngram_counts(raw, buckets=B).collect()
    }
    tc = {
        r.bucket: r.cnt
        for r in IM.hashed_ngram_counts(target2, buckets=B).collect()
    }
    T, R = sum(tc.values()), sum(rc.values())
    expect_micro = sum(
        c
        * round(
            (
                math.log(tc.get(b, 0) + 1.0)
                - math.log(T + B)
                - math.log(c + 1.0)
                + math.log(R + B)
            )
            * 1e6
        )
        for b, c in rc.items()
    )
    assert w2.log_weight == round(expect_micro / 1e6, 6)


def test_dsir_select_topk_deterministic_ties(spark):
    # four docs with identical text -> identical weights; k=2 must pick
    # the two LOWEST ids (total order, not arbitrary)
    raw = _df(spark, [(i, "same text here") for i in (7, 3, 9, 5)])
    target = _df(spark, [(1, "same text here")])
    w = IM.dsir_log_weights(raw, target)
    sel = {r.id: r.selected for r in IM.dsir_select_topk(w, 2).collect()}
    assert sel == {3: 1, 5: 1, 7: 0, 9: 0}


def test_dsir_ratio_table_broadcasts(spark):
    raw = _df(spark, [(1, "a b"), (2, "c d")])
    target = _df(spark, [(3, "a b")])
    plan = (
        IM.dsir_log_weights(raw, target)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_dsir_select_topk_plan_shape(spark):
    # the winner set must be a two-phase TakeOrderedAndProject, never a
    # global sort or an unpartitioned window (a constant-group ranking
    # was constant-folded into exactly that before this pin)
    raw = _df(spark, [(i, f"w{i} text") for i in range(6)])
    target = _df(spark, [(9, "w1 text")])
    w = IM.dsir_log_weights(raw, target)
    plan = (
        IM.dsir_select_topk(w, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
