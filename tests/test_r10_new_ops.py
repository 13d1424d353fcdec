"""Unit tests for the r10 operators: fisher_exact, levene_test
(mean center), ndcg_at_k, mrr, and the roc_points quantize grid."""

import math
from fractions import Fraction

from pyspark.sql import functions as F


def _fisher_ref(a, b, c, d):
    """Exact two-sided Fisher p via integer hypergeometric pmfs."""
    r1, r2, c1 = a + b, c + d, a + c
    n = a + b + c + d

    def pmf(k):
        return Fraction(math.comb(r1, k) * math.comb(r2, c1 - k),
                        math.comb(n, c1))

    obs = pmf(a)
    tot = Fraction(0)
    for k in range(max(0, c1 - r2), min(r1, c1) + 1):
        p = pmf(k)
        if p <= obs * Fraction(10**7 + 1, 10**7):
            tot += p
    return float(tot)


def test_fisher_exact_matches_exact_reference(spark):
    from zef_spark.pipeline.abtest import fisher_exact
    a, b, c, d = 8, 2, 1, 5
    rows = ([(True, True)] * a + [(True, False)] * b
            + [(False, True)] * c + [(False, False)] * d)
    df = spark.createDataFrame(rows, "r boolean, c boolean")
    out = fisher_exact(df, "r", "c").collect()[0]
    assert (out["n11"], out["n12"], out["n21"], out["n22"]) \
        == (a, b, c, d)
    assert abs(out["odds_ratio"] - 20.0) < 1e-9
    assert abs(out["p_two_sided"] - _fisher_ref(a, b, c, d)) < 1e-6


def test_fisher_exact_degenerate_margin(spark):
    """All rows in one column class: single-table support, p = 1.0
    (the scipy convention and what the oracle's one-term k-range
    emits — r11 ADVICE fix; the r10 cut returned NULL and disagreed
    with its own DuckDB oracle on degenerate data). The odds ratio
    stays NULL (b·c = 0)."""
    from zef_spark.pipeline.abtest import fisher_exact
    df = spark.createDataFrame(
        [(True, True), (False, True)], "r boolean, c boolean")
    out = fisher_exact(df, "r", "c").collect()[0]
    assert out["p_two_sided"] == 1.0
    assert out["odds_ratio"] is None


def test_fisher_exact_support_guard(spark):
    from zef_spark.pipeline.abtest import fisher_exact
    import pytest
    rows = ([(True, True)] * 50 + [(True, False)] * 50
            + [(False, True)] * 50 + [(False, False)] * 50)
    df = spark.createDataFrame(rows, "r boolean, c boolean")
    with pytest.raises(Exception, match="max_support"):
        fisher_exact(df, "r", "c", max_support=10).collect()


def test_levene_mean_center_reference(spark):
    """Mean-centered Levene W against a hand-computed ANOVA on
    |x - group mean|."""
    from zef_spark.pipeline.abtest import levene_test
    ga = [1.0, 2.0, 3.0, 4.0]        # mean 2.5, dev .5/.5/1.5/1.5
    gb = [10.0, 10.0, 10.0, 30.0]    # mean 15, dev 5/5/5/15
    rows = [("a", v) for v in ga] + [("b", v) for v in gb]
    df = spark.createDataFrame(rows, "g string, x double")
    out = levene_test(df, "g", "x", ["a", "b"],
                      center="mean").collect()[0]
    za = [abs(v - 2.5) for v in ga]
    zb = [abs(v - 15.0) for v in gb]
    alls = za + zb
    gm = sum(alls) / 8
    ma, mb = sum(za) / 4, sum(zb) / 4
    ssb = 4 * (ma - gm) ** 2 + 4 * (mb - gm) ** 2
    ssw = (sum((z - ma) ** 2 for z in za)
           + sum((z - mb) ** 2 for z in zb))
    f_ref = (ssb / 1) / (ssw / 6)
    assert out["n"] == 8 and out["k"] == 2
    assert out["dof_between"] == 1 and out["dof_within"] == 6
    assert abs(out["f_stat"] - f_ref) < 1e-6


def test_brown_forsythe_still_median(spark):
    """brown_forsythe == levene_test(center='median')."""
    from zef_spark.pipeline.abtest import (brown_forsythe,
                                           levene_test)
    rows = [("a", float(v)) for v in (1, 2, 3, 9)] + \
        [("b", float(v)) for v in (4, 5, 6, 7)]
    df = spark.createDataFrame(rows, "g string, x double")
    bf = brown_forsythe(df, "g", "x", ["a", "b"]).collect()[0]
    lv = levene_test(df, "g", "x", ["a", "b"],
                     center="median").collect()[0]
    assert bf == lv


def test_ndcg_hand_example(spark):
    """4 docs, rels by score order: [3, 2, 0, 1] (k=4)."""
    from zef_spark.pipeline.evaluation import ndcg_at_k
    rows = [(9.0, 3.0), (7.0, 2.0), (5.0, 0.0), (3.0, 1.0)]
    df = spark.createDataFrame(rows, "s double, r double")
    out = ndcg_at_k(df, "s", "r", k=4).collect()[0]
    dcg = (7 / math.log2(2) + 3 / math.log2(3)
           + 0 / math.log2(4) + 1 / math.log2(5))
    idcg = (7 / math.log2(2) + 3 / math.log2(3)
            + 1 / math.log2(4) + 0 / math.log2(5))
    assert abs(out["dcg"] - dcg) < 1e-6
    assert abs(out["ndcg"] - dcg / idcg) < 1e-6


def test_ndcg_no_relevant_null(spark):
    from zef_spark.pipeline.evaluation import ndcg_at_k
    df = spark.createDataFrame(
        [(1.0, 0.0), (2.0, 0.0)], "s double, r double")
    out = ndcg_at_k(df, "s", "r", k=10).collect()[0]
    assert out["ndcg"] is None and out["dcg"] == 0.0


def test_mrr_first_relevant_and_miss(spark):
    from zef_spark.pipeline.evaluation import mrr
    rows = [("q1", 9.0, False), ("q1", 7.0, True), ("q1", 5.0, True),
            ("q2", 4.0, False), ("q2", 2.0, False)]
    df = spark.createDataFrame(rows, "q string, s double, r boolean")
    out = {r["q"]: r for r in mrr(df, "s", "r", by="q").collect()}
    assert out["q1"]["first_rel_rank"] == 2
    assert abs(out["q1"]["rr"] - 0.5) < 1e-12
    assert out["q2"]["first_rel_rank"] is None
    assert out["q2"]["rr"] == 0.0


def test_roc_quantize_bounds_vocabulary(spark):
    from zef_spark.pipeline.evaluation import roc_points
    rows = [(i / 997.0, i % 2 == 0) for i in range(997)]
    df = spark.createDataFrame(rows, "s double, lab boolean")
    out = roc_points(df, "s", "lab", max_points=5000, quantize=1)
    assert out.count() <= 11  # grid of 0.0 .. 1.0 by 0.1
