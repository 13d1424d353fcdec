"""Unit tests for the hypothesis-testing tier (pipeline/abtest.py)
and the periodicity profile — statistics verified against
hand-computed / scipy-free closed forms on tiny frames."""

import math

import pytest


def _welch_ref(a, b):
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2 ** 2 / ((va / na) ** 2 / (na - 1)
                      + (vb / nb) ** 2 / (nb - 1))
    return t, dof


def test_welch_ttest_matches_closed_form(spark):
    from zef_spark.pipeline.abtest import welch_ttest
    a = [3.1, 2.9, 3.5, 3.3, 2.8, 3.0]
    b = [2.1, 2.4, 1.9, 2.6]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = welch_ttest(df, "g", "v", "A", "B").collect()[0]
    t, dof = _welch_ref(a, b)
    assert r["n_a"] == 6 and r["n_b"] == 4
    assert r["t_stat"] == pytest.approx(t, abs=1e-6)
    assert r["dof"] == pytest.approx(dof, abs=1e-6)
    assert r["diff"] == pytest.approx(sum(a) / 6 - sum(b) / 4,
                                      abs=1e-6)


def test_welch_ttest_drops_null_values(spark):
    """r07 ADVICE regression: a NULL value row must drop from n_a/n_b
    too, not just from the sums — otherwise every moment is biased."""
    from zef_spark.pipeline.abtest import welch_ttest
    a = [3.1, 2.9, 3.5, 3.3, 2.8, 3.0]
    b = [2.1, 2.4, 1.9, 2.6]
    rows = ([("A", v) for v in a] + [("B", v) for v in b]
            + [("A", None), ("B", None), ("B", None)])
    df = spark.createDataFrame(rows, "g string, v double")
    r = welch_ttest(df, "g", "v", "A", "B").collect()[0]
    t, dof = _welch_ref(a, b)
    assert r["n_a"] == 6 and r["n_b"] == 4  # NULL rows excluded
    assert r["t_stat"] == pytest.approx(t, abs=1e-6)
    assert r["dof"] == pytest.approx(dof, abs=1e-6)


def test_welch_ttest_degenerate_null(spark):
    from zef_spark.pipeline.abtest import welch_ttest
    # constant values in both groups → zero variance → NULL t
    rows = [("A", 1.0), ("A", 1.0), ("B", 1.0), ("B", 1.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = welch_ttest(df, "g", "v", "A", "B").collect()[0]
    assert r["t_stat"] is None and r["dof"] is None
    assert r["mean_a"] == 1.0 and r["diff"] == 0.0


def test_mann_whitney_no_ties(spark):
    from zef_spark.pipeline.abtest import mann_whitney_u
    # A = {1,2,3}, B = {4,5} → every B beats every A: U_a = 0
    rows = [("A", 1.0), ("A", 2.0), ("A", 3.0),
            ("B", 4.0), ("B", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "g", "v", "A", "B",
                       n_ranges=2).collect()[0]
    assert r["n_a"] == 3 and r["n_b"] == 2
    assert r["u_a"] == 0.0 and r["u_b"] == 6.0
    # z = (0 - 3)/sqrt(3*2*6/12) = -3/sqrt(3)
    assert r["z"] == pytest.approx(-3 / math.sqrt(3), abs=1e-6)
    # Cliff's delta: every B beats every A -> P(a>b)-P(a<b) = -1
    assert r["cliffs_delta"] == -1.0


def test_mann_whitney_midrank_ties(spark):
    from zef_spark.pipeline.abtest import mann_whitney_u
    # A = {1, 2, 2}, B = {2, 3}: ranks 1, 3, 3 | 3, 5 (midranks)
    rows = [("A", 1.0), ("A", 2.0), ("A", 2.0),
            ("B", 2.0), ("B", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "g", "v", "A", "B",
                       n_ranges=2).collect()[0]
    # R_a = 1 + 3 + 3 = 7 → U_a = 7 - 3*4/2 = 1
    assert r["u_a"] == 1.0 and r["u_b"] == 5.0
    # tie term: block of 3 → 3³-3 = 24
    var = (3 * 2 / 12) * (5 + 1 - 24 / (5 * 4))
    assert r["z"] == pytest.approx((1 - 3) / math.sqrt(var),
                                   abs=1e-6)


def test_two_proportion_ztest(spark):
    from zef_spark.pipeline.abtest import two_proportion_ztest
    # A: 30/100 convert, B: 20/100
    rows = ([("A", 1)] * 30 + [("A", 0)] * 70
            + [("B", 1)] * 20 + [("B", 0)] * 80)
    df = spark.createDataFrame(rows, "g string, s int")
    from pyspark.sql import functions as F
    r = two_proportion_ztest(df, "g", F.col("s") == 1,
                             "A", "B").collect()[0]
    pp = 50 / 200
    se = math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
    assert r["p_a"] == 0.3 and r["p_b"] == 0.2
    assert r["z"] == pytest.approx(0.1 / se, abs=1e-6)


def test_two_proportion_degenerate(spark):
    from zef_spark.pipeline.abtest import two_proportion_ztest
    rows = [("A", 1), ("A", 1), ("B", 1)]  # pooled p = 1 → NULL z
    df = spark.createDataFrame(rows, "g string, s int")
    from pyspark.sql import functions as F
    r = two_proportion_ztest(df, "g", F.col("s") == 1,
                             "A", "B").collect()[0]
    assert r["z"] is None and r["p_a"] == 1.0


def test_periodicity_strength_pure_cycle(spark):
    from zef_spark.pipeline.rollup import periodicity_strength
    # perfect period-4 cycle over 40 ticks → strength(4) == 1,
    # strength(8) == 1 (multiple), others < 1
    pat = [1.0, 5.0, 2.0, 8.0]
    rows = [(t, pat[t % 4]) for t in range(40)]
    df = spark.createDataFrame(rows, "t int, x double")
    out = {r["period"]: r["strength"] for r in
           periodicity_strength(df, "t", "x",
                                max_period=8).collect()}
    assert out[4] == 1.0 and out[8] == 1.0
    assert all(out[p] < 1.0 for p in (2, 3, 5, 6, 7))
    # period-2 groups {1,2} vs {5,8}: strength = SSB/SST
    m = sum(pat) / 4
    ssb2 = 2 * 10 * ((1.5 - m) ** 2 + (6.5 - m) ** 2)
    sst = 10 * sum((v - m) ** 2 for v in pat)
    assert out[2] == pytest.approx(ssb2 / sst, abs=1e-6)


def test_periodicity_strength_constant_null(spark):
    from zef_spark.pipeline.rollup import periodicity_strength
    df = spark.createDataFrame([(t, 3.0) for t in range(10)],
                               "t int, x double")
    out = periodicity_strength(df, "t", "x", max_period=3).collect()
    assert all(r["strength"] is None for r in out)


def test_periodicity_strength_grouped(spark):
    from zef_spark.pipeline.rollup import periodicity_strength
    rows = ([("cyc", t, float(t % 3)) for t in range(30)]
            + [("lin", t, float(t)) for t in range(30)])
    df = spark.createDataFrame(rows, "k string, t int, x double")
    out = {(r["k"], r["period"]): r["strength"] for r in
           periodicity_strength(df, "t", "x", max_period=4,
                                by="k").collect()}
    assert out[("cyc", 3)] == 1.0
    assert out[("lin", 3)] < 0.05  # trend, not periodic
