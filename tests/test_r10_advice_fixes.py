"""Degenerate-input regressions for the r09 ADVICE findings:
srm_check zero-traffic design arms, tukey_hsd empty named groups,
kendall_tau single-point / n=2 keys, wilcoxon degenerate n."""

import math

from pyspark.sql import functions as F


# ------------------------------------------------------------ srm_check

def test_srm_zero_traffic_arm_inflates_chi2(spark):
    """A design arm receiving NO rows must contribute its full
    (0-e)^2/e term — the worst SRM is the one the r09 left join
    silently dropped."""
    from zef_spark.pipeline.abtest import srm_check
    df = spark.createDataFrame(
        [("a",)] * 60 + [("b",)] * 40, "g string")
    out = {r["group"]: r for r in
           srm_check(df, "g",
                     expected={"a": 1, "b": 1, "c": 2}).collect()}
    # arm c: e = 100 * 0.5 = 50, o = 0 -> term = 50
    assert out["c"]["n"] == 0
    assert out["c"]["expected_n"] == 50.0
    assert abs(out["c"]["chi2_term"] - 50.0) < 1e-9
    # a: e = 25, o = 60 -> 49; b: e = 25, o = 40 -> 9
    assert abs(out["__total__"]["chi2_term"] - (49.0 + 9.0 + 50.0)) \
        < 1e-6
    # dof from the DESIGN group count (3 - 1), not observed (2 - 1)
    assert out["__total__"]["dof"] == 2


def test_srm_uncovered_observed_group_nulls_total(spark):
    """An observed group missing from `expected` can't be scored —
    the total chi2 must be NULL, never silently understated."""
    from zef_spark.pipeline.abtest import srm_check
    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [("rogue",)] * 20, "g string")
    out = {r["group"]: r for r in
           srm_check(df, "g", expected={"a": 1, "b": 1}).collect()}
    assert out["rogue"]["expected_n"] is None
    assert out["rogue"]["chi2_term"] is None
    assert out["__total__"]["chi2_term"] is None
    assert out["rogue"]["n"] == 20  # surfaced, not dropped


def test_srm_equal_split_unchanged(spark):
    """The no-expected path keeps its r09 semantics."""
    from zef_spark.pipeline.abtest import srm_check
    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50, "g string")
    out = {r["group"]: r for r in srm_check(df, "g").collect()}
    assert out["__total__"]["chi2_term"] == 0.0
    assert out["__total__"]["dof"] == 1


# ------------------------------------------------------------ tukey_hsd

def test_tukey_empty_group_keeps_valid_pairs(spark):
    """An empty named group must not NULL the statistics of pairs
    between non-empty groups; dof drops to n - k_nonempty."""
    from zef_spark.pipeline.abtest import tukey_hsd
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 5.0), ("b", 6.0), ("b", 7.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = {(r["group_a"], r["group_b"]): r for r in
           tukey_hsd(df, "g", "x", ["a", "b", "ghost"]).collect()}
    ab = out[("a", "b")]
    assert ab["diff"] is not None and ab["q_stat"] is not None
    assert abs(ab["diff"] - (-4.0)) < 1e-9
    # dof = n - k_nonempty = 6 - 2, not 6 - 3
    assert ab["dof"] == 4
    # MSW = SSW/(n-k_nz) = (2+2)/4 = 1; se = sqrt(1/2*(2/3));
    # q = 4/se
    assert abs(ab["q_stat"] - 4.0 / math.sqrt(0.5 * (2.0 / 3.0))) \
        < 1e-6
    # pairs touching the empty group stay NULL
    assert out[("a", "ghost")]["q_stat"] is None
    assert out[("b", "ghost")]["diff"] is None


# ---------------------------------------------------------- kendall_tau

def test_kendall_single_point_key_survives(spark):
    """A key with one point emits (n=1, s=0, NULL tau/z) instead of
    vanishing from the output."""
    from zef_spark.pipeline.wrangling import kendall_tau
    rows = [("k1", 1.0, 2.0),
            ("k2", 1.0, 1.0), ("k2", 2.0, 3.0), ("k2", 3.0, 2.0),
            ("k2", 4.0, 4.0)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r["k"]: r for r in
           kendall_tau(df, "x", "y", by="k").collect()}
    assert set(out) == {"k1", "k2"}
    assert out["k1"]["n"] == 1
    assert out["k1"]["s_stat"] == 0
    assert out["k1"]["tau_b"] is None
    assert out["k1"]["z"] is None
    # the healthy key still computes: S = C - D = 5 - 1 = 4
    assert out["k2"]["s_stat"] == 4
    assert out["k2"]["tau_b"] is not None


def test_kendall_n2_key_null_z(spark):
    """At n=2 the v1 variance term divides by zero — z must be NULL
    (engine-portable), tau still defined (+/-1 without ties)."""
    from zef_spark.pipeline.wrangling import kendall_tau
    rows = [("k", 1.0, 5.0), ("k", 2.0, 7.0)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    r = kendall_tau(df, "x", "y", by="k").collect()[0]
    assert r["n"] == 2
    assert r["s_stat"] == 1
    assert r["tau_b"] == 1.0
    assert r["z"] is None


# ------------------------------------------------------------- wilcoxon

def test_wilcoxon_all_zero_diffs_n0(spark):
    """All-zero diffs: n=0 with NULL statistics (and the oracle now
    mirrors the coalesce)."""
    from zef_spark.pipeline.abtest import wilcoxon_signed_rank
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0)], "a double, b double")
    r = wilcoxon_signed_rank(df, "a", "b").collect()[0]
    assert r["n"] == 0
    assert r["z"] is None
