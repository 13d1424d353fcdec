"""Value cleaning (pipeline/wrangling.py): winsorize + impute."""

import pyspark.sql.functions as F
import pytest

from zef_spark.pipeline.wrangling import impute, winsorize


def test_winsorize_clamps_tails(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 100)] + [(100, 10000.0)],
        "id long, v double")
    out = winsorize(df, "v", 0.01, 0.99)
    mx = out.agg(F.max("v_winsor")).collect()[0][0]
    assert mx < 10000.0                      # outlier clamped
    [r] = out.where("id = 50").collect()
    assert r.v_winsor == 50.0                # interior untouched


def test_impute_mean_median_literal(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 2.0, "x"), (2, 3.0, 4.0, None),
         (3, None, None, "y")],
        "id long, a double, b double, c string")
    out = {r.id: r for r in impute(df, {"a": "mean", "b": "median",
                                        "c": "zz"}).collect()}
    assert out[3].a == 2.0     # mean(1, 3)
    assert out[3].b == 3.0     # median(2, 4)
    assert out[2].c == "zz"    # literal fill
    assert out[1].a == 1.0     # non-null untouched


def test_impute_mode_deterministic_tie(spark):
    df = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "b"), (4, "a"), (5, None)],
        "id long, s string")
    [r] = impute(df, {"s": "mode"}).where("id = 5").collect()
    assert r.s == "a"          # tie between a/b -> smallest value


def test_standardize_and_min_max(spark):
    from zef_spark.pipeline.wrangling import min_max_scale, standardize
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 5.0)],
        "k string, v double")
    z = {(r.k, r.v): r.v_z for r in
         standardize(df, ["v"], by="k").collect()}
    assert z[("a", 2.0)] == 0.0
    assert z[("a", 3.0)] == 1.0          # stddev_samp([1,2,3]) = 1
    assert z[("b", 5.0)] is None         # zero variance -> NULL
    s = {(r.k, r.v): r.v_scaled for r in
         min_max_scale(df, ["v"], by="k").collect()}
    assert s[("a", 1.0)] == 0.0 and s[("a", 3.0)] == 1.0
    assert s[("a", 2.0)] == 0.5
    assert s[("b", 5.0)] is None         # constant -> NULL
    # global form: 1-row broadcast, no window exchange on the table
    plan = (standardize(df, ["v"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan


def test_standardize_keeps_null_group_keys(spark):
    from zef_spark.pipeline.wrangling import min_max_scale, standardize
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 10.0), (None, 20.0)],
        "k string, v double")
    out = standardize(df, ["v"], by="k").collect()
    assert len(out) == 4                   # NULL-key rows NOT dropped
    z = {(r.k, r.v): r.v_z for r in out}
    assert z[(None, 10.0)] is not None     # scored within their group
    assert z[(None, 10.0)] == -z[(None, 20.0)]
    assert len(min_max_scale(df, ["v"], by="k").collect()) == 4


def test_robust_scale(spark):
    from zef_spark.pipeline.wrangling import robust_scale
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 1000.0),
         ("b", 5.0), ("b", 5.0)],
        "k string, v double")
    r = {(row.k, row.v): row.v_robust
         for row in robust_scale(df, ["v"], by="k").collect()}
    # group a: median 2.5, q1 1.75, q3 252.25 (linear interp) —
    # the OUTLIER moves the quartiles but bounded-ly; median centered
    assert r[("a", 2.0)] is not None and abs(r[("a", 2.0)]) < 0.01
    assert r[("b", 5.0)] is None        # zero IQR -> NULL
    # outlier insensitivity vs z-score: robust score of the normal
    # points stays small even with the 1000.0 present
    assert abs(r[("a", 1.0)]) < 1 and abs(r[("a", 3.0)]) < 1


def test_benford_check_digits_and_probs(spark):
    from zef_spark.pipeline.wrangling import benford_check
    df = spark.createDataFrame(
        [(1.0,), (19.5,), (0.002,), (250.0,), (2.5,), (-3.0,),
         (0.0,), (None,), (900.0,)],
        "v double")
    out = {r["digit"]: r for r in benford_check(df, "v").collect()}
    # digits: 1,1,2,2,2,9 (negatives/zero/null excluded)
    assert out[1]["n"] == 2 and out[2]["n"] == 3 and out[9]["n"] == 1
    assert abs(out[1]["observed_p"] - 2 / 6) < 1e-6
    import math
    assert abs(out[1]["expected_p"] - math.log10(2)) < 1e-6
    assert set(out) == {1, 2, 9}


def test_benford_check_extreme_magnitudes(spark):
    """Round-trip-rendering digit extraction is exact at every
    magnitude — the former format_number(·,10) path dropped values
    below ~5e-11 and could carry 0.0999…9 renderings to digit 1."""
    from zef_spark.pipeline.wrangling import benford_check
    df = spark.createDataFrame(
        [(5e-11,), (7e-300,), (9.99e307,), (0.09999999999999999,),
         (1e-5,), (3.0,)], "v double")
    out = {r["digit"]: r["n"] for r in benford_check(df, "v").collect()}
    # 5e-11→5, 7e-300→7, 9.99e307→9, 0.0999…9 renders "0.09999…"→9,
    # 1e-5→1, 3.0→3 — nothing dropped, nothing mis-carried
    assert out == {5: 1, 7: 1, 9: 2, 1: 1, 3: 1}


def test_validate_expectations_one_scan(spark):
    from pyspark.sql import functions as F
    from zef_spark.pipeline.wrangling import validate_expectations
    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "A"), (2, 3.0, "B"),
         (4, None, "C")],
        "k long, v double, cat string")
    out = {r["rule"]: r["n_violations"]
           for r in validate_expectations(df, [
               ("v_positive", F.col("v") > 0),
               ("cat_enum", F.col("cat").isin("A", "B")),
           ], unique=["k"]).collect()}
    # null v counts as a violation (expectation not satisfied)
    assert out["v_positive"] == 2
    assert out["cat_enum"] == 1
    assert out["unique(k)"] == 2      # both rows of the dup key


def test_ks_distance_exact_with_ties(spark):
    """KS D equals the hand-computed statistic, ties absorbed before
    the step evaluates; identical samples give D=0."""
    from zef_spark.pipeline.wrangling import ks_distance
    rows = ([("k", "a", v) for v in [1.0, 2.0, 3.0, 4.0]]
            + [("k", "b", v) for v in [3.0, 4.0, 5.0, 6.0]]
            + [("t", "a", 1.0), ("t", "b", 1.0)])
    df = spark.createDataFrame(rows, "g string, s string, v double")
    out = {r["g"]: r for r in
           ks_distance(df, "g", "s", "v").collect()}
    # F_a jumps to .5 at 2 while F_b still 0 -> D = 0.5
    assert out["k"]["ks"] == 0.5
    assert out["k"]["n_a"] == 4 and out["k"]["n_b"] == 4
    assert out["t"]["ks"] == 0.0          # tie absorbed: 1/1 vs 1/1
