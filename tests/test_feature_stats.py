"""Unit tests for target encoding, the one-scan correlation matrix,
and grouped closed-form OLS (pipeline/wrangling.py additions)."""

import math

import pytest
from pyspark.sql import functions as F


def test_target_encode_smoothed(spark):
    from zef_spark.pipeline.wrangling import target_encode
    rows = [("a", 1.0), ("a", 3.0), ("b", 10.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    out = target_encode(df, "c", "y", smoothing=2.0).collect()
    mu = 14.0 / 3
    enc = {r["c"]: r["te_c"] for r in out}
    assert enc["a"] == pytest.approx((4 + 2 * mu) / 4, abs=1e-6)
    assert enc["b"] == pytest.approx((10 + 2 * mu) / 3, abs=1e-6)
    # input columns survive
    assert {c for c in out[0].asDict()} == {"c", "y", "te_c"}


def test_target_encode_loo(spark):
    from zef_spark.pipeline.wrangling import target_encode
    rows = [("a", 1.0), ("a", 3.0), ("b", 10.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    out = target_encode(df, "c", "y", smoothing=0.0,
                        loo=True).collect()
    mu = 14.0 / 3
    by_y = {r["y"]: r["te_c"] for r in out}
    # row (a,1): (4-1)/(2-1) = 3; row (a,3): (4-3)/1 = 1
    assert by_y[1.0] == 3.0 and by_y[3.0] == 1.0
    # singleton (b,10) with m=0 degenerates to the global mean
    assert by_y[10.0] == pytest.approx(mu, abs=1e-6)


def test_target_encode_null_category(spark):
    from zef_spark.pipeline.wrangling import target_encode
    rows = [(None, 2.0), (None, 4.0), ("a", 6.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    out = target_encode(df, "c", "y", smoothing=0.0).collect()
    enc = {r["c"]: r["te_c"] for r in out}
    assert enc[None] == 3.0 and enc["a"] == 6.0


def test_corr_matrix_known_values(spark):
    from zef_spark.pipeline.wrangling import corr_matrix
    # y = 2x exactly → r=1; z anticorrelated with x → r=-1
    rows = [(float(i), 2.0 * i, 10.0 - i) for i in range(8)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {(r["col_a"], r["col_b"]): r["r"]
           for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    assert out[("x", "y")] == 1.0
    assert out[("x", "z")] == -1.0 and out[("y", "z")] == -1.0


def test_corr_matrix_listwise_and_constant(spark):
    from zef_spark.pipeline.wrangling import corr_matrix
    rows = [(1.0, 1.0, 5.0), (2.0, None, 5.0), (3.0, 2.0, 5.0),
            (4.0, 4.0, 5.0)]
    df = spark.createDataFrame(rows, "x double, y double, k double")
    out = corr_matrix(df, ["x", "y", "k"]).collect()
    ns = {r["n"] for r in out}
    assert ns == {3}  # the NULL y row drops for ALL pairs
    res = {(r["col_a"], r["col_b"]): r["r"] for r in out}
    assert res[("x", "k")] is None  # zero variance
    # hand Pearson on (1,1),(3,2),(4,4)
    xs, ys = [1, 3, 4], [1, 2, 4]
    n = 3
    num = n * sum(a * b for a, b in zip(xs, ys)) \
        - sum(xs) * sum(ys)
    da = n * sum(a * a for a in xs) - sum(xs) ** 2
    db = n * sum(b * b for b in ys) - sum(ys) ** 2
    assert res[("x", "y")] == pytest.approx(
        num / math.sqrt(da * db), abs=1e-6)


def test_linreg_exact_line(spark):
    from zef_spark.pipeline.wrangling import linreg
    rows = [("g", float(i), 3.0 * i + 2.0) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    r = linreg(df, "x", "y", by="k").collect()[0]
    assert r["slope"] == 3.0 and r["intercept"] == 2.0
    assert r["r2"] == 1.0 and r["n"] == 10


def test_linreg_degenerate(spark):
    from zef_spark.pipeline.wrangling import linreg
    rows = [("one", 1.0, 5.0),
            ("flat", 2.0, 1.0), ("flat", 2.0, 9.0)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r["k"]: r for r in
           linreg(df, "x", "y", by="k").collect()}
    assert out["one"]["slope"] is None   # n < 2
    assert out["flat"]["slope"] is None  # zero x-variance


def test_linreg_hand_computed(spark):
    from zef_spark.pipeline.wrangling import linreg
    xs = [1.0, 2.0, 4.0, 7.0]
    ys = [2.0, 3.0, 3.5, 8.0]
    df = spark.createDataFrame(list(zip(xs, ys)),
                               "x double, y double")
    r = linreg(df, "x", "y").collect()[0]
    n = 4
    num = n * sum(a * b for a, b in zip(xs, ys)) \
        - sum(xs) * sum(ys)
    dx = n * sum(a * a for a in xs) - sum(xs) ** 2
    dy = n * sum(b * b for b in ys) - sum(ys) ** 2
    slope = num / dx
    assert r["slope"] == pytest.approx(slope, abs=1e-6)
    assert r["intercept"] == pytest.approx(
        (sum(ys) - slope * sum(xs)) / n, abs=1e-6)
    assert r["r2"] == pytest.approx(num * num / (dx * dy),
                                    abs=1e-6)


def test_group_moments_known_values(spark):
    import numpy as np
    from zef_spark.pipeline.wrangling import group_moments
    vals = [1.0, 2.0, 2.0, 3.0, 9.0]
    df = spark.createDataFrame([("a", v) for v in vals] +
                               [("b", 5.0), ("b", None)],
                               "k string, x double")
    out = {r["k"]: r for r in group_moments(df, "x",
                                            by="k").collect()}
    x = np.array(vals)
    m2 = ((x - x.mean()) ** 2).mean()
    m3 = ((x - x.mean()) ** 3).mean()
    m4 = ((x - x.mean()) ** 4).mean()
    a = out["a"]
    assert a["n"] == 5 and a["mean"] == pytest.approx(x.mean())
    assert a["variance"] == pytest.approx(m2, abs=1e-6)
    assert a["skewness"] == pytest.approx(m3 / m2 ** 1.5, abs=1e-6)
    assert a["kurtosis"] == pytest.approx(m4 / m2 ** 2 - 3, abs=1e-6)
    # constant key: zero variance → NULL shape stats
    b = out["b"]
    assert b["variance"] == 0.0
    assert b["skewness"] is None and b["kurtosis"] is None


def test_quantile_normalize_classic_example(spark):
    # the canonical Wikipedia/limma worked example
    from zef_spark.pipeline.wrangling import quantile_normalize
    rows = [(5.0, 4.0, 3.0), (2.0, 1.0, 4.0), (3.0, 4.0, 6.0),
            (4.0, 2.0, 8.0)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    out = quantile_normalize(df, ["a", "b", "c"]).collect()
    got = {(r["a"], r["b"], r["c"]): (r["qn_a"], r["qn_b"], r["qn_c"])
           for r in out}
    # sorted cols: a:(2,3,4,5) b:(1,2,4,4) c:(3,4,6,8)
    # rank means: r1=(2+1+3)/3=2, r2=(3+2+4)/3=3, r3=(4+4+6)/3=14/3,
    # r4=(5+4+8)/3=17/3; b's tied 4s span ranks 3,4 → (14/3+17/3)/2
    m = [2.0, 3.0, 14 / 3, 17 / 3]
    tie_b = (m[2] + m[3]) / 2
    assert got[(5.0, 4.0, 3.0)] == (
        pytest.approx(m[3]), pytest.approx(tie_b, abs=1e-6),
        pytest.approx(m[0]))
    assert got[(2.0, 1.0, 4.0)] == (
        pytest.approx(m[0]), pytest.approx(m[0]), pytest.approx(m[1]))
    assert got[(3.0, 4.0, 6.0)] == (
        pytest.approx(m[1]), pytest.approx(tie_b, abs=1e-6),
        pytest.approx(m[2], abs=1e-6))
    assert got[(4.0, 2.0, 8.0)] == (
        pytest.approx(m[2], abs=1e-6), pytest.approx(m[1]),
        pytest.approx(m[3], abs=1e-6))


def test_quantile_normalize_identical_distributions_after(spark):
    import numpy as np
    from zef_spark.pipeline.wrangling import quantile_normalize
    rng = np.random.RandomState(2)
    rows = [(float(a), float(b)) for a, b in
            zip(rng.randn(50) * 10, rng.exponential(5, 50))]
    df = spark.createDataFrame(rows, "a double, b double")
    out = quantile_normalize(df, ["a", "b"]).collect()
    qa = sorted(r["qn_a"] for r in out)
    qb = sorted(r["qn_b"] for r in out)
    assert qa == pytest.approx(qb)  # identical post-normalization


def test_trimmed_mean_known(spark):
    from zef_spark.ops.df_ops import trimmed_mean
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0]
    df = spark.createDataFrame([("a", v) for v in vals],
                               "k string, x double")
    r = trimmed_mean(df, "k", "x", trim=0.1).collect()[0]
    # floor(0.1*10)=1 from each end → mean of 2..9
    assert (r["n"], r["n_used"]) == (10, 8)
    assert r["tmean"] == pytest.approx(sum(range(2, 10)) / 8)


def test_topn_with_other(spark):
    from zef_spark.ops.df_ops import topn_with_other
    rows = [("a", 50.0)] * 2 + [("b", 30.0)] + \
           [(f"t{i}", 1.0) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, w double")
    out = {r["k"]: r for r in
           topn_with_other(df, "k", "w", n=2).collect()}
    assert set(out) == {"a", "b", "OTHER"}
    assert out["a"]["weight"] == 100.0 and out["b"]["weight"] == 30.0
    assert out["OTHER"]["weight"] == 5.0
    assert out["a"]["share"] == pytest.approx(100 / 135, abs=1e-6)


def test_rrf_fuse_known_ranks(spark):
    from zef_spark.pipeline.similarity import rrf_fuse
    a = spark.createDataFrame([(1, 9.0), (2, 8.0), (3, 7.0)],
                              "id long, s double")
    b = spark.createDataFrame([(3, 0.9), (1, 0.8)],
                              "id long, c double")
    out = {r["id"]: r for r in
           rrf_fuse([(a, "s"), (b, "c")], "id", k=60).collect()}
    # a-ranks: 1→1, 2→2, 3→3; b-ranks: 3→1, 1→2
    assert out[1]["rrf"] == pytest.approx(1 / 61 + 1 / 62, abs=1e-6)
    assert out[2]["rrf"] == pytest.approx(1 / 62, abs=1e-6)
    assert out[3]["rrf"] == pytest.approx(1 / 63 + 1 / 61, abs=1e-6)
    assert out[1]["n_lists"] == 2 and out[2]["n_lists"] == 1


def test_rrf_fuse_score_ties_break_on_id(spark):
    from zef_spark.pipeline.similarity import rrf_fuse
    a = spark.createDataFrame([(2, 5.0), (1, 5.0)],
                              "id long, s double")
    out = {r["id"]: r["rrf"] for r in
           rrf_fuse([(a, "s")], "id", k=10).collect()}
    assert out[1] == pytest.approx(1 / 11, abs=1e-6)  # id asc wins
    assert out[2] == pytest.approx(1 / 12, abs=1e-6)
