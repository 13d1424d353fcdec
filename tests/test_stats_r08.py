"""r08 statistics additions: Spearman rho (midrank ties), Cohen's
kappa, Jensen-Shannon/KL drift, Kruskal-Wallis H — verified against
scipy-free closed forms on tiny frames."""

import math

import pytest


def _midranks(vals):
    s = sorted(vals)
    pos = {}
    for i, v in enumerate(s, start=1):
        pos.setdefault(v, []).append(i)
    return [sum(pos[v]) / len(pos[v]) for v in vals]


def _pearson(a, b):
    n = len(a)
    ma, mb = sum(a) / n, sum(b) / n
    num = sum((x - ma) * (y - mb) for x, y in zip(a, b))
    da = math.sqrt(sum((x - ma) ** 2 for x in a))
    db = math.sqrt(sum((y - mb) ** 2 for y in b))
    return num / (da * db)


def test_spearman_matches_midrank_pearson(spark):
    from zef_spark.pipeline.wrangling import spearman_corr
    xs = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0, 8.0, 9.0]
    ys = [2.0, 1.0, 4.0, 3.0, 6.0, 5.0, 9.0, 8.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    r = spearman_corr(df, "x", "y").collect()[0]
    want = _pearson(_midranks(xs), _midranks(ys))
    assert r["n"] == 8
    assert r["rho"] == pytest.approx(want, abs=1e-6)
    # perfect monotone (nonlinear) association -> exactly 1
    df2 = spark.createDataFrame(
        [(float(i), float(i ** 3)) for i in range(1, 9)],
        "x double, y double")
    assert spearman_corr(df2, "x", "y").collect()[0]["rho"] == 1.0


def test_spearman_keyed_and_degenerate(spark):
    from zef_spark.pipeline.wrangling import spearman_corr
    rows = ([("k1", float(i), float(10 - i)) for i in range(6)]
            + [("k2", 1.0, 1.0), ("k2", 1.0, 2.0)])  # zero x-variance
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r["k"]: r for r in
           spearman_corr(df, "x", "y", by="k").collect()}
    assert out["k1"]["rho"] == -1.0
    assert out["k2"]["rho"] is None


def test_cohens_kappa_closed_form(spark):
    from zef_spark.pipeline.evaluation import cohens_kappa
    # classic 2x2: raters agree on 20 yes + 15 no of 50
    rows = ([("y", "y")] * 20 + [("n", "n")] * 15
            + [("y", "n")] * 10 + [("n", "y")] * 5)
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    po = 35 / 50
    pe = (30 / 50) * (25 / 50) + (20 / 50) * (25 / 50)
    want = (po - pe) / (1 - pe)
    assert r["n"] == 50
    assert r["po"] == pytest.approx(po, abs=1e-6)
    assert r["pe"] == pytest.approx(pe, abs=1e-6)
    assert r["kappa"] == pytest.approx(want, abs=1e-6)
    # perfect agreement -> 1; single shared category -> NULL
    perf = spark.createDataFrame([("a", "a"), ("b", "b")] * 5,
                                 "a string, b string")
    assert cohens_kappa(perf, "a", "b").collect()[0]["kappa"] == 1.0
    const = spark.createDataFrame([("a", "a")] * 5,
                                  "a string, b string")
    assert cohens_kappa(const, "a", "b").collect()[0]["kappa"] is None


def test_js_divergence_identical_disjoint_and_kl_null(spark):
    from zef_spark.pipeline.wrangling import js_divergence
    same = ([("a", "x")] * 30 + [("a", "y")] * 20
            + [("b", "x")] * 30 + [("b", "y")] * 20)
    df = spark.createDataFrame(same, "s string, c string")
    r = js_divergence(df, "s", "c").collect()[0]
    assert r["n_a"] == 50 and r["n_b"] == 50
    assert abs(r["js"]) < 1e-9 and abs(r["kl_ab"]) < 1e-9  # exact 0s
    # disjoint supports: js = ln 2, both KLs undefined -> NULL
    disj = [("a", "x")] * 10 + [("b", "y")] * 10
    r2 = js_divergence(spark.createDataFrame(disj, "s string, c string"),
                       "s", "c").collect()[0]
    assert r2["js"] == pytest.approx(math.log(2), abs=1e-6)
    assert r2["kl_ab"] is None and r2["kl_ba"] is None
    # one-sided zero cell: kl_ab NULL, kl_ba defined
    mix = [("a", "x")] * 10 + [("a", "z")] * 10 + [("b", "x")] * 10
    r3 = js_divergence(spark.createDataFrame(mix, "s string, c string"),
                       "s", "c").collect()[0]
    assert r3["kl_ab"] is None
    assert r3["kl_ba"] == pytest.approx(math.log(2), abs=1e-6)


def _kw_ref(samples):
    """Pure-python Kruskal-Wallis with midranks + tie correction."""
    allv = [v for s in samples for v in s]
    n = len(allv)
    mr = dict(zip(range(n), _midranks(allv)))
    idx = 0
    h = 0.0
    for s in samples:
        r = sum(mr[idx + j] for j in range(len(s)))
        idx += len(s)
        h += r * r / len(s)
    h = 12.0 / (n * (n + 1)) * h - 3.0 * (n + 1)
    from collections import Counter
    ties = sum(t ** 3 - t for t in Counter(allv).values())
    return h, h / (1 - ties / (n ** 3 - n))


def test_kruskal_wallis_matches_reference(spark):
    from zef_spark.pipeline.abtest import kruskal_wallis
    ga = [2.9, 3.0, 2.5, 2.6, 3.2]
    gb = [3.8, 2.7, 4.0, 2.4]
    gc = [2.8, 3.4, 3.7, 2.2, 2.0, 2.7]   # 2.7 ties with gb's
    rows = ([("A", v) for v in ga] + [("B", v) for v in gb]
            + [("C", v) for v in gc])
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "g", "v", ["A", "B", "C"]).collect()[0]
    h, hc = _kw_ref([ga, gb, gc])
    assert r["n"] == 15 and r["dof"] == 2
    assert r["h"] == pytest.approx(h, abs=1e-6)
    assert r["h_corrected"] == pytest.approx(hc, abs=1e-6)


def test_kruskal_wallis_null_and_two_group_consistency(spark):
    """With k=2 and no ties, H equals the square of mann_whitney's
    z (both reduce to the same rank statistic)."""
    from zef_spark.pipeline.abtest import kruskal_wallis, mann_whitney_u
    ga = [1.0, 3.0, 5.0, 7.0, 9.0, 11.0]
    gb = [2.0, 4.0, 6.0, 8.0, 10.0]
    rows = [("A", v) for v in ga] + [("B", v) for v in gb]
    df = spark.createDataFrame(rows, "g string, v double")
    kw = kruskal_wallis(df, "g", "v", ["A", "B"]).collect()[0]
    mw = mann_whitney_u(df, "g", "v", "A", "B").collect()[0]
    assert kw["h"] == pytest.approx(mw["z"] ** 2, rel=1e-4)


def test_anova_oneway_closed_form(spark):
    from zef_spark.pipeline.abtest import anova_oneway
    ga = [2.9, 3.0, 2.5, 2.6, 3.2]
    gb = [3.8, 2.7, 4.0, 2.4]
    gc = [2.8, 3.4, 3.7, 2.2, 2.0, 2.7]
    rows = ([("A", v) for v in ga] + [("B", v) for v in gb]
            + [("C", v) for v in gc])
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v", ["A", "B", "C"]).collect()[0]
    n = 15
    s = sum(ga) + sum(gb) + sum(gc)
    q = sum(v * v for v in ga + gb + gc)
    sb = (sum(ga) ** 2 / 5 + sum(gb) ** 2 / 4 + sum(gc) ** 2 / 6)
    ssb = sb - s * s / n
    ssw = q - sb
    f = (ssb / 2) / (ssw / 12)
    assert r["n"] == 15 and r["k"] == 3
    assert r["dof_between"] == 2 and r["dof_within"] == 12
    assert r["f_stat"] == pytest.approx(f, abs=1e-5)
    assert r["eta_sq"] == pytest.approx(ssb / (ssb + ssw), abs=1e-6)
    # identical groups -> F ~ 0; empty group -> NULL
    same = [("A", 1.0), ("A", 2.0), ("B", 1.0), ("B", 2.0)]
    r2 = anova_oneway(spark.createDataFrame(same, "g string, v double"),
                      "g", "v", ["A", "B"]).collect()[0]
    assert r2["f_stat"] == pytest.approx(0.0, abs=1e-9)
    r3 = anova_oneway(spark.createDataFrame(same, "g string, v double"),
                      "g", "v", ["A", "B", "MISSING"]).collect()[0]
    assert r3["f_stat"] is None


def _theil_sen_ref(xs, ys):
    slopes = sorted((ys[j] - ys[i]) / (xs[j] - xs[i])
                    for i in range(len(xs)) for j in range(len(xs))
                    if i < j and xs[i] != xs[j])
    return slopes[math.ceil(len(slopes) / 2) - 1]


def test_theil_sen_matches_reference_and_resists_outlier(spark):
    from zef_spark.pipeline.wrangling import theil_sen
    xs = [float(i) for i in range(10)]
    ys = [2.0 * x + 1.0 for x in xs]
    ys[7] = 500.0                       # one wild outlier
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    r = theil_sen(df, "x", "y").collect()[0]
    assert r["n"] == 10 and r["n_pairs"] == 45
    assert r["slope"] == _theil_sen_ref(xs, ys)
    assert abs(r["slope"] - 2.0) < 1.0  # OLS would be dragged to ~7
    # keyed + degenerate (all equal x -> no valid pair -> NULL)
    rows = ([("k1", x, y) for x, y in zip(xs, ys)]
            + [("k2", 1.0, 5.0), ("k2", 1.0, 9.0)])
    out = {r["k"]: r for r in theil_sen(
        spark.createDataFrame(rows, "k string, x double, y double"),
        "x", "y", by="k").collect()}
    assert out["k1"]["slope"] == _theil_sen_ref(xs, ys)
    assert out["k2"]["slope"] is None and out["k2"]["n_pairs"] == 0
