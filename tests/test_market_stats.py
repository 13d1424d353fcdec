"""Unit tests for the r07 closing tier: market-basket rules,
Gini/Lorenz concentration, Kaplan-Meier survival, cross-correlation,
and mean-shift changepoint — hand-computed oracles on tiny frames."""

import math

import pytest
from pyspark.sql import functions as F


def test_frequent_itemset_pairs(spark):
    from zef_spark.pipeline.market import frequent_itemset_pairs
    # baskets: {a,b,c}, {a,b}, {a,c}, {b} → ab:2 ac:2 bc:1
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"),
            (3, "a"), (3, "c"), (4, "b"), (1, "a")]  # dup collapses
    df = spark.createDataFrame(rows, "bk int, it string")
    out = {(r["item_a"], r["item_b"]): (r["pair_count"], r["support"])
           for r in frequent_itemset_pairs(df, "bk", "it",
                                           min_count=2).collect()}
    assert out == {("a", "b"): (2, 0.5), ("a", "c"): (2, 0.5)}


def test_association_rules_confidence_lift(spark):
    from zef_spark.pipeline.market import association_rules
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"),
            (4, "b")]
    df = spark.createDataFrame(rows, "bk int, it string")
    out = {(r["antecedent"], r["consequent"]):
           (r["pair_count"], r["support"], r["confidence"], r["lift"])
           for r in association_rules(df, "bk", "it",
                                      min_count=2).collect()}
    # ab in 2 of 4 baskets; a in 3, b in 3
    assert out[("a", "b")] == (2, 0.5, round(2 / 3, 6),
                               round(4 * 2 / 9, 6))
    assert out[("b", "a")] == (2, 0.5, round(2 / 3, 6),
                               round(4 * 2 / 9, 6))


def test_gini_extremes(spark):
    from zef_spark.pipeline.wrangling import gini_coefficient
    eq = spark.createDataFrame([(i, 10.0) for i in range(8)],
                               "id int, x double")
    r = gini_coefficient(eq, "x", "id", n_ranges=3).collect()[0]
    assert r["n"] == 8 and r["gini"] == 0.0
    # one entity holds everything: G = (n-1)/n
    one = spark.createDataFrame(
        [(0, 100.0)] + [(i, 0.0) for i in range(1, 5)],
        "id int, x double")
    r = gini_coefficient(one, "x", "id", n_ranges=3).collect()[0]
    assert r["gini"] == round((5 - 1) / 5, 6) and r["total"] == 100.0


def test_lorenz_points_shape(spark):
    from zef_spark.pipeline.wrangling import lorenz_points
    # 4 entities with 1,2,3,4 → total 10; deciles map to ranks
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)], "id int, x double")
    out = {r["point"]: (r["cum_count"], r["cum_share"])
           for r in lorenz_points(df, "x", "id",
                                  n_ranges=2).collect()}
    assert len(out) == 10
    # rank ⌈k·4/10⌉: k=1,2→1; k=3,4,5→2; k=6,7→3; k=8,9,10→4
    assert out[2] == (1, 0.1) and out[5] == (2, 0.3)
    assert out[7] == (3, 0.6) and out[10] == (4, 1.0)


def test_kaplan_meier_textbook(spark):
    from zef_spark.pipeline.funnel import kaplan_meier
    # durations (observed): 1+, 2, 2, 3+, 4  (+ = censored)
    rows = [(1, 0), (2, 1), (2, 1), (3, 0), (4, 1)]
    df = spark.createDataFrame(rows, "duration int, observed int")
    out = {r["duration"]: r for r in
           kaplan_meier(df, "duration", "observed").collect()}
    assert out[1]["n_at_risk"] == 5 and out[1]["n_deaths"] == 0
    assert out[1]["survival"] == 1.0
    # at d=2: at_risk 4, deaths 2 → S = 1/2
    assert out[2]["n_at_risk"] == 4
    assert out[2]["survival"] == pytest.approx(0.5, abs=1e-6)
    # at d=4: at_risk 1, deaths 1 → zero factor pins S to exactly 0
    assert out[4]["survival"] == 0.0
    assert out[3]["n_censored"] == 1


def test_ccf_detects_shift(spark):
    from zef_spark.pipeline.rollup import ccf
    # y is x shifted by +2 steps → peak r at lag +2
    import random
    rnd = random.Random(7)
    xs = [rnd.random() for _ in range(40)]
    rows = [(t, xs[t], xs[t - 2] if t >= 2 else 0.5)
            for t in range(40)]
    df = spark.createDataFrame(rows, "t int, x double, y double")
    # y_{t+2} = x_t → corr(x_t, y_{t+2}) ≈ 1 → lag +2
    out = {r["lag"]: r["r"] for r in
           ccf(df, "t", "x", "y", max_lag=3).collect()}
    assert max(out, key=lambda k: out[k] or -2) == 2
    assert out[2] > 0.9


def test_changepoint_step_series(spark):
    from zef_spark.pipeline.rollup import changepoint
    rows = [("k", t, 1.0 if t < 6 else 9.0) for t in range(12)]
    df = spark.createDataFrame(rows, "k string, t int, x double")
    r = changepoint(df, "t", "x", by="k").collect()[0]
    assert r["split_index"] == 6 and r["n"] == 12
    assert r["mean_left"] == 1.0 and r["mean_right"] == 9.0
    assert r["split_ts"] == 5
    # gain = SSE0 (perfect split): SSE0 = Σx² − (Σx)²/n
    sse0 = (6 * 1 + 6 * 81) - (6 * 1 + 6 * 9) ** 2 / 12
    assert r["gain"] == pytest.approx(sse0, abs=1e-6)


def test_changepoint_tie_breaks_earliest(spark):
    from zef_spark.pipeline.rollup import changepoint
    # constant series: every split has gain 0 → earliest valid k
    rows = [("k", t, 5.0) for t in range(8)]
    df = spark.createDataFrame(rows, "k string, t int, x double")
    r = changepoint(df, "t", "x", by="k", min_seg=2).collect()[0]
    assert r["gain"] == 0.0 and r["split_index"] == 2
