"""Round-9 statistics tier: Mann-Kendall, Benjamini-Hochberg FDR,
Brown-Forsythe, trimmed mean, Wald-Wolfowitz runs test.
Reference parity: the reference exposes the primitives (sort/
enumerate/frequencies — ITF zefops) from which these assemble; the
assembled tests are pipeline-surface extensions (SURVEY.md §2.P)."""

import math

import pytest
from pyspark.sql import functions as F


def test_mann_kendall_monotone_series(spark):
    from zef_spark.pipeline.wrangling import mann_kendall
    # strictly increasing: every pair concordant -> S = n(n-1)/2
    df = spark.createDataFrame(
        [("k", float(i), float(i) * 2.0) for i in range(10)],
        "g string, t double, v double")
    r = mann_kendall(df, "t", "v", by="g").collect()[0]
    assert r["n"] == 10 and r["s_stat"] == 45
    # no ties: var = n(n-1)(2n+5)/18 = 10*9*25/18 = 125
    assert r["var_s"] == 125.0
    assert r["z"] == pytest.approx((45 - 1) / math.sqrt(125.0),
                                   rel=1e-6)


def test_mann_kendall_ties_and_flat(spark):
    from zef_spark.pipeline.wrangling import mann_kendall
    # constant series: S=0, z=0, tie term kills most of the variance
    df = spark.createDataFrame(
        [("k", float(i), 5.0) for i in range(6)],
        "g string, t double, v double")
    r = mann_kendall(df, "t", "v", by="g").collect()[0]
    assert r["s_stat"] == 0
    # all 6 tied: var = [6*5*17 - 6*5*17]/18 = 0 -> z NULL
    assert r["var_s"] == 0.0 and r["z"] is None


def test_mann_kendall_guard(spark):
    from zef_spark.pipeline.wrangling import mann_kendall
    df = spark.range(30).select(
        F.lit("k").alias("g"), F.col("id").cast("double").alias("t"),
        F.col("id").cast("double").alias("v"))
    with pytest.raises(Exception) as ei:
        mann_kendall(df, "t", "v", by="g",
                     max_points_per_key=10).collect()
    assert "quadratic" in str(ei.value)


def test_benjamini_hochberg_all_reject(spark):
    from zef_spark.pipeline.abtest import benjamini_hochberg
    rows = [(f"t{i}", p) for i, p in
            enumerate([0.01, 0.02, 0.03, 0.04, 0.05])]
    df = spark.createDataFrame(rows, "id string, p double")
    out = benjamini_hochberg(df, "p", "id", alpha=0.05) \
        .orderBy("rank").collect()
    # p_(i) = i/100 <= i/5*0.05 = i/100 for every i -> all rejected,
    # and the step-up adjustment flattens every p_adj to 0.05
    assert all(r["reject"] for r in out)
    assert all(r["p_adj"] == pytest.approx(0.05) for r in out)


def test_benjamini_hochberg_partial(spark):
    from zef_spark.pipeline.abtest import benjamini_hochberg
    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205]
    df = spark.createDataFrame(
        [(f"t{i}", p) for i, p in enumerate(ps)],
        "id string, p double")
    out = benjamini_hochberg(df, "p", "id", alpha=0.05) \
        .orderBy("rank").collect()
    # m=8: i*alpha/m = .00625,.0125,.01875,.025,... -> only ranks
    # 1-2 pass the raw threshold; step-up p_adj: rank1 .008*? ->
    # p_adj(1)=min(.001*8/1, .008*8/2, ...)=.008; p_adj(2)=
    # min(.008*4,...)=.032? compute: p*m/i = [.008,.032,.104,.082,
    # .0672,.08,.0845714...,.205]; reverse min from the top:
    # [.008,.032,.0672,.0672,.0672,.08,.0845714,.205]
    adj = [r["p_adj"] for r in out]
    assert adj[0] == pytest.approx(0.008)
    assert adj[1] == pytest.approx(0.032)
    assert adj[2] == pytest.approx(0.0672)
    assert adj[4] == pytest.approx(0.0672)
    assert adj[7] == pytest.approx(0.205)
    rejects = [r["reject"] for r in out]
    assert rejects == [True, True, False, False, False, False,
                       False, False]
    # monotone non-decreasing adjustment
    assert all(a <= b + 1e-12 for a, b in zip(adj, adj[1:]))


def test_brown_forsythe_detects_spread_difference(spark):
    from zef_spark.pipeline.abtest import brown_forsythe
    import random
    rng = random.Random(7)
    rows = ([("narrow", 100.0 + rng.uniform(-1, 1))
             for _ in range(60)]
            + [("wide", 100.0 + rng.uniform(-50, 50))
               for _ in range(60)]
            + [("mid", 100.0 + rng.uniform(-10, 10))
               for _ in range(60)])
    df = spark.createDataFrame(rows, "g string, v double")
    r = brown_forsythe(df, "g", "v",
                       ["narrow", "wide", "mid"]).collect()[0]
    assert r["n"] == 180 and r["k"] == 3
    assert r["f_stat"] is not None and r["f_stat"] > 10.0
    # equal-spread groups: tiny F
    rows2 = [(g, 100.0 + rng.uniform(-5, 5))
             for g in ("a", "b", "c") for _ in range(60)]
    df2 = spark.createDataFrame(rows2, "g string, v double")
    r2 = brown_forsythe(df2, "g", "v", ["a", "b", "c"]).collect()[0]
    assert r2["f_stat"] < 5.0


def test_trimmed_mean_exact(spark):
    from zef_spark.pipeline.wrangling import trimmed_mean
    df = spark.createDataFrame(
        [("k", float(i)) for i in range(10)], "g string, v double")
    r = trimmed_mean(df, "v", by="g", trim=0.1).collect()[0]
    # k = floor(0.1*10) = 1 -> mean of 1..8 = 4.5
    assert r["n"] == 10 and r["n_used"] == 8
    assert r["trimmed_mean"] == 4.5
    # trim=0 degenerates to the mean
    r0 = trimmed_mean(df, "v", by="g", trim=0.0).collect()[0]
    assert r0["trimmed_mean"] == 4.5 and r0["n_used"] == 10


def test_runs_test_alternating_vs_trending(spark):
    from zef_spark.pipeline.abtest import runs_test
    # perfectly alternating around the median: maximal runs, z > 0
    alt = spark.createDataFrame(
        [("k", float(i), 10.0 if i % 2 else 0.0) for i in range(20)],
        "g string, t double, v double")
    ra = runs_test(alt, "t", "v", by="g").collect()[0]
    assert ra["n1"] == 10 and ra["n2"] == 10
    assert ra["runs"] == 20 and ra["z"] > 3.0
    # trending: two runs only, z < 0
    tr = spark.createDataFrame(
        [("k", float(i), float(i)) for i in range(20)],
        "g string, t double, v double")
    rt = runs_test(tr, "t", "v", by="g").collect()[0]
    # median element (rank 10) drops -> 19 signed points, runs=2
    assert rt["runs"] == 2 and rt["z"] < -3.0


def test_runs_test_expected_stats_exact(spark):
    from zef_spark.pipeline.abtest import runs_test
    # hand-checkable: n1=n2=2, sequence +,+,-,- -> runs=2
    df = spark.createDataFrame(
        [("k", 1.0, 5.0), ("k", 2.0, 6.0), ("k", 3.0, 1.0),
         ("k", 4.0, 2.0), ("k", 5.0, 3.0)],  # median=3 drops
        "g string, t double, v double")
    r = runs_test(df, "t", "v", by="g").collect()[0]
    assert (r["n1"], r["n2"], r["runs"]) == (2, 2, 2)
    er = 1 + 2 * 2 * 2 / 4.0          # 3.0
    vr = (2 * 2 * 2 * (2 * 2 * 2 - 4)) / (4.0 * 4 * 3)  # 2/3
    assert r["z"] == pytest.approx((2 - er) / math.sqrt(vr), rel=1e-6)
