"""Unit tests for the r09b paired/ordinal statistics tier: Wilcoxon
signed-rank, CUPED, Jarque-Bera, Kendall tau-b, Ljung-Box, log-loss,
and int8 embedding quantization."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- wilcoxon

def test_wilcoxon_known_example(spark):
    from zef_spark.pipeline.abtest import wilcoxon_signed_rank
    # classic textbook pairs; d = a-b: [5, -3, 8, -1, 2, 4]
    # |d| sorted: 1,2,3,4,5,8 -> ranks 1..6 (no ties)
    # positive d: 5(r5), 8(r6), 2(r2), 4(r4) -> W+ = 17, W- = 4
    rows = [(10.0, 5.0), (4.0, 7.0), (20.0, 12.0),
            (3.0, 4.0), (9.0, 7.0), (11.0, 7.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    r = wilcoxon_signed_rank(df, "a", "b").collect()[0]
    assert r["n"] == 6
    assert r["w_plus"] == 17.0
    assert r["w_minus"] == 4.0
    n = 6.0
    var = n * (n + 1) * (2 * n + 1) / 24
    z = (17.0 - n * (n + 1) / 4) / math.sqrt(var)
    assert abs(r["z"] - z) < 1e-6


def test_wilcoxon_zero_diffs_drop_and_ties(spark):
    from zef_spark.pipeline.abtest import wilcoxon_signed_rank
    # two zero differences drop; |d| = [1,1,2] -> midranks 1.5,1.5,3
    rows = [(5.0, 5.0), (7.0, 7.0),
            (3.0, 2.0), (1.0, 2.0), (6.0, 4.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    r = wilcoxon_signed_rank(df, "a", "b").collect()[0]
    assert r["n"] == 3
    # positive d: +1 (rank 1.5), +2 (rank 3) -> W+ = 4.5
    assert r["w_plus"] == 4.5
    assert r["w_minus"] == 1.5


def test_wilcoxon_all_zero_diffs_null_z(spark):
    from zef_spark.pipeline.abtest import wilcoxon_signed_rank
    df = spark.createDataFrame([(1.0, 1.0), (2.0, 2.0)],
                               "a double, b double")
    r = wilcoxon_signed_rank(df, "a", "b").collect()[0]
    assert r["n"] == 0 and r["z"] is None


# ------------------------------------------------------------------- cuped

def test_cuped_matches_numpy(spark):
    import numpy as np
    from zef_spark.pipeline.abtest import cuped_adjust
    rng = np.random.RandomState(7)
    x = rng.normal(10, 2, 400)
    y = 3.0 * x + rng.normal(0, 1, 400)
    g = np.where(np.arange(400) % 2 == 0, "A", "B")
    rows = [(str(gi), float(yi), float(xi))
            for gi, yi, xi in zip(g, y, x)]
    df = spark.createDataFrame(rows, "g string, y double, x double")
    r = cuped_adjust(df, "g", "y", "x", "A", "B").collect()[0]
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    assert abs(r["theta"] - theta) < 1e-3
    rho2 = np.corrcoef(x, y)[0, 1] ** 2
    assert abs(r["var_reduction"] - rho2) < 1e-3
    ya = y[g == "A"].mean()
    xa = x[g == "A"].mean()
    maa = ya - theta * (xa - x.mean())
    assert abs(r["mean_a_adj"] - maa) < 1e-3
    # CUPED invariance: adjusted diff == raw diff shifted by
    # theta*(x-bar_a - x-bar_b); with a balanced covariate the two
    # stay close
    assert abs((r["mean_a_adj"] - r["mean_b_adj"]) - r["diff_adj"]) \
        < 1e-6


def test_cuped_degenerate_covariate(spark):
    from zef_spark.pipeline.abtest import cuped_adjust
    df = spark.createDataFrame(
        [("A", 1.0, 5.0), ("A", 2.0, 5.0), ("B", 3.0, 5.0)],
        "g string, y double, x double")
    r = cuped_adjust(df, "g", "y", "x", "A", "B").collect()[0]
    assert r["theta"] is None and r["mean_a_adj"] is None


# ------------------------------------------------------------- jarque-bera

def test_jarque_bera_matches_formula(spark):
    import numpy as np
    from zef_spark.pipeline.wrangling import jarque_bera
    rng = np.random.RandomState(3)
    v = rng.lognormal(0, 0.6, 500)  # clearly non-normal
    df = spark.createDataFrame([(float(x),) for x in v], "v double")
    r = jarque_bera(df, "v").collect()[0]
    m = v - v.mean()
    m2, m3, m4 = (m ** 2).mean(), (m ** 3).mean(), (m ** 4).mean()
    sk = m3 / m2 ** 1.5
    ku = m4 / m2 ** 2 - 3.0
    jb = len(v) / 6.0 * (sk * sk + ku * ku / 4.0)
    assert abs(r["skewness"] - sk) < 1e-4
    assert abs(r["kurtosis"] - ku) < 1e-4
    assert abs(r["jb"] - jb) / jb < 1e-4
    assert r["jb"] > 5.99  # rejects normality


def test_jarque_bera_constant_null(spark):
    from zef_spark.pipeline.wrangling import jarque_bera
    df = spark.createDataFrame([(1.0,)] * 5, "v double")
    r = jarque_bera(df, "v").collect()[0]
    assert r["skewness"] is None and r["jb"] is None


def test_jarque_bera_agrees_with_group_moments(spark, sf_dir):
    from zef_spark.pipeline.wrangling import jarque_bera, group_moments
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    jb = {r["c_mktsegment"]: r for r in
          jarque_bera(cust, "c_acctbal", by="c_mktsegment").collect()}
    gm = {r["c_mktsegment"]: r for r in
          group_moments(cust, "c_acctbal", by="c_mktsegment").collect()}
    for k in gm:
        assert jb[k]["skewness"] == gm[k]["skewness"]
        assert jb[k]["kurtosis"] == gm[k]["kurtosis"]


# ------------------------------------------------------------- kendall tau

def test_kendall_tau_perfect_and_reversed(spark):
    from zef_spark.pipeline.wrangling import kendall_tau
    rows = [(float(i), float(i * 2)) for i in range(10)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = kendall_tau(df, "x", "y").collect()[0]
    assert r["tau_b"] == 1.0 and r["s_stat"] == 45
    rows = [(float(i), float(-i)) for i in range(10)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = kendall_tau(df, "x", "y").collect()[0]
    assert r["tau_b"] == -1.0


def test_kendall_tau_matches_scipy_formula(spark):
    import numpy as np
    from zef_spark.pipeline.wrangling import kendall_tau
    rng = np.random.RandomState(11)
    x = rng.randint(0, 8, 60).astype(float)   # heavy ties
    y = (x + rng.randint(0, 5, 60)).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)],
        "x double, y double")
    r = kendall_tau(df, "x", "y").collect()[0]
    # exact reference computation
    n = len(x)
    s = sum((1 if (x[j] - x[i]) * (y[j] - y[i]) > 0
             else -1 if (x[j] - x[i]) * (y[j] - y[i]) < 0 else 0)
            for i in range(n) for j in range(i + 1, n))
    from collections import Counter
    tx = Counter(x.tolist()).values()
    ty = Counter(y.tolist()).values()
    n0 = n * (n - 1) / 2
    n1 = sum(t * (t - 1) / 2 for t in tx)
    n2 = sum(t * (t - 1) / 2 for t in ty)
    tau = s / math.sqrt((n0 - n1) * (n0 - n2))
    assert r["s_stat"] == s
    assert abs(r["tau_b"] - tau) < 1e-6


def test_kendall_tau_guard_fires(spark):
    from zef_spark.pipeline.wrangling import kendall_tau
    df = spark.createDataFrame(
        [(float(i), float(i)) for i in range(30)], "x double, y double")
    with pytest.raises(Exception, match="max_points_per_key"):
        kendall_tau(df, "x", "y", max_points_per_key=10).collect()


# --------------------------------------------------------------- ljung-box

def test_ljung_box_matches_formula(spark):
    import numpy as np
    from zef_spark.pipeline.rollup import ljung_box, acf
    rng = np.random.RandomState(5)
    v = np.cumsum(rng.normal(0, 1, 120))  # strongly autocorrelated
    rows = [(i, float(x)) for i, x in enumerate(v)]
    df = spark.createDataFrame(rows, "t int, v double")
    r = ljung_box(df, "t", "v", max_lag=6).collect()[0]
    rs = {row["lag"]: row["r"]
          for row in acf(df, "t", "v", max_lag=6, digits=12).collect()}
    n = len(v)
    q = n * (n + 2) * sum(rs[k] ** 2 / (n - k) for k in range(1, 7))
    assert r["n"] == n and r["dof"] == 6
    assert abs(r["q_stat"] - q) / q < 1e-6
    assert r["q_stat"] > 12.59  # chi2_6 critical: serial structure


def test_ljung_box_short_series(spark):
    from zef_spark.pipeline.rollup import ljung_box
    df = spark.createDataFrame(
        [(1, 1.0), (2, 3.0), (3, 2.0)], "t int, v double")
    r = ljung_box(df, "t", "v", max_lag=6).collect()[0]
    assert r["n"] == 3          # lag rows beyond n don't inflate n
    assert r["dof"] == 2        # only lags 1-2 defined


# ---------------------------------------------------------------- log loss

def test_log_loss_matches_formula(spark):
    import numpy as np
    from zef_spark.pipeline.evaluation import log_loss
    rng = np.random.RandomState(9)
    p = rng.uniform(0.05, 0.95, 200)
    y = (rng.uniform(size=200) < p)
    df = spark.createDataFrame(
        [(bool(yi), float(pi)) for yi, pi in zip(y, p)],
        "y boolean, p double")
    r = log_loss(df, "p", "y").collect()[0]
    ref = float(np.mean(-(y * np.log(p) + (1 - y) * np.log(1 - p))))
    assert r["n"] == 200
    assert abs(r["log_loss"] - ref) < 1e-5


def test_log_loss_clips_extremes(spark):
    from zef_spark.pipeline.evaluation import log_loss
    df = spark.createDataFrame(
        [(True, 0.0), (False, 1.0)], "y boolean, p double")
    r = log_loss(df, "p", "y").collect()[0]
    assert r["log_loss"] is not None and math.isfinite(r["log_loss"])


def test_log_loss_keyed_and_confident_mistakes(spark):
    from zef_spark.pipeline.evaluation import log_loss
    rows = [("good", True, 0.9), ("good", False, 0.1),
            ("bad", True, 0.1), ("bad", False, 0.9)]
    df = spark.createDataFrame(rows, "k string, y boolean, p double")
    out = {r["k"]: r["log_loss"]
           for r in log_loss(df, "p", "y", by="k").collect()}
    assert out["bad"] > out["good"]


# ------------------------------------------------------------ quantization

def test_quantize_roundtrip_bound(spark):
    import numpy as np
    from zef_spark.pipeline.embeddings import quantize_embeddings
    rng = np.random.RandomState(2)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 16)])
            for i in range(50)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    q = quantize_embeddings(df, "v").collect()
    for r in q:
        assert all(-127 <= qi <= 127 for qi in r["q_vec"])
        err = [abs(x - qi * r["q_scale"])
               for x, qi in zip(r["v"], r["q_vec"])]
        assert max(err) <= r["q_scale"] / 2 + 1e-12


def test_quantize_zero_vector_and_exact(spark):
    from zef_spark.pipeline.embeddings import quantize_embeddings
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [127.0, -127.0])],
        "id long, v array<double>")
    out = {r["id"]: r for r in quantize_embeddings(df, "v").collect()}
    assert out[1]["q_vec"] == [0, 0] and out[1]["q_scale"] == 0.0
    assert out[2]["q_vec"] == [127, -127] and out[2]["q_scale"] == 1.0


def test_quantization_profile_bounds(spark, sf_dir):
    from zef_spark.pipeline.embeddings import quantization_profile
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    r = quantization_profile(emb, "embedding").collect()[0]
    assert r["n"] > 0
    # max element error bounded by the worst per-vector scale/2;
    # scales here are ~max|v|/127 with |v| < 1 -> generous cap
    assert 0 < r["max_abs_err"] < 0.01
    assert 0 < r["mean_mse"] < r["max_abs_err"] ** 2
    assert r["mean_scale"] > 0


# ------------------------------------------------- sig-safe release parity

def test_round_sig_safe_array_form_many_columns(spark):
    """The r09 element_at spelling keeps a WIDE sig-safe release
    inside whole-stage codegen: 8 chains in one projection used to
    generate a 1.3MB processNext and trip janino (cuped)."""
    from zef_spark.functions.rounding import round_sig_safe
    df = spark.createDataFrame(
        [(1.23456789e5, -0.000012345, 7.5e8, 0.5)],
        "a double, b double, c double, d double")
    cols = [round_sig_safe(F.col(c) * F.lit(m), 6).alias(f"{c}{i}")
            for i, (c, m) in enumerate(
                [("a", 1.0), ("b", 1.0), ("c", 1.0), ("d", 1.0),
                 ("a", -1.0), ("b", -1.0), ("c", 3.0), ("d", 7.0)])]
    r = df.select(*cols).collect()[0]
    assert r["a0"] == 123456.789       # 6 int digits -> 3 dp cap
    assert r["b1"] == -1.2e-05         # < 1 -> full 6 dp
    assert r["c2"] == 7.5e8            # 9 int digits -> 0 dp
    assert r["d3"] == 0.5


def test_round_sig_safe_value_grid_unchanged(spark):
    """element_at spelling must land on the IDENTICAL grid as the
    original CASE chain (and the DuckDB twin)."""
    import duckdb
    from zef_spark.functions.rounding import round_sig_safe, \
        sql_round_sig_safe
    vals = [0.0, -0.0, 1.5, -1.5, 123456.789123, -123456.789123,
            1.23e-9, -1.23e-9, 9.87654321e8, -9.87654321e8,
            1.999999949999, 4.9999999e17, None]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r["y"] for r in
           df.select(round_sig_safe(F.col("x"), 6).alias("y"))
           .collect()]
    con = duckdb.connect()
    exp = []
    for v in vals:
        lit = "CAST(NULL AS DOUBLE)" if v is None \
            else f"CAST({v!r} AS DOUBLE)"
        exp.append(con.execute(
            f"SELECT {sql_round_sig_safe(lit)}").fetchone()[0])
    assert [repr(g) for g in got] == [repr(e) for e in exp]


# ------------------------------------------------------- binary ANN

def test_binary_quantize_bits(spark):
    from zef_spark.pipeline.similarity import binary_quantize
    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 0.0, -2.0])], "id long, v array<double>")
    r = binary_quantize(df, "v", dim=4).collect()[0]
    # bits: +,-,+(zero counts as >=0),- -> 0b0101 = 5
    assert r["sign_w0"] == 5


def test_hamming_topk_exact_and_rerank(spark):
    import numpy as np
    from zef_spark.pipeline.similarity import hamming_topk
    rng = np.random.RandomState(4)
    base = rng.normal(0, 1, 64)
    rows = [(0, [float(x) for x in base])]
    # id i flips exactly i signs -> hamming(probe, i) == i
    for i in range(1, 20):
        v = base.copy()
        v[:i] = -v[:i]
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = hamming_topk(df, "v", "id", [float(x) for x in base], k=5)
    got = [(r["id"], r["hamming"]) for r in out.collect()]
    assert got == [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4)]
    # rerank returns cosine-ordered ids with exact cosine attached
    out2 = hamming_topk(df, "v", "id", [float(x) for x in base],
                        k=3, rerank=3)
    rr = out2.collect()
    assert rr[0]["id"] == 0 and rr[0]["cosine"] == 1.0
    assert rr[0]["cosine"] >= rr[1]["cosine"] >= rr[2]["cosine"]


def test_hamming_estimates_angle(spark):
    """hamming/bits approximates angle/pi for random vectors."""
    import numpy as np
    from zef_spark.pipeline.similarity import hamming_topk
    rng = np.random.RandomState(8)
    q = rng.normal(0, 1, 64)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 64)])
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = hamming_topk(df, "v", "id", [float(x) for x in q], k=200)
    hams = [r["hamming"] for r in out.collect()]
    # random vs random: expected hamming = 32 of 64 bits
    assert 24 < sum(hams) / len(hams) < 40


def test_hamming_plan_no_shuffle_before_topk(spark):
    from zef_spark.pipeline.similarity import hamming_topk
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
    q = [0.1] * 64
    plan = (hamming_topk(emb, "embedding", "vec_id", q, k=10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


# ----------------------------------------------------------------- pacf

def test_pacf_matches_durbin_levinson_reference(spark):
    import numpy as np
    from zef_spark.pipeline.rollup import pacf, acf
    rng = np.random.RandomState(6)
    v = [0.0]
    for _ in range(199):          # AR(1), phi = 0.7
        v.append(0.7 * v[-1] + rng.normal())
    rows = [(i, float(x)) for i, x in enumerate(v)]
    df = spark.createDataFrame(rows, "t int, v double")
    got = {r["lag"]: r["pacf"]
           for r in pacf(df, "t", "v", max_lag=6).collect()}
    rs = {r["lag"]: r["r"]
          for r in acf(df, "t", "v", max_lag=6, digits=12).collect()}
    # independent python Durbin-Levinson
    phi = {1: {1: rs[1]}}
    ref = {1: rs[1]}
    for k in range(2, 7):
        num = rs[k] - sum(phi[k-1][j] * rs[k-j] for j in range(1, k))
        den = 1.0 - sum(phi[k-1][j] * rs[j] for j in range(1, k))
        pkk = num / den
        phi[k] = {j: phi[k-1][j] - pkk * phi[k-1][k-j]
                  for j in range(1, k)}
        phi[k][k] = pkk
        ref[k] = pkk
    for k in range(1, 7):
        assert abs(got[k] - ref[k]) < 1e-6, (k, got[k], ref[k])
    # AR(1) signature: pacf(1) ~ 0.7, higher lags near zero
    assert abs(got[1] - 0.7) < 0.15
    assert all(abs(got[k]) < 0.2 for k in range(3, 7))


def test_pacf_constant_series_null(spark):
    from zef_spark.pipeline.rollup import pacf
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(30)], "t int, v double")
    out = pacf(df, "t", "v", max_lag=3).collect()
    assert all(r["pacf"] is None for r in out)


def test_pacf_distributed_no_collect(spark):
    """pacf must stay a pure DataFrame plan (no driver round-trip):
    the recursion is unrolled into selects over the pivoted ACF."""
    from zef_spark.pipeline.rollup import pacf
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    series = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("h"))
              .agg(F.count(F.lit(1)).cast("double").alias("x")))
    df = pacf(series, "h", "x", by="event_type")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "LocalTableScan" not in plan  # not a collected result
    assert plan.count("Exchange hashpartitioning") <= 2


# ------------------------------------------------------------------- srm

def test_srm_balanced_and_skewed(spark):
    from zef_spark.pipeline.abtest import srm_check
    rows = [("A",)] * 500 + [("B",)] * 500
    df = spark.createDataFrame(rows, "g string")
    out = {r["group"]: r for r in srm_check(df, "g").collect()}
    assert out["__total__"]["chi2_term"] == 0.0
    assert out["__total__"]["dof"] == 1
    assert out["A"]["expected_n"] == 500.0
    # corrupted split: 600/400 under a 50/50 design -> chi2 = 40
    rows = [("A",)] * 600 + [("B",)] * 400
    df = spark.createDataFrame(rows, "g string")
    out = {r["group"]: r for r in srm_check(df, "g").collect()}
    assert out["__total__"]["chi2_term"] == 40.0
    assert out["__total__"]["chi2_term"] > 3.84  # SRM detected


def test_srm_explicit_design_ratios(spark):
    from zef_spark.pipeline.abtest import srm_check
    # 90/10 design realized exactly -> chi2 = 0
    rows = [("ctl",)] * 900 + [("trt",)] * 100
    df = spark.createDataFrame(rows, "g string")
    out = {r["group"]: r for r in
           srm_check(df, "g", expected={"ctl": 9, "trt": 1}).collect()}
    assert out["__total__"]["chi2_term"] == 0.0
    assert out["ctl"]["expected_n"] == 900.0


# -------------------------------------------------- weighted percentile

def test_weighted_percentile_hand_example(spark):
    from zef_spark.pipeline.wrangling import weighted_percentile
    # values 1..4 with weights 1,1,1,7 -> W=10
    # p50: cum(1)=1,cum(2)=2,cum(3)=3,cum(4)=10 -> first >= 5 is 4
    rows = [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 7.0)]
    df = spark.createDataFrame(rows, "v double, w double")
    r = weighted_percentile(df, "v", "w", ps=(0.3, 0.5)).collect()[0]
    assert r["wp50"] == 4.0
    assert r["wp30"] == 3.0      # first cum >= 3 is value 3
    assert r["w_total"] == 10.0


def test_weighted_percentile_unit_weights_match_disc(spark):
    """weights=1 must reduce to PERCENTILE_DISC (group_percentiles)."""
    import numpy as np
    from zef_spark.pipeline.wrangling import weighted_percentile
    from zef_spark.ops.df_ops import group_percentiles
    rng = np.random.RandomState(12)
    rows = [("k", float(x), 1.0) for x in rng.normal(0, 10, 101)]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    wp = weighted_percentile(df, "v", "w", by="k",
                             ps=(0.5, 0.9)).collect()[0]
    gp = group_percentiles(df, "k", "v", ps=(0.5, 0.9)).collect()[0]
    assert wp["wp50"] == gp["p50"]
    assert wp["wp90"] == gp["p90"]


def test_weighted_percentile_ties_and_guards(spark):
    import pytest as _pytest
    from zef_spark.pipeline.wrangling import weighted_percentile
    # tied values: RANGE frame sees all ties at once
    rows = [(5.0, 3.0), (5.0, 3.0), (9.0, 4.0)]
    df = spark.createDataFrame(rows, "v double, w double")
    r = weighted_percentile(df, "v", "w", ps=(0.5,)).collect()[0]
    assert r["wp50"] == 5.0      # cum(5)=6 >= 5
    with _pytest.raises(ValueError, match="whole percents"):
        weighted_percentile(df, "v", "w", ps=(0.505,))
    neg = spark.createDataFrame([(1.0, -2.0)], "v double, w double")
    with _pytest.raises(Exception, match="negative weight"):
        weighted_percentile(neg, "v", "w").collect()


# ------------------------------------------------ roc / ap / wilson

def test_roc_points_exact_small(spark):
    from zef_spark.pipeline.evaluation import roc_points
    # scores desc: 0.9(+), 0.8(-), 0.7(+), 0.6(-)
    rows = [(True, 0.9), (False, 0.8), (True, 0.7), (False, 0.6)]
    df = spark.createDataFrame(rows, "y boolean, p double")
    out = {r["threshold"]: r for r in roc_points(df, "p", "y").collect()}
    assert (out[0.9]["tp"], out[0.9]["fp"]) == (1, 0)
    assert (out[0.8]["tp"], out[0.8]["fp"]) == (1, 1)
    assert (out[0.7]["tp"], out[0.7]["fp"]) == (2, 1)
    assert out[0.6]["tpr"] == 1.0 and out[0.6]["fpr"] == 1.0


def test_roc_points_thinning_deterministic(spark):
    import numpy as np
    from zef_spark.pipeline.evaluation import roc_points
    rng = np.random.RandomState(13)
    rows = [(bool(rng.rand() < 0.3), float(v))
            for v in rng.uniform(0, 1, 5000)]
    df = spark.createDataFrame(rows, "y boolean, p double")
    out = roc_points(df, "p", "y", max_points=100).collect()
    assert len(out) <= 100
    # monotone along the curve
    pts = sorted((r["fpr"], r["tpr"]) for r in out)
    assert all(pts[i][1] <= pts[i+1][1] for i in range(len(pts)-1))


def test_average_precision_matches_sklearn_formula(spark):
    import numpy as np
    from zef_spark.pipeline.evaluation import average_precision
    rng = np.random.RandomState(14)
    y = rng.rand(300) < 0.25
    p = np.clip(0.25 + 0.4 * y + rng.normal(0, 0.25, 300), 0.001, 0.999)
    df = spark.createDataFrame(
        [(bool(a), float(b)) for a, b in zip(y, p)],
        "y boolean, p double")
    r = average_precision(df, "p", "y").collect()[0]
    # reference: step AP over distinct thresholds desc
    order = np.argsort(-p)
    ys, ps_ = y[order], p[order]
    ref, cp, ct = 0.0, 0, 0
    i = 0
    while i < len(ps_):
        j = i
        while j < len(ps_) and ps_[j] == ps_[i]:
            j += 1
        blk_p = int(ys[i:j].sum()); ct = j; cp += blk_p
        ref += blk_p * (cp / ct)
        i = j
    ref /= y.sum()
    assert abs(r["ap"] - ref) < 1e-6
    assert r["n_pos"] == int(y.sum())


def test_average_precision_perfect_ranking(spark):
    from zef_spark.pipeline.evaluation import average_precision
    rows = [(True, 0.9), (True, 0.8), (False, 0.2), (False, 0.1)]
    df = spark.createDataFrame(rows, "y boolean, p double")
    assert average_precision(df, "p", "y").collect()[0]["ap"] == 1.0


def test_wilson_ci_properties(spark):
    from zef_spark.pipeline.evaluation import wilson_ci
    rows = [("a", True)] * 8 + [("a", False)] * 2 \
        + [("edge", True)] * 10                      # p-hat = 1
    df = spark.createDataFrame(rows, "k string, y boolean")
    out = {r["k"]: r for r in wilson_ci(df, "y", by="k").collect()}
    a = out["a"]
    assert a["rate"] == 0.8 and a["lo"] < 0.8 < a["hi"]
    assert 0 <= a["lo"] and a["hi"] <= 1
    e = out["edge"]                                  # stays inside [0,1]
    assert e["rate"] == 1.0 and e["hi"] <= 1.0 and e["lo"] > 0.6
    # wider at smaller n: a (n=10) vs pooled 100x
    big = spark.createDataFrame(
        [("b", True)] * 800 + [("b", False)] * 200, "k string, y boolean")
    b = wilson_ci(big, "y", by="k").collect()[0]
    assert (b["hi"] - b["lo"]) < (a["hi"] - a["lo"])


# ------------------------------------------------------ tukey / gains

def test_tukey_pairs_match_formula(spark):
    import numpy as np
    from zef_spark.pipeline.abtest import tukey_hsd
    rng = np.random.RandomState(15)
    data = [("a", float(x)) for x in rng.normal(10, 2, 50)] \
        + [("b", float(x)) for x in rng.normal(12, 2, 60)] \
        + [("c", float(x)) for x in rng.normal(10.2, 2, 40)]
    df = spark.createDataFrame(data, "g string, v double")
    out = {(r["group_a"], r["group_b"]): r
           for r in tukey_hsd(df, "g", "v", ["a", "b", "c"]).collect()}
    import numpy as np
    arr = {k: np.array([v for g, v in data if g == k])
           for k in "abc"}
    n = sum(len(a) for a in arr.values())
    ssw = sum(((a - a.mean()) ** 2).sum() for a in arr.values())
    msw = ssw / (n - 3)
    for (i, j) in [("a", "b"), ("a", "c"), ("b", "c")]:
        diff = arr[i].mean() - arr[j].mean()
        se = (msw / 2 * (1 / len(arr[i]) + 1 / len(arr[j]))) ** 0.5
        r = out[(i, j)]
        assert abs(r["diff"] - diff) < 1e-4
        assert abs(r["q_stat"] - abs(diff) / se) < 1e-3
        assert r["dof"] == n - 3
    # the separated pair should dominate
    assert out[("a", "b")]["q_stat"] > out[("a", "c")]["q_stat"]


def test_gain_curve_perfect_and_random(spark):
    from zef_spark.pipeline.evaluation import gain_curve
    # 100 rows, 20 positives all with the top scores
    rows = [(True, float(100 - i)) for i in range(20)] \
        + [(False, float(80 - i)) for i in range(80)]
    df = spark.createDataFrame(rows, "y boolean, p double")
    out = {r["bucket"]: r for r in gain_curve(df, "p", "y").collect()}
    assert out[2]["capture"] == 1.0      # top 20% captures all
    assert out[1]["lift"] == 5.0         # 10% of rows, 50% of pos
    assert out[10]["capture"] == 1.0 and out[10]["lift"] == 1.0
    assert out[10]["n_cum"] == 100


def test_gain_curve_tie_blocks_never_split(spark):
    from zef_spark.pipeline.evaluation import gain_curve
    # one giant tie block covering rows 11..100: every decile
    # boundary inside it reads at the block end
    rows = [(True, 1.0)] * 10 + [(False, 0.5)] * 90
    df = spark.createDataFrame(rows, "y boolean, p double")
    out = {r["bucket"]: r for r in gain_curve(df, "p", "y").collect()}
    assert out[1]["n_cum"] == 10 and out[1]["capture"] == 1.0
    for b in range(2, 11):
        assert out[b]["n_cum"] == 100   # tie block indivisible


# --------------------------------------------- paired/blocked binary

def test_mcnemar_known(spark):
    from zef_spark.pipeline.abtest import mcnemar_test
    # 10 a-only, 4 b-only, 30 concordant
    rows = [(True, False)] * 10 + [(False, True)] * 4 \
        + [(True, True)] * 20 + [(False, False)] * 10
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = mcnemar_test(df, "a", "b").collect()[0]
    assert (r["b01"], r["b10"]) == (10, 4)
    assert abs(r["chi2"] - (6 * 6) / 14) < 1e-6
    conc = spark.createDataFrame([(True, True)] * 5,
                                 "a boolean, b boolean")
    assert mcnemar_test(conc, "a", "b").collect()[0]["chi2"] is None


def test_cochrans_q_reduces_to_mcnemar_at_k2(spark):
    import numpy as np
    from zef_spark.pipeline.abtest import cochrans_q, mcnemar_test
    rng = np.random.RandomState(16)
    rows = [(bool(rng.rand() < 0.5), bool(rng.rand() < 0.7))
            for _ in range(200)]
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    q = cochrans_q(df, ["a", "b"]).collect()[0]
    m = mcnemar_test(df, "a", "b").collect()[0]
    assert abs(q["q_stat"] - m["chi2"]) < 1e-6
    assert q["dof"] == 1


def test_cochrans_q_matches_formula(spark):
    import numpy as np
    from zef_spark.pipeline.abtest import cochrans_q
    rng = np.random.RandomState(17)
    t = rng.rand(120, 3) < np.array([0.3, 0.5, 0.6])
    df = spark.createDataFrame(
        [tuple(bool(v) for v in row) for row in t],
        "a boolean, b boolean, c boolean")
    r = cochrans_q(df, ["a", "b", "c"]).collect()[0]
    k = 3
    C = t.sum(axis=0); R = t.sum(axis=1); N = R.sum()
    q = k * (k - 1) * ((C - N / k) ** 2).sum() \
        / (k * N - (R ** 2).sum())
    assert abs(r["q_stat"] - q) < 1e-4
    assert r["k"] == 3 and r["dof"] == 2


def test_friedman_matches_formula_and_detects_effect(spark):
    import numpy as np
    from zef_spark.pipeline.abtest import friedman_test
    rng = np.random.RandomState(18)
    rows = []
    for b in range(40):
        base = rng.normal(0, 1)
        # treatment effects 0, 0.8, 1.6 over a shared block level
        for i, tv in enumerate(["t1", "t2", "t3"]):
            rows.append((b, tv, float(base + 0.8 * i
                                      + rng.normal(0, 0.5))))
    df = spark.createDataFrame(rows, "blk int, g string, v double")
    r = friedman_test(df, "blk", "g", "v",
                      ["t1", "t2", "t3"]).collect()[0]
    # reference: friedman on the per-block rank matrix
    vals = np.array([[v for (bb, g, v) in rows if bb == b]
                     for b in range(40)])
    rk = np.argsort(np.argsort(vals, axis=1), axis=1) + 1.0
    n, k = rk.shape
    rj = rk.sum(axis=0)
    chi2 = 12.0 / (n * k * (k + 1)) * (rj ** 2).sum() \
        - 3.0 * n * (k + 1)
    assert r["n_blocks"] == 40 and r["k"] == 3
    assert abs(r["chi2"] - chi2) < 1e-4
    assert r["chi2_corrected"] == r["chi2"]  # continuous: no ties
    assert r["chi2"] > 5.99                  # effect detected


def test_friedman_drops_incomplete_blocks_and_handles_ties(spark):
    from zef_spark.pipeline.abtest import friedman_test
    rows = [(1, "a", 1.0), (1, "b", 1.0), (1, "c", 2.0),
            (2, "a", 3.0), (2, "b", 1.0), (2, "c", 2.0),
            (3, "a", 1.0), (3, "b", 2.0)]          # block 3 incomplete
    df = spark.createDataFrame(rows, "blk int, g string, v double")
    r = friedman_test(df, "blk", "g", "v", ["a", "b", "c"]).collect()[0]
    assert r["n_blocks"] == 2
    # block 1 has a tie (a,b at 1.0 -> midranks 1.5,1.5)
    assert r["chi2_corrected"] is not None
    assert r["chi2_corrected"] >= r["chi2"]


# --------------------------------------------------- ece / cronbach

def test_ece_integrates_calibration_bins(spark):
    import numpy as np
    from zef_spark.pipeline.evaluation import (
        expected_calibration_error, calibration_bins)
    rng = np.random.RandomState(19)
    p = rng.uniform(0.05, 0.95, 400)
    y = rng.uniform(size=400) < np.clip(p + 0.15, 0, 1)  # miscalibrated
    df = spark.createDataFrame(
        [(bool(a), float(b)) for a, b in zip(y, p)],
        "y boolean, p double")
    e = expected_calibration_error(df, "p", "y").collect()[0]
    cb = calibration_bins(df, "p", "y").collect()
    ref = sum(r["n"] * abs(r["mean_score"] - r["pos_rate"])
              for r in cb) / sum(r["n"] for r in cb)
    assert abs(e["ece"] - ref) < 1e-6  # ece releases at 6 dp
    assert e["ece"] > 0.05                       # detects the shift
    # perfectly calibrated labels -> small ece
    y2 = rng.uniform(size=400) < p
    df2 = spark.createDataFrame(
        [(bool(a), float(b)) for a, b in zip(y2, p)],
        "y boolean, p double")
    e2 = expected_calibration_error(df2, "p", "y").collect()[0]
    assert e2["ece"] < e["ece"]


def test_cronbach_alpha_formula_and_extremes(spark):
    import numpy as np
    from zef_spark.pipeline.evaluation import cronbach_alpha
    rng = np.random.RandomState(20)
    latent = rng.normal(0, 1, 300)
    items = np.stack([latent + rng.normal(0, 0.4, 300)
                      for _ in range(3)], axis=1)
    df = spark.createDataFrame(
        [tuple(float(v) for v in row) for row in items],
        "a double, b double, c double")
    r = cronbach_alpha(df, ["a", "b", "c"]).collect()[0]
    k = 3
    vi = items.var(axis=0).sum()
    vt = items.sum(axis=1).var()
    ref = k / (k - 1) * (1 - vi / vt)
    assert abs(r["alpha"] - ref) < 1e-4
    assert r["alpha"] > 0.7           # strongly correlated items
    # independent items -> alpha near 0
    ind = rng.normal(0, 1, (300, 3))
    df2 = spark.createDataFrame(
        [tuple(float(v) for v in row) for row in ind],
        "a double, b double, c double")
    r2 = cronbach_alpha(df2, ["a", "b", "c"]).collect()[0]
    assert r2["alpha"] < 0.3


# ------------------------------------------------- mase / diversity

def test_mase_beats_and_loses_to_naive(spark):
    import numpy as np
    from zef_spark.pipeline.rollup import mase
    rng = np.random.RandomState(21)
    v = np.cumsum(rng.normal(0, 1, 100)) + 50
    # perfect forecast -> mase 0; shifted-by-large -> mase >> 1
    rows = [(i, float(a), float(a)) for i, a in enumerate(v)]
    df = spark.createDataFrame(rows, "t int, a double, p double")
    r = mase(df, "t", "a", "p").collect()[0]
    assert r["mase"] == 0.0 and r["mae"] == 0.0
    rows = [(i, float(a), float(a + 50)) for i, a in enumerate(v)]
    df = spark.createDataFrame(rows, "t int, a double, p double")
    r = mase(df, "t", "a", "p").collect()[0]
    assert r["mase"] > 1.0 and abs(r["mae"] - 50.0) < 1e-9
    assert r["n_naive"] == 99       # lag-1 defined for 99 rows


def test_mase_formula(spark):
    import numpy as np
    from zef_spark.pipeline.rollup import mase
    rng = np.random.RandomState(22)
    a = rng.normal(10, 3, 80)
    p = a + rng.normal(0, 1, 80)
    rows = [(i, float(x), float(y)) for i, (x, y) in
            enumerate(zip(a, p))]
    df = spark.createDataFrame(rows, "t int, a double, p double")
    r = mase(df, "t", "a", "p", season=1).collect()[0]
    ref = np.abs(a - p).mean() / np.abs(np.diff(a)).mean()
    assert abs(r["mase"] - ref) < 1e-4


def test_diversity_index_extremes(spark):
    from zef_spark.pipeline.text import diversity_index
    import math as m
    rows = [("mono", "en")] * 50 \
        + [("even", "en")] * 25 + [("even", "de")] * 25
    df = spark.createDataFrame(rows, "src string, lang string")
    out = {r["src"]: r for r in
           diversity_index(df, "lang", by="src").collect()}
    assert out["mono"]["richness"] == 1
    assert out["mono"]["shannon"] == 0.0
    assert out["mono"]["evenness"] is None
    assert out["even"]["richness"] == 2
    assert abs(out["even"]["shannon"] - m.log(2)) < 1e-6
    assert out["even"]["evenness"] == 1.0
    assert out["even"]["simpson"] == 0.5
