"""Unit tests for the Poisson-bootstrap CI (pipeline/abtest.py
bootstrap_ci) and skip-gram co-occurrence (pipeline/text.py
token_cooccurrence)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _poisson_w(key, b, salt="boot_v1"):
    # replicate b draws from 8-hex chunk b%4 of md5(key:b//4:salt)
    from zef_spark.pipeline.abtest import POISSON1_CDF, _U32
    h = hashlib.md5(f"{key}:{b // 4}{salt}".encode()).hexdigest()
    u = int(h[8 * (b % 4):8 * (b % 4) + 8], 16) / _U32
    for k, t in enumerate(POISSON1_CDF):
        if u < t:
            return k
    return 9


def test_bootstrap_ci_matches_python_replay(spark):
    from zef_spark.pipeline.abtest import bootstrap_ci
    rows = [(i, float(10 + (i * 7) % 13)) for i in range(60)]
    # contract (r07 ADVICE): key_col must uniquely identify rows —
    # duplicate keys would receive IDENTICAL Poisson draws,
    # correlating resamples and silently narrowing the CI
    assert len({k for k, _ in rows}) == len(rows)
    df = spark.createDataFrame(rows, "k long, x double")
    B = 25
    r = bootstrap_ci(df, "x", "k", B=B, alpha=0.2).collect()[0]
    # python replay of the exact same deterministic bootstrap
    means = []
    for b in range(B):
        num = den = 0.0
        for key, x in rows:
            w = _poisson_w(key, b)
            num += w * x
            den += w
        if den:
            means.append(num / den)
    means.sort()
    bu = len(means)
    lo = means[math.ceil(0.1 * bu) - 1]
    hi = means[math.ceil(0.9 * bu) - 1]
    assert r["n"] == 60 and r["b_used"] == bu
    assert r["mean"] == pytest.approx(
        sum(x for _, x in rows) / 60, abs=1e-6)
    assert r["lo"] == pytest.approx(lo, abs=1e-6)
    assert r["hi"] == pytest.approx(hi, abs=1e-6)
    # the interval brackets the point estimate
    assert r["lo"] <= r["mean"] <= r["hi"]


def test_bootstrap_ci_null_values_excluded(spark):
    from zef_spark.pipeline.abtest import bootstrap_ci
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 7.0)], "k long, x double")
    r = bootstrap_ci(df, "x", "k", B=10).collect()[0]
    assert r["n"] == 2 and r["mean"] == 6.0


def test_token_cooccurrence_window(spark):
    from zef_spark.pipeline.text import token_cooccurrence
    df = spark.createDataFrame(
        [("a b c",), ("c b a",)], "text string")
    out = {(r["w1"], r["w2"]): r["cnt"]
           for r in token_cooccurrence(df, "text", window=2,
                                       k=10).collect()}
    # window=2 over "a b c": (a,b),(a,c),(b,c); "c b a" mirrors —
    # unordered pairs so every pair counts twice
    assert out == {("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 2}


def test_token_cooccurrence_window1_is_unordered_bigrams(spark):
    from zef_spark.pipeline.text import token_cooccurrence
    df = spark.createDataFrame([("x y x y",)], "text string")
    out = {(r["w1"], r["w2"]): r["cnt"]
           for r in token_cooccurrence(df, "text", window=1,
                                       k=10).collect()}
    assert out == {("x", "y"): 3}


def test_token_cooccurrence_short_and_punct(spark):
    from zef_spark.pipeline.text import token_cooccurrence
    df = spark.createDataFrame(
        [("solo",), ("", ), ("Hello, hello WORLD!",)], "text string")
    out = {(r["w1"], r["w2"]): r["cnt"]
           for r in token_cooccurrence(df, "text", window=2,
                                       k=10).collect()}
    # lowercased, punctuation split; single-token/empty docs drop
    assert out == {("hello", "hello"): 1, ("hello", "world"): 2}


def test_forecast_metrics_known_values(spark):
    from zef_spark.pipeline.rollup import forecast_metrics
    rows = [("a", 10.0, 8.0), ("a", 0.0, 1.0), ("a", -4.0, -4.0),
            ("a", None, 5.0), ("a", 2.0, None)]
    df = spark.createDataFrame(rows, "k string, a double, p double")
    r = forecast_metrics(df, "a", "p", by="k").collect()[0]
    # kept rows: (10,8), (0,1), (-4,-4); e = a-p = 2, -1, 0
    assert r["n"] == 3
    assert r["mae"] == pytest.approx(1.0)
    assert r["rmse"] == pytest.approx(math.sqrt(5 / 3), abs=1e-6)
    assert r["bias"] == pytest.approx(-1 / 3, abs=1e-6)
    # mape over a != 0: |2|/10, |0|/4 → mean 0.1
    assert r["mape"] == pytest.approx(0.1, abs=1e-6)
    # smape: 2*2/18, 2*1/1, 2*0/8 → mean of (0.2222.., 2, 0)
    assert r["smape"] == pytest.approx((2 / 9 + 2.0 + 0.0) / 3,
                                       abs=1e-6)


def test_forecast_metrics_all_zero_actuals(spark):
    from zef_spark.pipeline.rollup import forecast_metrics
    df = spark.createDataFrame([("a", 0.0, 0.0)],
                               "k string, a double, p double")
    r = forecast_metrics(df, "a", "p", by="k").collect()[0]
    assert r["mape"] is None and r["smape"] is None
    assert r["mae"] == 0.0
