"""Unit tests for the DP tier (pipeline/privacy.py): deterministic
Laplace release, clipping, budget split, randomized response and its
unbiased estimator."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _py_uniform(key, salt):
    from zef_spark.pipeline.privacy import _U60
    h = hashlib.md5((key + salt).encode()).hexdigest()
    return (int(h[:15], 16) + 0.5) / _U60


def _py_laplace(key, b, salt):
    u = _py_uniform(key, salt)
    d = u - 0.5
    return -b * math.log(1 - 2 * d) if d >= 0 \
        else b * math.log(1 + 2 * d)


def _sig9(v, digits=6, max_sig=9):
    """Python replay of functions/rounding.py round_sig_safe."""
    a = abs(v)
    int_digits = 0 if a < 1.0 else len(str(int(a)))
    return round(v, min(digits, max_sig - int_digits))


def _release(true_val, key, b, salt="dp_v1"):
    """Python replay of the r08 mechanism: Laplace draw snapped to
    the 0.1 grid, added to the exact true aggregate, released with
    magnitude-safe (≤9 sig digit) rounding."""
    return _sig9(true_val + round(_py_laplace(key, b, salt), 1))


def test_dp_aggregate_matches_python_replay(spark):
    from zef_spark.pipeline.privacy import dp_aggregate
    rows = [("a", float(v)) for v in [1, 2, 3, 400]] + \
           [("b", 5.0), ("b", -3.0)]
    df = spark.createDataFrame(rows, "k string, x double")
    out = {r["k"]: r for r in
           dp_aggregate(df, "x", by="k", epsilon=2.0, lo=0.0,
                        hi=10.0).collect()}
    # group a: clipped sum = 1+2+3+10 = 16, n = 4
    b_cnt, b_sum = 1.0, 10.0
    exp_n = _release(4, "a|count", b_cnt)
    exp_s = _release(16, "a|sum", b_sum)
    assert out["a"]["dp_count"] == pytest.approx(exp_n, abs=1e-9)
    assert out["a"]["dp_sum"] == pytest.approx(exp_s, abs=1e-9)
    assert out["a"]["dp_mean"] == pytest.approx(
        _sig9(exp_s / exp_n), abs=1e-9)
    # group b: -3 clips to 0, 5 stays → sum 5
    exp_sb = _release(5, "b|sum", b_sum)
    assert out["b"]["dp_sum"] == pytest.approx(exp_sb, abs=1e-9)
    # true aggregates never leak into the schema
    cols = set(dp_aggregate(df, "x", by="k").columns)
    assert cols == {"k", "dp_count", "dp_sum", "dp_mean"}


def test_dp_aggregate_deterministic_and_salt_sensitive(spark):
    from zef_spark.pipeline.privacy import dp_aggregate
    df = spark.createDataFrame([("a", 1.0)], "k string, x double")
    r1 = dp_aggregate(df, "x", by="k").collect()[0]
    r2 = dp_aggregate(df, "x", by="k").collect()[0]
    r3 = dp_aggregate(df, "x", by="k", salt="dp_v2").collect()[0]
    assert r1 == r2                      # re-query: same draw
    assert r1["dp_sum"] != r3["dp_sum"]  # new salt: new draw


def test_randomized_response_replay_and_estimator(spark):
    from zef_spark.pipeline.privacy import randomized_response
    eps = 1.0
    p = math.exp(eps) / (1 + math.exp(eps))
    rows = [(i, i % 3 == 0) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, f boolean")
    out = randomized_response(df, "f", "id", epsilon=eps).collect()
    flips = 0
    for r in out:
        u = _py_uniform(f"{r['id']}|rr", "rr_v1")
        expect = r["f"] if u < p else (not r["f"])
        assert r["rr_flag"] == expect
        flips += r["rr_flag"] != r["f"]
    assert 0 < flips < 400  # actually randomizing, not constant
    # unbiased estimator recovers the true rate within sampling noise
    obs = sum(r["rr_flag"] for r in out) / 400
    est = (obs - (1 - p)) / (2 * p - 1)
    true = sum(f for _, f in rows) / 400
    assert est == pytest.approx(true, abs=0.12)


def test_randomized_response_null_passthrough(spark):
    from zef_spark.pipeline.privacy import randomized_response
    df = spark.createDataFrame([(1, None)], "id long, f boolean")
    assert randomized_response(df, "f", "id").collect()[0][
        "rr_flag"] is None
