"""Unit tests for lag_features / time_series_split
(pipeline/rollup.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _series(spark):
    rows = [("a", dt.datetime(2024, 1, d), float(d))
            for d in range(1, 11)]
    return spark.createDataFrame(rows, "k string, ts timestamp,"
                                 " x double")


def test_lag_features_values(spark):
    from zef_spark.pipeline.rollup import lag_features
    out = lag_features(_series(spark), "ts", "x", by="k",
                       lags=(1, 3), windows=(3,)).orderBy("ts") \
        .collect()
    by_day = {r["x"]: r for r in out}
    r5 = by_day[5.0]
    assert r5["lag_1"] == 4.0 and r5["lag_3"] == 2.0
    assert r5["delta_1"] == 1.0 and r5["delta_3"] == 3.0
    # trailing mean of rows 2,3,4 (excludes self)
    assert r5["rmean_3"] == pytest.approx(3.0)
    # warm-up rows NULL: day1 has no lags; day3 lacks a full window
    assert by_day[1.0]["lag_1"] is None
    assert by_day[3.0]["rmean_3"] is None
    assert by_day[4.0]["rmean_3"] == pytest.approx(2.0)


def test_lag_features_one_shuffle(spark):
    from zef_spark.pipeline.rollup import lag_features
    out = lag_features(_series(spark), "ts", "x", by="k",
                       lags=(1, 2, 7), windows=(3, 7))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # all features share one


def test_time_series_split_embargo(spark):
    from zef_spark.pipeline.rollup import time_series_split
    train, test = time_series_split(
        _series(spark), "ts", "2024-01-05", embargo_seconds=86400)
    tr = [r["x"] for r in train.collect()]
    te = [r["x"] for r in test.collect()]
    assert max(tr) == 4.0          # strictly before Jan 5
    assert min(te) == 6.0          # Jan 5 purged by the 1-day embargo
    assert 5.0 not in tr + te


def _py_neg_idx(user, item, j, V, salt="neg_v1"):
    import hashlib
    h = hashlib.md5(f"{user}:{item}:{j}{salt}".encode()).hexdigest()
    return int(h[:15], 16) % V


def test_negative_sample_matches_python_replay(spark):
    from zef_spark.pipeline.corpus import negative_sample
    pos = [(u, f"i{p}") for u in ("u1", "u2") for p in (1, 2)]
    df = spark.createDataFrame(pos, "user string, item string")
    out = negative_sample(df, "user", "item", k=3).collect()
    vocab = sorted({i for _, i in pos})
    assert len(out) == len(pos) * 3
    by_key = {}
    for r in out:
        expect = vocab[_py_neg_idx(r["user"], r["item"],
                                   r["neg_no"], len(vocab))]
        assert r["neg_item"] == expect
        # flag is true iff the drawn item is one of the user's
        # actual positives
        user_items = {i for u, i in pos if u == r["user"]}
        assert r["is_accidental_positive"] == \
            (r["neg_item"] in user_items)
        by_key[(r["user"], r["item"], r["neg_no"])] = r["neg_item"]
    # deterministic: second run identical
    out2 = negative_sample(df, "user", "item", k=3).collect()
    for r in out2:
        assert by_key[(r["user"], r["item"], r["neg_no"])] == \
            r["neg_item"]


def test_negative_sample_external_vocab(spark):
    from zef_spark.pipeline.corpus import negative_sample
    df = spark.createDataFrame([("u", "a")], "user string, item string")
    vocab = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)],
                                  "item string")
    out = negative_sample(df, "user", "item", k=8,
                          vocab=vocab).collect()
    drawn = {r["neg_item"] for r in out}
    assert drawn <= {"a", "b", "c", "d"} and len(drawn) > 1
