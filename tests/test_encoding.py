"""Unit tests for the categorical-encoding tier
(pipeline/encoding.py): one_hot, count_encode, interaction_features,
feature_hash (dense + sparse, cross-form equality)."""

import hashlib

import pytest
from pyspark.sql import functions as F


def _df(spark):
    rows = [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0),
            (None, "y", 4.0)]
    return spark.createDataFrame(rows, "c string, d string, v double")


def test_one_hot_explicit_vocab(spark):
    from zef_spark.pipeline.encoding import one_hot
    out = one_hot(_df(spark), "c", vocab=["a", "b", "z"]).collect()
    by_v = {r["v"]: (r["oh_c_a"], r["oh_c_b"], r["oh_c_z"])
            for r in out}
    assert by_v[1.0] == (1, 0, 0) and by_v[3.0] == (0, 1, 0)
    assert by_v[4.0] == (0, 0, 0)  # NULL → all zeros


def test_one_hot_derived_vocab_sorted(spark):
    from zef_spark.pipeline.encoding import one_hot
    out = one_hot(_df(spark), "c")
    assert [c for c in out.columns if c.startswith("oh_")] == \
        ["oh_c_a", "oh_c_b"]


def test_count_encode(spark):
    from zef_spark.pipeline.encoding import count_encode
    out = count_encode(_df(spark), "c").collect()
    by_v = {r["v"]: r["ce_c"] for r in out}
    assert by_v[1.0] == 2 and by_v[3.0] == 1 and by_v[4.0] == 1
    norm = count_encode(_df(spark), "c", normalize=True).collect()
    assert {r["v"]: r["ce_c"] for r in norm}[1.0] == 0.5


def test_interaction_features_null_distinct(spark):
    from zef_spark.pipeline.encoding import interaction_features
    out = interaction_features(_df(spark), ["c", "d"]).collect()
    vals = {r["v"]: r["x_c_d"] for r in out}
    assert vals[1.0] == "a␟x"
    assert vals[4.0] == "∅␟y"
    assert len(set(vals.values())) == 4


def _py_bucket_sign(feat, dim, salt=""):
    h = hashlib.md5((feat + salt).encode()).hexdigest()
    return int(h[:15], 16) % dim, 1 if int(h[15], 16) % 2 == 0 else -1


def test_feature_hash_dense_matches_python_md5(spark):
    from zef_spark.pipeline.encoding import feature_hash
    dim = 8
    out = feature_hash(_df(spark), ["c", "d"], dim).collect()
    for r in out:
        expect = [0] * dim
        for col in ("c", "d"):
            if r[col] is not None:
                b, s = _py_bucket_sign(f"{col}={r[col]}", dim)
                expect[b] += s
        assert list(r["fh"]) == expect, r


def test_feature_hash_sparse_equals_dense(spark):
    from zef_spark.pipeline.encoding import feature_hash
    df = _df(spark).withColumn("id", F.monotonically_increasing_id())
    dim = 16
    dense = {r["id"]: list(r["fh"])
             for r in feature_hash(df, ["c", "d"], dim).collect()}
    sparse = feature_hash(df, ["c", "d"], dim, id_col="id",
                          sparse=True).collect()
    rebuilt = {i: [0] * dim for i in dense}
    for r in sparse:
        rebuilt[r["id"]][r["bucket"]] = r["value"]
    assert rebuilt == dense
    assert all(r["value"] != 0 for r in sparse)


def test_feature_hash_null_contributes_nothing(spark):
    from zef_spark.pipeline.encoding import feature_hash
    df = spark.createDataFrame([(None, None)], "c string, d string")
    r = feature_hash(df, ["c", "d"], 4).collect()[0]
    assert list(r["fh"]) == [0, 0, 0, 0]


def test_encoders_compose(spark):
    from zef_spark.pipeline.encoding import (count_encode,
                                             interaction_features)
    out = count_encode(
        interaction_features(_df(spark), ["c", "d"]), "x_c_d",
        normalize=True).collect()
    assert all(r["ce_x_c_d"] == 0.25 for r in out)


def test_class_weights_balanced_formula(spark):
    from zef_spark.pipeline.encoding import class_weights
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [(None,)] * 1, "c string")
    out = {r["label"]: r for r in class_weights(df, "c").collect()}
    # n=10, k=3: w_a = 10/(3*6), w_b = 10/(3*3), w_null = 10/(3*1)
    assert out["a"]["weight"] == pytest.approx(10 / 18, abs=1e-6)
    assert out["b"]["weight"] == pytest.approx(10 / 9, abs=1e-6)
    assert out["∅"]["weight"] == pytest.approx(10 / 3, abs=1e-6)
    # balanced: sum over classes of n*w equals n_total
    assert sum(r["n"] * r["weight"] for r in out.values()) == \
        pytest.approx(10.0, abs=1e-4)
