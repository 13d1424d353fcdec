"""Unit tests for the model-evaluation tier (pipeline/evaluation.py)
— AUC / calibration / confusion / Brier against hand-computed
values, plus the abtest refactor staying green."""

import math

import pytest
from pyspark.sql import functions as F


def test_auc_perfect_separation(spark):
    from zef_spark.pipeline.evaluation import binary_auc
    rows = [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    r = binary_auc(df, "s", F.col("y") == 1).collect()[0]
    assert r["n_pos"] == 2 and r["n_neg"] == 2
    assert r["auc"] == 1.0


def test_auc_hand_computed_with_ties(spark):
    from zef_spark.pipeline.evaluation import binary_auc
    # pos scores {0.8, 0.5}, neg {0.5, 0.3}:
    # pairs: (.8 vs .5)=1, (.8 vs .3)=1, (.5 vs .5)=0.5, (.5 vs .3)=1
    # AUC = 3.5/4
    rows = [(0.8, 1), (0.5, 1), (0.5, 0), (0.3, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    r = binary_auc(df, "s", F.col("y") == 1,
                   n_ranges=2).collect()[0]
    assert r["auc"] == pytest.approx(3.5 / 4, abs=1e-6)


def test_auc_single_class_null(spark):
    from zef_spark.pipeline.evaluation import binary_auc
    df = spark.createDataFrame([(0.5, 1), (0.7, 1)],
                               "s double, y int")
    r = binary_auc(df, "s", F.col("y") == 1).collect()[0]
    assert r["auc"] is None and r["n_neg"] == 0


def test_auc_monotone_invariant(spark):
    from zef_spark.pipeline.evaluation import binary_auc
    import random
    rnd = random.Random(11)
    rows = [(rnd.random() * 10, rnd.random() < 0.4)
            for _ in range(200)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    a1 = binary_auc(df, "s", "y").collect()[0]["auc"]
    df2 = df.withColumn("s", F.col("s") * 100 + 7)
    a2 = binary_auc(df2, "s", "y").collect()[0]["auc"]
    assert a1 == a2


def test_calibration_bins(spark):
    from zef_spark.pipeline.evaluation import calibration_bins
    # bin 0: scores .05/.05 with 0 positives; bin 9: .95 ×2, 1 pos;
    # score 1.0 clamps into bin 9
    rows = [(0.05, 0), (0.05, 0), (0.95, 1), (0.95, 0), (1.0, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = {r["bin"]: r for r in
           calibration_bins(df, "s", F.col("y") == 1).collect()}
    assert set(out) == {0, 9}
    assert out[0]["n"] == 2 and out[0]["pos_rate"] == 0.0
    assert out[0]["mean_score"] == 0.05
    assert out[9]["n"] == 3
    assert out[9]["pos_rate"] == pytest.approx(2 / 3, abs=1e-6)


def test_confusion_at_threshold(spark):
    from zef_spark.pipeline.evaluation import confusion_at_threshold
    # threshold .5: tp=2 fp=1 tn=2 fn=1
    rows = [(0.9, 1), (0.6, 1), (0.7, 0), (0.2, 0), (0.1, 0),
            (0.3, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    r = confusion_at_threshold(df, "s", F.col("y") == 1,
                               0.5).collect()[0]
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (2, 1, 2, 1)
    assert r["precision"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["recall"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["f1"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["accuracy"] == pytest.approx(4 / 6, abs=1e-6)


def test_confusion_degenerate(spark):
    from zef_spark.pipeline.evaluation import confusion_at_threshold
    # no predicted positives → NULL precision, recall 0
    rows = [(0.1, 1), (0.2, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    r = confusion_at_threshold(df, "s", F.col("y") == 1,
                               0.5).collect()[0]
    assert r["precision"] is None and r["recall"] == 0.0
    assert r["f1"] is None


def test_brier_score(spark):
    from zef_spark.pipeline.evaluation import brier_score
    rows = [(1.0, 1), (0.0, 0), (0.5, 1), (0.8, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    r = brier_score(df, "s", F.col("y") == 1).collect()[0]
    assert r["n"] == 4
    assert r["brier"] == pytest.approx(
        (0 + 0 + 0.25 + 0.64) / 4, abs=1e-6)
