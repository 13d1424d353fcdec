"""Unit tests for isotonic (PAV) calibration
(pipeline/evaluation.py isotonic_calibration / apply_calibration)."""

import pytest
from pyspark.sql import functions as F


def test_pav_pools_violators_small_case(spark):
    from zef_spark.pipeline.evaluation import isotonic_calibration
    # 4 bins of 2 rows; rates by bin: 0.0, 1.0, 0.5, 1.0 — bins 2+3
    # violate (1.0 > 0.5) and must pool to 0.75
    rows = [(0.1, 0), (0.15, 0),
            (0.3, 1), (0.35, 1),
            (0.5, 1), (0.55, 0),
            (0.8, 1), (0.85, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    model = isotonic_calibration(df, "s", "y", bins=4)
    ps = [p for _, p in model]
    assert ps == sorted(ps)          # monotone
    assert ps[0] == 0.0 and ps[-1] == 1.0
    assert 0.75 in [round(p, 6) for p in ps]


def test_pav_already_monotone_identity(spark):
    from zef_spark.pipeline.evaluation import isotonic_calibration
    rows = [(0.1, 0), (0.2, 0), (0.6, 1), (0.7, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    model = isotonic_calibration(df, "s", "y", bins=2)
    assert [round(p, 6) for _, p in model] == [0.0, 1.0]


def test_apply_calibration_monotone_and_clamped(spark):
    from zef_spark.pipeline.evaluation import (apply_calibration,
                                               isotonic_calibration)
    import random
    rng = random.Random(5)
    rows = [(rng.random(),) for _ in range(300)]
    # labels correlated with score → nontrivial increasing map
    labeled = [(s, 1 if rng.random() < s else 0) for (s,) in rows]
    df = spark.createDataFrame(labeled, "s double, y int")
    model = isotonic_calibration(df, "s", "y", bins=10)
    out = (apply_calibration(df, "s", model)
           .orderBy("s").select("s", "calibrated").collect())
    cal = [r["calibrated"] for r in out]
    assert all(a <= b for a, b in zip(cal, cal[1:]))   # monotone
    # below-first-breakpoint clamps to the first level
    low = apply_calibration(
        spark.createDataFrame([(-5.0,), (None,)], "s double"),
        "s", model).collect()
    assert low[0]["calibrated"] == pytest.approx(model[0][1], abs=1e-6)
    assert low[1]["calibrated"] is None


def test_calibration_preserves_global_rate(spark):
    from zef_spark.pipeline.evaluation import (apply_calibration,
                                               isotonic_calibration)
    rows = [(i / 100.0, 1 if i % 3 == 0 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "s double, y int")
    model = isotonic_calibration(df, "s", "y", bins=5)
    out = apply_calibration(df, "s", model).collect()
    mean_cal = sum(r["calibrated"] for r in out) / len(out)
    true_rate = sum(y for _, y in rows) / len(rows)
    # isotonic regression preserves the weighted mean
    assert mean_cal == pytest.approx(true_rate, abs=1e-4)
