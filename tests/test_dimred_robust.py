"""Unit tests for the dimensionality / robust-stats tier:
covariance_pairs, moment_partials (both paths), pca_fit/pca_project
(pipeline/embeddings.py) and mad_outliers / rank_transform
(pipeline/wrangling.py)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _vec_df(spark, rows):
    return spark.createDataFrame([(list(map(float, r)),) for r in rows],
                                 "v array<double>")


def test_covariance_pairs_known(spark):
    from zef_spark.pipeline.embeddings import covariance_pairs
    rows = [(1.0, 2.0, 0.0), (2.0, 4.0, 0.0),
            (3.0, 6.0, 0.0), (4.0, 8.0, 0.0)]
    df = _vec_df(spark, rows)
    out = {(r["dim_a"], r["dim_b"]): (r["n"], r["cov"])
           for r in covariance_pairs(df, "v",
                                     [(0, 0), (0, 1), (0, 2)]).collect()}
    X = np.array(rows)
    assert out[(0, 0)] == (4, pytest.approx(np.cov(X[:, 0], bias=True)))
    assert out[(0, 1)][1] == pytest.approx(
        np.cov(X[:, 0], X[:, 1], bias=True)[0, 1])
    assert out[(0, 2)][1] == 0.0


def test_covariance_pairs_listwise_short_vectors(spark):
    from zef_spark.pipeline.embeddings import covariance_pairs
    df = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, 4.0],), ([5.0],), (None,)],
        "v array<double>")
    out = covariance_pairs(df, "v", [(0, 1)]).collect()
    assert out[0]["n"] == 2  # short + NULL rows dropped


def test_moment_partials_exact_equals_numpy_path(spark):
    from zef_spark.pipeline.embeddings import moment_partials
    rng = np.random.RandomState(7)
    X = rng.randn(200, 5)
    df = _vec_df(spark, X.tolist())
    ex = moment_partials(df, "v", 5, exact=True).collect()[0]
    fast = moment_partials(df, "v", 5, exact=False).collect()[0]
    assert ex["n"] == fast["n"] == 200
    np.testing.assert_allclose(ex["s"], X.sum(axis=0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(ex["m"]),
                               (X.T @ X).ravel(), rtol=1e-9)
    np.testing.assert_allclose(fast["s"], ex["s"], rtol=1e-9)
    np.testing.assert_allclose(fast["m"], ex["m"], rtol=1e-9)


def test_pca_fit_properties(spark):
    from zef_spark.pipeline.embeddings import pca_fit
    rng = np.random.RandomState(3)
    # anisotropic cloud: variance concentrated in a known direction
    base = rng.randn(300, 4) * np.array([5.0, 1.0, 0.3, 0.05])
    df = _vec_df(spark, base.tolist())
    m = pca_fit(df, "v", dim=4, k=4)
    comps = np.asarray(m["components"])
    # rows orthonormal
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-9)
    # eigenvalues descending, sum == trace of covariance
    ev = m["explained_variance"]
    assert sorted(ev, reverse=True) == ev
    assert sum(ev) == pytest.approx(m["total_variance"], rel=1e-9)
    cov = np.cov(base.T, bias=True)
    assert m["total_variance"] == pytest.approx(np.trace(cov), rel=1e-9)
    # top component aligns with the dominant axis
    assert abs(comps[0][0]) > 0.99
    # deterministic sign: largest-|x| entry positive
    for r in comps:
        assert r[np.argmax(np.abs(r))] > 0


def test_pca_project_variance_matches_eigenvalues(spark):
    from zef_spark.pipeline.embeddings import pca_fit, pca_project
    rng = np.random.RandomState(11)
    X = rng.randn(250, 3) * np.array([3.0, 1.0, 0.2])
    df = _vec_df(spark, X.tolist())
    m = pca_fit(df, "v", dim=3, k=2)
    Y = np.array([r["pca"] for r in
                  pca_project(df, "v", m, digits=9).collect()])
    assert Y.shape == (250, 2)
    # variance along each projected axis equals its eigenvalue
    np.testing.assert_allclose(Y.var(axis=0, ddof=0),
                               m["explained_variance"], rtol=1e-6)
    # projected axes uncorrelated
    assert abs(np.cov(Y.T, bias=True)[0, 1]) < 1e-6


def test_mad_outliers_summary(spark):
    from zef_spark.pipeline.wrangling import mad_outliers
    vals = [("a", v) for v in
            [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0]]
    df = spark.createDataFrame(vals, "k string, x double")
    r = mad_outliers(df, "x", by="k", threshold=3.5).collect()[0]
    # sorted: median = value at ceil(8/2)=4th → 4.0; |x-4| sorted:
    # 0,1,1,2,2,3,3,96 → mad at 4th = 2.0
    assert (r["n"], r["median"], r["mad"]) == (8, 4.0, 2.0)
    # only 100.0 has 0.6745*96/2 = 32.4 > 3.5
    assert r["n_outliers"] == 1


def test_mad_outliers_zero_mad_flags_nothing(spark):
    from zef_spark.pipeline.wrangling import mad_outliers
    df = spark.createDataFrame(
        [("a", 5.0)] * 6 + [("a", 9.0)], "k string, x double")
    r = mad_outliers(df, "x", by="k").collect()[0]
    assert r["mad"] == 0.0 and r["n_outliers"] == 0


def test_mad_outliers_row_level(spark):
    from zef_spark.pipeline.wrangling import mad_outliers
    df = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 100]],
        "k string, x double")
    rows = mad_outliers(df, "x", by="k", summarize=False).collect()
    flags = {r["x"]: r["is_outlier"] for r in rows}
    assert flags[100.0] is True
    assert sum(flags.values()) == 1
    assert {c for c in rows[0].asDict()} == {
        "k", "x", "median", "mad", "is_outlier"}


def test_rank_transform_percent_rank(spark):
    from zef_spark.pipeline.wrangling import rank_transform
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 40.0),
         ("a", None)], "k string, x double")
    out = rank_transform(df, "x", by="k").collect()
    got = sorted((r["x"] is None, r["x"] or 0, r["pct_rank_x"])
                 for r in out)
    # percent_rank: (rank-1)/(n-1) with ties sharing rank
    assert [g[2] for g in got] == [0.0, 1 / 3, 1 / 3, 1.0, None] \
        or [g[2] for g in got] == [0.0, pytest.approx(0.333333),
                                   pytest.approx(0.333333), 1.0, None]


def test_rank_transform_ntile(spark):
    from zef_spark.pipeline.wrangling import rank_transform
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(8)], "k string, x double")
    out = rank_transform(df, "x", by="k", bins=4).collect()
    by_x = {r["x"]: r["ntile_x"] for r in out}
    assert [by_x[float(i)] for i in range(8)] == [1, 1, 2, 2, 3, 3, 4, 4]
