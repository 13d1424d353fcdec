"""Round-9 second batch: ACF regression coverage (the surviving
rollup.acf after the r09 duplicate-removal), the two-sample KS test,
RAG chunking, and exact-quota sampling. Reference parity: assembled
from the reference's primitive surface (sort/enumerate/frequencies/
group_by — ITF zefops); pipeline-surface extensions (SURVEY.md
§2.P)."""

import math

import pytest
from pyspark.sql import functions as F


def test_acf_constant_and_alternating(spark):
    from zef_spark.pipeline.rollup import acf
    # constant series: zero variance -> NULL r at every lag
    df = spark.createDataFrame(
        [("k", float(i), 3.0) for i in range(8)],
        "g string, t double, v double")
    rows = acf(df, "t", "v", by="g", max_lag=2).collect()
    assert len(rows) == 2
    assert all(r["r"] is None for r in rows)
    # perfectly alternating ±1: r(1) ≈ -1, r(2) ≈ +1 (population
    # normalization shrinks by (n-l)/n)
    alt = spark.createDataFrame(
        [("k", float(i), 1.0 if i % 2 else -1.0) for i in range(20)],
        "g string, t double, v double")
    got = {r["lag"]: r["r"]
           for r in acf(alt, "t", "v", by="g", max_lag=2).collect()}
    assert got[1] == pytest.approx(-19 / 20, abs=1e-9)
    assert got[2] == pytest.approx(18 / 20, abs=1e-9)


def test_acf_matches_numpy(spark):
    import numpy as np
    from zef_spark.pipeline.rollup import acf
    rng = np.random.default_rng(7)
    x = rng.normal(size=50).round(6)
    df = spark.createDataFrame(
        [("k", float(i), float(v)) for i, v in enumerate(x)],
        "g string, t double, v double")
    got = {r["lag"]: r["r"]
           for r in acf(df, "t", "v", by="g", max_lag=3).collect()}
    mu = x.mean()
    ss = ((x - mu) ** 2).sum()
    for l in (1, 2, 3):
        want = ((x[:-l] - mu) * (x[l:] - mu)).sum() / ss
        assert got[l] == pytest.approx(want, abs=1e-5)


def test_acf_short_series_no_pairs_beyond_n(spark):
    from zef_spark.pipeline.rollup import acf
    df = spark.createDataFrame(
        [("k", 1.0, 1.0), ("k", 2.0, 2.0)],
        "g string, t double, v double")
    rows = {r["lag"]: r for r in
            acf(df, "t", "v", by="g", max_lag=5).collect()}
    # only lag 1 has a surviving pair (n=2); beyond that: no
    # evidence, NULL r, zero pairs
    assert rows[1]["n_pairs"] == 1
    for l in (2, 3, 4, 5):
        assert rows[l]["n_pairs"] == 0 and rows[l]["r"] is None


def test_ks_identical_and_disjoint(spark):
    from zef_spark.pipeline.abtest import ks_test
    # identical samples -> D = 0
    rows = ([("a", float(i)) for i in range(20)]
            + [("b", float(i)) for i in range(20)])
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_test(df, "g", "v", "a", "b").collect()[0]
    assert r["n_a"] == 20 and r["n_b"] == 20
    assert r["d_stat"] == 0.0 and r["ks_stat"] == 0.0
    # disjoint supports -> D = 1
    rows2 = ([("a", float(i)) for i in range(10)]
             + [("b", 100.0 + i) for i in range(10)])
    df2 = spark.createDataFrame(rows2, "g string, v double")
    r2 = ks_test(df2, "g", "v", "a", "b").collect()[0]
    assert r2["d_stat"] == 1.0
    assert r2["ks_stat"] == pytest.approx(
        math.sqrt(100.0 / 20.0), rel=1e-6)


def test_ks_matches_scipy_formula(spark):
    from zef_spark.pipeline.abtest import ks_test
    # hand case with ties: a = [1,2,2,3], b = [2,3,3,4]
    rows = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 3.0),
            ("b", 2.0), ("b", 3.0), ("b", 3.0), ("b", 4.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_test(df, "g", "v", "a", "b").collect()[0]
    # ecdfs evaluated after ties: x=1: 1/4 vs 0; x=2: 3/4 vs 1/4;
    # x=3: 1 vs 3/4; x=4: 1 vs 1 -> D = 1/2
    assert r["d_stat"] == 0.5
    # empty side -> NULLs
    one = spark.createDataFrame([("a", 1.0)], "g string, v double")
    r0 = ks_test(one, "g", "v", "a", "b").collect()[0]
    assert r0["d_stat"] is None and r0["ks_stat"] is None


def test_ks_keyed(spark):
    from zef_spark.pipeline.abtest import ks_test
    rows = ([("k1", "a", float(i)) for i in range(10)]
            + [("k1", "b", float(i) + 0.5) for i in range(10)]
            + [("k2", "a", float(i)) for i in range(10)]
            + [("k2", "b", 50.0 + i) for i in range(10)])
    df = spark.createDataFrame(rows, "k string, g string, v double")
    got = {r["k"]: r for r in
           ks_test(df, "g", "v", "a", "b", by="k").collect()}
    assert got["k2"]["d_stat"] == 1.0
    assert 0.0 < got["k1"]["d_stat"] < 1.0


def test_chunk_text_windows(spark):
    from zef_spark.pipeline.corpus import chunk_text
    toks = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, toks), (2, "a b"), (3, ""),
                                (4, None)],
                               "doc_id long, text string")
    rows = chunk_text(df, "doc_id", "text",
                      chunk_tokens=4, overlap=1).collect()
    got = {(r["doc_id"], r["chunk_id"]): r for r in rows}
    # doc 1: stride 3, n=10 -> ceil(9/3)=3 chunks: [0..3],[3..6],[6..9]
    assert got[(1, 0)]["chunk"] == "t0 t1 t2 t3"
    assert got[(1, 1)]["chunk"] == "t3 t4 t5 t6"
    assert got[(1, 2)]["chunk"] == "t6 t7 t8 t9"
    assert got[(1, 2)]["n_tokens"] == 4
    # short doc -> exactly one chunk; empty/NULL -> none
    assert got[(2, 0)]["chunk"] == "a b" and got[(2, 0)]["n_tokens"] == 2
    assert {d for d, _ in got} == {1, 2}
    # every token covered, overlap carried
    import pytest as _pt
    with _pt.raises(ValueError):
        chunk_text(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_sample_k_per_group_deterministic(spark):
    from zef_spark.pipeline.corpus import sample_k_per_group
    rows = [(g, i) for g in ("x", "y") for i in range(20)]
    df = spark.createDataFrame(rows, "g string, id long")
    a = sorted((r["g"], r["id"]) for r in
               sample_k_per_group(df, "g", 5, "id").collect())
    b = sorted((r["g"], r["id"]) for r in
               sample_k_per_group(df, "g", 5, "id").collect())
    assert a == b and len(a) == 10
    assert sum(1 for g, _ in a if g == "x") == 5
    # different salt -> (almost surely) different draw, same quota
    c = sorted((r["g"], r["id"]) for r in
               sample_k_per_group(df, "g", 5, "id",
                                  salt="other").collect())
    assert len(c) == 10 and c != a
    # k beyond group size returns the whole group
    small = spark.createDataFrame([("x", 1), ("x", 2)],
                                  "g string, id long")
    assert sample_k_per_group(small, "g", 99, "id").count() == 2
