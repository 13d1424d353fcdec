"""New r07 corpus/series statistics operators: PMI collocations,
Zipf profile, leakage-safe split, autocorrelation."""

import math

import pytest


def test_pmi_collocations_scores_phrases_over_frequency(spark):
    """'new york' (always together) must out-score 'of the' (frequent
    but independent) even though the latter outcounts it."""
    from zef_spark.pipeline.text import pmi_collocations
    docs = []
    # 30 docs of independent filler where 'of' and 'the' co-occur
    # sometimes, plus 10 docs gluing 'new york' together
    for i in range(30):
        docs.append((i, "of the cat of dog the fish of bird the"))
    for i in range(10):
        docs.append((100 + i, "we flew to new york from new york"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {(r["a"], r["b"]): r for r in
           pmi_collocations(df, "text", min_count=5, k=50).collect()}
    assert ("new", "york") in out
    assert out[("new", "york")]["pmi"] > out[("of", "the")]["pmi"]
    # PMI value is ln(c_ab*N/(ca*cb)) over the bigram table exactly
    r = out[("new", "york")]
    assert r["n"] == 20


def test_zipf_profile_recovers_power_law(spark):
    """A synthetic corpus with counts ~ 1/rank must fit slope ~ -1
    with high r2."""
    from zef_spark.pipeline.text import zipf_profile
    words = []
    for rank in range(1, 51):
        words += [f"w{rank:03d}"] * max(1, round(1000 / rank))
    df = spark.createDataFrame([(0, " ".join(words))],
                               "doc_id long, text string")
    row = zipf_profile(df, "text").collect()[0]
    assert row["n_types"] == 50
    assert abs(row["slope"] + 1.0) < 0.05
    assert row["r2"] > 0.99


def test_leakage_safe_split_moves_clusters_together(spark):
    from zef_spark.pipeline.corpus import leakage_safe_split, split_corpus
    df = spark.createDataFrame([(i, f"doc {i}") for i in range(200)],
                               "doc_id long, text string")
    # two near-dup clusters: {1,2,3} and {50,51}
    pairs = spark.createDataFrame([(1, 2), (2, 3), (50, 51)],
                                  "id_a long, id_b long")
    out = {r["doc_id"]: r for r in leakage_safe_split(
        df, pairs, "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="s1").collect()}
    assert len(out) == 200
    # whole clusters share one split + key on the min-id representative
    assert {out[i]["split"] for i in (1, 2, 3)} == {out[1]["split"]}
    assert all(out[i]["split_key"] == 1 for i in (1, 2, 3))
    assert out[50]["split"] == out[51]["split"]
    assert out[50]["split_key"] == 50 and out[51]["split_key"] == 50
    # rows outside any cluster get bit-identical labels to plain split
    plain = {r["doc_id"]: r["split"] for r in split_corpus(
        df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="s1").collect()}
    for i in range(200):
        if i not in (1, 2, 3, 50, 51):
            assert out[i]["split"] == plain[i]
    # all three splits are populated at n=200
    assert {r["split"] for r in out.values()} == {"train", "val", "test"}


def test_acf_detects_period_and_matches_numpy(spark):
    """ACF of a period-4 series peaks at lag 4; values match the
    textbook formula computed in plain python."""
    from zef_spark.pipeline.rollup import acf
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    xs = [10.0, 2.0, 5.0, 2.0] * 8           # period 4
    rows = [("k", t0 + dt.timedelta(hours=i), x)
            for i, x in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp_ntz, x double")
    out = {r["lag"]: r for r in
           acf(df, "ts", "x", max_lag=6, by="k").collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    n = len(xs)
    mean = sum(xs) / n
    den = sum((v - mean) ** 2 for v in xs)

    def ref(lag):
        return round(sum((xs[t] - mean) * (xs[t + lag] - mean)
                         for t in range(n - lag)) / den, 6)
    for lag in range(1, 7):
        assert out[lag]["n_pairs"] == n - lag
        assert out[lag]["r"] == pytest.approx(ref(lag), abs=2e-6)
    assert out[4]["r"] > max(out[1]["r"], out[2]["r"], out[3]["r"])
    # constant series -> NULL r (zero variance)
    const = spark.createDataFrame(
        [("c", t0 + dt.timedelta(hours=i), 3.0) for i in range(10)],
        "k string, ts timestamp_ntz, x double")
    assert all(r["r"] is None for r in
               acf(const, "ts", "x", max_lag=2, by="k").collect())
