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


def test_psi_drift_zero_for_identical_and_detects_shift(spark):
    from zef_spark.pipeline.wrangling import psi_drift
    rows_a = [("a", float(v % 100)) for v in range(1000)]
    same = rows_a + [("b", float(v % 100)) for v in range(1000)]
    df = spark.createDataFrame(same, "s string, v double")
    out = psi_drift(df, "s", "v", bins=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_a"] == 1000 and r["n_b"] == 1000
    assert abs(r["psi"]) < 1e-9                    # identical -> 0
    # shifted current sample -> large PSI
    shifted = rows_a + [("b", float(v % 100) + 50.0)
                        for v in range(1000)]
    df2 = spark.createDataFrame(shifted, "s string, v double")
    r2 = psi_drift(df2, "s", "v", bins=10).collect()[0]
    assert r2["psi"] > 0.25                        # "significant" gate
    # keyed path: per-key rows
    keyed = [(k, s_, v) for k in ("x", "y") for s_, v in same]
    df3 = spark.createDataFrame(keyed, "k string, s string, v double")
    outs = psi_drift(df3, "s", "v", by="k", bins=5).collect()
    assert {r["k"] for r in outs} == {"x", "y"}
    assert all(abs(r["psi"]) < 1e-9 for r in outs)


def test_psi_drift_surfaces_keys_without_reference(spark):
    """r07 ADVICE regression: a by-key present only in sample 'b'
    (a new segment appearing after the baseline) must SURFACE with
    NULL psi, not vanish via the old inner join; an empty reference
    must yield NULL, not the greatest(NULL,eps)=eps garbage."""
    from zef_spark.pipeline.wrangling import psi_drift
    rows = ([("x", "a", float(v % 50)) for v in range(200)]
            + [("x", "b", float(v % 50)) for v in range(200)]
            + [("y", "b", float(v % 50)) for v in range(100)])
    df = spark.createDataFrame(rows, "k string, s string, v double")
    out = {r["k"]: r for r in
           psi_drift(df, "s", "v", by="k", bins=5).collect()}
    assert set(out) == {"x", "y"}           # 'y' surfaces
    assert abs(out["x"]["psi"]) < 1e-9
    assert out["y"]["psi"] is None          # no reference -> NULL
    assert out["y"]["n_a"] == 0 and out["y"]["n_b"] == 100
    # empty reference overall (global path): NULL psi, row present
    only_b = spark.createDataFrame(
        [("b", float(v)) for v in range(50)], "s string, v double")
    g = psi_drift(only_b, "s", "v", bins=5).collect()
    assert len(g) == 1 and g[0]["psi"] is None


def test_seasonal_decompose_recovers_components(spark):
    """x = 10 + phase_pattern: trend ~ 10 flat, seasonal recovers the
    pattern (centered), resid ~ 0; even-period branch also exact."""
    import datetime as dt
    from zef_spark.pipeline.rollup import seasonal_decompose
    t0 = dt.datetime(2024, 1, 1)
    pattern = [3.0, -1.0, 0.0, 2.0, -4.0, 1.0, -1.0]       # sums to 0
    rows = [("k", t0 + dt.timedelta(days=i), 10.0 + pattern[i % 7])
            for i in range(35)]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp_ntz, x double")
    out = {r["ts"]: r for r in seasonal_decompose(
        df, "ts", "x", period=7, by="k").collect()}
    assert len(out) == 35
    mid = out[t0 + dt.timedelta(days=10)]
    assert mid["trend"] == pytest.approx(10.0, abs=1e-6)
    assert mid["seasonal"] == pytest.approx(pattern[10 % 7], abs=1e-6)
    assert mid["resid"] == pytest.approx(0.0, abs=1e-6)
    # edges: first/last half-period rows have no trend
    assert out[t0]["trend"] is None
    assert out[t0 + dt.timedelta(days=34)]["trend"] is None
    # even period: 2x4 MA with half-weighted endpoints is exact on a
    # linear series (trend == the line, seasonal ~ 0)
    lin = [("k", t0 + dt.timedelta(days=i), float(i)) for i in range(20)]
    df2 = spark.createDataFrame(
        lin, "k string, ts timestamp_ntz, x double")
    out2 = {r["ts"]: r for r in seasonal_decompose(
        df2, "ts", "x", period=4, by="k").collect()}
    mid2 = out2[t0 + dt.timedelta(days=10)]
    assert mid2["trend"] == pytest.approx(10.0, abs=1e-6)
    assert abs(mid2["seasonal"]) < 1e-6
    # series shorter than one period: rows survive with NULL parts
    # (trend undefined everywhere -> empty phase table, LEFT join)
    short = spark.createDataFrame(
        [("k", t0 + dt.timedelta(days=i), 1.0) for i in range(3)],
        "k string, ts timestamp_ntz, x double")
    srows = seasonal_decompose(short, "ts", "x", period=7,
                               by="k").collect()
    assert len(srows) == 3
    assert all(r["trend"] is None and r["seasonal"] is None
               for r in srows)


def test_ngram_novelty_scores(spark):
    from zef_spark.pipeline.text import ngram_novelty
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),         # unique trigrams
         (2, "alpha beta gamma delta"),          # exact copy of 1
         (3, "one two three four five"),         # unique
         (4, "six seven"),                       # too short: no row
         (5, "one two three nine ten")],         # shares 1 of 3
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           ngram_novelty(df, "doc_id", "text", n=3).collect()}
    assert 4 not in out
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0
    assert out[3]["n_grams"] == 3 and out[3]["novelty"] < 1.0
    # doc 5: trigrams {one two three, two three nine, three nine ten}
    # -> 'one two three' shared with doc 3, other 2 novel
    assert out[5]["n_novel"] == 2
    assert out[5]["novelty"] == pytest.approx(round(2 / 3, 6))
    assert out[3]["n_novel"] == 2   # 'one two three' shared


def test_mutual_info_independent_vs_dependent(spark):
    import math
    from zef_spark.pipeline.wrangling import mutual_info
    # perfectly dependent: b == a -> MI == H(a), NMI == 1
    dep = spark.createDataFrame(
        [(c, c) for c in "xxyyzz"], "a string, b string")
    r = mutual_info(dep, "a", "b").collect()[0]
    assert r["n"] == 6
    assert r["mi"] == pytest.approx(r["h_a"], abs=1e-6)
    assert r["nmi"] == pytest.approx(1.0, abs=1e-6)
    assert r["h_a"] == pytest.approx(math.log(3), abs=1e-6)
    # independent uniform grid -> MI == 0
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq" for _ in range(5)],
        "a string, b string")
    r2 = mutual_info(ind, "a", "b").collect()[0]
    assert abs(r2["mi"]) < 1e-9 and abs(r2["nmi"]) < 1e-9
    # nulls are their own category, not dropped
    withnull = spark.createDataFrame(
        [("x", None), ("x", None), ("y", "p"), ("y", "p")],
        "a string, b string")
    r3 = mutual_info(withnull, "a", "b").collect()[0]
    assert r3["n"] == 4 and r3["nmi"] == pytest.approx(1.0, abs=1e-6)


def test_chi2_independence_matches_textbook(spark):
    from zef_spark.pipeline.wrangling import chi2_independence
    # classic 2x2: rows [[10, 20], [20, 10]]
    rows = ([("a", "p")] * 10 + [("a", "q")] * 20
            + [("b", "p")] * 20 + [("b", "q")] * 10)
    df = spark.createDataFrame(rows, "x string, y string")
    r = chi2_independence(df, "x", "y").collect()[0]
    assert r["n"] == 60 and r["dof"] == 1
    # e = 15 everywhere; chi2 = 4 * 25/15 = 20/3
    assert r["chi2"] == pytest.approx(20 / 3, abs=1e-6)
    import math
    assert r["cramers_v"] == pytest.approx(
        math.sqrt((20 / 3) / 60), abs=1e-6)
    # absent cells fold correctly: a never pairs with q
    rows2 = [("a", "p")] * 6 + [("b", "p")] * 3 + [("b", "q")] * 3
    df2 = spark.createDataFrame(rows2, "x string, y string")
    r2 = chi2_independence(df2, "x", "y").collect()[0]
    # manual: n=12, ca={a:6,b:6}, cb={p:9,q:3}; e(a,p)=4.5 e(a,q)=1.5
    # e(b,p)=4.5 e(b,q)=1.5; chi2 = (6-4.5)^2/4.5 + (0-1.5)^2/1.5
    #                              + (3-4.5)^2/4.5 + (3-1.5)^2/1.5 = 4
    assert r2["chi2"] == pytest.approx(4.0, abs=1e-6)
