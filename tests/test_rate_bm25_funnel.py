"""Round-5 operators: BM25, filter funnel, decontaminate,
type-token ratio, sliding-window rate limiting, late-data audit."""

import datetime
import math

from pyspark.sql import functions as F

from zef_spark.pipeline.corpus import bm25, filter_funnel
from zef_spark.pipeline.dedup import decontaminate
from zef_spark.pipeline.rollup import (late_data_audit, rate_limit,
                                       sliding_count)
from zef_spark.pipeline.text import type_token_ratio


def test_bm25_formula(spark):
    df = spark.createDataFrame(
        [(1, "spark spark merge"), (2, "merge table row"),
         (3, "nothing here")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            bm25(df, "doc_id", "text", ["spark", "merge"]).collect()}
    assert 3 not in rows                     # no query term -> excluded
    assert rows[1].n_matched == 2 and rows[2].n_matched == 1
    # hand-computed: N=3, avgdl=3 (dl: 3,3,2); df(spark)=1 df(merge)=2
    k1, b = 1.2, 0.75

    def s(tf, dfreq, dl):
        idf = math.log(1 + (3 - dfreq + 0.5) / (dfreq + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / (8 / 3)))
    exp1 = round(s(2, 1, 3) + s(1, 2, 3), 6)
    assert abs(rows[1].score - exp1) < 1e-6


def test_bm25_plan_is_broadcast_no_collect(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "b c")],
                               "doc_id long, text string")
    out = bm25(df, "doc_id", "text", ["b"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan


def test_filter_funnel_single_scan(spark):
    df = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 300), (3, "fr", 300), (4, "en", 500)],
        "id long, lang string, n long")
    out = filter_funnel(df, [
        ("lang_en", F.col("lang") == "en"),
        ("big", F.col("n") >= 200)]).orderBy("stage_idx").collect()
    assert [(r.stage, r.n_docs) for r in out] == \
        [("input", 4), ("lang_en", 3), ("big", 2)]
    # cumulative: a stage can only shrink
    ns = [r.n_docs for r in out]
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    # ONE scan: exactly one aggregate over the source, no join/union
    plan = (filter_funnel(df, [("x", F.col("n") > 0)])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan and "Union" not in plan


def test_decontaminate_drops_overlap_keeps_short(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox sleeps"),   # shares trigrams -> drop
         (2, "completely different words entirely here"),
         (3, "too short")],                   # < 3 tokens of grams? 2 toks
        "doc_id long, text string")
    kept = sorted(r.doc_id for r in
                  decontaminate(corpus, bench, max_contamination=0.0)
                  .collect())
    assert kept == [2, 3]


def test_type_token_ratio(spark):
    df = spark.createDataFrame(
        [("a", "x x y"), ("a", "y z"), ("b", "w w w w")],
        "src string, text string")
    rows = {r.src: r for r in
            type_token_ratio(df, "text", by="src").collect()}
    assert rows["a"].n_tokens == 5 and rows["a"].n_types == 3
    assert rows["b"].ttr == 0.25


def _ts(minute, sec=0):
    return (datetime.datetime(2024, 1, 1)
            + datetime.timedelta(minutes=minute, seconds=sec))


def test_rate_limit_sliding_window(spark):
    rows = [(i, 7, _ts(m)) for i, m in enumerate([0, 10, 20, 30, 70])]
    df = spark.createDataFrame(rows, "event_id long, user long, ts timestamp")
    out = {r.event_id: r for r in
           rate_limit(df, "ts", "user", 3600, 3).collect()}
    # trailing hour is INCLUSIVE at the far edge: the minute-70 event
    # still sees minute-10 (exactly 3600 s back) plus 20, 30, itself
    assert [out[i].n_in_window for i in range(5)] == [1, 2, 3, 4, 4]
    assert [out[i].limited for i in range(5)] == \
        [False, False, False, True, True]
    # one shuffle: single Exchange for the window
    plan = (sliding_count(df, "ts", "user", 3600)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1


def test_late_data_audit(spark):
    # arrival order 0..3; event times: 10:00, 9:20 (40min late),
    # 10:05, 10:04 (1min late)
    rows = [(0, 1, _ts(0)), (1, 1, datetime.datetime(2023, 12, 31, 23, 20)),
            (2, 1, _ts(5)), (3, 1, _ts(4))]
    df = spark.createDataFrame(rows, "event_id long, user long, ts timestamp")
    out = {r.event_id: r for r in
           late_data_audit(df, "ts", "event_id", by="user",
                           late_seconds=1800).collect()}
    assert out[0].lag_seconds == 0 and not out[0].is_late
    assert out[1].lag_seconds == 2400 and out[1].is_late
    assert out[2].lag_seconds == 0
    assert out[3].lag_seconds == 60 and not out[3].is_late


def test_filter_funnel_quoted_stage_name(spark):
    df = spark.createDataFrame([(1,)], "n long")
    out = filter_funnel(df, [("doesn't_match", F.col("n") > 99)]) \
        .orderBy("stage_idx").collect()
    assert [(r.stage, r.n_docs) for r in out] == \
        [("input", 1), ("doesn't_match", 0)]


def test_bm25_term_contract(spark):
    """ADVICE r05: empty query bag is a clear error; mixed-case terms
    match case-insensitively instead of silently scoring zero."""
    import pytest
    from zef_spark.pipeline.corpus import bm25
    docs = spark.createDataFrame(
        [(1, "Spark engines shuffle data"), (2, "quiet pond")],
        "id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25(docs, "id", "text", [])
    out = {r["id"]: r["n_matched"]
           for r in bm25(docs, "id", "text", ["SPARK", "Data"]).collect()}
    assert out == {1: 2}
