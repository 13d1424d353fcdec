"""Hypothesis properties for the continuation-batch operators:
heavy hitters exactness, gap-fill fill laws, PageRank invariants,
classifier order-independence."""


import pytest

# r13 verify-gate split: multi-minute e2e/property lane, opt-in via `make test-slow`
pytestmark = pytest.mark.slow
import datetime as dt

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ST = dict(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))


@settings(**ST)
@given(st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=200),
       st.sampled_from([0.05, 0.1, 0.3]))
def test_heavy_hitters_equals_exact(spark, items, frac):
    from zef_spark.pipeline.sketches import heavy_hitters
    df = spark.createDataFrame([(x,) for x in items],
                               "tok string").repartition(7)
    got = {(r.item, r.n)
           for r in heavy_hitters(df, "tok", frac, counters=8).collect()}
    exact = {(r.tok, r.n) for r in
             df.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
             .where(F.col("n") > frac * len(items)).collect()}
    assert got == exact


@settings(**ST)
@given(st.sets(st.integers(0, 30), min_size=1, max_size=10),
       st.integers(0, 100))
def test_gapfill_laws(spark, hours, seed):
    from zef_spark.pipeline.rollup import gapfill
    t0 = dt.datetime(2024, 1, 1)
    rows = [("g", t0 + dt.timedelta(hours=h),
             float((h * 37 + seed) % 100)) for h in sorted(hours)]
    df = (spark.createDataFrame(rows,
                                "k string, bucket timestamp_ntz, v double")
          .select("k", "bucket",
                  F.col("v").cast("decimal(18,6)").alias("v")))
    out = sorted(gapfill(df, "bucket", "1 hour", ["k"], "v").collect(),
                 key=lambda r: r.bucket)
    lo, hi = min(hours), max(hours)
    # law 1: dense spine over [lo, hi]
    assert len(out) == hi - lo + 1
    # law 2: observed buckets keep their value in every fill column
    by_hour = {r.bucket.hour + (r.bucket.day - 1) * 24: r for r in out}
    for h in hours:
        r = by_hour[h]
        assert float(r.v) == float(r.locf) == float(r.interp)
    # law 3: locf equals the most recent observed value
    last = None
    for r in out:
        if r.v is not None:
            last = float(r.v)
        assert float(r.locf) == last
    # law 4: interp is between its neighbours
    vals = sorted(hours)
    for r in out:
        if r.v is None:
            h = r.bucket.hour + (r.bucket.day - 1) * 24
            prevs = [x for x in vals if x < h]
            nexts = [x for x in vals if x > h]
            if prevs and nexts:
                a = float(by_hour[max(prevs)].v)
                b = float(by_hour[min(nexts)].v)
                assert min(a, b) - 1e-6 <= float(r.interp) <= max(a, b) + 1e-6


@settings(**ST)
@given(st.lists(st.tuples(st.integers(1, 12), st.integers(1, 12)),
                min_size=1, max_size=40))
def test_pagerank_invariants(spark, edges):
    from zef_spark.graph.algorithms import pagerank
    df = spark.createDataFrame(edges, "src long, dst long") \
        .where("src != dst")
    if df.count() == 0:
        return
    ranks = pagerank(df, n_iter=3).collect()
    # positive, and total mass bounded by 1 (dangling mass decays)
    assert all(r.rank > 0 for r in ranks)
    assert sum(r.rank for r in ranks) <= 1.0 + 1e-6


@settings(**ST)
@given(st.integers(0, 1000))
def test_nb_prediction_order_invariant(spark, seed):
    from zef_spark.pipeline.classifier import nb_predict, nb_train
    rows = [(i, ("spam buy now " if (i + seed) % 2 else "ham notes "),
             "s" if (i + seed) % 2 else "h") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, text string, label string")
    m = nb_train(df, "text", "label", n_features=256)
    a = sorted((r.id, r.label_pred) for r in
               nb_predict(df, m, "text", "id").collect())
    b = sorted((r.id, r.label_pred) for r in
               nb_predict(df.orderBy(F.desc("id")).repartition(5),
                          m, "text", "id").collect())
    assert a == b
