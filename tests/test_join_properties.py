"""Property tests for the temporal join/rollup operators: the Spark
implementations must agree with independent oracles (pandas
merge_asof; full recompute) on randomized inputs — not just the
hand-picked examples in test_pipeline.py."""

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = dt.datetime(2024, 1, 1)


def _events(draw, n_keys=2, max_rows=14):
    rows = draw(st.lists(
        st.tuples(st.integers(0, n_keys - 1),      # key
                  st.integers(0, 5000),            # minutes offset
                  st.integers(0, 99)),             # payload
        min_size=1, max_size=max_rows))
    # distinct timestamps per key: merge_asof demands sorted, and
    # equal-ts tie rules differ between engines — not the semantics
    # under test
    seen, out = set(), []
    for k, m, v in rows:
        if (k, m) not in seen:
            seen.add((k, m))
            out.append((k, BASE + dt.timedelta(minutes=m), float(v)))
    return out


@st.composite
def _two_sides(draw):
    return _events(draw), _events(draw)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_two_sides())
def test_asof_join_matches_pandas_merge_asof(spark, sides):
    from zef_spark.pipeline.joins import asof_join
    lrows, rrows = sides
    left = spark.createDataFrame(lrows, "k long, ts timestamp, lv double")
    right = spark.createDataFrame(rrows, "k long, ts timestamp, rv double")
    got = {(r["k"], r["ts"], r["lv"]): r["rv_right"]
           for r in asof_join(left, right, on="ts", by="k").collect()}
    lp = pd.DataFrame(lrows, columns=["k", "ts", "lv"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "rv"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    for _, row in exp.iterrows():
        want = None if pd.isna(row["rv"]) else row["rv"]
        assert got[(row["k"], row["ts"].to_pydatetime(),
                    row["lv"])] == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
@pytest.mark.slow  # r13 gate split: multi-minute test
def test_rollup_refresh_equals_recompute_property(spark, data):
    from zef_spark.pipeline.rollup import hypertable_rollup, refresh_rollup
    rows = data.draw(st.lists(
        st.tuples(st.integers(0, 3000),            # minutes offset
                  st.sampled_from(["a", "b"]),
                  st.integers(-50, 50)),
        min_size=2, max_size=16))
    split = data.draw(st.integers(1, len(rows) - 1))
    mk = lambda rs: spark.createDataFrame(
        [(BASE + dt.timedelta(minutes=m), et, float(v))
         for m, et, v in rs], "ts timestamp, et string, v double")
    stored = hypertable_rollup(mk(rows[:split]), "ts", ["et"], "v")
    refreshed = refresh_rollup(stored, mk(rows[split:]), "ts", ["et"], "v")
    full = hypertable_rollup(mk(rows), "ts", ["et"], "v")
    key = lambda r: (r["gran"], r["bucket"], r["et"])
    val = lambda r: (r["n"], r["sum_value"], r["min_value"],
                     r["max_value"])
    assert {key(r): val(r) for r in refreshed.collect()} == \
        {key(r): val(r) for r in full.collect()}


def test_skew_report_flags_hot_key(spark):
    from zef_spark.pipeline.skew import skew_report
    rows = [(1, "hot")] * 900 + [(i, "x") for i in range(2, 102)]
    df = spark.createDataFrame(rows, "k long, v string")
    rpt = skew_report(df, "k")
    assert rpt["rows"] == 1000 and rpt["distinct_keys"] == 101
    assert rpt["top"][0][0] == 1 and rpt["top"][0][2] == 0.9
    assert rpt["advice"] and "salted_join" in rpt["advice"]
    # uniform keys -> no advice
    uni = spark.createDataFrame([(i,) for i in range(500)], "k long")
    assert skew_report(uni, "k")["advice"] is None


def test_interval_overlap_join_matches_naive(spark):
    """Bucketized overlap join equals the naive inequality join for
    random interval sets (half-open semantics; touching intervals do
    not overlap), keyed and unkeyed."""
    import datetime as dt
    import random
    from pyspark.sql import functions as F
    from zef_spark.pipeline.joins import interval_overlap_join
    rnd = random.Random(7)
    t0 = dt.datetime(2024, 1, 1)

    def mk(n, tag):
        rows = []
        for i in range(n):
            a = rnd.randint(0, 5000)
            b = a + rnd.randint(1, 400)
            rows.append((tag * 100 + i, rnd.choice(["x", "y"]),
                         t0 + dt.timedelta(minutes=a),
                         t0 + dt.timedelta(minutes=b)))
        return spark.createDataFrame(
            rows, "id long, k string, s timestamp_ntz, e timestamp_ntz")

    L, R = mk(40, 1), mk(40, 2)
    got = {(r["id"], r["id_r"]) for r in interval_overlap_join(
        L, R, "s", "e", "s", "e", by="k", bucket="2 hours").collect()}
    naive = {(r["id"], r["id_r"]) for r in
             L.join(R.withColumnRenamed("id", "id_r")
                    .withColumnRenamed("s", "s_r")
                    .withColumnRenamed("e", "e_r"), "k")
             .where((F.col("s") < F.col("e_r"))
                    & (F.col("s_r") < F.col("e"))).collect()}
    assert got == naive and naive
    # touching intervals excluded (half-open)
    A = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(hours=1))],
        "id long, s timestamp_ntz, e timestamp_ntz")
    B = spark.createDataFrame(
        [(2, t0 + dt.timedelta(hours=1), t0 + dt.timedelta(hours=2))],
        "id long, s timestamp_ntz, e timestamp_ntz")
    assert interval_overlap_join(A, B, "s", "e", "s", "e").count() == 0


def test_interval_overlap_join_multiplicity_and_plan(spark):
    """r06 verdict order #4: pairs are emitted in exactly ONE shared
    bucket (first-shared-bucket filter), not deduped with a full-row
    distinct — so (a) genuinely duplicate input rows keep their join
    multiplicity, and (b) the plan carries no Deduplicate/Exchange
    from a distinct over the joined output."""
    import datetime as dt
    from collections import Counter
    from zef_spark.pipeline.joins import interval_overlap_join
    t0 = dt.datetime(2024, 1, 1)
    # left has a DUPLICATE row (same id, same interval) spanning many
    # buckets; a full-row distinct would collapse its two matches to 1
    L = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(hours=30)),
         (1, t0, t0 + dt.timedelta(hours=30)),
         (2, t0 + dt.timedelta(hours=5), t0 + dt.timedelta(hours=6))],
        "id long, s timestamp_ntz, e timestamp_ntz")
    R = spark.createDataFrame(
        [(9, t0 + dt.timedelta(hours=1), t0 + dt.timedelta(hours=20))],
        "id long, s timestamp_ntz, e timestamp_ntz")
    out = interval_overlap_join(L, R, "s", "e", "s", "e",
                                bucket="1 hour")
    counts = Counter((r["id"], r["id_r"]) for r in out.collect())
    assert counts == {(1, 9): 2, (2, 9): 1}
    # plan assert: no distinct-style dedup stage survives
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Deduplicate" not in opt
    # and the whole join is shuffle-join + row-local filter only: the
    # executed plan must not aggregate the joined output
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in phys
