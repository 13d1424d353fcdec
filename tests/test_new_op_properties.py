"""Property tests for the r04-late operators: fuzzy_join vs the
brute-force all-pairs oracle, merge_intervals vs a pure-Python sweep,
weighted_sample vs locally recomputed priorities — randomized inputs,
not just the worked examples."""


import pytest

# r13 verify-gate split: multi-minute e2e/property lane, opt-in via `make test-slow`
pytestmark = pytest.mark.slow
import datetime as dt
import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)

_settings = settings(max_examples=10, deadline=None,
                     suppress_health_check=[
                         HealthCheck.function_scoped_fixture])


# --------------------------------------------------------- fuzzy_join

_words = st.lists(st.text(alphabet="abcxy", min_size=0, max_size=10),
                  min_size=1, max_size=12)


@_settings
@given(_words, _words, st.integers(1, 3))
def test_fuzzy_join_equals_bruteforce(spark, left, right, t):
    from zef_spark.pipeline.joins import fuzzy_join
    ldf = spark.createDataFrame([(w,) for w in left], "name string")
    rdf = spark.createDataFrame([(w,) for w in right], "name string")
    got = {(r["name_l"], r["name_r"])
           for r in fuzzy_join(ldf, rdf, "name",
                               max_distance=t).collect()}
    brute = {(r["a"], r["b"]) for r in
             ldf.crossJoin(rdf.withColumnRenamed("name", "nb"))
             .select(F.col("name").alias("a"), F.col("nb").alias("b"),
                     F.levenshtein("name", "nb").alias("d"))
             .where(F.col("d") <= t).collect()}
    assert got == brute


# ----------------------------------------------------- merge_intervals

@st.composite
def _intervals(draw):
    rows = draw(st.lists(
        st.tuples(st.integers(0, 1),              # key
                  st.integers(0, 300),            # start minute
                  st.integers(1, 120)),           # duration
        min_size=1, max_size=16))
    return [(k, BASE + dt.timedelta(minutes=s),
             BASE + dt.timedelta(minutes=s + d)) for k, s, d in rows]


def _merge_ref(rows):
    """Sweep-line reference: sorted merge per key."""
    out = {}
    for k in {r[0] for r in rows}:
        ivs = sorted((s, e) for kk, s, e in rows if kk == k)
        spans = []
        for s, e in ivs:
            if spans and s <= spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e))
            else:
                spans.append((s, e))
        out[k] = spans
    return {(k, s, e) for k, sp in out.items() for s, e in sp}


@_settings
@given(_intervals())
def test_merge_intervals_equals_sweep(spark, rows):
    from zef_spark.pipeline.intervals import merge_intervals
    df = spark.createDataFrame(rows, "k long, s timestamp, e timestamp")
    got = {(r["k"], r["span_start"], r["span_end"])
           for r in merge_intervals(df, "s", "e", "k").collect()}
    assert got == _merge_ref(rows)


# ----------------------------------------------------- weighted_sample

@_settings
@given(st.lists(st.tuples(st.integers(0, 10 ** 6),
                          st.floats(0.01, 100.0)),
                min_size=1, max_size=40, unique_by=lambda r: r[0]),
       st.integers(1, 10))
def test_weighted_sample_equals_local_priorities(spark, rows, k):
    from zef_spark.pipeline.corpus import weighted_sample
    df = spark.createDataFrame(rows, "id long, w double")
    got = sorted(r["id"] for r in
                 weighted_sample(df, "w", k, "id").collect())

    def pri(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        return -math.log((float(h) + 1.0) / float(2 ** 60)) / w
    exp = sorted(i for i, _ in
                 sorted(rows, key=lambda r: pri(*r))[:k])
    assert got == exp
