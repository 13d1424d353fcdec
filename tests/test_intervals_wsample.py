"""merge_intervals / interval_coverage and weighted_sample."""

import math

from pyspark.sql import functions as F


def _iv(spark, rows):
    return spark.createDataFrame(
        [(k, f"2024-01-01 {s}", f"2024-01-01 {e}") for k, s, e in rows],
        "k string, s string, e string").select(
        "k", F.col("s").cast("timestamp_ntz").alias("s"),
        F.col("e").cast("timestamp_ntz").alias("e"))


def test_merge_intervals_basic(spark):
    from zef_spark.pipeline.intervals import merge_intervals
    df = _iv(spark, [
        ("u", "10:00:00", "10:30:00"),
        ("u", "10:15:00", "10:45:00"),   # overlaps 1st
        ("u", "10:45:00", "11:00:00"),   # touches 2nd (start == end)
        ("u", "12:00:00", "12:10:00"),   # separate island
        ("v", "10:20:00", "10:25:00"),   # other key, inside u's range
    ])
    rows = sorted((r["k"], str(r["span_start"]), str(r["span_end"]),
                   r["n_merged"])
                  for r in merge_intervals(df, "s", "e", "k").collect())
    assert rows == [
        ("u", "2024-01-01 10:00:00", "2024-01-01 11:00:00", 3),
        ("u", "2024-01-01 12:00:00", "2024-01-01 12:10:00", 1),
        ("v", "2024-01-01 10:20:00", "2024-01-01 10:25:00", 1),
    ]


def test_merge_intervals_nested_and_gap(spark):
    from zef_spark.pipeline.intervals import merge_intervals
    df = _iv(spark, [
        ("u", "10:00:00", "11:00:00"),
        ("u", "10:10:00", "10:20:00"),   # fully nested
        ("u", "11:02:00", "11:05:00"),   # 2 min gap
    ])
    assert merge_intervals(df, "s", "e", "k").count() == 2
    # with a 5-minute bridge the gap closes
    assert merge_intervals(df, "s", "e", "k",
                           min_gap="5 minutes").count() == 1


def test_interval_coverage_no_double_count(spark):
    from zef_spark.pipeline.intervals import interval_coverage
    df = _iv(spark, [
        ("u", "10:00:00", "10:30:00"),
        ("u", "10:15:00", "10:45:00"),
        ("u", "12:00:00", "12:30:00"),
    ])
    r = interval_coverage(df, "s", "e", "k", unit="minutes").collect()[0]
    assert r["n_spans"] == 2
    assert r["covered_minutes"] == 75.0  # 45 + 30, overlap not doubled


def test_merge_intervals_single_shuffle(spark):
    from zef_spark.pipeline.intervals import merge_intervals
    df = _iv(spark, [("u", "10:00:00", "10:30:00")])
    plan = (merge_intervals(df, "s", "e", "k")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_weighted_sample_reference(spark):
    """Matches the Efraimidis-Spirtsos priorities computed locally."""
    from zef_spark.pipeline.corpus import weighted_sample
    rows = [(i, float(1 + (i % 7))) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = sorted(r["id"] for r in
                 weighted_sample(df, "w", 20, "id").collect())

    import hashlib
    def pri(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        u = (float(h) + 1.0) / float(2 ** 60)
        return -math.log(u) / w
    exp = sorted(i for i, _ in
                 sorted(rows, key=lambda r: pri(*r))[:20])
    assert got == exp


def test_weighted_sample_grouped_and_weight_bias(spark):
    from zef_spark.pipeline.corpus import weighted_sample
    rows = [(i, "a" if i % 2 else "b", 100.0 if i < 20 else 0.01)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    out = weighted_sample(df, "w", 5, "id", by="g").collect()
    per_g = {}
    for r in out:
        per_g.setdefault(r["g"], []).append(r["id"])
    assert all(len(v) == 5 for v in per_g.values())
    # heavy-weight ids (<20) dominate the draw
    heavy = sum(1 for r in out if r["id"] < 20)
    assert heavy >= 8
    # zero/negative weights never sampled
    df2 = df.withColumn("w", F.when(F.col("id") < 1000, -1.0)
                        .otherwise(0.0))
    assert weighted_sample(df2, "w", 5, "id").count() == 0


def test_ewma_matches_reference_fold(spark):
    import datetime as dt
    from zef_spark.pipeline.rollup import ewma
    base = dt.datetime(2024, 1, 1)
    rows = [(k, base + dt.timedelta(minutes=i), float(v))
            for k, i, v in [(1, 0, 10), (1, 1, 20), (1, 2, 10),
                            (2, 0, 5)]]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    got = {(r["k"], r["ts"]): r["ewma"]
           for r in ewma(df, "k", "ts", "v", alpha=0.3).collect()}
    y1 = 10.0
    y2 = (1.0 - 0.3) * y1 + 0.3 * 20.0
    y3 = (1.0 - 0.3) * y2 + 0.3 * 10.0
    assert got[(1, base)] == y1
    assert got[(1, base + dt.timedelta(minutes=1))] == y2
    assert got[(1, base + dt.timedelta(minutes=2))] == y3
    assert got[(2, base)] == 5.0
