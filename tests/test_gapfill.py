"""Time-bucket gap filling (pipeline/rollup.py gapfill): dense spine,
LOCF, linear interpolation, zero fill."""


import pytest
import datetime as dt

import pyspark.sql.functions as F

from zef_spark.pipeline.rollup import gapfill

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _hourly(spark, rows):
    data = [(k, T0 + dt.timedelta(hours=h), float(v))
            for k, h, v in rows]
    return (spark.createDataFrame(
        data, "k string, bucket timestamp_ntz, v double")
        .select("k", "bucket", F.col("v").cast("decimal(18,6)")
                .alias("v")))


def test_spine_is_dense_and_fills(spark):
    # observations at hours 0, 3 (value 10 -> 40): gaps at 1, 2
    df = _hourly(spark, [("a", 0, 10.0), ("a", 3, 40.0)])
    out = {r.bucket.hour: r
           for r in gapfill(df, "bucket", "1 hour", ["k"], "v").collect()}
    assert sorted(out) == [0, 1, 2, 3]
    assert out[1].v is None and out[2].v is None
    assert float(out[1].locf) == 10.0 and float(out[2].locf) == 10.0
    assert float(out[1].interp) == 20.0 and float(out[2].interp) == 30.0
    assert float(out[1].zero) == 0.0
    assert float(out[3].interp) == 40.0


def test_trailing_edge_locf(spark):
    # gap AFTER the last observation (explicit end): interp falls
    # back to locf, zero stays 0
    df = _hourly(spark, [("a", 0, 5.0)])
    out = {r.bucket.hour: r
           for r in gapfill(df, "bucket", "1 hour", ["k"], "v",
                            end=T0 + dt.timedelta(hours=2)).collect()}
    assert sorted(out) == [0, 1, 2]
    assert float(out[2].locf) == 5.0 and float(out[2].interp) == 5.0
    assert float(out[2].zero) == 0.0


def test_groups_fill_independently(spark):
    df = _hourly(spark, [("a", 0, 1.0), ("a", 2, 3.0),
                         ("b", 0, 100.0), ("b", 2, 100.0)])
    rows = gapfill(df, "bucket", "1 hour", ["k"], "v").collect()
    got = {(r.k, r.bucket.hour): float(r.interp) for r in rows}
    assert got[("a", 1)] == 2.0
    assert got[("b", 1)] == 100.0
    assert len(rows) == 6


# ------------------------------------------------- streaming rollup

@pytest.mark.slow  # r13 gate split: multi-minute test
def test_streaming_rollup_exactly_once(spark, tmp_path):
    """Continuous aggregate sink: drains a stream into a persisted
    multi-granularity rollup; equals the batch rollup over the same
    events; replays are skipped; more data merges algebraically."""
    import datetime

    from pyspark.sql import functions as F
    from zef_spark.pipeline.rollup import (StreamingRollup,
                                           hypertable_rollup,
                                           stream_rollup)

    def rows(n0, n):
        base = datetime.datetime(2024, 1, 1)
        return [(base + datetime.timedelta(minutes=17 * i),
                 f"u{i % 2}", float(i)) for i in range(n0, n0 + n)]

    src, cp = str(tmp_path / "src"), str(tmp_path / "cp")
    sch = "ts timestamp, dim string, v double"
    spark.createDataFrame(rows(0, 40), sch).coalesce(2) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(sch).parquet(src)
    r = stream_rollup(stream, str(tmp_path / "agg"), "ts", ["dim"],
                      "v", checkpoint=cp)
    got = r.read(spark)
    exp = hypertable_rollup(spark.createDataFrame(rows(0, 40), sch),
                            "ts", ["dim"], "v")
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0

    # replay the same batch id -> skipped before any aggregation
    batch = spark.createDataFrame(rows(0, 40), sch)
    assert r.apply_batch(batch, 0) is False

    # late-arriving data merges algebraically (no raw-history rescan)
    spark.createDataFrame(rows(40, 10), sch).coalesce(1) \
        .write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(sch).parquet(src)
    r2 = stream_rollup(stream2, str(tmp_path / "agg"), "ts", ["dim"],
                       "v", checkpoint=cp)
    got2 = r2.read(spark)
    exp2 = hypertable_rollup(spark.createDataFrame(rows(0, 50), sch),
                             "ts", ["dim"], "v")
    assert got2.exceptAll(exp2).count() == 0
    assert exp2.exceptAll(got2).count() == 0
    # ledger is hidden from data readers (underscore path)
    assert "batch_key" not in got2.columns


def test_time_weighted_avg_holds(spark):
    """A value that holds for 23h dominates over a 100x burst of
    short-lived samples — that's the point of TIME weighting."""
    import datetime
    from zef_spark.pipeline.rollup import time_weighted_avg
    d = datetime.datetime(2024, 1, 1)
    rows = [(1, d, 1.0)]                       # holds 1h (until 01:00)
    rows += [(1, d + datetime.timedelta(hours=1, seconds=i), 100.0)
             for i in range(60)]               # 60 samples in 1 min
    # last sample holds to day end -> ~23h of value 100? No: the
    # burst STARTS at 01:00 and the last holds to 24:00
    out = time_weighted_avg(
        spark.createDataFrame(rows, "user long, ts timestamp, v double"),
        "ts", "v", "user", "1 day").collect()
    assert len(out) == 1
    # 1h at 1.0 + 23h at 100.0 => ~95.875
    assert abs(out[0].twa - (1 * 1.0 + 23 * 100.0) / 24) < 0.01
    assert out[0].n_points == 61


def test_ohlc_and_anomalies(spark):
    import datetime
    from zef_spark.pipeline.rollup import ohlc_bars, rolling_anomalies
    d = datetime.datetime(2024, 1, 1)
    rows = [(1, d + datetime.timedelta(minutes=i), float(v))
            for i, v in enumerate([5, 9, 2, 7])]
    bar = ohlc_bars(spark.createDataFrame(
        rows, "user long, ts timestamp, v double"),
        "ts", "v", "user", "1 day").collect()[0]
    assert (bar.open, bar.high, bar.low, bar.close, bar.n) == \
        (5.0, 9.0, 2.0, 7.0, 4)
    # anomalies: 10 calm points then a spike; spike flagged, the calm
    # points (incl. the first 5 with no baseline) are not
    rows = [(1, d + datetime.timedelta(minutes=i),
             10.0 + (i % 2) * 0.5) for i in range(10)]
    rows.append((1, d + datetime.timedelta(minutes=10), 50.0))
    out = {r.ts.minute: r for r in rolling_anomalies(
        spark.createDataFrame(rows, "user long, ts timestamp, v double"),
        "ts", "v", "user").collect()}
    assert out[10].is_anomaly is True
    assert all(not out[m].is_anomaly for m in range(10))
    assert out[3].z is None           # < 5 points of prior history


def test_cusum_detects_level_shift(spark):
    """CUSUM alarms after a sustained upward shift, not on single
    outliers inside the slack band; reset_on_alarm restarts."""
    import datetime as dt
    from zef_spark.pipeline.rollup import cusum
    t0 = dt.datetime(2024, 1, 1)
    rows = ([(1, t0 + dt.timedelta(seconds=i), 10.0) for i in range(5)]
            + [(1, t0 + dt.timedelta(seconds=5 + i), 30.0)
               for i in range(5)])
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, value double")
    out = (cusum(df, "user_id", "ts", "value", target=10.0,
                 slack=2.0, threshold=40.0)
           .orderBy("ts").collect())
    assert not any(r["alarm"] for r in out[:5])     # flat segment
    assert out[-1]["alarm"]                          # after the shift
    # s_pos accumulates (30-10-2)=18 per step after the shift
    assert abs(out[6]["s_pos"] - 36.0) < 1e-12
    reset = (cusum(df, "user_id", "ts", "value", target=10.0,
                   slack=2.0, threshold=40.0, reset_on_alarm=True)
             .orderBy("ts").collect())
    first_alarm = next(i for i, r in enumerate(reset) if r["alarm"])
    assert reset[first_alarm + 1]["s_pos"] < reset[first_alarm]["s_pos"]


def test_holt_linear_level_trend_forecast(spark):
    """Holt recursion: constant-slope series converges to exact
    trend; forecast extrapolates level + h·trend."""
    import datetime as dt
    from zef_spark.pipeline.rollup import holt_linear
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(seconds=i), 10.0 + 2.0 * i)
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, value double")
    out = (holt_linear(df, "user_id", "ts", "value",
                       alpha=0.5, beta=0.3, horizon_steps=2)
           .orderBy("ts").collect())
    assert out[0]["level"] == 10.0 and out[0]["trend"] == 0.0
    # a perfectly linear series: level tracks x, trend -> slope 2
    last = out[-1]
    assert abs(last["level"] - (10.0 + 2.0 * 19)) < 0.2
    assert abs(last["trend"] - 2.0) < 0.1
    assert abs(last["forecast"]
               - (last["level"] + 2 * last["trend"])) < 1e-12
