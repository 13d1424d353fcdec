"""Stateful streaming split_on_next (§2.L, ITF:9440) over a real
file-source stream with cross-micro-batch state."""


import pytest

# r13 verify-gate split: multi-minute e2e/property lane, opt-in via `make test-slow`
pytestmark = pytest.mark.slow
import os
import time


def test_split_on_next_stream(spark, tmp_path):
    from zef_spark.streaming import run_segments_once

    d = str(tmp_path / "in")
    os.makedirs(d)
    schema = "key string, seq long, value string"
    # batch 1: a gets [x, y] |  ; b starts [p
    spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("a", 3, "|"), ("b", 1, "p")],
        schema).coalesce(1).write.mode("append").parquet(d)
    # batch 2 (same availableNow run reads both files): b finishes
    spark.createDataFrame(
        [("b", 2, "q"), ("b", 3, "|"), ("a", 4, "z"), ("a", 5, "|")],
        schema).coalesce(1).write.mode("append").parquet(d)

    rows = run_segments_once(spark, d, schema, marker="|",
                             out_table="seg_t1")
    got = {(r.key, r.seg_no): list(r.segment) for r in rows}
    assert got[("a", 0)] == ["x", "y"]
    assert got[("a", 1)] == ["z"]
    assert got[("b", 0)] == ["p", "q"]


def test_split_on_next_stream_state_across_runs(spark, tmp_path):
    """State must persist in the checkpoint across separate stream
    runs (the reference's push-stream keeps buffering between
    pushes)."""
    from pyspark.sql.streaming import StreamingQuery  # noqa: F401
    from zef_spark.streaming import split_on_next_stream

    d = str(tmp_path / "in2")
    cp = str(tmp_path / "cp2")
    out = str(tmp_path / "out2")
    os.makedirs(d)
    schema = "key string, seq long, value string"

    def run_once(name):
        stream = spark.readStream.schema(schema).parquet(d)
        q = (split_on_next_stream(stream, "|")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", cp)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.read.parquet(out).collect()

    spark.createDataFrame([("k", 1, "a"), ("k", 2, "b")], schema) \
        .coalesce(1).write.mode("append").parquet(d)
    assert run_once("seg_r1") == []          # no marker yet: buffered

    spark.createDataFrame([("k", 3, "|")], schema) \
        .coalesce(1).write.mode("append").parquet(d)
    rows = run_once("seg_r2")                # marker closes the buffer
    assert [list(r.segment) for r in rows] == [["a", "b"]]


def test_cusum_stream_equals_batch(spark, tmp_path):
    """Streaming CUSUM over a real file-source stream equals the
    batch Arrow fold exactly (identical IEEE recursion, state
    carried in the store between micro-batches)."""
    import datetime as dt
    from zef_spark.streaming.stateful import cusum_stream
    from zef_spark.pipeline.rollup import cusum

    d = str(tmp_path / "cin")
    os.makedirs(d)
    schema = "key string, seq long, value double"
    rows1 = [("a", i, 10.0 + i) for i in range(5)]
    rows2 = [("a", 5 + i, 40.0) for i in range(3)] \
        + [("b", i, 5.0) for i in range(4)]
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(d)
    spark.createDataFrame(rows2, schema).coalesce(1) \
        .write.mode("append").parquet(d)

    stream = spark.readStream.schema(schema).parquet(d)
    out = cusum_stream(stream, target=10.0, slack=2.0,
                       threshold=30.0)
    q = (out.writeStream.format("memory").queryName("cusum_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.key, r.seq): (r.s_pos, r.s_neg, r.alarm)
           for r in spark.sql("SELECT * FROM cusum_t").collect()}

    batch_in = spark.createDataFrame(rows1 + rows2, schema)
    want = {(r["key"], r["seq"]): (r["s_pos"], r["s_neg"], r["alarm"])
            for r in cusum(batch_in, "key", "seq", "value",
                           target=10.0, slack=2.0,
                           threshold=30.0).collect()}
    assert got == want and len(got) == 12
    assert any(a for _, _, a in got.values())      # the shift alarms


def test_holt_stream_equals_batch(spark, tmp_path):
    from zef_spark.streaming.stateful import holt_stream
    from zef_spark.pipeline.rollup import holt_linear
    d = str(tmp_path / "hin")
    os.makedirs(d)
    schema = "key string, seq long, value double"
    rows1 = [("a", i, 10.0 + 2.0 * i) for i in range(4)]
    rows2 = [("a", 4 + i, 30.0 - i) for i in range(4)] \
        + [("b", i, 7.0) for i in range(3)]
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(d)
    spark.createDataFrame(rows2, schema).coalesce(1) \
        .write.mode("append").parquet(d)
    stream = spark.readStream.schema(schema).parquet(d)
    out = holt_stream(stream, alpha=0.5, beta=0.3, horizon_steps=2)
    q = (out.writeStream.format("memory").queryName("holt_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.key, r.seq): (r.level, r.trend, r.forecast)
           for r in spark.sql("SELECT * FROM holt_t").collect()}
    batch = holt_linear(
        spark.createDataFrame(rows1 + rows2, schema),
        "key", "seq", "value", alpha=0.5, beta=0.3,
        horizon_steps=2).collect()
    want = {(r["key"], r["seq"]): (r["level"], r["trend"],
                                   r["forecast"]) for r in batch}
    assert got == want and len(got) == 11


def test_split_on_next_stream_equals_batch_on_events(spark, tmp_path):
    """r07 verdict order #5 done-criterion: stream==batch equality
    segmenting the REAL event stream on marker rows INCLUDING each
    key's trailing open segment (Rx completes the open window on
    stream completion, ITF:9440). Batch mode flushes at end-of-input;
    streaming mode flushes via processing-time timeout
    (flush_timeout_ms) once a key goes idle."""
    from collections import defaultdict
    from pyspark.sql import functions as F
    from zef_spark import ops as z
    from zef_spark.streaming import split_on_next_stream

    sf = "/root/testdata/sf0.001"
    marker = "purchase"
    sel = lambda df: df.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").alias("seq"),
        F.col("event_type").alias("value"))

    # expected: the bounded-list segmentation, trailing buffer and all
    per_key = defaultdict(list)
    batch = sel(spark.read.parquet(f"{sf}/events.parquet")) \
        .orderBy("key", "seq").collect()
    for r in batch:
        per_key[r.key].append(r.value)
    want = {}
    for k, vals in per_key.items():
        for i, s in enumerate(vals | z.split_on_next[marker]):
            want[(k, i)] = s

    # batch form: end of input is stream completion — exact equality
    got_batch = {(r.key, r.seg_no): list(r.segment)
                 for r in split_on_next_stream(
                     sel(spark.read.parquet(f"{sf}/events.parquet")),
                     marker).collect()}
    assert got_batch == want and len(got_batch) > 50

    # streaming form: closed segments emit as markers arrive; open
    # buffers flush when the idle timeout fires in a no-data batch
    import shutil
    d = str(tmp_path / "events_in")
    os.makedirs(d)
    shutil.copy(f"{sf}/events.parquet", d)
    ev_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    stream = sel(spark.readStream.schema(ev_schema).parquet(d))
    q = (split_on_next_stream(stream, marker, flush_timeout_ms=2000)
         .writeStream.format("memory").queryName("seg_events")
         .outputMode("append")
         .trigger(processingTime="500 milliseconds").start())
    try:
        deadline = time.time() + 150
        got = {}
        while time.time() < deadline:
            got = {(r.key, r.seg_no): list(r.segment)
                   for r in spark.sql(
                       "SELECT * FROM seg_events").collect()}
            if got == want:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert got == want


def test_heavy_hitters_stream_guarantee_and_state(spark, tmp_path):
    """MG guarantee on a real file stream, state surviving across
    micro-batches: est <= true <= est + decr per shard, and every
    sufficiently frequent item is present in the final snapshot."""
    import collections
    import pandas as pd
    from zef_spark.streaming.stateful import heavy_hitters_stream

    # skewed corpus: 'hot' dominates, spread across two batch files
    items1 = ["hot"] * 300 + [f"cold{i}" for i in range(150)]
    items2 = ["hot"] * 200 + ["warm"] * 120 + \
        [f"cold{i}" for i in range(150, 260)]
    d = tmp_path / "hh"
    d.mkdir()
    spark.createDataFrame([(i,) for i in items1], "item string") \
        .coalesce(1).write.parquet(str(d / "b1"))
    spark.createDataFrame([(i,) for i in items2], "item string") \
        .coalesce(1).write.parquet(str(d / "b2"))

    stream = (spark.readStream.schema("item string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(d / "*")))
    out = heavy_hitters_stream(stream, "item", counters=16, shards=4)
    q = (out.writeStream.format("memory").queryName("hh")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM hh").collect()
    assert rows, "no emissions"
    # final snapshot = max version per shard
    latest_ver = {}
    for r in rows:
        latest_ver[r["shard"]] = max(latest_ver.get(r["shard"], 0),
                                     r["version"])
    snap = {(r["shard"], r["item"]): r for r in rows
            if r["version"] == latest_ver[r["shard"]]}
    # state crossed micro-batches: some shard emitted version >= 2
    assert max(latest_ver.values()) >= 2
    # per-shard guarantee against true within-shard counts
    true = collections.Counter(items1 + items2)
    from pyspark.sql import functions as F
    shard_of = {r["item"]: r["shard"] for r in
                spark.createDataFrame([(i,) for i in set(items1 + items2)],
                                      "item string")
                .select("item", F.pmod(F.xxhash64(F.col("item")),
                                       F.lit(4)).alias("shard"))
                .collect()}
    for (shard, item), r in snap.items():
        t = true[item]
        assert r["est"] <= t <= r["est"] + r["decr"], (item, r, t)
    # the dominant items must survive in their shards
    for must in ("hot", "warm"):
        assert (shard_of[must], must) in snap, must


def test_heavy_hitters_batch_twin(spark):
    from zef_spark.streaming.stateful import heavy_hitters_stream
    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [(f"c{i}",) for i in range(40)],
        "item string")
    rows = heavy_hitters_stream(df, "item", counters=8,
                                shards=2).collect()
    snap = {r["item"]: r for r in rows}
    assert "a" in snap and "b" in snap
    assert snap["a"]["est"] <= 50 <= snap["a"]["est"] + snap["a"]["decr"]
