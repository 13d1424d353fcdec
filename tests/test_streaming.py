"""Structured-Streaming graph-change subscriptions over the event log
(reference: on[instantiated/terminated/assigned], test_subscribe.py)."""


# r13 verify-gate split: multi-minute e2e/property lane, opt-in via `make test-slow`
import pytest
pytestmark = pytest.mark.slow
import tempfile

import pytest
from pyspark.sql import functions as F

from zef_spark import ET, RT
from zef_spark.graph.delta import E, R, Assign, Terminate, empty_graph, \
    transact
from zef_spark.streaming import (EventLog, events_of_tx, on_assigned,
                                 on_instantiated, on_terminated)


@pytest.fixture(scope="module")
def g(spark):
    g0 = empty_graph(spark)
    g1, r1 = transact(g0, [
        E(ET.Machine, name="m1", fields={"UsedBy": "alice"}),
        E(ET.Machine, name="m2", fields={"UsedBy": "bob"}),
    ])
    g2, _ = transact(g1, [Assign(r1["m1"], "UsedBy", "carol")])
    g3, _ = transact(g2, [Terminate(r1["m2"])])
    return g3


def test_events_of_tx(g):
    ev1 = events_of_tx(g, 1)
    kinds = {(r["event"], r["kind"]) for r in ev1.collect()}
    assert ("instantiated", "node") in kinds
    assert ("assigned", "attr") in kinds
    ev3 = events_of_tx(g, 3)
    assert {r["event"] for r in ev3.collect()} >= {"terminated"}


def test_event_filters_batch(g, spark):
    with tempfile.TemporaryDirectory() as d:
        log = EventLog(f"{d}/log").write(g)
        ev = log.batch(spark)
        inst = on_instantiated(ev, ET.Machine)
        assert inst.count() == 2
        term = on_terminated(ev, ET.Machine)
        assert term.count() == 1
        asg = on_assigned(ev, "String")
        assert asg.count() == 3  # 2 initial + 1 re-assign


def test_streaming_subscription(g, spark):
    with tempfile.TemporaryDirectory() as d:
        log = EventLog(f"{d}/log").write(g)
        stream = log.stream(spark)
        seen = []

        def sink(batch_df, batch_id):
            seen.extend(batch_df.collect())

        from zef_spark.streaming import subscribe
        q = (on_instantiated(stream, ET.Machine)
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", f"{d}/ckpt")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert len(seen) == 2
        assert all(r["token"] == "Machine" for r in seen)


def test_stream_op_chaining(g, spark):
    """Generic op chains compose against STREAMING DataFrames for the
    stateless subset (reference lifts ops onto Rx streams,
    op_structs.py:789-824): on_instantiated | filter | map |
    subscribe, plus for_each as a streaming terminal."""
    from pyspark.sql import functions as F
    from zef_spark import ops as z

    with tempfile.TemporaryDirectory() as d:
        log = EventLog(f"{d}/log").write(g)
        stream = log.stream(spark)
        seen = []
        (on_instantiated(stream)
         | z.filter[F.col("kind") == "node"]
         | z.map[{"id": F.col("id"), "token": F.col("token")}]
         | z.subscribe[lambda b, _i: seen.extend(b.collect())])
        machines = [r for r in seen if r["token"] == "Machine"]
        assert len(machines) == 2

        # for_each drains per element on a stream
        ids = []
        (on_instantiated(stream)
         | z.filter[F.col("token") == "Machine"]
         | z.map[F.col("id")]
         | z.for_each[ids.append])
        assert len(ids) == 2

        # collect on a stream is a clear error, not a hang
        import pytest as _pytest
        with _pytest.raises(TypeError, match="STREAMING"):
            stream | z.collect


def test_push_into_event_log(spark, tmp_path):
    """`value | push[stream]`: pushed rows land in the log and the
    streaming reader sees them on the next trigger."""
    from zef_spark import ops as z
    from zef_spark.streaming.events import EventLog, subscribe
    log = EventLog(str(tmp_path / "pushlog"))
    ({"tx_id": 1, "event": "instantiated", "kind": "node", "id": 7,
      "token": "ET.Sensor"} | z.push[log])
    log.push([{"tx_id": 2, "event": "assigned", "kind": "attr", "id": 7,
               "token": "Float", "value": "3.5"}])
    seen = []
    subscribe(log.stream(spark), lambda b, _i: seen.extend(
        r.asDict() for r in b.collect()), once=True)
    assert {r["event"] for r in seen} == {"instantiated", "assigned"}
    assert all(r["id"] == 7 for r in seen)


def test_streaming_dedup_bounded_state(spark, tmp_path):
    """streaming_dedup: duplicates within the watermark are dropped on
    an unbounded stream (dropDuplicatesWithinWatermark — bounded
    state); batch frames dedup exactly."""
    import datetime as dt
    from zef_spark.streaming.events import streaming_dedup, subscribe
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(10, base, "a"), (10, base + dt.timedelta(minutes=1), "a-dup"),
            (11, base + dt.timedelta(minutes=2), "b"),
            (10, base + dt.timedelta(minutes=3), "a-dup2"),
            (12, base + dt.timedelta(minutes=4), "c")]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v string")
    # batch: exact dedup
    assert streaming_dedup(df, ["k"], "ts").count() == 3
    # stream: same via the file source
    src = str(tmp_path / "dedup_src")
    df.write.parquet(src)
    stream = (spark.readStream.schema("k long, ts timestamp, v string")
              .parquet(src))
    out = []
    deduped = streaming_dedup(stream, ["k"], "ts", delay="10 minutes")
    assert stream.isStreaming and deduped.isStreaming
    subscribe(deduped, lambda b, _i: out.extend(b.collect()), once=True)
    assert sorted(r.k for r in out) == [10, 11, 12]


def test_corpus_ops_stream_unchanged(spark, tmp_path):
    """The row-local corpus operators (PII redact, quality scoring,
    split assignment) are pure projections, so the SAME functions run
    on a streaming DataFrame without modification — the 100 TB ingest
    shape: score/redact/split documents as they arrive, no batch/
    stream code fork."""
    from zef_spark.pipeline.corpus import split_corpus
    from zef_spark.pipeline.text import pii_redact, quality_score
    from zef_spark.streaming.events import subscribe
    rows = [(1, "Contact me at a@b.com about the big deal and the "
                "plan that is in the works with everyone"),
            (2, "short text"),
            (3, "the quick brown fox and the lazy dog went to the "
                "market with a basket of goods that is full")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "corpus_src")
    df.write.parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(src))

    def pipeline(d):
        scored = quality_score(pii_redact(d, "text"), "text")
        return split_corpus(scored, "doc_id",
                            {"train": 0.8, "val": 0.2}, salt="s") \
            .select("doc_id", "redacted", "quality", "split")

    assert stream.isStreaming and pipeline(stream).isStreaming
    out = []
    subscribe(pipeline(stream),
              lambda b, _i: out.extend(b.collect()), once=True)
    batch = {r["doc_id"]: tuple(r) for r in pipeline(df).collect()}
    streamed = {r["doc_id"]: tuple(r) for r in out}
    assert streamed == batch                    # identical rows
    assert "[EMAIL]" in streamed[1][1]          # redaction applied


def test_sync_materializes_durable_graph(spark, tmp_path):
    """g | sync[path]: persists and returns the disk-backed graph with
    identical query results."""
    from zef_spark import ops as z
    g0 = empty_graph(spark)
    g1, _ = transact(g0, [
        E(ET.Machine, name="m1", fields={"UsedBy": "alice"}),
        E(ET.Machine, name="m2", fields={"UsedBy": "bob"})])
    g2 = g1 | z.sync[str(tmp_path / "synced")]
    assert (g2.now() | z.all[ET.Machine] | z.count | z.collect) == 2
    import os
    assert os.path.isdir(str(tmp_path / "synced" / "nodes"))
    # identity form still returns the graph unchanged
    assert (g1 | z.sync) is g1


def test_session_window_batch_and_stream(spark, tmp_path):
    """F.session_window sessionization: same results in batch and
    streaming (availableNow) modes; watermark bounds stream state."""
    import datetime as dt
    from zef_spark.streaming.events import sessionized
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(1, base), (1, base + dt.timedelta(minutes=10)),   # session 1
            (1, base + dt.timedelta(hours=2)),                 # session 2
            (2, base + dt.timedelta(minutes=5))]               # user 2
    df = spark.createDataFrame(rows, "id long, time timestamp")
    got = {(r["id"], r["n_events"]) for r in
           sessionized(df, gap="30 minutes").collect()}
    assert got == {(1, 2), (1, 1), (2, 1)}

    src = str(tmp_path / "sess_src")
    df.write.parquet(src)
    stream = (spark.readStream.schema("id long, time timestamp")
              .parquet(src))
    out = []
    q = (sessionized(stream, gap="30 minutes")
         .writeStream.outputMode("complete")
         .foreachBatch(lambda b, _i: out.extend(b.collect()))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert {(r["id"], r["n_events"]) for r in out} == got


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join: streaming result over
    the file source equals the identical batch-plan join."""
    import datetime as dt
    from zef_spark.streaming.events import subscribe
    from zef_spark.streaming.joins import stream_interval_join
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    views = [(1, base), (1, base + dt.timedelta(minutes=50)),
             (2, base + dt.timedelta(minutes=5))]
    buys = [(1, base + dt.timedelta(minutes=10)),      # joins view 1
            (1, base + dt.timedelta(minutes=55)),      # joins view 2of1
            (2, base + dt.timedelta(hours=3)),         # outside band
            (3, base)]                                 # no view
    vdf = spark.createDataFrame(views, "user_id long, ts timestamp")
    bdf = spark.createDataFrame(buys, "user_id long, ts timestamp")
    batch = {(r["user_id"], r["ts"], r["ts_r"]) for r in
             stream_interval_join(vdf, bdf, "user_id",
                                  within="30 minutes").collect()}
    assert len(batch) == 2  # view@12:00->buy@12:10, view@12:50->buy@12:55
    vsrc, bsrc = str(tmp_path / "v"), str(tmp_path / "b")
    vdf.write.parquet(vsrc)
    bdf.write.parquet(bsrc)
    schema = "user_id long, ts timestamp"
    vs = spark.readStream.schema(schema).parquet(vsrc)
    bs = spark.readStream.schema(schema).parquet(bsrc)
    joined = stream_interval_join(vs, bs, "user_id",
                                  within="30 minutes")
    assert joined.isStreaming
    got = []
    subscribe(joined, lambda b, _i: got.extend(b.collect()), once=True)
    assert {(r["user_id"], r["ts"], r["ts_r"]) for r in got} == batch
