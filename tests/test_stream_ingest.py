"""Streaming graph ingestion (streaming/ingest.py): one tx per
micro-batch, exactly-once via the on-graph batch ledger."""

import pyspark.sql.functions as F

from zef_spark import ET
from zef_spark.graph.delta import E, empty_graph
from zef_spark.streaming.ingest import StreamTransactor, stream_transact


def _wish_fn(rows):
    return [E(ET.Purchase, f"p{r.user}_{r.amount}",
              fields={"amount": float(r.amount)})
            for r in rows]


def _write_src(spark, path, rows):
    spark.createDataFrame(rows, "user long, amount double") \
        .coalesce(1).write.mode("append").parquet(path)


def test_stream_transact_drains_and_resumes(spark, tmp_path):
    src, cp = str(tmp_path / "src"), str(tmp_path / "cp")
    _write_src(spark, src, [(1, 10.0), (2, 20.0)])
    stream = spark.readStream.schema("user long, amount double") \
        .parquet(src)
    st = stream_transact(empty_graph(spark), stream, _wish_fn,
                         checkpoint=cp)
    g = st.graph
    assert g.now().all(ET.Purchase).df.count() == 2

    # more data arrives; resuming from the same checkpoint only
    # processes the new files, continuing on the evolved graph
    _write_src(spark, src, [(3, 30.0)])
    stream2 = spark.readStream.schema("user long, amount double") \
        .parquet(src)
    st2 = stream_transact(g, stream2, _wish_fn, checkpoint=cp)
    assert st2.graph.now().all(ET.Purchase).df.count() == 3
    # each batch committed as its own tx: amounts all present
    vals = sorted(r[1] for r in
                  st2.graph.now().all(ET.Purchase)
                  .field("amount").collect())
    assert vals == [10.0, 20.0, 30.0]


def test_replayed_batch_is_skipped(spark):
    g = empty_graph(spark)
    st = StreamTransactor(g, _wish_fn, "s1")
    batch = spark.createDataFrame([(1, 5.0)], "user long, amount double")
    assert st.apply_batch(batch, 0) is True
    n1 = st.graph.now().all(ET.Purchase).df.count()
    # at-least-once delivery replays batch 0: ledger must skip it
    assert st.apply_batch(batch, 0) is False
    assert st.graph.now().all(ET.Purchase).df.count() == n1 == 1


def test_ledger_survives_restart(spark):
    g = empty_graph(spark)
    st = StreamTransactor(g, _wish_fn, "s1")
    batch = spark.createDataFrame([(7, 9.0)], "user long, amount double")
    st.apply_batch(batch, 0)
    # a NEW transactor over the committed graph (process restart)
    # reloads the applied set from the graph itself
    st2 = StreamTransactor(st.graph, _wish_fn, "s1")
    assert st2.apply_batch(batch, 0) is False
    # but a different stream id is a different ledger namespace
    st3 = StreamTransactor(st.graph, _wish_fn, "s2")
    assert st3.apply_batch(batch, 0) is True
