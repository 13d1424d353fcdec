"""Streaming graph ingestion (streaming/ingest.py): one tx per
micro-batch, exactly-once via the on-graph batch ledger."""


# r13 verify-gate split: multi-minute e2e/property lane, opt-in via `make test-slow`
import pytest
pytestmark = pytest.mark.slow
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


# ---------------------------------------------------------------- mapped path

from zef_spark.streaming.ingest import (BatchEntityMap,  # noqa: E402
                                        MappedStreamTransactor,
                                        stream_transact_mapped)

_MAP = BatchEntityMap(ET.Purchase, key_col="user", type_code=90,
                      fields={"amount": 700})


def test_mapped_ingest_no_driver_materialization(spark):
    """Payload rows never hit the driver: batch_df.collect is poisoned
    for the duration of apply_batch (the ledger/max_tx reads are on
    the graph's own 1-row aggregates, not the payload)."""
    g = empty_graph(spark)
    st = MappedStreamTransactor(g, _MAP, "s1")
    batch = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "user long, amount double")

    def poisoned(*a, **kw):
        raise AssertionError("payload batch_df was collected on the driver")
    batch.collect = poisoned
    batch.toLocalIterator = poisoned
    batch.toPandas = poisoned
    assert st.apply_batch(batch, 0) is True
    ns = st.graph.now().all(ET.Purchase).df
    assert ns.count() == 2
    vals = sorted(r[1] for r in
                  st.graph.now().all(ET.Purchase).field("amount").collect())
    assert vals == [10.0, 20.0]
    # deterministic arithmetic ids: replaying the mapping mints the
    # SAME entity id for the same key (mapper._mkid scheme)
    from zef_spark.graph.schema import ID_KEY_BITS
    ids = sorted(r[0] for r in ns.select("id").collect())
    assert ids == [90 * (1 << ID_KEY_BITS) + 1, 90 * (1 << ID_KEY_BITS) + 2]


def test_mapped_replay_and_restart(spark):
    g = empty_graph(spark)
    st = MappedStreamTransactor(g, _MAP, "s1")
    batch = spark.createDataFrame([(5, 1.5)], "user long, amount double")
    assert st.apply_batch(batch, 0) is True
    assert st.apply_batch(batch, 0) is False        # replay skipped
    assert st.graph.now().all(ET.Purchase).df.count() == 1
    # restart: a fresh transactor reloads the ledger from the graph
    st2 = MappedStreamTransactor(st.graph, _MAP, "s1")
    assert st2.apply_batch(batch, 0) is False
    # payload and ledger share ONE tx (atomic apply+mark)
    assert st.graph.max_tx() == 1


def test_mapped_stream_end_to_end(spark, tmp_path):
    src, cp = str(tmp_path / "msrc"), str(tmp_path / "mcp")
    _write_src(spark, src, [(1, 10.0), (2, 20.0)])
    stream = spark.readStream.schema("user long, amount double") \
        .parquet(src)
    st = stream_transact_mapped(empty_graph(spark), stream, _MAP,
                                checkpoint=cp)
    assert st.graph.now().all(ET.Purchase).df.count() == 2
    _write_src(spark, src, [(3, 30.0)])
    stream2 = spark.readStream.schema("user long, amount double") \
        .parquet(src)
    st2 = stream_transact_mapped(st.graph, stream2, _MAP, checkpoint=cp)
    vals = sorted(r[1] for r in st2.graph.now().all(ET.Purchase)
                  .field("amount").collect())
    assert vals == [10.0, 20.0, 30.0]


def test_mapped_ingest_key_guard_and_ledger_band(spark):
    """Out-of-range keys fail LOUDLY (they would alias into a
    neighboring code band); ledger ids always mint above the whole
    payload band even for codes past 2^(60-K)."""
    import pytest
    from zef_spark.graph.schema import ID_KEY_BITS
    g = empty_graph(spark)
    st = MappedStreamTransactor(g, _MAP, "s1")
    bad = spark.createDataFrame([(-1, 1.0)], "user long, amount double")
    with pytest.raises(Exception, match="out of"):
        st.apply_batch(bad, 0)
    # high codes (700/702 > 256): payload ids sit above 2^60; the
    # ledger must still be disjoint from every payload id
    st2 = MappedStreamTransactor(empty_graph(spark), _MAP, "s1")
    batch = spark.createDataFrame([(1, 2.0), (2, 3.0)],
                                  "user long, amount double")
    assert st2.apply_batch(batch, 0) is True
    ids = [r[0] for r in st2.graph.nodes.select("id").collect()]
    assert len(ids) == len(set(ids)), "duplicate graph ids"
    assert max(ids) >= _MAP.max_payload_id   # ledger above the band
