"""Graph-change streams as Structured Streaming.

Reference parity: ``on[instantiated[T] | terminated[T] | assigned[T]]``
(ITF:238-360) filters per-transaction event lists into RxPY subjects;
``subscribe`` attaches callbacks (op_structs.py:876-915).

Spark-native design (SURVEY §2.L): the graph's *event log* is the
streaming source. Events are derived set-wise from the bitemporal
tables — a row instantiated at ``valid_from_tx``, terminated at
``valid_to_tx``, assigned at ``assigned_at_tx`` — and materialized as
an append-only parquet log that ``readStream`` tails. In production
the log falls out of the Delta commit (Change Data Feed) instead of a
separate write; the derivation below is the storage-agnostic form.

Late data / watermarks / session windows have NO reference equivalent
(push-based Rx has no event time) — exposed here as Spark-native
extras (`windowed_counts`).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph.graph import Graph
from ..graph.schema import VALUE_COL_LIST

EVENT_SCHEMA = ("tx_id LONG, event STRING, kind STRING, id LONG, "
                "token STRING, value STRING, time TIMESTAMP_NTZ")


def derive_event_log(g: Graph) -> DataFrame:
    """Full event log (tx_id, event, kind, id, token, value, time) from
    the bitemporal tables — pure set-oriented derivation, no state."""
    txs = g.txs
    n_inst = g.nodes.select(
        F.col("valid_from_tx").alias("tx_id"),
        F.lit("instantiated").alias("event"), F.lit("node").alias("kind"),
        "id", F.col("et").alias("token"),
        F.lit(None).cast("string").alias("value"))
    n_term = g.nodes.where(F.col("valid_to_tx").isNotNull()).select(
        F.col("valid_to_tx").alias("tx_id"),
        F.lit("terminated").alias("event"), F.lit("node").alias("kind"),
        "id", F.col("et").alias("token"),
        F.lit(None).cast("string").alias("value"))
    e_inst = g.edges.select(
        F.col("valid_from_tx").alias("tx_id"),
        F.lit("instantiated").alias("event"), F.lit("edge").alias("kind"),
        "id", F.col("rt").alias("token"),
        F.lit(None).cast("string").alias("value"))
    e_term = g.edges.where(F.col("valid_to_tx").isNotNull()).select(
        F.col("valid_to_tx").alias("tx_id"),
        F.lit("terminated").alias("event"), F.lit("edge").alias("kind"),
        "id", F.col("rt").alias("token"),
        F.lit(None).cast("string").alias("value"))
    assigned = g.attr_values.select(
        F.col("assigned_at_tx").alias("tx_id"),
        F.lit("assigned").alias("event"), F.lit("attr").alias("kind"),
        F.col("ae_id").alias("id"), F.col("vrt").alias("token"),
        F.coalesce(*[F.col(c).cast("string")
                     for c in VALUE_COL_LIST]).alias("value"))
    log = n_inst.unionByName(n_term).unionByName(e_inst) \
        .unionByName(e_term).unionByName(assigned)
    return log.join(F.broadcast(txs), "tx_id", "left")


def events_of_tx(g: Graph, tx: int) -> DataFrame:
    """`tx | events` (ITF:5168): the delta of one transaction."""
    return derive_event_log(g).where(F.col("tx_id") == tx)


def preceding_events(g: Graph, ids, up_to_tx: int | None = None
                     ) -> DataFrame:
    """`z | preceding_events` (ITF:5090): every past event of the
    given RAE id(s) up to a frame, oldest first. ``ids`` may be an
    int, a list, or a DataFrame with an ``id`` column (set-oriented:
    history for a whole node set in one plan)."""
    log = derive_event_log(g)
    if up_to_tx is not None:
        log = log.where(F.col("tx_id") <= up_to_tx)
    if isinstance(ids, DataFrame):
        return log.join(ids.select("id").distinct(), "id", "left_semi") \
                  .orderBy("tx_id")
    if isinstance(ids, int):
        ids = [ids]
    return log.where(F.col("id").isin(list(ids))).orderBy("tx_id")


class EventLog:
    """Append-only parquet event log + its streaming reader."""

    def __init__(self, path: str):
        self.path = path

    def write(self, g: Graph, mode: str = "overwrite") -> "EventLog":
        # partition by event kind → `on[instantiated[...]]` prunes
        derive_event_log(g).write.mode(mode) \
            .partitionBy("event").parquet(self.path)
        return self

    def append_tx(self, g: Graph, tx: int) -> "EventLog":
        events_of_tx(g, tx).write.mode("append") \
            .partitionBy("event").parquet(self.path)
        return self

    def push(self, rows, spark: SparkSession | None = None) -> "EventLog":
        """Imperative push into the pushable stream (reference
        zefops `push`, ITF:2401): append explicit event rows — dicts
        with any subset of EVENT_SCHEMA's fields — to the log. The
        micro-batch file source picks the new files up on the next
        trigger, so `push` composes with every chainable stream op.
        Small appends create small files; at scale push through a
        queue/compaction layer instead of one file per call."""
        spark = spark or SparkSession.getActiveSession()
        if isinstance(rows, dict):
            rows = [rows]
        fields = [f.strip().split(" ")[0]
                  for f in EVENT_SCHEMA.split(",")]
        norm = [{k: r.get(k) for k in fields} for r in rows]
        spark.createDataFrame(norm, EVENT_SCHEMA) \
            .write.mode("append").partitionBy("event").parquet(self.path)
        return self

    def stream(self, spark: SparkSession) -> DataFrame:
        return (spark.readStream
                .schema(EVENT_SCHEMA)
                .option("maxFilesPerTrigger", 64)
                .parquet(self.path))

    def batch(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


def on_instantiated(events: DataFrame, et=None) -> DataFrame:
    out = events.where(F.col("event") == "instantiated")
    if et is not None:
        out = out.where(F.col("token") == getattr(et, "name", str(et)))
    return out


def on_terminated(events: DataFrame, et=None) -> DataFrame:
    out = events.where(F.col("event") == "terminated")
    if et is not None:
        out = out.where(F.col("token") == getattr(et, "name", str(et)))
    return out


def on_assigned(events: DataFrame, vrt: str | None = None) -> DataFrame:
    out = events.where(F.col("event") == "assigned")
    if vrt is not None:
        out = out.where(F.col("token") == vrt)
    return out


def subscribe(stream_df: DataFrame, fn: Callable, once: bool = True):
    """`subscribe[fn]`: run fn(batch_df, batch_id) per micro-batch.
    once=True processes everything available then stops (test mode);
    otherwise returns the running StreamingQuery."""
    writer = stream_df.writeStream.foreachBatch(fn)
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def sessionized(events: DataFrame, gap: str = "30 minutes",
                key: str = "id", time_col: str = "time",
                watermark: str | None = "1 hour") -> DataFrame:
    """Native session windows (F.session_window): per-key sessions
    close after `gap` of inactivity. Works identically on batch and
    streaming DataFrames; on streams the watermark bounds state (a
    session older than watermark+gap can never reopen, so Spark
    evicts it — the 100 TB/unbounded-stream requirement). Returns
    (key, session_start, session_end, n_events)."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    return (df.groupBy(F.col(key),
                       F.session_window(F.col(time_col), gap).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(key, F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"), "n_events"))


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "1 hour") -> DataFrame:
    """Spark-native extra: event-time tumbling counts with a
    late-data watermark (no reference equivalent)."""
    return (events.withColumn("time", F.col("time").cast("timestamp"))
            .withWatermark("time", watermark)
            .groupBy(F.window("time", window).alias("w"),
                     F.col("event"))
            .agg(F.count(F.lit(1)).alias("n")))


def streaming_dedup(stream: DataFrame, keys: list[str],
                    time_col: str | None = None,
                    delay: str = "1 hour") -> DataFrame:
    """Exact dedup on an unbounded stream — the ingestion-side
    at-least-once → exactly-once filter of a corpus pipeline.

    With `time_col`, state is BOUNDED: a watermark evicts keys older
    than `delay` (dropDuplicatesWithinWatermark — a duplicate arriving
    within the delay is dropped, later re-arrivals are the caller's
    compaction problem; this is the only state shape that survives an
    unbounded stream at 100 TB). Without `time_col`, state grows with
    distinct keys (exact-forever; batch DataFrames or bounded key
    domains only). Works identically on batch frames (falls back to
    dropDuplicates — watermarks are streaming-only)."""
    if time_col is None:
        return stream.dropDuplicates(keys)
    df = stream.withColumn(time_col, F.col(time_col).cast("timestamp"))
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    return (df.withWatermark(time_col, delay)
            .dropDuplicatesWithinWatermark(keys))
