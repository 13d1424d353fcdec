"""GraphQL per-type subscriptions.

Reference parity: the reference's GraphQL layer exposes a
Subscription root resolved through ariadne's SubscriptionType
(python/zef/graphql/resolvers_generator.py:60-61), fed by the graph's
event streams; the SimpleGQL server pipes its request stream through
``subscribe[run]`` (python/zef/graphql/simplegql/server2.py:203). A
SimpleGQL user therefore observes per-type change events
(add/update/delete) as they commit.

Spark-first design: mutations already commit a new table version into
the ``TableStore`` (mutations.py). The ``SubscriptionManager`` hooks
that commit point:

- **callback subscriptions** (the server/websocket boundary shape):
  ``subscribe("Customer", fn, events=("added",))`` — fn receives one
  event dict per mutation touching that type, with the affected-row
  payload capped at ``max_rows`` (same driver-OOM guard as the query
  path).
- **stream subscriptions** (the engine-scale shape): with an
  ``event_log_path``, every event is also appended as parquet, and
  ``stream(spark)`` returns a Structured-Streaming DataFrame over the
  log — watermarks / windowed aggregates / ``streaming.events
  .subscribe`` compose on top, which is how a 100 TB deployment fans
  events out (the log is the queue; one writer, many readers).
"""

from __future__ import annotations

import itertools
import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_KINDS = ("added", "updated", "deleted")

#: schema of the streamed subscription event log
SUB_EVENT_SCHEMA = ("seq long, type_name string, kind string, "
                    "count long, rows_json string")


class Subscription:
    def __init__(self, mgr: "SubscriptionManager", sid: int,
                 tname: str, events: tuple[str, ...]):
        self._mgr = mgr
        self.id = sid
        self.type_name = tname
        self.events = events

    def cancel(self):
        self._mgr.unsubscribe(self.id)


class SubscriptionManager:
    """Per-type change-event hub for a TableStore-backed engine."""

    def __init__(self, event_log_path: str | None = None,
                 max_rows: int = 100):
        self._subs: dict[int, tuple[str, tuple[str, ...], Callable]] = {}
        self._ids = itertools.count(1)
        self._seq = itertools.count(1)
        self.event_log_path = event_log_path
        self.max_rows = max_rows

    # -- consumer side -------------------------------------------------

    def subscribe(self, type_name: str, callback: Callable,
                  events: tuple[str, ...] = EVENT_KINDS) -> Subscription:
        bad = set(events) - set(EVENT_KINDS)
        if bad:
            raise ValueError(f"unknown event kinds {sorted(bad)}; "
                             f"valid: {EVENT_KINDS}")
        sid = next(self._ids)
        self._subs[sid] = (type_name, tuple(events), callback)
        return Subscription(self, sid, type_name, tuple(events))

    def unsubscribe(self, sid: int):
        self._subs.pop(sid, None)

    def stream(self, spark: SparkSession) -> DataFrame:
        """Structured-Streaming reader over the subscription event
        log (requires event_log_path)."""
        if self.event_log_path is None:
            raise ValueError("SubscriptionManager has no event_log_path")
        return (spark.readStream.schema(SUB_EVENT_SCHEMA)
                .option("maxFilesPerTrigger", 64)
                .parquet(self.event_log_path))

    def batch(self, spark: SparkSession) -> DataFrame:
        if self.event_log_path is None:
            raise ValueError("SubscriptionManager has no event_log_path")
        return spark.read.parquet(self.event_log_path)

    # -- producer side (called by the engine after a mutation commits) -

    def publish(self, type_name: str, kind: str,
                affected: DataFrame) -> dict | None:
        """Build + deliver one event for a committed mutation. The
        affected-row payload is bounded by max_rows before any
        driver materialization; `count` stays exact."""
        listeners = [(sid, cb) for sid, (t, evs, cb) in self._subs.items()
                     if t == type_name and kind in evs]
        log_it = self.event_log_path is not None
        if not listeners and not log_it:
            return None
        count = affected.count()
        rows = [json.loads(r) for r in
                affected.limit(self.max_rows).toJSON().collect()]
        event = {"seq": next(self._seq), "type": type_name,
                 "kind": kind, "count": count, "rows": rows}
        if log_it:
            spark = affected.sparkSession
            (spark.createDataFrame(
                [(event["seq"], type_name, kind, count,
                  json.dumps(rows))], SUB_EVENT_SCHEMA)
             .coalesce(1).write.mode("append")
             .parquet(self.event_log_path))
        for _sid, cb in listeners:
            cb(dict(event))
        return event


def counts_by_type(events: DataFrame) -> DataFrame:
    """Convenience aggregate over the subscription log (batch or
    stream): events per (type, kind)."""
    return (events.groupBy("type_name", "kind")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("count").alias("n_rows")))
