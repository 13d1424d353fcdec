"""Streaming graph ingestion: a Structured Streaming sink that applies
each micro-batch as ONE atomic graph transaction (the reference's
stream -> graph write path, zef §1.5, re-expressed as foreachBatch).

Semantics:
- `wish_fn(rows)` maps a micro-batch's rows to a wish list (E / R /
  Assign / SetField / ... from graph.delta) — the same driver-level
  write API every other transact uses; wish volume is bounded by the
  micro-batch, exactly like a manual transact call.
- one micro-batch == one tx: the batch is atomic and the tx id in the
  receipt marks which batch produced which graph slice (time travel
  to "before batch N" is `g | time_travel[...]` as usual).
- exactly-once on top of foreachBatch's at-least-once: the applied
  batch-id ledger skips replayed batches. The ledger rides ON THE
  GRAPH (a ZefSparkStream entity per batch) so it survives a restart
  WITH the graph state it guards — checkpoint recovery replays the
  batch, the ledger says it's applied, the tx is skipped.

At scale: transact's cost model is unchanged (O(1) Spark jobs per
batch, broadcast uid resolution); the stream source does the heavy
lifting distributed, only the wish construction is driver-side.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..graph.delta import E, SetField, transact
from ..graph.graph import Graph
from ..tokens import ET


class StreamTransactor:
    """Holds the evolving graph across micro-batches. `graph` is
    always the latest committed slice."""

    LEDGER_ET = ET.ZefSparkStreamBatch

    def __init__(self, g: Graph, wish_fn: Callable, stream_id: str):
        self.graph = g
        self.wish_fn = wish_fn
        self.stream_id = stream_id
        self._applied = self._load_ledger(g)

    def _load_ledger(self, g: Graph) -> set:
        if g.nodes.isEmpty():
            return set()
        # public field reader: (id, value) rows for the ledger type's
        # batch_key attribute in the current frame
        vals = g.now().all(self.LEDGER_ET).field("batch_key")
        return {r[1] for r in vals.collect()}

    def _batch_key(self, batch_id: int) -> str:
        return f"{self.stream_id}:{batch_id}"

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> bool:
        """foreachBatch hook. Returns True if the batch was applied,
        False if the ledger says it already was (replay)."""
        key = self._batch_key(batch_id)
        if key in self._applied:
            return False
        rows = batch_df.collect()
        wishes = list(self.wish_fn(rows))
        # ledger entry commits IN THE SAME TX as the payload: apply
        # and mark are atomic, so a crash between them is impossible
        ledger_name = f"__ledger_{key}"
        wishes.append(E(self.LEDGER_ET, ledger_name))
        wishes.append(SetField(ledger_name, "batch_key", key))
        self.graph, _receipt = transact(self.graph, wishes)
        self._applied.add(key)
        return True


def stream_transact(g: Graph, stream_df: DataFrame,
                    wish_fn: Callable, stream_id: str = "s1",
                    once: bool = True,
                    checkpoint: str | None = None):
    """Run `stream_df` into graph `g`, one tx per micro-batch.
    once=True drains everything available then stops (test mode) and
    returns the StreamTransactor (read `.graph` for the result);
    otherwise returns (StreamTransactor, StreamingQuery)."""
    st = StreamTransactor(g, wish_fn, stream_id)
    writer = stream_df.writeStream.foreachBatch(st.apply_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return st
    return st, writer.start()
