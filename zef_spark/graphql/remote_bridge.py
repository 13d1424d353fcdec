"""Bridge remote graph commits into GraphQL subscriptions (r10
VERDICT order #6 — composing the two halves shipped in r09/r10):

  process A mutation → head-service marker put → /watch long-poll
  wake (graph/headsvc.py) → THIS process's event derivation →
  SubscriptionManager.publish → SSE `subscription { onT }` frame
  over the wire (graphql/server.py).

Reference parity: ZefHub pushes graph updates to subscribed clients
(core/include/observable.h:70-116, butler_handlers_ws.cpp) and the
SimpleGQL layer exposes them as per-type GraphQL subscriptions
(resolvers_generator.py:60-61, simplegql/server2.py:203); here the
push transport is the head service's parked long-poll and the wire
is SSE — same observable behavior, S3-shaped store.

Event-kind mapping (graph lifecycle → GraphQL change kinds):
instantiated → added, assigned → updated, terminated → deleted.
"""

from __future__ import annotations

from pyspark.sql import functions as F

#: graph lifecycle event → GraphQL subscription kind
KIND_MAP = {"instantiated": "added",
            "assigned": "updated",
            "terminated": "deleted"}


def bridge_remote_store(store, subscriptions,
                        type_map: dict[str, str] | None = None,
                        poll_timeout: float = 300.0):
    """Forward every remote commit batch delivered by
    ``RemoteGraphStore.subscribe`` (push — the watcher parks in the
    head service's /watch, no poll interval) into a GraphQL
    ``SubscriptionManager``: the batch's derived event log is grouped
    by (token, lifecycle event) and each group publishes one
    subscription event whose payload rows are the affected entity
    ids/fields. ``type_map`` renames graph tokens to GraphQL type
    names (default: identity — ET.Person → onPerson).

    Returns the underlying subscription handle; .stop() detaches."""
    type_map = type_map or {}

    def on_txs(g, applied):
        from ..streaming.events import derive_event_log
        log = (derive_event_log(g)
               .where(F.col("tx_id").isin([int(t) for t in applied])))
        groups = [(r["token"], r["event"]) for r in
                  log.select("token", "event").distinct().collect()]
        for token, ev in sorted(groups):
            kind = KIND_MAP.get(ev)
            if kind is None:
                continue
            affected = log.where((F.col("token") == token)
                                 & (F.col("event") == ev))
            subscriptions.publish(type_map.get(token, token), kind,
                                  affected)

    return store.subscribe(on_txs, poll_timeout=poll_timeout)
