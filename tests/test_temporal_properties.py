"""Property tests for temporal invariants (SURVEY §5: "property tests
for temporal invariants — all[T]@slice(i) consistent with replaying
events ≤ i").

Hypothesis generates random wish histories (instantiate / assign /
terminate sequences over a small entity pool); for every resulting
transaction slice we check the bitemporal reads against an
independent, dead-simple Python replay of the same event list.
Reference semantics under test: tombstone intervals
(core/include/blobs.h:160,174 termination_time_slice), value history
(ATTRIBUTE_VALUE_ASSIGNMENT_EDGE, blobs.h:284), frame reads
(graph_slice.py:24-74).
"""


import pytest

# r13 verify-gate split: multi-minute e2e/property lane, opt-in via `make test-slow`
pytestmark = pytest.mark.slow
from dataclasses import replace

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zef_spark import ET, RT, ops as z
from zef_spark.graph.delta import Assign, E, R, Terminate, \
    empty_graph, transact

# a history is a list of txs; each tx is a list of (verb, entity_idx,
# value) commands over a pool of 4 entity names
_cmd = st.tuples(st.sampled_from(["new", "assign", "kill"]),
                 st.integers(min_value=0, max_value=3),
                 st.integers(min_value=0, max_value=9))
_history = st.lists(st.lists(_cmd, min_size=1, max_size=3),
                    min_size=1, max_size=4)


def _replay(history):
    """Driver-side oracle: replay commands, recording per-slice state
    {name: value_or_None} for every tx index (1-based)."""
    alive, value, slices = {}, {}, []
    for tx in history:
        for verb, idx, val in tx:
            name = f"e{idx}"
            if verb == "new" and not alive.get(name):
                alive[name] = True
                value[name] = None
            elif verb == "assign" and alive.get(name):
                value[name] = val
            elif verb == "kill" and alive.get(name):
                alive[name] = False
        slices.append(({n for n, a in alive.items() if a},
                       {n: v for n, v in value.items()
                        if alive.get(n)}))
    return slices


def _wishes(history):
    """Same commands as graph wishes, one transact per tx; returns the
    final graph and the receipt name→id map."""
    alive = {}
    out = []
    for tx in history:
        ws = []
        for verb, idx, val in tx:
            name = f"e{idx}"
            if verb == "new" and not alive.get(name):
                alive[name] = True
                ws.append(E(ET.Thing, name=name))
            elif verb == "assign" and alive.get(name):
                ws.append(Assign(name, "x", val))
            elif verb == "kill" and alive.get(name):
                alive[name] = False
                ws.append(Terminate(name))
        out.append(ws)
    return out


def _apply(spark, history):
    """Run the history through transact; returns (graph, name→id as of
    each slice)."""
    g = empty_graph(spark)
    ids: dict[str, int] = {}
    id_history: list[dict[str, int]] = []
    for ws in _wishes(history):
        # receipts don't persist across transacts: remap names minted
        # in EARLIER txs to their ids — POSITIONALLY: the replay
        # oracle is sequential, so a name refers to the in-tx E only
        # once that E precedes it in the wish list (kill-then-
        # recreate targets the OLD id; create-then-kill targets the
        # NEW in-tx binding). Two Hypothesis falsifiers pinned this:
        # new/kill/new-again (stale cross-tx id made Terminate hit
        # the dead ancestor) and kill-before-recreate (blind in-tx
        # preference made Terminate a forward reference).
        minted: set = set()
        resolved = []
        for w in ws:
            if isinstance(w, E):
                minted.add(w.name)
                resolved.append(w)
            elif w.target in minted:
                resolved.append(w)      # in-tx binding wins
            elif w.target in ids:
                resolved.append(replace(w, target=ids[w.target]))
            else:
                resolved.append(w)
        ws = resolved
        g, rc = transact(g, ws)
        ids.update(rc)
        id_history.append(dict(ids))
    return g, id_history


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_history)
def test_slice_reads_match_event_replay(spark, history):
    expected = _replay(history)
    g, id_history = _apply(spark, history)
    n_tx = g.max_tx()
    assert n_tx == len(history)
    for i, (alive_names, values) in enumerate(expected, start=1):
        frame_ids = id_history[i - 1]
        gs = g.at(i)
        ns = gs | z.all[ET.Thing]
        got_ids = {r.id for r in ns.df.select("id").collect()}
        want_ids = {frame_ids[n] for n in alive_names}
        assert got_ids == want_ids, f"slice {i}: alive set mismatch"
        got_vals = dict(ns.field("x").collect())
        want_vals = {frame_ids[n]: v for n, v in values.items()
                     if v is not None}
        assert got_vals == want_vals, f"slice {i}: value mismatch"


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_history)
def test_time_travel_equals_direct_slice(spark, history):
    """time_travel[-k] from now == at(max_tx - k) (ITF:5493)."""
    g, _ = _apply(spark, history)
    n_tx = g.max_tx()
    now = g.now()
    for k in range(n_tx):
        a = now.time_travel(-k)
        b = g.at(n_tx - k)
        ca = (a | z.all[ET.Thing]).df.select("id")
        cb = (b | z.all[ET.Thing]).df.select("id")
        assert {r.id for r in ca.collect()} == \
            {r.id for r in cb.collect()}


# -- relation lifecycle: edges close when an endpoint terminates -----
# (cascade at the terminator's tx, reference graph_delta.py:730;
# link+kill in ONE tx ⇒ empty interval, never visible)

_rcmd = st.tuples(st.sampled_from(["new", "link", "kill"]),
                  st.integers(min_value=0, max_value=2),
                  st.integers(min_value=0, max_value=2))
_rhistory = st.lists(st.lists(_rcmd, min_size=1, max_size=3),
                     min_size=1, max_size=4)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_rhistory)
def test_edge_visibility_matches_endpoint_lifetimes(spark, history):
    # A name killed and later re-`new`ed binds to a NEW node (a new
    # "generation"); edges keep pointing at the generation that was
    # alive when they were created. The expectation model therefore
    # tracks ids per (name, generation) — resolving endpoints through
    # a flat name→id map silently re-pointed old edges at the newest
    # generation (latent since r08, found by hypothesis in r12; the
    # engine was right: repro'd identically on the r11 tree).
    alive: dict[str, int | None] = {}     # name -> live generation
    gen_ctr: dict[str, int] = {}
    gid: dict[tuple, int] = {}            # (name, gen) -> node id
    # expected edges as [src_genkey, dst_genkey, created_tx, closed]
    exp_edges: list[list] = []
    g = empty_graph(spark)
    next_tx = 1                       # graph tx number IF this tx commits
    for tx in history:
        txi = next_tx
        ws = []
        created: dict[str, int] = {}      # name -> gen created this tx
        for verb, a, b in tx:
            na, nb = f"e{a}", f"e{b}"
            if verb == "new" and alive.get(na) is None:
                gen_ctr[na] = gen_ctr.get(na, 0) + 1
                alive[na] = created[na] = gen_ctr[na]
                ws.append(E(ET.Thing, name=na))
            elif verb == "link" and alive.get(na) is not None \
                    and alive.get(nb) is not None:
                ws.append(R(na if na in created
                            else gid[(na, alive[na])],
                            RT.Link,
                            nb if nb in created
                            else gid[(nb, alive[nb])]))
                exp_edges.append([(na, alive[na]), (nb, alive[nb]),
                                  txi, None])
            elif verb == "kill" and alive.get(na) is not None:
                kgen = alive[na]
                ws.append(Terminate(na if na in created
                                    else gid[(na, kgen)]))
                for e in exp_edges:
                    if e[3] is None and (na, kgen) in (e[0], e[1]):
                        e[3] = txi
                alive[na] = None
        if not ws:
            continue
        g, rc = transact(g, ws)
        for name, gen in created.items():
            gid[(name, gen)] = rc[name]
        next_tx += 1
    n_tx = g.max_tx()
    for i in range(1, n_tx + 1):
        es = (g.at(i) | z.all[ET.Thing]).out_rels(RT.Link)
        got = sorted((r.src_id, r.dst_id)
                     for r in es.df.select("src_id", "dst_id").collect())
        want = sorted((gid[s], gid[d]) for s, d, c, k in exp_edges
                      if c <= i and (k is None or k > i))
        assert got == want, f"slice {i}: edge set mismatch"
