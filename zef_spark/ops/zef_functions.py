"""Graph-stored, versioned zef functions (SURVEY §2.M).

Reference parity: ``@func(g)`` beams a Python function onto a graph as
an ET.ZEF_Function entity whose RT.PythonSourceCode holds the source;
execution compiles from the stored source on demand with a
per-time-slice cache, and old versions stay addressable through
earlier frames (python/zef/core/zef_functions.py:100-268 —
zef_function_decorator, compile_zef_function, compile_in_zef_context).

Spark-first mapping: the function is an ordinary entity in the
bitemporal graph (graph/delta.py wishes), its source an attribute
assignment. Re-storing under the same label ASSIGNS new source in a
new tx — the attr_values table keeps the superseded row, so
``load_func(g, label, at=<old frame>)`` compiles exactly the version
that was current then (time-travel versioning for free; no separate
registry). Compilation is driver-side (functions orchestrate plans;
the plans they build execute distributed) and cached by source hash.
"""

from __future__ import annotations

import hashlib
import inspect
import textwrap

from pyspark.sql import functions as F

from ..tokens import ET
from .core import OP_REGISTRY, ZefOp

FN_ET = "ZefFunction"
SRC_RT = "PythonSourceCode"
LABEL_RT = "Label"

_compile_cache: dict[str, object] = {}


def _source_of(fn) -> str:
    src = textwrap.dedent(inspect.getsource(fn))
    # drop decorator lines so re-exec'ing the source doesn't recurse
    # into the decorator (reference stores the bare def the same way)
    lines = src.splitlines()
    start = next(i for i, ln in enumerate(lines)
                 if ln.lstrip().startswith(("def ", "async def ")))
    return "\n".join(lines[start:]) + "\n"


def compile_source(src: str):
    """Compile stored source in a namespace preloaded with the op
    layer (reference compile_in_zef_context: the function sees zef
    ops, not the caller's globals)."""
    key = hashlib.md5(src.encode()).hexdigest()
    if key in _compile_cache:
        return _compile_cache[key]
    from .. import ops as _ops
    from .. import tokens as _tokens
    ns = {"F": F, "ops": _ops, "z": _ops,
          "ET": _tokens.ET, "RT": _tokens.RT}
    code = compile(src, f"<zef_function_{key[:12]}>", "exec")
    exec(code, ns)
    names = [n for n, v in ns.items() if inspect.isfunction(v)
             and getattr(v, "__code__", None) is not None
             and v.__code__.co_filename.startswith("<zef_function_")]
    if not names:
        raise ValueError("stored source defines no function")
    fn = ns[names[-1]]
    _compile_cache[key] = fn
    return fn


def _find_fn_entity(gs, label: str):
    """entity id for the labelled function in a frame, or None."""
    rows = (gs | _pipe_all(ET.ZefFunction)).select_by_field(
        LABEL_RT, label).df.select("id").limit(1).collect()
    return rows[0][0] if rows else None


def _pipe_all(et):
    from .. import ops as z
    return z.all[et]


def store_func(g, fn=None, *, label: str | None = None,
               source: str | None = None):
    """Persist fn (or raw source) on the graph under ``label``;
    returns (new_graph, fn_id). First store instantiates the entity;
    subsequent stores under the same label assign new source — a new
    VERSION in a new tx, with the old one readable at old frames."""
    from ..graph.delta import Assign, E, transact
    if source is None:
        if fn is None:
            raise ValueError("need a function or source=")
        source = _source_of(fn)
    if label is None:
        if fn is None:
            raise ValueError("need label= when storing raw source")
        label = fn.__name__
    existing = _find_fn_entity(g.now(), label)
    if existing is None:
        g2, receipt = transact(g, [
            E(ET.ZefFunction, name="__f",
              fields={LABEL_RT: label, SRC_RT: source})])
        return g2, receipt["__f"]
    g2, _ = transact(g, [Assign(existing, SRC_RT, source)])
    return g2, existing


def load_func(g_or_gs, label: str, at=None):
    """Compile + return the stored function as of a frame: ``at`` may
    be None (now), a tx id, or a GraphSlice. Old frames yield old
    versions (reference: ``z_fct | to_frame[slice]`` then compile)."""
    from ..graph.graph import Graph, GraphSlice
    if isinstance(g_or_gs, GraphSlice):
        gs = g_or_gs
    elif isinstance(g_or_gs, Graph):
        if at is None:
            gs = g_or_gs.now()
        elif isinstance(at, GraphSlice):
            gs = at
        else:
            gs = GraphSlice(g_or_gs, at)
    else:
        raise TypeError(f"expected Graph/GraphSlice, got {g_or_gs!r}")
    fid = _find_fn_entity(gs, label)
    if fid is None:
        raise KeyError(f"no stored function labelled {label!r} "
                       f"in this frame")
    node_set = gs | _pipe_all(ET.ZefFunction)
    one = node_set.df.where(F.col("id") == fid)
    src_rows = (node_set.__class__(node_set.frame, one)
                .field(SRC_RT).collect())
    if not src_rows or src_rows[0][1] is None:
        raise KeyError(f"function {label!r} has no source in this frame")
    return compile_source(src_rows[0][1])


def func_versions(g, label: str):
    """DataFrame of (assigned_at_tx, source) — the full version
    history of a labelled function, oldest first."""
    fid = _find_fn_entity(g.now(), label)
    if fid is None:
        raise KeyError(f"no stored function labelled {label!r}")
    e = g.edges.where((F.col("rt") == SRC_RT) &
                      (F.col("src_id") == fid)) \
        .select(F.col("dst_id").alias("ae_id"))
    return (g.attr_values.join(e, "ae_id", "left_semi")
            .select("assigned_at_tx",
                    F.col("value_str").alias("source"))
            .orderBy("assigned_at_tx"))


class GraphBox:
    """Mutable holder so the decorator form can thread the functional
    transact (graphs are immutable values here; the reference mutates
    a live graph in place)."""

    def __init__(self, graph):
        self.graph = graph


def zef_fn(box: GraphBox, label: str | None = None):
    """``@zef_fn(box)`` — the decorator form of store_func: persists
    the function on box.graph (advancing it) and returns a chainable
    op whose execution COMPILES FROM THE GRAPH (so what runs is what
    is stored, reference semantics), registered for every kind."""

    def deco(fn):
        name = label or fn.__name__
        box.graph, _fid = store_func(box.graph, fn, label=name)

        def run(v, *args):
            stored = load_func(box.graph, name)
            return stored(v, *args)

        OP_REGISTRY.setdefault(name, {})["any"] = run
        return ZefOp(((name, ()),))

    return deco
