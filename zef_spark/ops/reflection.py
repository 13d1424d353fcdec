"""Reflection / docs / dev-UX ops (SURVEY §2.J tail).

Reference parity: ``docstring`` (ITF:7085), ``source_code``
(ITF:7119), ``examples`` (ITF:9485), ``yo`` (graph/RAE info dump,
ITF:7000-ish), ``graphviz``/``text_art`` render the delegate graph,
``parse`` (ITF:9984, Lark grammar → FlatGraph; lark is absent in this
environment so the op is import-gated).

All driver-local: these inspect registered implementations or run
tiny summary queries — nothing here is a data-path op.
"""

from __future__ import annotations

import inspect

from pyspark.sql import functions as F

from .core import OP_REGISTRY, ZefOp, register_op


def _impls_of(op: ZefOp):
    name = op.ops[-1][0] if op.ops else None
    return name, OP_REGISTRY.get(name, {})


@register_op("docstring", "any")
def _docstring(x) -> str:
    """ITF:7085 — documentation for an op (all registered kinds) or
    any other object."""
    if isinstance(x, ZefOp):
        name, impls = _impls_of(x)
        parts = [f"zefop: {name}"]
        for kind, fn in impls.items():
            doc = inspect.getdoc(fn) or "(no docstring)"
            parts.append(f"[{kind}] {doc}")
        return "\n\n".join(parts)
    return inspect.getdoc(x) or "(no docstring)"


@register_op("source_code", "any")
def _source_code(x) -> str:
    """ITF:7119 — source of every kind-implementation of an op."""
    if isinstance(x, ZefOp):
        _, impls = _impls_of(x)
        return "\n\n".join(inspect.getsource(fn)
                           for fn in impls.values())
    return inspect.getsource(x)


@register_op("examples", "any")
def _examples(x) -> list:
    """ITF:9485 — the '>>>' example lines from the docstrings."""
    doc = _docstring(x)
    out, cur = [], []
    for line in doc.splitlines():
        s = line.strip()
        if s.startswith((">>>", "...")):
            cur.append(s[3:].strip())
        elif cur:
            out.append("\n".join(cur))
            cur = []
    if cur:
        out.append("\n".join(cur))
    return out


def _graph_summary_rows(v):
    from ..graph.graph import Graph, GraphSlice
    g = v.graph if isinstance(v, GraphSlice) else v
    gs = v if isinstance(v, GraphSlice) else g.now()
    ets = (gs.nodes().groupBy("et").count()
           .orderBy(F.col("count").desc()).collect())
    rts = (gs.edges().groupBy("rt").count()
           .orderBy(F.col("count").desc()).collect())
    return gs, ets, rts


@register_op("yo", "any")
def _yo(v) -> str:
    """The reference's info dump: per-delegate instance counts for a
    Graph/GraphSlice (one pruned aggregation per table); docstring
    for ops / everything else."""
    from ..graph.graph import Graph, GraphSlice
    if isinstance(v, (Graph, GraphSlice)):
        gs, ets, rts = _graph_summary_rows(v)
        lines = [f"<Graph slice at tx={gs.tx}>", "", "Atoms:"]
        lines += [f"  {r['et']:<24} {r['count']:>8}" for r in ets]
        lines += ["", "Relations:"]
        lines += [f"  {r['rt']:<24} {r['count']:>8}" for r in rts]
        return "\n".join(lines)
    return _docstring(v)


@register_op("graphviz", "any")
def _graphviz(v) -> str:
    """DOT source of the delegate (schema) graph — distinct
    (src_et, rt, dst_et) triples, set-derived like `blueprint`."""
    from ..graph.graph import Graph, GraphSlice
    from ..graph.ops import _blueprint
    if not isinstance(v, (Graph, GraphSlice)):
        raise TypeError("graphviz renders Graph/GraphSlice")
    tri = _blueprint(v).collect()
    lines = ["digraph zef {", "  rankdir=LR;",
             '  node [shape=box, fontname="monospace"];']
    for r in tri:
        lines.append(f'  "{r[0]}" -> "{r[2]}" [label="{r[1]}"];')
    lines.append("}")
    return "\n".join(lines)


@register_op("text_art", "any")
def _text_art(v) -> str:
    """ASCII rendering of the delegate graph (dev UX)."""
    from ..graph.graph import Graph, GraphSlice
    if not isinstance(v, (Graph, GraphSlice)):
        return str(v)
    from ..graph.ops import _blueprint
    tri = sorted((r[0], r[1], r[2]) for r in _blueprint(v).collect())
    width = max((len(t[0]) for t in tri), default=0)
    return "\n".join(f"{s:<{width}} --{rt}--> {d}" for s, rt, d in tri)


@register_op("parse", "local")
def _parse(data: str, grammar: str):
    """ITF:9984 — parse a string by a Lark grammar into a FlatGraph
    (node per tree node, Child edges). Import-gated: lark is not in
    this environment."""
    try:
        import lark
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "parse needs the 'lark' package (not in this "
            "environment); the FlatGraph construction below is ready "
            "once it is installed") from e
    from ..flat_graph import FlatGraph
    from ..tokens import ET, RT

    parser = lark.Lark(grammar)
    tree = parser.parse(data)
    fg = FlatGraph()
    counter = [0]

    # recursive build (FlatGraph is persistent — rebind per insert)
    def build(node):
        nonlocal fg
        key = f"n{counter[0]}"
        counter[0] += 1
        if isinstance(node, lark.Token):
            fg, _ = fg._insert_entity(ET(node.type), key,
                                      {"value": str(node)})
            return key
        name = node.data if isinstance(node.data, str) else node.data.value
        fg, _ = fg._insert_entity(ET(name), key, {})
        for c in node.children:
            ck = build(c)
            fg = fg.insert_relation(key, RT.Child, ck)
        return key

    build(tree)
    return fg


@register_op("plan_report", "df")
def _plan_report(df) -> dict:
    """Scale-hygiene X-ray of a DataFrame's physical plan: shuffle /
    broadcast / scan counts, pushed parquet filters, read schema
    width, whole-stage-codegen coverage, and the nested-loop red
    flags. The same checks tests/test_plan_quality.py enforces on the
    driver queries, exposed as an op so users can audit their OWN
    chains (`df | z.plan_report`). Driver-side inspection only — the
    plan is not executed."""
    import re
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schema = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "shuffle_exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcast_exchanges": plan.count(
            "Exchange HashedRelationBroadcastMode"),
        "scans": plan.count("Scan "),
        "joins": {
            "broadcast_hash": plan.count("BroadcastHashJoin"),
            "sort_merge": plan.count("SortMergeJoin"),
            "nested_loop": plan.count("BroadcastNestedLoopJoin")
            + plan.count("CartesianProduct"),
        },
        "pushed_filters": [p for p in pushed if p],
        "read_columns": sorted({c.split(":")[0]
                                for s in read_schema
                                for c in s.split(",") if c}),
        "wholestage_codegen_spans": plan.count("WholeStageCodegen"),
        "aqe": "AdaptiveSparkPlan" in plan,
        "warnings": (["NESTED LOOP JOIN — unusable at scale"]
                     if ("BroadcastNestedLoopJoin" in plan
                         or "CartesianProduct" in plan) else []),
    }
