"""Graph-kind op registrations: wire the ZefOp surface (all, Out/Outs,
In/Ins, value/field, time_travel, ...) onto Graph/GraphSlice/NodeSet.

These are thin: the heavy lifting (join construction) lives on the
handle classes in graph.py; each chain step extends ONE lazy DataFrame
plan, so `g | now | all[ET.X] | Outs[RT.R] | fields[...] | collect`
compiles to a single Catalyst-optimized multi-join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ops.core import register_op, to_column_predicate
from .graph import EdgeSet, Graph, GraphSlice, NodeSet


def _expect(value, *types):
    if not isinstance(value, types):
        raise TypeError(
            f"op not applicable to {type(value).__name__}")
    return value


@register_op("now", "graph")
def _now(g):
    return _expect(g, Graph).now()


@register_op("at", "graph")
def _at(g, tx_or_time):
    return _expect(g, Graph).at(tx_or_time)


@register_op("all", "graph")
def _all(v, vt=None):
    if isinstance(v, Graph):
        v = v.now()
    return _expect(v, GraphSlice).all(vt)


@register_op("time_travel", "graph")
def _time_travel(v, delta):
    return _expect(v, GraphSlice).time_travel(delta)


@register_op("time", "graph")
def _time(v):
    return _expect(v, GraphSlice).time()


@register_op("Outs", "graph")
def _outs(v, rt=None):
    return _expect(v, NodeSet).Outs(rt)


@register_op("Out", "graph")
def _out(v, rt=None):
    """Strict-single semantics (ITF:6288) relaxed to Outs for plan
    building; use `single` downstream for the exactly-one assertion."""
    return _expect(v, NodeSet).Outs(rt)


@register_op("Ins", "graph")
def _ins(v, rt=None):
    return _expect(v, NodeSet).Ins(rt)


@register_op("In", "graph")
def _in(v, rt=None):
    return _expect(v, NodeSet).Ins(rt)


@register_op("out_rels", "graph")
def _out_rels(v, rt=None):
    return _expect(v, NodeSet).out_rels(rt)


@register_op("in_rels", "graph")
def _in_rels(v, rt=None):
    return _expect(v, NodeSet).in_rels(rt)


@register_op("ins_and_outs", "graph")
def _ins_and_outs(v, rt=None):
    ns = _expect(v, NodeSet)
    a, b = ns.Outs(rt), ns.Ins(rt)
    return NodeSet(ns.frame, a.df.unionByName(b.df).dropDuplicates(["id"]))


@register_op("source", "graph")
def _source(v):
    return _expect(v, EdgeSet).source()


@register_op("target", "graph")
def _target(v):
    return _expect(v, EdgeSet).target()


@register_op("has_out", "graph")
def _has_out(v, rt):
    return _expect(v, NodeSet).has_out(rt)


@register_op("has_in", "graph")
def _has_in(v, rt):
    return _expect(v, NodeSet).has_in(rt)


@register_op("field", "graph")
def _field(v, rt, alias=None):
    return _expect(v, NodeSet).field(rt, alias)


@register_op("fields", "graph")
def _fields(v, *rts, **aliased):
    return _expect(v, NodeSet).fields(*rts, **aliased)


@register_op("value", "graph")
def _value(v, alias="value"):
    """NodeSet of AE nodes → (id, value) via the alive assignment."""
    ns = _expect(v, NodeSet)
    g, t = ns.frame.graph, ns.frame.tx
    av = g.attr_values.where(
        (F.col("assigned_at_tx") <= F.lit(t)) &
        (F.col("superseded_at_tx").isNull() |
         (F.col("superseded_at_tx") > F.lit(t))))
    from .schema import VALUE_COL_LIST
    joined = ns.df.select("id").join(
        av.withColumnRenamed("ae_id", "id"), "id", "inner")
    return joined.groupBy("id").agg(
        F.max_by(F.coalesce(*[F.col(c).cast("string")
                              for c in VALUE_COL_LIST]),
                 F.col("assigned_at_tx")).alias(alias))


@register_op("select_by_field", "graph")
def _select_by_field(v, rt, value):
    return _expect(v, NodeSet).select_by_field(rt, value)


@register_op("filter", "graph")
def _filter(v, pred):
    if isinstance(v, NodeSet):
        return NodeSet(v.frame, v.df.where(to_column_predicate(pred)))
    if isinstance(v, EdgeSet):
        return EdgeSet(v.frame, v.df.where(to_column_predicate(pred)))
    raise TypeError("graph filter needs a NodeSet/EdgeSet")


@register_op("gather", "graph")
def _gather(v, rts=None, direction="out", max_steps=None):
    return _expect(v, NodeSet).gather(rts, direction, max_steps)


@register_op("by_tag", "graph")
def _by_tag(v, name):
    if isinstance(v, Graph):
        v = v.now()
    return _expect(v, GraphSlice).by_tag(name)


@register_op("exists_at", "graph")
def _exists_at(v, frame):
    return _expect(v, NodeSet).exists_at(frame)


@register_op("to_frame", "graph")
def _to_frame(v, frame):
    return _expect(v, NodeSet).to_frame(frame)


@register_op("to_df", "graph")
def _to_df(v):
    return _expect(v, (NodeSet, EdgeSet)).df


@register_op("count", "graph")
def _count(v, vt=None):
    if isinstance(v, (NodeSet, EdgeSet)):
        df = v.df
        if vt is not None:
            from ..vt import _coerce
            df = df.where(_coerce(vt).to_column())
        return df.agg(F.count(F.lit(1)).alias("count"))
    raise TypeError("graph count needs a NodeSet/EdgeSet")


@register_op("length", "graph")
def _length(v):
    return _count(v)


@register_op("uid", "graph")
def _uid(v):
    return _expect(v, (NodeSet, EdgeSet)).df.select("uid")


@register_op("rae_type", "graph")
def _rae_type(v):
    ns = _expect(v, (NodeSet, EdgeSet))
    col = "et" if isinstance(ns, NodeSet) else "rt"
    return ns.df.select(F.col(col).alias("rae_type"))


@register_op("collect", "graph")
def _collect(v):
    if isinstance(v, (NodeSet, EdgeSet)):
        return [tuple(r) for r in v.df.collect()]
    if isinstance(v, GraphSlice):
        return v
    return v


@register_op("blueprint", "graph")
def _blueprint(v):
    """Schema-level summary (ITF:9225): distinct (src_et, rt, dst_et)
    triples — the delegate graph, derived not stored."""
    if isinstance(v, Graph):
        v = v.now()
    gs = _expect(v, GraphSlice)
    n = gs.nodes().select("id", "et")
    e = gs.edges()
    return (e.join(n.withColumnRenamed("id", "src_id")
                   .withColumnRenamed("et", "src_et"), "src_id")
            .join(n.withColumnRenamed("id", "dst_id")
                  .withColumnRenamed("et", "dst_et"), "dst_id")
            .select("src_et", "rt", "dst_et").distinct())


# -- delegates / type reflection (SURVEY §2.J tail) -------------------
# The reference materializes delegates as TO_DELEGATE_EDGE /
# RAE_INSTANCE_EDGE spines (blobs.h:188-219); here the delegate IS the
# type token backed by the et/rt partition — to_delegate projects to
# it, delegate_of enumerates its instances via partition pruning.

@register_op("to_delegate", "graph")
def _to_delegate(v):
    """Instance set → its delegate(s): distinct type tokens
    (ITF `to_delegate`; delegate = type-level identity)."""
    ns = _expect(v, (NodeSet, EdgeSet))
    col = "et" if isinstance(ns, NodeSet) else "rt"
    return ns.df.select(F.col(col).alias("delegate")).distinct()


@register_op("delegate_of", "graph")
def _delegate_of(v, token):
    """Delegate → its alive instances in this frame (the
    RAE_INSTANCE_EDGE traversal as a pruned scan)."""
    if isinstance(v, Graph):
        v = v.now()
    gs = _expect(v, GraphSlice)
    name = getattr(token, "name", str(token))
    if getattr(token, "kind", "ET") == "RT":
        from .graph import _alive
        return EdgeSet(gs, _alive(gs.graph.edges, gs.tx)
                       .where(F.col("rt") == name))
    return gs.all(token)


@register_op("abstract_type", "graph")
def _abstract_type(v):
    """(id, abstract_type): ET.X / AET.X / RT.X per row (reference
    `abstract_type`, rae_types.py)."""
    ns = _expect(v, (NodeSet, EdgeSet))
    if isinstance(ns, EdgeSet):
        return ns.df.select("id", F.concat(F.lit("RT."), F.col("rt"))
                            .alias("abstract_type"))
    return ns.df.select(
        "id",
        F.when(F.col("et").startswith("AET.") |
               F.col("et").startswith("RT."), F.col("et"))
        .otherwise(F.concat(F.lit("ET."), F.col("et")))
        .alias("abstract_type"))


@register_op("representation_type", "graph")
def _representation_type(v):
    """For attribute entities: the VRT that represents the value
    (AET.Float → Float); NULL for plain entities."""
    ns = _expect(v, NodeSet)
    return ns.df.select(
        "id",
        F.when(F.col("et").startswith("AET."),
               F.substring(F.col("et"), 5, 64))
        .alias("representation_type"))


@register_op("is_represented_as", "graph")
def _is_represented_as(v, vrt: str):
    """Filter an AE set to those represented by the given VRT."""
    ns = _expect(v, NodeSet)
    return NodeSet(ns.frame,
                   ns.df.where(F.col("et") == f"AET.{vrt}"))
