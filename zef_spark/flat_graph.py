"""FlatGraph: immutable, value-semantics, in-memory mini-graph.

Reference parity: python/zef/core/flat_graph.py:24-37 — a FlatGraph is
a tuple of blobs ``(index, raet, edge_list(signed ints),
origin_uid?)`` plus a ``key_dict``; it is built and queried with the
same operator surface as DB graphs (op impls in
op_implementations/flatgraph_implementations.py). Here the same idea
as frozen tuples of typed rows; the ZefOp surface dispatches on the
``_zef_flat_kind`` marker (ops/core._kind_of), and ``to_spark_graph``
lifts a FlatGraph into the DataFrame-backed bitemporal Graph when
distributed evaluation is wanted.

Spark posture: a FlatGraph is the *driver-local collection* analogue
of a Graph — intentionally not distributed. Anything ≥ memory-size
belongs in Graph (graph/graph.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

from .tokens import Token


@dataclass(frozen=True)
class FlatNode:
    idx: int
    raet: str            # "ET.X" | "AET.<VRT>"
    value: Any = None    # AET payload
    origin_uid: str | None = None


@dataclass(frozen=True)
class FlatEdge:
    idx: int
    rt: str
    src: int
    dst: int


def _raet_name(x) -> str:
    return str(x)  # Token.__str__ is "ET.Person" / "RT.Owns"


@dataclass(frozen=True)
class FlatGraph:
    _zef_flat_kind = True

    nodes: tuple = ()
    edges: tuple = ()
    key_dict: Any = field(default_factory=lambda: frozenset())  # frozenset of (k, idx)

    # -- construction (pure: every insert returns a new graph) --------

    def _next_idx(self) -> int:
        return 1 + max([n.idx for n in self.nodes]
                       + [e.idx for e in self.edges] + [0])

    def insert_entity(self, et, key: str | None = None,
                      **fields) -> "FlatGraph":
        """fg2 = fg.insert_entity(ET.Person, 'ada', age=36)"""
        g, _ = self._insert_entity(et, key, fields)
        return g

    def _insert_entity(self, et, key, fields) -> tuple["FlatGraph", int]:
        idx = self._next_idx()
        nodes = self.nodes + (FlatNode(idx, _raet_name(et)),)
        edges = self.edges
        kd = set(self.key_dict)
        if key is not None:
            kd.add((key, idx))
        nxt = idx + 1
        for fname, value in fields.items():
            nodes = nodes + (FlatNode(nxt, f"AET.{type(value).__name__}",
                                      value),)
            edges = edges + (FlatEdge(nxt + 1, str(fname), idx, nxt),)
            nxt += 2
        return FlatGraph(nodes, edges, frozenset(kd)), idx

    def insert_relation(self, src, rt, dst) -> "FlatGraph":
        """src/dst: key names or indices. Triple form ``(a, RT.R, b)``."""
        s, d = self._resolve(src), self._resolve(dst)
        idx = self._next_idx()
        return replace(self, edges=self.edges +
                       (FlatEdge(idx, _raet_name(rt).split(".")[-1], s, d),))

    def insert(self, *wish) -> "FlatGraph":
        """Wish forms (flatgraph_implementations.py insert): a token
        ``ET.X``, or a triple ``(src, RT.R, dst)``."""
        if len(wish) == 1 and isinstance(wish[0], tuple):
            s, rt, d = wish[0]
            return self.insert_relation(s, rt, d)
        if len(wish) == 1:
            return self.insert_entity(wish[0])
        if len(wish) == 3:
            return self.insert_relation(*wish)
        raise TypeError(f"unsupported insert wish: {wish!r}")

    # -- lookup --------------------------------------------------------

    def _resolve(self, ref) -> int:
        if isinstance(ref, int):
            return ref
        if isinstance(ref, FlatNode):
            return ref.idx
        for k, idx in self.key_dict:
            if k == ref:
                return idx
        raise KeyError(f"unknown FlatGraph key {ref!r}")

    def __getitem__(self, key) -> FlatNode:
        idx = self._resolve(key)
        for n in self.nodes:
            if n.idx == idx:
                return n
        raise KeyError(key)

    def all(self, raet=None) -> list[FlatNode]:
        if raet is None:
            return list(self.nodes)
        name = _raet_name(raet)
        return [n for n in self.nodes if n.raet == name]

    def outs(self, ref, rt=None) -> list[FlatNode]:
        idx = self._resolve(ref)
        rt_name = None if rt is None else _raet_name(rt).split(".")[-1]
        dsts = [e.dst for e in self.edges
                if e.src == idx and (rt_name is None or e.rt == rt_name)]
        return [self[d] for d in dsts]

    def ins(self, ref, rt=None) -> list[FlatNode]:
        idx = self._resolve(ref)
        rt_name = None if rt is None else _raet_name(rt).split(".")[-1]
        srcs = [e.src for e in self.edges
                if e.dst == idx and (rt_name is None or e.rt == rt_name)]
        return [self[s] for s in srcs]

    def value(self, ref):
        return self[ref].value

    def field(self, ref, fname: str):
        """Entity field read: traverse fname edge then value."""
        targets = self.outs(ref, fname)
        if len(targets) != 1:
            raise ValueError(
                f"expected exactly one '{fname}' field, got {len(targets)}")
        return targets[0].value

    # -- interop -------------------------------------------------------

    def to_rows(self) -> tuple[list, list]:
        """(node rows, edge rows) — plain tuples for DataFrame lift."""
        nrows = [(n.idx, n.raet, n.value if isinstance(n.value, str)
                  else (None if n.value is None else repr(n.value)))
                 for n in self.nodes]
        erows = [(e.idx, e.rt, e.src, e.dst) for e in self.edges]
        return nrows, erows

    @staticmethod
    def from_rows(nodes, edges, keys) -> "FlatGraph":
        """Inverse of the serialization row form (sources._jsonable):
        rebuild from [idx, raet, value, origin_uid] / [idx, rt, src,
        dst] rows — deserialize(serialize(fg)) == fg."""
        return FlatGraph(
            tuple(FlatNode(i, r, v, u) for i, r, v, u in nodes),
            tuple(FlatEdge(i, r, s, d) for i, r, s, d in edges),
            frozenset((k, idx) for k, idx in keys))

    def to_spark_graph(self, spark):
        """Lift into a bitemporal Graph via the write path (delta
        transact), preserving keys as receipt names."""
        from .graph.delta import E, R, empty_graph, transact
        key_of = {idx: k for k, idx in self.key_dict}
        wishes = []
        ent_fields: dict[int, dict] = {}
        ae_dsts = {e.dst: (e.src, e.rt) for e in self.edges
                   if self[e.dst].raet.startswith("AET.")}
        for n in self.nodes:
            if n.raet.startswith("AET."):
                owner, fname = ae_dsts.get(n.idx, (None, None))
                if owner is not None:
                    ent_fields.setdefault(owner, {})[fname] = n.value
        for n in self.nodes:
            if not n.raet.startswith("AET."):
                wishes.append(E(Token("ET", n.raet.split(".", 1)[-1]),
                                name=key_of.get(n.idx, f"__fg_{n.idx}"),
                                fields=ent_fields.get(n.idx, {})))
        for e in self.edges:
            if not self[e.dst].raet.startswith("AET."):
                wishes.append(R(key_of.get(e.src, f"__fg_{e.src}"),
                                Token("RT", e.rt),
                                key_of.get(e.dst, f"__fg_{e.dst}")))
        g, receipt = transact(empty_graph(spark), wishes)
        return g, receipt


@dataclass(frozen=True)
class FlatRef:
    """(graph, node) handle — the FlatGraph analogue of a ZefRef."""
    _zef_flat_kind = True
    fg: FlatGraph
    idx: int

    @property
    def node(self) -> FlatNode:
        return self.fg[self.idx]

    @property
    def value(self):
        return self.node.value


def ref(fg: FlatGraph, key) -> FlatRef:
    return FlatRef(fg, fg._resolve(key))


# -- ZefOp surface (kind "flat"): same verbs as DB graphs ------------

from .ops.core import register_op  # noqa: E402


@register_op("all", "flat")
def _fg_all(fg, raet=None):
    return [FlatRef(fg, n.idx) for n in fg.all(raet)]


@register_op("insert", "flat")
def _fg_insert(fg, *wish):
    return fg.insert(*wish)


@register_op("Outs", "flat")
def _fg_outs(r: FlatRef, rt=None):
    return [FlatRef(r.fg, n.idx) for n in r.fg.outs(r.idx, rt)]


@register_op("Ins", "flat")
def _fg_ins(r: FlatRef, rt=None):
    return [FlatRef(r.fg, n.idx) for n in r.fg.ins(r.idx, rt)]


@register_op("value", "flat")
def _fg_value(r: FlatRef):
    return r.fg.value(r.idx)


@register_op("field", "flat")
def _fg_field(r: FlatRef, fname):
    name = fname.name if isinstance(fname, Token) else str(fname)
    return r.fg.field(r.idx, name)
