"""Registry completion: chainable forms for the remaining reference
dispatch-dictionary ops (dispatch_dictionary.py:25-342) whose logic
already exists as plain functions here (sources, plumbing, fx), plus
the small introspection / conversion ops.  Everything registers into
OP_REGISTRY so ``zef_spark.ops`` exposes the full reference surface.

Environment-gated ops (clipboard, zstandard) register with a clear
error instead of being absent — chain construction still works, the
terminal raises only when actually evaluated without the capability.
"""

from __future__ import annotations

import inspect
from types import SimpleNamespace

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import OP_REGISTRY, ZefOp, register_op


def _spark() -> SparkSession:
    s = SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError("no active SparkSession")
    return s


# --------------------------------------------------------------- sources

@register_op("from_csv", "local")
def _from_csv(path, **opts):
    from .. import sources
    return sources.from_csv(_spark(), path, **opts)


@register_op("to_csv", "df")
def _to_csv(df, path, **opts):
    from .. import sources
    sources.to_csv(df, path, **opts)
    return path


@register_op("load_file", "local")
def _load_file(path, **opts):
    from .. import sources
    return sources.load_file(_spark(), path, **opts)


@register_op("save_file", "df")
def _save_file(df, path, **opts):
    from .. import sources
    sources.save_file(df, path, **opts)
    return path


@register_op("read_file", "local")
def _read_file(path):
    from .. import sources
    return sources.read_file(path)


@register_op("write_file", "local")
def _write_file(content, path):
    from .. import sources
    return sources.write_file(content, path)


for _name in ("to_yaml", "from_yaml", "to_toml", "from_toml"):
    def _mk(name):
        def _op(value):
            from .. import sources
            return getattr(sources, name)(value)
        return _op
    register_op(_name, "local")(_mk(_name))


@register_op("serialize", "any")
def _serialize(v):
    """serialization.py serialize — typed JSON (tokens, FlatGraphs,
    DataFrames revive on deserialize)."""
    from .. import sources
    return sources.to_json(v)


@register_op("deserialize", "local")
def _deserialize(s):
    from .. import sources
    return sources.from_json(s)


@register_op("pandas_to_gd", "local")
def _pandas_to_gd(pdf, et, key_col):
    from .. import sources
    return sources.pandas_to_gd(pdf, et, key_col)


# ------------------------------------------------------------- plumbing

@register_op("function", "local")
def _function(fn):
    """RT.Function — wrap a plain callable as a chainable zef
    function (the @func decorator as an op)."""
    from .plumbing import func
    return func(fn)


@register_op("peel", "local")
def _peel_op(op):
    from .plumbing import peel
    return peel(op)


@register_op("absorbed", "local")
def _absorbed_op(op):
    from .plumbing import absorbed
    return absorbed(op)


@register_op("without_absorbed", "local")
def _without_absorbed_op(op):
    from .plumbing import without_absorbed
    return without_absorbed(op)


@register_op("to_pipeline", "local")
def _to_pipeline_op(ops_list):
    from .plumbing import to_pipeline
    return to_pipeline(ops_list)


# ------------------------------------------------- effects: make_request

@register_op("make_request", "local")
def _make_request(url, method: str = "GET", data=None, headers=None):
    """ITF make_request: build an HTTPRequest *effect* (a plain dict);
    nothing happens until ``| run`` dispatches it (fx quarantine)."""
    return {"type": "fx.http_request", "url": url, "method": method,
            "data": data, "headers": headers or {}}


# ----------------------------------------------------- op introspection

def _op_obj(v) -> str:
    if isinstance(v, ZefOp):
        return v.ops[-1][0]
    return str(v)


@register_op("operates_on", "local")
def _operates_on(op):
    """Which value kinds an op dispatches on (reference: operates_on
    returns the VTs an op accepts)."""
    return sorted(OP_REGISTRY.get(_op_obj(op), {}))


@register_op("related_ops", "local")
def _related_ops(op):
    """Ops implemented in the same module — the reference groups
    related ops by implementation site too."""
    impls = OP_REGISTRY.get(_op_obj(op), {})
    mods = {fn.__module__ for fn in impls.values()}
    return sorted(n for n, kinds in OP_REGISTRY.items()
                  if n != _op_obj(op)
                  and any(f.__module__ in mods for f in kinds.values()))


@register_op("used_for", "local")
def _used_for(op):
    """First docstring line of the op's implementation(s)."""
    for fn in OP_REGISTRY.get(_op_obj(op), {}).values():
        if fn.__doc__:
            return fn.__doc__.strip().splitlines()[0]
    return ""


@register_op("signature", "local")
def _signature(op):
    return {kind: str(inspect.signature(fn))
            for kind, fn in OP_REGISTRY.get(_op_obj(op), {}).items()}


# ------------------------------------------------- small conversions

@register_op("alias", "any")
def _alias(v, name):
    if isinstance(v, (DataFrame, Column)):
        return v.alias(name)
    return {name: v}


@register_op("round", "any")
def _round(v, ndigits=0):
    if isinstance(v, DataFrame):
        # round every float column (set-oriented form)
        return v.select(*[
            F.round(c, ndigits).alias(c) if t in ("double", "float")
            else F.col(c) for c, t in v.dtypes])
    if isinstance(v, Column):
        return F.round(v, ndigits)
    return round(v, ndigits)


@register_op("slice", "any")
def _slice(v, start, end=None, step=1):
    """List/str slice; DataFrame form = offset+limit over the
    current order (use after sort — mirrors reference slice on
    ordered streams)."""
    if isinstance(v, DataFrame):
        if end is None:
            return v.offset(start)
        return v.offset(start).limit(end - start)
    if end is None:
        return v[start::step]
    return v[start:end:step]


@register_op("token_name", "local")
def _token_name(tok):
    return getattr(tok, "name", str(tok).split(".")[-1])


@register_op("unpack", "local")
def _unpack(seq, fn):
    """(a, b) | unpack[f] == f(a, b) (ITF unpack)."""
    if isinstance(seq, dict):
        return fn(**seq)
    return fn(*seq)


@register_op("to_object", "local")
def _to_object(v):
    """Dict/Row → attribute-access object (recursive)."""
    from pyspark.sql import Row
    if isinstance(v, Row):
        v = v.asDict(recursive=True)
    if isinstance(v, dict):
        return SimpleNamespace(**{k: _to_object(x) for k, x in v.items()})
    if isinstance(v, (list, tuple)):
        return type(v)(_to_object(x) for x in v)
    return v


@register_op("to_flat_graph", "local")
def _to_flat_graph(wishes):
    """List of wishes / triples → FlatGraph (flatgraph insert)."""
    from ..flat_graph import FlatGraph
    fg = FlatGraph()
    for w in wishes:
        fg = fg.insert(*w) if isinstance(w, tuple) else fg.insert(w)
    return fg


@register_op("to_ezefref", "graph")
def _to_ezefref(v):
    """Frame-discarding view (EZefRef analogue): same rows, eternal
    (no time-slice filter) — delegates to discard_frame."""
    return OP_REGISTRY["discard_frame"]["graph"](v)


@register_op("tags", "graph")
def _tags(v):
    """Graph → its tag table (name, target_id, validity interval);
    empty list when never tagged."""
    from ..graph.graph import Graph
    if isinstance(v, Graph) and v.tags is not None:
        return v.tags
    if isinstance(v, Graph):
        return []
    raise TypeError("tags expects a Graph")


# ----------------------------------------------------- type predicates

@register_op("is_blueprint_atom", "local")
def _is_blueprint_atom(v):
    """True for schema-level atoms: raw ET/RT/AET tokens (not
    instances) — the blueprint's vocabulary."""
    from ..tokens import Token
    return isinstance(v, Token)


@register_op("is_zefref_promotable", "local")
def _is_zefref_promotable(v):
    """True when a value can be promoted to a graph-frame reference:
    anything carrying (id, frame) or a node-set row."""
    from ..graph.graph import NodeSet, EdgeSet, GraphSlice
    return isinstance(v, (NodeSet, EdgeSet, GraphSlice))


# -------------------------------------------------------- zascii subset

def _zascii_edges(text: str):
    """Parse the single-line arrow subset of zascii:
    ``(a)-[R]->(b)`` per line (the reference's 2-D ASCII layout
    engine is out of scope — documented deviation)."""
    import re
    edges = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = re.match(r"\((\w+)\)\s*-\[(\w+)\]->\s*\((\w+)\)", line)
        if not m:
            raise ValueError(f"zascii subset: expected '(a)-[R]->(b)', "
                             f"got {line!r}")
        edges.append(m.groups())
    return edges


@register_op("zascii_to_flat_graph", "local")
def _zascii_to_flat_graph(text):
    from ..flat_graph import FlatGraph
    from ..tokens import ET, RT
    fg = FlatGraph()
    seen = set()
    for s, r, d in _zascii_edges(text):
        for k in (s, d):
            if k not in seen:
                fg = fg.insert_entity(getattr(ET, "ZasciiNode"), k)
                seen.add(k)
        fg = fg.insert_relation(s, getattr(RT, r), d)
    return fg


@register_op("zascii_to_asg", "local")
def _zascii_to_asg(text):
    """Abstract semantic graph form: plain edge triples."""
    return _zascii_edges(text)


@register_op("zascii_to_blueprint_fg", "local")
def _zascii_to_blueprint_fg(text):
    """Blueprint form: distinct (src_type, rt, dst_type) vocabulary
    of the diagram."""
    return sorted({("ZasciiNode", r, "ZasciiNode")
                   for _, r, _d in _zascii_edges(text)})


# --------------------------------------------------- env-gated effects

@register_op("zstandard_compress", "local")
def _zstd_c(data):
    try:
        import zstandard
    except ImportError as ex:
        raise EnvironmentError("zstandard not installed") from ex
    if isinstance(data, str):
        data = data.encode()
    return zstandard.ZstdCompressor().compress(data)


@register_op("zstandard_decompress", "local")
def _zstd_d(data):
    try:
        import zstandard
    except ImportError as ex:
        raise EnvironmentError("zstandard not installed") from ex
    return zstandard.ZstdDecompressor().decompress(data)


@register_op("to_clipboard", "local")
def _to_clipboard(v):
    raise EnvironmentError("no clipboard in this environment "
                           "(headless container)")


@register_op("from_clipboard", "local")
def _from_clipboard(_v=None):
    raise EnvironmentError("no clipboard in this environment "
                           "(headless container)")
