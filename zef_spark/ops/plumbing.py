"""UDF surface + pipeline plumbing (SURVEY §2.M).

Reference parity: the ``@func`` decorator turns any Python function
into a chainable, curryable ZefOp (python/zef/core/zef_functions.py:
100-268); ``register_zefop`` (_ops.py:22-33) is ops.core.register_op.
Plumbing ops: inject/inject_list (ITF:7898/7924), reverse_args
(ITF:1526), to_pipeline (ITF:7869), bypass (ITF:4262), attempt
(ITF:4222, already in local_ops), peel/absorbed/without_absorbed
(ITF:506/2605/2653).

Distributed note: a @func of Columns composes into Catalyst plans
JVM-side; a @func of Python values runs driver-side (chain on local
collections) — for executor-side row work use functions in
pyspark.sql.functions or pandas_udf, as SURVEY §2.M maps.
"""

from __future__ import annotations

from .core import OP_REGISTRY, ZefOp, register_op


def func(fn):
    """@func — the zef-function decorator: ``@func def double(x): ...``
    then ``5 | double`` or ``5 | double[extra_arg]``. Registered under
    the function's name for every kind (the function decides what it
    accepts, as in the reference)."""
    name = fn.__name__
    OP_REGISTRY.setdefault(name, {})["any"] = \
        lambda v, *args: fn(v, *args)
    return ZefOp(((name, ()),))  # (ZefOp is __slots__; no doc attach)


@register_op("inject", "any")
def _inject(v, fn, *args):
    """ITF:7898 — dataflow value becomes the FIRST arg of fn, curried
    args follow: ``5 | inject[f][a, b]`` = f(5, a, b)."""
    return fn(v, *args)


@register_op("inject_list", "any")
def _inject_list(v, fn):
    """ITF:7924 — unpack the flowing list as fn's argument list."""
    return fn(*v)


@register_op("reverse_args", "any")
def _reverse_args(v, fn, *args):
    """ITF:1526 — apply fn with curried args BEFORE the flowing value:
    ``2 | reverse_args[pow][10]`` = pow(10, 2) = 100."""
    return fn(*args, v)


@register_op("bypass", "any")
def _bypass(v, op, *args):
    """ITF:4262 — apply op/fn; on exception pass the value through
    unchanged (error fallback combinator)."""
    try:
        if isinstance(op, ZefOp):
            return op(v)
        return op(v, *args)
    except Exception:
        return v


def to_pipeline(ops_list) -> ZefOp:
    """ITF:7869 — a list of ops → one composed op."""
    steps: tuple = ()
    for op in ops_list:
        if not isinstance(op, ZefOp):
            raise TypeError(f"to_pipeline needs ZefOps, got {type(op)}")
        steps += op.ops
    return ZefOp(steps)


def peel(op: ZefOp) -> list:
    """ITF:506 — decompose a chain into its (name, args) steps."""
    return [(n, list(a)) for n, a in op.ops]


def absorbed(op: ZefOp) -> list:
    """ITF:2605 — the curried args of the LAST step."""
    return list(op.ops[-1][1]) if op.ops else []


def without_absorbed(op: ZefOp) -> ZefOp:
    """ITF:2653 — the chain with the last step's curried args removed."""
    if not op.ops:
        return op
    name, _ = op.ops[-1]
    return ZefOp(op.ops[:-1] + ((name, ()),))
