"""Scalar math + string ops missing from the first op layer pass
(SURVEY §2.H): curryable chain ops with dual local/Column dispatch.

Reference parity (ITF lines cited per op): add/subtract/multiply/
divide (:2765/2797/2831/2864 — divide with no arg = halve), modulo
(:6085), power/exponential/logarithm (:2954/2979/3005), floor/ceil/
round (:8241/8265/8290), sign (:4165), clamp (:3158); string
split_at/split_left/split_right (:10227/4758/4803), replace_at
(:8186), splice (:9937), indexes_of (:9777), is_alpha/is_numeric/
is_alpha_numeric (:8468/8495/8522), take_while_pair (:3885).

Column ("df"-kind) forms operate on a named column:
``df | add["x", 3]`` appends no column — they return Column exprs via
``functions``; the chain forms here are the *local* semantics. The
distributed path is ``zef_spark.functions`` (pure Column helpers kept
inside whole-stage codegen).
"""

from __future__ import annotations

import math

from .core import register_op


def _local_math(name, fn):
    @register_op(name, "local")
    def _op(v, *args):
        return fn(v, *args)
    return _op


_local_math("add", lambda v, x: v + x)
_local_math("subtract", lambda v, x: v - x)
_local_math("multiply", lambda v, x: v * x)
_local_math("divide", lambda v, x=2: v / x)          # 1-arg = halve
_local_math("modulo", lambda v, x: v % x)
_local_math("power", lambda v, x: v ** x)
_local_math("exponential", lambda v: math.exp(v))
_local_math("logarithm", lambda v, base=math.e: math.log(v, base))
_local_math("floor", lambda v: math.floor(v))
_local_math("ceil", lambda v: math.ceil(v))
_local_math("round_to", lambda v, nd=0: round(v, nd))
_local_math("sign", lambda v: (v > 0) - (v < 0))
_local_math("clamp", lambda v, lo, hi: max(lo, min(hi, v)))


@register_op("split_at", "local")
def _split_at(v, i):
    """ITF:10227 — (prefix, suffix) at index; works on str + list."""
    return (v[:i], v[i:])


@register_op("split_left", "local")
def _split_left(v, sep, n=1):
    """ITF:4758 — split keeping at most n splits from the left."""
    return v.split(sep, n)


@register_op("split_right", "local")
def _split_right(v, sep, n=1):
    return v.rsplit(sep, n)


@register_op("replace_at", "local")
def _replace_at(v, i, new):
    """ITF:8186 — replace element/char at index."""
    if isinstance(v, str):
        return v[:i] + new + v[i + 1:]
    out = list(v)
    out[i] = new
    return type(v)(out) if not isinstance(v, list) else out


@register_op("splice", "local")
def _splice(v, start, delete_count, *items):
    """ITF:9937 — remove delete_count at start, insert items."""
    if isinstance(v, str):
        return v[:start] + "".join(items) + v[start + delete_count:]
    return list(v[:start]) + list(items) + list(v[start + delete_count:])


@register_op("indexes_of", "local")
def _indexes_of(v, pred_or_val):
    """ITF:9777 — all positions matching a value/VT/predicate."""
    from ..vt import ValueType
    if isinstance(pred_or_val, ValueType):
        test = pred_or_val.is_a
    elif callable(pred_or_val):
        test = pred_or_val
    else:
        test = lambda x: x == pred_or_val  # noqa: E731
    return [i for i, x in enumerate(v) if test(x)]


@register_op("is_alpha", "local")
def _is_alpha(v):
    return isinstance(v, str) and v.isalpha()


@register_op("is_numeric", "local")
def _is_numeric(v):
    return isinstance(v, str) and v.isnumeric()


@register_op("is_alpha_numeric", "local")
def _is_alpha_numeric(v):
    return isinstance(v, str) and v.isalnum()


@register_op("take_while_pair", "local")
def _take_while_pair(v, pred):
    """ITF:3885 — take while predicate over consecutive pairs holds;
    the first element is always taken."""
    out = list(v[:1])
    for a, b in zip(v, v[1:]):
        if not pred(a, b):
            break
        out.append(b)
    return out


@register_op("split_on_next", "local")
def _split_on_next(v, marker):
    """ITF:9440 — segment a sequence on marker elements (stream form
    lives in streaming/; this is the bounded-list semantics)."""
    segments, cur = [], []
    for x in v:
        if x == marker:
            segments.append(cur)
            cur = []
        else:
            cur.append(x)
    segments.append(cur)
    return segments
