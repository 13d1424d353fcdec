"""ZefOp chain machinery: lazy `|` composition, `[...]` currying,
dual dispatch (Python collections vs Spark DataFrames vs graph sets).

Reference parity: the reference records op chains as flat tuples of
``(RT token, curried_args)`` and interprets them left-to-right with a
per-op dispatch dictionary (``python/zef/core/op_structs.py:331-470,
1052-1189`` and ``op_implementations/dispatch_dictionary.py:25-342``).
This engine keeps the same *surface* (chains, currying, `collect`), but
DataFrame-kind implementations only *build* a Spark logical plan —
Catalyst replaces the reference's interpreter loop entirely, so a chain
like ``all[ET.X] | filter[p] | sort | take[5]`` becomes ONE optimized
DataFrame plan, not per-op materializations.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The registry dict + decorator live in the light top-level module
# zef_spark._registry (so executor-side modules can register ops
# without importing the full ops package); re-exported here unchanged.
from .._registry import OP_REGISTRY, register_op  # noqa: F401,E402


class ZefOp:
    """An uncomputed chain of (op_name, curried_args) steps."""

    __slots__ = ("ops",)

    def __init__(self, ops: tuple = ()):  # tuple[tuple[str, tuple], ...]
        self.ops = ops

    def __getitem__(self, args) -> "ZefOp":
        if not isinstance(args, tuple):
            args = (args,)
        name, prev = self.ops[-1]
        return ZefOp(self.ops[:-1] + ((name, prev + args),))

    def __or__(self, other: "ZefOp") -> "ZefOp":
        if isinstance(other, ZefOp):
            return ZefOp(self.ops + other.ops)
        return NotImplemented

    def __iter__(self):
        # without this, iteration/`in` falls back to the legacy
        # __getitem__(0), __getitem__(1), ... protocol, which curries
        # forever instead of raising
        raise TypeError("ZefOp is not iterable — evaluate it first "
                        "(value | op, or op(value))")

    def __ror__(self, value) -> Any:
        # Apply immediately: Spark DataFrames are lazy plans already,
        # so "eager" chain application still only *builds* the plan;
        # `collect` remains the materializing terminal. (Local list
        # ops apply directly — same observable semantics as the
        # reference's evaluate-at-collect, minus deferred errors.)
        return evaluate(value, self.ops)

    def __call__(self, value):
        return evaluate(value, self.ops)

    def __repr__(self):
        return " | ".join(
            n + (repr(list(a)) if a else "") for n, a in self.ops)


class LazyValue:
    """Explicitly deferred chain (mirrors reference LazyValue,
    op_structs.py:916-1018): ``LazyValue(x) | op | ...`` records ops
    and only runs at `.evaluate()` or a terminal op."""

    __slots__ = ("initial", "ops")

    def __init__(self, initial, ops: tuple = ()):
        self.initial = initial
        self.ops = ops

    def __or__(self, op) -> Any:
        if not isinstance(op, ZefOp):
            return NotImplemented
        ops = self.ops + op.ops
        if ops and ops[-1][0] in TERMINAL_OPS:
            return evaluate(self.initial, ops)
        return LazyValue(self.initial, ops)

    def evaluate(self):
        return evaluate(self.initial, self.ops)

    def __repr__(self):
        return f"LazyValue({self.initial!r} | {ZefOp(self.ops)!r})"


TERMINAL_OPS = {"collect", "for_each", "run"}


def _kind_of(value) -> str:
    if isinstance(value, DataFrame):
        return "df"
    # graph-/flat-kind values advertise themselves (avoids circular import)
    if getattr(value, "_zef_graph_kind", False):
        return "graph"
    if getattr(value, "_zef_flat_kind", False):
        return "flat"
    return "local"


def evaluate(value, ops: tuple):
    for name, args in ops:
        impls = OP_REGISTRY.get(name)
        if impls is None:
            raise NotImplementedError(f"op '{name}' is not registered")
        kind = _kind_of(value)
        impl = impls.get(kind) or impls.get("any")
        if impl is None:
            raise NotImplementedError(
                f"op '{name}' has no implementation for kind '{kind}' "
                f"(value type {type(value).__name__})")
        value = impl(value, *args)
    return value


# ---------------------------------------------------------------------------
# Predicate / key-function compilation shared by df + local impls.

class RowProxy:
    """Stands in for 'the element' in lambdas so one predicate works on
    both local dicts/objects and DataFrames: attribute access returns a
    pyspark Column. ``filter[lambda r: r.x > 3]``."""

    def __getattr__(self, name) -> Column:
        return F.col(name)

    def __getitem__(self, name) -> Column:
        return F.col(name)


ROW = RowProxy()


def to_column_predicate(pred) -> Column:
    """Compile a filter argument into a boolean Column."""
    from ..vt import ValueType
    if isinstance(pred, Column):
        return pred
    if isinstance(pred, str):
        return F.expr(pred)
    if isinstance(pred, ValueType):
        return pred.to_column()
    if callable(pred):
        out = pred(ROW)
        if isinstance(out, Column):
            return out
        raise TypeError(
            "callable predicate must return a pyspark Column when "
            "applied to the row proxy")
    raise TypeError(f"cannot compile predicate of type {type(pred)}")


def to_local_predicate(pred) -> Callable[[Any], bool]:
    from ..vt import ValueType
    if isinstance(pred, ValueType):
        return pred.is_a
    if callable(pred):
        return pred
    raise TypeError(f"cannot use {type(pred)} as a local predicate")
