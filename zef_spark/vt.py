"""VT — the runtime type algebra used for predicates and dispatch.

Reference parity: ``python/zef/core/VT/`` — primitives
(python_types.py:19-67), set combinators Union/Intersection/Complement/
Is/Where/SetOf (sets.py:115-401), membership via ``is_a`` (ITF:6975).

Spark mapping (SURVEY §1.6): every VT compiles to a boolean
``pyspark.sql.Column`` via ``to_column()`` so ``filter[VT]`` /
``all[VT]`` push straight into the scan; ``is_a`` gives the local
(driver-side python) membership test.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from .tokens import Token


class ValueType:
    name = "Any"

    def is_a(self, value) -> bool:  # local membership
        return True

    def to_column(self, col: Column | None = None) -> Column:
        return F.lit(True)

    # -- set algebra -------------------------------------------------
    def __or__(self, other):
        return Union(self, _coerce(other))

    def __and__(self, other):
        return Intersection(self, _coerce(other))

    def __invert__(self):
        return Complement(self)

    def __getitem__(self, arg):
        raise TypeError(f"{self.name} is not parameterizable")

    def __repr__(self):
        return self.name


def _coerce(x) -> "ValueType":
    if isinstance(x, ValueType):
        return x
    if isinstance(x, Token):
        return RAEType(x)
    if isinstance(x, type):  # bare python classes: str, int, ...
        prim = _PY_CLASS_MAP.get(x)
        if prim is not None:
            return prim
    raise TypeError(f"cannot treat {x!r} as a ValueType")


class _Primitive(ValueType):
    def __init__(self, name: str, py_types: tuple, col_check):
        self.name = name
        self.py_types = py_types
        self._col_check = col_check

    def is_a(self, value) -> bool:
        if self.py_types == (bool,):
            return isinstance(value, bool)
        return isinstance(value, self.py_types) and not (
            bool not in self.py_types and isinstance(value, bool))

    def to_column(self, col: Column | None = None) -> Column:
        if col is None:
            col = F.col("value")
        return self._col_check(col)


Any_ = ValueType()
Nil = _Primitive("Nil", (type(None),), lambda c: c.isNull())
Bool = _Primitive("Bool", (bool,), lambda c: c.cast("string").isin("true", "false"))
Int = _Primitive("Int", (int,), lambda c: c.cast("bigint").isNotNull())
Float = _Primitive("Float", (float,), lambda c: c.cast("double").isNotNull())
String = _Primitive("String", (str,), lambda c: c.cast("string").isNotNull())

_PY_CLASS_MAP = {type(None): Nil, bool: Bool, int: Int, float: Float,
                 str: String}


class Is(ValueType):
    """Is[predicate] — wrap a predicate as a type (sets.py:289)."""

    def __class_getitem__(cls, pred):
        return cls(pred)

    def __init__(self, pred: Callable | None = None):
        self.pred = pred

    name = "Is"

    def __getitem__(self, pred):
        return Is(pred)

    def is_a(self, value) -> bool:
        return bool(self.pred(value))

    def to_column(self, col: Column | None = None) -> Column:
        from .ops.core import to_column_predicate
        return to_column_predicate(self.pred)


class Union(ValueType):
    def __class_getitem__(cls, args):
        if not isinstance(args, tuple):
            args = (args,)
        return cls(*args)

    def __init__(self, *members):
        self.members = tuple(_coerce(m) for m in members)
        self.name = "Union[" + ", ".join(m.name for m in self.members) + "]"

    def __getitem__(self, args):
        if not isinstance(args, tuple):
            args = (args,)
        return Union(*args)

    def is_a(self, value) -> bool:
        return any(m.is_a(value) for m in self.members)

    def to_column(self, col: Column | None = None) -> Column:
        out = F.lit(False)
        for m in self.members:
            out = out | m.to_column(col)
        return out


class Intersection(ValueType):
    def __class_getitem__(cls, args):
        if not isinstance(args, tuple):
            args = (args,)
        return cls(*args)

    def __init__(self, *members):
        self.members = tuple(_coerce(m) for m in members)
        self.name = ("Intersection[" +
                     ", ".join(m.name for m in self.members) + "]")

    def __getitem__(self, args):
        if not isinstance(args, tuple):
            args = (args,)
        return Intersection(*args)

    def is_a(self, value) -> bool:
        return all(m.is_a(value) for m in self.members)

    def to_column(self, col: Column | None = None) -> Column:
        out = F.lit(True)
        for m in self.members:
            out = out & m.to_column(col)
        return out


class Complement(ValueType):
    def __class_getitem__(cls, arg):
        return cls(arg)

    def __init__(self, member=None):
        self.member = _coerce(member) if member is not None else None
        self.name = f"Complement[{self.member and self.member.name}]"

    def __getitem__(self, arg):
        return Complement(arg)

    def is_a(self, value) -> bool:
        return not self.member.is_a(value)

    def to_column(self, col: Column | None = None) -> Column:
        return ~self.member.to_column(col)


class SetOf(ValueType):
    def __class_getitem__(cls, args):
        if not isinstance(args, tuple):
            args = (args,)
        return cls(*args)

    """SetOf[a, b, c] — membership in an explicit finite set."""

    def __init__(self, *values):
        self.values = values
        self.name = f"SetOf{list(values)!r}"

    def __getitem__(self, args):
        if not isinstance(args, tuple):
            args = (args,)
        return SetOf(*args)

    def is_a(self, value) -> bool:
        return value in self.values

    def to_column(self, col: Column | None = None) -> Column:
        if col is None:
            col = F.col("value")
        return col.isin(*self.values)


class RAEType(ValueType):
    """An ET/RT/AET token used as a type: matches graph rows whose
    token column equals it (compiles to `et = 'X'` → partition
    pruning, the Spark-native 'delegate index', SURVEY §4)."""

    def __init__(self, token: Token):
        self.token = token
        self.name = str(token)

    def is_a(self, value) -> bool:
        tok = getattr(value, "token", None) or getattr(value, "et", None) \
            or getattr(value, "rt", None)
        return tok == self.token or tok == self.token.name

    def to_column(self, col: Column | None = None) -> Column:
        colname = {"ET": "et", "RT": "rt", "AET": "aet"}[self.token.kind]
        return F.col(colname) == self.token.name


class Pattern(ValueType):
    def __class_getitem__(cls, spec):
        return cls(spec)

    """Pattern[{...}] — structural dict matching (sets.py:340-401)."""

    def __init__(self, spec=None):
        self.spec = spec
        self.name = f"Pattern[{spec!r}]"

    def __getitem__(self, spec):
        return Pattern(spec)

    def is_a(self, value) -> bool:
        if not isinstance(self.spec, dict) or not isinstance(value, dict):
            return False
        for k, v in self.spec.items():
            if k not in value:
                return False
            if isinstance(v, ValueType):
                if not v.is_a(value[k]):
                    return False
            elif value[k] != v:
                return False
        return True

    def to_column(self, col: Column | None = None) -> Column:
        out = F.lit(True)
        for k, v in self.spec.items():
            c = F.col(k)
            if isinstance(v, ValueType):
                out = out & v.to_column(c)
            else:
                out = out & (c == F.lit(v))
        return out
