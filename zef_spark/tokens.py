"""Type tokens: ET (entity types), RT (relation types), AET (attribute
entity types), and the VRT primitive names.

Reference parity: zef creates ET/RT/AET tokens on first use via string
interning (reference ``core/src/tokens.cpp``; user surface
``python/zef/core/VT/rae_types.py``). Here a token is a lightweight
frozen value object carrying its kind + name; the engine stores it as a
plain string column (``et`` / ``rt`` / ``vrt``) and relies on
dictionary encoding + partition pruning instead of int interning.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Token:
    kind: str  # "ET" | "RT" | "AET"
    name: str

    def __str__(self) -> str:
        return f"{self.kind}.{self.name}"

    __repr__ = __str__

    # tokens participate in the VT set algebra: ET.A | ET.B is a type
    # union usable in all[...] / filter[...] (reference: VT/sets.py)
    def __or__(self, other):
        from .ops.core import ZefOp
        if isinstance(other, ZefOp):
            # `ET.X | token_name` pipes the token INTO the op chain —
            # defer to ZefOp.__ror__, don't build a VT union
            return NotImplemented
        from .vt import Union, _coerce
        return Union(_coerce(self), _coerce(other))

    def __and__(self, other):
        from .vt import Intersection, _coerce
        return Intersection(_coerce(self), _coerce(other))

    def __invert__(self):
        from .vt import Complement, _coerce
        return Complement(self)


class _TokenFactory:
    """`ET.Person` style attribute access; tokens created on first use
    (dynamic/gradual schema — no DDL required, as in the reference)."""

    def __init__(self, kind: str):
        object.__setattr__(self, "_kind", kind)

    def __getattr__(self, name: str) -> Token:
        if name.startswith("_"):
            raise AttributeError(name)
        return Token(self._kind, name)

    def __call__(self, name: str) -> Token:
        return Token(self._kind, name)


ET = _TokenFactory("ET")
RT = _TokenFactory("RT")
AET = _TokenFactory("AET")


@dataclass(frozen=True)
class EnumValue:
    """ZefEnumValue (reference core/include/tokens.h:302-318): a
    (enum_type, value) pair, e.g. ``EN.Unit.seconds``. Stored as the
    dictionary-encodable string "Type.value" in ``value_enum``."""
    enum_type: str
    value: str

    def __str__(self) -> str:
        return f"{self.enum_type}.{self.value}"

    __repr__ = __str__


class _EnumTypeNS:
    __slots__ = ("_t",)

    def __init__(self, t: str):
        self._t = t

    def __getattr__(self, v: str) -> EnumValue:
        if v.startswith("_"):
            raise AttributeError(v)
        return EnumValue(self._t, v)

    def __call__(self, v: str) -> EnumValue:
        return EnumValue(self._t, v)


class _EnumFactory:
    """`EN.Color.red` style access (reference EN surface,
    python/zef/core/units.py imports EN for Unit enums)."""

    def __getattr__(self, t: str) -> _EnumTypeNS:
        if t.startswith("_"):
            raise AttributeError(t)
        return _EnumTypeNS(t)


EN = _EnumFactory()

# VRT primitive names (reference core/include/tokens.h:321-329) → Spark types
VRT_SPARK_TYPES = {
    "String": "string",
    "Bool": "boolean",
    "Float": "double",
    "Int": "bigint",
    "Time": "timestamp_ntz",
    "Serialized": "string",
}
