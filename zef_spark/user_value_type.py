"""UserValueType — user-defined value types with validation.

Reference parity: ``python/zef/core/user_value_type.py`` — a
UserValueType(name, representation_type, constraints) constructs
validated ``UserValueInstance`` wrappers; instances are stored
serialized and reconstructed on read. Deviations: the type id is the
NAME (deterministic — the reference mints a random id per runtime,
which doesn't survive a distributed restart), and storage is a JSON
envelope in ``value_str`` with vrt='Serialized' (the reference's
serialized-value blob, tokens.h Serialized VRT).
"""

from __future__ import annotations

import json
from typing import Any, Callable

_registry: dict[str, "UserValueType"] = {}


class UserValueInstance:
    __slots__ = ("type_name", "value")

    def __init__(self, type_name: str, value):
        self.type_name = type_name
        self.value = value

    def __eq__(self, other):
        return (isinstance(other, UserValueInstance)
                and other.type_name == self.type_name
                and other.value == self.value)

    def __hash__(self):
        return hash((self.type_name, json.dumps(self.value,
                                                sort_keys=True,
                                                default=str)))

    def __repr__(self):
        return f"{self.type_name}({self.value!r})"

    def serialize(self) -> str:
        return json.dumps({"type": self.type_name, "value": self.value},
                          sort_keys=True)


class UserValueType:
    """``Email = UserValueType('Email', str, lambda s: '@' in s)``;
    then ``Email('a@b.c')`` validates and wraps."""

    def __init__(self, name: str,
                 representation_type: Callable[..., Any],
                 constraints: Any = None):
        if name in _registry and _registry[name] is not self:
            raise ValueError(f"UserValueType {name!r} already defined")
        self.name = name
        self.representation_type = representation_type
        self.constraints = constraints
        _registry[name] = self

    def __call__(self, *args, **kwargs) -> UserValueInstance:
        try:
            cast = self.representation_type(*args, **kwargs)
        except Exception as e:
            raise ValueError(f"couldn't construct {self.name}: {e}")
        c = self.constraints
        ok = True
        if c is None:
            ok = True
        elif isinstance(c, type):
            ok = isinstance(cast, c)
        elif callable(c):
            ok = bool(c(cast))
        if not ok:
            raise ValueError(
                f"UserValueType(name={self.name}) constraint does not "
                f"match for value ({cast!r})")
        return UserValueInstance(self.name, cast)

    def is_a(self, x) -> bool:
        return (isinstance(x, UserValueInstance)
                and x.type_name == self.name)

    def __repr__(self):
        return self.name


def deserialize_value(s: str) -> UserValueInstance:
    """JSON envelope → instance (revalidated when the type is known
    to this runtime)."""
    d = json.loads(s)
    t = _registry.get(d["type"])
    if t is not None:
        return t(d["value"])
    return UserValueInstance(d["type"], d["value"])
