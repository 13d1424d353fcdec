"""Quantity value types + the `units` namespace.

Mirrors the reference's QuantityInt/QuantityFloat
(core/include/scalars.h:133,164: value + Unit enum, strict same-unit
comparison, scalar scaling) and `python/zef/core/units.py` (the
`units.seconds`-style singleton so ``-3.5 * units.seconds`` builds a
duration). Units are plain strings here — the Spark-side storage is a
``struct<value: double, unit: string>`` column (see graph/schema.py).
"""

from __future__ import annotations

from dataclasses import dataclass


def _check_same_unit(a, b):
    if a.unit != b.unit:
        raise ValueError(f"Units do not agree: {a.unit} and {b.unit}")


class _QuantityBase:
    __slots__ = ()

    def _wrap(self, value):
        if isinstance(value, int) and isinstance(self, QuantityInt):
            return QuantityInt(value, self.unit)
        return QuantityFloat(float(value), self.unit)

    def __mul__(self, x):
        if isinstance(x, (int, float)) and not isinstance(x, bool):
            return self._wrap(self.value * x)
        return NotImplemented

    __rmul__ = __mul__

    def __truediv__(self, x):
        if isinstance(x, (int, float)) and not isinstance(x, bool):
            return QuantityFloat(self.value / x, self.unit)
        return NotImplemented

    def __neg__(self):
        return self._wrap(-self.value)

    def __add__(self, other):
        if isinstance(other, _QuantityBase):
            _check_same_unit(self, other)
            return self._wrap(self.value + other.value)
        return NotImplemented

    def __sub__(self, other):
        if isinstance(other, _QuantityBase):
            _check_same_unit(self, other)
            return self._wrap(self.value - other.value)
        return NotImplemented

    def __lt__(self, other):
        _check_same_unit(self, other)
        return self.value < other.value

    def __le__(self, other):
        _check_same_unit(self, other)
        return self.value <= other.value

    def __gt__(self, other):
        _check_same_unit(self, other)
        return self.value > other.value

    def __ge__(self, other):
        _check_same_unit(self, other)
        return self.value >= other.value

    def to(self, target_unit: str) -> "QuantityFloat":
        """Unit conversion through the registered linear factors
        (e.g. kilometers→meters); raises on unknown conversions."""
        if target_unit == self.unit:
            return QuantityFloat(float(self.value), self.unit)
        key = (self.unit, target_unit)
        if key not in _CONVERSIONS:
            raise ValueError(f"no conversion {self.unit} → {target_unit}")
        return QuantityFloat(self.value * _CONVERSIONS[key], target_unit)


@dataclass(frozen=True)
class QuantityInt(_QuantityBase):
    value: int
    unit: str

    def __repr__(self):
        return f"{self.value} {self.unit}"


@dataclass(frozen=True)
class QuantityFloat(_QuantityBase):
    value: float
    unit: str

    def __repr__(self):
        return f"{self.value} {self.unit}"


# linear unit-conversion factors (extend freely; both directions kept
# explicit so lookups stay dict-flat)
_CONVERSIONS: dict[tuple[str, str], float] = {}


def register_conversion(src: str, dst: str, factor: float):
    _CONVERSIONS[(src, dst)] = factor
    _CONVERSIONS[(dst, src)] = 1.0 / factor


register_conversion("kilometers", "meters", 1000.0)
register_conversion("centimeters", "meters", 0.01)
register_conversion("kilograms", "grams", 1000.0)
register_conversion("minutes", "seconds", 60.0)
register_conversion("hours", "seconds", 3600.0)
register_conversion("days", "seconds", 24 * 3600.0)


@dataclass(frozen=True)
class _Units:
    """`units.seconds` etc. — same surface as the reference's
    units singleton (python/zef/core/units.py:24-38)."""
    milliseconds = QuantityFloat(1e-3, "seconds")
    seconds = QuantityInt(1, "seconds")
    minutes = QuantityInt(60, "seconds")
    hours = QuantityInt(3600, "seconds")
    days = QuantityInt(24 * 3600, "seconds")
    weeks = QuantityInt(7 * 24 * 3600, "seconds")
    years = QuantityInt(365 * 24 * 3600, "seconds")

    grams = QuantityInt(1, "grams")
    kilograms = QuantityInt(1, "kilograms")

    meters = QuantityInt(1, "meters")
    centimeters = QuantityInt(1, "centimeters")
    kilometers = QuantityInt(1000, "meters")


units = _Units()


def __getattr__(name: str):
    """`from zef_spark import units` can bind THIS MODULE instead of
    the `_Units` instance: the submodule import sets the package
    attribute after exec, shadowing the package-level lazy re-export
    (r13's PEP 562 `zef_spark/__init__`). Delegate unknown module
    attributes to the instance so `units.kilograms` works identically
    through either binding."""
    try:
        return getattr(units, name)
    except AttributeError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}") from None


def is_duration(q) -> bool:
    """A Quantity in seconds (the reference's is_duration check,
    ITF:5541)."""
    return isinstance(q, (QuantityInt, QuantityFloat)) \
        and q.unit == "seconds"
