"""Scalar function library: zef's string/math/encoding ops (SURVEY
§2.H) as JVM-side Column expressions — no Python UDFs; everything stays
inside whole-stage codegen.

Reference parity cited per function (ITF lines). Case conversions are
compositions of regexp_replace/initcap exactly as SURVEY §2.H maps
them.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- case conversions (ITF:8550-8733) --------------------------------
def to_upper_case(col):
    return F.upper(_c(col))


def to_lower_case(col):
    return F.lower(_c(col))


def _words(col):
    # split camelCase / delimiters into words
    s = F.regexp_replace(_c(col), r"([a-z0-9])([A-Z])", r"$1 $2")
    s = F.regexp_replace(s, r"[_\-\s]+", " ")
    return F.trim(s)


def to_snake_case(col):
    return F.lower(F.regexp_replace(_words(col), " ", "_"))


def to_screaming_snake_case(col):
    return F.upper(F.regexp_replace(_words(col), " ", "_"))


def to_kebab_case(col):
    return F.lower(F.regexp_replace(_words(col), " ", "-"))


def to_pascal_case(col):
    return F.regexp_replace(F.initcap(F.lower(_words(col))), " ", "")


def to_camel_case(col):
    p = to_pascal_case(col)
    return F.concat(F.lower(p.substr(F.lit(1), F.lit(1))),
                    p.substr(F.lit(2), F.length(p)))


# -- padding / trimming / splitting (ITF:8318-8379, 2199-2322, 4684) --
def pad_left(col, n, ch=" "):
    return F.lpad(_c(col), n, ch)


def pad_right(col, n, ch=" "):
    return F.rpad(_c(col), n, ch)


def pad_center(col, n, ch=" "):
    c = _c(col)
    left = F.floor((F.lit(n) - F.length(c)) / 2).cast("int")
    return F.rpad(F.lpad(c, F.greatest(F.length(c) + left, F.length(c))
                         .cast("int"), ch), n, ch)


def trim_left(col, ch=None):
    return F.ltrim(_c(col)) if ch is None else F.expr(
        f"ltrim({col}, '{ch}')")


def trim_right(col, ch=None):
    return F.rtrim(_c(col)) if ch is None else F.expr(
        f"rtrim({col}, '{ch}')")


def split_lines(col):
    return F.split(_c(col), r"\r?\n")


# -- math (ITF:2765-3158, 8241-8431) ---------------------------------
def clamp(col, lo, hi):
    return F.greatest(F.least(_c(col), F.lit(hi)), F.lit(lo))


def int_to_alpha(col):
    """1→a, 2→b ... (ITF:8431)."""
    return F.char(_c(col).cast("int") + 96)


# -- hashing / encoding (ITF:8776-9119) ------------------------------
def value_hash(*cols):
    """Content hash for value interning / dedup (ITF:8808; C++
    xxhash64.h) — xxhash64 over the canonical string form."""
    return F.xxhash64(*[_c(c).cast("string") for c in cols])


def blake3_like(col):
    """Reference uses blake3 (ITF:8776); sha2-256 is the JVM-side
    stand-in (same role: collision-resistant content digest)."""
    return F.sha2(_c(col).cast("string"), 256)


def to_base64(col):
    return F.base64(_c(col))


def from_base64(col):
    return F.unbase64(_c(col))


def to_bytes(col):
    return F.encode(_c(col), "utf-8")


def utf8bytes_to_string(col):
    return F.decode(_c(col), "utf-8")


def quantity(value, unit):
    """Build a quantity struct column (matches the value_quantity
    storage layout: struct<value double, unit string>)."""
    return F.struct(_c(value).cast("double").alias("value"),
                    (F.lit(unit) if isinstance(unit, str)
                     else _c(unit)).alias("unit"))


def unit_convert(qcol, target_unit: str):
    """Convert a quantity struct column to `target_unit` through the
    registered linear factors (zef_spark.units.register_conversion);
    rows whose unit has no conversion become NULL. Pure CASE
    expression — whole-stage codegen, no UDF."""
    from ..units import _CONVERSIONS
    q = _c(qcol)
    v, u = q["value"], q["unit"]
    out = F.when(u == target_unit, v)
    for (src, dst), factor in _CONVERSIONS.items():
        if dst == target_unit:
            out = out.when(u == src, v * F.lit(factor))
    return F.struct(out.alias("value"),
                    F.when(out.isNotNull(), F.lit(target_unit))
                    .alias("unit"))
