"""Skew-mitigation utilities for hot-key joins.

AQE's skew-join splitting (on in session.py) handles most sort-merge
skew at runtime; explicit salting remains the tool when one relation
has a FEW pathological keys and the other side is too large to
broadcast: the skewed side gets a uniform salt, the other side is
replicated once per salt, and the join key becomes (key, salt) — the
hot key's rows now spread over `salts` tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..ops.core import register_op


def salted_join(skewed: DataFrame, other: DataFrame, on: str,
                salts: int = 16, how: str = "inner") -> DataFrame:
    """Join on `on` with the skewed side salted and `other` replicated
    ×salts. Equivalent rows to skewed.join(other, on, how); use for
    inner/left joins where `skewed` carries hot keys.

    Salt is a deterministic hash of the whole skewed row (not rand():
    retries/speculative tasks must re-produce identical salt or the
    join silently drops/dupes rows).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left")
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in
                                        skewed.columns])),
                  F.lit(salts))
    l = skewed.withColumn("__salt", salt)
    r = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0),
                                       F.lit(salts - 1)).cast(
            "array<long>")))
    out = l.join(r, [on, "__salt"], how)
    return out.drop("__salt")


@register_op("salted_join", "df")
def _salted_join(df: DataFrame, other: DataFrame, on: str,
                 salts: int = 16, how: str = "inner") -> DataFrame:
    return salted_join(df, other, on, salts, how)
