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

from .._registry import register_op


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


def skew_report(df: DataFrame, key, top: int = 10,
                threshold: float = 0.01) -> dict:
    """Quantify key skew BEFORE a join/groupBy melts an executor:
    returns {rows, distinct_keys, null_keys, top: [(key, n, share)],
    max_share, advice}. One aggregate + one top-k (TakeOrdered) —
    safe to run on the full fact table. `advice` names the mitigation
    when the hottest key exceeds `threshold` of all rows: broadcast
    the other side if it is dimension-sized, else salted_join /
    AQE skew splitting."""
    keys = [key] if isinstance(key, str) else list(key)
    kc = F.struct(*[F.col(k) for k in keys]) if len(keys) > 1 \
        else F.col(keys[0])
    totals = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(kc).alias("d"),
        F.sum(kc.isNull().cast("long")).alias("nulls")).collect()[0]
    n = totals["n"] or 1
    hot = (df.groupBy(kc.alias("k"))
           .agg(F.count(F.lit(1)).alias("cnt"))
           .orderBy(F.col("cnt").desc())
           .limit(top).collect())
    tops = [(r["k"], r["cnt"], r["cnt"] / n) for r in hot]
    max_share = tops[0][2] if tops else 0.0
    advice = None
    if max_share > threshold:
        advice = (
            f"hottest key carries {max_share:.1%} of rows: broadcast "
            "the other join side if dimension-sized, else "
            "salted_join(salts≈32) or rely on AQE skew splitting; "
            "NULL keys should be filtered or joined separately"
            if totals["nulls"] else
            f"hottest key carries {max_share:.1%} of rows: broadcast "
            "the other join side if dimension-sized, else "
            "salted_join(salts≈32) or rely on AQE skew splitting")
    return {"rows": totals["n"], "distinct_keys": totals["d"],
            "null_keys": totals["nulls"], "top": tops,
            "max_share": max_share, "advice": advice}


@register_op("skew_report", "df")
def _skew_report(df, key, top=10, threshold=0.01):
    return skew_report(df, key, top, threshold)
