"""Magnitude-safe rounding: never emit more total significant digits
than cross-engine IEEE-754 arithmetic can guarantee.

The failure class this closes (r07 verdict, `e_linreg_trend` /
`w_dp_priority_stats`): `ROUND(x, 6)` on a large-magnitude double
(intercept ~1.6e5, dp_sum ~7.6e8) demands 12-15 significant digits of
agreement between Spark and any other engine — more than FMA-variant
IEEE double arithmetic guarantees, so the driver's raw-repr value hash
flips red even when both sides are "correct" to the last guaranteed
ulp. The fix is to cap TOTAL significant digits: round to
`min(digits, max_sig - int_digits)` decimal places, where
`int_digits` is the number of digits in the integer part. With
max_sig=9, a 1.6e5 intercept rounds at 3 dp and a 7.6e8 dp_sum at
0 dp — both well inside double-exact territory.

Determinism notes:
- `int_digits` is derived from the STRING LENGTH of floor(|x|) cast
  to bigint, not floor(log10(|x|)) — log10 is libm-dependent and can
  straddle an integer boundary by one ulp at exact powers of 10;
  string length of an integer cannot.
- Spark's `round(col, scale)` requires a foldable scale, so the
  column-dependent scale is expressed by evaluating every reachable
  fixed-scale round into ONE inline array and `element_at`-ing the
  effective scale (all whole-stage-codegen'd, row-local — zero
  shuffle, zero Python). This spelling replaced the original nested
  CASE chain in r09: the chain re-evaluated the digit-count
  subexpression in every arm and the −0.0-normalization wrapper
  duplicated the whole tree, so a release with 5 sig-safe columns
  generated a 1.3MB processNext, blew janino's 64KB method limit,
  and silently fell back to interpreted codegen. The array form is
  value-identical (same round(c, d) pick, same NULL propagation;
  `+ 0.0` performs the same −0.0→0.0 normalization IEEE-exactly)
  and ~20× smaller in generated code.
- `sql_round_sig_safe` emits the equivalent DuckDB expression so a
  query and its oracle round on exactly the same grid.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# floor(|x|) of any double below 1e18 fits in a bigint; above that the
# cast could overflow, so int_digits clamps to 19 (d = max_sig - 19).
_BIG = 1.0e18
_MAX_INT_DIGITS = 19


def round_sig_safe(c, digits: int = 6, max_sig: int = 9) -> Column:
    """Round double column `c` to `digits` decimal places, capped so
    the result never carries more than `max_sig` total significant
    digits. NULL in, NULL out; 0.0 rounds to 0.0."""
    c = F.col(c) if isinstance(c, str) else c
    c = c.cast("double")
    a = F.abs(c)
    int_digits = (F.when(a < 1.0, F.lit(0))
                  .when(a >= _BIG, F.lit(_MAX_INT_DIGITS))
                  .otherwise(F.length(F.floor(a).cast("bigint")
                                      .cast("string"))))
    d = F.least(F.lit(int(digits)), F.lit(int(max_sig)) - int_digits)
    lo = int(max_sig) - _MAX_INT_DIGITS
    # every reachable fixed scale evaluated into one inline array,
    # then element_at picks the effective one — d ∈ [lo, digits] by
    # construction (int_digits ∈ [0, 19]), so the 1-based index is
    # always in range; NULL c → NULL elements and NULL d → NULL out
    arr = F.array(*[F.round(c, k) for k in range(lo, int(digits) + 1)])
    expr = F.element_at(arr, d - F.lit(lo) + F.lit(1))
    # `+ 0.0` normalizes negative zero (−0.0 + 0.0 = +0.0, and
    # x + 0.0 = x IEEE-exactly for every other double incl. NULL
    # propagation): a tiny negative rounds to -0.0 in DuckDB but 0.0
    # in Spark — repr('-0.0') != repr('0.0'), so the driver's raw
    # value hash would split on the SIGN of a zero (found by the
    # property test in tests/test_rounding.py)
    return expr + F.lit(0.0)


def sql_round_sig_safe(x: str, digits: int = 6, max_sig: int = 9) -> str:
    """DuckDB expression equivalent to `round_sig_safe` — inline in an
    oracle so both sides round on the identical grid. `x` must be a
    double-typed SQL expression (repeated verbatim; keep it cheap or
    pre-compute in a CTE)."""
    int_digits = (f"CASE WHEN ABS({x}) < 1.0 THEN 0 "
                  f"WHEN ABS({x}) >= 1e18 THEN {_MAX_INT_DIGITS} "
                  f"ELSE LENGTH(CAST(CAST(FLOOR(ABS({x})) AS BIGINT) "
                  f"AS VARCHAR)) END")
    rounded = (f"ROUND({x}, CAST(LEAST({int(digits)}, "
               f"{int(max_sig)} - ({int_digits})) AS INTEGER))")
    # -0.0 normalization: mirror the Spark side (see round_sig_safe)
    return (f"CASE WHEN {rounded} = 0 THEN 0.0 ELSE {rounded} END")
