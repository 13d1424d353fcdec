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


# 2^53: the largest double grid on which every integer is exact; a
# scaled value at or past it cannot be rounded on a finer grid anyway
# (the double spacing exceeds 1), so grid rounding is identity there.
_TWO53 = 9007199254740992.0


def _grid(c: Column, k: int) -> Column:
    """Round to k decimal places as FLOOR(x·10^k + 0.5)/10^k (k ≥ 0)
    or FLOOR(x/10^⁻ᵏ + 0.5)·10^⁻ᵏ (k < 0) — every step an IEEE double
    op both engines compute bit-identically, unlike ROUND(double, k)
    (Spark rounds the SHORTEST-REPR decimal half-up, DuckDB rounds
    the binary value half-away: a value on a .5 grid boundary flips
    by one ulp of the grid between engines — the r10 roc_points
    ADVICE class, caught again by the r11 sf5 sweep in
    p_text_quality's 6-dp quality release). Convention: half-up
    (ties toward +inf). 10^|k| is an exact double for |k| ≤ 15 and
    division by it is correctly rounded, so the negative-k form
    stays exact-by-construction. Identity past 2^53 (incl. ±inf/NaN:
    the guard comparison is false)."""
    p = F.lit(float(10 ** abs(int(k))))
    sp = c * p if k >= 0 else c / p
    snapped = F.floor(sp + F.lit(0.5)).cast("double")
    return F.when(F.abs(sp) < F.lit(_TWO53),
                  snapped / p if k >= 0 else snapped * p).otherwise(c)


def round_grid(c, k: int = 6) -> Column:
    """Public fixed-scale floor-grid release: `_grid` plus the -0.0
    normalization. For columns whose magnitude is KNOWN bounded
    (ratios, probabilities, means of bounded values) this is the
    whole release — one small expression, codegen-friendly.

    TIE CONVENTION (differs from native ROUND): floor(x·10^k + 0.5)
    rounds ties toward +inf for NEGATIVE values too (-0.5 → 0, where
    Spark/DuckDB native ROUND give -1 half-away-from-zero), and a
    double a hair below a .5 boundary can round UP when the +0.5 sum
    itself rounds (0.49999999999999994 + 0.5 == 1.0 in IEEE). Both
    effects are at most one grid ulp and are IDENTICAL across
    engines — that cross-engine bit-equality is the whole point —
    but callers releasing signed statistics (kendall tau, deltas,
    effect sizes) should know released values may differ from a
    native-ROUND pipeline by one grid step at exact ties. Use
    `round_sig_safe` instead when the magnitude is data-dependent
    (its 17 per-scale arms weigh ~5× more per column; five of them
    in one projection blew the JVM 64KB codegen method limit in
    p_text_quality and fell back to interpreted)."""
    c = F.col(c) if isinstance(c, str) else c
    return _grid(c.cast("double"), int(k)) + F.lit(0.0)


def sql_round_grid(x: str, k: int = 6) -> str:
    """DuckDB mirror of `round_grid` — identical IEEE double ops."""
    g = _sql_grid(x, int(k))
    return f"CASE WHEN ({g}) = 0 THEN 0.0 ELSE ({g}) END"


def round_sig_safe(c, digits: int = 6, max_sig: int = 9) -> Column:
    """Round double column `c` to `digits` decimal places, capped so
    the result never carries more than `max_sig` total significant
    digits. NULL in, NULL out; 0.0 rounds to 0.0. Rounds on the
    engine-portable floor grid (see _grid) so Spark and the DuckDB
    `sql_round_sig_safe` mirror agree bit-for-bit at every input,
    including exact .5 grid boundaries. Tie convention: half-up
    toward +inf for negatives too, and a double just below a .5
    boundary can round up when the +0.5 sum rounds — one grid ulp
    from native ROUND at exact ties, identical across engines (see
    `round_grid`)."""
    c = F.col(c) if isinstance(c, str) else c
    c = c.cast("double")
    a = F.abs(c)
    int_digits = (F.when(a < 1.0, F.lit(0))
                  .when(a >= _BIG, F.lit(_MAX_INT_DIGITS))
                  .otherwise(F.length(F.floor(a).cast("bigint")
                                      .cast("string"))))
    d = F.least(F.lit(int(digits)), F.lit(int(max_sig)) - int_digits)
    lo = int(max_sig) - _MAX_INT_DIGITS
    # ONE grid computation with the scale picked from a LITERAL array
    # of exact powers 10^|k| (k ∈ [lo, digits]; all ≤ 10^15, exact
    # doubles) — the earlier shape evaluated a _grid expression tree
    # PER scale into an inline array (17 arms × ~6 ops × every
    # round_sig_safe column), and three/four such columns in one
    # projection blew the JVM 64KB codegen method limit (caught by
    # check_oracle's codegen-fallback guard on the first post-_grid
    # sweep: w_jarque_bera, e_kendall_tau, the eval-curve releases).
    # d ∈ [lo, digits] by construction so the 1-based index is always
    # in range; NULL c → NULL d → NULL out.
    # branch-free scaling: pa = 10^k, pb = 1 for k ≥ 0 and pa = 1,
    # pb = 10^-k for k < 0 — multiply/divide by an exact 1.0 is
    # IEEE-identity, so c·pa/pb ≡ the sign-correct exact scaling with
    # no conditional (the when(neg, ...) spelling doubled the
    # generated code per column and pushed an 8-release chain's
    # codegen subtree past the plan-guard margin)
    # r12 (driver-overhead finding, guide §1 job census): each literal
    # F.lit is a py4j round-trip, and the two 17-element arrays were
    # ~70% of this function's ~0.07 s construction cost PER CALL. One
    # F.expr parse builds the identical array expression in a single
    # round-trip (`1E15`-style exponent literals parse as exact
    # DOUBLEs — same values, same Catalyst tree, bit-identical plan).
    ks = range(lo, int(digits) + 1)

    def _dbl(v: float) -> str:
        return f"{v:.0E}".replace("E+0", "E").replace("E+", "E")

    pa_arr = F.expr("array(" + ",".join(
        _dbl(float(10 ** max(k, 0))) for k in ks) + ")")
    pb_arr = F.expr("array(" + ",".join(
        _dbl(float(10 ** max(-k, 0))) for k in ks) + ")")
    pa = F.element_at(pa_arr, d - F.lit(lo) + F.lit(1))
    pb = F.element_at(pb_arr, d - F.lit(lo) + F.lit(1))
    sp = c * pa / pb
    snapped = F.floor(sp + F.lit(0.5)).cast("double")
    expr = F.when(F.abs(sp) < F.lit(_TWO53),
                  snapped / pa * pb).otherwise(c)
    # `+ 0.0` normalizes negative zero (−0.0 + 0.0 = +0.0, and
    # x + 0.0 = x IEEE-exactly for every other double incl. NULL
    # propagation): a tiny negative rounds to -0.0 in DuckDB but 0.0
    # in Spark — repr('-0.0') != repr('0.0'), so the driver's raw
    # value hash would split on the SIGN of a zero (found by the
    # property test in tests/test_rounding.py)
    return expr + F.lit(0.0)


def _sql_grid(x: str, k: int) -> str:
    """DuckDB mirror of `_grid(c, k)` — identical IEEE double ops."""
    p = repr(float(10 ** abs(int(k))))  # exact literal, e.g. 1000000.0
    sp = f"(({x}) * {p})" if k >= 0 else f"(({x}) / {p})"
    snapped = f"FLOOR({sp} + 0.5)"
    out = f"({snapped} / {p})" if k >= 0 else f"({snapped} * {p})"
    return (f"CASE WHEN ABS({sp}) < {_TWO53!r} THEN {out} "
            f"ELSE ({x}) END")


def sql_round_sig_safe(x: str, digits: int = 6, max_sig: int = 9) -> str:
    """DuckDB expression equivalent to `round_sig_safe` — inline in an
    oracle so both sides round on the identical grid. `x` must be a
    double-typed SQL expression (repeated verbatim across the scale
    arms; keep it cheap or pre-compute in a CTE). Mirrors the Spark
    side's floor-grid scales (one CASE arm per reachable scale k —
    the SQL analogue of the Spark inline array), never ROUND(double):
    the engines' ROUND tie conventions differ at .5 grid boundaries."""
    int_digits = (f"CASE WHEN ABS({x}) < 1.0 THEN 0 "
                  f"WHEN ABS({x}) >= 1e18 THEN {_MAX_INT_DIGITS} "
                  f"ELSE LENGTH(CAST(CAST(FLOOR(ABS({x})) AS BIGINT) "
                  f"AS VARCHAR)) END")
    lo = int(max_sig) - _MAX_INT_DIGITS
    d = f"LEAST({int(digits)}, {int(max_sig)} - ({int_digits}))"
    arms = " ".join(f"WHEN {k} THEN {_sql_grid(x, k)}"
                    for k in range(lo, int(digits) + 1))
    rounded = f"(CASE {d} {arms} END)"
    # -0.0 normalization: mirror the Spark side (see round_sig_safe)
    return (f"CASE WHEN {rounded} = 0 THEN 0.0 ELSE {rounded} END")
