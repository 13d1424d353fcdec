"""Approximate (sketch) aggregates for corpus-scale profiling:
HyperLogLog distinct counts and quantile sketches, per group, as
single-pass partial aggregates (map-side combine → one shuffle on the
group key — the same plan shape as an exact COUNT, but with O(1)
state per group instead of O(distinct)).

At 100 TB an exact COUNT(DISTINCT user_id) per group carries every
distinct value through the shuffle; the HLL sketch carries a fixed
few-KB register array per group, and percentile_approx carries a
bounded KLL-style summary — these are the only aggregation shapes
that stay flat as cardinality grows.

Correctness at the oracle is proven with *tolerance checks*: the
query emits the exact value (computable at test scale) alongside an
`ok` flag (1/0) asserting the sketch landed within the configured
error bound, so the driver's value-hash compare stays exact while
the sketch path is still exercised end-to-end.

Reference parity: the reference's aggregation surface stops at exact
`length`/`frequencies` (core/op_implementations — see SURVEY.md §2.D);
sketches are an engine extra for the 100 TB profile path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..ops.core import register_op


def approx_distinct(df: DataFrame, group_cols: list[str], col: str,
                    rsd: float = 0.05,
                    out_col: str = "approx_distinct") -> DataFrame:
    """Per-group HLL distinct estimate. One shuffle keyed by
    `group_cols`; sketch state is O(1/rsd²) per group regardless of
    cardinality."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(col, rsd).alias(out_col))


def approx_quantiles(df: DataFrame, group_cols: list[str], col: str,
                     probs: list[float],
                     accuracy: int = 10000) -> DataFrame:
    """Per-group approximate quantiles (Greenwald-Khanna style);
    returns one array column `quantiles` aligned with `probs`."""
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(col, probs, accuracy).alias("quantiles"))


def distinct_check(df: DataFrame, group_cols: list[str], col: str,
                   rsd: float = 0.02, tol: float = 0.05) -> DataFrame:
    """Per group: exact distinct count + `distinct_ok` (1 when the
    HLL estimate is within `tol` relative error). The exact count
    exists for the oracle compare; production profiling would keep
    only the sketch."""
    agg = df.groupBy(*group_cols).agg(
        F.countDistinct(col).alias("n_exact"),
        F.approx_count_distinct(col, rsd).alias("__est"))
    ok = (F.abs(F.col("__est") - F.col("n_exact"))
          <= tol * F.col("n_exact"))
    return agg.select(*group_cols, "n_exact",
                      ok.cast("int").alias("distinct_ok"))


def quantile_check(df: DataFrame, group_cols: list[str], col: str,
                   prob: float = 0.5, accuracy: int = 10000,
                   tol: float = 0.05) -> DataFrame:
    """Per group: exact continuous quantile (linear interpolation at
    rank p·(n-1) — the convention Spark `percentile` and DuckDB
    `quantile_cont` share) + `quantile_ok` (1 when percentile_approx
    lands within `tol` relative tolerance — absorbs the sketch's
    rank-resolution gap)."""
    agg = df.groupBy(*group_cols).agg(
        F.percentile(col, F.lit(prob)).alias("exact_q"),
        F.percentile_approx(col, prob, accuracy).alias("__approx"))
    ok = (F.abs(F.col("__approx") - F.col("exact_q"))
          <= tol * (F.abs(F.col("exact_q")) + F.lit(1.0)))
    return agg.select(*group_cols,
                      F.round("exact_q", 6).alias("exact_q"),
                      ok.cast("int").alias("quantile_ok"))


@register_op("approx_distinct", "df")
def _approx_distinct_op(df: DataFrame, group_cols, col,
                        rsd: float = 0.05):
    return approx_distinct(df, list(group_cols), col, rsd)


@register_op("approx_quantiles", "df")
def _approx_quantiles_op(df: DataFrame, group_cols, col, probs,
                         accuracy: int = 10000):
    return approx_quantiles(df, list(group_cols), col, list(probs),
                            accuracy)
