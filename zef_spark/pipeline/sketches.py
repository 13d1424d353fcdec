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

from .._registry import register_op


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


def hll_profile(df: DataFrame, group_cols: list[str], col: str,
                lgk: int = 12,
                out_col: str = "hll_sketch") -> DataFrame:
    """Per-group Datasketches HLL sketch (binary, mergeable). This is
    the incremental-profiling primitive: build per-shard / per-day
    profiles once, then answer any cross-shard distinct question by
    UNIONING sketches (hll_merge) — no re-scan of the raw data.

    Union of same-lgK sketches merges register state losslessly, but
    the ESTIMATE can differ slightly from a single-pass sketch of the
    same data: Datasketches uses the more accurate HIP estimator for
    a single-stream sketch and falls back to the composite estimator
    after a union. Both stay within the lgK error bound — treat
    estimates as interchangeable within tolerance, not bit-equal."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(col, F.lit(lgk)).alias(out_col))


def hll_merge(profiles: DataFrame, group_cols: list[str],
              sketch_col: str = "hll_sketch") -> DataFrame:
    """Merge shard profiles down to one sketch per group (register
    max — lossless for same-lgK sketches)."""
    return profiles.groupBy(*group_cols).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col))


def hll_profile_estimate(profiles: DataFrame,
                         sketch_col: str = "hll_sketch",
                         out_col: str = "distinct_est") -> DataFrame:
    """Read the distinct estimate off a profile table (row-local)."""
    return profiles.withColumn(
        out_col, F.hll_sketch_estimate(sketch_col))


def _misra_gries_udf(counters: int):
    """Per-partition Misra-Gries heavy-hitter summary over a string
    column: `counters` live counters; a full table decrements all.
    Guarantee: any item with partition frequency > n_part/counters
    survives with estimate undercounted by at most n_part/counters.
    mapInPandas iterates the WHOLE partition, so the dict spans
    batches — O(counters) state per partition, ever."""
    def mg(batches):
        import pandas as pd
        counts: dict = {}
        for pdf in batches:
            for v in pdf["__item"]:
                if v is None:
                    continue
                if v in counts:
                    counts[v] += 1
                elif len(counts) < counters:
                    counts[v] = 1
                else:
                    dead = [k for k in counts
                            if counts[k] == 1]
                    for k in counts:
                        counts[k] -= 1
                    for k in dead:
                        del counts[k]
        yield pd.DataFrame({"item": list(counts),
                            "est": list(counts.values())})
    return mg


def heavy_hitters(df: DataFrame, col, threshold_frac: float = 0.01,
                  counters: int | None = None) -> DataFrame:
    """EXACT frequent items above `threshold_frac` of the stream,
    found at sketch cost: (item, n) for every item with
    count > threshold_frac * N.

    Two-phase candidate + verify (the production heavy-hitter shape):
    1. per-partition Misra-Gries (mapInPandas, O(counters) state) —
       finds every possible heavy hitter; the merged candidate table
       is at most partitions × counters rows, FLAT in cardinality
       (an exact groupBy would shuffle every distinct item);
    2. exact recount of ONLY the candidates (broadcast semi-join
       filter, then a tiny groupBy) and the threshold cut.
    MG guarantees no item above n/counters is missed, so with
    counters >= 2/threshold_frac the result equals the exact
    HAVING-count query — deterministic and oracle-checkable."""
    import math
    counters = counters or max(8, math.ceil(2.0 / threshold_frac))
    items = df.select(F.col(col).cast("string").alias("__item"))
    summaries = items.mapInPandas(
        _misra_gries_udf(counters), "item string, est long")
    cand = summaries.select("item").distinct()
    n = items.count()
    cut = threshold_frac * n
    return (items.join(F.broadcast(cand),
                       items.__item == cand.item)
            .groupBy("item")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > cut))


def theta_intersect_distinct(df: DataFrame, group_cols: list[str],
                             col: str, flag_a, flag_b,
                             lgk: int = 12) -> DataFrame:
    """Estimated |distinct(col) where A ∩ distinct(col) where B| per
    group via theta sketches — the 'users who did BOTH' question that
    exact processing can only answer with a value-level self-join.
    flag_a/flag_b are boolean Columns."""
    agg = df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(F.when(flag_a, F.col(col)), F.lit(lgk))
        .alias("__sa"),
        F.theta_sketch_agg(F.when(flag_b, F.col(col)), F.lit(lgk))
        .alias("__sb"))
    return agg.select(
        *group_cols,
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("__sa"), F.col("__sb")))
        .alias("intersect_est"))


@register_op("heavy_hitters", "df")
def _heavy_hitters_op(df: DataFrame, col, *args, **kw):
    return heavy_hitters(df, col, *args, **kw)
