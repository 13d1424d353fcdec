"""Embedding-column utilities for corpus pipelines: L2 normalization,
group mean-pooling (chunk→doc / class centroids), and deterministic
random projection (Johnson-Lindenstrauss dimensionality reduction).

All three are DataFrame-native (no Python on the hot path):
- `l2_normalize` is a row-local array transform (zero shuffle).
- `mean_pool` explodes to (group, dim) — ONE shuffle keyed by a
  perfectly uniform composite key — and re-assembles the pooled array
  ordered by dimension. Element sums accumulate in DECIMAL so the
  result is partition-order-exact (same policy as
  clustering.kmeans_assign means).
- `random_projection` multiplies by a ±1 sign matrix derived from md5
  (no RNG state): the matrix is literal constants in the plan, so the
  projection is a row-local codegen'd fold, reproducible across
  restarts and replayable in any engine (the oracle embeds the same
  signs; see similarity._plane for the same trick with hyperplanes).

At 100 TB: normalization/projection pipeline with the scan;
mean-pool's shuffle carries one row per (group, dim) — fan-out is
dim×, bounded and uniform; nothing ever collects to the driver.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, functions as F


def l2_normalize(df: DataFrame, vec_col: str,
                 out_col: str = "unit_vec",
                 digits: int = 6) -> DataFrame:
    """v / ||v|| with elements rounded to `digits`; zero vectors pass
    through unchanged (norm guard)."""
    v = F.col(vec_col)
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0),
                             lambda acc, x: acc + x * x))
    return df.withColumn(
        out_col,
        F.when(nrm > 0,
               F.transform(v, lambda x: F.round(x / nrm, digits)))
        .otherwise(F.transform(v, lambda x: x.cast("double"))))


def mean_pool(df: DataFrame, group_col: str, vec_col: str,
              out_col: str = "pooled", digits: int = 6) -> DataFrame:
    """Per-group element-wise mean of `vec_col` → (group_col,
    out_col). DECIMAL-accumulated (exact at any parallelism), final
    value = round(sum/count, digits) in double."""
    exploded = (df.select(F.col(group_col),
                          F.posexplode(F.col(vec_col))
                          .alias("__dim", "__x"))
                .select(group_col, "__dim",
                        F.col("__x").cast("decimal(18,9)").alias("__x")))
    per_dim = (exploded.groupBy(group_col, "__dim")
               .agg((F.sum("__x").cast("double")
                     / F.count(F.lit(1))).alias("__m"))
               .select(group_col, "__dim",
                       F.round("__m", digits).alias("__m")))
    return (per_dim.groupBy(group_col)
            .agg(F.array_sort(F.collect_list(F.struct("__dim", "__m")))
                 .alias("__s"))
            .select(group_col,
                    F.transform("__s", lambda s: s["__m"])
                    .alias(out_col)))


def projection_signs(in_dim: int, out_dim: int,
                     seed: str = "rp_v1") -> list[list[int]]:
    """The ±1 sign matrix (out_dim × in_dim), md5-derived — shared
    with oracle SQL generators so both engines see identical
    constants."""
    return [[1 if int(hashlib.md5(f"{seed}:{j}:{i}".encode())
                      .hexdigest()[:8], 16) % 2 == 0 else -1
             for i in range(in_dim)]
            for j in range(out_dim)]


def random_projection(df: DataFrame, vec_col: str, in_dim: int,
                      out_dim: int, seed: str = "rp_v1",
                      out_col: str = "projected",
                      digits: int = 6) -> DataFrame:
    """Sign-matrix Johnson-Lindenstrauss projection:
    out_j = (Σ_i v_i · s_ji) / sqrt(out_dim), rounded to `digits`.
    Expected pairwise-distance distortion is O(1/sqrt(out_dim)) —
    the standard cheap pre-step before LSH/IVF indexing."""
    signs = projection_signs(in_dim, out_dim, seed)
    scale = 1.0 / math.sqrt(out_dim)
    v = F.col(vec_col)
    comps = [
        F.round(F.aggregate(
            F.zip_with(v, F.array(*[F.lit(float(s)) for s in row]),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x) * F.lit(scale), digits)
        for row in signs]
    return df.withColumn(out_col, F.array(*comps))


from ..ops.core import register_op


@register_op("l2_normalize", "df")
def _l2_op(df: DataFrame, *args, **kw):
    return l2_normalize(df, *args, **kw)


@register_op("mean_pool", "df")
def _pool_op(df: DataFrame, *args, **kw):
    return mean_pool(df, *args, **kw)


@register_op("random_projection", "df")
def _rp_op(df: DataFrame, *args, **kw):
    return random_projection(df, *args, **kw)
