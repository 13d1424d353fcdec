"""Distributed replacements for keyless (single-partition) windows —
the shared two-phase range-partitioned prefix engine, generalized.

A `Window.orderBy(...)` with no partition spec collapses its entire
input onto ONE task; fine on a bounded vocabulary, fatal on row-sized
input (the r09 ROC trap; r11 sweep found the same shape in
epoch_shuffle / pack_sequences' global mode). The fix is always the
same two-phase plan (abtest.ranksum_agg / evaluation._cum_desc):

  1. `repartitionByRange` on the order columns — Spark range-samples
     the keys, so every partition holds a contiguous slice of the
     total order with ~equal rows;
  2. a LOCAL window partitioned by the range id (normal parallel
     window, no single-partition exchange);
  3. per-range totals collected as ≤ n_ranges rows (bounded driver
     metadata), exclusive-prefix-summed, and broadcast back as
     offsets.

Values are IDENTICAL to the keyless window (the order is total and
ties must be broken by the caller's order columns); only the physical
plan changes. `localCheckpoint` pins partition ids —
`spark_partition_id()` is not stable across recomputation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _ranged(df: DataFrame, order_cols: list[Column],
            n_ranges: int | None):
    spark = df.sparkSession
    if n_ranges is None:
        n_ranges = spark.sparkContext.defaultParallelism
    return (df.repartitionByRange(n_ranges, *order_cols)
            .withColumn("__rid", F.spark_partition_id())
            .localCheckpoint())


def global_cumsums(df: DataFrame, order_cols: list,
                   sums: dict[str, tuple],
                   n_ranges: int | None = None) -> DataFrame:
    """ASC (per the given sort expressions — pass `.desc()` columns
    to point downhill) inclusive running sums over the total order
    `order_cols` (must be total — add a unique tiebreaker unless the
    summed values are tie-invariant), without a single-partition
    window. `sums` maps out_col -> (expr, dtype) with dtype in
    {'long', 'decimal(38,12)'}: per-range totals collect as
    ≤ n_ranges rows and accumulate EXACTLY on the driver (int /
    Decimal — never float, whose addition order would change the
    offsets)."""
    from decimal import Decimal

    from pyspark.sql import Window
    order_cols = [F.col(c) if isinstance(c, str) else c
                  for c in order_cols]
    tmp = df
    for name, (expr, dtype) in sums.items():
        expr = F.col(expr) if isinstance(expr, str) else expr
        tmp = tmp.withColumn(f"__v_{name}", expr.cast(dtype))
    ranged = _ranged(tmp, order_cols, n_ranges)
    w = (Window.partitionBy("__rid").orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, 0))
    local = ranged
    for name in sums:
        local = local.withColumn(name, F.sum(f"__v_{name}").over(w))
    stats = (ranged.groupBy("__rid")
             .agg(*[F.sum(f"__v_{name}").alias(name)
                    for name in sums]))
    rows = sorted((r["__rid"], r) for r in stats.collect())
    zero = {n: (Decimal(0) if "decimal" in d else 0)
            for n, (_, d) in sums.items()}
    offs, acc = [], dict(zero)
    for rid, r in rows:
        offs.append((rid, *[acc[n] for n in sums]))
        for n, (_, d) in sums.items():
            v = r[n]
            if v is not None:
                acc[n] += Decimal(v) if "decimal" in d else int(v)
    schema = "__rid int, " + ", ".join(
        f"__off_{n} {d}" for n, (_, d) in sums.items())
    spark = df.sparkSession
    off_df = spark.createDataFrame(offs, schema)
    out = local.join(F.broadcast(off_df), "__rid")
    for name, (_, d) in sums.items():
        out = out.withColumn(
            name, (F.col(name) + F.col(f"__off_{name}")).cast(d))
    return out.drop("__rid", *[f"__off_{n}" for n in sums],
                    *[f"__v_{n}" for n in sums])


def global_cumsum(df: DataFrame, order_cols: list,
                  sum_col, out_col: str,
                  n_ranges: int | None = None) -> DataFrame:
    """Single-column integer convenience form of `global_cumsums`."""
    return global_cumsums(df, order_cols,
                          {out_col: (sum_col, "long")}, n_ranges)


def global_row_number(df: DataFrame, order_cols: list, out_col: str,
                      n_ranges: int | None = None) -> DataFrame:
    """0-based dense global position over the total order
    `order_cols` — the distributed spelling of
    `row_number().over(Window.orderBy(...)) - 1`."""
    out = global_cumsum(df, order_cols, F.lit(1).cast("long"),
                        out_col, n_ranges)
    return out.withColumn(out_col, F.col(out_col) - 1)
