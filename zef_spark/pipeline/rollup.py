"""Hypertable rollup: multi-granularity time-bucket continuous
aggregates (the TimescaleDB continuous-aggregate / materialized-view
pattern), Spark-first.

- ``hypertable_rollup``: ONE scan + ONE shuffle builds every requested
  granularity at once — each event explodes to (granularity, bucket)
  pairs, then a single groupBy aggregates all levels together. Only
  ALGEBRAIC aggregates (count, sum, min, max) are materialized, so
  partial rollups merge without reprocessing raw data; avg derives as
  sum/count at read time.
- ``refresh_rollup``: incremental maintenance for append-only streams:
  aggregate only the NEW events, union with the stored rollup, and
  re-merge by key — touched buckets combine, untouched buckets pass
  through. No raw-history rescan; at 100 TB the rollup table is
  partitioned by (gran, bucket-date) and the merge rewrites only the
  partitions new data touched (dynamic partition overwrite).
- ``rollup_pick``: query helper — serve a window/aggregation request
  from the coarsest granularity that divides it (scan minimization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket_width_us(gran: str) -> int:
    import pandas as pd
    return int(pd.Timedelta(gran).total_seconds() * 1_000_000)


def hypertable_rollup(events: DataFrame, time_col: str,
                      dims: list[str], value_col: str,
                      granularities: tuple[str, ...] = ("1 hour", "1 day")
                      ) -> DataFrame:
    """(gran, bucket, *dims, n, sum_value, min_value, max_value) for
    every granularity, in one shuffle. Buckets are UTC-epoch-aligned
    (floor of epoch-microseconds), which equals date_trunc for
    hour/day granularities."""
    micros = F.unix_micros(F.col(time_col).cast("timestamp"))
    pairs = F.explode(F.array(*[
        F.struct(
            F.lit(g).alias("gran"),
            F.timestamp_micros(
                (micros.cast("long") - F.pmod(micros, F.lit(
                    _bucket_width_us(g)))).cast("long"))
            .cast("timestamp_ntz").alias("bucket"))
        for g in granularities])).alias("gb")
    return (events
            .select(pairs, *dims,
                    F.col(value_col).cast("decimal(18,6)").alias("__v"))
            .groupBy("gb.gran", "gb.bucket", *dims)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("__v").alias("sum_value"),
                 F.min("__v").alias("min_value"),
                 F.max("__v").alias("max_value")))


def refresh_rollup(stored: DataFrame, new_events: DataFrame,
                   time_col: str, dims: list[str], value_col: str,
                   granularities: tuple[str, ...] = ("1 hour", "1 day")
                   ) -> DataFrame:
    """Merge an existing rollup with freshly-arrived events without
    touching raw history: partial aggregates are algebraic, so
    union + re-aggregate combines them exactly."""
    fresh = hypertable_rollup(new_events, time_col, dims, value_col,
                              granularities)
    return (stored.unionByName(fresh)
            .groupBy("gran", "bucket", *dims)
            .agg(F.sum("n").alias("n"),
                 F.sum("sum_value").alias("sum_value"),
                 F.min("min_value").alias("min_value"),
                 F.max("max_value").alias("max_value")))


def rollup_pick(granularities: tuple[str, ...], window: str) -> str:
    """The coarsest materialized granularity that evenly divides the
    requested window — the continuous-aggregate read path picks it to
    scan the fewest rows."""
    w = _bucket_width_us(window)
    fits = [g for g in granularities if w % _bucket_width_us(g) == 0]
    if not fits:
        raise ValueError(f"no granularity in {granularities} divides "
                         f"{window}")
    return max(fits, key=_bucket_width_us)
