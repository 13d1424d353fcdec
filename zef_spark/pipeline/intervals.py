"""Interval algebra over event tables: merge overlapping intervals
(union per key), interval coverage, and point-in-merged-span tests.

The classic "gaps and islands" problem: given per-key intervals that
may overlap or nest (user activity spans, maintenance windows, ad
exposures), produce the minimal set of disjoint merged spans. SQL
engines have no native operator; the scalable shape is ONE shuffle on
the key, then two window passes (running max of end -> island flags ->
island ids) and a final per-island aggregate that reuses the same
partitioning. No joins, no explode, no nested loops.

Reference parity: zef represents durations as Quantity values on
relations and leaves interval union to user-space chains; here it is
a first-class operator the streaming/session layer composes with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .._registry import register_op


def merge_intervals(df: DataFrame, start_col: str, end_col: str,
                    by: str | list[str] | None = None,
                    min_gap: str | None = None) -> DataFrame:
    """Collapse overlapping (and, with ``min_gap``, near-adjacent)
    intervals per key into disjoint spans [span_start, span_end] with
    ``n_merged`` source-interval counts.

    Two intervals merge when the next start is <= the running max end
    (+ ``min_gap``, an INTERVAL string like '5 minutes'). One shuffle
    on ``by``; the window sort and the span aggregate share it.
    """
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    w = Window.partitionBy(*by).orderBy(start_col, end_col)
    reach = F.col(end_col) if min_gap is None else (
        F.col(end_col) + F.expr(f"INTERVAL {min_gap}"))
    running_end = F.max(reach).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        running_end.isNull() | (F.col(start_col) > running_end),
        F.lit(1)).otherwise(F.lit(0))
    islands = (df.withColumn("__new", new_island)
               .withColumn("__island", F.sum("__new").over(
                   w.rowsBetween(Window.unboundedPreceding, 0))))
    return (islands.groupBy(*by, "__island")
            .agg(F.min(start_col).alias("span_start"),
                 F.max(end_col).alias("span_end"),
                 F.count(F.lit(1)).alias("n_merged"))
            .drop("__island"))


def interval_coverage(df: DataFrame, start_col: str, end_col: str,
                      by: str | list[str] | None = None,
                      unit: str = "seconds") -> DataFrame:
    """Total covered time per key after merging overlaps (double
    counting removed) plus span count. unit: seconds|minutes|hours.

    Durations sum as EXACT integer microseconds (one long hash agg,
    map-side combinable) with a single double division at the end —
    summing per-span `µs/1e6` doubles would make the total depend on
    partition-visit order (the cross-engine/cross-run sum-order
    hazard); an integer sum cannot."""
    divisor = {"seconds": 1, "minutes": 60, "hours": 3600}[unit]
    spans = merge_intervals(df, start_col, end_col, by)
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    dur_us = (F.unix_micros(F.col("span_end").cast("timestamp"))
              - F.unix_micros(F.col("span_start").cast("timestamp")))
    return (spans.groupBy(*by)
            .agg(F.count(F.lit(1)).alias("n_spans"),
                 (F.sum(dur_us).cast("double")
                  / F.lit(float(1_000_000 * divisor)))
                 .alias(f"covered_{unit}")))


@register_op("merge_intervals", "df")
def _merge_intervals(df, start_col, end_col, by=None, min_gap=None):
    return merge_intervals(df, start_col, end_col, by, min_gap)


@register_op("interval_coverage", "df")
def _interval_coverage(df, start_col, end_col, by=None, unit="seconds"):
    return interval_coverage(df, start_col, end_col, by, unit)
