"""Event-sequence analytics over event logs: ordered funnels and
cohort retention — the two queries every product-analytics workload
runs on an events table (and classic test cases for engines with
MATCH_RECOGNIZE; here both are pure join/agg compositions Catalyst
optimizes end-to-end).

Extends the engine's event family (SURVEY.md §2.E/§2.L — sessionize,
session windows, hypertable rollups) with the remaining standard
shapes. No reference counterpart: the reference's event surface stops
at subscription streams (python/zef/core/op_implementations — see
SURVEY.md §2.L); these are engine extras.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..ops.core import register_op


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  within_seconds: int | None = None) -> DataFrame:
    """(step, step_name, n_users): how many users reached each funnel
    step IN ORDER — a user counts for step i+1 only with an event of
    that type strictly after their earliest step-i completion (and,
    with `within_seconds`, within that horizon of their step-0 time).

    Plan shape: step 0 is one user-keyed agg; each later step is one
    filtered scan joined to the (user, prev_ts) frontier — the
    frontier only shrinks, so AQE broadcasts it as soon as it fits,
    and every join/agg shares the user key. k steps cost k
    partition-pruned-by-type scans, never a per-user sort of the
    whole log.
    """
    t = lambda i: f"__t{i}"  # noqa: E731
    frontier = (events.where(F.col(type_col) == steps[0])
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(t(0)))
                .withColumn("__t_first", F.col(t(0))))
    stages = [frontier]
    for i, step in enumerate(steps[1:], start=1):
        cond = F.col(ts_col) > F.col(t(i - 1))
        if within_seconds is not None:
            cond = cond & (
                F.unix_timestamp(ts_col) - F.unix_timestamp("__t_first")
                <= within_seconds)
        frontier = (events.where(F.col(type_col) == step)
                    .join(stages[-1], user_col)
                    .where(cond)
                    .groupBy(user_col)
                    .agg(F.min(ts_col).alias(t(i)),
                         F.min("__t_first").alias("__t_first")))
        stages.append(frontier)
    counts = [
        s.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit(i).alias("step"),
                F.lit(steps[i]).alias("step_name"), "n_users")
        for i, s in enumerate(stages)]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def funnel_users(events: DataFrame, steps: list[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type",
                 within_seconds: int | None = None) -> DataFrame:
    """(user, t0..t_{k-1}): users who completed the WHOLE funnel in
    order, with their earliest valid timestamp per step."""
    # rebuild the frontier chain (cheap: plans, not executions)
    t = lambda i: f"__t{i}"  # noqa: E731
    frontier = (events.where(F.col(type_col) == steps[0])
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(t(0)))
                .withColumn("__t_first", F.col(t(0))))
    keep = [t(0)]
    for i, step in enumerate(steps[1:], start=1):
        cond = F.col(ts_col) > F.col(t(i - 1))
        if within_seconds is not None:
            cond = cond & (
                F.unix_timestamp(ts_col) - F.unix_timestamp("__t_first")
                <= within_seconds)
        carried = [F.min(F.col(c)).alias(c) for c in keep] + \
                  [F.min("__t_first").alias("__t_first")]
        frontier = (events.where(F.col(type_col) == step)
                    .join(frontier, user_col)
                    .where(cond)
                    .groupBy(user_col)
                    .agg(F.min(ts_col).alias(t(i)), *carried))
        keep.append(t(i))
    cols = [user_col] + [F.col(t(i)).alias(f"t{i}")
                         for i in range(len(steps))]
    return frontier.select(*cols)


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """(cohort_week, week_offset, n_users): users grouped by the week
    of their first event; n_users = distinct users of that cohort
    active in cohort_week + week_offset.

    Two user-keyed shuffles (first-seen agg, distinct activity) that
    share a partitioning, then one small agg on (cohort, offset) —
    cardinality weeks², independent of event volume."""
    first = (events.groupBy(user_col)
             .agg(F.date_trunc("week", F.min(ts_col)).cast("date")
                  .alias("cohort_week")))
    active = (events.select(
        user_col,
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("__w"))
        .distinct())
    return (active.join(first, user_col)
            .groupBy("cohort_week",
                     (F.datediff("__w", "cohort_week") / 7)
                     .cast("int").alias("week_offset"))
            .agg(F.countDistinct(user_col).alias("n_users")))


@register_op("funnel", "df")
def _funnel_op(df: DataFrame, steps, *args, **kw):
    return funnel_counts(df, list(steps), *args, **kw)


@register_op("cohort_retention", "df")
def _cohort_op(df: DataFrame, *args, **kw):
    return cohort_retention(df, *args, **kw)
