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

from .._registry import register_op


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


def attribution(events: DataFrame, ts_col: str = "ts",
                user_col: str = "user_id",
                type_col: str = "event_type",
                value_col: str = "value",
                touch_type: str = "view",
                convert_type: str = "purchase",
                model: str = "last_touch",
                horizon_seconds: int | None = None) -> DataFrame:
    """Marketing-style conversion attribution over an event log.

    ``last_touch`` / ``first_touch``: each conversion row credits the
    latest / earliest preceding touch of the same user — ONE window
    pass over the user-keyed shuffle (last/first with ignorenulls
    over the ordered prefix), no self-join. With ``horizon_seconds``
    the pick runs over a RANGE frame bounded to the horizon
    ``[conv_ts - horizon, conv_ts)`` — so ``first_touch`` credits the
    earliest touch WITHIN the lookback window (standard
    first-touch-with-lookback semantics), not "earliest touch ever,
    nulled if stale"; same plan shape, still one window pass.

    ``linear``: each conversion splits its value EQUALLY across all
    touches in the horizon — one bounded self-join on (user, time
    band), the stream-joinable interval shape
    (streaming/joins.py stream_interval_join); state is
    horizon-bounded, never unbounded.

    Returns (user, conv_ts, touch_ts, credit): conversions with no
    eligible touch surface with NULL touch_ts and full credit
    (the 'direct' bucket) so Σcredit == Σ converted value exactly.
    """
    from pyspark.sql import Window
    u, t, ty = F.col(user_col), F.col(ts_col), F.col(type_col)
    v = F.col(value_col)
    if model in ("last_touch", "first_touch"):
        touch_ts = F.when(ty == touch_type, t)
        if horizon_seconds is None:
            w = (Window.partitionBy(user_col).orderBy(ts_col)
                 .rowsBetween(Window.unboundedPreceding, -1))
        else:
            # bound the frame to the horizon itself so first_touch
            # picks the earliest touch INSIDE the window, not the
            # earliest ever (ADVICE r06). Range frame on microsecond
            # offsets: [conv - horizon, conv) — inclusive lower bound
            # matches the former post-filter's >=; the -1 upper bound
            # excludes same-instant touches deterministically.
            h_us = int(horizon_seconds) * 1_000_000
            w = (Window.partitionBy(user_col)
                 .orderBy(F.unix_micros(t.cast("timestamp")))
                 .rangeBetween(-h_us, -1))
        pick = (F.last(touch_ts, ignorenulls=True).over(w)
                if model == "last_touch"
                else F.first(touch_ts, ignorenulls=True).over(w))
        return (events.select(u.alias("user"), t.alias("conv_ts"),
                              ty.alias("__ty"), v.alias("__v"),
                              pick.alias("touch_ts"))
                .where(F.col("__ty") == convert_type)
                .select("user", "conv_ts", "touch_ts",
                        F.col("__v").alias("credit")))
    if model != "linear":
        raise ValueError(
            f"model must be last_touch/first_touch/linear, got {model!r}")
    if horizon_seconds is None:
        raise ValueError("linear attribution requires horizon_seconds "
                         "(unbounded lookback would be unbounded "
                         "join state)")
    conv = (events.where(ty == convert_type)
            .select(u.alias("user"), t.alias("conv_ts"),
                    v.alias("__v")))
    touch = (events.where(ty == touch_type)
             .select(u.alias("user"), t.alias("touch_ts")))
    h = F.expr(f"INTERVAL {int(horizon_seconds)} SECOND")
    pairs = conv.join(
        touch, (conv.user == touch.user)
        & (touch.touch_ts < conv.conv_ts)
        & (touch.touch_ts >= conv.conv_ts - h)) \
        .select(conv.user, "conv_ts", "touch_ts", "__v")
    w = Window.partitionBy("user", "conv_ts")
    shared = pairs.select(
        "user", "conv_ts", "touch_ts",
        (F.col("__v") / F.count(F.lit(1)).over(w)).alias("credit"))
    direct = (conv.join(pairs.select("user", "conv_ts").distinct(),
                        ["user", "conv_ts"], "left_anti")
              .select("user", "conv_ts",
                      F.lit(None).cast("timestamp_ntz")
                      .alias("touch_ts"),
                      F.col("__v").alias("credit")))
    return shared.unionByName(direct)


@register_op("attribution", "df")
def _attribution_op(df, *args, **kw):
    return attribution(df, *args, **kw)


def event_transitions(events: DataFrame, ts_col: str = "ts",
                      user_col: str = "user_id",
                      type_col: str = "event_type",
                      tiebreak_col: str | None = None,
                      digits: int = 6) -> DataFrame:
    """(prev, next, n, p) — the first-order Markov transition matrix
    of the event stream: per user, consecutive event-type pairs in
    time order, counted corpus-wide; p = n / Σn over the same prev
    (a window over the |types|²-sized result, not the data).

    ONE user-keyed shuffle (the lead window); the pair count is a
    map-side-combined hash agg on a |types|²-bounded key space. The
    behavioral-model primitive funnels don't give you (what happens
    AFTER any state, not along one fixed path)."""
    from pyspark.sql import Window
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (events.select(
        F.col(type_col).alias("prev"),
        F.lead(type_col).over(w).alias("next"))
        .where(F.col("next").isNotNull()))
    counts = pairs.groupBy("prev", "next").agg(
        F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("prev")
    return counts.select(
        "prev", "next", "n",
        F.round(F.col("n") / F.sum("n").over(tot), digits).alias("p"))


@register_op("event_transitions", "df")
def _event_transitions_op(df, *args, **kw):
    return event_transitions(df, *args, **kw)


def rfm_segments(events: DataFrame, ts_col: str = "ts",
                 user_col: str = "user_id",
                 type_col: str = "event_type",
                 value_col: str = "value",
                 convert_type: str = "purchase",
                 n_tiles: int = 5, as_of=None) -> DataFrame:
    """(user, recency_days, frequency, monetary, r, f, m, segment) —
    RFM customer segmentation: per-user recency (days since last
    conversion, against ``as_of`` or the corpus max), frequency
    (conversion count) and monetary (summed value), each scored into
    ``n_tiles`` quantile tiles via ntile, concatenated into the
    classic 'rfm' segment code (r tiles ordered so HIGH = recent).

    Plan: ONE user-keyed aggregate (+ a 1-row broadcast max when
    as_of is derived) + three ntile windows over the |users|-sized
    aggregate — windows run on the small aggregate, never the event
    log. Ties order deterministically by (metric, user) so the tile
    boundaries are engine-reproducible. Monetary sums in DECIMAL —
    partition-order-exact.

    The tile assignment (r11, de-scale-trapped) runs three
    range-partitioned global ranks (distkit global_row_number) plus
    the closed-form NTILE bucket — bucket b of n rows over t tiles
    holds n/t rows, the first n%t buckets one extra, exactly the SQL
    NTILE definition both engines share — replacing the former three
    keyless ntile windows that put the whole |users| aggregate on
    one task each (found by the r11 keyless-window sweep). Values
    are identical; the plan is fully partitioned at any user count."""
    from .distkit import global_row_number
    conv = events.where(F.col(type_col) == convert_type)
    per_user = conv.groupBy(F.col(user_col).alias("user")).agg(
        F.max(ts_col).alias("__last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(value_col).cast("decimal(18,2)"))
        .alias("monetary"))
    if as_of is None:
        mx = conv.agg(F.max(ts_col).alias("__asof"))
        per_user = per_user.crossJoin(F.broadcast(mx))
    else:
        per_user = per_user.withColumn("__asof", F.lit(as_of)
                                       .cast("timestamp_ntz"))
    scored = per_user.withColumn(
        "recency_days",
        F.datediff(F.col("__asof").cast("date"),
                   F.col("__last").cast("date")))
    n_users = scored.agg(F.count(F.lit(1)).alias("__nu"))

    def tile(df, order_cols, out_name):
        d = global_row_number(df, order_cols, "__rk")
        rk = F.col("__rk") + 1  # 1-based rank
        q = F.floor(F.col("__nu") / n_tiles)  # base bucket size
        rem = F.col("__nu") % n_tiles  # first `rem` buckets get +1
        # CASE evaluates lazily, so the q=0 division (n < tiles)
        # never runs: rk <= rem*(q+1) = n is then always true
        b = (F.when(rk <= rem * (q + 1), F.ceil(rk / (q + 1)))
             .otherwise(rem + F.ceil((rk - rem * (q + 1)) / q)))
        return d.withColumn(out_name, b.cast("int")).drop("__rk")

    out = scored.crossJoin(F.broadcast(n_users))
    out = tile(out, [F.desc("recency_days"), F.asc("user")], "r")
    out = tile(out, [F.asc("frequency"), F.asc("user")], "f")
    out = tile(out, [F.asc("monetary"), F.asc("user")], "m")
    return out.select(
        "user", "recency_days", "frequency", "monetary", "r", "f", "m",
        F.concat_ws("", F.col("r"), F.col("f"), F.col("m"))
        .alias("segment"))


@register_op("rfm_segments", "df")
def _rfm_op(df, *args, **kw):
    return rfm_segments(df, *args, **kw)


def session_paths(events: DataFrame, ts_col: str = "ts",
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  gap_seconds: int = 1800, max_len: int = 5,
                  tiebreak_col: str | None = None) -> DataFrame:
    """(path, n_sessions) — the corpus-wide frequency of each
    session's opening event-type sequence (first ``max_len`` events,
    joined with '>'): the "top user journeys" report product
    analytics builds on top of sessionization.

    Sessions are the deterministic lag-gap form (new session when the
    gap to the previous event exceeds ``gap_seconds``; same shape as
    the sessionize query family). Plan: ONE user-keyed shuffle does
    the lag + session numbering + per-session rank; the path
    assembles row-locally (sorted struct collect per session — each
    session's events are already co-partitioned), and the final count
    is a paths-bounded hash agg. Ties inside a session order by
    (ts, tiebreak_col) so the path string is engine-reproducible."""
    from pyspark.sql import Window
    from .distkit import spread_keyed
    # r12 (guide §2.5): pin the user-keyed exchange wide on tiny
    # inputs — AQE otherwise coalesces the few-MB shuffle onto 1-2
    # tasks and the whole per-user window chain serializes (measured
    # 0.79 -> 0.66 s for session_paths at sf0.1). No-op on wide
    # inputs; per-user values are partitioning-invariant.
    events = spread_keyed(events, [user_col])
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    gap = (F.unix_micros(F.col(ts_col).cast("timestamp"))
           - F.unix_micros(F.lag(ts_col).over(w).cast("timestamp")))
    new_s = F.when(gap.isNull()
                   | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    sess = (events.withColumn("__s", F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy(user_col, "__s").orderBy(*order))))
    keep = sess.where(F.col("__rn") <= max_len)
    entry = F.struct(*[F.col(c) for c in order],
                     F.col(type_col).alias("__ty"))
    paths = (keep.groupBy(user_col, "__s")
             .agg(F.array_join(
                 F.transform(F.array_sort(F.collect_list(entry)),
                             lambda s: s["__ty"]), ">").alias("path")))
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"))


@register_op("session_paths", "df")
def _session_paths_op(df, *args, **kw):
    return session_paths(df, *args, **kw)


def sessions_table(events: DataFrame, ts_col: str = "ts",
                   user_col: str = "user_id",
                   gap_seconds: int = 1800,
                   tiebreak_col: str | None = None) -> DataFrame:
    """(user, session_start, session_end, n_events) — lag-gap
    sessionization as a TABLE (the deterministic batch twin of
    streaming/events.py sessionized): new session when the gap to
    the previous event exceeds ``gap_seconds``. One user-keyed
    shuffle (lag + running session number + the closing agg share
    it)."""
    from pyspark.sql import Window
    # (r12: spread_keyed measured a wash here — the lag+sum chain is
    # light per row, unlike session_paths' rank/collect chain; see
    # OPTIMIZATION_r12.md.)
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    gap = (F.unix_micros(F.col(ts_col).cast("timestamp"))
           - F.unix_micros(F.lag(ts_col).over(w).cast("timestamp")))
    new_s = F.when(gap.isNull()
                   | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return (events.withColumn("__s", F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(F.col(user_col).alias("user"), "__s")
        .agg(F.min(ts_col).alias("session_start"),
             F.max(ts_col).alias("session_end"),
             F.count(F.lit(1)).alias("n_events"))
        .drop("__s"))


def funnel_time_stats(events: DataFrame, steps: list[str],
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      within_seconds: int | None = None,
                      ps: tuple[float, ...] = (0.5, 0.9)) -> DataFrame:
    """(step, step_name, n, p50, p90, ..., mean_seconds) — how long
    each funnel transition takes among users who completed the WHOLE
    funnel in order: per adjacent step pair, exact percentiles
    (PERCENTILE_DISC integer-rank — engine-exact, tie-independent)
    and the mean of the step-to-step gap in seconds. The question
    funnel_counts can't answer: not how many users drop, but where
    the surviving users stall.

    Plan: the funnel_users frontier chain (k type-pruned scans over a
    shrinking user key), then ONE (step)-keyed window + agg over the
    completer gaps — |completers|·(k−1) rows, far smaller than the
    log. Gaps are integer microseconds (exact sums for the mean)
    surfaced as double seconds."""
    from functools import reduce
    from ..ops.df_ops import group_percentiles
    fu = funnel_users(events, steps, user_col, ts_col, type_col,
                      within_seconds)
    parts = []
    for i in range(1, len(steps)):
        us = (F.unix_micros(F.col(f"t{i}").cast("timestamp"))
              - F.unix_micros(F.col(f"t{i-1}").cast("timestamp")))
        parts.append(fu.select(
            F.lit(i).alias("step"),
            F.lit(steps[i]).alias("step_name"),
            us.alias("__us"),
            (us / F.lit(1_000_000.0)).alias("gap_seconds")))
    longf = reduce(lambda a, b: a.unionByName(b), parts)
    pct = group_percentiles(longf, ["step", "step_name"],
                            "gap_seconds", ps)
    mean = (longf.groupBy("step", "step_name")
            .agg(F.round((F.sum("__us").cast("double")
                          / F.count(F.lit(1))) / 1_000_000.0, 6)
                 .alias("mean_seconds")))
    return pct.join(mean, ["step", "step_name"])


@register_op("funnel_time_stats", "df")
def _funnel_time_stats_op(df, steps, *args, **kw):
    return funnel_time_stats(df, list(steps), *args, **kw)


def kaplan_meier(subjects: DataFrame, duration_col: str,
                 observed_col: str, digits: int = 6) -> DataFrame:
    """(duration, n_at_risk, n_deaths, n_censored, survival) — the
    Kaplan-Meier product-limit survival estimate over right-censored
    subjects: each input row is one subject with a ``duration`` and
    ``observed`` (1 = the event happened at that duration, 0 =
    censored — observation ended while the subject was still alive).

        S(d) = Π_{dᵢ ≤ d} (1 − deaths_i / at_risk_i)

    at_risk_i counts subjects with duration ≥ dᵢ (censored subjects
    leave the risk set after their censor time — exactly what naive
    ECDFs get wrong). Retention/churn/session-length curves under
    partial observation; reference analogue: hand-assembled
    group_by + scan chains (ITF `scan`).

    Plan (r11, de-scale-trapped): ONE duration-keyed hash agg
    collapses subjects (map-side combinable), then the cumulative
    at-risk / log-product sums over the DURATION table run on the
    range-partitioned two-phase prefix engine (distkit
    global_cumsums) — on a CONTINUOUS duration the distinct-duration
    table is row-sized and the former keyless windows collapsed it
    onto one task (the same class as the r09 ROC trap; found by the
    r11 keyless-window sweep). The product is exp∘Σln with per-term
    decimal-12 rounding (cross-engine bit-stable), the log terms
    summed EXACTLY in decimal through the per-range offsets; a zero
    factor (risk set exhausted by deaths) pins survival to exactly 0
    from that duration on, avoiding ln(0)."""
    from .distkit import global_cumsums
    dec = "decimal(38,12)"
    km = (subjects.groupBy(F.col(duration_col).alias("duration"))
          .agg(F.sum(F.col(observed_col).cast("long"))
               .alias("n_deaths"),
               F.count(F.lit(1)).alias("__tot")))
    # pass 1 (desc order): at_risk = subjects with duration >= d
    r = global_cumsums(km, [F.col("duration").desc()],
                       {"at_risk": ("__tot", "long")})
    ratio = F.lit(1.0) - F.col("n_deaths") \
        / F.col("at_risk").cast("double")
    # pass 2 (asc order): running Σ ln(ratio) + zero-factor flag
    term = F.coalesce(
        F.when(ratio > 0, F.round(F.log(ratio), 12).cast(dec)),
        F.lit(0).cast(dec))
    r = global_cumsums(
        r.withColumn("__z", (ratio == 0).cast("long")),
        ["duration"],
        {"__logsum": (term, dec), "__zeros": ("__z", "long")})
    surv = F.when(F.col("__zeros") > 0, F.lit(0.0)) \
        .otherwise(F.round(F.exp(F.col("__logsum").cast("double")),
                           digits))
    return (r.select("duration",
                     F.col("at_risk").alias("n_at_risk"),
                     "n_deaths",
                     (F.col("__tot") - F.col("n_deaths"))
                     .alias("n_censored"),
                     surv.alias("survival")))


@register_op("kaplan_meier", "df")
def _km_op(df, *args, **kw):
    return kaplan_meier(df, *args, **kw)
