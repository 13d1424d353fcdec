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


def gapfill(df: DataFrame, time_col: str, gran: str,
            dims: list[str], value_col: str,
            start=None, end=None, digits: int = 6) -> DataFrame:
    """Dense time-bucket gap filling (TimescaleDB
    time_bucket_gapfill + locf + interpolate, Spark-first): every
    (dims, bucket) combination over [start, end] gets a row, with
    three fill columns alongside the raw value —
    `locf` (last observation carried forward), `interp` (linear
    between the neighboring observations, locf at the trailing edge),
    and `zero` (missing = 0).

    Plan shape: the bucket spine is ONE tiny agg (global min/max when
    start/end omitted) + a distinct-dims agg, cross-joined broadcast —
    spine size is |dims|×|buckets|, independent of event volume; the
    data joins the spine on (dims, bucket) and the fills are window
    functions partitioned by dims (one shuffle, keyed by the same
    dims). Values stay DECIMAL through locf/zero; interp's ratio is
    the only float step, rounded to `digits`."""
    step = _bucket_width_us(gran)
    spark = df.sparkSession
    t = F.col(time_col)
    if start is None or end is None:
        lo, hi = (df.agg(F.min(t), F.max(t)).collect()[0])
        start = start or lo
        end = end or hi
    bounds = spark.createDataFrame([(start, end)],
                                   f"__lo timestamp_ntz, __hi timestamp_ntz")
    spine_t = (bounds.select(
        F.explode(F.sequence(F.unix_micros(F.col("__lo").cast("timestamp")),
                             F.unix_micros(F.col("__hi").cast("timestamp")),
                             F.lit(step)))
        .alias("__us"))
        .select(F.timestamp_micros(F.col("__us"))
                .cast("timestamp_ntz").alias(time_col)))
    spine = (df.select(*dims).distinct().crossJoin(F.broadcast(spine_t))
             if dims else spine_t)
    joined = spine.join(df, [*dims, time_col], "left")
    v = F.col(value_col)
    from pyspark.sql import Window
    w_prev = (Window.partitionBy(*dims).orderBy(time_col)
              .rowsBetween(Window.unboundedPreceding, 0))
    w_next = (Window.partitionBy(*dims).orderBy(time_col)
              .rowsBetween(0, Window.unboundedFollowing))
    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    next_v = F.first(v, ignorenulls=True).over(w_next)
    t_obs = F.when(v.isNotNull(), F.col(time_col))
    prev_t = F.last(t_obs, ignorenulls=True).over(w_prev)
    next_t = F.first(t_obs, ignorenulls=True).over(w_next)
    frac = ((F.unix_micros(F.col(time_col).cast("timestamp"))
             - F.unix_micros(prev_t.cast("timestamp"))).cast("double")
            / (F.unix_micros(next_t.cast("timestamp"))
               - F.unix_micros(prev_t.cast("timestamp"))).cast("double"))
    interp = (F.when(v.isNotNull(), v.cast("double"))
              .when(prev_v.isNotNull() & next_v.isNotNull(),
                    F.round(prev_v.cast("double")
                            + (next_v.cast("double")
                               - prev_v.cast("double")) * frac, digits))
              .otherwise(prev_v.cast("double")))
    zero_lit = F.lit(0).cast(joined.schema[value_col].dataType)
    return joined.select(
        *dims, time_col, v.alias(value_col),
        prev_v.alias("locf"),
        interp.alias("interp"),
        F.coalesce(v, zero_lit).alias("zero"))


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


def ewma(df, key, ts_col: str, value_col: str, alpha: float,
         out_col: str = "ewma", digits: int | None = None):
    """Per-key exponentially weighted moving average:
    y_1 = x_1; y_t = (1-alpha)*y_{t-1} + alpha*x_t. A linear
    recursion — NOT expressible as a Spark window function, and the
    closed-form rewrite overflows double for long series — so it runs
    as a grouped Arrow kernel: one shuffle on the key, each key's
    series folds inside its pandas batch.

    The fold is written as literally `(1-a)*y + a*x` (not pandas
    .ewm(), whose internal weighted-average form differs in final
    ulps) so an engine replaying the same IEEE expression — e.g. a
    recursive-CTE oracle — reproduces it bit-for-bit before the
    `digits` round."""
    from pyspark.sql import functions as F  # noqa: F811
    keys = [key] if isinstance(key, str) else list(key)
    fields = ", ".join(f"{c} {t}" for c, t in df.dtypes) \
        + f", {out_col} double"
    one_minus, a = 1.0 - alpha, alpha

    def fold(pdf):
        pdf = pdf.sort_values(ts_col).copy()
        out, y = [], None
        for x in pdf[value_col].astype(float):
            y = x if y is None else one_minus * y + a * x
            out.append(y)
        pdf[out_col] = out
        return pdf

    res = df.groupBy(*keys).applyInPandas(fold, fields)
    # digits=None (default) returns the raw fold doubles — they are
    # bit-identical to any engine replaying the same IEEE expression,
    # while ROUND paths differ near decimal boundaries (Spark rounds
    # the shortest decimal repr, DuckDB the scaled binary value).
    if digits is None:
        return res
    return res.withColumn(out_col, F.round(F.col(out_col), digits))


from .._registry import register_op as _reg_rollup  # noqa: E402


@_reg_rollup("ewma", "df")
def _ewma_op(df, key, ts_col, value_col, alpha, out_col="ewma",
             digits=6):
    return ewma(df, key, ts_col, value_col, alpha, out_col, digits)


def sliding_count(df, ts_col: str, by, window_seconds: int,
                  out_col: str = "n_in_window"):
    """Per-row count of same-key rows inside the trailing time window
    (event-time sliding count): RANGE BETWEEN window over the epoch
    seconds — ONE shuffle on the key, executed as a native window
    (no self-join, no explode-per-second). The window frame is
    streaming-friendly: the same semantics run incrementally under a
    watermark with a ragged state buffer. The frame is computed in
    MICROSECONDS (unix_micros) so sub-second event times land on the
    exact boundary an interval comparison would give."""
    from pyspark.sql import Window, functions as F
    by = [by] if isinstance(by, str) else list(by)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (Window.partitionBy(*by).orderBy(us.asc())
         .rangeBetween(-window_seconds * 1_000_000, 0))
    return df.withColumn(out_col, F.count(F.lit(1)).over(w))


def rate_limit(df, ts_col: str, by, window_seconds: int,
               max_events: int, out_col: str = "limited"):
    """Flag rows that exceed ``max_events`` per key within any
    trailing ``window_seconds`` (API-gateway / abuse-control audit,
    run in batch over the event log). Adds the trailing count and a
    boolean; same single-shuffle RANGE window as sliding_count."""
    from pyspark.sql import functions as F
    out = sliding_count(df, ts_col, by, window_seconds,
                        out_col="n_in_window")
    return out.withColumn(out_col,
                          F.col("n_in_window") > F.lit(max_events))


def late_data_audit(df, ts_col: str, arrival_col: str, by=None,
                    late_seconds: int = 1800):
    """Out-of-orderness audit for watermark design: replay events in
    ARRIVAL order (``arrival_col`` — an ingest sequence/offset), track
    the running event-time high-water mark per key, and measure how
    far each event lags it. Adds ``lag_seconds`` (0 for in-order
    rows) and ``is_late`` (lag > late_seconds — the rows a streaming
    watermark of that bound would drop). One shuffle on the key; the
    running max is a native cumulative window. Lag is measured in
    microseconds internally (sub-second event times count), reported
    as floored whole seconds."""
    from pyspark.sql import Window, functions as F
    keys = ([] if by is None
            else [by] if isinstance(by, str) else list(by))
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (Window.partitionBy(*keys).orderBy(F.col(arrival_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    high = F.max(us).over(w)
    lag_us = F.greatest(F.coalesce(high - us, F.lit(0)), F.lit(0))
    return (df.withColumn("lag_seconds",
                          F.floor(lag_us / 1_000_000).cast("long"))
            .withColumn("is_late",
                        lag_us > F.lit(late_seconds * 1_000_000)))


@_reg_rollup("sliding_count", "df")
def _sliding_count_op(df, ts_col, by, window_seconds,
                      out_col="n_in_window"):
    return sliding_count(df, ts_col, by, window_seconds, out_col)


@_reg_rollup("rate_limit", "df")
def _rate_limit_op(df, ts_col, by, window_seconds, max_events,
                   out_col="limited"):
    return rate_limit(df, ts_col, by, window_seconds, max_events,
                      out_col)


@_reg_rollup("late_data_audit", "df")
def _late_audit_op(df, ts_col, arrival_col, by=None,
                   late_seconds=1800):
    return late_data_audit(df, ts_col, arrival_col, by, late_seconds)


class StreamingRollup:
    """Continuous hypertable rollup: a foreachBatch sink that keeps a
    persisted multi-granularity aggregate table up to date as events
    stream in — the streaming half of hypertable_rollup, with
    exactly-once semantics on top of foreachBatch's at-least-once.

    Per micro-batch: roll up the batch (one shuffle over BATCH rows
    only), algebraically merge into the stored partials (union +
    re-aggregate — partial aggregates are algebraic, so replay-free
    merge is exact), and rewrite the rollup table, which is
    bucket-count-sized — granularities × buckets × dims, METADATA
    scale, not event scale, so the rewrite stays cheap at any event
    volume.

    Exactly-once: the applied-batch ledger lives INSIDE the table
    directory as ``_applied/`` (the underscore prefix hides it from
    Spark's data readers), so the directory swap commits the merged
    partials AND the batch mark together (layout.atomic_dir_swap). A
    crash mid-swap leaves the old table recoverable at ``__old``;
    every apply_batch heals that first (layout.recover_dir_swap), so
    any crash point resolves to either the old table without the mark
    (clean retry) or the new table with it (replay skipped) —
    double-merge is impossible."""

    def __init__(self, path: str, time_col: str, dims: list[str],
                 value_col: str,
                 granularities: tuple[str, ...] = ("1 hour", "1 day"),
                 stream_id: str = "r1"):
        self.path = path
        self.time_col = time_col
        self.dims = list(dims)
        self.value_col = value_col
        self.granularities = tuple(granularities)
        self.stream_id = stream_id

    def _applied(self, spark) -> set:
        import os
        from .layout import recover_dir_swap
        recover_dir_swap(f"{self.path}/rollup")
        p = f"{self.path}/rollup/_applied"
        if not os.path.exists(p):
            return set()
        return {r[0] for r in spark.read.parquet(p).collect()}

    def apply_batch(self, batch_df, batch_id: int) -> bool:
        import os
        from pyspark.sql import functions as F  # noqa: F811
        from .layout import atomic_dir_swap
        spark = batch_df.sparkSession
        key = f"{self.stream_id}:{batch_id}"
        applied = self._applied(spark)     # also heals a crashed swap
        if key in applied:
            return False
        fresh = hypertable_rollup(batch_df, self.time_col, self.dims,
                                  self.value_col, self.granularities)
        table = f"{self.path}/rollup"
        if os.path.exists(table):
            stored = spark.read.parquet(table)
            merged = (stored.unionByName(fresh)
                      .groupBy("gran", "bucket", *self.dims)
                      .agg(F.sum("n").alias("n"),
                           F.sum("sum_value").alias("sum_value"),
                           F.min("min_value").alias("min_value"),
                           F.max("max_value").alias("max_value")))
        else:
            merged = fresh
        tmp = f"{table}__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        # the mark commits WITH the data in one swap (see class doc)
        spark.createDataFrame([(k,) for k in applied | {key}],
                              "batch_key string") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(f"{tmp}/_applied")
        atomic_dir_swap(tmp, table)
        return True

    def read(self, spark):
        return spark.read.parquet(f"{self.path}/rollup")


def stream_rollup(stream_df, path: str, time_col: str,
                  dims: list[str], value_col: str,
                  granularities: tuple[str, ...] = ("1 hour", "1 day"),
                  checkpoint: str | None = None, once: bool = True):
    """Run a stream into a StreamingRollup sink. once=True drains all
    available input and returns the StreamingRollup (read() for the
    table); otherwise returns (rollup, StreamingQuery)."""
    r = StreamingRollup(path, time_col, dims, value_col, granularities)
    writer = stream_df.writeStream.foreachBatch(r.apply_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return r
    return r, writer.start()


def time_weighted_avg(df, ts_col: str, value_col: str, by,
                      gran: str = "1 day", digits: int = 6):
    """(by..., bucket, twa, n_points) — TIME-weighted average per
    bucket (TimescaleDB time_weight, LOCF form): each observation
    holds until the next one in the same key+bucket; the last holds
    to the bucket's end; the first observation's value also covers
    the bucket from its start (LOCF back-extension, matching a gauge
    that had that value when the bucket opened). Equal-weighting
    AVG overweights bursts of samples — a sensor that reports 100×/s
    for one minute must not dominate the day. ONE shuffle (the
    key+bucket window and the final agg share partitioning);
    microsecond arithmetic, engine-replayable."""
    from pyspark.sql import Window, functions as F
    keys = [by] if isinstance(by, str) else list(by)
    width = _bucket_width_us(gran)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket_us = (us - F.pmod(us, F.lit(width))).cast("long")
    base = df.select(*keys, us.alias("__us"),
                     bucket_us.alias("__b"),
                     F.col(value_col).cast("double").alias("__v"))
    w = Window.partitionBy(*keys, "__b").orderBy("__us")
    nxt = F.lead("__us").over(w)
    first = F.row_number().over(w) == 1
    hold = (F.coalesce(nxt, F.col("__b") + F.lit(width))
            - F.col("__us")
            # LOCF back-extension: the first point also covers
            # [bucket_start, first_ts)
            + F.when(first, F.col("__us") - F.col("__b"))
            .otherwise(F.lit(0)))
    weighted = base.withColumn("__w", hold.cast("double"))
    return (weighted.groupBy(*keys, F.timestamp_micros(F.col("__b"))
                             .cast("timestamp_ntz").alias("bucket"))
            .agg(F.round(F.sum(F.col("__v") * F.col("__w"))
                         / F.sum("__w"), digits).alias("twa"),
                 F.count(F.lit(1)).alias("n_points")))


@_reg_rollup("time_weighted_avg", "df")
def _twa_op(df, ts_col, value_col, by, gran="1 day", digits=6):
    return time_weighted_avg(df, ts_col, value_col, by, gran, digits)


def ohlc_bars(df, ts_col: str, value_col: str, by,
              gran: str = "1 day", digits: int = 6):
    """(by..., bucket, open, high, low, close, n) — OHLC candlestick
    bars per time bucket: open/close are the first/last observation
    ordered by (event time, value) — the value component breaks
    tied timestamps deterministically, since arrival order is not
    reproducible across engines. ONE hash aggregate with
    min_by/max_by — no window, no sort, one shuffle keyed by
    (key, bucket). The financial-rollup shape that equal-weight
    aggregates can't express."""
    from pyspark.sql import functions as F
    keys = [by] if isinstance(by, str) else list(by)
    width = _bucket_width_us(gran)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    b = (us - F.pmod(us, F.lit(width))).cast("long")
    v = F.col(value_col).cast("double")
    base = df.select(*keys, b.alias("__b"), us.alias("__us"),
                     v.alias("__v"))
    # deterministic even with ts ties: order by (ts, value)
    ordkey = F.struct(F.col("__us"), F.col("__v"))
    return (base.groupBy(*keys, F.timestamp_micros(F.col("__b"))
                         .cast("timestamp_ntz").alias("bucket"))
            .agg(F.round(F.min_by("__v", ordkey), digits).alias("open"),
                 F.round(F.max("__v"), digits).alias("high"),
                 F.round(F.min("__v"), digits).alias("low"),
                 F.round(F.max_by("__v", ordkey), digits).alias("close"),
                 F.count(F.lit(1)).alias("n")))


@_reg_rollup("ohlc_bars", "df")
def _ohlc_op(df, ts_col, value_col, by, gran="1 day", digits=6):
    return ohlc_bars(df, ts_col, value_col, by, gran, digits)


def rolling_anomalies(df, ts_col: str, value_col: str, by,
                      window_seconds: int = 3600,
                      z_threshold: float = 3.0,
                      min_points: int = 5, digits: int = 6):
    """Adds ``roll_mean``, ``roll_std``, ``z`` and ``is_anomaly``:
    each observation scored against the TRAILING window of its key's
    PRIOR observations (the current row is excluded — scoring a point
    against a baseline that contains it shrinks every spike). ONE
    native RANGE window in microseconds, one shuffle on the key;
    rows with fewer than ``min_points`` of history score NULL (no
    baseline, no false flag). The streaming-monitoring shape that
    runs identically under a watermark."""
    from pyspark.sql import Window, functions as F
    keys = [by] if isinstance(by, str) else list(by)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    v = F.col(value_col).cast("double")
    w = (Window.partitionBy(*keys).orderBy(us.asc())
         .rangeBetween(-window_seconds * 1_000_000, -1))
    mean = F.avg(v).over(w)
    std = F.stddev_samp(v).over(w)
    npts = F.count(v).over(w)
    ok = (npts >= min_points) & (std > 0)
    z = F.when(ok, F.round((v - mean) / std, digits))
    return (df.withColumn("roll_mean",
                          F.when(npts >= min_points,
                                 F.round(mean, digits)))
            .withColumn("roll_std", F.when(ok, F.round(std, digits)))
            .withColumn("z", z)
            .withColumn("is_anomaly",
                        F.coalesce(F.abs(z) > z_threshold,
                                   F.lit(False))))


@_reg_rollup("rolling_anomalies", "df")
def _roll_anom_op(df, ts_col, value_col, by, window_seconds=3600,
                  z_threshold=3.0, min_points=5, digits=6):
    return rolling_anomalies(df, ts_col, value_col, by,
                             window_seconds, z_threshold, min_points,
                             digits)


def cusum(df, key, ts_col: str, value_col: str, target: float,
          slack: float, threshold: float,
          reset_on_alarm: bool = False):
    """Per-key CUSUM change-point detection (Page 1954): the
    one-sided cumulative-sum recursions

        s⁺_t = max(0, s⁺_{t-1} + (x_t − target − slack))
        s⁻_t = min(0, s⁻_{t-1} + (x_t − target + slack))

    with ``alarm`` = |s| > threshold — drift detection windows can't
    express (each step clamps, so it is a NON-linear recursion; same
    regime as ewma). Grouped Arrow kernel: one shuffle on the key,
    each key's series folds in its pandas batch, raw IEEE doubles
    out (bit-replayable by a recursive-CTE oracle — no rounding).
    ``reset_on_alarm`` restarts the statistic after each alarm (the
    classic sequential-test protocol); default keeps accumulating so
    the statistic is a pure fold of the series.

    ``target``/``slack``/``threshold`` are explicit constants: derive
    them from a reference window (e.g. mean/σ of last week's data)
    OUTSIDE the fold so the detector is reproducible and the fold
    stays engine-exact."""
    from pyspark.sql import functions as F  # noqa: F811
    keys = [key] if isinstance(key, str) else list(key)
    fields = ", ".join(f"{c} {t}" for c, t in df.dtypes) \
        + ", s_pos double, s_neg double, alarm boolean"
    t0, k0, h0 = float(target), float(slack), float(threshold)

    def fold(pdf):
        pdf = pdf.sort_values(ts_col).copy()
        sp = sn = 0.0
        pos, neg, alarms = [], [], []
        for x in pdf[value_col].astype(float):
            sp = max(0.0, sp + (x - t0 - k0))
            sn = min(0.0, sn + (x - t0 + k0))
            a = sp > h0 or -sn > h0
            pos.append(sp)
            neg.append(sn)
            alarms.append(a)
            if a and reset_on_alarm:
                sp = sn = 0.0
        pdf["s_pos"] = pos
        pdf["s_neg"] = neg
        pdf["alarm"] = alarms
        return pdf

    return df.groupBy(*keys).applyInPandas(fold, fields)


@_reg_rollup("cusum", "df")
def _cusum_op(df, *args, **kw):
    return cusum(df, *args, **kw)


def concurrency_profile(intervals, start_col: str, end_col: str,
                        gran: str = "1 hour",
                        n_ranges: int | None = None):
    """(bucket, max_concurrency) — peak simultaneous open intervals
    per time bucket (concurrent sessions, open connections, parallel
    jobs), computed by the classic sweep line in SEGMENT form: net
    ±deltas per distinct instant, a global running level, then each
    level segment ``[t, next_t)`` explodes to every bucket it covers
    (ADVICE r06: the former delta-point max under-reported a bucket
    whose first delta was a −1 — the carried-in level was invisible —
    and emitted nothing at all for buckets lying wholly inside a long
    interval). Buckets no interval touches are absent (= concurrency
    0). Intervals are half-open [start, end): an interval ending
    exactly when another starts does not overlap it, and zero-width
    intervals occupy nothing (their net delta is 0).

    The global prefix sum is DISTRIBUTED, not a single sort task:
    net deltas range-partition on time (repartitionByRange), each
    range computes its local running sum with an in-range window, and
    the per-range totals + first timestamps — two scalars per range —
    come back as a broadcast-joined offset table (the same two-phase
    prefix-sum shape as pack_sequences' shard offsets). Segment ends
    are an in-range lead() patched at range boundaries by the
    broadcast next-range-first column. Driver traffic is 2·n_ranges
    scalars; no stage ever sees a global sort."""
    from pyspark.sql import Window
    spark = intervals.sparkSession
    if n_ranges is None:
        n_ranges = spark.sparkContext.defaultParallelism
    width = _bucket_width_us(gran)
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    deltas = (intervals.select(s_us.alias("t"),
                               F.lit(1).alias("d"))
              .unionByName(intervals.select(e_us.alias("t"),
                                            F.lit(-1).alias("d"))))
    # net delta per distinct instant: the level between instants is
    # what occupancy means; intra-instant transients (−1 applied
    # before +1 under half-open ordering) never exceed
    # max(carried, final) so collapsing loses no peak — and it
    # shrinks the sweep stream before the range exchange.
    net = deltas.groupBy("t").agg(F.sum("d").alias("d"))
    # r12: in-plan offsets (distkit.range_offsets) — the persist
    # pins range boundaries AND partition ids across the two
    # consumers (distkit docstring); offsets + the next-range-first
    # boundary patch (a lead over the bounded ≤ n_ranges-row totals)
    # are plan columns, no driver collect, one Spark action.
    from .distkit import _ranged, range_offsets
    ranged = _ranged(net, [F.col("t")], n_ranges)
    w_in = (Window.partitionBy("__rid").orderBy("t")
            .rowsBetween(Window.unboundedPreceding, 0))
    local = ranged.withColumn("__run", F.sum("d").over(w_in))
    off_df = (range_offsets(
        ranged, {"d": "long"},
        extra_aggs=[F.min("t").alias("__ft")],
        extra_cols=[F.lead("__ft").over(Window.orderBy("__rid"))
                    .alias("__nf")])
        .withColumnRenamed("__off_d", "__off"))
    w_lead = Window.partitionBy("__rid").orderBy("t")
    lvl = (local.join(F.broadcast(off_df), "__rid")
           .select("t", (F.col("__run") + F.col("__off")).alias("__c"),
                   F.coalesce(F.lead("t").over(w_lead),
                              F.col("__nf")).alias("__nt")))
    # run-level segments [t, __nt) with __c open intervals; the last
    # global segment always has __c == 0 (Σdeltas = 0), so __nt is
    # never NULL where it matters — coalesce is belt-and-braces.
    fdiv = lambda c: ((c - F.pmod(c, F.lit(width))) / width) \
        .cast("long")
    # r07 ADVICE: one long constant-level segment (weeks at a small
    # width) would otherwise materialize a single huge F.sequence
    # array — unbounded per-row memory. Two-level explode caps every
    # in-flight array at _SEG_CHUNK buckets: segments first split
    # into chunk starts (step = _SEG_CHUNK), each chunk then explodes
    # its own ≤_SEG_CHUNK bucket run. A segment spanning B buckets
    # costs B output rows either way — the cap only bounds the
    # transient array, which is exactly the OOM vector.
    _SEG_CHUNK = 4096
    seg = (lvl.where(F.col("__c") > 0)
           .select("__c", fdiv(F.col("t")).alias("__b0"),
                   fdiv(F.coalesce(F.col("__nt") - 1,
                                   F.col("t"))).alias("__b1"))
           .select("__c", "__b1",
                   F.explode(F.sequence(
                       F.col("__b0"), F.col("__b1"),
                       F.lit(_SEG_CHUNK))).alias("__cs"))
           .select("__c",
                   F.explode(F.sequence(
                       F.col("__cs"),
                       F.least(F.col("__cs") + F.lit(_SEG_CHUNK - 1),
                               F.col("__b1")))).alias("__b")))
    bucket = F.timestamp_micros(F.col("__b") * F.lit(width)) \
        .cast("timestamp_ntz")
    return (seg.groupBy(bucket.alias("bucket"))
            .agg(F.max("__c").cast("long").alias("max_concurrency")))


@_reg_rollup("concurrency_profile", "df")
def _concurrency_op(df, *args, **kw):
    return concurrency_profile(df, *args, **kw)


def holt_linear(df, key, ts_col: str, value_col: str,
                alpha: float, beta: float,
                horizon_steps: int = 1):
    """Per-key Holt double exponential smoothing (level + trend):

        l_t = α·x_t + (1−α)·(l_{t-1} + b_{t-1})
        b_t = β·(l_t − l_{t-1}) + (1−β)·b_{t-1}

    seeded l_1 = x_1, b_1 = x_2 − x_1 (trend defined from the second
    observation; the first row's forecast is just its level). Adds
    ``level``, ``trend`` and ``forecast`` (= level +
    horizon_steps·trend — the h-step-ahead point forecast) columns.

    The trending twin of ewma, same engine posture: a linear
    recursion no window expresses → grouped Arrow kernel, ONE key
    shuffle, raw IEEE doubles out. Each expression is written
    literally so a recursive-CTE oracle replays it bit-for-bit."""
    keys = [key] if isinstance(key, str) else list(key)
    fields = ", ".join(f"{c} {t}" for c, t in df.dtypes) \
        + ", level double, trend double, forecast double"
    a, b_, h = float(alpha), float(beta), int(horizon_steps)

    def fold(pdf):
        pdf = pdf.sort_values(ts_col).copy()
        lv = tr = None
        levels, trends, fcs = [], [], []
        for x in pdf[value_col].astype(float):
            if lv is None:
                lv, tr = x, None
            elif tr is None:
                prev = lv
                tr0 = x - prev
                lv = a * x + (1.0 - a) * (prev + tr0)
                tr = b_ * (lv - prev) + (1.0 - b_) * tr0
            else:
                prev = lv
                lv = a * x + (1.0 - a) * (prev + tr)
                tr = b_ * (lv - prev) + (1.0 - b_) * tr
            levels.append(lv)
            trends.append(tr if tr is not None else 0.0)
            fcs.append(lv + h * (tr if tr is not None else 0.0))
        pdf["level"] = levels
        pdf["trend"] = trends
        pdf["forecast"] = fcs
        return pdf

    return df.groupBy(*keys).applyInPandas(fold, fields)


@_reg_rollup("holt_linear", "df")
def _holt_op(df, *args, **kw):
    return holt_linear(df, *args, **kw)


def acf(df, ts_col: str, value_col: str, max_lag: int = 6,
        by=None, digits: int = 6):
    """(by..., lag, n_pairs, r) — the sample autocorrelation function
    at lags 1..max_lag over each key's time-ordered series:

        r_l = Σ (x_t − x̄)(x_{t+l} − x̄) / Σ (x_t − x̄)²

    with x̄ the FULL-series mean (the standard ACF normalization).
    The seasonality-detection companion to the fixed-bucket weekly
    profile: a daily cycle shows as a peak at the 24-bucket lag
    without declaring the period up front.

    Plan: ONE key-ordered window shuffle produces all max_lag lead
    columns (shared window spec), then one hash agg per key computes
    every lag's sums at once — max_lag never multiplies shuffles.
    Determinism: every aggregate term (x, x², x·lead) rounds half-up
    to scale-12 DECIMAL before summation, so the sums are exact and
    partition-order-independent; the final mean/ratio arithmetic is
    FP on bit-identical aggregates in any engine (token_entropy
    discipline). Constant series (zero variance) yield NULL r."""
    from pyspark.sql import Window
    by = [] if by is None else ([by] if isinstance(by, str)
                                else list(by))
    dec = "decimal(38,12)"
    x = F.col(value_col).cast("double")
    w = Window.partitionBy(*by).orderBy(ts_col) if by else \
        Window.orderBy(ts_col)
    cols = [F.lead(x, lag).over(w).alias(f"__lead{lag}")
            for lag in range(1, max_lag + 1)]
    staged = df.select(*by, x.alias("__x"), *cols)
    term = lambda c: F.round(c, 12).cast(dec)
    aggs = [F.count(F.lit(1)).alias("__n"),
            F.sum(term(F.col("__x"))).cast("double").alias("__s"),
            F.sum(term(F.col("__x") * F.col("__x"))).cast("double")
            .alias("__ss")]
    for lag in range(1, max_lag + 1):
        ld = F.col(f"__lead{lag}")
        aggs += [
            F.count(ld).alias(f"__m{lag}"),
            F.sum(term(F.col("__x") * ld)).cast("double")
            .alias(f"__a{lag}"),
            F.sum(F.when(ld.isNotNull(),
                         term(F.col("__x") + ld))).cast("double")
            .alias(f"__b{lag}")]
    stats = staged.groupBy(*by).agg(*aggs)
    mean = F.col("__s") / F.col("__n")
    den = F.col("__ss") - F.col("__n") * mean * mean
    parts = []
    for lag in range(1, max_lag + 1):
        num = (F.col(f"__a{lag}") - mean * F.col(f"__b{lag}")
               + F.col(f"__m{lag}") * mean * mean)
        parts.append(F.struct(
            F.lit(lag).alias("lag"),
            F.col(f"__m{lag}").alias("n_pairs"),
            F.when(den != 0, F.round(num / den, digits))
            .alias("r")))
    return (stats.select(*by, F.explode(F.array(*parts)).alias("__e"))
            .select(*by, "__e.lag", "__e.n_pairs", "__e.r"))


@_reg_rollup("acf", "df")
def _acf_op(df, *args, **kw):
    return acf(df, *args, **kw)


def seasonal_decompose(df, ts_col: str, value_col: str, period: int,
                       by=None, digits: int = 6):
    """Classical additive seasonal decomposition per key —
    (by..., ts, value, trend, seasonal, resid) with
    value = trend + seasonal + resid:

    - ``trend``: centered moving average over one full period
      (rows-window of ±period/2; for even periods the two half-weight
      endpoints of the textbook 2×m MA are folded as 0.5-weights) —
      NULL inside the first/last half-period (no extrapolation);
    - ``seasonal``: the mean detrended value of each phase
      (t mod period over the key's row sequence), centered so the
      seasonal components sum to ~0 over one period;
    - ``resid``: what's left.

    The STL-lite companion to acf (acf DETECTS the period; this
    splits the series once you name it) and holt_linear (which
    models trend but not seasonality).

    Plan: ONE key-ordered window shuffle covers the row-number, the
    MA frame, and the final assembly; the phase means are a
    (keys × period)-bounded hash agg broadcast back. Determinism:
    MA and phase-mean numerators are decimal-exact sums of
    round-12 terms (token_entropy discipline); divisions happen in
    double on bit-identical aggregates."""
    from pyspark.sql import Window
    by = [] if by is None else ([by] if isinstance(by, str)
                                else list(by))
    p = int(period)
    half = p // 2
    dec = "decimal(38,12)"
    x = F.col(value_col).cast("double")
    term = lambda c: F.round(c, 12).cast(dec)
    base = (df.select(*by, F.col(ts_col).alias("__ts"),
                      x.alias("__x"))
            .withColumn("__rn", F.row_number().over(
                Window.partitionBy(*by).orderBy("__ts") if by
                else Window.orderBy("__ts"))))
    wb = (Window.partitionBy(*by).orderBy("__rn") if by
          else Window.orderBy("__rn"))
    frame = wb.rowsBetween(-half, half)
    cnt = F.count("__x").over(frame)
    if p % 2 == 0:
        # 2×m MA: the ±half frame holds p+1 rows; the textbook even-
        # period centered MA half-weights the two endpoints — full
        # frame sum minus half of each endpoint, over p
        s_all = F.sum(term(F.col("__x"))).over(frame).cast("double")
        v_lo = F.lag("__x", half).over(wb)
        v_hi = F.lead("__x", half).over(wb)
        trend = F.when(
            (v_lo.isNotNull()) & (v_hi.isNotNull()),
            (s_all - 0.5 * v_lo - 0.5 * v_hi) / F.lit(float(p)))
    else:
        s_all = F.sum(term(F.col("__x"))).over(frame).cast("double")
        trend = F.when(cnt == p, s_all / F.lit(float(p)))
    staged = base.withColumn("__trend", trend) \
        .withColumn("__phase", F.pmod(F.col("__rn") - 1, F.lit(p)))
    det = term(F.col("__x") - F.col("__trend"))
    phase = (staged.where(F.col("__trend").isNotNull())
             .groupBy(*by, "__phase")
             .agg((F.sum(det).cast("double")
                   / F.count(F.lit(1))).alias("__pm")))
    grand = (phase.groupBy(*by)
             .agg((F.sum(term(F.col("__pm"))).cast("double")
                   / F.count(F.lit(1))).alias("__gm")))
    phase_c = (phase.join(grand, by) if by
               else phase.crossJoin(F.broadcast(grand))) \
        .select(*by, "__phase",
                (F.col("__pm") - F.col("__gm")).alias("__seasonal"))
    # LEFT join: a series shorter than one period has no non-null
    # trend anywhere, so the phase table is empty — rows must still
    # surface (with NULL trend/seasonal/resid), not vanish
    out = staged.join(F.broadcast(phase_c), by + ["__phase"], "left")
    return out.select(
        *by, F.col("__ts").alias(ts_col),
        F.col("__x").alias(value_col),
        F.round("__trend", digits).alias("trend"),
        F.round("__seasonal", digits).alias("seasonal"),
        F.round(F.col("__x") - F.col("__trend")
                - F.col("__seasonal"), digits).alias("resid"))


@_reg_rollup("seasonal_decompose", "df")
def _seasonal_decompose_op(df, *args, **kw):
    return seasonal_decompose(df, *args, **kw)


def ccf(df, ts_col: str, x_col: str, y_col: str, max_lag: int = 3,
        by=None, digits: int = 6):
    """(by..., lag, n_pairs, r) — the sample cross-correlation
    function between two aligned series at lags −max_lag..max_lag:

        r_l = Σ (x_t − x̄)(y_{t+l} − ȳ) / √(Σ(x−x̄)² · Σ(y−ȳ)²)

    with full-series means/variances (the standard CCF
    normalization). Positive lag = y FOLLOWS x (x leads); the lag of
    the peak |r| estimates the lead time between the two signals
    (views→purchases, deploys→errors). The two-series companion of
    acf; r_0 is plain Pearson correlation.

    Plan: ONE key-ordered window shuffle produces lead(y, l) AND
    lead(x, l) columns (shared window spec — negative lags are
    corr(y_t, x_{t+l}) read from the led x), then one hash agg per
    key computes every lag's sums at once. Determinism: decimal-12
    term rounding before every sum (acf discipline); zero-variance
    series yield NULL r."""
    from pyspark.sql import Window
    by = [] if by is None else ([by] if isinstance(by, str)
                                else list(by))
    dec = "decimal(38,12)"
    term = lambda c: F.round(c, 12).cast(dec)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    w = Window.partitionBy(*by).orderBy(ts_col) if by else \
        Window.orderBy(ts_col)
    cols = []
    for lag in range(0, max_lag + 1):
        cols.append(F.lead(y, lag).over(w).alias(f"__ly{lag}"))
    for lag in range(1, max_lag + 1):
        cols.append(F.lead(x, lag).over(w).alias(f"__lx{lag}"))
    staged = df.select(*by, x.alias("__x"), y.alias("__y"), *cols)
    aggs = [F.count(F.lit(1)).alias("__n"),
            F.sum(term(F.col("__x"))).cast("double").alias("__sx"),
            F.sum(term(F.col("__x") * F.col("__x"))).cast("double")
            .alias("__sxx"),
            F.sum(term(F.col("__y"))).cast("double").alias("__sy"),
            F.sum(term(F.col("__y") * F.col("__y"))).cast("double")
            .alias("__syy")]
    for lag in range(0, max_lag + 1):
        ld = F.col(f"__ly{lag}")
        aggs += [
            F.count(ld).alias(f"__pm{lag}"),
            F.sum(term(F.col("__x") * ld)).cast("double")
            .alias(f"__pa{lag}"),
            F.sum(F.when(ld.isNotNull(), term(F.col("__x"))))
            .cast("double").alias(f"__pbx{lag}"),
            F.sum(term(ld)).cast("double").alias(f"__pby{lag}")]
    for lag in range(1, max_lag + 1):
        ld = F.col(f"__lx{lag}")
        aggs += [
            F.count(ld).alias(f"__nm{lag}"),
            F.sum(term(F.col("__y") * ld)).cast("double")
            .alias(f"__na{lag}"),
            F.sum(term(ld)).cast("double").alias(f"__nbx{lag}"),
            F.sum(F.when(ld.isNotNull(), term(F.col("__y"))))
            .cast("double").alias(f"__nby{lag}")]
    stats = staged.groupBy(*by).agg(*aggs)
    n = F.col("__n").cast("double")
    mx = F.col("__sx") / n
    my = F.col("__sy") / n
    den_sq = (F.col("__sxx") - n * mx * mx) \
        * (F.col("__syy") - n * my * my)
    parts = []
    for lag in range(-max_lag, max_lag + 1):
        if lag >= 0:
            m = F.col(f"__pm{lag}")
            num = (F.col(f"__pa{lag}") - mx * F.col(f"__pby{lag}")
                   - my * F.col(f"__pbx{lag}") + m * mx * my)
        else:
            al = -lag
            m = F.col(f"__nm{al}")
            num = (F.col(f"__na{al}") - mx * F.col(f"__nbx{al}")
                   - my * F.col(f"__nby{al}") + m * mx * my)
        parts.append(F.struct(
            F.lit(lag).alias("lag"),
            m.alias("n_pairs"),
            F.when(den_sq > 0,
                   F.round(num / F.sqrt(den_sq), digits))
            .alias("r")))
    return (stats.select(*by,
                         F.explode(F.array(*parts)).alias("__e"))
            .select(*by, "__e.lag", "__e.n_pairs", "__e.r"))


@_reg_rollup("ccf", "df")
def _ccf_op(df, *args, **kw):
    return ccf(df, *args, **kw)


def changepoint(df, ts_col: str, value_col: str, by=None,
                min_seg: int = 2, digits: int = 6):
    """(by..., n, split_index, split_ts, mean_left, mean_right,
    gain) — the single best mean-shift changepoint per key (binary
    segmentation step 1): the split k maximizing the SSE reduction

        gain(k) = s1ₖ²/k + (S1−s1ₖ)²/(n−k) − S1²/n

    (algebraically SSE_unsplit − SSE_split; ≥ 0 always — the peak,
    not the sign, carries the signal: compare gain across keys or
    recurse on the segments for multi-changepoint). ``split_index``
    is the LAST row of the left segment; segments shorter than
    ``min_seg`` are not considered. The offline batch complement of
    the streaming CUSUM drift detector.

    Plan: ONE key shuffle — an ordered window builds the decimal-
    exact prefix sum, a full-frame window the per-key totals, and a
    keyed max-of-struct agg picks the argmax row-locally (gain is
    rounded to ``digits`` BEFORE the comparison so cross-engine ulp
    noise cannot flip the argmax; ties break to the earliest k via a
    negated-index struct field). Nothing quadratic: gain(k) is O(1)
    per row off the prefix sums."""
    from pyspark.sql import Window
    by = [] if by is None else ([by] if isinstance(by, str)
                                else list(by))
    dec = "decimal(38,12)"
    term = lambda c: F.round(c, 12).cast(dec)
    x = F.col(value_col).cast("double")
    w_ord = Window.partitionBy(*by).orderBy("__ts") if by else \
        Window.orderBy("__ts")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = (Window.partitionBy(*by) if by else
             Window.partitionBy()) \
        .rowsBetween(Window.unboundedPreceding,
                     Window.unboundedFollowing)
    staged = (df.select(*by, F.col(ts_col).alias("__ts"),
                        x.alias("__x"))
              .withColumn("__i", F.row_number().over(w_ord))
              .withColumn("__ps", F.sum(term(F.col("__x")))
                          .over(w_cum).cast("double"))
              .withColumn("__n", F.count(F.lit(1)).over(w_all))
              .withColumn("__s1", F.sum(term(F.col("__x")))
                          .over(w_all).cast("double")))
    k = F.col("__i")
    nn = F.col("__n")
    s1k = F.col("__ps")
    S1 = F.col("__s1")
    gain = (s1k * s1k / k + (S1 - s1k) * (S1 - s1k) / (nn - k)) \
        - S1 * S1 / nn
    # raw values materialize under aliases BEFORE the sig-safe
    # rounding (round_sig_safe expands to a CASE chain per scale —
    # inlining `gain` into every branch would bloat codegen), and the
    # gain rounds MAGNITUDE-SAFELY: at a fixed 6 dp a 10^4-scale gain
    # demands >9 cross-engine-identical digits of the multiply-add
    # chain (r08 sf0.001 full-sweep lint catch); the argmax compares
    # the same sig-safe value, so ulp noise still cannot flip it.
    from ..functions.rounding import round_sig_safe
    cand = (staged.where((k >= int(min_seg))
                         & (k <= nn - int(min_seg)))
            .withColumn("__g_raw", gain)
            .withColumn("__ml_raw", s1k / k)
            .withColumn("__mr_raw", (S1 - s1k) / (nn - k)))
    best = cand.groupBy(*by).agg(F.max(F.struct(
        round_sig_safe(F.col("__g_raw"), digits).alias("g"),
        (-k).alias("__negk"),
        k.cast("long").alias("k"),
        F.col("__ts").alias("split_ts"),
        round_sig_safe(F.col("__ml_raw"), digits).alias("ml"),
        round_sig_safe(F.col("__mr_raw"), digits).alias("mr"),
        nn.alias("n"))).alias("b"))
    return best.select(*by,
                       F.col("b.n").alias("n"),
                       F.col("b.k").alias("split_index"),
                       F.col("b.split_ts").alias("split_ts"),
                       F.col("b.ml").alias("mean_left"),
                       F.col("b.mr").alias("mean_right"),
                       F.col("b.g").alias("gain"))


@_reg_rollup("changepoint", "df")
def _changepoint_op(df, *args, **kw):
    return changepoint(df, *args, **kw)


def periodicity_strength(df, tick_col: str, value_col: str,
                         max_period: int = 12, by=None,
                         digits: int = 6):
    """(by..., period, n, strength) — ANOVA-style periodicity
    profile: for each candidate period p in 2..max_period, the share
    of series variance explained by the phase grouping t mod p,

        strength(p) = SS_between / SS_total
                    = (Σ_g s_g²/n_g − S²/n) / (Q − S²/n)

    with s_g/n_g the per-phase sum/count and S/Q the global sum and
    sum-of-squares. strength ≈ 1 ⇒ the series is periodic at p (or a
    multiple); a flat profile ⇒ no seasonality. The trig-free
    companion of seasonal_decompose — a periodogram without cos/sin,
    so the oracle reproduces it bit-for-bit (cross-engine libm trig
    is NOT last-ulp-stable, which is why a DFT formulation would
    flake the value hash; the variance-ratio statistic carries the
    same peak structure for phase-locked seasonality).

    ``tick_col`` is an integer tick (epoch day/hour — derive by
    epoch DIVISION, never a row-number rank: gaps are fine, no
    global sort exists in the plan).

    Plan: one explode fans each row out ×(max_period−1) — a bounded,
    documented cost — then ONE (by, p, phase) hash agg (map-side
    combinable; ≤ p·|by| groups survive) folds up to a
    metadata-sized per-(by, p) table. Decimal-exact sums; FP only in
    the final per-row ratio. SS_total uses the phase-level partial
    sums, so both SS terms share one aggregate."""
    from pyspark.sql import functions as F
    by = [] if by is None else ([by] if isinstance(by, str)
                                else list(by))
    dec = "decimal(38,12)"
    term = lambda c: F.round(c, 12).cast(dec)
    P = int(max_period)
    x = F.col(value_col).cast("double")
    t = F.col(tick_col).cast("long")
    staged = (df.select(*by, t.alias("__t"), x.alias("__x"))
              .where(F.col("__x").isNotNull()
                     & F.col("__t").isNotNull())
              .select(*by, "__t", "__x",
                      F.explode(F.sequence(F.lit(2), F.lit(P)))
                      .alias("period")))
    phases = (staged.groupBy(*by, "period",
                             F.pmod(F.col("__t"), F.col("period"))
                             .alias("__ph"))
              .agg(F.count(F.lit(1)).alias("__ng"),
                   F.sum(term(F.col("__x"))).alias("__sg"),
                   F.sum(term(F.col("__x") * F.col("__x")))
                   .alias("__qg")))
    sg = F.col("__sg").cast("double")
    per = (phases.groupBy(*by, "period")
           .agg(F.sum("__ng").alias("__n"),
                F.sum("__sg").cast("double").alias("__s"),
                F.sum("__qg").cast("double").alias("__q"),
                F.sum(term(sg * sg / F.col("__ng")))
                .cast("double").alias("__b")))
    n = F.col("__n").cast("double")
    cf = F.col("__s") * F.col("__s") / n
    sst = F.col("__q") - cf
    ssb = F.col("__b") - cf
    strength = F.when(sst > 0, F.round(ssb / sst, digits))
    return (per.select(*by, "period",
                       F.col("__n").cast("long").alias("n"),
                       strength.alias("strength")))


@_reg_rollup("periodicity_strength", "df")
def _periodicity_op(df, *args, **kw):
    return periodicity_strength(df, *args, **kw)


def forecast_metrics(df, actual_col: str, pred_col: str, by=None,
                     digits: int = 6):
    """(by..., n, mae, rmse, bias, mape, smape) — forecast-accuracy
    scorecard per key in ONE conditional-agg scan (map-side
    combinable, decimal-exact sums; same moment-statistic posture as
    abtest.welch_ttest):

        mae   = mean |a−p|          rmse = sqrt(mean (a−p)²)
        bias  = mean (p−a)          mape = mean |a−p|/|a|   (a ≠ 0)
        smape = mean 2|a−p|/(|a|+|p|)   (denominator ≠ 0)

    Rows with NULL actual or prediction are dropped; MAPE averages
    only over nonzero actuals (n_mape tracks the divisor), sMAPE over
    nonzero |a|+|p| — the standard conventions. MASE is deliberately
    absent: it needs the TRAINING series' naive error; scale by your
    own baseline (e.g. a lag-k naive forecast of the same frame)."""
    from pyspark.sql import functions as F
    dec = "decimal(38,12)"
    term = lambda c: F.round(c, 12).cast(dec)
    by = [] if by is None else ([by] if isinstance(by, str)
                                else list(by))
    a = F.col(actual_col).cast("double")
    p = F.col(pred_col).cast("double")
    e = a - p
    base = df.where(a.isNotNull() & p.isNotNull())
    agg = (base.groupBy(*by).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(term(F.abs(e))).cast("double").alias("__sae"),
        F.sum(term(e * e)).cast("double").alias("__sse"),
        F.sum(term(-e)).cast("double").alias("__sbias"),
        F.sum(F.when(a != 0, term(F.abs(e) / F.abs(a))))
        .cast("double").alias("__sape"),
        F.count(F.when(a != 0, F.lit(1))).alias("__nmape"),
        F.sum(F.when(F.abs(a) + F.abs(p) != 0,
                     term(2 * F.abs(e) / (F.abs(a) + F.abs(p)))))
        .cast("double").alias("__ssm"),
        F.count(F.when(F.abs(a) + F.abs(p) != 0, F.lit(1)))
        .alias("__nsm")))
    n = F.col("__n").cast("double")
    return agg.select(
        *by, F.col("__n").alias("n"),
        F.round(F.col("__sae") / n, digits).alias("mae"),
        F.round(F.sqrt(F.col("__sse") / n), digits).alias("rmse"),
        F.round(F.col("__sbias") / n, digits).alias("bias"),
        F.when(F.col("__nmape") > 0,
               F.round(F.col("__sape")
                       / F.col("__nmape").cast("double"), digits))
        .alias("mape"),
        F.when(F.col("__nsm") > 0,
               F.round(F.col("__ssm")
                       / F.col("__nsm").cast("double"), digits))
        .alias("smape"))


@_reg_rollup("forecast_metrics", "df")
def _forecast_metrics_op(df, *args, **kw):
    return forecast_metrics(df, *args, **kw)


def lag_features(df, ts_col: str, value_col: str, by=None,
                 lags=(1, 7), windows=(7,), digits: int = 6):
    """Input + the standard supervised-learning feature block for a
    keyed time series, from ONE key-ordered window shuffle:

        lag_<k>     — value k rows earlier            (per `lags`)
        rmean_<w>   — trailing mean of the w rows ending at the
                      CURRENT row's predecessor (excludes self — no
                      target leakage; NULL until w rows exist)
        delta_<k>   — value − lag_<k>

    All windows share the same (by, ts) partitioning/ordering, so
    Catalyst plans ONE Exchange + ONE Sort regardless of how many
    features are requested. Row-based frames (not time-based): gaps
    are the caller's modeling decision — gap-fill first if calendar
    lags are wanted. Trailing means are decimal-exact sums / w."""
    from pyspark.sql import Window, functions as F
    dec = "decimal(38,12)"
    by = [] if by is None else ([by] if isinstance(by, str)
                                else list(by))
    x = F.col(value_col).cast("double")
    w = Window.partitionBy(*by).orderBy(ts_col)
    out = df
    for k in lags:
        out = out.withColumn(f"lag_{k}", F.lag(x, int(k)).over(w))
        out = out.withColumn(
            f"delta_{k}", F.round(x - F.col(f"lag_{k}"), digits))
    for win in windows:
        frame = w.rowsBetween(-int(win), -1)
        cnt = F.count(x).over(frame)
        s = F.sum(F.round(x, 12).cast(dec)).over(frame)
        out = out.withColumn(
            f"rmean_{win}",
            F.when(cnt == int(win),
                   F.round(s.cast("double") / cnt, digits)))
    return out


def time_series_split(df, ts_col: str, cutoff,
                      embargo_seconds: int = 0):
    """(train, test) — the leakage-safe temporal split: train is
    strictly before `cutoff`, test starts at cutoff +
    `embargo_seconds` (the purge gap that keeps rolling/label
    windows computed near the boundary from straddling it — the
    time-series analogue of corpus.leakage_safe_split's rule that
    near-duplicates never cross the line). Both halves are lazy
    filters — they push down to the parquet scan, no shuffle, no
    materialization."""
    from pyspark.sql import functions as F
    t = F.col(ts_col).cast("timestamp")
    cut = F.lit(cutoff).cast("timestamp")
    train = df.where(t < cut)
    test = df.where(t >= cut + F.expr(
        f"INTERVAL {int(embargo_seconds)} SECOND"))
    return train, test


@_reg_rollup("lag_features", "df")
def _lag_features_op(df, *args, **kw):
    return lag_features(df, *args, **kw)


def ljung_box(df, ts_col: str, value_col: str, max_lag: int = 6,
              by=None, digits: int = 6):
    """(by..., n, dof, q_stat) — the Ljung-Box portmanteau test for
    autocorrelation over each key's time-ordered series:

        Q = n(n+2) · Σ_{k=1..h} r_k² / (n−k)   ~ χ²_h under
                                                 white noise

    The "is there ANY serial structure" gate run before trusting
    i.i.d.-assuming statistics (bootstrap_ci, welch_ttest) on a time
    series, and the residual-whiteness check after seasonal_decompose
    / holt_linear. No p-value (χ² CDF unavailable in either engine);
    gate Q against the χ²_h critical value — dof rides along.

    Plan: Q assembles ON TOP of acf's output — the same ONE
    key-ordered window shuffle and one hash agg; each lag's
    r_k²/(n−k) term rounds half-up to 12 dp into a decimal(38,12)
    sum (lag-order-independent), then one double multiply releases
    sig-safe. n recovers exactly as n_pairs + lag (lead(x,k) is NULL
    for precisely the last k rows of a key). Keys shorter than
    max_lag+1 rows contribute only their defined lags (dof = count
    of non-NULL r); constant series yield NULL q_stat."""
    from ..functions.rounding import round_sig_safe
    keys = ([] if by is None
            else [by] if isinstance(by, str) else list(by))
    r = acf(df, ts_col, value_col, max_lag=max_lag,
            by=keys if keys else None, digits=12)
    dec = "decimal(38,12)"
    term = F.round(F.col("r") * F.col("r")
                   / F.col("n_pairs").cast("double"), 12).cast(dec)
    agg = (r.groupBy(*keys)
           # n_pairs = n−lag only where the lag is DEFINED (n_pairs>0);
           # a 3-row series at lag 6 has n_pairs=0 and 0+6=6 would
           # overstate n — those rows carry NULL r anyway
           .agg(F.max(F.when(F.col("n_pairs") > 0,
                             F.col("n_pairs") + F.col("lag")))
                .alias("n"),
                F.count("r").alias("dof"),
                F.sum(F.when(F.col("r").isNotNull(), term))
                .cast("double").alias("__s")))
    nd = F.col("n").cast("double")
    q = F.when(F.col("dof") > 0, nd * (nd + 2) * F.col("__s"))
    return agg.select(*keys, "n", "dof",
                      round_sig_safe(q, digits).alias("q_stat"))


@_reg_rollup("ljung_box", "df")
def _ljung_box_op(df, *args, **kw):
    return ljung_box(df, *args, **kw)


def durbin_levinson_steps(max_lag: int):
    """The Durbin-Levinson recursion unrolled into a flat list of
    (column_name, sql_expression) steps over pivoted autocorrelation
    columns r1..r{max_lag}:

        phi[k][k] = (r_k - SUM_j phi[k-1][j] r_{k-j})
                    / (1 - SUM_j phi[k-1][j] r_j)
        phi[k][j] = phi[k-1][j] - phi[k][k] phi[k-1][k-j]

    Each step references only previously-defined names, so the SAME
    strings drive Spark (sequential selectExpr) AND the DuckDB
    oracle (sequential CTEs) — both engines execute the literally
    identical arithmetic on bit-identical 12-dp rounded r inputs,
    which is what makes an iterative estimator raw-repr-exact
    cross-engine. Zero-denominator levels emit NULL and propagate."""
    steps = [("p1_1", "r1")]
    for k in range(2, int(max_lag) + 1):
        num = " + ".join(f"p{k-1}_{j} * r{k-j}" for j in range(1, k))
        den = " + ".join(f"p{k-1}_{j} * r{j}" for j in range(1, k))
        steps.append((f"den{k}", f"1.0 - ({den})"))
        steps.append((f"p{k}_{k}",
                      f"CASE WHEN den{k} <> 0 THEN "
                      f"(r{k} - ({num})) / den{k} END"))
        for j in range(1, k):
            steps.append((f"p{k}_{j}",
                          f"p{k-1}_{j} - p{k}_{k} * p{k-1}_{k-j}"))
    return steps


def pacf(df, ts_col: str, value_col: str, max_lag: int = 6,
         by=None, digits: int = 6):
    """(by..., lag, pacf) — the PARTIAL autocorrelation function at
    lags 1..max_lag per key: the correlation of x_t with x_{t-k}
    after regressing out lags 1..k-1, i.e. the AR-order fingerprint
    (an AR(p) process cuts off after lag p where the ACF only
    decays). Computed by the Durbin-Levinson recursion over the
    sample ACF.

    Plan: acf's ONE key-ordered window shuffle + one hash agg, then
    a pivot to one row per key (max_lag columns) and the recursion
    unrolled into stepwise attribute-referencing selects — FULLY
    distributed, no driver collect, codegen-bounded. The same
    unrolled steps generate the DuckDB oracle, so both engines run
    identical double arithmetic on identical 12-dp r values."""
    from ..functions.rounding import round_sig_safe
    keys = ([] if by is None
            else [by] if isinstance(by, str) else list(by))
    r = acf(df, ts_col, value_col, max_lag=max_lag,
            by=keys if keys else None, digits=12)
    pivoted = (r.groupBy(*keys)
               .agg(*[F.max(F.when(F.col("lag") == k, F.col("r")))
                      .alias(f"r{k}")
                      for k in range(1, max_lag + 1)]))
    cur = pivoted
    for name, expr in durbin_levinson_steps(max_lag):
        cur = cur.selectExpr("*", f"{expr} AS {name}")
    parts = [F.struct(F.lit(k).alias("lag"),
                      F.col(f"p{k}_{k}").alias("pacf"))
             for k in range(1, max_lag + 1)]
    out = (cur.select(*keys, F.explode(F.array(*parts)).alias("__e"))
           .select(*keys, "__e.lag",
                   round_sig_safe(F.col("__e.pacf"), digits)
                   .alias("pacf")))
    return out


@_reg_rollup("pacf", "df")
def _pacf_op(df, *args, **kw):
    return pacf(df, *args, **kw)


def mase(df, ts_col: str, actual_col: str, pred_col: str,
         season: int = 1, by=None, digits: int = 6):
    """(by..., n, n_naive, mae, mae_naive, mase) — the Mean Absolute
    SCALED Error (Hyndman & Koehler 2006):

        MASE = mean|a−p| / mean|a_t − a_{t−season}|

    the scale-free forecast score that compares directly across
    series of different magnitudes and, unlike MAPE, survives zeros:
    MASE < 1 beats the seasonal-naive baseline on the same data.
    Completes forecast_metrics' scorecard (which deliberately leaves
    scaling to a caller-chosen baseline — this op IS that baseline,
    computed in-frame).

    Plan: ONE key-ordered window shuffle produces the season lag;
    the same keying carries both decimal-exact MAE sums in one hash
    agg. A key with no defined naive errors (series shorter than
    season+1) or zero naive MAE yields NULL mase."""
    from pyspark.sql import Window
    from ..functions.rounding import round_sig_safe
    dec = "decimal(38,12)"
    term = lambda c: F.round(c, 12).cast(dec)
    keys = ([] if by is None
            else [by] if isinstance(by, str) else list(by))
    part = keys if keys else [F.lit(1)]
    a = F.col(actual_col).cast("double")
    p = F.col(pred_col).cast("double")
    w = Window.partitionBy(*part).orderBy(ts_col)
    base = (df.where(a.isNotNull())
            .withColumn("__lag", F.lag(a, int(season)).over(w)))
    e = a - p
    ne = a - F.col("__lag")
    agg = (base.groupBy(*keys).agg(
        F.count(F.when(p.isNotNull(), F.lit(1))).alias("n"),
        F.sum(F.when(p.isNotNull(), term(F.abs(e))))
        .cast("double").alias("__sae"),
        F.count(F.when(F.col("__lag").isNotNull(), F.lit(1)))
        .alias("n_naive"),
        F.sum(F.when(F.col("__lag").isNotNull(), term(F.abs(ne))))
        .cast("double").alias("__snae")))
    mae_ = F.when(F.col("n") > 0,
                  F.col("__sae") / F.col("n").cast("double"))
    mnv = F.when(F.col("n_naive") > 0,
                 F.col("__snae") / F.col("n_naive").cast("double"))
    d1 = agg.select(*keys, "n", "n_naive",
                    mae_.alias("__mae"), mnv.alias("__mnv"))
    ms = F.when(F.col("__mnv") > 0, F.col("__mae") / F.col("__mnv"))
    return d1.select(
        *keys, "n", "n_naive",
        F.round(F.col("__mae"), digits).alias("mae"),
        F.round(F.col("__mnv"), digits).alias("mae_naive"),
        round_sig_safe(ms, digits).alias("mase"))


@_reg_rollup("mase", "df")
def _mase_op(df, *args, **kw):
    return mase(df, *args, **kw)
