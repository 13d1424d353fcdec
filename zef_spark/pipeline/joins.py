"""Temporal join operators Spark lacks natively: as-of join and
range (point-in-interval) join.

Both compile to single shuffle-on-key DataFrame plans — no driver
loops, no UDFs, no nested-loop joins:

- ``asof_join``: the union + running-last trick. Tag both inputs,
  union them, and take the last right-side row at-or-before each left
  row inside one window pass. ONE shuffle (by key), scales linearly;
  the alternative (theta join on ts ranges) is a BroadcastNestedLoop
  that dies at scale.
- ``range_join``: bucketize time. Intervals explode to the fixed-width
  buckets they cover, points hash to their bucket, the join is a plain
  equi-join on (key, bucket) + an exact containment filter. Bucket
  width trades explode factor vs candidate precision; pick it near the
  median interval length.

Reference parity: zef expresses these as graph traversals over time
slices (`time_travel` / `exists_at`, ITF); here they are first-class
relational operators for event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import Window


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: str | list[str], tolerance: str | None = None,
              direction: str = "backward",
              suffix: str = "_right") -> DataFrame:
    """For each left row, attach the most recent right row with the
    same key(s) and ``right.on <= left.on`` (direction="backward";
    "forward" = next right row at-or-after). ``tolerance`` (an
    INTERVAL string, e.g. "1 hour") drops matches further away.

    Plan shape: union both sides, one window over (by, on) carrying
    the last-seen right payload forward, keep left rows. Single
    shuffle on the key columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = [by] if isinstance(by, str) else list(by)
    rcols = [c for c in right.columns if c not in by + [on]]
    lcols = [c for c in left.columns if c not in by + [on]]

    r = right.select(
        *by, F.col(on).alias("__t"), F.lit(0).alias("__side"),
        *[F.col(c).alias(c + suffix) for c in rcols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols])
    lft = left.select(
        *by, F.col(on).alias("__t"), F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix)
          for c in rcols],
        *lcols)
    # backward: right rows sort BEFORE left rows at equal ts (a right
    # row at exactly left.ts matches); forward mirrors by reversing
    # the scan direction
    if direction == "backward":
        w = (Window.partitionBy(*by).orderBy("__t", "__side")
             .rowsBetween(Window.unboundedPreceding, 0))
    else:
        w = (Window.partitionBy(*by).orderBy(F.col("__t").desc(),
                                             F.col("__side"))
             .rowsBetween(Window.unboundedPreceding, 0))
    matched = lft.unionByName(r)
    carried = [F.last(F.when(F.col("__side") == 0, F.col(c + suffix)),
                      ignorenulls=True).over(w).alias(c + suffix)
               for c in rcols]
    match_t = F.last(F.when(F.col("__side") == 0, F.col("__t")),
                     ignorenulls=True).over(w).alias("__match_t")
    out = (matched.select(*by, "__t", "__side", *lcols, *carried,
                          match_t)
           .where(F.col("__side") == 1))
    if tolerance is not None:
        lim = (F.col("__t") - F.expr(f"INTERVAL {tolerance}")
               if direction == "backward"
               else F.col("__t") + F.expr(f"INTERVAL {tolerance}"))
        keep = (F.col("__match_t") >= lim if direction == "backward"
                else F.col("__match_t") <= lim)
        null_out = F.when(F.col("__match_t").isNotNull() & keep,
                          F.lit(True))
        out = out.select(
            *by, "__t", *lcols,
            *[F.when(null_out, F.col(c + suffix)).alias(c + suffix)
              for c in rcols],
            F.when(null_out, F.col("__match_t")).alias("__match_t"))
    return (out.withColumnRenamed("__t", on)
            .withColumnRenamed("__match_t", on + suffix)
            .drop("__side"))


def fuzzy_join(left: DataFrame, right: DataFrame, left_on: str,
               right_on: str | None = None, max_distance: int = 2,
               q: int = 2, keep: list[str] | None = None,
               max_gram_df: int | None = None,
               salt_gram_df: int | str | None = "auto") -> DataFrame:
    """Approximate string join: pair rows whose key strings are within
    ``max_distance`` Levenshtein edits (entity resolution / record
    linkage; the reference's `identify_entities` handles only exact
    match keys — this is the fuzzy tier above it).

    Plan shape (q-gram blocking, NOT all-pairs): each side explodes its
    key into positional ``q``-grams, candidates are the distinct pairs
    sharing at least one gram (an equi-join on the gram), and the exact
    ``levenshtein`` filter runs only on candidates. Completeness: t
    edits destroy at most q*t of a string's ``|s| - q + 1`` q-grams,
    so two strings within distance t both of length >= q*(t+1) are
    GUARANTEED to share a gram; pairs where either key is shorter go
    through a dedicated short block (every key of length
    < q*(t+1) + t joins it — distance <= t bounds the length gap by t,
    so the block provably covers all remaining pairs; it is a tiny,
    bounded slice in real corpora).

    Scale: work is sum over grams of (left_count * right_count).
    ``max_gram_df`` drops grams appearing in more than that many LEFT
    keys (stop-gram cap for key distributions with giant shared
    substrings) — NOTE this trades the completeness guarantee for
    bounded work: a pair whose only shared grams are all hot is lost.
    Leave it None (default) when exact recall is required. One shuffle
    keyed by gram + one distinct — no CartesianProduct in the plan.

    LENGTH BANDING (r11, recall-exact): a pair within t edits
    differs at most t in length, so candidates additionally key on
    a length band of width w = 2t+1 — the left key blocks on
    floor(len/w); the right key replicates to the at-most-2 bands
    {floor((len−t)/w), floor((len+t)/w)} (2t < w, so the window
    [len−t, len+t] crosses ≤1 band boundary, and the monotone floor
    of any covered left length equals one of the two endpoints's
    bands — coverage is provable, not heuristic). On mixed-length
    corpora this splits each hot gram's c_l·c_r block by length for
    ≤2× replication of the right side.

    ``salt_gram_df`` (r10; r11: symmetric grid + adaptive default)
    fixes the SKEW without the recall trade: on low-entropy keys
    (measured at sf1 — every "Supplier#000…" key shares its prefix
    grams) a hot gram's whole block lands in ONE shuffle partition
    and a single task computes its ~c_l·c_r candidate pairs alone
    (observed: >75 min single-core while the host idled). A
    (gram, band) whose count EXCEEDS the cap on EITHER side (r10
    detected left-only — a right-hot gram still serialized) is GRID
    SALTED: each side shards itself by hash(key) mod s_side
    (s_side = ceil(count_side/cap)) and replicates across the OTHER
    side's shards; the candidate join keys on (gram, band, shard_l,
    shard_r), so every pair meets exactly once — the RESULT is
    bit-identical (candidate set unchanged), each task holds a
    ≤ cap×cap block, and the replication factor on hot blocks is
    s_other (the naturally-small side replicates, the big side
    shards). "auto" (default) derives the cap from the measured
    (gram, band) pair histogram: cap ≈ sqrt(total_candidate_pairs /
    (4·parallelism)) clamped to [512, 100_000], so per-task blocks
    target ~1/(4·par) of the total work at any key entropy — the
    r10 static 2000 survives as an explicit int. None disables.
    The collected hot list is metadata-bounded BY CONSTRUCTION
    (≤ rows/cap entries) and enforced with a raise at 1e6."""
    right_on = right_on or left_on
    keep = keep or []
    min_len = q * (max_distance + 1)

    def grams(df, col, side):
        key = F.col(col).alias("__key_" + side)
        base = df.select(key, *[F.col(c).alias(f"{c}_{side}")
                                for c in keep])
        klen = F.length("__key_" + side)
        g = base.where(klen >= min_len).select(
            "*", F.explode(F.expr(
                f"transform(sequence(1, length(__key_{side}) - {q - 1}),"
                f" i -> substring(__key_{side}, i, {q}))")).alias("__g"))
        # a pair with min(|a|,|b|) < q*(t+1) has BOTH lengths below
        # q*(t+1)+t (edit distance bounds the length gap by t), so this
        # single block covers every pair the gram bound can't guarantee.
        # "#short" cannot collide with real grams: grams have length q.
        short_side = (base.where(klen < min_len + max_distance)
                      .withColumn("__g", F.lit("#short")))
        return g.unionByName(short_side)

    lg, rg = grams(left, left_on, "l"), grams(right, right_on, "r")
    if max_gram_df is not None:
        hot = (lg.groupBy("__g").count()
               .where((F.col("count") > max_gram_df)
                      & (F.col("__g") != "#short"))
               .select("__g"))
        lg = lg.join(hot, "__g", "left_anti")
        rg = rg.join(hot, "__g", "left_anti")

    # PREFIX FILTERING (r10, Ed-Join / Chaudhuri et al. prefix
    # filter): a pair within t edits shares >= |set(grams)| - q*t
    # distinct grams (each edit disturbs at most q grams), so under
    # ANY fixed global gram order, the (q*t + 1)-prefixes of the two
    # keys' rarity-sorted gram sets must intersect — candidates can
    # key on PREFIX grams only, with exact recall. Ordering by
    # ascending global frequency makes those prefix grams the
    # RAREST ones, which collapses the low-entropy-key blowup: at
    # sf1 the naive all-gram join built ~1e9 candidates from the 9
    # universal "Supplier#0…" prefix grams (>75 min single-core
    # before salting, ~1e9-row distinct after), while the 5 rarest
    # grams per key block on the discriminative digit tails. The
    # frequency table is one gram-sized agg over both sides; the
    # per-key prefix pick is a window over <= |key| rows.
    p_len = q * max_distance + 1
    # The gram-frequency table is VOCABULARY-sized (distinct q-grams,
    # ≤ charset^q — ~9k for the default q=2 over ASCII), nothing like
    # data-sized: persist it (it feeds BOTH sides' prefix picks — r11
    # profiling showed the un-persisted freq subtree re-running the
    # full gram explode 4× inside one call, ~5× total wall) and
    # broadcast it when small so the prefix pick costs no extra
    # shuffle of the data-sized gram table.
    freq = (lg.select("__g").unionByName(rg.select("__g"))
            .where(F.col("__g") != "#short")
            .groupBy("__g").agg(F.count(F.lit(1)).alias("__f"))
            .persist())
    bfreq = F.broadcast(freq) if freq.count() <= 2_000_000 else freq

    def prefix(g_df, side):
        key = "__key_" + side
        ident = [key] + [f"{c}_{side}" for c in keep]
        # the prefix is per ENTITY ROW (key + keep identity): two
        # entities sharing a key string must each keep their own
        # q*t+1 rarest grams. ONE shuffle (the groupBy; map-side
        # combine applies) — the r10 shape was dropDuplicates + a
        # row_number window, two shuffles over the full gram table.
        # array_sort on (freq, gram) structs == the window's
        # (__f asc, __g asc) order; array_distinct dedups repeated
        # occurrences of a gram (same (__f, __g) pair).
        pre = (g_df.where(F.col("__g") != "#short")
               .join(bfreq, "__g")
               .groupBy(*ident)
               .agg(F.slice(F.array_sort(F.array_distinct(
                   F.collect_list(F.struct("__f", "__g")))),
                   1, p_len).alias("__pre"))
               .select(*ident, F.explode("__pre").alias("__p"))
               .select(*ident, F.col("__p.__g").alias("__g")))
        return pre.unionByName(
            g_df.where(F.col("__g") == "#short").select(*ident, "__g"))

    lg, rg = prefix(lg, "l"), prefix(rg, "r")

    # length banding (r11): w = 2t+1 so [len−t, len+t] crosses at
    # most one band boundary — the left blocks on its own band, the
    # right replicates to the ≤2 endpoint bands, recall-exact
    t, w = int(max_distance), 2 * int(max_distance) + 1
    lg = lg.withColumn("__b", F.floor(F.length("__key_l") / w))
    rlen = F.length("__key_r")
    rg = rg.withColumn("__b", F.explode(F.array_distinct(F.array(
        F.floor((rlen - t) / w), F.floor((rlen + t) / w)))))

    hot = []
    if salt_gram_df is not None:
        import math
        spark = left.sparkSession
        # the salting path reads each prefix table 2-3× (its count
        # agg, the pairs-total collect, then the candidate join) —
        # persist them (≈ rows × (q·t+1) short rows, MEMORY_AND_DISK)
        # instead of re-running the gram explode + prefix shuffle per
        # read; the no-salt path reads each once and skips this
        lg, rg = lg.persist(), rg.persist()
        cl = (lg.groupBy("__g", "__b")
              .agg(F.count(F.lit(1)).alias("__cl")))
        cr = (rg.groupBy("__g", "__b")
              .agg(F.count(F.lit(1)).alias("__cr")))
        cnt = cl.join(cr, ["__g", "__b"])  # one-sided blocks pair 0
        if salt_gram_df == "auto":
            cnt = cnt.persist()
            row = cnt.agg(
                F.sum(F.col("__cl") * F.col("__cr")).alias("__p")
            ).collect()[0]
            pairs_total = int(row["__p"] or 0)
            par = max(spark.sparkContext.defaultParallelism, 1)
            per_task = max(pairs_total / (4 * par), 250_000.0)
            cap = int(min(max(math.ceil(math.sqrt(per_task)), 512),
                          100_000))
        else:
            cap = int(salt_gram_df)
        hot = (cnt.where((F.col("__cl") > cap) | (F.col("__cr") > cap))
               .select("__g", "__b",
                       F.greatest(F.ceil(F.col("__cl") / cap), F.lit(1))
                       .cast("int").alias("__sl"),
                       F.greatest(F.ceil(F.col("__cr") / cap), F.lit(1))
                       .cast("int").alias("__sr"))
               .limit(1_000_001)
               .collect())  # hot (gram, band)s only — ≤ rows/cap
        if salt_gram_df == "auto":
            cnt.unpersist()
        if len(hot) > 1_000_000:
            raise ValueError(
                "fuzzy_join: > 1e6 hot (gram, band) blocks at cap "
                f"{cap} — the salt table would stop being metadata-"
                "sized; raise salt_gram_df or pre-aggregate keys")
    if hot:
        sdf = F.broadcast(left.sparkSession.createDataFrame(
            [(r["__g"], int(r["__b"]), int(r["__sl"]), int(r["__sr"]))
             for r in hot],
            "__g string, __b long, __sl int, __sr int"))
        # grid salting: each side shards itself, replicates across
        # the other side's shards; a pair meets exactly once at
        # (g, b, hash(key_l) mod s_l, hash(key_r) mod s_r)
        lg = (lg.join(sdf, ["__g", "__b"], "left")
              .withColumn("__shl", F.when(
                  F.col("__sl").isNotNull(),
                  F.pmod(F.hash("__key_l"), F.col("__sl")))
                  .otherwise(F.lit(0)))
              .withColumn("__shr", F.explode(F.sequence(
                  F.lit(0), F.coalesce(F.col("__sr"), F.lit(1)) - 1)))
              .drop("__sl", "__sr"))
        rg = (rg.join(sdf, ["__g", "__b"], "left")
              .withColumn("__shr", F.when(
                  F.col("__sr").isNotNull(),
                  F.pmod(F.hash("__key_r"), F.col("__sr")))
                  .otherwise(F.lit(0)))
              .withColumn("__shl", F.explode(F.sequence(
                  F.lit(0), F.coalesce(F.col("__sl"), F.lit(1)) - 1)))
              .drop("__sl", "__sr"))
        cand = (lg.join(rg, ["__g", "__b", "__shl", "__shr"])
                .drop("__g", "__b", "__shl", "__shr"))
    else:
        cand = lg.join(rg, ["__g", "__b"]).drop("__g", "__b")
    # THRESHOLDED verify BEFORE the distinct (r11 perf, result
    # bit-identical): levenshtein(l, r, t) runs the banded O(t·n)
    # DP with early exit (vs the full O(n²) table) and returns -1
    # past t, so the verify is map-side on the raw join output —
    # each true pair appears once per shared (prefix gram, band,
    # shard), a small constant — and the distinct then shuffles
    # only VERIFIED pairs (~true pairs) instead of the full
    # candidate multiset. At sf1 (10k low-entropy supplier keys,
    # ~2.4M true pairs) the distinct input drops by the
    # candidate:pair ratio; this was the dominant stage at 150 s.
    return (cand
            .withColumn("distance",
                        F.levenshtein("__key_l", "__key_r",
                                      int(max_distance)))
            .where(F.col("distance") >= 0)
            .distinct()
            .withColumnRenamed("__key_l", left_on + "_l")
            .withColumnRenamed("__key_r", right_on + "_r"))


def range_join(points: DataFrame, intervals: DataFrame, point_col: str,
               start_col: str, end_col: str,
               by: str | list[str] | None = None,
               bucket: str = "1 hour") -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= point < end``), optionally keyed. Intervals explode
    to the ``bucket``-width time buckets they cover; the join becomes
    an equi-join on (key, bucket) + exact containment filter — no
    nested-loop. Long intervals cost ceil(len/bucket) replicas; size
    ``bucket`` near the median interval length.
    """
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    import pandas as pd

    def micros(c):
        # unix_micros demands TIMESTAMP; events carry TIMESTAMP_NTZ
        # (session tz = UTC, so the cast is value-preserving)
        return F.unix_micros(c.cast("timestamp"))
    bucket_us = F.lit(int(pd.Timedelta(bucket).total_seconds() * 1_000_000))
    p = points.withColumn("__b", (micros(F.col(point_col)) / bucket_us)
                          .cast("long"))
    iv = intervals.withColumn(
        "__b", F.explode(F.sequence(
            (micros(F.col(start_col)) / bucket_us).cast("long"),
            (micros(F.col(end_col)) / bucket_us).cast("long"))))
    joined = p.join(iv, by + ["__b"])
    return (joined.where((F.col(start_col) <= F.col(point_col)) &
                         (F.col(point_col) < F.col(end_col)))
            .drop("__b"))


from ..ops.core import register_op


@register_op("asof_join", "df")
def _asof_join(df, other, on, by, **kw):
    return asof_join(df, other, on, by, **kw)


@register_op("range_join", "df")
def _range_join(df, intervals, point_col, start_col, end_col, **kw):
    return range_join(df, intervals, point_col, start_col, end_col, **kw)


@register_op("fuzzy_join", "df")
def _fuzzy_join(df, other, left_on, right_on=None, **kw):
    return fuzzy_join(df, other, left_on, right_on, **kw)


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          by: str | list[str] | None = None,
                          bucket: str = "1 hour",
                          suffix: str = "_r") -> DataFrame:
    """Join interval rows whose [start, end) ranges OVERLAP
    (`l_start < r_end AND r_start < l_end`), optionally keyed — the
    genomics/temporal overlap-join primitive (downtime vs incident
    windows, session vs campaign flights). Same bucketization as
    range_join: both sides explode to covered buckets, the join is
    an equi-join on (key, bucket) + exact overlap filter. A pair of
    overlapping intervals shares every bucket between
    max(start_l, start_r) and min(end_l, end_r); we emit it exactly
    once by keeping only the FIRST shared bucket
    (``__b == greatest(floor(l_start), floor(r_start))`` in bucket
    units) — a row-local filter, so no dedup shuffle and genuine
    duplicate input rows keep their join multiplicity (unlike a
    full-row distinct). No nested-loop, no all-pairs. Right-side
    columns that collide get ``suffix``."""
    by = [] if by is None else ([by] if isinstance(by, str)
                                else list(by))
    import pandas as pd

    def micros(c):
        return F.unix_micros(c.cast("timestamp"))
    bucket_us = F.lit(int(pd.Timedelta(bucket).total_seconds()
                          * 1_000_000))

    def bucketize(df, s, e):
        return df.withColumn("__b", F.explode(F.sequence(
            (micros(F.col(s)) / bucket_us).cast("long"),
            (micros(F.col(e)) / bucket_us).cast("long"))))

    rren = {c: c + suffix for c in right.columns
            if c in left.columns and c not in by}
    r = right
    for old, new in rren.items():
        r = r.withColumnRenamed(old, new)
    rs, re_ = rren.get(r_start, r_start), rren.get(r_end, r_end)
    lb = bucketize(left, l_start, l_end)
    rb = bucketize(r, rs, re_)
    first_shared = F.greatest(
        (micros(F.col(l_start)) / bucket_us).cast("long"),
        (micros(F.col(rs)) / bucket_us).cast("long"))
    return (lb.join(rb, by + ["__b"])
            .where((F.col(l_start) < F.col(re_))
                   & (F.col(rs) < F.col(l_end))
                   & (F.col("__b") == first_shared))
            .drop("__b"))


@register_op("interval_overlap_join", "df")
def _overlap_join(df, other, *args, **kw):
    return interval_overlap_join(df, other, *args, **kw)
