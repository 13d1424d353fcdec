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

import pandas as pd  # module-level: pandas_udf type-hint resolution
from pyspark.sql import DataFrame, Window, functions as F

# driver-dict gate for fuzzy_join's map-side prefix pick: ~40 MB of
# py-dict at q<=3; module-level so tests can force the shuffle fallback
FUZZY_VOCAB_CAP = 1_000_000

# broadcast gate for fuzzy_join's candidate join (est. gram-table
# bytes); module-level so tests can force the shuffle+salt path
FUZZY_BCAST_CAP = 64 * 1024 * 1024


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

    Plan shape (q-gram prefix blocking, NOT all-pairs): each side
    explodes its key into its ``q*max_distance + 1`` RAREST distinct
    positional ``q``-grams (the Ed-Join / Chaudhuri et al. prefix
    filter: t edits disturb at most q*t grams, so under ANY fixed
    total order of grams the (q*t+1)-prefixes of two within-t keys'
    rarity-sorted gram sets must intersect — exact recall), candidates
    are pairs sharing a prefix gram, and the exact banded
    ``levenshtein`` filter runs only on candidates. Pairs where either
    key is shorter than q*(t+1) go through a dedicated "#short" block
    (distance <= t bounds the length gap by t, so every key of length
    < q*(t+1) + t joins it — provably covers all remaining pairs).

    r12 plan shape (two shuffles fewer than r11):
    - MAP-SIDE PREFIX PICK: the gram-frequency table is
      VOCABULARY-sized (distinct q-grams <= charset^q — ~9k for the
      default q=2 over ASCII), so it is aggregated once (map-side
      combined, vocabulary-sized shuffle) and COLLECTED into a driver
      dict; each side's prefix is then computed row-locally by an
      Arrow-batched pandas_udf over the (deduplicated) entity rows —
      no gram-table explode + groupBy shuffle per side (the r11
      shape). Falls back to the r11 join+groupBy prefix when the
      vocabulary exceeds 1M grams (driver-dict no longer metadata).
    - MIN-COMMON-GRAM EMISSION (PPJoin-style): every gram row carries
      its key's full ordered prefix array; a candidate meeting at
      gram g survives only when g IS the first element of
      array_intersect(pre_l, pre_r) — both arrays sorted by the same
      global (freq, gram) order, so each true pair is verified and
      emitted EXACTLY ONCE and the result needs NO ``distinct``
      shuffle over the candidate multiset (the dominant r11 stage).
      Entity rows are dropDuplicates'd per side first (entity-sized
      shuffle) so duplicate input rows cannot re-emit a pair — the
      same collapse the r11 prefix groupBy provided.

    LENGTH BANDING (r11, recall-exact): a pair within t edits differs
    at most t in length, so candidates additionally key on a length
    band of width w = 2t+1 — the left key blocks on floor(len/w); the
    right key replicates to the at-most-2 bands {floor((len-t)/w),
    floor((len+t)/w)} (2t < w, so the window [len-t, len+t] crosses
    <=1 band boundary — coverage is provable, not heuristic). A pair
    meets in exactly ONE band (the left key's own band).

    ``max_gram_df`` drops grams appearing in more than that many LEFT
    entity rows before the prefix pick (stop-gram cap) — NOTE this
    trades the completeness guarantee for bounded work. Leave it None
    (default) when exact recall is required.

    ``salt_gram_df`` (r10; r11 symmetric grid + adaptive default;
    r12: only engages on the SHUFFLE join path — when either gram
    side fits the 64 MB broadcast gate the candidate join is a
    BroadcastHashJoin over a round-robin-repartitioned stream, which
    balances per ROW and needs no salting at all) fixes the shuffle
    candidate-join SKEW without any recall trade: a (gram,
    band) block whose count exceeds the cap on EITHER side is GRID
    SALTED — each side shards itself by hash(key) mod s_side
    (s_side = ceil(count_side/cap)) and replicates across the OTHER
    side's shards, so every pair meets exactly once at (gram, band,
    shard_l, shard_r), each task holds a <= cap x cap block, and the
    result is bit-identical. "auto" (default) derives the cap from
    the measured (gram, band) pair histogram: cap ~ sqrt(total_pairs
    / (4*parallelism)) clamped to [512, 100_000]. None disables. The
    collected hot list is metadata-bounded BY CONSTRUCTION (<=
    rows/cap entries) and enforced with a raise at 1e6.

    EAGERNESS + CACHE LIFECYCLE (r12, closes the r11 advisory): this
    function runs small eager jobs at CALL time — the vocabulary
    aggregation (always), a one-job entity count/avg-key-length
    stat for the broadcast decision, and the (gram, band) histogram
    (shuffle path, salting "auto") — before returning the lazy
    candidate plan. NOTHING
    data-sized is persisted: the r11 freq/lg/rg persist()s (which
    accumulated executor cache until GC) are gone — the per-side
    pipeline is a narrow explode over entity rows and is simply
    recomputed by the <=2 readers; the only cached object is the
    driver-side vocabulary dict, released with the call frame."""
    right_on = right_on or left_on
    keep = keep or []
    t = int(max_distance)
    min_len = q * (t + 1)
    p_len = q * t + 1
    w = 2 * t + 1

    def base_side(df, col, side):
        key = F.col(col).alias("__key_" + side)
        cols = [key] + [F.col(c).alias(f"{c}_{side}") for c in keep]
        return df.select(*cols).dropDuplicates()

    lb, rb = base_side(left, left_on, "l"), base_side(right, right_on, "r")

    def gram_arr(keycol):
        return F.expr(
            f"transform(sequence(1, length({keycol}) - {q - 1}),"
            f" i -> substring({keycol}, i, {q}))")

    # vocabulary: distinct-per-key gram counts over both sides' long
    # keys. Map-side combine makes the shuffle vocabulary-sized; the
    # agg also carries the LEFT-side count for the max_gram_df cap.
    def key_grams(b, side):
        kl = F.length("__key_" + side)
        return (b.where(kl >= min_len)
                .select(F.explode(F.array_distinct(
                    gram_arr("__key_" + side))).alias("__g"),
                    F.lit(1 if side == "l" else 0).alias("__is_l")))

    freq_df = (key_grams(lb, "l").unionByName(key_grams(rb, "r"))
               .groupBy("__g")
               .agg(F.count(F.lit(1)).alias("__f"),
                    F.sum("__is_l").alias("__fl")))
    vocab = freq_df.limit(FUZZY_VOCAB_CAP + 1).collect()

    if len(vocab) <= FUZZY_VOCAB_CAP:
        fmap = {r["__g"]: r["__f"] for r in vocab}
        hot_grams = (frozenset(
            r["__g"] for r in vocab if r["__fl"] > max_gram_df)
            if max_gram_df is not None else frozenset())
        del vocab

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<string>")
        def pick(keys: pd.Series) -> pd.Series:
            # row-local prefix: distinct grams sorted by the global
            # (freq asc, gram asc) order, first q*t+1; borderline keys
            # (len < min_len + t) append the "#short" sentinel LAST so
            # a real shared prefix gram always wins the min-common
            # test and the #short meeting is a no-op for them.
            out = []
            for k in keys:
                n = len(k)
                pre = []
                if n >= min_len:
                    gs = {k[i:i + q] for i in range(n - q + 1)}
                    if hot_grams:
                        gs -= hot_grams
                    gs = sorted(gs, key=lambda g: (fmap.get(g, 0), g))
                    pre = gs[:p_len]
                if n < min_len + t:
                    pre.append("#short")
                out.append(pre)
            return pd.Series(out)

        def side_grams(b, side):
            return (b.withColumn("__pre_" + side,
                                 pick(F.col("__key_" + side)))
                    .select("*", F.explode("__pre_" + side).alias("__g")))

        lg, rg = side_grams(lb, "l"), side_grams(rb, "r")
    else:
        # vocabulary too big for a driver dict: r11 shuffle prefix —
        # join the exploded gram table with the (broadcastable)
        # frequency table, groupBy entity, keep the p_len rarest.
        # localCheckpoint (not persist) truncates the freq lineage so
        # the two consumers don't recompute it, with block cleanup
        # tied to object GC rather than an explicit unpersist the
        # lazy return plan cannot schedule.
        freq = freq_df.select("__g", "__f").localCheckpoint(eager=True)
        # byte-based broadcast gate (r11 advisory): ~ (q bytes of gram
        # + 8B count + row overhead) per entry, broadcast under 256 MB
        n_vocab = freq.count()
        bfreq = (F.broadcast(freq)
                 if n_vocab * (q + 32) <= 256 * 1024 * 1024 else freq)
        hot = None
        if max_gram_df is not None:
            hot = F.broadcast(
                freq_df.where(F.col("__fl") > max_gram_df).select("__g"))

        def side_grams(b, side):
            key = "__key_" + side
            ident = [key] + [f"{c}_{side}" for c in keep]
            kl = F.length(key)
            g = (b.where(kl >= min_len)
                 .select("*", F.explode(F.array_distinct(
                     gram_arr(key))).alias("__g")))
            if hot is not None:
                g = g.join(hot, "__g", "left_anti")
            pre = (g.join(bfreq, "__g")
                   .groupBy(*ident)
                   .agg(F.slice(F.array_sort(F.array_distinct(
                       F.collect_list(F.struct("__f", "__g")))),
                       1, p_len).alias("__ps"))
                   .select(*ident, F.transform(
                       "__ps", lambda s: s["__g"]).alias("__pre_" + side)))
            shorts = (b.where(kl < min_len + t)
                      .join(pre.select(*ident), ident, "left_anti")
                      .withColumn("__pre_" + side,
                                  F.array(F.lit("#short"))))
            border = (pre.join(b.where(kl < min_len + t).select(*ident),
                               ident, "left_semi")
                      .withColumn("__pre_" + side, F.concat(
                          "__pre_" + side, F.array(F.lit("#short")))))
            full = (pre.join(b.where(kl < min_len + t).select(*ident),
                             ident, "left_anti")
                    .unionByName(border).unionByName(shorts))
            return full.select("*", F.explode("__pre_" + side).alias("__g"))

        lg, rg = side_grams(lb, "l"), side_grams(rb, "r")

    # length banding: left blocks on its own band, right replicates to
    # the <=2 endpoint bands
    lg = lg.withColumn("__b", F.floor(F.length("__key_l") / w))
    rlen = F.length("__key_r")
    rg = rg.withColumn("__b", F.explode(F.array_distinct(F.array(
        F.floor((rlen - t) / w), F.floor((rlen + t) / w)))))

    # JOIN STRATEGY (r12 — the AQE blind spot, measured at sf1): the
    # gram tables are tiny in BYTES (entity rows x ~(q*t+2) short
    # rows) but the candidate join's OUTPUT is sum-of-block-products
    # large, and AQE coalesces shuffle partitions by INPUT bytes —
    # it planned the ~60M-pair sf1 candidate join onto THREE tasks
    # (83 s executor time, the whole query serialized on one stage).
    # When either gram side fits a broadcast, the candidate join is
    # a BroadcastHashJoin against the SMALL side with the STREAMED
    # side round-robin repartitioned to 4x cores — per-ROW balance
    # regardless of (gram, band) skew (each streamed row probes the
    # hash table independently), no salting, no key shuffle at all.
    # Only above the broadcast cap does the shuffle path engage:
    # grid salting against block skew + an explicit-N repartition on
    # the join keys (user-specified N is exempt from AQE coalescing,
    # so the output-blind 3-task plan cannot recur).
    spark = left.sparkSession
    par = max(spark.sparkContext.defaultParallelism, 1)
    n_part = max(4 * par, int(spark.conf.get(
        "spark.sql.shuffle.partitions", "200")))
    stats = {r["__s"]: r for r in
             (lb.select(F.lit(0).alias("__s"),
                        F.length("__key_l").alias("__n"))
              .unionByName(rb.select(F.lit(1).alias("__s"),
                                     F.length("__key_r").alias("__n")))
              .groupBy("__s")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.avg("__n").alias("alen"))
              .collect())}
    keep_w = 16 * len(keep)

    def est_bytes(side):
        r = stats[0 if side == "l" else 1]
        bands = 1 if side == "l" else 2
        per_row = float(r["alen"] or 0) + q * p_len + keep_w + 48
        return int(r["n"]) * (p_len + 1) * bands * per_row

    lbytes, rbytes = est_bytes("l"), est_bytes("r")

    if min(lbytes, rbytes) <= FUZZY_BCAST_CAP:
        if rbytes <= lbytes:
            cand = (lg.repartition(n_part)
                    .join(F.broadcast(rg), ["__g", "__b"]).drop("__b"))
        else:
            cand = (rg.repartition(n_part)
                    .join(F.broadcast(lg), ["__g", "__b"]).drop("__b"))
    else:
        hot_blocks = []
        if salt_gram_df is not None:
            import math
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
                per_task = max(pairs_total / (4 * par), 250_000.0)
                cap = int(min(max(math.ceil(math.sqrt(per_task)), 512),
                              100_000))
            else:
                cap = int(salt_gram_df)
            hot_blocks = (cnt.where((F.col("__cl") > cap)
                                    | (F.col("__cr") > cap))
                          .select("__g", "__b",
                                  F.greatest(F.ceil(F.col("__cl") / cap),
                                             F.lit(1))
                                  .cast("int").alias("__sl"),
                                  F.greatest(F.ceil(F.col("__cr") / cap),
                                             F.lit(1))
                                  .cast("int").alias("__sr"))
                          .limit(1_000_001)
                          .collect())  # hot (gram, band)s — <= rows/cap
            if salt_gram_df == "auto":
                cnt.unpersist()
            if len(hot_blocks) > 1_000_000:
                raise ValueError(
                    "fuzzy_join: > 1e6 hot (gram, band) blocks at cap "
                    f"{cap} — the salt table would stop being metadata-"
                    "sized; raise salt_gram_df or pre-aggregate keys")
        if hot_blocks:
            sdf = F.broadcast(spark.createDataFrame(
                [(r["__g"], int(r["__b"]), int(r["__sl"]), int(r["__sr"]))
                 for r in hot_blocks],
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
            jk = ["__g", "__b", "__shl", "__shr"]
            cand = (lg.repartition(n_part, *jk)
                    .join(rg.repartition(n_part, *jk), jk)
                    .drop("__b", "__shl", "__shr"))
        else:
            jk = ["__g", "__b"]
            cand = (lg.repartition(n_part, *jk)
                    .join(rg.repartition(n_part, *jk), jk).drop("__b"))
    # MIN-COMMON-GRAM emission + thresholded verify: a pair meets once
    # per shared (prefix gram, band, shard) but only the meeting at
    # the FIRST common gram of the two (identically ordered) prefix
    # arrays survives — each true pair runs the banded O(t*n)
    # levenshtein (early exit past t, returns -1) exactly once and is
    # emitted exactly once. No distinct over the candidate multiset
    # (the dominant r11 stage at sf1).
    out_cols = (["__key_l"] + [f"{c}_l" for c in keep]
                + ["__key_r"] + [f"{c}_r" for c in keep])
    return (cand
            .where(F.col("__g") == F.element_at(
                F.array_intersect("__pre_l", "__pre_r"), 1))
            .withColumn("distance",
                        F.levenshtein("__key_l", "__key_r", t))
            .where(F.col("distance") >= 0)
            .select(*out_cols, "distance")
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


from .._registry import register_op


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
