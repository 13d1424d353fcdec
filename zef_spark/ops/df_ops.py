"""DataFrame-kind op implementations.

Design: every op here only *extends the logical plan* (lazy); nothing
materializes until `collect`. Ordering-sensitive list ops (sliding,
chunk, nth, enumerate, ...) require an explicit ``order_by`` argument —
DataFrames are unordered sets at scale, so implicit positional
semantics would be nondeterministic on a real cluster. Window ops take
optional ``partition_by``; when omitted, a WARNING-worthy single
partition window is used (fine for small frames, documented hazard at
100 TB — always pass partition_by in production pipelines).

Reference parity lines cited as ITF:<line> (see SURVEY §2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .core import ROW, register_op, to_column_predicate


def _cols(args):
    """Accept 'name', '-name' (desc), Column, or lists thereof."""
    out = []
    for a in args:
        if isinstance(a, (list, tuple)):
            out.extend(_cols(a))
        elif isinstance(a, Column):
            out.append(a)
        elif isinstance(a, str) and a.startswith("-"):
            out.append(F.col(a[1:]).desc())
        else:
            out.append(F.col(a))
    return out


def _window(order_by, partition_by=None):
    if partition_by is None:
        # a global window serializes the whole input through ONE task
        # — fine for driver-scale data, a stall at corpus scale
        # (VERDICT r1 scale hazard). Loud so callers pass the key.
        import warnings
        warnings.warn(
            "window op without partition_by: Spark will move ALL rows "
            "into a single partition. Pass partition_by for any "
            "non-trivial input.", stacklevel=4)
        return Window.partitionBy().orderBy(*_cols([order_by]))
    return Window.partitionBy(*_cols([partition_by])) \
        .orderBy(*_cols([order_by]))


# -- terminals --------------------------------------------------------
@register_op("collect", "df")
def _collect(df: DataFrame):
    if df.isStreaming:
        raise TypeError(
            "collect on a STREAMING DataFrame: terminate the chain "
            "with subscribe[fn] / for_each[fn] instead (reference "
            "Awaitable chains end in subscribe, op_structs.py:876)")
    rows = df.collect()
    if len(df.columns) == 1:
        vals = [r[0] for r in rows]
        return vals[0] if len(vals) == 1 else vals
    return [tuple(r) for r in rows]


@register_op("for_each", "df")
def _for_each(df: DataFrame, fn):
    if df.isStreaming:
        # per-element callback over micro-batches: the streaming form
        # of the same op (chain-on-stream, op_structs.py:789-824)
        from ..streaming.events import subscribe
        ncols = len(df.columns)

        def batch_fn(batch_df, _bid):
            for r in batch_df.toLocalIterator():
                fn(tuple(r) if ncols > 1 else r[0])
        return subscribe(df, batch_fn, once=True)
    for r in df.toLocalIterator():
        fn(tuple(r) if len(df.columns) > 1 else r[0])


# -- filter / projection ---------------------------------------------
@register_op("filter", "df")
def _filter(df: DataFrame, pred):
    return df.where(to_column_predicate(pred))


@register_op("without", "df")
def _without(df: DataFrame, other, on=None):
    """Set difference via left_anti join (ITF:9186). `on` = key cols;
    defaults to the columns shared by both sides."""
    if not isinstance(other, DataFrame):
        raise TypeError("df-without expects another DataFrame")
    keys = on or [c for c in df.columns if c in set(other.columns)]
    return df.join(other.select(*keys).dropDuplicates(), on=keys,
                   how="left_anti")


@register_op("map", "df")
def _map(df: DataFrame, fn):
    """fn(row_proxy) -> Column | dict[name, Column] | list[Column];
    dict gives aliased projection (ITF:5780 dict-of-fns analogue)."""
    if isinstance(fn, dict):
        return df.select(*[v.alias(k) if isinstance(v, Column)
                           else F.expr(v).alias(k) for k, v in fn.items()])
    if isinstance(fn, Column):
        return df.select(fn)
    if isinstance(fn, str):
        return df.select(F.expr(fn))
    out = fn(ROW)
    if isinstance(out, Column):
        return df.select(out)
    if isinstance(out, dict):
        return df.select(*[v.alias(k) for k, v in out.items()])
    if isinstance(out, (list, tuple)):
        return df.select(*out)
    raise TypeError("df-map fn must return Column(s)")


@register_op("select_keys", "df")
def _select_keys(df: DataFrame, *keys):
    return df.select(*[k for k in keys if k in df.columns])


@register_op("distinct", "df")
def _distinct(df: DataFrame):
    return df.distinct()


@register_op("distinct_by", "df")
def _distinct_by(df: DataFrame, *keys):
    return df.dropDuplicates(list(keys))


@register_op("is_distinct", "df")
def _is_distinct(df: DataFrame):
    return df.select(
        (F.count(F.lit(1)) == F.count_distinct(F.struct(*df.columns)))
        .alias("is_distinct"))


# -- aggregations (1-row DataFrames; stay lazy until collect) ---------
def _agg_factory(name, agg):
    @register_op(name, "df")
    def _op(df: DataFrame, col=None):
        c = _cols([col])[0] if col is not None else F.col(df.columns[0])
        return df.agg(agg(c).alias(name))
    return _op


_agg_factory("sum", F.sum)
_agg_factory("mean", F.avg)
_agg_factory("variance", F.var_samp)
_agg_factory("max", F.max)
_agg_factory("min", F.min)


@register_op("product", "df")
def _product(df: DataFrame, col=None):
    c = _cols([col])[0] if col is not None else F.col(df.columns[0])
    # exp(sum(log)) with sign tracking; map-side combinable (ITF:2743)
    return df.agg(
        (F.exp(F.sum(F.log(F.abs(c)))) *
         F.when(F.sum(F.when(c < 0, 1).otherwise(0)) % 2 == 1, -1.0)
         .otherwise(1.0)).alias("product"))


@register_op("length", "df")
def _length(df: DataFrame):
    return df.agg(F.count(F.lit(1)).alias("length"))


@register_op("count", "df")
def _count(df: DataFrame, pred=None):
    if pred is not None:
        df = df.where(to_column_predicate(pred))
    return df.agg(F.count(F.lit(1)).alias("count"))


@register_op("max_by", "df")
def _max_by(df: DataFrame, key):
    return df.agg(F.max_by(F.struct(*df.columns), _cols([key])[0])
                  .alias("r")).select("r.*")


@register_op("min_by", "df")
def _min_by(df: DataFrame, key):
    return df.agg(F.min_by(F.struct(*df.columns), _cols([key])[0])
                  .alias("r")).select("r.*")


@register_op("frequencies", "df")
def _frequencies(df: DataFrame, *cols):
    keys = list(cols) or df.columns
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("frequency"))


@register_op("group_by", "df")
def _group_by(df: DataFrame, key, agg=None):
    """group_by[key] -> (key, collect_list(struct)) rows; group_by[key,
    {alias: Column}] -> grouped aggregation (the scalable form)."""
    keys = _cols([key])
    g = df.groupBy(*keys)
    if agg is None:
        return g.agg(F.collect_list(F.struct(*df.columns)).alias("group"))
    if isinstance(agg, dict):
        return g.agg(*[c.alias(a) for a, c in agg.items()])
    raise TypeError("group_by agg spec must be a dict of name -> Column")


@register_op("all", "df")
def _all_df(df: DataFrame, pred=None):
    """Boolean ALL over rows (graph-scan `all` lives in graph kind)."""
    if pred is None:
        c = F.col(df.columns[0])
    else:
        c = to_column_predicate(pred)
    return df.agg(F.coalesce(F.bool_and(c), F.lit(True)).alias("all"))


@register_op("any", "df")
def _any_df(df: DataFrame, pred=None):
    c = F.col(df.columns[0]) if pred is None else to_column_predicate(pred)
    return df.agg(F.coalesce(F.bool_or(c), F.lit(False)).alias("any"))


# -- sort / limits ----------------------------------------------------
@register_op("sort", "df")
def _sort(df: DataFrame, *keys):
    if not keys:
        keys = df.columns
    return df.orderBy(*_cols(keys))


@register_op("reverse", "df")
def _reverse(df: DataFrame, *keys):
    if not keys:
        keys = df.columns
    flipped = [c.desc() if isinstance(c, str) else c
               for c in _cols([f"-{k}" if isinstance(k, str)
                               and not k.startswith("-") else k
                               for k in keys])]
    return df.orderBy(*flipped)


@register_op("take", "df")
def _take(df: DataFrame, n):
    return df.limit(n)


@register_op("skip", "df")
def _skip(df: DataFrame, n):
    return df.offset(n)


@register_op("nth", "df")
def _nth(df: DataFrame, n, order_by=None):
    if order_by is not None:
        df = df.orderBy(*_cols([order_by]))
    return df.offset(n).limit(1)


@register_op("first", "df")
def _first(df: DataFrame, order_by=None):
    if order_by is not None:
        df = df.orderBy(*_cols([order_by]))
    return df.limit(1)


@register_op("last", "df")
def _last(df: DataFrame, order_by=None):
    if order_by is None:
        raise ValueError("df-last requires an order_by column")
    return df.orderBy(*[c.desc() for c in _cols([order_by])]).limit(1)


@register_op("single", "df")
def _single(df: DataFrame):
    rows = df.limit(2).collect()
    if len(rows) != 1:
        raise ValueError(f"single: expected exactly 1 row, got {len(rows)}")
    return rows[0][0] if len(df.columns) == 1 else tuple(rows[0])


@register_op("shuffle", "df")
def _shuffle(df: DataFrame, seed=42):
    return df.orderBy(F.rand(seed))


@register_op("random_pick", "df")
def _random_pick(df: DataFrame, seed=42):
    return df.orderBy(F.rand(seed)).limit(1)


# -- sequence / window ops (explicit ordering required) ---------------
@register_op("enumerate", "df")
def _enumerate(df: DataFrame, order_by, partition_by=None):
    w = _window(order_by, partition_by)
    return df.withColumn("index", F.row_number().over(w) - 1)


@register_op("sliding", "df")
def _sliding(df: DataFrame, n, order_by, partition_by=None, step=1):
    """Overlapping windows (ITF:1427): rowsBetween forward frame +
    stride filter; emits (window_start_index, window array)."""
    w = _window(order_by, partition_by)
    wf = w.rowsBetween(0, n - 1)
    out = (df
           .withColumn("__idx", F.row_number().over(w) - 1)
           .withColumn("window",
                       F.collect_list(F.struct(*df.columns)).over(wf)))
    out = out.where((F.col("__idx") % step == 0) &
                    (F.size("window") == n))
    return out.withColumnRenamed("__idx", "window_start")


@register_op("chunk", "df")
def _chunk(df: DataFrame, n, order_by, partition_by=None):
    w = _window(order_by, partition_by)
    return df.withColumn(
        "chunk_id", F.floor((F.row_number().over(w) - 1) / n))


@register_op("chunk_by", "df")
def _chunk_by(df: DataFrame, key, order_by, partition_by=None):
    """Split where key changes (ITF:1386): lag-change flag + running
    sum = chunk id — the sessionization idiom."""
    w = _window(order_by, partition_by)
    k = _cols([key])[0]
    changed = F.when(
        k.eqNullSafe(F.lag(k).over(w)), F.lit(0)).otherwise(F.lit(1))
    return df.withColumn("chunk_id",
                         F.sum(changed).over(
                             w.rowsBetween(Window.unboundedPreceding, 0)) - 1)


@register_op("stride", "df")
def _stride(df: DataFrame, n, order_by, partition_by=None):
    w = _window(order_by, partition_by)
    return (df.withColumn("__idx", F.row_number().over(w) - 1)
            .where(F.col("__idx") % n == 0).drop("__idx"))


@register_op("scan", "df")
def _scan(df: DataFrame, agg, col, order_by, partition_by=None):
    """Cumulative fold emitting intermediates (ITF:3568) = running
    window agg. `agg` is 'sum'|'avg'|'min'|'max'|'count' or a callable
    Column aggregator."""
    aggs = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
            "count": F.count}
    fn = aggs[agg] if isinstance(agg, str) else agg
    w = _window(order_by, partition_by).rowsBetween(
        Window.unboundedPreceding, 0)
    return df.withColumn("scan", fn(_cols([col])[0]).over(w))


@register_op("group", "df")
def _group_df(df: DataFrame, key, order_by, partition_by=None):
    """Run-length grouping of successive equal keys (ITF:5890) —
    same machinery as chunk_by; group id column added."""
    return _chunk_by(df, key, order_by, partition_by) \
        .withColumnRenamed("chunk_id", "group_id")


# -- set ops ----------------------------------------------------------
@register_op("concat", "df")
def _concat(df: DataFrame, *others):
    out = df
    for o in others:
        out = out.unionByName(o, allowMissingColumns=True)
    return out


@register_op("merge", "df")
def _merge_df(df: DataFrame, *others):
    """Stream/batch merge (reference stream `merge` joins Awaitables
    into one stream): unionByName, valid on streaming DataFrames too
    (Spark unions streaming sources natively)."""
    out = df
    for o in others:
        out = out.unionByName(o, allowMissingColumns=True)
    return out


@register_op("interleave", "df")
def _interleave(df: DataFrame, other, order_by):
    """Round-robin merge by per-source rank then (rank, source)."""
    a = df.withColumn("__src", F.lit(0)) \
          .withColumn("__rk", F.row_number().over(_window(order_by)))
    b = other.withColumn("__src", F.lit(1)) \
             .withColumn("__rk", F.row_number().over(_window(order_by)))
    return (a.unionByName(b).orderBy("__rk", "__src")
            .drop("__rk", "__src"))


@register_op("cartesian_product", "df")
def _cartesian(df: DataFrame, other):
    return df.crossJoin(other)


# -- misc -------------------------------------------------------------
@register_op("tap", "df")
def _tap(df: DataFrame, fn=None):
    (fn or (lambda d: d.show(20, truncate=False)))(df)
    return df


@register_op("Assert", "df")
def _assert_df(df: DataFrame, pred, msg="assertion failed"):
    c = to_column_predicate(pred)
    return df.where(
        F.when(~c, F.raise_error(F.lit(msg))).otherwise(F.lit(True)))


@register_op("identity", "df")
def _identity(df: DataFrame):
    return df


# -- reshaping: pivot / unpivot / hierarchical aggregates -------------
@register_op("pivot_table", "df")
def _pivot_table(df: DataFrame, index, pivot_col, agg,
                 pivot_values=None):
    """Wide pivot: one row per `index`, one column per pivot value.
    ALWAYS pass `pivot_values` at scale — without them Spark runs an
    extra full scan (distinct on the pivot column) before it can even
    plan, and an unbounded value set makes an unbounded-width row.
    With values given, the pivot is a single hash aggregate with
    map-side combine (pivot_values columns of partial state/group).
    `agg`: a Column aggregate (e.g. F.count(F.lit(1)))."""
    index = [index] if isinstance(index, str) else list(index)
    g = df.groupBy(*index)
    p = (g.pivot(pivot_col, list(pivot_values)) if pivot_values
         else g.pivot(pivot_col))
    return p.agg(agg)


@register_op("unpivot", "df")
def _unpivot(df: DataFrame, ids, value_cols, var_name="variable",
             value_name="value"):
    """Long melt (inverse of pivot): row-local explode of the chosen
    columns — zero shuffle."""
    ids = [ids] if isinstance(ids, str) else list(ids)
    vals = [value_cols] if isinstance(value_cols, str) \
        else list(value_cols)
    return df.unpivot(ids, vals, var_name, value_name)


@register_op("rollup_agg", "df")
def _rollup_agg(df: DataFrame, cols, aggs: dict):
    """Hierarchical subtotals (GROUP BY ROLLUP): one pass emits every
    prefix level plus the grand total; `grouping_level` counts how
    many trailing dims are rolled up (0 = leaf row). Spark expands
    rollup inside a single Expand+hash-aggregate — no repeated scans.
    `aggs`: name -> aggregate Column."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    return (df.rollup(*cols)
            .agg(*[a.alias(n) for n, a in aggs.items()],
                 F.grouping_id().alias("grouping_level")))


@register_op("cube_agg", "df")
def _cube_agg(df: DataFrame, cols, aggs: dict):
    """All-subsets subtotals (GROUP BY CUBE), same single-pass Expand
    shape as rollup_agg; grouping_id identifies the subset."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    return (df.cube(*cols)
            .agg(*[a.alias(n) for n, a in aggs.items()],
                 F.grouping_id().alias("grouping_level")))


# -- ranking / offset window family -----------------------------------
def _rank_fam(df: DataFrame, fn_col, order_by, partition_by, out):
    return df.withColumn(out, fn_col.over(_window(order_by,
                                                  partition_by)))


@register_op("rank_by", "df")
def _rank_by(df: DataFrame, order_by, partition_by=None, out="rank"):
    """SQL RANK (gaps on ties) within each partition. One shuffle on
    the partition key; warns loudly when partition_by is omitted."""
    return _rank_fam(df, F.rank(), order_by, partition_by, out)


@register_op("dense_rank_by", "df")
def _dense_rank_by(df: DataFrame, order_by, partition_by=None,
                   out="dense_rank"):
    return _rank_fam(df, F.dense_rank(), order_by, partition_by, out)


@register_op("row_number_by", "df")
def _row_number_by(df: DataFrame, order_by, partition_by=None,
                   out="row_number"):
    return _rank_fam(df, F.row_number(), order_by, partition_by, out)


@register_op("percent_rank_by", "df")
def _percent_rank_by(df: DataFrame, order_by, partition_by=None,
                     out="percent_rank"):
    return _rank_fam(df, F.percent_rank(), order_by, partition_by, out)


@register_op("ntile_by", "df")
def _ntile_by(df: DataFrame, n, order_by, partition_by=None,
              out="ntile"):
    return _rank_fam(df, F.ntile(n), order_by, partition_by, out)


@register_op("lag_by", "df")
def _lag_by(df: DataFrame, col, order_by, partition_by=None,
            offset=1, default=None, out=None):
    return _rank_fam(df, F.lag(col, offset, default), order_by,
                     partition_by, out or f"{col}_lag")


@register_op("lead_by", "df")
def _lead_by(df: DataFrame, col, order_by, partition_by=None,
             offset=1, default=None, out=None):
    return _rank_fam(df, F.lead(col, offset, default), order_by,
                     partition_by, out or f"{col}_lead")


# -- semi-structured / profiling extras -------------------------------
@register_op("json_extract", "df")
def _json_extract(df: DataFrame, col, path, out=None):
    """Extract one JSON path (e.g. '$.k') as a string column —
    row-local get_json_object, no parse-schema needed. For repeated
    multi-field extraction prefer json_parse (one parse, typed)."""
    return df.withColumn(out or path.replace("$", "").strip("."),
                         F.get_json_object(F.col(col), path))


@register_op("json_fields", "df")
def _json_fields(df: DataFrame, col, paths: dict):
    """Extract several paths at once: json_tuple parses the document
    ONCE per row for all root fields (vs one parse per
    get_json_object call)."""
    names = list(paths)
    roots = [paths[n].replace("$.", "") for n in names]
    return df.select(
        "*", F.json_tuple(F.col(col), *roots).alias(*names))


@register_op("json_parse", "df")
def _json_parse(df: DataFrame, col, schema: str, out=None):
    """Parse a JSON string column into a typed struct with an explicit
    schema ('k INT, tag STRING') — NEVER schema inference at scale
    (inference is an extra full scan and makes the output type
    data-dependent)."""
    return df.withColumn(out or f"{col}_parsed",
                         F.from_json(F.col(col), schema))


@register_op("histogram", "df")
def _histogram(df: DataFrame, col, bins: int, lo: float, hi: float):
    """Equi-width histogram with EXPLICIT bounds: (bin, bin_lo,
    bin_hi, n) — one hash aggregate, out-of-range rows clamp to the
    edge bins. Explicit bounds keep it one pass; bounds-from-data is
    a separate 1-row aggregate the caller can run first."""
    w = (hi - lo) / bins
    b = F.least(F.greatest(F.floor((F.col(col) - F.lit(lo)) / F.lit(w))
                           .cast("long"), F.lit(0)),
                F.lit(bins - 1))
    return (df.groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select("bin",
                    (F.lit(lo) + F.col("bin") * F.lit(w)).alias("bin_lo"),
                    (F.lit(lo) + (F.col("bin") + 1) * F.lit(w))
                    .alias("bin_hi"), "n"))


@register_op("corr_matrix", "df")
def _corr_matrix(df: DataFrame, cols: list, digits: int = 4):
    """Pairwise Pearson correlations of numeric columns in ONE
    aggregate pass (all pairs stack into a single row, then explode
    row-locally). digits=4: correlation accumulation order differs
    across engines in low digits."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    row = df.agg(*[F.round(F.corr(a, b), digits).alias(f"__c_{a}_{b}")
                   for a, b in pairs])
    per = [F.struct(F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                    F.col(f"__c_{a}_{b}").alias("corr"))
           for a, b in pairs]
    return (row.select(F.explode(F.array(*per)).alias("p"))
            .select("p.*"))


# -- DataFrame conveniences (Spark-native verbs as chainables) --------
@register_op("explode", "df")
def _explode(df: DataFrame, col, out=None, outer: bool = False,
             keep: bool = False):
    """Explode an array column to rows; outer=True keeps empty/null
    arrays as one null row; keep=True retains the source column.
    Row-local (GenerateExec) — zero shuffle."""
    gen = F.explode_outer if outer else F.explode
    c = _cols([col])[0]
    others = [x for x in df.columns
              if keep or not (isinstance(col, str) and x == col)]
    return df.select(*others, gen(c).alias(out or "value"))


@register_op("pos_explode", "df")
def _pos_explode(df: DataFrame, col, pos_out="pos", out="value",
                 outer: bool = False):
    gen = F.posexplode_outer if outer else F.posexplode
    others = [x for x in df.columns
              if not (isinstance(col, str) and x == col)]
    return df.select(*others, gen(_cols([col])[0]).alias(pos_out, out))


@register_op("with_column", "df")
def _with_column(df: DataFrame, name, col):
    return df.withColumn(name, col if isinstance(col, Column)
                         else F.expr(col) if isinstance(col, str)
                         else F.lit(col))


@register_op("with_columns", "df")
def _with_columns(df: DataFrame, cols: dict):
    return df.withColumns({k: (v if isinstance(v, Column)
                               else F.expr(v) if isinstance(v, str)
                               else F.lit(v))
                           for k, v in cols.items()})


@register_op("drop_columns", "df")
def _drop_columns(df: DataFrame, *cols):
    return df.drop(*cols)


@register_op("rename_columns", "df")
def _rename_columns(df: DataFrame, mapping: dict):
    return df.withColumnsRenamed(mapping)


@register_op("fill_na", "df")
def _fill_na(df: DataFrame, value, subset=None):
    """Constant null fill (df.na.fill); for statistical fills
    (mean/median/mode) use pipeline.wrangling.impute."""
    return df.na.fill(value, subset=subset)


@register_op("drop_na", "df")
def _drop_na(df: DataFrame, how="any", subset=None):
    return df.na.drop(how=how, subset=subset)


@register_op("top_k_by", "df")
def _top_k_by(df: DataFrame, k: int, order_by, partition_by=None):
    """Top-k rows per group (or globally) by sort order. Grouped form
    is one shuffle + row_number; global form compiles to
    TakeOrderedAndProject — never a full sort."""
    if partition_by is None:
        return df.orderBy(*_cols([order_by])).limit(k)
    w = _window(order_by, partition_by)
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k).drop("__rn"))


@register_op("distinct_on", "df")
def _distinct_on(df: DataFrame, keys, order_by):
    """SQL DISTINCT ON: ONE row per key — the first under ``order_by``
    ('-col' for descending; deterministic, unlike dropDuplicates'
    arbitrary pick). One shuffle on the keys (row_number window)."""
    w = _window(order_by, keys)
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def group_percentiles(df, key_cols, value_col,
                      ps: tuple[float, ...] = (0.5, 0.9, 0.99)):
    """(keys..., n, p<NN>...) — EXACT per-group percentiles by the
    rank-of-sorted-multiset definition (PERCENTILE_DISC): p-th
    percentile = the value at row ceil(p·n) of the group's sorted
    values. Integer rank arithmetic — no interpolation, no FP
    averaging — so any engine computing the same definition matches
    bit-for-bit, and ties need no ordering convention (the value at
    a sorted position is unique even when row order among equals is
    not).

    ONE shuffle: the rank window and the count window share the
    group-key partitioning, and the final pivot is a conditional agg
    over the same keys (map-side combinable). The sort is per-group
    (inside partitions), never global."""
    from pyspark.sql import Window
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = Window.partitionBy(*keys).orderBy(value_col)
    wn = Window.partitionBy(*keys)
    base = (df.withColumn("__rn", F.row_number().over(w))
            .withColumn("__n", F.count(F.lit(1)).over(wn)))
    aggs = [F.max("__n").alias("n")]
    for p in ps:
        target = F.ceil(F.lit(float(p)) * F.col("__n"))
        name = f"p{int(round(float(p) * 100))}"
        aggs.append(F.max(F.when(F.col("__rn") == target,
                                 F.col(value_col))).alias(name))
    return base.groupBy(*keys).agg(*aggs)


register_op("group_percentiles", "df")(group_percentiles)


def trimmed_mean(df, key_cols, value_col, trim: float = 0.05,
                 digits: int = 6):
    """(keys..., n, n_used, tmean) — per-group TRIMMED mean with the
    original (keys, value) signature and fixed ROUND(·, digits)
    `tmean` contract. Thin compatibility wrapper over the single
    implementation in pipeline.wrangling.trimmed_mean (which adds
    the NULL-safe empty-middle guard and the sig-safe variant)."""
    from ..pipeline.wrangling import trimmed_mean as _tm
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return _tm(df, value_col, by=keys, trim=trim, digits=digits,
               out_col="tmean", fixed_round=True)


def topn_with_other(df, key_col, weight_col=None, n: int = 10,
                    label: str = "OTHER", digits: int = 6):
    """(key, weight, share) — the reporting staple: the top-n keys by
    total weight (row count when weight_col is None) plus ONE 'OTHER'
    row folding the entire tail, with each row's share of the grand
    total. Vocabulary-sized agg → rank window over the vocabulary
    (never the fact table) → conditional re-agg; grand total rides
    along as a window sum, no second scan. Ties at the n-boundary
    break on the key (deterministic)."""
    from pyspark.sql import Window, functions as F
    dec = "decimal(38,12)"
    k = F.coalesce(F.col(key_col).cast("string"), F.lit("∅"))
    wgt = (F.lit(1.0) if weight_col is None
           else F.col(weight_col).cast("double"))
    per_key = (df.groupBy(k.alias("__k"))
               .agg(F.sum(F.round(wgt, 12).cast(dec)).alias("__w")))
    wr = Window.orderBy(F.col("__w").desc(), "__k")
    wa = Window.partitionBy()
    ranked = (per_key.withColumn("__r", F.row_number().over(wr))
              .withColumn("__tot", F.sum("__w").over(wa)))
    bucket = F.when(F.col("__r") <= n, F.col("__k")) \
        .otherwise(F.lit(label))
    grouped = (ranked.groupBy(bucket.alias(key_col))
               .agg(F.sum("__w").alias("__wsum"),
                    F.max("__tot").alias("__tot")))
    # weight rounds IN DECIMAL before the double cast (r10): at
    # sf1 the OTHER bucket's sum is ~3e11, where round(double, 6)
    # needs x*1e6 > 2^53 — both engines then emit ulp NOISE
    # (…441.39996) instead of the exact …441.4. Rounding the exact
    # decimal is lossless at any magnitude; the final cast is one
    # nearest-even conversion, identical everywhere.
    return (grouped.select(
        key_col,
        F.round(F.col("__wsum"), digits).cast("double")
        .alias("weight"),
        F.round(F.col("__wsum").cast("double")
                / F.col("__tot").cast("double"), digits)
        .alias("share")))


@register_op("topn_with_other", "df")
def _topn_with_other_op(df, *args, **kw):
    return topn_with_other(df, *args, **kw)
