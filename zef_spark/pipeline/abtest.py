"""Two-sample hypothesis tests (A/B experimentation tier): Welch's
t-test, Mann-Whitney U, and the two-proportion z-test.

Reference parity: the reference exposes the statistical primitives
(`mean`/`variance`, `frequencies`, rank assembly via `sort`+`enumerate`
— ITF zefops) from which experimenters hand-roll these tests; this
module ships the assembled tests directly, Spark-shaped: each test is
ONE conditional-aggregation scan (Welch, z-test) or one value-grouped
agg plus a range-partitioned distributed prefix sum (Mann-Whitney —
never a single-partition sort), so every statistic survives a 100 TB
input with a single shuffle.

Determinism discipline (house rule): every sum is decimal(38,12) over
terms rounded at 12 decimals; floating point enters only in the final
O(1)-row statistic arithmetic, which is IEEE-deterministic given
bit-identical inputs. Test statistics are emitted WITHOUT p-values —
neither Spark SQL nor the oracle engine exposes the t/normal CDF, so
callers gate on |t| / |z| against looked-up critical values (1.96,
2.58, ...); the emitted `dof` makes the t lookup exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .._registry import register_op

_DEC = "decimal(38,12)"


def _term(c):
    return F.round(c, 12).cast(_DEC)


def welch_ttest(df: DataFrame, group_col: str, value_col: str,
                group_a, group_b, digits: int = 6) -> DataFrame:
    """One row (n_a, n_b, mean_a, mean_b, diff, t_stat, dof,
    cohens_d) — Welch's unequal-variance t-test between the two
    named groups:

        t = (x̄_a − x̄_b) / √(s²_a/n_a + s²_b/n_b)

    with the Welch–Satterthwaite degrees of freedom and Cohen's d
    (pooled-s.d. effect size) alongside. The default two-sample test
    when variances differ — which at pipeline scale they always do.

    Plan: ONE conditional-aggregation scan (no join, no pivot
    shuffle): each group's n/Σx/Σx² come from `sum(when(grp==g, …))`
    in the same hash agg, map-side combinable. Decimal-exact sums;
    sample variances and the statistic assemble in double on the
    1-row result. Degenerate inputs (a group absent or n<2, or both
    variances zero) yield NULL t/dof."""
    g = F.col(group_col)
    x = F.col(value_col).cast("double")
    in_a = g == F.lit(group_a)
    in_b = g == F.lit(group_b)
    # NULL values drop BEFORE the aggregate (r07 ADVICE): counting a
    # NULL-value row in n while its term vanishes from Σx/Σx² would
    # silently bias mean/variance/t/dof/d — same NULL-deletion
    # convention as ranksum_agg / group_moments / forecast_metrics.
    agg = (df.where((in_a | in_b) & x.isNotNull())
           .agg(F.sum(in_a.cast("long")).alias("__na"),
                F.sum(in_b.cast("long")).alias("__nb"),
                F.sum(F.when(in_a, _term(x))).cast("double")
                .alias("__sa"),
                F.sum(F.when(in_b, _term(x))).cast("double")
                .alias("__sb"),
                F.sum(F.when(in_a, _term(x * x))).cast("double")
                .alias("__qa"),
                F.sum(F.when(in_b, _term(x * x))).cast("double")
                .alias("__qb")))
    na = F.col("__na").cast("double")
    nb = F.col("__nb").cast("double")
    ma = F.col("__sa") / na
    mb = F.col("__sb") / nb
    va = (F.col("__qa") - F.col("__sa") * F.col("__sa") / na) \
        / (na - 1)
    vb = (F.col("__qb") - F.col("__sb") * F.col("__sb") / nb) \
        / (nb - 1)
    sea = va / na
    seb = vb / nb
    se2 = sea + seb
    ok = (F.col("__na") >= 2) & (F.col("__nb") >= 2) & (se2 > 0)
    t = F.when(ok, (ma - mb) / F.sqrt(se2))
    dof = F.when(ok, se2 * se2 / (sea * sea / (na - 1)
                                  + seb * seb / (nb - 1)))
    pooled = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    d = F.when(ok & (pooled > 0), (ma - mb) / F.sqrt(pooled))
    return agg.select(
        F.col("__na").alias("n_a"), F.col("__nb").alias("n_b"),
        F.round(ma, digits).alias("mean_a"),
        F.round(mb, digits).alias("mean_b"),
        F.round(ma - mb, digits).alias("diff"),
        F.round(t, digits).alias("t_stat"),
        F.round(dof, digits).alias("dof"),
        F.round(d, digits).alias("cohens_d"))


def ranksum_agg(df: DataFrame, value_col: str, in_a,
                n_ranges: int | None = None) -> DataFrame:
    """Internal engine shared by mann_whitney_u and
    evaluation.binary_auc: the midrank rank-sum aggregate of the
    rows marked by boolean Column ``in_a`` within the whole input.
    Returns the 1-row frame (__nal = |A|, __nl = n, __r2 = 2·R_a
    exact integer, __ties = Σ t³−t over tied blocks, both
    decimal(38,0)).

    Plan: one value-grouped hash agg collapses the input to the
    distinct-value table; the cumulative count-below runs as the
    range-partitioned two-phase prefix sum (per-range local window +
    2-scalars-per-range broadcast offsets — never a single-partition
    sort). A tied block of size t at cumulative offset c contributes
    ca·(2c + t + 1) to 2·R_a — exact integers throughout."""
    from pyspark.sql import Window
    spark = df.sparkSession
    if n_ranges is None:
        n_ranges = spark.sparkContext.defaultParallelism
    x = F.col(value_col).cast("double")
    vt = (df.where(x.isNotNull())
          .groupBy(x.alias("__v"))
          .agg(F.sum(in_a.cast("long")).alias("__ca"),
               F.count(F.lit(1)).alias("__cnt")))
    # r12: in-plan offsets (distkit.range_offsets) — one Spark
    # action replaces the eager localCheckpoint job + per-range
    # collect + createDataFrame round trip; persist pins range
    # boundaries/ids across the two consumers (distkit docstring).
    from .distkit import _ranged, range_offsets
    ranged = _ranged(vt, [F.col("__v")], n_ranges)
    w_in = (Window.partitionBy("__rid").orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, 0))
    local = ranged.withColumn("__lc", F.sum("__cnt").over(w_in))
    off_df = (range_offsets(ranged, {"__cnt": "long"})
              .withColumnRenamed("__off___cnt", "__off"))
    d0 = "decimal(38,0)"
    cb = (F.col("__lc") + F.col("__off") - F.col("__cnt")) \
        .cast(d0)  # count strictly below this value
    ca = F.col("__ca").cast(d0)
    cnt = F.col("__cnt").cast(d0)
    return (local.join(F.broadcast(off_df), "__rid")
            .agg(F.sum(F.col("__ca")).alias("__nal"),
                 F.sum(F.col("__cnt")).alias("__nl"),
                 # 2·R_a, exact integer
                 F.sum(ca * (F.lit(2).cast(d0) * cb + cnt
                             + F.lit(1).cast(d0))).alias("__r2"),
                 # Σ t³ − t over tied blocks, exact integer
                 F.sum(cnt * cnt * cnt - cnt).alias("__ties")))


def mann_whitney_u(df: DataFrame, group_col: str, value_col: str,
                   group_a, group_b, n_ranges: int | None = None,
                   digits: int = 6) -> DataFrame:
    """One row (n_a, n_b, u_a, u_b, z, cliffs_delta) — the
    Mann-Whitney U
    (Wilcoxon rank-sum) test between the two named groups, with
    midrank tie handling and the tie-corrected normal approximation:

        U_a = R_a − n_a(n_a+1)/2,          U_b = n_a·n_b − U_a
        z   = (U_a − n_a·n_b/2) / σ_U
        σ²_U = n_a·n_b/12 · (n+1 − Σ(t³−t)/(n(n−1)))

    The non-parametric companion to welch_ttest — rank arithmetic is
    EXACT (integers scaled ×2, no FP ranks), so the statistic is
    bit-identical on any engine.

    Plan: one value-grouped hash agg collapses the input to the
    DISTINCT-VALUE table (per-value counts in each group), then the
    cumulative count-below runs as the range-partitioned two-phase
    prefix sum (per-range local window + 2-scalars-per-range
    broadcast offsets; concurrency_profile's sweep shape — never a
    single-partition sort). The rank-sum folds tied blocks in one
    expression: R_a over a tied block of size t at cumulative offset
    c contributes ca·(2c + t + 1)/2, summed in decimal(38,0) ×2 so
    n up to 10^18 cannot overflow."""
    g = F.col(group_col)
    in_a = g == F.lit(group_a)
    in_b = g == F.lit(group_b)
    agg = ranksum_agg(df.where(in_a | in_b), value_col, in_a,
                      n_ranges)
    na = F.col("__nal").cast("double")
    n = F.col("__nl").cast("double")
    nb_ = n - na
    ua = (F.col("__r2").cast("double")
          - na * (na + 1)) / F.lit(2.0)
    mu = na * nb_ / 2
    var = (na * nb_ / 12) * (n + 1 - F.col("__ties").cast("double")
                             / (n * (n - 1)))
    ok = (na > 0) & (nb_ > 0) & (var > 0)
    z = F.when(ok, (ua - mu) / F.sqrt(var))
    # Cliff's delta = 2U_a/(n_a·n_b) − 1 ∈ [−1,1]: the rank effect
    # size (P(a>b) − P(a<b)) completing the grid (cohens_d for
    # welch, η² for anova, V for χ²) — exact-integer arithmetic,
    # one division
    delta = F.when((na > 0) & (nb_ > 0),
                   2.0 * ua / (na * nb_) - 1.0)
    return agg.select(
        F.col("__nal").cast("long").alias("n_a"),
        (F.col("__nl") - F.col("__nal")).cast("long").alias("n_b"),
        F.round(ua, digits).alias("u_a"),
        F.round(na * nb_ - ua, digits).alias("u_b"),
        F.round(z, digits).alias("z"),
        F.round(delta, digits).alias("cliffs_delta"))


def two_proportion_ztest(df: DataFrame, group_col: str,
                         success_col, group_a, group_b,
                         digits: int = 6) -> DataFrame:
    """One row (n_a, n_b, p_a, p_b, diff, z) — the pooled
    two-proportion z-test (conversion-rate A/B test):

        z = (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a + 1/n_b))

    ``success_col`` is a column name or boolean Column marking a
    success. NULL-handling convention, stated explicitly (r07
    ADVICE): a NULL success flag counts as a FAILURE — the row stays
    in n but not in the success count (unknown outcome ≠ converted).
    Pre-filter ``success_col IS NOT NULL`` upstream for NULL-deletion
    semantics instead. Plan: ONE conditional-aggregation scan,
    map-side combinable — four longs total cross the wire.
    Degenerate inputs (a group empty, or pooled p̂ ∈ {0,1}) yield
    NULL z."""
    g = F.col(group_col)
    s = (F.col(success_col) if isinstance(success_col, str)
         else success_col).cast("boolean")
    in_a = g == F.lit(group_a)
    in_b = g == F.lit(group_b)
    agg = (df.where(in_a | in_b)
           .agg(F.sum(in_a.cast("long")).alias("__na"),
                F.sum(in_b.cast("long")).alias("__nb"),
                F.sum((in_a & s).cast("long")).alias("__sa"),
                F.sum((in_b & s).cast("long")).alias("__sb")))
    na = F.col("__na").cast("double")
    nb = F.col("__nb").cast("double")
    pa = F.col("__sa") / na
    pb = F.col("__sb") / nb
    pp = (F.col("__sa") + F.col("__sb")) / (na + nb)
    se2 = pp * (1 - pp) * (1 / na + 1 / nb)
    ok = (F.col("__na") > 0) & (F.col("__nb") > 0) & (se2 > 0)
    z = F.when(ok, (pa - pb) / F.sqrt(se2))
    return agg.select(
        F.col("__na").alias("n_a"), F.col("__nb").alias("n_b"),
        F.round(pa, digits).alias("p_a"),
        F.round(pb, digits).alias("p_b"),
        F.round(pa - pb, digits).alias("diff"),
        F.round(z, digits).alias("z"))


@register_op("welch_ttest", "df")
def _welch_op(df, *args, **kw):
    return welch_ttest(df, *args, **kw)


@register_op("mann_whitney_u", "df")
def _mwu_op(df, *args, **kw):
    return mann_whitney_u(df, *args, **kw)


@register_op("two_proportion_ztest", "df")
def _tpz_op(df, *args, **kw):
    return two_proportion_ztest(df, *args, **kw)


# Poisson(1) CDF, cumulative e^{-1}/k! for k = 0..8 — HARDCODED
# literals shared verbatim with the oracle SQL so the inverse-CDF
# weight ladder is bit-identical in any engine (P(w>8) ≈ 1.1e-6; the
# ladder caps there).
POISSON1_CDF = (0.36787944117144233, 0.7357588823428847,
                0.9196986029286058, 0.9810118431238463,
                0.9963401531726563, 0.9994058151824183,
                0.999916758850712, 0.9999897508033253,
                0.999998874797402)

_U32 = 4294967296.0  # 2^32: one 8-hex-digit chunk


def bootstrap_ci(df: DataFrame, value_col: str, key_col: str,
                 B: int = 100, alpha: float = 0.05,
                 salt: str = "boot_v1", digits: int = 6) -> DataFrame:
    """1-row (n, mean, lo, hi, b_used) — a (1−alpha) POISSON-bootstrap
    confidence interval for the mean, the bootstrap that scales: each
    row's multiplicity in replicate b is an independent Poisson(1)
    draw (the B→∞ limit of multinomial resampling), so NO resample is
    ever materialized. ``key_col`` MUST uniquely identify rows (r07
    ADVICE — e.g. o_orderkey): every replicate weight is a pure
    function of the key, so duplicate keys would receive IDENTICAL
    Poisson draws, correlating resamples and silently narrowing the
    CI. Draws are a pure function of the key —
    md5(key:g:salt) supplies FOUR 32-bit uniforms (8 hex digits each,
    replicates 4g..4g+3) pushed through the inverse-CDF ladder — so
    any engine with md5 replays them bit-for-bit (same family as
    corpus.hash_sample method='md5'), and the md5 cost is B/4 hashes
    per row, evaluated ONCE in a projection (not per aggregate; the
    naive per-replicate-hash agg form measured ~10x slower).

    Plan: ONE scan → row-local weight array → posexplode to (b, w, x)
    → ONE hash agg keyed by b (map-side combine leaves B partials
    per partition — only B×partitions tiny rows cross the wire) →
    integer-rank percentile over the B-row replicate-mean table
    (PERCENTILE_DISC: lo = value at ceil(alpha/2·b), hi at
    ceil((1−alpha/2)·b)). Decimal-exact sums throughout. Replicates
    whose weights all landed 0 (only possible on tiny inputs) are
    excluded; b_used reports the count. 32-bit uniform precision
    changes nothing cross-engine (both compare identical doubles);
    at any B the interval's own Monte-Carlo error dominates it."""
    from pyspark.sql import Window
    dec = "decimal(38,12)"
    term = lambda c: F.round(c, 12).cast(dec)
    import hashlib
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf
    x = F.col(value_col).cast("double")
    base = df.where(x.isNotNull())
    # The weight array comes from an Arrow-batched pandas UDF, NOT
    # from built-in expressions: a B-slot md5 expression tree is
    # pathological in Catalyst — the when-ladder duplicates the hash
    # per branch (>64KB codegen → interpreted fallback), and
    # InferFiltersFromGenerate clones the ENTIRE array expression
    # into a scan-level size()>0 filter, evaluating it twice per
    # row. Measured: 21-29 s at sf0.1 as expressions vs ~2 s as a
    # UDF (1.5M hashlib md5 + one vectorized searchsorted ladder
    # per batch). The UDF output is a materialized column, so the
    # inferred filter references the attribute, not the computation.
    G = (B + 3) // 4
    cdf = np.asarray(POISSON1_CDF)

    def _weights(keys):
        out = []
        for k in keys.astype(str):
            us = np.empty(G * 4)
            i = 0
            for g in range(G):
                h = hashlib.md5(f"{k}:{g}{salt}".encode()).hexdigest()
                for j in range(4):
                    us[i] = int(h[8 * j:8 * j + 8], 16) / _U32
                    i += 1
            out.append(us[:B])
        # w = Σ_k 1[u ≥ t_k] == right-insertion index into the CDF
        ws = np.searchsorted(cdf, np.asarray(out), side="right")
        return pd.Series(list(ws.astype("float64")))

    _weights.__annotations__ = {"keys": pd.Series, "return": pd.Series}
    weights = pandas_udf(T.ArrayType(T.DoubleType()))(_weights)
    # spread the md5 kernel across cores BEFORE the UDF: a compact
    # parquet source can arrive as one partition, which would run
    # the hash loop single-threaded (measured 8.7 s vs ~0.5 s at
    # sf0.1); the shuffle moves only (key, x) — two narrow columns
    npart = df.sparkSession.sparkContext.defaultParallelism
    exploded = (base.select(F.col(key_col), x.alias("__x"))
                .repartition(npart, F.col(key_col))
                .select("__x", F.posexplode(weights(F.col(key_col)))
                        .alias("__b", "__w")))
    per_b = (exploded.groupBy("__b")
             .agg(F.count(F.lit(1)).alias("__n"),
                  F.sum(term(F.col("__x"))).cast("double")
                  .alias("__s"),
                  F.sum(term(F.col("__w") * F.col("__x")))
                  .cast("double").alias("__sx"),
                  F.sum("__w").cast("long").alias("__nw"))
             .where(F.col("__nw") > 0)
             .withColumn("__m", F.col("__sx")
                         / F.col("__nw").cast("double")))
    wb = Window.orderBy("__m")
    wa = Window.partitionBy()
    ranked = (per_b
              .withColumn("__r", F.row_number().over(wb))
              .withColumn("__bu", F.count(F.lit(1)).over(wa)))
    lo_r = F.ceil(F.lit(alpha / 2.0) * F.col("__bu"))
    hi_r = F.ceil(F.lit(1.0 - alpha / 2.0) * F.col("__bu"))
    return (ranked.agg(
        F.max("__n").alias("n"),
        F.round(F.max(F.col("__s") / F.col("__n").cast("double")),
                digits).alias("mean"),
        F.round(F.max(F.when(F.col("__r") == lo_r, F.col("__m"))),
                digits).alias("lo"),
        F.round(F.max(F.when(F.col("__r") == hi_r, F.col("__m"))),
                digits).alias("hi"),
        F.max("__bu").cast("long").alias("b_used")))


@register_op("bootstrap_ci", "df")
def _bootstrap_ci_op(df, *args, **kw):
    return bootstrap_ci(df, *args, **kw)


def kruskal_wallis(df: DataFrame, group_col: str, value_col: str,
                   groups: list, n_ranges: int | None = None,
                   digits: int = 6) -> DataFrame:
    """One row (n, dof, h, h_corrected) — the Kruskal-Wallis H test:
    the k-group extension of mann_whitney_u (does at least one group's
    distribution stochastically dominate?), with midrank ties and the
    standard tie correction:

        H = 12/(n(n+1)) · Σ R_i²/n_i − 3(n+1)
        H_corr = H / (1 − Σ(t³−t)/(n³−n))

    p-values are a χ²(k−1) critical-value lookup (no CDF in either
    engine) — gate on H_corr.

    Plan: the mann_whitney machinery generalized — ONE value-grouped
    hash agg collapses the input to the distinct-value table with
    per-group conditional counts; count-below comes from the
    range-partitioned two-phase prefix sum (2 scalars per range, no
    single-partition sort); each group's DOUBLED rank sum
    2R_i = Σ c_i·(2·below + t + 1) stays an exact integer in
    decimal. H assembles on the 1-row result from exact-integer
    casts; |H| is χ²-scale so 6 dp sits inside the 9-digit envelope
    (sig-safe released)."""
    from pyspark.sql import Window
    from ..functions.rounding import round_sig_safe
    spark = df.sparkSession
    if n_ranges is None:
        n_ranges = spark.sparkContext.defaultParallelism
    groups = list(groups)
    k = len(groups)
    g = F.col(group_col)
    x = F.col(value_col).cast("double")
    base = df.where(x.isNotNull() & g.isin(groups))
    aggs = [F.count(F.lit(1)).alias("__cnt")] + [
        F.sum((g == F.lit(gv)).cast("long")).alias(f"__c{i}")
        for i, gv in enumerate(groups)]
    vt = base.groupBy(x.alias("__v")).agg(*aggs)
    # r12: in-plan offsets (see ranksum_agg) — no eager checkpoint,
    # no per-range collect, one Spark action.
    from .distkit import _ranged, range_offsets
    ranged = _ranged(vt, [F.col("__v")], n_ranges)
    w_in = (Window.partitionBy("__rid").orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, 0))
    local = ranged.withColumn("__lc", F.sum("__cnt").over(w_in))
    off_df = (range_offsets(ranged, {"__cnt": "long"})
              .withColumnRenamed("__off___cnt", "__off"))
    d0 = "decimal(38,0)"
    cb = (F.col("__lc") + F.col("__off") - F.col("__cnt")).cast(d0)
    cnt = F.col("__cnt").cast(d0)
    two = F.lit(2).cast(d0)
    one_ = F.lit(1).cast(d0)
    sums = [F.sum(F.col(f"__c{i}").cast(d0)
                  * (two * cb + cnt + one_)).alias(f"__r2_{i}")
            for i in range(k)]
    sums += [F.sum(F.col(f"__c{i}")).alias(f"__n{i}")
             for i in range(k)]
    sums += [F.sum("__cnt").alias("__nl"),
             F.sum(cnt * cnt * cnt - cnt).alias("__ties")]
    one = local.join(F.broadcast(off_df), "__rid").agg(*sums)
    nd = F.col("__nl").cast("double")
    # Σ R_i²/n_i with R_i = r2_i/2  →  H = 3/(n(n+1))·Σ r2_i²/n_i
    #                                      − 3(n+1)
    t = None
    for i in range(k):
        r2d = F.col(f"__r2_{i}").cast("double")
        ti = F.when(F.col(f"__n{i}") > 0,
                    (r2d * r2d) / F.col(f"__n{i}").cast("double")) \
            .otherwise(F.lit(0.0))
        t = ti if t is None else t + ti
    h = 3.0 / (nd * (nd + 1.0)) * t - 3.0 * (nd + 1.0)
    c_tie = 1.0 - F.col("__ties").cast("double") \
        / (nd * nd * nd - nd)
    # degenerate-input contract matches anova_oneway: an EMPTY listed
    # group NULLs the statistic outright (its term would contribute 0
    # while dof stayed k−1, silently overstating degrees of freedom
    # for the caller's χ²(k−1) critical-value lookup)
    nonempty = None
    for i in range(k):
        gi = F.col(f"__n{i}") > 0
        nonempty = gi if nonempty is None else nonempty & gi
    ok = (F.col("__nl") >= 2) & (nd * nd * nd - nd > 0) & nonempty
    raw = one.select(
        F.col("__nl").cast("long").alias("n"),
        F.lit(k - 1).cast("long").alias("dof"),
        F.when(ok, h).alias("__h_raw"),
        F.when(ok & (c_tie > 0), h / c_tie).alias("__hc_raw"))
    return raw.select(
        "n", "dof",
        round_sig_safe(F.col("__h_raw"), digits).alias("h"),
        round_sig_safe(F.col("__hc_raw"), digits)
        .alias("h_corrected"))


@register_op("kruskal_wallis", "df")
def _kw_op(df, *args, **kw):
    return kruskal_wallis(df, *args, **kw)


def anova_oneway(df: DataFrame, group_col: str, value_col: str,
                 groups: list, digits: int = 6) -> DataFrame:
    """One row (n, k, dof_between, dof_within, f_stat, eta_sq) — the
    one-way fixed-effects ANOVA F test across k named groups,
    completing the test grid (welch k=2 parametric, this k≥3
    parametric; mann_whitney k=2 rank, kruskal_wallis k≥3 rank):

        SSB = Σ_i S_i²/n_i − S²/n,   SSW = Q − Σ_i S_i²/n_i
        F = (SSB/(k−1)) / (SSW/(n−k)),   η² = SSB/(SSB+SSW)

    p-values are an F(k−1, n−k) critical-value lookup; η² is the
    effect size. NULL values drop (welch convention); degenerate
    inputs (n ≤ k, SSW = 0, or an empty group) yield NULL F.

    Plan: ONE conditional-aggregation scan — every group's n/Σx/Σx²
    lands in the same map-side-combinable hash agg (k·3 cells cross
    the wire, no join, no pivot shuffle). Determinism: sums are
    decimal-exact; Σ S_i²/n_i assembles as k single divisions of
    bit-identical doubles added in the fixed `groups` order (the
    oracle mirrors the order); F and η² magnitudes keep 6 dp inside
    the 9-digit envelope (sig-safe released)."""
    from ..functions.rounding import round_sig_safe
    groups = list(groups)
    k = len(groups)
    g = F.col(group_col)
    x = F.col(value_col).cast("double")
    base = df.where(x.isNotNull() & g.isin(groups))
    aggs = [F.count(F.lit(1)).alias("__n"),
            F.sum(_term(x)).cast("double").alias("__s"),
            F.sum(_term(x * x)).cast("double").alias("__q")]
    for i, gv in enumerate(groups):
        cond = g == F.lit(gv)
        aggs += [F.sum(cond.cast("long")).alias(f"__n{i}"),
                 F.sum(F.when(cond, _term(x))).cast("double")
                 .alias(f"__s{i}")]
    one = base.agg(*aggs)
    nd = F.col("__n").cast("double")
    sb = None  # Σ S_i²/n_i, fixed-order double adds
    nonempty = F.lit(True)
    for i in range(k):
        si = F.col(f"__s{i}")
        ti = (si * si) / F.col(f"__n{i}").cast("double")
        sb = ti if sb is None else sb + ti
        nonempty = nonempty & (F.col(f"__n{i}") > 0)
    ssb = sb - (F.col("__s") * F.col("__s")) / nd
    ssw = F.col("__q") - sb
    ok = nonempty & (F.col("__n") > k) & (ssw > 0)
    f_raw = F.when(ok, (ssb / F.lit(float(k - 1)))
                   / (ssw / (nd - F.lit(float(k)))))
    eta_raw = F.when(ok, ssb / (ssb + ssw))
    raw = one.select(
        F.col("__n").cast("long").alias("n"),
        F.lit(k).cast("long").alias("k"),
        F.lit(k - 1).cast("long").alias("dof_between"),
        (F.col("__n") - k).cast("long").alias("dof_within"),
        f_raw.alias("__f_raw"), eta_raw.alias("__eta_raw"))
    return raw.select(
        "n", "k", "dof_between", "dof_within",
        round_sig_safe(F.col("__f_raw"), digits).alias("f_stat"),
        round_sig_safe(F.col("__eta_raw"), digits).alias("eta_sq"))


@register_op("anova_oneway", "df")
def _anova_op(df, *args, **kw):
    return anova_oneway(df, *args, **kw)


def benjamini_hochberg(df: DataFrame, p_col: str, id_col: str,
                       by=None, alpha: float = 0.05) -> DataFrame:
    """(by..., id, p, rank, m, p_adj, reject) — Benjamini-Hochberg
    FDR control across a grid of hypothesis tests: rank the m
    p-values ascending, reject every test at rank i with
    p_(i) <= (i/m)·alpha, and report the BH-adjusted p-value
    p_adj(i) = min_{j>=i} (p_(j)·m/j) capped at 1 (the standard
    step-up adjustment — monotone, so `p_adj <= alpha` reproduces the
    reject set). The multiple-testing companion to the per-test grid
    (welch/mann-whitney/…): at pipeline scale EVERY experiment sweep
    is a multiple-testing problem.

    Reference parity: the reference has no built-in test battery
    (experiments run through user zefops, ITF); this op exists for
    the training-data-pipeline surface.

    Plan: ONE key shuffle; the rank and the reverse running min ride
    the SAME window partitioning (two window specs, one Exchange).
    Determinism: ties in p order by ``id_col`` (caller-supplied
    unique id — the deterministic tiebreak); p·m/i is two IEEE-exact
    ops on doubles, min is selection — every output is bit-identical
    cross-engine with NO rounding needed."""
    from pyspark.sql import Window
    keys = ([] if by is None
            else [by] if isinstance(by, str) else list(by))
    part = keys if keys else [F.lit(1)]
    p = F.col(p_col).cast("double")
    base = df.where(p.isNotNull()).select(
        *keys, F.col(id_col).alias("id"), p.alias("p"))
    w = Window.partitionBy(*part).orderBy("p", "id")
    wm = Window.partitionBy(*part)
    ranked = (base
              .withColumn("rank", F.row_number().over(w))
              .withColumn("m", F.count(F.lit(1)).over(wm)))
    raw_adj = (F.col("p") * F.col("m").cast("double")
               / F.col("rank").cast("double"))
    wrev = (Window.partitionBy(*part)
            .orderBy(F.col("rank").desc())
            .rowsBetween(Window.unboundedPreceding, 0))
    adj = F.least(F.min(raw_adj).over(wrev), F.lit(1.0))
    thresh = (F.col("rank").cast("double") * F.lit(float(alpha))
              / F.col("m").cast("double"))
    # step-up: reject all ranks <= the LARGEST i with p_(i) <= i/m·a,
    # equivalently p_adj <= alpha (monotone adjustment)
    out = ranked.withColumn("p_adj", adj).withColumn(
        "reject", F.col("p_adj") <= F.lit(float(alpha)))
    return out.select(*keys, "id", "p", "rank", "m", "p_adj",
                      "reject")


@register_op("benjamini_hochberg", "df")
def _bh_op(df, *args, **kw):
    return benjamini_hochberg(df, *args, **kw)


def levene_test(df: DataFrame, group_col: str, value_col: str,
                groups: list, center: str = "mean",
                digits: int = 6) -> DataFrame:
    """One row (n, k, dof_between, dof_within, f_stat, eta_sq) —
    Levene's test of VARIANCE homogeneity across k groups: one-way
    ANOVA on the center-absolute deviations z_ij = |x_ij − c_i|,
    with ``center`` picking the classic MEAN center (Levene 1960)
    or the robust MEDIAN center (Brown-Forsythe 1974 — exposed as
    `brown_forsythe`). The gatekeeper for anova_oneway's
    equal-variance assumption: a significant result says route to
    welch/kruskal instead.

    Plan, mean center: per-group mean via ONE group-keyed window
    (no ordering — the partition-only frame), deviations feed
    anova_oneway's single conditional-agg scan; the group means are
    decimal-exact Σ ÷ n. Median center: per-group EXACT median by
    the integer-rank PERCENTILE_DISC definition (value at row
    ceil(n/2) — engine-exact, the mad_outliers discipline) via ONE
    group-ordered window shuffle. Both: two shuffles total, keyed
    by the (small) group column."""
    from pyspark.sql import Window
    g = F.col(group_col)
    x = F.col(value_col).cast("double")
    base = df.where(x.isNotNull() & g.isin(list(groups))).select(
        g.alias("__g"), x.alias("__x"))
    wn = Window.partitionBy("__g")
    if center == "median":
        w = Window.partitionBy("__g").orderBy("__x")
        med = (base.withColumn("__rn", F.row_number().over(w))
               .withColumn("__n", F.count(F.lit(1)).over(wn))
               .withColumn("__c", F.max(F.when(
                   F.col("__rn") == F.ceil(F.col("__n") / 2),
                   F.col("__x"))).over(wn)))
    elif center == "mean":
        med = base.withColumn(
            "__c",
            (F.sum(_term(F.col("__x"))).over(wn).cast("double")
             / F.count(F.lit(1)).over(wn).cast("double")))
    else:
        raise ValueError(
            f"levene_test: center must be 'mean' or 'median', "
            f"got {center!r}")
    dev = med.select("__g", F.abs(F.col("__x") - F.col("__c"))
                     .alias("__z"))
    return anova_oneway(dev, "__g", "__z", list(groups),
                        digits=digits)


def brown_forsythe(df: DataFrame, group_col: str, value_col: str,
                   groups: list, digits: int = 6) -> DataFrame:
    """Levene's test with the MEDIAN center (Brown-Forsythe 1974) —
    see levene_test; this is the robust variant, kept as its own
    name (r04-r09 registry surface)."""
    return levene_test(df, group_col, value_col, groups,
                       center="median", digits=digits)


@register_op("levene_test", "df")
def _levene_op(df, *args, **kw):
    return levene_test(df, *args, **kw)


@register_op("brown_forsythe", "df")
def _bf_op(df, *args, **kw):
    return brown_forsythe(df, *args, **kw)


def _fisher_tail_p(a: int, b_: int, c_: int, d: int,
                   band_limit: bool = True) -> float:
    """Driver-side two-sided Fisher p for the 2×2 table
    (a, b_, c_, d): the hypergeometric tail sum with each term
    rounded HALF-UP to 12 dp (exact Decimal accumulation — the
    DuckDB ROUND(EXP(lp), 12) discipline, r10 ADVICE).

    ``band_limit=True`` (the r13 default) folds only the contiguous
    window of k whose term can quantize to a non-zero Decimal:
    a term whose float lp < log(4.9e-13) has
    math.exp(lp) <= 4.9e-13·(1+eps) < 5e-13, which quantizes to
    EXACTLY Decimal 0 — skipping it is bit-identical to adding it.
    The pmf is log-concave in k (pmf(k+1)/pmf(k) strictly
    decreasing), so {k: lp >= ZTH} is one window around the mode;
    its edges are found by binary search (O(log support) lgamma
    probes) and the fold is O(band) ≈ a few thousand terms at ANY
    margin size. Float noise in lgamma (~1e-7 in lp) is dwarfed by
    the log(5.0/4.9) ≈ 0.02 slack below the 5e-13 cutoff, so any
    edge term the search excludes would also have contributed 0.
    ``band_limit=False`` runs the former O(support) full-range fold
    (kept for the equivalence test).

    Degenerate tables (any zero margin, including n == 0) have a
    single-table support: lo == hi, logpmf == 0, p == 1.0 — the
    scipy convention and what the oracle's one-term k-range emits.
    All lgamma arguments are >= 1 for every k in [lo, hi] even at
    zero margins, so the fold needs no special-case guard."""
    import math
    from decimal import Decimal, ROUND_HALF_UP
    n, r1, r2, c1 = a + b_ + c_ + d, a + b_, c_ + d, a + c_
    lo, hi = max(0, c1 - r2), min(r1, c1)
    lg = math.lgamma

    def logpmf(k: int) -> float:
        return (lg(r1 + 1) - lg(k + 1) - lg(r1 - k + 1)
                + lg(r2 + 1) - lg(c1 - k + 1)
                - lg(r2 - c1 + k + 1)
                + lg(c1 + 1) + lg(n - c1 + 1) - lg(n + 1))

    cut = logpmf(a) + 1e-7  # scipy's relative-gate analogue
    if band_limit:
        ZTH = math.log(4.9e-13)
        km = (r1 + 1) * (c1 + 1) // (n + 2)
        km = min(max(km, lo), hi)
        # insurance nudge to a local (= global, by log-concavity)
        # max; the closed-form mode is within 1, so this is O(1)
        while km + 1 <= hi and logpmf(km + 1) > logpmf(km):
            km += 1
        while km - 1 >= lo and logpmf(km - 1) > logpmf(km):
            km -= 1
        if logpmf(km) < ZTH:
            kl, kr = 1, 0        # every term quantizes to 0
        else:
            bl, bh = lo, km      # first k in [lo, km] with lp>=ZTH
            while bl < bh:
                mid = (bl + bh) // 2
                if logpmf(mid) >= ZTH:
                    bh = mid
                else:
                    bl = mid + 1
            kl = bl
            bl, bh = km, hi      # last k in [km, hi] with lp>=ZTH
            while bl < bh:
                mid = (bl + bh + 1) // 2
                if logpmf(mid) >= ZTH:
                    bl = mid
                else:
                    bh = mid - 1
            kr = bl
    else:
        kl, kr = lo, hi
    acc = Decimal(0)
    # each term rounds HALF-UP (away from zero — terms are
    # positive) at 12 dp on the exact binary double, exactly
    # DuckDB's ROUND(EXP(lp), 12); Python's round() is
    # ties-to-even and diverged on boundary terms (r10 ADVICE)
    q12 = Decimal("1e-12")
    for k in range(kl, kr + 1):
        lp = logpmf(k)
        if lp <= cut:
            acc += Decimal(math.exp(lp)).quantize(q12, ROUND_HALF_UP)
    return min(float(acc), 1.0)


def fisher_exact(df: DataFrame, row_cond, col_cond,
                 max_support: int = None,
                 digits: int = 6) -> DataFrame:
    """One row (n, n11, n12, n21, n22, odds_ratio, p_two_sided) —
    Fisher's EXACT test of independence for the 2×2 table defined
    by two boolean Columns (rows with a NULL on either side drop):

        p = Σ_{tables T as extreme} P_hypergeom(T)
        P(k) = C(r1,k)·C(r2,c1−k)/C(n,c1)

    two-sided by the standard pmf rule (sum every table whose
    point probability ≤ the observed table's, with a 1+1e-7
    tolerance — scipy's convention). The small-count companion to
    chi2_contingency: exact at any cell size, no ≥5-expected rule.

    Plan: ONE conditional-agg scan reduces the data to FOUR
    integers (map-side combinable); the hypergeometric tail is then
    a BAND-LIMITED driver-side fold (bounded sufficient statistics
    on the driver, never row data). Every term rounds half-up to
    12 dp before the exact Decimal sum, so a term whose double is
    < 5e-13 contributes EXACTLY zero — and the pmf is log-concave
    (unimodal in k), so the non-zero band is one contiguous window
    around the mode. We binary-search its edges (O(log support)
    lgamma probes) and fold only the band (O(band) ≈ a few
    thousand terms at ANY margin size), instead of the former
    O(support) full-range fold. Term values, the lp<=cut gate and
    the quantized sum are bit-identical to the full fold by
    construction (threshold log(4.9e-13) leaves a 2% slack below
    5e-13, far wider than lgamma float noise). ``max_support``
    (default None = unbounded, the fold no longer scales with the
    margins) still raises when set explicitly and exceeded.
    Determinism: each pmf term rounds half-up to 12 dp before
    an exact Decimal sum (the nat-sum discipline), p releases
    sig-safe; the odds ratio is a single division of exact-integer
    products."""
    from ..functions.rounding import round_sig_safe
    r = (F.col(row_cond) if isinstance(row_cond, str)
         else row_cond).cast("boolean")
    c = (F.col(col_cond) if isinstance(col_cond, str)
         else col_cond).cast("boolean")
    agg = (df.where(r.isNotNull() & c.isNotNull())
           .agg(F.sum((r & c).cast("long")).alias("n11"),
                F.sum((r & ~c).cast("long")).alias("n12"),
                F.sum((~r & c).cast("long")).alias("n21"),
                F.sum((~r & ~c).cast("long")).alias("n22")))
    row = agg.collect()[0]
    a, b_, c_, d = (int(row["n11"] or 0), int(row["n12"] or 0),
                    int(row["n21"] or 0), int(row["n22"] or 0))
    n, r1, r2, c1 = a + b_ + c_ + d, a + b_, c_ + d, a + c_
    lo, hi = max(0, c1 - r2), min(r1, c1)
    if max_support is not None and hi - lo > max_support:
        raise ValueError(
            "fisher_exact: the hypergeometric support has "
            f"{hi - lo + 1} tables (> max_support={max_support}) — "
            "at this n use chi2_contingency; exactness buys "
            "nothing. Raise max_support to proceed deliberately.")
    p_val = _fisher_tail_p(a, b_, c_, d)
    odds = (a * d) / (b_ * c_) if b_ * c_ > 0 else None
    spark = df.sparkSession
    out = spark.createDataFrame(
        [(n, a, b_, c_, d, odds, p_val)],
        "n long, n11 long, n12 long, n21 long, n22 long, "
        "odds_ratio double, p_two_sided double")
    return out.select(
        "n", "n11", "n12", "n21", "n22",
        round_sig_safe(F.col("odds_ratio"), digits)
        .alias("odds_ratio"),
        round_sig_safe(F.col("p_two_sided"), digits)
        .alias("p_two_sided"))


@register_op("fisher_exact", "df")
def _fisher_op(df, *args, **kw):
    return fisher_exact(df, *args, **kw)


def runs_test(df: DataFrame, order_col: str, value_col: str,
              by=None, digits: int = 6) -> DataFrame:
    """(by..., n1, n2, runs, z) — the Wald-Wolfowitz runs test for
    randomness of a sequence: values above/below the key's EXACT
    median (true median: mean of the two middle order statistics
    for even n, so a binary-valued series still splits in half;
    values equal to the median drop, the standard convention) are
    signed, runs of equal sign are counted in ``order_col`` order,
    and

        E[R] = 1 + 2·n1·n2/n,
        Var[R] = 2·n1·n2·(2·n1·n2 − n) / (n²·(n−1)),  n = n1+n2
        z = (R − E[R]) / √Var[R]

    Too few runs = clumped/trending series, too many = oscillating —
    the cheapest "is this series i.i.d.?" gate before ACF/changepoint.

    Plan: one group-ordered window shuffle computes the median rank
    AND the sign-change lag (same partitioning, one Exchange); the
    final per-key agg is exact-integer counts, so E/Var/z assemble
    from bit-identical integer-derived doubles — z releases sig-safe
    (single √ + division)."""
    from pyspark.sql import Window
    from ..functions.rounding import round_sig_safe
    keys = ([] if by is None
            else [by] if isinstance(by, str) else list(by))
    part = keys if keys else [F.lit(1)]
    x = F.col(value_col).cast("double")
    base = df.where(x.isNotNull()).select(
        *keys, F.col(order_col).alias("__t"), x.alias("__x"))
    wv = Window.partitionBy(*part).orderBy("__x", "__t")
    wn = Window.partitionBy(*part)
    half = (F.col("__n") + 1) / 2
    med = (base.withColumn("__rn", F.row_number().over(wv))
           .withColumn("__n", F.count(F.lit(1)).over(wn))
           .withColumn("__lo", F.max(F.when(
               F.col("__rn") == F.floor(half),
               F.col("__x"))).over(wn))
           .withColumn("__hi", F.max(F.when(
               F.col("__rn") == F.ceil(half),
               F.col("__x"))).over(wn))
           .withColumn("__med",
                       (F.col("__lo") + F.col("__hi")) / 2.0))
    signed = (med.where(F.col("__x") != F.col("__med"))
              .withColumn("__s", (F.col("__x") > F.col("__med"))
                          .cast("int")))
    wt = Window.partitionBy(*part).orderBy("__t", "__x")
    runs_col = F.when(
        F.lag("__s").over(wt).isNull()
        | (F.col("__s") != F.lag("__s").over(wt)), 1).otherwise(0)
    agg = (signed.withColumn("__new_run", runs_col)
           .groupBy(*keys)
           .agg(F.sum("__s").cast("long").alias("n1"),
                F.sum(F.lit(1) - F.col("__s")).cast("long")
                .alias("n2"),
                F.sum("__new_run").cast("long").alias("runs")))
    # STEPWISE projections with attribute references (the
    # group_moments codegen discipline, wrangling.py): inlining
    # er/vr into the aggregate's result expressions re-expands the
    # n1·n2 products ~10× and lands the whole tree in
    # hashAgg_doAggregateWithKeysOutput, tripping janino's method
    # limit → silent interpreted fallback. Each step below codegens
    # its value into a local exactly once.
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    d1 = agg.select(*keys, "n1", "n2", "runs",
                    (n1 * n2).alias("__nn"),
                    (n1 + n2).alias("__n"))
    nn, n = F.col("__nn"), F.col("__n")
    d2 = d1.select(*keys, "n1", "n2", "runs", "__nn", "__n",
                   (1.0 + 2.0 * nn / n).alias("__er"),
                   ((2.0 * nn * (2.0 * nn - n))
                    / (n * n * (n - 1.0))).alias("__vr"))
    vr = F.col("__vr")
    ok = (F.col("n1") > 0) & (F.col("n2") > 0) & (vr > 0)
    z = F.when(ok, (F.col("runs").cast("double") - F.col("__er"))
               / F.sqrt(vr))
    return d2.select(*keys, "n1", "n2", "runs",
                     round_sig_safe(z, digits).alias("z"))


@register_op("runs_test", "df")
def _runs_op(df, *args, **kw):
    return runs_test(df, *args, **kw)


def ks_test(df: DataFrame, group_col: str, value_col: str,
            group_a, group_b, by=None, digits: int = 6) -> DataFrame:
    """(by..., n_a, n_b, d_stat, ks_stat) — the two-sample
    Kolmogorov-Smirnov test between the ``group_a`` and ``group_b``
    samples of ``value_col``:

        D = sup_x |F_a(x) − F_b(x)|,
        ks = √(n_a·n_b/(n_a+n_b)) · D   (the asymptotic statistic)

    The distribution-shape companion to mann_whitney (which only
    sees location): D reacts to ANY difference — spread, tails,
    modality. Rows outside the two groups are ignored; a key with an
    empty side emits NULL statistics (no comparison exists).

    Cross-engine exactness: D is computed as max over the pooled
    sample of |i_a·n_b − i_b·n_a| (ecdf numerators cross-multiplied
    — EXACT INTEGERS, promoted to DECIMAL(38,0) so the product can
    never overflow at any corpus size) divided once by n_a·n_b; ties
    are handled by RANGE frames (every row with the same value sees
    the ecdf AFTER all its ties — the mathematically correct ecdf
    evaluation, identical in any engine). Only the final √/division
    release needs sig-safe rounding.

    Plan: ONE key-ordered window shuffle (two cumulative RANGE sums
    + the per-key totals share the same partitioning), one final agg.
    No pair joins, no sort beyond the window's."""
    from pyspark.sql import Window
    from ..functions.rounding import round_sig_safe
    keys = ([] if by is None
            else [by] if isinstance(by, str) else list(by))
    part = keys if keys else [F.lit(1)]
    x = F.col(value_col).cast("double")
    g = F.col(group_col)
    base = (df.where(x.isNotNull() & g.isin([group_a, group_b]))
            .select(*keys, (g == F.lit(group_a)).cast("long")
                    .alias("__ia"), x.alias("__x")))
    wr = (Window.partitionBy(*part).orderBy("__x")
          .rangeBetween(Window.unboundedPreceding, 0))
    wn = Window.partitionBy(*part)
    cum = (base
           .withColumn("__ca", F.sum("__ia").over(wr))
           .withColumn("__cb", F.sum(F.lit(1) - F.col("__ia"))
                       .over(wr))
           .withColumn("__na", F.sum("__ia").over(wn))
           .withColumn("__nb", F.sum(F.lit(1) - F.col("__ia"))
                       .over(wn)))
    dec0 = "decimal(38,0)"
    diff = F.abs(F.col("__ca").cast(dec0) * F.col("__nb").cast(dec0)
                 - F.col("__cb").cast(dec0)
                 * F.col("__na").cast(dec0))
    agg = (cum.groupBy(*keys)
           .agg(F.max("__na").alias("n_a"),
                F.max("__nb").alias("n_b"),
                F.max(diff).alias("__dnum")))
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    d1 = agg.select(*keys, "n_a", "n_b", "__dnum",
                    (na * nb).alias("__nn"), (na + nb).alias("__ns"))
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    d = F.when(ok, F.col("__dnum").cast("double") / F.col("__nn"))
    d2 = d1.withColumn("__d", d)
    ks = F.when(ok, F.sqrt(F.col("__nn") / F.col("__ns"))
                * F.col("__d"))
    return d2.select(*keys, "n_a", "n_b",
                     round_sig_safe(F.col("__d"), digits)
                     .alias("d_stat"),
                     round_sig_safe(ks, digits).alias("ks_stat"))


@register_op("ks_test", "df")
def _ks_op(df, *args, **kw):
    return ks_test(df, *args, **kw)


def wilcoxon_signed_rank(df: DataFrame, value_a: str, value_b: str,
                         n_ranges: int | None = None,
                         digits: int = 6) -> DataFrame:
    """One row (n, w_plus, w_minus, z) — the Wilcoxon SIGNED-RANK
    test for PAIRED samples (each row is one subject carrying both
    measurements): d = a − b, zero differences drop (the standard
    Wilcoxon reduction), |d| is midranked, and

        W+ = Σ ranks of positive d,   W− = n(n+1)/2 − W+
        z  = (W+ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(t³−t)/48)

    with the tie-corrected normal approximation. The paired
    companion to mann_whitney_u (independent samples): use it for
    before/after or promised/actual comparisons where each row pairs
    its own control (reference parity: the sort+enumerate rank
    assembly of python/zef/ops — ITF zefops — hand-rolls this).

    Plan: the |d| ranking rides the SAME shared ranksum_agg engine
    as mann_whitney_u / binary_auc — one value-grouped hash agg to
    the distinct-|d| table, range-partitioned two-phase prefix sum,
    exact ×2-scaled integer rank sums. Nothing new shuffles."""
    from ..functions.rounding import round_sig_safe
    a = F.col(value_a).cast("double")
    b = F.col(value_b).cast("double")
    d = a - b
    base = (df.where(a.isNotNull() & b.isNotNull() & (d != 0))
            .select(d.alias("__d"), F.abs(d).alias("__absd")))
    agg = ranksum_agg(base, "__absd", F.col("__d") > 0, n_ranges)
    n = F.col("__nl").cast("double")
    wp = F.col("__r2").cast("double") / F.lit(2.0)
    wm = n * (n + 1) / 2 - wp
    var = (n * (n + 1) * (2 * n + 1) / 24
           - F.col("__ties").cast("double") / 48)
    ok = (F.col("__nl") > 0) & (var > 0)
    z = F.when(ok, (wp - n * (n + 1) / 4) / F.sqrt(var))
    return agg.select(
        # all diffs zero (or empty input) -> the rank agg sums are
        # NULL; report n=0 with NULL statistics
        F.coalesce(F.col("__nl").cast("long"), F.lit(0).cast("long"))
        .alias("n"),
        F.round(wp, digits).alias("w_plus"),
        F.round(wm, digits).alias("w_minus"),
        round_sig_safe(z, digits).alias("z"))


@register_op("wilcoxon_signed_rank", "df")
def _wilcoxon_op(df, *args, **kw):
    return wilcoxon_signed_rank(df, *args, **kw)


def cuped_adjust(df: DataFrame, group_col: str, metric_col: str,
                 covariate_col: str, group_a, group_b,
                 digits: int = 6) -> DataFrame:
    """One row (n_a, n_b, theta, mean_a, mean_b, mean_a_adj,
    mean_b_adj, diff_adj, var_reduction) — CUPED (Controlled
    experiments Using Pre-Experiment Data, Deng et al. WSDM'13):
    the industry-standard variance-reduction adjustment

        θ     = cov(x, y) / var(x)        (pooled, both groups)
        ŷ_g   = ȳ_g − θ·(x̄_g − x̄)
        var_reduction = ρ²(x, y)          (fraction of metric
                                           variance removed)

    where y is the experiment metric and x a pre-experiment
    covariate independent of assignment. The same experiment decides
    with ~1/(1−ρ²) fewer subjects — at pipeline scale this is the
    difference between a 2-week and a 5-week test.

    Plan: ONE conditional-aggregation scan (welch_ttest's shape) —
    per-group n/Σy/Σx plus pooled Σxy/Σx²/Σy² all in the same
    map-side-combinable hash agg; θ and the adjusted means assemble
    stepwise in double on the 1-row result (attribute-referencing
    projections, the group_moments codegen discipline). Degenerate
    inputs (var(x)=0 or an empty group) yield NULL adjusted
    columns."""
    from ..functions.rounding import round_sig_safe
    g = F.col(group_col)
    y = F.col(metric_col).cast("double")
    x = F.col(covariate_col).cast("double")
    in_a = g == F.lit(group_a)
    in_b = g == F.lit(group_b)
    # ROUND→DECIMAL term chains PRE-PROJECTED once (narrow select)
    # instead of inlined in the 9-column agg — nine inline decimal
    # trees in one hashAgg output method trip janino's 64KB limit
    # and silently fall back to interpreted aggregation (the
    # group_moments codegen discipline, r08 verdict #2)
    pre = (df.where((in_a | in_b) & x.isNotNull() & y.isNotNull())
           .select(in_a.alias("__ia"), in_b.alias("__ib"),
                   _term(y).alias("__ty"), _term(x).alias("__tx"),
                   _term(x * y).alias("__txy"),
                   _term(x * x).alias("__txx"),
                   _term(y * y).alias("__tyy")))
    ia, ib = F.col("__ia"), F.col("__ib")
    agg = (pre.agg(F.sum(ia.cast("long")).alias("__na"),
                   F.sum(ib.cast("long")).alias("__nb"),
                   F.sum(F.when(ia, F.col("__ty"))).cast("double")
                   .alias("__ya"),
                   F.sum(F.when(ib, F.col("__ty"))).cast("double")
                   .alias("__yb"),
                   F.sum(F.when(ia, F.col("__tx"))).cast("double")
                   .alias("__xa"),
                   F.sum(F.when(ib, F.col("__tx"))).cast("double")
                   .alias("__xb"),
                   F.sum("__txy").cast("double").alias("__sxy"),
                   F.sum("__txx").cast("double").alias("__sxx"),
                   F.sum("__tyy").cast("double").alias("__syy")))
    na = F.col("__na").cast("double")
    nb = F.col("__nb").cast("double")
    d1 = agg.select(
        "__na", "__nb", "__ya", "__yb", "__xa", "__xb",
        (na + nb).alias("__n"),
        (F.col("__ya") + F.col("__yb")).alias("__sy"),
        (F.col("__xa") + F.col("__xb")).alias("__sx"),
        "__sxy", "__sxx", "__syy")
    n = F.col("__n")
    d2 = d1.select(
        "__na", "__nb", "__ya", "__yb", "__xa", "__xb", "__n",
        "__sx",
        (F.col("__sxy") - F.col("__sx") * F.col("__sy") / n)
        .alias("__cxy"),
        (F.col("__sxx") - F.col("__sx") * F.col("__sx") / n)
        .alias("__cxx"),
        (F.col("__syy") - F.col("__sy") * F.col("__sy") / n)
        .alias("__cyy"))
    ok = (F.col("__na") > 0) & (F.col("__nb") > 0) \
        & (F.col("__cxx") > 0)
    d3 = d2.select(
        "__na", "__nb", "__n", "__sx",
        (F.col("__ya") / F.col("__na").cast("double")).alias("__ma"),
        (F.col("__yb") / F.col("__nb").cast("double")).alias("__mb"),
        (F.col("__xa") / F.col("__na").cast("double"))
        .alias("__mxa"),
        (F.col("__xb") / F.col("__nb").cast("double"))
        .alias("__mxb"),
        F.when(ok, F.col("__cxy") / F.col("__cxx")).alias("__theta"),
        F.when(ok & (F.col("__cyy") > 0),
               F.col("__cxy") * F.col("__cxy")
               / (F.col("__cxx") * F.col("__cyy")))
        .alias("__vr"))
    th = F.col("__theta")
    mx = F.col("__sx") / F.col("__n")
    d4 = d3.select(
        "__na", "__nb", "__ma", "__mb", "__theta", "__vr",
        (F.col("__ma") - th * (F.col("__mxa") - mx)).alias("__maa"),
        (F.col("__mb") - th * (F.col("__mxb") - mx)).alias("__mba"))
    return d4.select(
        F.col("__na").alias("n_a"), F.col("__nb").alias("n_b"),
        round_sig_safe(F.col("__theta"), digits).alias("theta"),
        # mean_a/mean_b: decimal-exact Σ ÷ int n (one correctly-
        # rounded ÷) — plain fixed-dp round, allowlisted in the
        # magnitude lint with the welch exactness proof; this also
        # keeps the release at 5 sig-safe CASE chains (7 chains in
        # one fused projection blow janino's 64KB method limit)
        F.round(F.col("__ma"), digits).alias("mean_a"),
        F.round(F.col("__mb"), digits).alias("mean_b"),
        round_sig_safe(F.col("__maa"), digits).alias("mean_a_adj"),
        round_sig_safe(F.col("__mba"), digits).alias("mean_b_adj"),
        round_sig_safe(F.col("__maa") - F.col("__mba"), digits)
        .alias("diff_adj"),
        round_sig_safe(F.col("__vr"), digits).alias("var_reduction"))


@register_op("cuped_adjust", "df")
def _cuped_op(df, *args, **kw):
    return cuped_adjust(df, *args, **kw)


def srm_check(df: DataFrame, group_col: str,
              expected: dict | None = None,
              digits: int = 6) -> DataFrame:
    """(group, n, expected_n, chi2_term) + a __total__ row carrying
    the summed chi-square statistic and dof — the Sample Ratio
    Mismatch check, the FIRST gate of every A/B readout: if the
    realized assignment counts differ from the design ratios more
    than chance allows (χ² = Σ(o−e)²/e over groups ~ χ²_{k−1}),
    the experiment is corrupted (bot filtering, redirect loss,
    logging skew) and no downstream statistic can be trusted.

    ``expected`` maps group value → design weight (normalized
    internally); None means equal split over the OBSERVED groups.
    With ``expected``, the join is FULL-OUTER against the design
    arms (r09 ADVICE): a design arm with ZERO observed rows still
    contributes its full (0−e)²/e term (the worst mismatch — an arm
    receiving no traffic — must INFLATE χ², not vanish), dof comes
    from the DESIGN group count, and an observed group missing from
    ``expected`` surfaces as a row with NULL expected_n and forces
    the __total__ χ² to NULL (the design doesn't cover the data —
    no statistic is honest).

    Plan: ONE count-by-group hash agg (vocab-sized), a 1-row
    broadcast total, row-local χ² terms — decimal-exact counts, the
    per-term (o−e)²/e released sig-safe."""
    from pyspark.sql import Window
    from ..functions.rounding import round_sig_safe
    counts = (df.where(F.col(group_col).isNotNull())
              .groupBy(F.col(group_col).cast("string").alias("grp"))
              .agg(F.count(F.lit(1)).alias("n")))
    if expected is not None:
        tot_w = float(sum(expected.values()))
        pairs = [(str(k), float(v) / tot_w) for k, v in
                 sorted(expected.items(), key=lambda kv: str(kv[0]))]
        wdf = counts.sparkSession.createDataFrame(
            pairs, "grp string, w double")
        counts = (counts.join(F.broadcast(wdf), "grp", "full_outer")
                  .withColumn("n", F.coalesce(F.col("n"),
                                              F.lit(0).cast("long"))))
        k_col = F.lit(len(pairs)).cast("long")
    else:
        kc = Window.partitionBy()
        counts = counts.withColumn(
            "w", F.lit(1.0) / F.count(F.lit(1)).over(kc))
        k_col = None
    wt = Window.partitionBy()
    st = counts.withColumn("__tot", F.sum("n").over(wt))
    st = st.withColumn(
        "__k", k_col if k_col is not None
        else F.count(F.lit(1)).over(wt).cast("long"))
    e = F.col("__tot").cast("double") * F.col("w")
    o = F.col("n").cast("double")
    term = F.when(e > 0, (o - e) * (o - e) / e)
    per = st.select(
        F.col("grp").alias("group"), "n",
        F.round(e, digits).alias("expected_n"),
        round_sig_safe(term, digits).alias("chi2_term"),
        "__k",
        # observed group outside the design: poisons the total
        F.col("w").isNull().cast("int").alias("__uncov"))
    total = (per.agg(
        F.sum("n").alias("n"),
        F.max("__k").alias("__k"),
        F.max("__uncov").alias("__uncov"),
        F.sum(F.round(F.col("chi2_term"), 12)
              .cast("decimal(38,12)")).cast("double").alias("__c"))
        .select(F.lit("__total__").alias("group"), "n",
                F.lit(None).cast("double").alias("expected_n"),
                round_sig_safe(
                    F.when(F.col("__uncov") == 0, F.col("__c")),
                    digits).alias("chi2_term"),
                "__k", "__uncov"))
    return (per.unionByName(total)
            .select("group", "n", "expected_n", "chi2_term",
                    (F.col("__k") - 1).cast("long").alias("dof")))


@register_op("srm_check", "df")
def _srm_op(df, *args, **kw):
    return srm_check(df, *args, **kw)


def tukey_hsd(df: DataFrame, group_col: str, value_col: str,
              groups: list, digits: int = 6) -> DataFrame:
    """(group_a, group_b, n_a, n_b, diff, q_stat, dof) — the
    Tukey-Kramer post-hoc grid after a significant anova_oneway:
    every pair of the k named groups with the studentized-range
    statistic

        q_ij = |ȳ_i − ȳ_j| / √( MSW/2 · (1/n_i + 1/n_j) )
        MSW  = SSW / (n − k)

    anova says SOMETHING differs; this says WHICH pairs, at the
    familywise error the studentized-range critical value controls
    (q_{k, n−k} lookup — no p-values, house rule). The Kramer form
    handles unequal group sizes.

    Plan: the SAME one-conditional-agg-scan as anova_oneway (k·3
    cells cross the wire), then the k(k−1)/2 pair rows unfold from
    the 1-row aggregate via an inline array (corr_matrix's shape) —
    no join, no second scan. An EMPTY named group contributes 0 to
    the between-sum and drops out of dof (r09 ADVICE: its NULL
    S_i²/n_i must not poison MSW for every valid pair) — its own
    pairs yield NULL diff/q; MSW/dof use n − k_nonempty. Zero
    within-variance yields NULL q."""
    from ..functions.rounding import round_sig_safe
    groups = list(groups)
    k = len(groups)
    g = F.col(group_col)
    x = F.col(value_col).cast("double")
    base = df.where(x.isNotNull() & g.isin(groups))
    aggs = [F.count(F.lit(1)).alias("__n"),
            F.sum(_term(x * x)).cast("double").alias("__q")]
    for i, gv in enumerate(groups):
        cond = g == F.lit(gv)
        aggs += [F.sum(cond.cast("long")).alias(f"__n{i}"),
                 F.sum(F.when(cond, _term(x))).cast("double")
                 .alias(f"__s{i}")]
    one = base.agg(*aggs)
    sb, knz = None, None
    for i in range(k):
        si = F.col(f"__s{i}")
        nz = F.col(f"__n{i}") > 0
        ti = F.when(nz, (si * si) / F.col(f"__n{i}").cast("double")) \
            .otherwise(F.lit(0.0))
        sb = ti if sb is None else sb + ti
        ci = nz.cast("double")
        knz = ci if knz is None else knz + ci
    nd = F.col("__n").cast("double")
    d1 = one.select("*", (F.col("__q") - sb).alias("__ssw"),
                    knz.alias("__knz"))
    d2 = d1.select("*", F.when(
        nd > F.col("__knz"),
        F.col("__ssw") / (nd - F.col("__knz"))).alias("__msw"))
    pairs = []
    for i in range(k):
        for j in range(i + 1, k):
            ni = F.col(f"__n{i}").cast("double")
            nj = F.col(f"__n{j}").cast("double")
            mi = F.col(f"__s{i}") / ni
            mj = F.col(f"__s{j}") / nj
            ok = (F.col(f"__n{i}") > 0) & (F.col(f"__n{j}") > 0) \
                & (F.col("__msw") > 0)
            se = F.sqrt(F.col("__msw") / 2.0 * (1.0 / ni + 1.0 / nj))
            pairs.append(F.struct(
                F.lit(str(groups[i])).alias("group_a"),
                F.lit(str(groups[j])).alias("group_b"),
                F.col(f"__n{i}").alias("n_a"),
                F.col(f"__n{j}").alias("n_b"),
                F.when(ok, mi - mj).alias("diff"),
                F.when(ok, F.abs(mi - mj) / se).alias("q_stat")))
    exploded = (d2.select((F.col("__n") - F.col("__knz"))
                          .cast("long").alias("dof"),
                          F.explode(F.array(*pairs)).alias("__e")))
    return exploded.select(
        "__e.group_a", "__e.group_b", "__e.n_a", "__e.n_b",
        round_sig_safe(F.col("__e.diff"), digits).alias("diff"),
        round_sig_safe(F.col("__e.q_stat"), digits).alias("q_stat"),
        "dof")


@register_op("tukey_hsd", "df")
def _tukey_op(df, *args, **kw):
    return tukey_hsd(df, *args, **kw)


def mcnemar_test(df: DataFrame, a_col, b_col,
                 digits: int = 6) -> DataFrame:
    """One row (n, b01, b10, chi2) — McNemar's test for PAIRED
    binary outcomes (each row one subject under both conditions):
    only the discordant cells carry information,

        χ² = (b01 − b10)² / (b01 + b10)   ~ χ²₁

    with b01 = a-only successes, b10 = b-only. The binary companion
    to wilcoxon_signed_rank (and Cochran's Q at k=2). No continuity
    correction (the exact-integer statistic both engines agree on
    bit-for-bit; CC variants differ by convention). Zero discordant
    pairs yield NULL χ².

    Plan: ONE conditional-agg scan; two longs cross the wire."""
    from ..functions.rounding import round_sig_safe
    a = (F.col(a_col) if isinstance(a_col, str) else a_col) \
        .cast("boolean")
    b = (F.col(b_col) if isinstance(b_col, str) else b_col) \
        .cast("boolean")
    agg = (df.where(a.isNotNull() & b.isNotNull())
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum((a & ~b).cast("long")).alias("b01"),
                F.sum((~a & b).cast("long")).alias("b10")))
    d = (F.col("b01") - F.col("b10")).cast("double")
    s = (F.col("b01") + F.col("b10")).cast("double")
    chi2 = F.when(s > 0, d * d / s)
    return agg.select("n", "b01", "b10",
                      round_sig_safe(chi2, digits).alias("chi2"))


@register_op("mcnemar_test", "df")
def _mcnemar_op(df, *args, **kw):
    return mcnemar_test(df, *args, **kw)


def cochrans_q(df: DataFrame, treatment_cols: list,
               digits: int = 6) -> DataFrame:
    """One row (n, k, q_stat, dof) — Cochran's Q for k PAIRED binary
    treatments (each row one subject, one boolean column per
    treatment):

        Q = k(k−1) · Σ_j (C_j − N/k)² / (k·ΣR_i − ΣR_i²)  ~ χ²_{k−1}

    with C_j the treatment totals, R_i the per-subject success
    counts, N = ΣR_i. The k-group extension of mcnemar_test (Q
    reduces to McNemar's χ² at k=2 — consistency-tested). Rows with
    any NULL treatment drop (complete-case, the paired convention).

    Determinism: every sum is an exact integer; the numerator
    expands to k·ΣC_j² − N² (integers in decimal(38,0)), so Q is one
    division of integer-derived doubles, sig-safe. Plan: ONE
    conditional-agg scan with a row-local R_i fold — k+2 cells cross
    the wire."""
    from ..functions.rounding import round_sig_safe
    cols = [F.col(c) if isinstance(c, str) else c
            for c in treatment_cols]
    k = len(cols)
    bs = [c.cast("boolean") for c in cols]
    ok = bs[0].isNotNull()
    for b in bs[1:]:
        ok = ok & b.isNotNull()
    ri = None
    for b in bs:
        t = b.cast("long")
        ri = t if ri is None else ri + t
    base = df.where(ok).select(
        *[b.cast("long").alias(f"__t{i}") for i, b in enumerate(bs)],
        ri.alias("__r"))
    d0 = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum(F.col("__r")).cast(d0).alias("__N"),
            F.sum(F.col("__r") * F.col("__r")).cast(d0)
            .alias("__R2")]
    aggs += [F.sum(F.col(f"__t{i}")).cast(d0).alias(f"__c{i}")
             for i in range(k)]
    one = base.agg(*aggs)
    c2 = None
    for i in range(k):
        ci = F.col(f"__c{i}")
        c2 = ci * ci if c2 is None else c2 + ci * ci
    kL = F.lit(k).cast(d0)
    num = (F.lit(k - 1).cast(d0)
           * (kL * c2 - F.col("__N") * F.col("__N")))
    den = kL * F.col("__N") - F.col("__R2")
    q = F.when(den > 0,
               num.cast("double") / den.cast("double"))
    return one.select(
        "n", F.lit(k).cast("long").alias("k"),
        round_sig_safe(q, digits).alias("q_stat"),
        F.lit(k - 1).cast("long").alias("dof"))


@register_op("cochrans_q", "df")
def _cochrans_q_op(df, *args, **kw):
    return cochrans_q(df, *args, **kw)


def friedman_test(df: DataFrame, block_col: str, treatment_col: str,
                  value_col: str, treatments: list,
                  digits: int = 6) -> DataFrame:
    """One row (n_blocks, k, chi2, chi2_corrected, dof) — the
    Friedman test for k treatments over matched blocks (the
    repeated-measures / blocked-design rank ANOVA):

        χ²_F = 12/(n·k(k+1)) · Σ_j R_j² − 3n(k+1)
        χ²_corrected = χ²_F / (1 − ΣT_b / (n·k(k²−1)))

    with R_j the per-treatment rank sums (values midranked WITHIN
    each block) and T_b = Σ(t³−t) over each block's tied values.
    Completes the rank-test grid: mann_whitney (2 indep), kruskal
    (k indep), wilcoxon_signed_rank (2 paired), THIS (k blocked).
    Only COMPLETE blocks enter (all k treatments present exactly
    once — the standard design); others drop.

    Determinism: within-block midranks assemble as exact ×2-scaled
    integers from a value-grouped RANGE window (ranksum_agg's tie
    algebra, block-local); rank sums and the tie term are exact
    integers in decimal(38,0); χ² is a fixed double expression,
    sig-safe. Plan: ONE block-keyed shuffle (both windows + the
    completeness filter share it) + a k-cell conditional agg."""
    from pyspark.sql import Window
    from ..functions.rounding import round_sig_safe
    treatments = list(treatments)
    k = len(treatments)
    g = F.col(treatment_col)
    x = F.col(value_col).cast("double")
    base = (df.where(x.isNotNull() & g.isin(treatments))
            .select(F.col(block_col).alias("__b"),
                    g.alias("__g"), x.alias("__v")))
    wb = Window.partitionBy("__b")
    # complete blocks only: k rows AND k distinct treatments
    base = (base
            .withColumn("__cnt", F.count(F.lit(1)).over(wb))
            .withColumn("__dst",
                        F.size(F.collect_set("__g").over(wb)))
            .where((F.col("__cnt") == k) & (F.col("__dst") == k))
            .drop("__cnt", "__dst"))
    # within-block midranks, x2-scaled exact integers: rank2 =
    # 2*(rows strictly below) + ties_at_value + 1
    wr = (Window.partitionBy("__b").orderBy("__v")
          .rangeBetween(Window.unboundedPreceding, 0))
    wv = Window.partitionBy("__b", "__v")
    d0 = "decimal(38,0)"
    ranked = (base
              .withColumn("__le", F.count(F.lit(1)).over(wr))
              .withColumn("__t", F.count(F.lit(1)).over(wv))
              .withColumn("__rank2",
                          (2 * (F.col("__le") - F.col("__t"))
                           + F.col("__t") + 1).cast(d0)))
    # tie term: Σ_blocks Σ_values (t³−t). Each row of a tied group
    # of size t contributes (t²−1); t rows sum to exactly t³−t.
    tie_term = (F.col("__t").cast(d0) * F.col("__t")
                - F.lit(1).cast(d0))
    aggs = [F.count_distinct(F.col("__b")).alias("__nb"),
            F.sum(tie_term).alias("__T")]
    aggs += [F.sum(F.when(F.col("__g") == F.lit(tv),
                          F.col("__rank2"))).alias(f"__s{i}")
             for i, tv in enumerate(treatments)]
    one = ranked.agg(*aggs)
    s2 = None  # Σ (2R_j)² exact
    for i in range(k):
        si = F.coalesce(F.col(f"__s{i}"), F.lit(0).cast(d0))
        s2 = si * si if s2 is None else s2 + si * si
    n = F.col("__nb").cast("double")
    kf = float(k)
    # Σ R_j² = Σ (2R_j)²/4
    chi2 = (12.0 / (n * kf * (kf + 1))
            * (s2.cast("double") / 4.0)) - 3.0 * n * (kf + 1)
    corr = 1.0 - F.col("__T").cast("double") \
        / (n * kf * (kf * kf - 1.0))
    ok = (F.col("__nb") > 0) & (corr > 0)
    return one.select(
        F.col("__nb").alias("n_blocks"),
        F.lit(k).cast("long").alias("k"),
        round_sig_safe(F.when(F.col("__nb") > 0, chi2), digits)
        .alias("chi2"),
        round_sig_safe(F.when(ok, chi2 / corr), digits)
        .alias("chi2_corrected"),
        F.lit(k - 1).cast("long").alias("dof"))


@register_op("friedman_test", "df")
def _friedman_op(df, *args, **kw):
    return friedman_test(df, *args, **kw)
