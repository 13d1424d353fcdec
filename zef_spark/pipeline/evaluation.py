"""Model-evaluation metrics for binary classifiers: ROC-AUC,
calibration (reliability) bins, threshold confusion metrics, and the
Brier score — the measurement half of pipeline/classifier.py.

Reference parity: the reference leaves metric assembly to chained
zefops (`sort` + `enumerate` ranks, `frequencies`, `mean` — ITF);
this module ships the assembled evaluators Spark-shaped: AUC is the
midrank rank-sum (exact ×2-scaled integers, shared engine with
abtest.mann_whitney_u — AUC IS U/(n₊·n₋)); everything else is ONE
conditional-aggregation scan.

Determinism: integer rank arithmetic and decimal(38,12) term sums.
The Brier score carries the calibration signal polynomially (hence
bit-exactly); log_loss (r09) joins it on the KL/PMI/entropy nat-sum
discipline — each ln term rounds half-up to 12 dp BEFORE the decimal
sum, the convention proven raw-repr-exact across engines at three
scales since r07.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .._registry import register_op
from .abtest import ranksum_agg

_DEC = "decimal(38,12)"


def _term(c):
    return F.round(c, 12).cast(_DEC)


def _label(label_col):
    lab = (F.col(label_col) if isinstance(label_col, str)
           else label_col)
    return lab.cast("boolean")


def binary_auc(df: DataFrame, score_col: str, label_col,
               n_ranges: int | None = None,
               digits: int = 6) -> DataFrame:
    """One row (n_pos, n_neg, auc) — the exact ROC-AUC of a score
    column against a binary label, via the rank-sum identity

        AUC = (R₊ − n₊(n₊+1)/2) / (n₊·n₋)

    with midrank ties (a tied pos/neg pair credits 0.5 — exactly the
    trapezoidal ROC area). Scale-free: any monotone transform of the
    score leaves AUC unchanged, so raw scores need no normalization.

    Plan: the shared rank-sum engine (abtest.ranksum_agg): one
    distinct-value hash agg + the range-partitioned two-phase prefix
    sum — never a single-partition sort, rank arithmetic in exact
    ×2-scaled integers. Degenerate inputs (single-class) yield NULL
    auc."""
    lab = _label(label_col)
    agg = ranksum_agg(df.where(lab.isNotNull()), score_col, lab,
                      n_ranges)
    na = F.col("__nal").cast("double")
    n = F.col("__nl").cast("double")
    nb = n - na
    ua = (F.col("__r2").cast("double")
          - na * (na + 1)) / F.lit(2.0)
    auc = F.when((na > 0) & (nb > 0),
                 F.round(ua / (na * nb), digits))
    return agg.select(
        F.col("__nal").cast("long").alias("n_pos"),
        (F.col("__nl") - F.col("__nal")).cast("long").alias("n_neg"),
        auc.alias("auc"))


def calibration_bins(df: DataFrame, score_col: str, label_col,
                     bins: int = 10, digits: int = 6) -> DataFrame:
    """(bin, n, mean_score, pos_rate) — the reliability diagram:
    scores in [0, 1] bucketed into ``bins`` equal-width bins (the
    top edge closed: score 1.0 lands in the last bin), with each
    bin's mean predicted probability vs realized positive rate. A
    calibrated model sits on the diagonal; the per-bin gaps are the
    ECE integrand (weight by n and sum |mean_score − pos_rate| for
    expected calibration error).

    Plan: ONE ``bins``-ary hash agg, map-side combinable;
    decimal-exact score sums. Out-of-range scores clamp into the
    edge bins (bin 0 / bins−1 absorb them) rather than erroring —
    the bins themselves then reveal the miscalibrated mass."""
    lab = _label(label_col)
    s = F.col(score_col).cast("double")
    b = F.least(F.greatest(F.floor(s * bins).cast("int"), F.lit(0)),
                F.lit(int(bins) - 1))
    out = (df.where(s.isNotNull() & lab.isNotNull())
           .groupBy(b.alias("bin"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(_term(s)).cast("double").alias("__ss"),
                F.sum(lab.cast("long")).alias("__pos")))
    n = F.col("n").cast("double")
    return out.select(
        "bin", "n",
        F.round(F.col("__ss") / n, digits).alias("mean_score"),
        F.round(F.col("__pos") / n, digits).alias("pos_rate"))


def confusion_at_threshold(df: DataFrame, score_col: str, label_col,
                           threshold: float,
                           digits: int = 6) -> DataFrame:
    """One row (tp, fp, tn, fn, precision, recall, f1, accuracy) —
    the confusion matrix and derived rates at ``score >= threshold``.
    ONE conditional-aggregation scan; four longs cross the wire.
    Empty denominators (no predicted / no actual positives) yield
    NULL precision/recall/f1."""
    lab = _label(label_col)
    s = F.col(score_col).cast("double")
    pred = s >= F.lit(float(threshold))
    agg = (df.where(s.isNotNull() & lab.isNotNull())
           .agg(F.sum((pred & lab).cast("long")).alias("tp"),
                F.sum((pred & ~lab).cast("long")).alias("fp"),
                F.sum((~pred & ~lab).cast("long")).alias("tn"),
                F.sum((~pred & lab).cast("long")).alias("fn")))
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    tn = F.col("tn").cast("double")
    fn = F.col("fn").cast("double")
    prec = F.when(tp + fp > 0, tp / (tp + fp))
    rec = F.when(tp + fn > 0, tp / (tp + fn))
    f1 = F.when((tp + fp > 0) & (tp + fn > 0) & (tp > 0),
                2 * (tp / (tp + fp)) * (tp / (tp + fn))
                / (tp / (tp + fp) + tp / (tp + fn)))
    acc = (tp + tn) / (tp + fp + tn + fn)
    return agg.select(
        "tp", "fp", "tn", "fn",
        F.round(prec, digits).alias("precision"),
        F.round(rec, digits).alias("recall"),
        F.round(f1, digits).alias("f1"),
        F.round(acc, digits).alias("accuracy"))


def brier_score(df: DataFrame, score_col: str, label_col,
                digits: int = 6) -> DataFrame:
    """One row (n, brier) — the Brier score, mean squared error of
    the predicted probability against the 0/1 outcome:

        B = mean((p − y)²)    ∈ [0, 1], lower is better

    the proper polynomial scoring rule — carries the same
    calibration+resolution signal as log-loss WITHOUT a logarithm,
    so the statistic is bit-identical on any engine (decimal-exact
    term sums; no libm dependence). ONE hash agg."""
    lab = _label(label_col)
    s = F.col(score_col).cast("double")
    y = lab.cast("double")
    d = s - y
    agg = (df.where(s.isNotNull() & lab.isNotNull())
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(_term(d * d)).cast("double").alias("__se")))
    return agg.select(
        "n",
        F.round(F.col("__se") / F.col("n").cast("double"),
                digits).alias("brier"))


@register_op("binary_auc", "df")
def _auc_op(df, *args, **kw):
    return binary_auc(df, *args, **kw)


@register_op("calibration_bins", "df")
def _calib_op(df, *args, **kw):
    return calibration_bins(df, *args, **kw)


@register_op("confusion_at_threshold", "df")
def _conf_op(df, *args, **kw):
    return confusion_at_threshold(df, *args, **kw)


@register_op("brier_score", "df")
def _brier_op(df, *args, **kw):
    return brier_score(df, *args, **kw)


def isotonic_calibration(df: DataFrame, score_col: str, label_col,
                         bins: int = 100) -> list[tuple[float, float]]:
    """Fit an isotonic (monotone non-decreasing) calibration map by
    pool-adjacent-violators over equal-population score bins. The
    distributed part is ONE key-ordered shuffle (NTILE binning via
    wrangling.rank_transform) + a bins-bounded agg; PAV itself runs
    on the driver over ≤`bins` weighted points — O(bins), independent
    of row count (the same bounded-sufficient-statistics split as
    pca_fit). Returns sorted (bin_min_score, calibrated_p)
    breakpoints for `apply_calibration`; binning makes it robust to
    score ties and keeps the step function plan-literal-sized."""
    from .wrangling import rank_transform
    y = _label(label_col)
    s = F.col(score_col).cast("double")
    base = (df.where(s.isNotNull() & y.isNotNull())
            .select(s.alias("__s"), y.alias("__y")))
    binned = rank_transform(base, "__s", bins=bins, out_col="__b")
    stats = (binned.groupBy("__b")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.min("__s").alias("s_min"),
                  (F.sum(_term(F.col("__y").cast("double")))
                   .cast("double")
                   / F.count(F.lit(1))).alias("rate"))
             .orderBy("__b").collect())
    # weighted PAV: merge adjacent blocks while the rate decreases
    blocks = []  # [sum_y_weighted, n, s_min]
    for r in stats:
        blocks.append([r["rate"] * r["n"], float(r["n"]),
                       r["s_min"]])
        while len(blocks) > 1 and (blocks[-2][0] * blocks[-1][1]
                                   >= blocks[-1][0] * blocks[-2][1]):
            sy, n, smin = blocks.pop()
            blocks[-1][0] += sy
            blocks[-1][1] += n
    return [(b[2], b[0] / b[1]) for b in blocks]


def apply_calibration(df: DataFrame, score_col: str,
                      model: list[tuple[float, float]],
                      out_col: str = "calibrated",
                      digits: int = 6) -> DataFrame:
    """Input + `out_col` — piecewise-constant lookup of the fitted
    isotonic map: a row takes the calibrated probability of the last
    breakpoint whose bin-min score is ≤ its score (scores below the
    first breakpoint clamp to it). Row-local CASE ladder over the
    ≤bins breakpoints — plan literals, zero shuffle, pipelines with
    the scan. NULL scores → NULL."""
    s = F.col(score_col).cast("double")
    expr = F.lit(float(model[0][1]))
    for smin, p in model[1:]:
        expr = F.when(s >= float(smin), F.lit(float(p))) \
                .otherwise(expr)
    return df.withColumn(
        out_col, F.when(s.isNotNull(), F.round(expr, digits)))


@register_op("apply_calibration", "df")
def _apply_calibration_op(df, *args, **kw):
    return apply_calibration(df, *args, **kw)


def cohens_kappa(df: DataFrame, col_a: str, col_b: str,
                 digits: int = 6) -> DataFrame:
    """One-row (n, po, pe, kappa) — Cohen's kappa, chance-corrected
    agreement between two categorical labelings over one label space
    (annotator consistency in labeling pipelines, model-vs-model
    agreement, consecutive-state stickiness):

        κ = (p_o − p_e) / (1 − p_e),
        p_o = Σ_c o_cc / n,   p_e = Σ_c (row_c · col_c) / n²

    Rows with a NULL on either side drop (listwise). κ is NULL when
    p_e = 1 (a single shared category — agreement is unmeasurable).

    Plan: ONE (a,b) joint hash agg (|A|×|B|-bounded, map-side
    combinable) + marginal aggs ON the joint table — the
    mutual_info/chi2 shape. Determinism: p_o and p_e are each ONE
    double division of exact-integer decimals (Σ row·col is an
    exact decimal(38,0) product-sum), κ is subtract/divide of those
    — no multiply-ADD anywhere; sig-safe release (|κ| ≤ 1)."""
    from ..functions.rounding import round_sig_safe
    a = F.col(col_a).cast("string")
    b = F.col(col_b).cast("string")
    joint = (df.where(a.isNotNull() & b.isNotNull())
             .select(a.alias("__a"), b.alias("__b"))
             .groupBy("__a", "__b")
             .agg(F.count(F.lit(1)).alias("c_ab")))
    ma = joint.groupBy("__a").agg(F.sum("c_ab").alias("c_a"))
    mb = joint.groupBy("__b").agg(F.sum("c_ab").alias("c_b"))
    d0 = "decimal(19,0)"
    diag = (joint.where(F.col("__a") == F.col("__b"))
            .agg(F.sum("c_ab").cast(d0).alias("__diag")))
    # Σ_c row_c · col_c over the SHARED label space (full outer on
    # the label: a label seen by only one rater contributes 0)
    pe_sum = (ma.join(mb, ma["__a"] == mb["__b"], "inner")
              .agg(F.sum(F.col("c_a").cast(d0)
                         * F.col("c_b").cast(d0)).alias("__pe_s")))
    tot = joint.agg(F.sum("c_ab").cast(d0).alias("__n"))
    one = (tot.crossJoin(F.broadcast(diag))
           .crossJoin(F.broadcast(pe_sum)))
    nd = F.col("__n").cast("double")
    po = F.coalesce(F.col("__diag").cast("double"), F.lit(0.0)) / nd
    pe = (F.coalesce(F.col("__pe_s").cast("double"), F.lit(0.0))
          / (F.col("__n") * F.col("__n")).cast("double"))
    raw = one.select(
        F.col("__n").cast("long").alias("n"),
        po.alias("__po_raw"), pe.alias("__pe_raw"),
        F.when(pe < 1.0, (po - pe) / (1.0 - pe)).alias("__k_raw"))
    return raw.select(
        "n",
        round_sig_safe(F.col("__po_raw"), digits).alias("po"),
        round_sig_safe(F.col("__pe_raw"), digits).alias("pe"),
        round_sig_safe(F.col("__k_raw"), digits).alias("kappa"))


@register_op("cohens_kappa", "df")
def _kappa_op(df, *args, **kw):
    return cohens_kappa(df, *args, **kw)


def log_loss(df: DataFrame, score_col: str, label_col, by=None,
             eps: float = 1e-15, digits: int = 6) -> DataFrame:
    """(by..., n, log_loss) — the mean binary cross-entropy (in
    nats) of a probabilistic score against a binary label:

        −mean[ y·ln(p) + (1−y)·ln(1−p) ],  p clipped to [ε, 1−ε]

    The proper scoring rule that punishes CONFIDENT mistakes
    super-linearly — the training-loss-aligned companion to
    brier_score (which stays polynomial) and the standard
    model-regression gate between pipeline releases.

    Plan: ONE map-side-combinable hash agg; each row's term rounds
    half-up to 12 dp before the decimal(38,12) sum (the KL/PMI
    nat-sum discipline — partition-order-independent), the final
    division is one double op, sig-safe rounded."""
    from ..functions.rounding import round_sig_safe
    keys = ([] if by is None
            else [by] if isinstance(by, str) else list(by))
    lab = _label(label_col)
    p = F.col(score_col).cast("double")
    p = F.greatest(F.lit(float(eps)),
                   F.least(F.lit(1.0 - eps), p))
    term = F.when(lab, -F.log(p)).otherwise(-F.log(F.lit(1.0) - p))
    agg = (df.where(lab.isNotNull()
                    & F.col(score_col).isNotNull())
           .groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(_term(term)).cast("double").alias("__s")))
    ll = F.col("__s") / F.col("n").cast("double")
    return agg.select(*keys, "n",
                      round_sig_safe(ll, digits).alias("log_loss"))


@register_op("log_loss", "df")
def _log_loss_op(df, *args, **kw):
    return log_loss(df, *args, **kw)


def _cum_desc(vt: DataFrame, order_col: str, sum_cols: list,
              n_ranges: int | None = None
              ) -> tuple[DataFrame, dict[str, int]]:
    """Shared DESC-cumulative engine for the eval-curve ops
    (roc_points / average_precision / gain_curve) — the same
    range-partitioned two-phase prefix sum abtest.ranksum_agg uses,
    pointed downhill: repartitionByRange on the order column DESC,
    a per-range local window (partitioned by range id — never a
    keyless single-partition sort), and k-scalars-per-range
    broadcast offsets. On a continuous model score the vocabulary
    table is row-sized, so the r09 keyless window degenerated to ONE
    partition holding the whole table at scale; this engine keeps
    every stage (distinct agg, local window, offset join) fully
    partitioned — the vocabulary only ever meets one executor as a
    ≤n_ranges-row offset table.

    Returns (vt + '__cum_<c>' exact-integer running sums in
    descending ``order_col`` order + '__tot_<c>' grand-total columns
    (identical on every row), {c: Column referencing '__tot_<c>'}).
    r12: offsets AND totals are computed in-plan
    (distkit.range_offsets — no eager checkpoint, no per-range
    collect, one Spark action); callers that used the totals as
    driver-side literals now consume them as plan columns."""
    from pyspark.sql import Window

    from .distkit import _ranged, range_offsets
    ranged = _ranged(vt, [F.col(order_col).desc()], n_ranges)
    w_in = (Window.partitionBy("__rid")
            .orderBy(F.col(order_col).desc())
            .rowsBetween(Window.unboundedPreceding, 0))
    local = ranged
    for c in sum_cols:
        local = local.withColumn(f"__cum_{c}", F.sum(c).over(w_in))
    off_df = range_offsets(ranged, {c: "long" for c in sum_cols},
                           with_totals=True)
    off_df = off_df.select(
        "__rid",
        *[F.col(f"__off_{c}") for c in sum_cols],
        *[F.col(f"__tot_{c}") for c in sum_cols])
    out = local.join(F.broadcast(off_df), "__rid")
    for c in sum_cols:
        out = out.withColumn(
            f"__cum_{c}",
            F.col(f"__cum_{c}") + F.coalesce(F.col(f"__off_{c}"),
                                             F.lit(0)))
    tot = {c: F.col(f"__tot_{c}") for c in sum_cols}
    return out.drop("__rid", *[f"__off_{c}" for c in sum_cols]), tot


def roc_points(df: DataFrame, score_col: str, label_col,
               max_points: int = 1000, digits: int = 6,
               quantize: int | None = None) -> DataFrame:
    """(threshold, tp, fp, tpr, fpr) — the ROC curve evaluated at
    every distinct score (predict positive when score >= threshold),
    downsampled deterministically to ≤ max_points evenly-spaced
    points when the score vocabulary is larger. The curve behind
    binary_auc's scalar — for plotting, threshold picking, and
    partial-AUC reads. ``quantize`` optionally rounds scores to that
    many digits BEFORE the distinct agg — an output-grid control for
    continuous scores (the engine itself no longer needs it).

    Plan (r10, de-scale-trapped): ONE distinct-score hash agg (score
    vocabulary, not rows), then the cumulative tp/fp run through the
    range-partitioned two-phase prefix-sum engine (_cum_desc — the
    binary_auc/ranksum machinery), never a keyless window: on a
    continuous score the vocabulary is row-sized and the r09 plan
    collapsed it onto one partition. tp/fp are EXACT integers;
    tpr/fpr are single divisions of exact integers, sig-safe
    rounded; totals ride the offset collect as plan literals."""
    from ..functions.rounding import round_sig_safe
    lab = _label(label_col)
    s = F.col(score_col).cast("double")
    if quantize is not None:
        # Grid via FLOOR(s·10^q + 0.5)/10^q in IEEE doubles — the
        # identical bit-exact computation in DuckDB SQL, unlike
        # F.round(double, q) (Spark rounds the SHORTEST-REPR decimal
        # half-up, DuckDB rounds the binary value half-away; a score
        # on a .5 grid boundary landed on different thresholds per
        # engine — r10 ADVICE). Convention: half-up (ties toward
        # +inf). Past 2^53 the double spacing exceeds any grid, so
        # rounding is identity there (and floor→long would overflow).
        p = F.lit(float(10 ** int(quantize)))
        sp = s * p
        s = (F.when(F.abs(sp) < F.lit(9007199254740992.0),
                    F.floor(sp + F.lit(0.5)).cast("double") / p)
             .otherwise(s))
    vt = (df.where(lab.isNotNull() & s.isNotNull())
          .groupBy(s.alias("threshold"))
          .agg(F.sum(lab.cast("long")).alias("__p"),
               F.sum((~lab).cast("long")).alias("__n"))
          .withColumn("__one", F.lit(1).cast("long")))
    cum, tot = _cum_desc(vt, "threshold", ["__p", "__n", "__one"])
    out = (cum.withColumnRenamed("__cum___p", "tp")
           .withColumnRenamed("__cum___n", "fp")
           .withColumnRenamed("__cum___one", "__i"))
    # r12: totals are plan COLUMNS now (_cum_desc in-plan rewrite) —
    # same values, no driver collect; the zero-total degenerate
    # cases fold into the F.when (null, as before).
    c_tot = tot["__one"].cast("long")
    # deterministic even-spaced thinning: keep point i when
    # floor(i*K/c) > floor((i-1)*K/c), always keeping the last
    k = F.lit(int(max_points)).cast("long")
    keep = (F.floor(F.col("__i") * k / c_tot)
            > F.floor((F.col("__i") - 1) * k / c_tot)) \
        | (F.col("__i") == c_tot)
    out = out.where(keep)
    tpr = F.when(tot["__p"] > 0,
                 F.col("tp").cast("double") / tot["__p"])
    fpr = F.when(tot["__n"] > 0,
                 F.col("fp").cast("double") / tot["__n"])
    return out.select("threshold", "tp", "fp",
                      round_sig_safe(tpr, digits).alias("tpr"),
                      round_sig_safe(fpr, digits).alias("fpr"))


@register_op("roc_points", "df")
def _roc_points_op(df, *args, **kw):
    return roc_points(df, *args, **kw)


def average_precision(df: DataFrame, score_col: str, label_col,
                      digits: int = 6) -> DataFrame:
    """One row (n_pos, n_neg, ap) — Average Precision (the area
    under the precision-recall curve by the step rule):

        AP = Σ_k [rank k is positive] · precision@k / n_pos

    with tie-collapsed steps: a tied score block contributes its
    positives at the block-END precision (a threshold can only sit
    between distinct scores — the tie-permutation-invariant
    convention, matching scikit-learn's step AP on collapsed
    scores). The imbalanced-data companion to
    binary_auc: AP weighs early precision, AUC weighs global
    ranking.

    Determinism: precision@k terms are ratios of exact integers;
    each block's contribution rounds half-up to 12 dp into a
    decimal(38,12) sum (partition-order-independent), one division
    releases sig-safe. Plan (r10, de-scale-trapped): one
    distinct-score hash agg + the range-partitioned two-phase
    prefix sum over the VOCABULARY (_cum_desc — never a keyless
    window; continuous scores make the vocabulary row-sized) + one
    1-row agg."""
    from ..functions.rounding import round_sig_safe
    dec = "decimal(38,12)"
    lab = _label(label_col)
    s = F.col(score_col).cast("double")
    vt = (df.where(lab.isNotNull() & s.isNotNull())
          .groupBy(s.alias("__s"))
          .agg(F.sum(lab.cast("long")).alias("__p"),
               F.count(F.lit(1)).alias("__t")))
    cum0, _tot = _cum_desc(vt, "__s", ["__p", "__t"])
    cum = (cum0.withColumnRenamed("__cum___t", "__ct")
           .withColumnRenamed("__cum___p", "__cp"))
    # step rule on the tie-collapsed table (sklearn's
    # average_precision_score convention): a tied score block of t
    # rows with p positives contributes p * precision-at-block-END —
    # a threshold can only sit BETWEEN distinct scores, so the whole
    # block enters at its trailing-edge precision, and no within-tie
    # ordering can change the result.
    prec_end = (F.col("__cp").cast("double")
                / F.col("__ct").cast("double"))
    term = F.round(F.col("__p").cast("double") * prec_end, 12) \
        .cast(dec)
    agg = cum.agg(
        F.sum("__p").cast("long").alias("n_pos"),
        (F.sum("__t") - F.sum("__p")).cast("long").alias("n_neg"),
        F.sum(term).cast("double").alias("__sum"))
    ap = F.when(F.col("n_pos") > 0,
                F.col("__sum") / F.col("n_pos").cast("double"))
    return agg.select("n_pos", "n_neg",
                      round_sig_safe(ap, digits).alias("ap"))


@register_op("average_precision", "df")
def _ap_op(df, *args, **kw):
    return average_precision(df, *args, **kw)


def wilson_ci(df: DataFrame, success_col, by=None, z: float = 1.96,
              digits: int = 6) -> DataFrame:
    """(by..., n, successes, rate, lo, hi) — the Wilson score
    interval for a binomial proportion:

        center = (p̂ + z²/2n) / (1 + z²/n)
        half   = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)

    The interval that behaves at the edges (p̂ near 0/1, small n)
    where the naive Wald interval collapses — the right error bar
    for conversion rates and precision estimates. One
    map-side-combinable hash agg; the interval assembles from two
    exact integers (n, successes) in a fixed double expression,
    sig-safe rounded."""
    from ..functions.rounding import round_sig_safe
    keys = ([] if by is None
            else [by] if isinstance(by, str) else list(by))
    lab = _label(success_col)
    agg = (df.where(lab.isNotNull())
           .groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(lab.cast("long")).alias("successes")))
    nd = F.col("n").cast("double")
    p = F.col("successes").cast("double") / nd
    z2 = float(z) * float(z)
    denom = 1.0 + F.lit(z2) / nd
    center = (p + F.lit(z2) / (2.0 * nd)) / denom
    half = (F.lit(float(z))
            * F.sqrt(p * (1.0 - p) / nd
                     + F.lit(z2) / (4.0 * nd * nd))) / denom
    ok = F.col("n") > 0
    return agg.select(
        *keys, "n", "successes",
        round_sig_safe(F.when(ok, p), digits).alias("rate"),
        round_sig_safe(F.when(ok, center - half), digits).alias("lo"),
        round_sig_safe(F.when(ok, center + half), digits).alias("hi"))


@register_op("wilson_ci", "df")
def _wilson_op(df, *args, **kw):
    return wilson_ci(df, *args, **kw)


def gain_curve(df: DataFrame, score_col: str, label_col,
               n_buckets: int = 10, digits: int = 6) -> DataFrame:
    """(bucket, n_cum, pos_cum, capture, lift) — the cumulative
    gains / lift table: at each population decile boundary (targeting
    the top b/n_buckets of rows by score), the share of all
    positives captured and the lift over random targeting
    (capture / population-share). The campaign-targeting readout
    beside roc_points; a perfect model captures everything in the
    first positives-rate deciles, lift 1.0 everywhere means the
    score is noise.

    Tie-safe determinism: boundaries are evaluated on the
    tie-COLLAPSED score table — bucket b reads at the first distinct
    score whose cumulative row count reaches b·N/n_buckets (exact
    integer compare n_buckets·ct ≥ b·N — a tie block is never
    split, so no within-tie order exists to disagree on). n_cum /
    pos_cum are exact integers; capture and lift are single
    divisions, sig-safe.

    Plan (r10, de-scale-trapped): one distinct-score hash agg + the
    range-partitioned two-phase prefix sum over the VOCABULARY
    (_cum_desc — never a keyless window) + ONE min_by hash agg for
    the bucket boundaries (map-side combinable — the r09 per-bucket
    row_number window put every post-boundary vocab row in one
    partition per bucket; min_by folds them locally). Totals ride
    the offset collect as plan literals."""
    from ..functions.rounding import round_sig_safe
    lab = _label(label_col)
    s = F.col(score_col).cast("double")
    vt = (df.where(lab.isNotNull() & s.isNotNull())
          .groupBy(s.alias("__s"))
          .agg(F.sum(lab.cast("long")).alias("__p"),
               F.count(F.lit(1)).alias("__t")))
    cum0, tot = _cum_desc(vt, "__s", ["__p", "__t"])
    cum = (cum0.withColumnRenamed("__cum___t", "__ct")
           .withColumnRenamed("__cum___p", "__cp"))
    b = int(n_buckets)
    # r12: totals are plan COLUMNS now (_cum_desc in-plan rewrite) —
    # carry them through the boundary agg via first() (identical on
    # every row), no driver collect.
    buckets = F.explode(F.sequence(F.lit(1), F.lit(b))).alias("bucket")
    tagged = cum.select("__ct", "__cp", "__tot___t", "__tot___p",
                        buckets).where(
        F.col("__ct") * b >= F.col("bucket") * F.col("__tot___t"))
    # bucket b reads at the FIRST distinct score whose cumulative
    # count reaches the boundary: min_by on __ct — one hash agg
    first = (tagged.groupBy("bucket")
             .agg(F.min("__ct").alias("__ct"),
                  F.min_by("__cp", "__ct").alias("__cp"),
                  F.first("__tot___t").alias("__nt"),
                  F.first("__tot___p").alias("__pt")))
    n_tot, p_tot = F.col("__nt"), F.col("__pt")
    capture = F.when(p_tot > 0,
                     F.col("__cp").cast("double") / p_tot)
    lift = F.when((p_tot > 0) & (F.col("__ct") > 0),
                  F.col("__cp").cast("double") * n_tot
                  / (F.col("__ct").cast("double") * p_tot))
    return (first.select(
        "bucket", F.col("__ct").alias("n_cum"),
        F.col("__cp").alias("pos_cum"),
        round_sig_safe(capture, digits).alias("capture"),
        round_sig_safe(lift, digits).alias("lift"))
        .orderBy("bucket"))


@register_op("gain_curve", "df")
def _gain_curve_op(df, *args, **kw):
    return gain_curve(df, *args, **kw)


def ndcg_at_k(df: DataFrame, score_col: str, rel_col, by=None,
              k: int = 10, digits: int = 6) -> DataFrame:
    """(by..., n, dcg, idcg, ndcg) — Normalized Discounted
    Cumulative Gain at cutoff k per ranking group (a search query,
    a recommendation slate):

        DCG@k  = Σ_{i≤k} (2^rel_i − 1) / log2(i + 1)
        IDCG@k = the same over the ideal (rel-descending) order
        NDCG   = DCG / IDCG ∈ [0, 1]

    with rows ranked by ``score_col`` DESC; score ties break by
    rel DESC (the optimistic convention, stated: two tied-score
    rows with EQUAL rel occupy an unordered position set whose DCG
    sum is order-invariant, so only cross-rel ties need a rule).
    Groups with zero relevant rows yield NULL ndcg.

    Plan: ONE group-keyed shuffle — the actual-rank and ideal-rank
    windows share the by-key partitioning — then one hash agg; each
    discounted term rounds half-up to 12 dp into a decimal(38,12)
    sum (partition-order-independent), the final division releases
    sig-safe."""
    from pyspark.sql import Window
    from ..functions.rounding import round_sig_safe
    dec = "decimal(38,12)"
    keys = ([] if by is None
            else [by] if isinstance(by, str) else list(by))
    part = keys if keys else [F.lit(1)]
    rel = (F.col(rel_col) if isinstance(rel_col, str)
           else rel_col).cast("double")
    s = F.col(score_col).cast("double")
    base = (df.where(s.isNotNull() & rel.isNotNull())
            .select(*keys, s.alias("__s"), rel.alias("__r")))
    w_act = (Window.partitionBy(*part)
             .orderBy(F.col("__s").desc(), F.col("__r").desc()))
    w_idl = Window.partitionBy(*part).orderBy(F.col("__r").desc())
    ranked = (base
              .withColumn("__ia", F.row_number().over(w_act))
              .withColumn("__ii", F.row_number().over(w_idl)))
    gain = F.pow(F.lit(2.0), F.col("__r")) - 1.0

    def _disc(idx):
        return F.round(gain / F.log(2.0, idx.cast("double") + 1.0),
                       12).cast(dec)

    kk = int(k)
    agg = (ranked.groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("__ia") <= kk,
                             _disc(F.col("__ia"))))
                .cast("double").alias("__dcg"),
                F.sum(F.when(F.col("__ii") <= kk,
                             _disc(F.col("__ii"))))
                .cast("double").alias("__idcg")))
    nd = F.when(F.col("__idcg") > 0,
                F.col("__dcg") / F.col("__idcg"))
    return agg.select(
        *keys, "n",
        round_sig_safe(F.coalesce(F.col("__dcg"), F.lit(0.0)),
                       digits).alias("dcg"),
        round_sig_safe(F.coalesce(F.col("__idcg"), F.lit(0.0)),
                       digits).alias("idcg"),
        round_sig_safe(nd, digits).alias("ndcg"))


@register_op("ndcg_at_k", "df")
def _ndcg_op(df, *args, **kw):
    return ndcg_at_k(df, *args, **kw)


def mrr(df: DataFrame, score_col: str, rel_col, by=None,
        digits: int = 6) -> DataFrame:
    """(by..., n, first_rel_rank, rr) — per-group Reciprocal Rank:
    the rank (score DESC, ties by rel DESC — ndcg_at_k's stated
    convention) of the FIRST relevant row, and 1/rank. Groups with
    no relevant row emit NULL first_rel_rank and rr = 0.0 (the
    standard MRR convention — a miss scores zero, the group still
    counts). Average the rr column for the scalar MRR.

    Plan: ONE group-keyed shuffle (ranking window) + one hash agg —
    the min-rank-where-relevant is a conditional MIN, map-side
    combinable above the window; rr is one exact division."""
    from pyspark.sql import Window
    from ..functions.rounding import round_sig_safe
    keys = ([] if by is None
            else [by] if isinstance(by, str) else list(by))
    part = keys if keys else [F.lit(1)]
    rel = (F.col(rel_col) if isinstance(rel_col, str)
           else rel_col).cast("boolean")
    s = F.col(score_col).cast("double")
    base = (df.where(s.isNotNull() & rel.isNotNull())
            .select(*keys, s.alias("__s"), rel.alias("__r")))
    w = (Window.partitionBy(*part)
         .orderBy(F.col("__s").desc(),
                  F.col("__r").cast("int").desc()))
    ranked = base.withColumn("__rk", F.row_number().over(w))
    agg = (ranked.groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("n"),
                F.min(F.when(F.col("__r"), F.col("__rk")))
                .alias("first_rel_rank")))
    rr = F.coalesce(
        1.0 / F.col("first_rel_rank").cast("double"), F.lit(0.0))
    return agg.select(*keys, "n", "first_rel_rank",
                      round_sig_safe(rr, digits).alias("rr"))


@register_op("mrr", "df")
def _mrr_op(df, *args, **kw):
    return mrr(df, *args, **kw)


def expected_calibration_error(df: DataFrame, score_col: str,
                               label_col, bins: int = 10,
                               digits: int = 6) -> DataFrame:
    """One row (n, bins_used, ece) — the Expected Calibration Error:
    the n-weighted mean |mean predicted − realized rate| over the
    reliability bins,

        ECE = Σ_b (n_b/n) · |mean_score_b − pos_rate_b|

    the scalar release of calibration_bins (whose per-bin gaps it
    integrates — same binning, same rounding grid, so the two
    readouts can never disagree). ONE bins-ary hash agg + a 1-row
    fold; per-bin terms round to 12 dp into a decimal sum."""
    from ..functions.rounding import round_sig_safe
    dec = "decimal(38,12)"
    cb = calibration_bins(df, score_col, label_col, bins=bins,
                          digits=digits)
    term = F.round(F.col("n").cast("double")
                   * F.abs(F.col("mean_score")
                           - F.col("pos_rate")), 12).cast(dec)
    agg = cb.agg(F.sum("n").alias("n"),
                 F.count(F.lit(1)).alias("bins_used"),
                 F.sum(term).cast("double").alias("__s"))
    ece = F.when(F.col("n") > 0,
                 F.col("__s") / F.col("n").cast("double"))
    return agg.select("n", "bins_used",
                      round_sig_safe(ece, digits).alias("ece"))


@register_op("expected_calibration_error", "df")
def _ece_op(df, *args, **kw):
    return expected_calibration_error(df, *args, **kw)


def cronbach_alpha(df: DataFrame, item_cols: list,
                   digits: int = 6) -> DataFrame:
    """One row (n, k, alpha) — Cronbach's α internal-consistency
    coefficient over k item columns (each row one respondent):

        α = k/(k−1) · (1 − Σ var(item_i) / var(Σ items))

    POPULATION variances (engine-exact, the group_moments
    convention). The scale-reliability gate before averaging item
    scores into one metric: α ≥ 0.7 is the usual accept line.
    Complete-case rows only (any NULL item drops the row).

    Plan: ONE conditional-agg scan — every item's Σx/Σx² plus the
    row-sum's Σs/Σs² in the same map-side-combinable hash agg;
    decimal-exact sums, fixed-order variance assembly, sig-safe
    release. Degenerate inputs (n < 2 or zero total variance) yield
    NULL α."""
    from ..functions.rounding import round_sig_safe
    cols = [F.col(c) if isinstance(c, str) else c for c in item_cols]
    k = len(cols)
    xs = [c.cast("double") for c in cols]
    ok = xs[0].isNotNull()
    for x in xs[1:]:
        ok = ok & x.isNotNull()
    srow = None
    for x in xs:
        srow = x if srow is None else srow + x
    pre = df.where(ok).select(
        *[x.alias(f"__x{i}") for i, x in enumerate(xs)],
        srow.alias("__srow"))
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(k):
        xi = F.col(f"__x{i}")
        aggs += [F.sum(_term(xi)).cast("double").alias(f"__s{i}"),
                 F.sum(_term(xi * xi)).cast("double")
                 .alias(f"__q{i}")]
    st = F.col("__srow")
    aggs += [F.sum(_term(st)).cast("double").alias("__ss"),
             F.sum(_term(st * st)).cast("double").alias("__qq")]
    one = pre.agg(*aggs)
    nd = F.col("n").cast("double")
    vsum = None  # Σ var_i, fixed item order
    for i in range(k):
        vi = F.col(f"__q{i}") / nd \
            - (F.col(f"__s{i}") / nd) * (F.col(f"__s{i}") / nd)
        vsum = vi if vsum is None else vsum + vi
    vt = F.col("__qq") / nd - (F.col("__ss") / nd) \
        * (F.col("__ss") / nd)
    okr = (F.col("n") >= 2) & (vt > 0)
    alpha = F.when(okr, F.lit(float(k) / (k - 1))
                   * (1.0 - vsum / vt))
    return one.select("n", F.lit(k).cast("long").alias("k"),
                      round_sig_safe(alpha, digits).alias("alpha"))


@register_op("cronbach_alpha", "df")
def _cronbach_op(df, *args, **kw):
    return cronbach_alpha(df, *args, **kw)
