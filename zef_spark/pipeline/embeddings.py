"""Embedding-column utilities for corpus pipelines: L2 normalization,
group mean-pooling (chunk→doc / class centroids), and deterministic
random projection (Johnson-Lindenstrauss dimensionality reduction).

All three are DataFrame-native (no Python on the hot path):
- `l2_normalize` is a row-local array transform (zero shuffle).
- `mean_pool` explodes to (group, dim) — ONE shuffle keyed by a
  perfectly uniform composite key — and re-assembles the pooled array
  ordered by dimension. Element sums accumulate in DECIMAL so the
  result is partition-order-exact (same policy as
  clustering.kmeans_assign means).
- `random_projection` multiplies by a ±1 sign matrix derived from md5
  (no RNG state): the matrix is literal constants in the plan, so the
  projection is a row-local codegen'd fold, reproducible across
  restarts and replayable in any engine (the oracle embeds the same
  signs; see similarity._plane for the same trick with hyperplanes).

At 100 TB: normalization/projection pipeline with the scan;
mean-pool's shuffle carries one row per (group, dim) — fan-out is
dim×, bounded and uniform; nothing ever collects to the driver.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, functions as F


def l2_normalize(df: DataFrame, vec_col: str,
                 out_col: str = "unit_vec",
                 digits: int = 6) -> DataFrame:
    """v / ||v|| with elements rounded to `digits`; zero vectors pass
    through unchanged (norm guard)."""
    v = F.col(vec_col)
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0),
                             lambda acc, x: acc + x * x))
    return df.withColumn(
        out_col,
        F.when(nrm > 0,
               F.transform(v, lambda x: F.round(x / nrm, digits)))
        .otherwise(F.transform(v, lambda x: x.cast("double"))))


def mean_pool(df: DataFrame, group_col: str, vec_col: str,
              out_col: str = "pooled", digits: int = 6) -> DataFrame:
    """Per-group element-wise mean of `vec_col` → (group_col,
    out_col). DECIMAL-accumulated (exact at any parallelism), final
    value = round(sum/count, digits) in double."""
    exploded = (df.select(F.col(group_col),
                          F.posexplode(F.col(vec_col))
                          .alias("__dim", "__x"))
                .select(group_col, "__dim",
                        F.col("__x").cast("decimal(18,9)").alias("__x")))
    per_dim = (exploded.groupBy(group_col, "__dim")
               .agg((F.sum("__x").cast("double")
                     / F.count(F.lit(1))).alias("__m"))
               .select(group_col, "__dim",
                       F.round("__m", digits).alias("__m")))
    return (per_dim.groupBy(group_col)
            .agg(F.array_sort(F.collect_list(F.struct("__dim", "__m")))
                 .alias("__s"))
            .select(group_col,
                    F.transform("__s", lambda s: s["__m"])
                    .alias(out_col)))


def projection_signs(in_dim: int, out_dim: int,
                     seed: str = "rp_v1") -> list[list[int]]:
    """The ±1 sign matrix (out_dim × in_dim), md5-derived — shared
    with oracle SQL generators so both engines see identical
    constants."""
    return [[1 if int(hashlib.md5(f"{seed}:{j}:{i}".encode())
                      .hexdigest()[:8], 16) % 2 == 0 else -1
             for i in range(in_dim)]
            for j in range(out_dim)]


def random_projection(df: DataFrame, vec_col: str, in_dim: int,
                      out_dim: int, seed: str = "rp_v1",
                      out_col: str = "projected",
                      digits: int = 6) -> DataFrame:
    """Sign-matrix Johnson-Lindenstrauss projection:
    out_j = (Σ_i v_i · s_ji) / sqrt(out_dim), rounded to `digits`.
    Expected pairwise-distance distortion is O(1/sqrt(out_dim)) —
    the standard cheap pre-step before LSH/IVF indexing."""
    signs = projection_signs(in_dim, out_dim, seed)
    scale = 1.0 / math.sqrt(out_dim)
    v = F.col(vec_col)
    comps = [
        F.round(F.aggregate(
            F.zip_with(v, F.array(*[F.lit(float(s)) for s in row]),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x) * F.lit(scale), digits)
        for row in signs]
    return df.withColumn(out_col, F.array(*comps))


def covariance_pairs(df: DataFrame, vec_col: str,
                     pairs: list[tuple[int, int]],
                     digits: int = 6) -> DataFrame:
    """(dim_a, dim_b, n, cov) — POPULATION covariance of the requested
    embedding-component pairs (0-based dims), cross-engine exact:

        cov(a,b) = (Σ x_a·x_b − Σx_a · Σx_b / n) / n

    with every term rounded at 12 dp and summed in DECIMAL(38,12), so
    any engine applying the same definition matches bit-for-bit. ONE
    scan, one pairs-bounded hash aggregate (map-side combinable), the
    pair rows unfolded from the 1-row result via an inline array — no
    explode, no per-pair job, nothing proportional to d². Rows whose
    vector is NULL or too short for a requested dim are dropped
    (listwise) so every pair shares one n."""
    dec = "decimal(38,12)"
    term = lambda c: F.round(c, 12).cast(dec)
    pairs = [(int(a), int(b)) for a, b in pairs]
    dims = sorted({d for p in pairs for d in p})
    v = F.col(vec_col)
    base = df.where(v.isNotNull() & (F.size(v) > max(dims)))
    x = {d: F.element_at(v, d + 1).cast("double") for d in dims}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for d in dims:
        aggs.append(F.sum(term(x[d])).cast("double").alias(f"__s_{d}"))
    for a, b in pairs:
        aggs.append(F.sum(term(x[a] * x[b])).cast("double")
                    .alias(f"__p_{a}_{b}"))
    one = base.agg(*aggs)
    n = F.col("__n").cast("double")
    rows = []
    for a, b in pairs:
        cov = F.when(
            F.col("__n") > 0,
            F.round((F.col(f"__p_{a}_{b}")
                     - F.col(f"__s_{a}") * F.col(f"__s_{b}") / n) / n,
                    digits))
        rows.append(F.struct(F.lit(a).alias("dim_a"),
                             F.lit(b).alias("dim_b"),
                             cov.alias("cov")))
    return (one.select(F.col("__n").alias("n"),
                       F.explode(F.array(*rows)).alias("__pr"))
            .select("__pr.dim_a", "__pr.dim_b", "n", "__pr.cov"))


def moment_partials(df: DataFrame, vec_col: str, dim: int,
                    exact: bool = False) -> DataFrame:
    """1-row DataFrame (n, s: d-array, m: d²-array row-major) of the
    corpus moments Σx and Σx·xᵀ — the sufficient statistics for
    mean/covariance/PCA.

    exact=False (the SCALE path): mapInPandas — each Arrow batch
    collapses to ONE partial row via numpy BLAS (syrk), then a d²-
    bounded element sum. Work on the data is vectorized C; only
    dim²-sized partials cross the wire (one per batch), never rows.
    exact=True: row-local outer products exploded to (idx, value)
    with 12-dp DECIMAL sums — d²× row expansion, cross-engine exact;
    for oracle proofs and small-d audits, not the 100 TB path."""
    v = F.col(vec_col)
    base = df.where(v.isNotNull() & (F.size(v) == dim))
    if exact:
        dec = "decimal(38,12)"
        xd = F.transform(v, lambda x: x.cast("double"))
        outer = F.flatten(F.transform(
            xd, lambda xi: F.transform(xd, lambda xj: xi * xj)))
        both = F.concat(xd, outer)  # first d entries Σx, rest Σxxᵀ
        ex = (base.select(F.posexplode(both).alias("__i", "__x"))
              .groupBy("__i")
              .agg(F.sum(F.round(F.col("__x"), 12).cast(dec))
                   .cast("double").alias("__v")))
        cnt = base.agg(F.count(F.lit(1)).alias("n"))
        packed = (ex.agg(F.array_sort(F.collect_list(
                      F.struct("__i", "__v"))).alias("__a"))
                  .select(F.transform("__a", lambda s: s["__v"])
                          .alias("__flat")))
        return (cnt.crossJoin(F.broadcast(packed))
                .select("n", F.slice("__flat", 1, dim).alias("s"),
                        F.slice("__flat", dim + 1, dim * dim)
                        .alias("m")))

    def part(batches):
        import numpy as np
        import pandas as pd
        n, s, m = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(list(pdf[vec_col]), dtype="float64")
            n += X.shape[0]
            s = X.sum(axis=0) + (s if s is not None else 0.0)
            m = X.T @ X + (m if m is not None else 0.0)
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()],
                                "m": [m.ravel().tolist()]})

    schema = "n long, s array<double>, m array<double>"
    partials = base.select(vec_col).mapInPandas(part, schema=schema)
    # reduce the batch partials: d²-bounded, one tiny shuffle
    ps = (partials.select("n", F.posexplode(F.concat("s", "m"))
                          .alias("__i", "__x"))
          .groupBy("__i").agg(F.sum("__x").alias("__v")))
    cnt = partials.agg(F.sum("n").alias("n"))
    packed = (ps.agg(F.array_sort(F.collect_list(
                  F.struct("__i", "__v"))).alias("__a"))
              .select(F.transform("__a", lambda s: s["__v"])
                      .alias("__flat")))
    return (cnt.crossJoin(F.broadcast(packed))
            .select("n", F.slice("__flat", 1, dim).alias("s"),
                    F.slice("__flat", dim + 1, dim * dim).alias("m")))


def pca_fit(df: DataFrame, vec_col: str, dim: int, k: int,
            exact: bool = False) -> dict:
    """Fit a k-component PCA on an embedding column. Distributed part
    = ONE pass of sufficient statistics (`moment_partials`); the
    eigendecomposition runs on the driver over the d×d covariance —
    O(d³) with d the EMBEDDING dim, independent of row count, the
    standard big-data PCA split (same shape as Spark MLlib's
    RowMatrix.computePrincipalComponents).

    Returns {n, mean (d), components (k×d, rows = eigenvectors,
    descending eigenvalue, sign-normalized so each row's
    largest-|x| entry is positive), explained_variance (k),
    total_variance (= covariance trace = Σ ALL eigenvalues)}."""
    import numpy as np
    row = moment_partials(df, vec_col, dim, exact=exact).collect()[0]
    n = row["n"]
    s = np.asarray(row["s"])
    m = np.asarray(row["m"]).reshape(dim, dim)
    mean = s / n
    cov = m / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T                   # k×d
    for r in comps:                            # deterministic sign
        if r[np.argmax(np.abs(r))] < 0:
            r *= -1.0
    return {"n": int(n), "mean": mean.tolist(),
            "components": comps.tolist(),
            "explained_variance": vals[order].tolist(),
            "total_variance": float(np.trace(cov))}


def pca_project(df: DataFrame, vec_col: str, model: dict,
                out_col: str = "pca", digits: int = 6) -> DataFrame:
    """Input + `out_col` = (x − mean) · componentsᵀ, the k-dim PCA
    projection. The k×d model is a plan literal broadcast to every
    task; the matmul runs in an Arrow-batched pandas UDF (numpy BLAS
    per batch) — row-local, zero shuffle, pipelines with the scan.
    (A higher-order-function form would run interpreted per element:
    d×k mults/row in the plan interpreter — the UDF is the fast
    path here, not the slow one.)"""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf
    import numpy as np
    mean = np.asarray(model["mean"])
    comps = np.asarray(model["components"])   # k×d

    def _proj(col):
        X = np.asarray(list(col), dtype="float64")
        Y = np.round((X - mean) @ comps.T, digits)
        return pd.Series(list(Y))

    # real annotation objects: the module's `from __future__ import
    # annotations` would stringify inline hints, which the pandas_udf
    # resolver can't evaluate against local imports
    _proj.__annotations__ = {"col": pd.Series, "return": pd.Series}
    proj = pandas_udf(T.ArrayType(T.DoubleType()))(_proj)
    return df.withColumn(out_col, proj(F.col(vec_col)))


from .._registry import register_op


@register_op("l2_normalize", "df")
def _l2_op(df: DataFrame, *args, **kw):
    return l2_normalize(df, *args, **kw)


@register_op("mean_pool", "df")
def _pool_op(df: DataFrame, *args, **kw):
    return mean_pool(df, *args, **kw)


@register_op("random_projection", "df")
def _rp_op(df: DataFrame, *args, **kw):
    return random_projection(df, *args, **kw)


@register_op("covariance_pairs", "df")
def _cov_pairs_op(df: DataFrame, *args, **kw):
    return covariance_pairs(df, *args, **kw)


@register_op("pca_project", "df")
def _pca_project_op(df: DataFrame, *args, **kw):
    return pca_project(df, *args, **kw)


def quantize_embeddings(df: DataFrame, vec_col: str,
                        out_col: str = "q_vec",
                        scale_col: str = "q_scale",
                        bits: int = 8) -> DataFrame:
    """Input + (``out_col`` array<int>, ``scale_col`` double) —
    symmetric per-vector integer quantization (the int8 storage
    format of every production vector store: 4× smaller than float32,
    dot products stay SIMD-able):

        scale = max|v| / (2^(bits−1) − 1),   q_i = ⌊v_i/scale + ½⌋

    Round-half-up via ⌊x+½⌋ — the ONE rounding spelling that is
    bit-identical across engines (banker's vs half-away ROUND
    variants disagree on exact .5 ties; floor never does). Zero
    vectors quantize to all-zeros with scale 0. Row-local transform:
    ZERO shuffle, linear in corpus bytes, no UDF."""
    qmax = float((1 << (bits - 1)) - 1)
    v = F.col(vec_col)
    maxabs = F.array_max(
        F.transform(v, lambda x: F.abs(x.cast("double"))))
    df2 = df.withColumn(scale_col, maxabs / F.lit(qmax))
    s = F.col(scale_col)
    q = (F.when(s > 0,
                F.transform(v, lambda x: F.floor(
                    x.cast("double") / s + F.lit(0.5)).cast("int")))
         .otherwise(F.transform(v, lambda x: F.lit(0))))
    return df2.withColumn(out_col, q)


def quantization_profile(df: DataFrame, vec_col: str,
                         bits: int = 8,
                         digits: int = 6) -> DataFrame:
    """One row (n, mean_mse, max_abs_err, mean_scale) — the
    reconstruction-error profile of quantize_embeddings over the
    whole corpus: per-vector MSE of (v − q·scale), the corpus-max
    absolute element error (bounded by scale/2 ≤ max|v|/254 for
    int8), and the mean scale. The accept/reject gate before
    swapping a float32 index for its int8 twin.

    Determinism: per-element squared errors round half-up to 12 dp
    into decimal(38,12) in-vector folds (element-order fixed,
    partition-order irrelevant); per-vector MSE rounds to 12 dp
    before the corpus-level decimal mean; max is exact. One
    row-local projection + ONE 1-row hash agg."""
    from ..functions.rounding import round_sig_safe
    dec = "decimal(38,12)"
    # in-vector fold accumulates at (28,12): Spark widens (p,12)+(p,12)
    # to (p+1,12) and only SHRINKS the scale once p+1 > 38 — the silent
    # (38,12)+(38,12)→(38,11) precision-loss round the JS-divergence
    # work pinned. 28 digits of headroom >> any 4096-dim error sum.
    dec_acc = "decimal(28,12)"
    qd = quantize_embeddings(df, vec_col, "__q", "__scale", bits)
    v = F.col(vec_col)
    s = F.col("__scale")
    err = F.zip_with(v, F.col("__q"),
                     lambda x, q: x.cast("double")
                     - q.cast("double") * s)
    per = qd.select(
        s.alias("__scale"),
        (F.aggregate(err, F.lit(0).cast(dec_acc),
                     lambda acc, e: (acc + F.round(e * e, 12)
                                     .cast(dec_acc)).cast(dec_acc))
         .cast("double")
         / F.size(v).cast("double")).alias("__mse"),
        F.array_max(F.transform(err, F.abs)).alias("__maxerr"))
    agg = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("__mse"), 12).cast(dec))
        .cast("double").alias("__smse"),
        F.max("__maxerr").alias("__gmax"),
        F.sum(F.round(F.col("__scale"), 12).cast(dec))
        .cast("double").alias("__sscale"))
    nd = F.col("n").cast("double")
    return agg.select(
        "n",
        round_sig_safe(F.col("__smse") / nd, digits)
        .alias("mean_mse"),
        round_sig_safe(F.col("__gmax"), digits).alias("max_abs_err"),
        round_sig_safe(F.col("__sscale") / nd, digits)
        .alias("mean_scale"))


@register_op("quantize_embeddings", "df")
def _quantize_op(df, *args, **kw):
    return quantize_embeddings(df, *args, **kw)


@register_op("quantization_profile", "df")
def _quant_profile_op(df, *args, **kw):
    return quantization_profile(df, *args, **kw)
