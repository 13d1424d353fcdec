"""Categorical feature encoding for training pipelines: one-hot,
count/frequency encoding, crossed (interaction) features, and the
signed hashing trick — the row-local / vocabulary-bounded encoders
that sit in front of a trainer (target_encode, the supervised member
of the family, lives in wrangling.py).

Scale posture:
- `one_hot` emits vocab-many 0/1 columns from row-local CASE
  expressions — zero shuffle; the vocabulary is either caller-pinned
  (plan-pure) or derived once via a vocab-sized distinct (control
  plane, the only job).
- `count_encode` is target_encode's unsupervised sibling: one
  vocab-sized hash agg joined back (broadcast when the vocab fits).
- `interaction_features` is a row-local string cross — zero shuffle,
  feeds any of the other encoders.
- `feature_hash` (Weinberger et al. signed hashing) maps any number
  of columns into a FIXED dim with no vocabulary at all — the only
  encoder whose cost is independent of cardinality, hence the 100 TB
  default for high-cardinality features. Hashes are the repo's
  bit-portable md5 idiom (same family as corpus.hash_sample
  method='md5'), so any engine with md5 reproduces the buckets
  exactly. Dense form builds dim-many codegen'd columns (small dims);
  sparse form emits (id, bucket, value) rows and aggregates by
  (id, bucket) — the shape that survives dim = 2^18.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .._registry import register_op


def _safe_name(v) -> str:
    s = str(v)
    return "".join(c if c.isalnum() else "_" for c in s)


def one_hot(df: DataFrame, col: str, vocab: list | None = None,
            prefix: str | None = None) -> DataFrame:
    """Input + one 0/1 int column per vocabulary value
    (``<prefix>_<value>``, prefix defaults to ``oh_<col>``). Values
    outside the vocabulary — and NULLs — encode as all-zeros (the
    standard handleInvalid='keep-as-zero' posture). With vocab=None
    the vocabulary is the column's sorted distinct values (one
    vocab-sized control-plane job; pass an explicit vocab to keep
    the plan pure and train/serve-consistent)."""
    if vocab is None:
        vocab = [r[0] for r in
                 df.select(col).distinct().collect()
                 if r[0] is not None]
        vocab = sorted(vocab)
    prefix = prefix or f"oh_{col}"
    out = df
    for v in vocab:
        out = out.withColumn(
            f"{prefix}_{_safe_name(v)}",
            F.when(F.col(col) == F.lit(v), 1).otherwise(0))
    return out


def count_encode(df: DataFrame, col: str, out_col: str | None = None,
                 normalize: bool = False,
                 digits: int = 6) -> DataFrame:
    """Input + ``out_col`` (default ``ce_<col>``) — frequency
    encoding: each category's row count (normalize=True: its share
    of all rows, rounded to `digits`). NULL is its own category.
    One vocab-sized hash agg + a hash join back; the total is a
    1-row broadcast only when normalizing."""
    out_col = out_col or f"ce_{col}"
    key = F.coalesce(F.col(col).cast("string"), F.lit("∅"))
    counts = (df.groupBy(key.alias("__k"))
              .agg(F.count(F.lit(1)).alias("__c")))
    joined = df.withColumn("__k", key).join(counts, "__k")
    if normalize:
        tot = df.agg(F.count(F.lit(1)).alias("__t"))
        joined = (joined.crossJoin(F.broadcast(tot))
                  .withColumn(out_col,
                              F.round(F.col("__c").cast("double")
                                      / F.col("__t"), digits))
                  .drop("__t"))
    else:
        joined = joined.withColumn(out_col, F.col("__c"))
    return joined.drop("__k", "__c")


def interaction_features(df: DataFrame, cols: list[str],
                         out_col: str | None = None,
                         sep: str = "␟") -> DataFrame:
    """Input + ``out_col`` (default ``x_<c1>_<c2>...``) — the crossed
    categorical feature: the values of `cols` joined with a separator
    that can't occur in data (U+241F symbol-for-unit-separator by
    default). NULL components render as ``∅`` so (NULL, 'a') and
    ('a', NULL) stay distinct crosses. Row-local, zero shuffle; feed
    the result to one_hot / count_encode / target_encode /
    feature_hash."""
    out_col = out_col or ("x_" + "_".join(cols))
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("∅"))
             for c in cols]
    return df.withColumn(out_col, F.concat_ws(sep, *parts))


def _bucket_and_sign(feat: "F.Column", dim: int, salt: str):
    """Bit-portable (bucket, sign) of a feature string: bucket =
    first-15-hex-digits of md5 as a long, mod dim; sign = parity of
    hex digit 16 (+1 even, −1 odd). DuckDB replays it as
    ('0x' || SUBSTR(MD5(s),1,15))::BIGINT % dim and
    ('0x' || SUBSTR(MD5(s),16,1))::BIGINT % 2."""
    h = F.md5(F.concat(feat, F.lit(salt)))
    bucket = F.pmod(F.conv(F.substring(h, 1, 15), 16, 10)
                    .cast("long"), F.lit(dim))
    sign = F.when(F.pmod(F.conv(F.substring(h, 16, 1), 16, 10)
                         .cast("long"), F.lit(2)) == 0,
                  F.lit(1)).otherwise(F.lit(-1))
    return bucket, sign


def feature_hash(df: DataFrame, cols: list[str], dim: int,
                 id_col: str | None = None,
                 out_col: str = "fh", salt: str = "",
                 sparse: bool = False) -> DataFrame:
    """The signed hashing trick: every (column=value) feature lands in
    bucket md5-hash(name=value) % dim with a ±1 sign (unbiased under
    collisions); a row's encoding is the per-bucket sign sum. NULL
    feature values contribute nothing.

    sparse=False → input + ``out_col``: a dense array<long> of length
    `dim`, built from dim×|cols| codegen'd CASE terms — row-local,
    zero shuffle; right for small dims (≤ a few hundred).
    sparse=True → (id_col, bucket, value) rows with value ≠ 0 — one
    (id, bucket)-keyed agg after a |cols|-way explode; the form that
    survives dim = 2^18 (requires id_col)."""
    feats = []
    for c in cols:
        feat = F.concat(F.lit(f"{c}="), F.col(c).cast("string"))
        b, s = _bucket_and_sign(feat, dim, salt)
        notnull = F.col(c).isNotNull()
        feats.append((notnull, b, s))
    if not sparse:
        elems = []
        for i in range(dim):
            total = None
            for notnull, b, s in feats:
                t = F.when(notnull & (b == i), s).otherwise(0)
                total = t if total is None else total + t
            elems.append(total.cast("long"))
        return df.withColumn(out_col, F.array(*elems))
    if id_col is None:
        raise ValueError("sparse=True requires id_col")
    contrib = F.array(*[
        F.when(notnull, F.struct(b.alias("bucket"),
                                 s.cast("long").alias("v")))
        for notnull, b, s in feats])
    return (df.select(F.col(id_col),
                      F.explode(contrib).alias("__f"))
            .where(F.col("__f").isNotNull())
            .groupBy(id_col, F.col("__f.bucket").alias("bucket"))
            .agg(F.sum("__f.v").alias("value"))
            .where(F.col("value") != 0))


@register_op("one_hot", "df")
def _one_hot_op(df, *args, **kw):
    return one_hot(df, *args, **kw)


@register_op("count_encode", "df")
def _count_encode_op(df, *args, **kw):
    return count_encode(df, *args, **kw)


@register_op("interaction_features", "df")
def _interaction_op(df, *args, **kw):
    return interaction_features(df, *args, **kw)


@register_op("feature_hash", "df")
def _feature_hash_op(df, *args, **kw):
    return feature_hash(df, *args, **kw)


def class_weights(df: DataFrame, label_col: str,
                  digits: int = 6) -> DataFrame:
    """(label, n, weight) — inverse-frequency class weights by the
    standard 'balanced' formula weight_c = n_total / (k·n_c) (each
    class's weighted mass equals n/k, so the loss sees a balanced
    problem). One vocabulary-sized hash agg; totals ride along as
    window sums over the class table — no second scan, no broadcast
    join. NULL labels are their own class."""
    from pyspark.sql import Window
    key = F.coalesce(F.col(label_col).cast("string"), F.lit("∅"))
    per = (df.groupBy(key.alias("label"))
           .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy()
    return (per
            .withColumn("__tot", F.sum("n").over(w))
            .withColumn("__k", F.count(F.lit(1)).over(w))
            .select("label", "n",
                    F.round(F.col("__tot").cast("double")
                            / (F.col("__k") * F.col("n")), digits)
                    .alias("weight")))


@register_op("class_weights", "df")
def _class_weights_op(df, *args, **kw):
    return class_weights(df, *args, **kw)
