"""Hashed-feature Naive Bayes text classifier — the fastText-style
supervised filter of a large-scale curation pipeline (train a
quality/domain/language model on labeled docs, score the whole
corpus). Reference analogue: zef's data-wrangling quality hooks; the
CCNet / DCLM pipelines use exactly this shape for quality filtering.

100 TB plan shape:
- TRAIN is one token explode → ONE shuffle keyed (feature, label)
  with map-side combine, plus a label-count aggregate whose
  cardinality is the number of classes. The model is bounded by
  n_features × n_labels rows (hashing trick), independent of corpus
  size — broadcastable by construction.
- SCORE is row-local tokenize/hash → join against the BROADCAST
  delta table → one doc-keyed aggregation. No shuffle ever carries
  more than (doc, feature) token postings; the corpus side is never
  re-keyed by anything but the doc id.

Determinism (oracle-checkable in any engine with md5):
- features hash by md5 (same idiom as ``corpus.hash_sample``),
- log-probabilities round to DECIMAL(20, `digits`) BEFORE summation,
  so scores are exact and partition-order-independent,
- argmax ties break toward the lexically smallest label.

Smoothing refactor (what makes the broadcast join sufficient): with
add-alpha smoothing,

  score(d, l) = prior_l + sum_t log((c_tl + a) / (T_l + aV))
              = prior_l + n_d * default_l + sum_{t observed with l}
                                            delta_tl
  where default_l = log(a / (T_l + aV)),
        delta_tl  = log((c_tl + a) / a)   (0 when c_tl = 0).

Only OBSERVED (feature, label) pairs need a table row; unseen pairs
contribute exactly 0, so a plain inner join + per-label defaults
reconstructs the full smoothed score without materializing the dense
n_features × n_labels grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import _tokens


def _feature(tok_col, n_features: int, salt: str):
    """md5 hash bucket of a token — bit-portable across engines
    (DuckDB: ('0x' || SUBSTR(MD5(t || salt), 1, 15))::BIGINT % n)."""
    return F.pmod(
        F.conv(F.substring(
            F.md5(F.concat(tok_col, F.lit(salt))), 1, 15), 16, 10)
        .cast("long"), F.lit(n_features))


def _posting(df: DataFrame, id_cols: list, text_col: str,
             n_features: int, salt: str) -> DataFrame:
    tok = F.explode(_tokens(F.col(text_col)))
    step = df.select(*id_cols, tok.alias("__tok"))
    names = [c for c in step.columns if c != "__tok"]
    return (step
            .select(*names,
                    _feature(F.col("__tok"), n_features, salt)
                    .alias("feature"))
            .groupBy(*names, "feature")
            .agg(F.count(F.lit(1)).alias("tf")))


def nb_train(df: DataFrame, text_col: str, label_col: str,
             n_features: int = 4096, alpha: float = 1.0,
             salt: str = "nb_v1", digits: int = 6) -> dict:
    """Train the model. Returns {'deltas': DataFrame(feature, label,
    delta), 'labels': DataFrame(label, prior, default_lp)} — both
    sides bounded (features × labels, resp. labels), never corpus-
    sized. All log terms are DECIMAL(20, digits) for exact sums."""
    dec = f"decimal(20,{digits})"
    counts = (_posting(df, [F.col(label_col).alias("label")],
                       text_col, n_features, salt)
              .groupBy("label", "feature")
              .agg(F.sum("tf").alias("c")))
    # T_l (tokens per label) and doc priors
    label_tok = counts.groupBy("label").agg(F.sum("c").alias("T"))
    n_docs = df.count()
    label_docs = (df.groupBy(F.col(label_col).alias("label"))
                  .agg(F.count(F.lit(1)).alias("n_docs")))
    labels = (label_docs.join(label_tok, "label")
              .select("label",
                      F.round(F.log(F.col("n_docs") /
                                    F.lit(float(n_docs))), digits)
                      .cast(dec).alias("prior"),
                      F.round(F.log(F.lit(float(alpha)) /
                                    (F.col("T") + alpha * n_features)),
                              digits).cast(dec).alias("default_lp")))
    deltas = (counts
              .select("feature", "label",
                      F.round(F.log((F.col("c") + alpha) / alpha),
                              digits).cast(dec).alias("delta")))
    return {"deltas": deltas, "labels": labels,
            "n_features": n_features, "salt": salt, "digits": digits}


def nb_predict(df: DataFrame, model: dict, text_col: str,
               id_col: str, out_col: str = "label_pred") -> DataFrame:
    """Score + argmax. Returns (id_col, out_col, score). The deltas
    and labels tables are broadcast (bounded by the hashing trick);
    the only corpus-keyed aggregations are on (id, feature) and id."""
    posting = _posting(df, [F.col(id_col)], text_col,
                       model["n_features"], model["salt"])
    doc_n = posting.groupBy(id_col).agg(F.sum("tf").alias("n_tok"))
    obs = (posting
           .join(F.broadcast(model["deltas"]), "feature")
           .groupBy(id_col, "label")
           .agg(F.sum(F.col("tf") * F.col("delta")).alias("obs_lp")))
    scores = (doc_n.crossJoin(F.broadcast(model["labels"]))
              .join(obs, [id_col, "label"], "left")
              .select(id_col, "label",
                      (F.col("prior")
                       + F.col("n_tok") * F.col("default_lp")
                       + F.coalesce(F.col("obs_lp"), F.lit(0))
                       ).alias("score")))
    # argmax with a TOTAL order (score, then label) so ties are
    # deterministic and oracle-reproducible: ORDER BY score DESC,
    # label DESC LIMIT 1 per doc on the SQL side.
    best = (scores.groupBy(id_col)
            .agg(F.max_by(
                F.struct(F.col("label").alias("l"),
                         F.col("score").alias("s")),
                F.struct(F.col("score"), F.col("label")))
                 .alias("b")))
    return best.select(id_col,
                       F.col("b.l").alias(out_col),
                       F.col("b.s").alias("score"))


def nb_confusion(df: DataFrame, model: dict, text_col: str,
                 id_col: str, label_col: str) -> DataFrame:
    """Confusion-matrix counts (label, label_pred, n) for a labeled
    eval split — the training-pipeline acceptance check."""
    pred = nb_predict(df, model, text_col, id_col)
    return (df.select(id_col, label_col)
            .join(pred, id_col)
            .groupBy(label_col, "label_pred")
            .agg(F.count(F.lit(1)).alias("n")))


from .._registry import register_op


@register_op("nb_train", "df")
def _nb_train_op(df: DataFrame, *args, **kw):
    return nb_train(df, *args, **kw)


@register_op("nb_predict", "df")
def _nb_predict_op(df: DataFrame, model, *args, **kw):
    return nb_predict(df, model, *args, **kw)
