"""Text analysis operators for corpus pipelines — all row-local Column
expressions (whole-stage codegen, zero shuffle, no Python UDFs):
language ID (marker-word heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting (shingle hash).

Extends the reference's data-wrangling surface
(python/zef/core/op_implementations/data_wrangling.py) to corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# deterministic marker-word lists (tiny, inlined as literals)
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour"],
    "es": ["el", "la", "los", "que", "es", "una", "con", "para"],
}


def _tokens(col):
    return F.filter(F.split(F.lower(col), r"\W+"), lambda t: t != "")


def lang_id(df: DataFrame, text_col: str,
            out_col: str = "lang_pred") -> DataFrame:
    """Predict language by marker-word hit count; ties break by
    language name order (deterministic). Unknown → 'und'."""
    toks = _tokens(F.col(text_col))
    scores = []
    for lang in sorted(_LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        scores.append(F.struct(score.alias("score"),
                               F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    pred = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn(out_col, pred)


def token_count(df: DataFrame, text_col: str,
                out_col: str = "n_tokens") -> DataFrame:
    """Whitespace token count."""
    return df.withColumn(out_col, F.size(_tokens(F.col(text_col))))


def bpe_ish_token_count(df: DataFrame, text_col: str,
                        out_col: str = "n_bpe_tokens") -> DataFrame:
    """BPE-ish proxy: word-piece regex (word chars runs, digits,
    punctuation each count) — a deterministic stand-in for a real
    tokenizer (~chars/4 heuristic avoided in favor of piece counting)."""
    pieces = F.filter(
        F.split(F.col(text_col), r"(?<=\W)|(?=\W)"),
        lambda t: F.trim(t) != "")
    return df.withColumn(out_col, F.size(pieces))


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Adds length / ratio features + a composite quality score in
    [0,1]: penalizes very short docs, high punctuation density, low
    stopword ratio (classic C4/Gopher-style filters, simplified)."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_chars = F.length(text)
    n_tok = F.size(toks)
    stop = F.array(*[F.lit(m) for ms in _LANG_MARKERS.values() for m in ms])
    stop_ratio = F.when(n_tok > 0,
                        F.size(F.filter(toks,
                                        lambda t: F.array_contains(stop, t)))
                        / n_tok).otherwise(F.lit(0.0))
    punct = F.length(F.regexp_replace(text, r"[^\p{Punct}]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    mean_word_len = F.when(n_tok > 0,
                           F.aggregate(toks, F.lit(0),
                                       lambda a, t: a + F.length(t)) / n_tok
                           ).otherwise(F.lit(0.0))
    score = (F.least(n_tok / F.lit(50.0), F.lit(1.0)) * 0.3
             + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
             + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.2
             + alpha_ratio * 0.2)
    return (df.withColumn("n_chars_computed", n_chars)
              .withColumn("n_tokens", n_tok)
              .withColumn("stopword_ratio", F.round(stop_ratio, 6))
              .withColumn("punct_ratio", F.round(punct_ratio, 6))
              .withColumn("alpha_ratio", F.round(alpha_ratio, 6))
              .withColumn("mean_word_len", F.round(mean_word_len, 6))
              .withColumn("quality", F.round(score, 6)))


def fingerprint(df: DataFrame, text_col: str,
                out_col: str = "fingerprint", k: int = 8,
                hash_fn: str = "xxhash64") -> DataFrame:
    """Document fingerprint: hash of the lexicographically minimal
    k-shingle of the normalized text (rolling-hash winnowing, w=∞) —
    robust to reordering-free edits at the margins; row-local.
    hash_fn: 'xxhash64' (fast, JVM) or 'md5' (portable hex)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    n = F.greatest(F.length(norm) - k + 1, F.lit(1))
    sh = F.transform(F.sequence(F.lit(1), n),
                     lambda i: F.substring(norm, i, k))
    h = F.xxhash64 if hash_fn == "xxhash64" else F.md5
    return df.withColumn(out_col, h(F.array_min(sh)))
