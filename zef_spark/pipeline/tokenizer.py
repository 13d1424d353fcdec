"""Distributed BPE tokenizer: learn merge rules over a corpus and
apply them — the two halves of preparing text for LM training that
the count-only ops in pipeline/text.py stop short of.

Algorithm (Sennrich et al. 2016, word-internal BPE):

- ``learn_bpe``: pre-tokenize to words, then aggregate to the DISTINCT
  word table with counts — the single corpus-sized shuffle. Every
  merge iteration after that runs on the distinct-word table only
  (vocabulary-sized, millions of rows at 100 TB — NOT corpus-sized):
  one pair-count aggregate to find the best pair (weighted by word
  frequency, ties broken lexicographically for determinism), then a
  row-local merge rewrite. Lineage is cut with localCheckpoint every
  few iterations so n_merges doesn't stack n plans.
- ``apply_bpe``: tokenize the DISTINCT words once with the learned
  merges (an Arrow-batched pandas iterator over the vocab table — the
  classic per-word merge loop, vocabulary-sized work), then map the
  corpus through a broadcast word→pieces join. Corpus rows are
  touched exactly once, by a hash join against a small dict side.

This mirrors how production pipelines tokenize at scale: tokenizing
each distinct word once and joining beats re-running BPE per
occurrence by the corpus/vocab ratio (often 1000x).

No SQL oracle: BPE is iterative with a data-dependent argmax per
round, outside DuckDB's vocabulary. Verified instead against a
pure-Python reference implementation in tests/test_tokenizer.py
(exact merge-table and tokenization equality).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..ops.core import register_op

#: end-of-word marker (standard BPE: keeps word-final pieces distinct)
EOW = "</w>"


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Distinct lowercase \\w+ words with corpus frequencies.
    The ONE corpus-sized shuffle in the whole trainer."""
    words = df.select(F.explode(F.expr(
        rf"filter(split(lower({text_col}), '\\W+'), x -> x <> '')"
    )).alias("word"))
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def learn_bpe(df: DataFrame, text_col: str, n_merges: int = 50,
              checkpoint_every: int = 8) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus. Returns the
    ordered merge list [(left_symbol, right_symbol), ...].

    The per-iteration aggregate is vocabulary-sized; the driver pulls
    back ONE row per iteration (the argmax pair) — no .collect() of
    data tables. Deterministic: ties on count break on the pair's
    lexicographic order.
    """
    vocab = _word_counts(df, text_col)
    # word -> its current symbol sequence: chars + end-of-word marker
    syms = vocab.select(
        "freq",
        F.concat(F.expr("split(word, '')"),
                 F.array(F.lit(EOW))).alias("s"))
    syms = syms.localCheckpoint()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        # adjacent-pair counts, weighted by word frequency
        pairs = syms.select(
            "freq", F.explode(F.expr(
                "transform(slice(s, 1, size(s) - 1), "
                "(x, i) -> struct(x as a, s[i + 1] as b))")).alias("p"))
        best = (pairs.groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.col("n").desc(), "a", "b")
                .limit(1).collect())
        if not best or best[0]["n"] < 2:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        # row-local rewrite: left-to-right fold collapsing adjacent
        # (a, b) into a+b. Matches the reference greedy scan including
        # overlaps ([a,a,a] with merge (a,a) -> [aa, a]): after a
        # merge the new last symbol is a+b, which can never equal a
        # again (b is non-empty), so the fold can't double-consume.
        # Symbols are \w chars or the EOW marker — no quoting needed.
        merged = F.expr(
            "aggregate(slice(s, 2, size(s) - 1), array(s[0]), (acc, x) -> "
            f"IF(element_at(acc, -1) = '{a}' AND x = '{b}', "
            "concat(slice(acc, 1, size(acc) - 1), "
            f"array(concat('{a}', '{b}'))), concat(acc, array(x))))")
        syms = syms.select("freq", merged.alias("s"))
        if (i + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint()
    return merges


def _bpe_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference greedy BPE application for one word (best-rank merge
    first; left-to-right within a rank)."""
    s = list(word) + [EOW]
    while len(s) > 1:
        best_rank, best_i = None, None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        s[best_i:best_i + 2] = [s[best_i] + s[best_i + 1]]
    return s


def tokenize_words(words: DataFrame, merges: list[tuple[str, str]],
                   word_col: str = "word") -> DataFrame:
    """word -> array<string> pieces for each DISTINCT word (the
    vocabulary-sized half of apply_bpe). Arrow-batched pandas
    iterator; `merges` ships once per executor via closure."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    fields = ", ".join(f"{c} {t}" for c, t in words.dtypes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["pieces"] = [
                _bpe_word(w, ranks) for w in pdf[word_col]]
            yield pdf

    return words.mapInPandas(run, f"{fields}, pieces array<string>")


def apply_bpe(df: DataFrame, text_col: str,
              merges: list[tuple[str, str]],
              out_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize ``text_col`` into BPE pieces: distinct words are
    tokenized once (vocab-sized pandas work), then the corpus maps
    through a broadcast word→pieces join and a row-local re-assembly
    in original word order. Adds ``out_col`` array<string> and
    ``n_bpe`` count."""
    words = df.select(F.posexplode(F.expr(
        rf"filter(split(lower({text_col}), '\\W+'), x -> x <> '')"
    ).alias("word")).alias("pos", "word"), "*")
    vocab = tokenize_words(words.select("word").distinct(), merges)
    keys = [c for c in df.columns]
    joined = words.join(F.broadcast(vocab), "word")
    return (joined.groupBy(*keys)
            .agg(F.flatten(F.array_sort(F.collect_list(
                F.struct("pos", "pieces"))).pieces).alias(out_col))
            .withColumn("n_bpe", F.size(out_col)))


@register_op("apply_bpe", "df")
def _apply_bpe(df, text_col, merges, out_col="bpe_tokens"):
    return apply_bpe(df, text_col, merges, out_col)
