"""BPE trainer/applier vs a pure-Python reference implementation."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from zef_spark.pipeline.tokenizer import (EOW, apply_bpe, learn_bpe,
                                          tokenize_words)


# ---------------------------------------------------------- reference

def ref_word_counts(texts):
    c = Counter()
    for t in texts:
        c.update(w for w in re.split(r"\W+", t.lower()) if w)
    return c


def ref_learn(texts, n_merges):
    vocab = {tuple(list(w) + [EOW]): n
             for w, n in ref_word_counts(texts).items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # max count, ties lexicographic — same rule as learn_bpe
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b))
        new = {}
        for syms, cnt in vocab.items():
            out = [syms[0]]
            for x in syms[1:]:
                if out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new[tuple(out)] = new.get(tuple(out), 0) + cnt
        vocab = new
    return merges


def ref_apply(word, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    s = list(word) + [EOW]
    while len(s) > 1:
        best = min(
            ((ranks[(s[i], s[i + 1])], i) for i in range(len(s) - 1)
             if (s[i], s[i + 1]) in ranks), default=None)
        if best is None:
            break
        i = best[1]
        s[i:i + 2] = [s[i] + s[i + 1]]
    return s


CORPUS = [
    "the cat sat on the mat",
    "the thin cat that ate the rat",
    "low lower lowest slow slower",
    "new newer newest knew",
    "queue quick quiet quit th th th",
]


# -------------------------------------------------------------- tests

def _corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")


def test_learn_bpe_matches_reference(spark):
    got = learn_bpe(_corpus_df(spark), "text", n_merges=12)
    assert got == ref_learn(CORPUS, 12)


def test_learn_bpe_stops_when_dry(spark):
    df = spark.createDataFrame([(0, "ab cd")], "doc_id long, text string")
    # every pair occurs once -> no merge with freq >= 2
    assert learn_bpe(df, "text", n_merges=5) == []


def test_tokenize_words_matches_reference(spark):
    merges = ref_learn(CORPUS, 10)
    words = sorted(ref_word_counts(CORPUS))
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: r["pieces"]
           for r in tokenize_words(wdf, merges).collect()}
    for w in words:
        assert got[w] == ref_apply(w, merges), w


def test_apply_bpe_roundtrip(spark):
    """Pieces re-concatenate to the original words, in order."""
    merges = ref_learn(CORPUS, 10)
    out = apply_bpe(_corpus_df(spark), "text", merges)
    rows = {r["doc_id"]: r for r in out.collect()}
    for i, t in enumerate(CORPUS):
        rebuilt = "".join(rows[i]["bpe_tokens"]).replace(EOW, " ").strip()
        assert rebuilt == " ".join(w for w in re.split(r"\W+", t.lower()) if w)
        assert rows[i]["n_bpe"] == len(rows[i]["bpe_tokens"])


def test_apply_bpe_scales_by_vocab_not_corpus(spark):
    """The pandas tokenizer runs over DISTINCT words only and the
    corpus side joins against a broadcast — verify the plan."""
    merges = [("t", "h"), ("th", "e" + EOW)]
    plan = (apply_bpe(_corpus_df(spark), "text", merges)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def ref_learn_batched(texts, n_merges, batch_k):
    """Batched reference: same select_batch rule as the trainer."""
    from zef_spark.pipeline.tokenizer import select_batch
    vocab = {tuple(list(w) + [EOW]): n
             for w, n in ref_word_counts(texts).items()}
    merges = []
    while len(merges) < n_merges:
        k = min(batch_k, n_merges - len(merges))
        pairs = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        top = sorted(((a, b, n) for (a, b), n in pairs.items()),
                     key=lambda t: (-t[2], t[0], t[1]))[:max(4 * k, k)]
        batch = select_batch(top, k)
        if not batch:
            break
        merges.extend(batch)
        for a, b in batch:
            new = {}
            for syms, cnt in vocab.items():
                out = [syms[0]]
                for x in syms[1:]:
                    if out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                new[tuple(out)] = new.get(tuple(out), 0) + cnt
            vocab = new
    return merges


def test_learn_bpe_batched_matches_batched_reference(spark):
    got = learn_bpe(_corpus_df(spark), "text", n_merges=12, batch_k=4)
    assert got == ref_learn_batched(CORPUS, 12, 4)
    # batch_k=1 stays exactly sequential Sennrich
    assert learn_bpe(_corpus_df(spark), "text", n_merges=12,
                     batch_k=1) == ref_learn(CORPUS, 12)


def test_select_batch_disjointness():
    from zef_spark.pipeline.tokenizer import select_batch
    top = [("a", "b", 10), ("b", "c", 9),   # shares 'b' -> skipped
           ("x", "y", 8), ("ab", "z", 7),   # 'ab' == concat of #1 -> skipped
           ("p", "q", 6), ("m", "n", 1)]    # count < 2 -> stop
    assert select_batch(top, 5) == [("a", "b"), ("x", "y"), ("p", "q")]


def test_apply_bpe_keeps_empty_and_duplicate_rows(spark):
    """A row whose text has no \\w+ token yields an EMPTY piece array
    (not dropped), and fully-duplicate rows each survive."""
    merges = [("t", "h")]
    df = spark.createDataFrame(
        [(1, "the the"), (1, "the the"), (2, "!!! ---"), (3, "")],
        "doc_id long, text string")
    out = apply_bpe(df, "text", merges).collect()
    assert len(out) == 4
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 2           # duplicates NOT collapsed
    assert all(r["n_bpe"] == 6 for r in by_doc[1])
    assert by_doc[2][0]["bpe_tokens"] == []
    assert by_doc[2][0]["n_bpe"] == 0
    assert by_doc[3][0]["bpe_tokens"] == []


def test_piece_vocab_and_encode_ids(spark):
    from zef_spark.pipeline.tokenizer import encode_ids, piece_vocab
    merges = [("t", "h")]
    df = spark.createDataFrame(
        [(1, "the the cat"), (2, "that hat")],
        "doc_id long, text string")
    vocab = {r.piece: (r.piece_id, r.freq)
             for r in piece_vocab(df, "text", merges).collect()}
    # pieces: the->[th,e,</w>]x2, cat->[c,a,t,</w>],
    # that->[th,a,t,</w>], hat->[h,a,t,</w>]  (EOW merges only when a
    # learned merge joins it)
    assert vocab["th"][1] == 3 and vocab["a"][1] == 3
    assert vocab[EOW][1] == 5   # the(2)+cat+that+hat
    # ids dense from 0, ordered by (freq desc, piece)
    ids = sorted(v[0] for v in vocab.values())
    assert ids == list(range(len(vocab)))
    out = {r.doc_id: r for r in
           encode_ids(df, "text", merges).collect()}
    # ids decode back to the exact piece sequence
    rev = {v[0]: p for p, v in vocab.items()}
    assert [rev[i] for i in out[1].token_ids] == \
        ["th", "e", EOW, "th", "e", EOW, "c", "a", "t", EOW]
    # frozen external vocab: unknown pieces -> -1
    from pyspark.sql import functions as F
    frozen = piece_vocab(df.where("doc_id = 1"), "text", merges)
    out2 = {r.doc_id: r for r in
            encode_ids(df, "text", merges, vocab=frozen).collect()}
    assert -1 in out2[2].token_ids          # 'h' never seen in doc 1
