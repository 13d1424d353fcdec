"""Gopher hard-threshold rules and C4 line cleaning
(pipeline/text.py) on constructed rich text."""

from zef_spark.pipeline.text import c4_line_clean, gopher_rules

GOOD = ("The quick brown fox jumps over the lazy dog and runs far. "
        * 12)  # ~120 words, has 'the'/'and', all alpha words


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_keeps_good_prose(spark):
    [r] = gopher_rules(_df(spark, [(1, GOOD)]), "text").collect()
    assert r.gopher_keep == 1
    assert r.g_n_words >= 50 and r.g_stop_hits >= 2
    assert 3 <= r.g_mean_word_len <= 10
    assert r.g_alpha_word_frac >= 0.8


def test_gopher_rejects_each_rule(spark):
    rows = [
        (1, "too short doc"),                       # < 50 words
        (2, ("# " * 30 + "word ") * 20),            # symbol ratio
        (3, "\n".join("- bullet line" for _ in range(40))
            + "\n" + GOOD),                         # bullet frac
        (4, ("12345 9876 00 11 22 " * 30)),         # alpha word frac
        (5, ("zz qq ww ee rr tt yy uu " * 20)),     # no stopwords
    ]
    got = {r.doc_id: r.gopher_keep
           for r in gopher_rules(_df(spark, rows), "text").collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 0, 5: 0}


def test_c4_keeps_only_terminal_punct_lines(spark):
    text = ("A proper sentence with enough words here.\n"
            "no terminal punctuation on this line\n"
            "Short one.\n"            # < 3 words
            "Another good sentence ends with a question mark?\n"
            "menu | nav | login")
    [r] = c4_line_clean(_df(spark, [(1, text)]), "text").collect()
    assert r.clean_text == (
        "A proper sentence with enough words here.\n"
        "Another good sentence ends with a question mark?")


def test_c4_empty_when_nothing_qualifies(spark):
    [r] = c4_line_clean(_df(spark, [(1, "word salad no punct")]),
                        "text").collect()
    assert r.clean_text == ""


def test_rules_are_shuffle_free(spark):
    """Both ops must stay row-local: no Exchange, no Join — at
    100 TB they pipeline with the scan that feeds them."""
    df = _df(spark, [(1, GOOD)])
    for op in (lambda d: gopher_rules(d, "text"),
               lambda d: c4_line_clean(d, "text")):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan, plan


SPAN8 = "one two three four five six seven eight"


def test_scrub_keeps_canonical_occurrence(spark):
    from zef_spark.pipeline.text import scrub_repeated_spans
    docs = _df(spark, [
        (1, f"intro {SPAN8} outro"),
        (2, f"head {SPAN8} tail"),
        (3, "no repeats in this one at all whatsoever today"),
    ])
    got = {r.doc_id: r.clean_text
           for r in scrub_repeated_spans(docs, "text", "doc_id",
                                         k=8).collect()}
    assert got[1] == f"intro {SPAN8} outro"   # canonical copy kept
    assert got[2] == "head tail"              # scrubbed
    assert got[3].startswith("no repeats")    # untouched


def test_scrub_all_copies_when_keep_first_off(spark):
    from zef_spark.pipeline.text import scrub_repeated_spans
    docs = _df(spark, [(1, f"a {SPAN8} b"), (2, f"c {SPAN8} d")])
    got = {r.doc_id: r.clean_text
           for r in scrub_repeated_spans(docs, "text", "doc_id", k=8,
                                         keep_first=False).collect()}
    assert got == {1: "a b", 2: "c d"}


def test_scrub_never_cuts_mid_word(spark):
    from zef_spark.pipeline.text import scrub_repeated_spans
    # doc 3 contains the span TOKENS as a sub-word prefix pattern:
    # 'xone' must not be clipped by the ' one two ... ' replacement
    docs = _df(spark, [
        (1, f"p {SPAN8} q"),
        (2, f"r {SPAN8} s"),
        (3, f"xone two three four five six seven eight tail pad pad"),
    ])
    got = {r.doc_id: r.clean_text
           for r in scrub_repeated_spans(docs, "text", "doc_id",
                                         k=8).collect()}
    assert got[3].startswith("xone two")


def test_normalize_text_unicode_canon(spark):
    """NFC vs decomposed sequences, accent strip, case, whitespace."""
    import unicodedata
    rows = [
        (0, "Café  du   Monde"),      # e + combining acute
        (1, "Ångström"),          # precomposed A-ring
        (2, "ﬁle"),                    # fi ligature (NFKC-only)
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    from zef_spark.pipeline.text import normalize_text
    out = {r["id"]: r["t"] for r in
           normalize_text(df, "t", form="NFKC", strip_accents=True,
                          lower=True, collapse_ws=True).collect()}
    assert out[0] == "cafe du monde"
    assert out[1] == "angstrom"
    assert out[2] == "file"                  # ligature folded by NFKC
    assert out[3] is None
    # plain NFC: combining sequence composes, content preserved
    nfc = {r["id"]: r["t"] for r in
           normalize_text(df, "t", form="NFC").collect()}
    assert nfc[0] == unicodedata.normalize("NFC", rows[0][1])
    assert "́" not in nfc[0]


def test_code_detect_separates_code_from_prose(spark):
    from zef_spark.pipeline.text import code_detect
    code = ("def main():\n    import os\n    return os.getcwd();\n"
            "    x = {1: 2};\n    print(x)\n")
    prose = ("The afternoon light fell across the valley and the "
             "river moved slowly toward the distant sea.")
    df = spark.createDataFrame([(1, code), (2, prose)],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           code_detect(df, "doc_id", "text").collect()}
    assert out[1]["is_code"] and not out[2]["is_code"]
    assert out[1]["n_code_kw"] >= 3 and out[1]["indent_lines"] >= 3
    assert out[2]["n_code_kw"] == 0 and out[2]["sym_ratio"] < 0.01
