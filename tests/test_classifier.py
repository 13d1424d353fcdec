"""Naive Bayes hashed-feature classifier (pipeline/classifier.py):
learns discriminative vocabulary, respects priors on uninformative
text, and its scores are partition-order-deterministic."""

import pyspark.sql.functions as F
import pytest

from zef_spark.pipeline.classifier import (nb_confusion, nb_predict,
                                           nb_train)


def _corpus(spark):
    rows = []
    # two classes with disjoint marker vocab + shared filler
    for i in range(40):
        rows.append((i, "spam buy cheap offer click filler common", "spam"))
    for i in range(40, 80):
        rows.append((i, "ham meeting notes agenda report filler common", "ham"))
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def test_learns_disjoint_vocab(spark):
    docs = _corpus(spark)
    m = nb_train(docs, "text", "label", n_features=512)
    test = spark.createDataFrame(
        [(100, "cheap offer click now"), (101, "agenda report meeting")],
        "doc_id long, text string")
    got = {r.doc_id: r.label_pred
           for r in nb_predict(test, m, "text", "doc_id").collect()}
    assert got == {100: "spam", 101: "ham"}


def test_confusion_diagonal(spark):
    docs = _corpus(spark)
    m = nb_train(docs, "text", "label", n_features=512)
    cm = nb_confusion(docs, m, "text", "doc_id", "label").collect()
    assert {(r.label, r.label_pred, r.n) for r in cm} == {
        ("spam", "spam", 40), ("ham", "ham", 40)}


def test_prior_fallback_on_unseen_text(spark):
    # doc of entirely unseen tokens -> every feature falls through to
    # default_lp; the majority-prior class must win
    rows = ([(i, "alpha beta", "big") for i in range(30)]
            + [(100 + i, "alpha beta", "small") for i in range(10)])
    docs = spark.createDataFrame(rows, "doc_id long, text string, label string")
    m = nb_train(docs, "text", "label", n_features=512)
    test = spark.createDataFrame([(999, "zz qq ww")], "doc_id long, text string")
    [r] = nb_predict(test, m, "text", "doc_id").collect()
    assert r.label_pred == "big"


def test_scores_partition_invariant(spark):
    docs = _corpus(spark)
    m = nb_train(docs, "text", "label", n_features=512)
    a = nb_predict(docs.repartition(1), m, "text", "doc_id")
    b = nb_predict(docs.repartition(17), m, "text", "doc_id")
    sa = {(r.doc_id, r.label_pred, str(r.score)) for r in a.collect()}
    sb = {(r.doc_id, r.label_pred, str(r.score)) for r in b.collect()}
    assert sa == sb
