"""Incremental MinHash index (pipeline/dedup.py): persisted corpus
index, new-batch probe, and the append-on-ingest lifecycle."""

import pyspark.sql.functions as F

from zef_spark.pipeline.dedup import (build_minhash_index,
                                      incremental_ingest,
                                      incremental_minhash_pairs)

BASE = "the quick brown fox jumps over the lazy dog again and again "


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_finds_cross_set_dup(spark, tmp_path):
    corpus = _df(spark, [(1, BASE * 4), (2, "completely different words "
                                            "about spark and parquet " * 4)])
    batch = _df(spark, [(10, BASE * 4 + "tail"), (11, "unrelated " * 30)])
    path = str(tmp_path / "idx")
    build_minhash_index(corpus, "text", "doc_id", path)
    pairs = incremental_minhash_pairs(batch, path, "text", "doc_id",
                                      jaccard_threshold=0.4).collect()
    assert {(r.new_id, r.old_id) for r in pairs} == {(10, 1)}
    assert all(r.jaccard >= 0.4 for r in pairs)


def test_ingest_appends_survivors(spark, tmp_path):
    corpus = _df(spark, [(1, BASE * 4)])
    path = str(tmp_path / "idx")
    build_minhash_index(corpus, "text", "doc_id", path)
    batch = _df(spark, [
        (10, BASE * 4),                      # dup of corpus doc 1 -> dropped
        (11, "fresh novel content xyz " * 10),   # survivor
        (12, "fresh novel content xyz " * 10 + "z"),  # intra-batch dup of 11
    ])
    survivors = incremental_ingest(batch, path, "text", "doc_id",
                                   jaccard_threshold=0.4)
    assert [r.doc_id for r in survivors.collect()] == [11]
    # the survivor is now part of the index: probing it again dedups
    again = incremental_minhash_pairs(
        _df(spark, [(20, "fresh novel content xyz " * 10)]),
        path, "text", "doc_id", jaccard_threshold=0.4).collect()
    assert {(r.new_id, r.old_id) for r in again} == {(20, 11)}


def test_param_meta_roundtrip(spark, tmp_path):
    corpus = _df(spark, [(1, BASE * 4)])
    path = str(tmp_path / "idx")
    build_minhash_index(corpus, "text", "doc_id", path,
                        num_perm=32, bands=8, k=4)
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    assert (meta.num_perm, meta.bands, meta.k) == (32, 8, 4)
    # probe must run with the stored params (no mismatch possible)
    pairs = incremental_minhash_pairs(
        _df(spark, [(10, BASE * 4)]), path, "text", "doc_id",
        jaccard_threshold=0.5).collect()
    assert {(r.new_id, r.old_id) for r in pairs} == {(10, 1)}
