"""Corpus-construction operators (pipeline/corpus.py): dup clustering,
deterministic sampling, sequence packing, tf-idf."""

from pyspark.sql import functions as F

from zef_spark.pipeline.corpus import (dedup_keep_representative,
                                       dup_clusters, hash_sample,
                                       pack_sequences,
                                       stratified_hash_sample, tf_idf)


def test_dup_clusters_components(spark):
    # two components {1,2,3} (chain) and {10,11}; 99 isolated (absent)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    got = {r.id: r.cluster for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dup_clusters_deep_chain_converges(spark):
    # a path graph needs multiple propagation rounds
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long")
    got = dup_clusters(pairs)
    assert got.select("cluster").distinct().count() == 1
    assert got.count() == n + 1


def test_dedup_keep_representative(spark):
    docs = spark.range(6).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in
                  dedup_keep_representative(docs, pairs).collect())
    assert kept == [0, 3, 4]   # drop 1,2 (cluster 0) and 5 (cluster 4)


def test_hash_sample_deterministic_and_consistent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = hash_sample(docs, 16, 64, "doc_id", salt="s").select("doc_id")
    b = hash_sample(docs, 16, 64, "doc_id", salt="s").select("doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    n = a.count()
    total = docs.count()
    assert 0.15 * total < n < 0.35 * total   # ~25% ± slack
    # nesting: a 8/64 sample with the same salt is a subset of 16/64
    sub = hash_sample(docs, 8, 64, "doc_id", salt="s").select("doc_id")
    assert sub.exceptAll(a).count() == 0
    # md5 method agrees with itself and samples a similar fraction
    m = hash_sample(docs, 16, 64, "doc_id", salt="s", method="md5")
    assert 0.15 * total < m.count() < 0.35 * total


def test_stratified_hash_sample(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    keep_all, thin = langs[0], langs[1]
    out = stratified_hash_sample(
        docs, "doc_id", "lang",
        rates={keep_all: (64, 64), thin: (8, 64)})
    n_all = docs.where(F.col("lang") == keep_all).count()
    assert out.where(F.col("lang") == keep_all).count() == n_all
    n_thin_base = docs.where(F.col("lang") == thin).count()
    n_thin = out.where(F.col("lang") == thin).count()
    assert n_thin < n_thin_base * 0.4
    # strata without a rate and no default are dropped
    assert out.select("lang").distinct().count() == 2


def test_mixture_sample_exact_and_rate(spark, sf_dir):
    from zef_spark.pipeline.corpus import mixture_sample
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weights = {"src0": 3.0, "src1": 1.0}
    # exact mode: floor allocation per stratum, capped by availability
    out = mixture_sample(docs, "source", "doc_id", weights, total=20,
                         salt="t", exact=True)
    by_src = {r[0]: r[1] for r in
              out.groupBy("source").count().collect()}
    assert by_src == {"src0": 15, "src1": 5}
    # determinism: same call, same rows
    out2 = mixture_sample(docs, "source", "doc_id", weights, total=20,
                          salt="t", exact=True)
    assert out.exceptAll(out2).count() == 0
    # unlisted strata dropped
    assert out.select("source").distinct().count() == 2
    # rate mode: row-local decision, counts near target (small-n slack)
    rate = mixture_sample(docs, "source", "doc_id", weights, total=20,
                          salt="t")
    by_src_r = {r[0]: r[1] for r in
                rate.groupBy("source").count().collect()}
    assert set(by_src_r) <= {"src0", "src1"}
    assert sum(by_src_r.values()) <= 25  # never wildly over target
    # rate-mode plan never shuffles data rows: scan + filter only
    plan = rate._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_split_corpus(spark, sf_dir):
    from zef_spark.pipeline.corpus import split_corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = split_corpus(docs, "doc_id",
                       {"train": 0.8, "val": 0.1, "test": 0.1},
                       salt="s")
    n = docs.count()
    by = {r[0]: r[1] for r in out.groupBy("split").count().collect()}
    assert set(by) <= {"train", "val", "test"}
    assert sum(by.values()) == n           # exactly one label per row
    assert by["train"] > 0.6 * n           # ~80% ± hash noise
    # deterministic and key-consistent: same key → same split
    again = split_corpus(docs, "doc_id",
                         {"train": 0.8, "val": 0.1, "test": 0.1},
                         salt="s")
    assert out.select("doc_id", "split") \
        .exceptAll(again.select("doc_id", "split")).count() == 0
    # row-local: no shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_invariants(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 200), (4, 999), (5, 50)],
        "doc_id long, n_tokens long")
    out = pack_sequences(df, "doc_id", "n_tokens", 512) \
        .orderBy("doc_id").collect()
    # capped cumsum: 100, 400, 600, 1112, 1162
    assert [r.pack_id for r in out] == [0, 0, 1, 2, 2]
    for r in out:
        assert 0 <= r.pack_offset < 512
    # oversized doc (999 > 512) is capped into exactly one window
    assert out[3].pack_offset == 88   # 1112 - 512 = 600 → 600 % 512


def test_tf_idf_weights(spark):
    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"),
         (3, "cherry cherry durian")],
        "doc_id long, text string")
    rows = tf_idf(df, "doc_id", "text").collect()
    by = {(r.doc_id, r.token): r for r in rows}
    assert by[(1, "apple")].tf == 2 and by[(1, "apple")].df == 1
    assert by[(2, "banana")].df == 2
    # rarer token outweighs a common one at equal tf
    assert by[(2, "cherry")].tf_idf == by[(2, "banana")].tf_idf or \
        by[(1, "apple")].tf_idf > by[(1, "banana")].tf_idf
    # top_k keeps the k best per doc
    top = tf_idf(df, "doc_id", "text", top_k=1)
    assert top.count() == 3
    assert {r.doc_id for r in top.collect()} == {1, 2, 3}


def test_pack_sequences_sharded(spark):
    """shard_col packs within shards with globally unique pack_ids;
    the window exchange is hash-partitioned on the shard (2+ input
    partitions survive), not a single global sort partition."""
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [("a", 1, 300), ("a", 2, 300), ("a", 3, 100),
         ("b", 10, 500), ("b", 11, 500)],
        "shard string, doc_id long, n_tokens long")
    out = pack_sequences(df, "doc_id", "n_tokens", 512,
                         shard_col="shard")
    rows = {r.doc_id: r for r in out.collect()}
    # shard a: cum 300, 600, 700 -> local packs 0, 1, 1
    # shard b: cum 500, 1000    -> local packs 0, 1, offset by a's 2
    assert [rows[i].pack_id for i in (1, 2, 3)] == [0, 1, 1]
    assert [rows[i].pack_id for i in (10, 11)] == [2, 3]
    assert rows[10].pack_offset == 0 and rows[11].pack_offset == 500 % 512
    # pack_ids globally unique across shards and dense from 0
    assert sorted({r.pack_id for r in rows.values()}) == [0, 1, 2, 3]
    # plan: the big window partitions by shard (hashpartitioning),
    # no single-partition global sort on the payload path
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(shard" in plan


def test_tf_idf_no_eager_collect(spark):
    """The corpus total enters via a 1-row broadcast crossJoin — the
    whole tf_idf is ONE lazy plan (building it triggers no job)."""
    df = spark.createDataFrame(
        [(1, "apple banana"), (2, "banana cherry")],
        "doc_id long, text string")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    out = tf_idf(df, "doc_id", "text")   # no action yet
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan
    assert out.count() == 4


def test_pack_sequences_zero_token_leading_docs(spark):
    """Zero-token docs before the first real token land in pack 0
    (not -1), and sharded pack counts stay collision-free."""
    df = spark.createDataFrame(
        [("a", 1, 0), ("a", 2, 0), ("a", 3, 600),
         ("b", 10, 0), ("b", 11, 100)],
        "shard string, doc_id long, n_tokens long")
    g = {r.doc_id: r.pack_id for r in
         pack_sequences(df, "doc_id", "n_tokens", 512).collect()}
    assert g[1] == 0 and g[2] == 0 and min(g.values()) >= 0
    s = {r.doc_id: r.pack_id for r in
         pack_sequences(df, "doc_id", "n_tokens", 512,
                        shard_col="shard").collect()}
    assert min(s.values()) >= 0
    # shard a spans packs {0}, so shard b starts at 1 — no collision
    assert s[10] == s[11] and s[10] > max(s[1], s[2], s[3]) - 1
    a_packs = {s[1], s[2], s[3]}
    b_packs = {s[10], s[11]}
    assert a_packs.isdisjoint(b_packs)


def test_tfidf_topterms_ranks_rare_terms(spark):
    from zef_spark.pipeline.corpus import tfidf_topterms
    docs = spark.createDataFrame(
        [(1, "common common rare"), (2, "common other"),
         (3, "common thing")],
        "doc_id long, text string")
    out = tfidf_topterms(docs, "doc_id", "text", k=2).collect()
    d1 = {r["rank"]: r["term"] for r in out if r["doc_id"] == 1}
    # 'rare' (df=1) outranks 'common' (df=3 -> idf 0) despite tf=2
    assert d1[1] == "rare"
    # idf of an everywhere-term is ln(1)=0 -> score 0
    z = [r for r in out if r["term"] == "common"]
    assert all(r["score"] == 0.0 for r in z)
