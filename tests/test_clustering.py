"""Embedding clustering (pipeline/clustering.py)."""

from pyspark.sql import functions as F

from zef_spark.pipeline.clustering import (cluster_balanced_sample,
                                           kmeans_assign)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_kmeans_assignment_invariants(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = kmeans_assign(emb, "embedding", "vec_id", k=4, n_iter=1)
    assert out.count() == emb.count()
    cl = [r.cluster for r in out.select("cluster").distinct().collect()]
    assert all(1 <= c <= 4 for c in cl) and len(cl) >= 2
    assert out.where(F.col("dist") < 0).count() == 0
    # deterministic: same call, same assignment
    out2 = kmeans_assign(emb, "embedding", "vec_id", k=4, n_iter=1)
    assert out.exceptAll(out2).count() == 0


def test_kmeans_iterations_tighten_clusters(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    d0 = kmeans_assign(emb, "embedding", "vec_id", k=4, n_iter=0) \
        .agg(F.sum("dist")).collect()[0][0]
    d2 = kmeans_assign(emb, "embedding", "vec_id", k=4, n_iter=2) \
        .agg(F.sum("dist")).collect()[0][0]
    # Lloyd's is monotone non-increasing in total within-cluster dist
    assert d2 <= d0 + 1e-6


def test_pq_encode_and_adc_topk(spark, sf_dir):
    from pyspark.sql import functions as F
    from zef_spark.pipeline.similarity import (brute_force_topk,
                                               pq_encode, pq_topk)
    emb = _emb(spark, sf_dir).withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    codes = pq_encode(emb, "embedding", "vec_id", dim=64)
    row = codes.first()
    assert len(row.pq_code) == 8
    assert all(0 <= c < 16 for c in row.pq_code)
    q = [float(x) for x in emb.where("vec_id = 0")
         .select("embedding").first()[0]]
    top = pq_topk(codes, q, "vec_id", k=10).collect()
    assert len(top) == 10
    # ADC distances are sorted ascending
    ds = [r.pq_dist for r in top]
    assert ds == sorted(ds)
    # sanity: PQ recall overlaps the exact top-10 (coarse quantizer,
    # not exact — require non-trivial overlap, not equality)
    exact = {r.vec_id for r in
             brute_force_topk(emb, "embedding", "vec_id", q, 10).collect()}
    assert len({r.vec_id for r in top} & exact) >= 1


def test_cluster_balanced_sample(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = cluster_balanced_sample(emb, "embedding", "vec_id",
                                  per_cluster=5, k=4, n_iter=1)
    sizes = [r.n for r in out.groupBy("cluster")
             .agg(F.count(F.lit(1)).alias("n")).collect()]
    assert all(s <= 5 for s in sizes) and len(sizes) >= 2
    assert set(out.columns) >= set(emb.columns)
