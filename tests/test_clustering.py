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


def test_cluster_balanced_sample(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = cluster_balanced_sample(emb, "embedding", "vec_id",
                                  per_cluster=5, k=4, n_iter=1)
    sizes = [r.n for r in out.groupBy("cluster")
             .agg(F.count(F.lit(1)).alias("n")).collect()]
    assert all(s <= 5 for s in sizes) and len(sizes) >= 2
    assert set(out.columns) >= set(emb.columns)
