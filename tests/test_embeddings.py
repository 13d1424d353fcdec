"""Embedding utilities (pipeline/embeddings.py): normalization,
mean-pooling exactness, and JL projection distance preservation."""

import math

import pyspark.sql.functions as F
import pytest

from zef_spark.pipeline.embeddings import (l2_normalize, mean_pool,
                                           projection_signs,
                                           random_projection)


def _df(spark, rows, dim):
    return spark.createDataFrame(
        rows, f"id long, vec array<double>")


def test_l2_normalize_unit_norm(spark):
    df = _df(spark, [(1, [3.0, 4.0]), (2, [0.0, 0.0])], 2)
    got = {r.id: r.unit_vec
           for r in l2_normalize(df, "vec").collect()}
    assert got[1] == [0.6, 0.8]
    assert got[2] == [0.0, 0.0]  # zero vector passes through


def test_mean_pool_exact(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, 6.0]), ("b", [5.0, 5.0])],
        "g string, vec array<double>")
    got = {r.g: r.pooled for r in mean_pool(df, "g", "vec").collect()}
    assert got == {"a": [2.0, 4.0], "b": [5.0, 5.0]}


def test_mean_pool_partition_invariant(spark):
    rows = [(f"g{i % 3}", [float(i), float(i * 2), float(i % 7)])
            for i in range(60)]
    df = spark.createDataFrame(rows, "g string, vec array<double>")
    a = sorted(map(tuple, ((r.g, tuple(r.pooled)) for r in
                           mean_pool(df.repartition(1), "g", "vec").collect())))
    b = sorted(map(tuple, ((r.g, tuple(r.pooled)) for r in
                           mean_pool(df.repartition(13), "g", "vec").collect())))
    assert a == b


def test_projection_signs_deterministic():
    assert projection_signs(4, 2) == projection_signs(4, 2)
    assert projection_signs(4, 2, "other") != projection_signs(4, 2)
    assert all(s in (-1, 1)
               for row in projection_signs(8, 3) for s in row)


def test_jl_preserves_relative_distance(spark):
    # two far-apart vs two nearby vectors: the projected distances
    # must preserve the ordering (JL with 16 dims on 64-d input)
    import random
    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    near = [x + 0.01 for x in base]
    far = [-x for x in base]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "id long, vec array<double>")
    proj = {r.id: r.projected
            for r in random_projection(df, "vec", 64, 16).collect()}

    def d(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
    assert d(proj[1], proj[2]) < d(proj[1], proj[3])


def test_ann_index_add_incremental(spark, sf_dir, tmp_path):
    """Appending new vectors lands them in the SAME cell space: a
    probe after the append returns exactly the brute-force top-k over
    the UNION corpus restricted to the probed cells."""
    from zef_spark.pipeline.similarity import (ann_index_add,
                                               ann_topk_indexed,
                                               materialize_ann_index)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    old = emb.where("vec_id % 2 = 0")
    new = emb.where("vec_id % 2 = 1")
    path = str(tmp_path / "ann")
    materialize_ann_index(old, path, "embedding", dim, n_cells=8)
    q = [float((i * 7) % 5 - 2) for i in range(dim)]
    before = ann_topk_indexed(spark, path, "embedding", "vec_id", q,
                              k=5, n_cells=8).collect()
    ann_index_add(new, path, "embedding", dim, n_cells=8)
    after = ann_topk_indexed(spark, path, "embedding", "vec_id", q,
                             k=5, n_cells=8)
    got = {r["vec_id"] for r in after.collect()}
    idx = spark.read.parquet(path)
    assert idx.count() == emb.count()       # nothing lost on append
    # index-FREE recomputation: same quantizer over the raw union,
    # same 2 nearest probe cells, brute-force rerank — must match the
    # probed index exactly
    import pyspark.sql.functions as F
    from zef_spark.pipeline.similarity import (_centroid,
                                               brute_force_topk,
                                               ivf_cell)
    probes = sorted(range(1, 9),
                    key=lambda c: (-sum(a * b for a, b in
                                        zip(q, _centroid(dim, c - 1,
                                                         7))), c))[:2]
    celled = emb.withColumn("__cell",
                            ivf_cell(F.col("embedding"), dim, 8, 7))
    exp = brute_force_topk(celled.where(F.col("__cell").isin(probes)),
                           "embedding", "vec_id", q, 5)
    assert got == {r["vec_id"] for r in exp.collect()}
    # the probe universe only GREW: pre-append results still present
    # in the index (the append moved no existing vector's cell)
    assert {r["vec_id"] for r in before} <= \
        {r["vec_id"] for r in idx.select("vec_id").collect()}


def test_kmeans_assign_separable_and_ties(spark):
    """kmeans_assign recovers trivially separable clusters and is
    invariant to input row order (engine-exact integer arithmetic)."""
    from zef_spark.pipeline.similarity import kmeans_assign
    rows = ([(i, [10.0 + (i % 3) * 0.01, 10.0]) for i in range(10)]
            + [(i, [-10.0, -10.0 - (i % 3) * 0.01])
               for i in range(10, 20)])
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = {r["id"]: r["cluster"]
           for r in kmeans_assign(df, "v", "id", k=2,
                                  n_iter=3).collect()}
    a = {out[i] for i in range(10)}
    b = {out[i] for i in range(10, 20)}
    assert len(a) == 1 and len(b) == 1 and a != b
    # row order / partitioning invariance
    out2 = {r["id"]: r["cluster"]
            for r in kmeans_assign(df.orderBy(F.desc("id"))
                                   .repartition(7), "v", "id",
                                   k=2, n_iter=3).collect()}
    assert out2 == out
    import pytest
    with pytest.raises(ValueError):
        kmeans_assign(df, "v", "id", k=0)
