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
