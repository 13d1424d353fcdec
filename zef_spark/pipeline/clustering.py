"""Embedding clustering for corpus curation (cluster-balanced
sampling, semantic dedup groups, IVF centroid training).

``kmeans_assign`` is Lloyd's algorithm in the classic Spark shape:
centroids live on the driver (k × dim values — tiny by definition)
and are embedded as literal arrays into a codegen'd argmin projection,
so the per-iteration cost is ONE distributed aggregation over the
corpus plus a bounded k×dim collect. No Python touches rows.

Determinism (so a fixed-iteration run is oracle-checkable in another
engine): init centroids are the embeddings of the k smallest ids;
per-dimension means accumulate in DECIMAL (exact, order-independent)
then round to 6 digits; distances round to `digits` before the
argmin, ties resolving to the lowest cluster index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import _dot


def _sq_dist(vec_col, cent: list[float]):
    """||v-c||^2 = v.v - 2 v.c + c.c with the same fold structure the
    oracle uses (three dot products, not an elementwise zip) so the
    double rounding behaves identically."""
    c = F.array(*[F.lit(float(x)) for x in cent])
    cc = sum(x * x for x in cent)
    return _dot(vec_col, vec_col) - 2.0 * _dot(vec_col, c) + F.lit(cc)


def _assign_col(vec_col, cents: list[list[float]], digits: int):
    dists = F.array(*[F.round(_sq_dist(vec_col, c), digits)
                      for c in cents])
    return F.array_position(dists, F.array_min(dists)).cast("int")


def kmeans_assign(df: DataFrame, vec_col: str, id_col: str, k: int = 8,
                  n_iter: int = 2, digits: int = 4) -> DataFrame:
    """(id, cluster, dist): Lloyd's k-means for `n_iter` iterations,
    then the final assignment. cluster ∈ 1..k. An empty cluster keeps
    its previous centroid (standard fallback)."""
    if k > 256:
        raise ValueError("k>256: centroids are driver-side literals; "
                         "use a sampled/minibatch trainer at that size")
    v = F.col(vec_col)
    init_rows = (df.orderBy(id_col).limit(k)
                 .select(F.transform(v, lambda x: x.cast("double")))
                 .collect())
    cents = [[float(x) for x in r[0]] for r in init_rows]
    dim = len(cents[0])
    for _ in range(n_iter):
        assign = _assign_col(v, cents, digits)
        # exact decimal accumulation → order-independent means
        stats = (df.select(assign.alias("__c"),
                           F.posexplode(F.transform(
                               v, lambda x: x.cast("double"))))
                 .groupBy("__c", "pos")
                 .agg((F.sum(F.col("col").cast("decimal(30,15)"))
                       .cast("double") /
                       F.count(F.lit(1))).alias("m"))
                 .collect())
        by_c: dict[int, dict[int, float]] = {}
        for r in stats:
            by_c.setdefault(r["__c"], {})[r["pos"]] = r["m"]
        cents = [[round(by_c[c + 1][p], 6) for p in range(dim)]
                 if (c + 1) in by_c else cents[c]
                 for c in range(k)]
    assign = _assign_col(v, cents, digits)
    dists = F.array(*[F.round(_sq_dist(v, c), digits) for c in cents])
    return df.select(F.col(id_col),
                     assign.alias("cluster"),
                     F.array_min(dists).alias("dist"))


def cluster_balanced_sample(df: DataFrame, vec_col: str, id_col: str,
                            per_cluster: int, k: int = 8,
                            n_iter: int = 2) -> DataFrame:
    """Keep the `per_cluster` members closest to their centroid from
    each k-means cluster — the diversity-preserving downsampler
    (coreset-style corpus curation). One window shuffle after the
    k-means aggregation rounds."""
    from pyspark.sql import Window
    assigned = kmeans_assign(df, vec_col, id_col, k=k, n_iter=n_iter)
    w = Window.partitionBy("cluster").orderBy("dist", id_col)
    keep = (assigned.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= per_cluster)
            .select(id_col, "cluster"))
    return df.join(keep, id_col)
