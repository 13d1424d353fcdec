"""Z-order layout + compaction (pipeline/layout.py): interleave
correctness, measured data-skipping improvement, compaction."""

import pyspark.sql.functions as F
import pytest

from zef_spark.pipeline.layout import (compact_parquet, file_stats,
                                       skipping_ratio, write_z_ordered,
                                       z_order, z_value)


def test_z_value_interleaves_bits(spark):
    # (x=0b11, y=0b00) -> z interleaves as x0 y0 x1 y1 = 0b0101 = 5
    df = spark.createDataFrame([(3, 0)], "x int, y int")
    [r] = df.select(z_value([F.col("x"), F.col("y")], bits=2)
                    .alias("z")).collect()
    assert r.z == 5


def _grid(spark, n=64):
    rows = [(i, j, i * n + j) for i in range(n) for j in range(n)]
    return spark.createDataFrame(rows, "x int, y int, payload long")


def test_zorder_improves_skipping_on_both_columns(spark, tmp_path):
    df = _grid(spark)
    base, zpath = str(tmp_path / "plain"), str(tmp_path / "z")
    # baseline: sorted by x only, same file count
    (df.repartitionByRange(8, "x").sortWithinPartitions("x")
       .write.parquet(base))
    write_z_ordered(df, zpath, ["x", "y"], n_files=8)
    # x-sorted layout skips on x but NOT on y; z-order must skip on
    # BOTH (>= half the files for a 1/8-range predicate)
    sy_base = skipping_ratio(spark, base, "y", 0, 7)
    sy_z = skipping_ratio(spark, zpath, "y", 0, 7)
    sx_z = skipping_ratio(spark, zpath, "x", 0, 7)
    assert sy_base == 0.0
    # single-column sort skips NOTHING on y; the z-layout must skip
    # meaningfully on BOTH axes (8 files on a 2D curve: a 1/8-range
    # slab touches ~sqrt-proportional tiles, not all of them)
    assert sy_z >= 0.3 and sx_z >= 0.3, (sy_base, sy_z, sx_z)
    assert sy_z + sx_z >= 0.8, (sy_z, sx_z)


def test_file_stats_shape(spark, tmp_path):
    df = _grid(spark, 16)
    p = str(tmp_path / "t")
    write_z_ordered(df, p, ["x", "y"], n_files=4)
    st = file_stats(spark.read.parquet(p), ["x", "y"]).collect()
    assert len(st) == 4
    assert all(r.min_x <= r.max_x and r.min_y <= r.max_y for r in st)


def test_compact_parquet(spark, tmp_path):
    p = str(tmp_path / "frag")
    df = spark.range(1000).withColumn("v", F.rand(7))
    df.repartition(20).write.parquet(p)
    import glob
    assert len(glob.glob(f"{p}/*.parquet")) == 20
    n = compact_parquet(spark, p, target_mb=128)
    assert n == 1
    assert len(glob.glob(f"{p}/*.parquet")) == 1
    assert spark.read.parquet(p).count() == 1000
    # idempotent: already compact -> no-op
    assert compact_parquet(spark, p, target_mb=128) == 0


def test_merge_rows_upsert_semantics(spark):
    from zef_spark.pipeline.layout import merge_rows
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    upd = spark.createDataFrame(
        [(2, "B"), (4, "d")], "k long, v string")
    got = {r["k"]: r["v"] for r in merge_rows(base, upd, "k").collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_merge_rows_tombstones(spark):
    from zef_spark.pipeline.layout import merge_rows
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string")
    upd = spark.createDataFrame(
        [(1, "A", False), (2, None, True), (5, "e", False)],
        "k long, v string, deleted boolean")
    got = {r["k"]: r["v"] for r in
           merge_rows(base, upd, "k", delete_col="deleted").collect()}
    assert got == {1: "A", 5: "e"}      # key 2 tombstoned


def test_upsert_parquet_atomic(spark, tmp_path):
    from zef_spark.pipeline.layout import upsert_parquet
    path = str(tmp_path / "tbl")
    first = spark.createDataFrame([(1, "a"), (2, "b")],
                                  "k long, v string")
    upsert_parquet(spark, path, first, "k")        # create
    upd = spark.createDataFrame([(2, "B"), (3, "c")],
                                "k long, v string")
    upsert_parquet(spark, path, upd, "k")          # merge + swap
    got = {r["k"]: r["v"]
           for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    import os
    assert not os.path.exists(path + "__upsert_tmp")


def test_upsert_recovers_from_crashed_swap(spark, tmp_path):
    """Crash window between the two swap renames: `path` missing,
    data at `path__old`. The next upsert must RESTORE, not
    re-initialize from the updates alone."""
    import os
    from zef_spark.pipeline.layout import upsert_parquet
    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string") \
        .write.parquet(path)
    upd = spark.createDataFrame([(2, "B")], "k long, v string")
    upsert_parquet(spark, path, upd, "k")
    # simulate the crash: path renamed aside, new never installed
    os.rename(path, f"{path}__old")
    upd2 = spark.createDataFrame([(3, "c")], "k long, v string")
    upsert_parquet(spark, path, upd2, "k")
    rows = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert rows == {1: "a", 2: "B", 3: "c"}   # old rows survived
    assert not os.path.exists(f"{path}__old")
