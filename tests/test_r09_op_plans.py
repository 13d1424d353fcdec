"""Plan-shape guards for the r09 operators — the .explain discipline:
not just correct, but the plan you'd want at 100 TB."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _phys(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(df):
    return _phys(df).count("Exchange")


def test_runs_test_single_window_shuffle(spark):
    """Median rank, sign lag, and the final agg must share ONE
    group-keyed shuffle; no pair joins anywhere."""
    from zef_spark.pipeline.abtest import runs_test
    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _phys(runs_test(ev, "ts", "value", by="event_type"))
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_ks_test_no_joins_one_key_shuffle(spark):
    """Both cumulative RANGE sums + totals + the final agg ride the
    same key partitioning — no join of samples against samples."""
    from zef_spark.pipeline.abtest import ks_test
    o = spark.read.parquet(f"{SF}/orders.parquet")
    df = ks_test(o, "o_orderpriority", "o_totalprice",
                 "1-URGENT", "5-LOW", by="o_orderstatus")
    plan = _phys(df)
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Join" not in plan


def test_bh_fdr_rank_and_reverse_min_share_partitioning(spark):
    """The ascending rank window and the descending running-min
    window must reuse ONE hash partitioning (two sorts, one
    Exchange per key grouping)."""
    from zef_spark.pipeline.abtest import benjamini_hochberg
    cells = spark.createDataFrame(
        [(f"t{i}", (i * 37 % 100) / 100.0) for i in range(40)],
        "id string, p double")
    df = benjamini_hochberg(cells, "p", "id")
    assert _n_exchanges(df) <= 2  # key grouping (+AQE read)


def test_mann_kendall_pair_join_is_key_local(spark):
    """The sign-pair join must be key-equi (hash/merge on the by
    key), never a cross product; the guard caps the series first."""
    from zef_spark.pipeline.wrangling import mann_kendall
    ev = spark.read.parquet(f"{SF}/events.parquet")
    series = (ev.groupBy("event_type",
                         F.to_date("ts").alias("d"))
              .agg(F.sum("value").alias("x"))
              .select("event_type",
                      F.col("d").cast("timestamp").cast("double")
                      .alias("t"), "x"))
    plan = _phys(mann_kendall(series, "t", "x", by="event_type"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunk_text_zero_shuffle(spark):
    """Chunking is row-local: split -> sequence -> slice -> explode,
    NO Exchange of any kind."""
    from zef_spark.pipeline.corpus import chunk_text
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = chunk_text(docs, "doc_id", "text",
                    chunk_tokens=64, overlap=16)
    assert _n_exchanges(df) == 0


def test_sample_k_per_group_one_shuffle(spark):
    """Exact quota = one group-keyed window shuffle, nothing else."""
    from zef_spark.pipeline.corpus import sample_k_per_group
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = sample_k_per_group(docs, "lang", 7, "doc_id")
    assert _phys(df).count("Exchange hashpartitioning") == 1


def test_trimmed_mean_single_engine_one_shuffle(spark):
    """Both trimmed_mean faces resolve to the SAME single-shuffle
    plan (rank window + agg share the key partitioning)."""
    from zef_spark.ops.df_ops import trimmed_mean as tm_compat
    from zef_spark.pipeline.wrangling import trimmed_mean as tm
    c = spark.read.parquet(f"{SF}/customer.parquet")
    a = tm(c, "c_acctbal", by="c_mktsegment", trim=0.1)
    b = tm_compat(c, "c_mktsegment", "c_acctbal", trim=0.1)
    for df in (a, b):
        assert _phys(df).count("Exchange hashpartitioning") <= 1
