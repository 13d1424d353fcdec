"""Plan-shape guards for the r07 operators — the .explain discipline:
not just correct, but the plan you'd want at 100 TB."""

SF = "/root/testdata/sf0.001"


def _phys(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(df):
    return _phys(df).count("Exchange")


def test_acf_single_shuffle_for_all_lags(spark):
    """All max_lag lead columns + every lag's sums must share ONE
    key shuffle — max_lag never multiplies exchanges."""
    from pyspark.sql import functions as F
    from zef_spark.pipeline.rollup import acf
    ev = spark.read.parquet(f"{SF}/events.parquet")
    series = (ev.groupBy("event_type",
                         F.date_trunc("hour", F.col("ts"))
                         .cast("timestamp_ntz").alias("h"))
              .agg(F.count(F.lit(1)).cast("double").alias("x")))
    few = acf(series, "h", "x", max_lag=2, by="event_type")
    many = acf(series, "h", "x", max_lag=12, by="event_type")
    assert _n_exchanges(few) == _n_exchanges(many)
    # and the window + agg pipeline is exactly: series agg shuffle,
    # window shuffle (same key), final agg — no lag-proportional tail
    assert _n_exchanges(many) <= 4


def test_psi_edges_broadcast_not_shuffled(spark):
    """The per-key decile-edge table must reach the data side as a
    BROADCAST join (bins-1 values per key — metadata-sized), never a
    shuffle join of the full data against edges."""
    from pyspark.sql import functions as F
    from zef_spark.pipeline.wrangling import psi_drift
    o = spark.read.parquet(f"{SF}/orders.parquet")
    base = o.select(
        F.when(F.col("o_orderdate") < F.lit("1995-06-01").cast("date"),
               "a").otherwise("b").alias("s"),
        F.col("o_totalprice").alias("v"),
        F.col("o_orderstatus").alias("k"))
    plan = _phys(psi_drift(base, "s", "v", by="k", bins=10))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_seasonal_decompose_phase_table_broadcast(spark):
    """The (keys x period) phase-mean table joins back as a
    broadcast; the series itself shuffles once on the key."""
    import datetime as dt
    from zef_spark.pipeline.rollup import seasonal_decompose
    t0 = dt.datetime(2024, 1, 1)
    rows = [("k", t0 + dt.timedelta(days=i), float(i % 7))
            for i in range(35)]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp_ntz, x double")
    plan = _phys(seasonal_decompose(df, "ts", "x", period=7, by="k"))
    assert "BroadcastExchange" in plan


def test_ngram_novelty_no_cartesian(spark):
    """Novelty is posting-join shaped — never an all-pairs doc join."""
    from zef_spark.pipeline.text import ngram_novelty
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _phys(ngram_novelty(docs, "doc_id", "text", n=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_leakage_safe_split_is_single_pair_list_propagation(spark):
    """The split itself adds only the cluster join + a row-local md5
    bucket — no extra shuffle of the corpus beyond that one join."""
    from zef_spark.pipeline.corpus import leakage_safe_split
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = spark.createDataFrame([(1, 2), (3, 4)],
                                  "id_a long, id_b long")
    out = leakage_safe_split(docs, pairs, "doc_id",
                             {"train": 0.9, "test": 0.1})
    plan = _phys(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
