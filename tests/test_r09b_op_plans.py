"""Plan-shape guards for the r09b operators (paired/ordinal
statistics + quantization) — the .explain discipline: not just
correct, but the plan you'd want at 100 TB."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _phys(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_wilcoxon_rides_ranksum_engine(spark):
    """No pair joins, no single-partition sort: the |d| ranking is
    the shared distinct-value-collapse + range-prefix-sum engine."""
    from zef_spark.pipeline.abtest import wilcoxon_signed_rank
    ev = spark.read.parquet(f"{SF}/events.parquet")
    pairs = (ev.groupBy("user_id")
             .agg(F.avg(F.when(F.col("event_type") == "view",
                               F.col("value"))).alias("a"),
                  F.avg(F.when(F.col("event_type") == "purchase",
                               F.col("value"))).alias("b")))
    plan = _phys(wilcoxon_signed_rank(pairs, "a", "b"))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    # the only join is the 2-scalars-per-range broadcast offsets
    assert plan.count("BroadcastHashJoin") <= 1


def test_cuped_single_scan_no_join(spark):
    """theta + both adjusted means from ONE conditional-agg scan."""
    from zef_spark.pipeline.abtest import cuped_adjust
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = cuped_adjust(li, "l_returnflag", "l_extendedprice",
                      "l_quantity", "R", "N")
    plan = _phys(df)
    assert "Join" not in plan
    assert plan.count("FileScan") == 1


def test_jarque_bera_one_hash_agg(spark):
    """Same one-scan shape as group_moments (shared _moment_raw)."""
    from zef_spark.pipeline.wrangling import jarque_bera
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    df = jarque_bera(cust, "c_acctbal", by="c_mktsegment")
    plan = _phys(df)
    assert "Join" not in plan
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange hashpartitioning") <= 1


def test_kendall_pair_join_is_key_local(spark):
    """The quadratic pair join must be an equi-join on the by-keys
    (never a cartesian product over the corpus); tie profiles are
    vocab-bounded aggs."""
    from zef_spark.pipeline.wrangling import kendall_tau
    ev = spark.read.parquet(f"{SF}/events.parquet")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("d"))
             .agg(F.count(F.lit(1)).cast("double").alias("x"),
                  F.avg("value").alias("y")))
    plan = _phys(kendall_tau(daily, "x", "y", by="event_type"))
    assert "CartesianProduct" not in plan


def test_ljung_box_single_window_shuffle(spark):
    """Q assembles on acf's ONE key-ordered window shuffle + one
    agg — max_lag never multiplies shuffles."""
    from zef_spark.pipeline.rollup import ljung_box
    ev = spark.read.parquet(f"{SF}/events.parquet")
    series = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("h"))
              .agg(F.count(F.lit(1)).cast("double").alias("x")))
    plan = _phys(ljung_box(series, "h", "x", by="event_type"))
    assert "Join" not in plan
    # series agg + window + final agg share the event_type keying
    assert plan.count("Exchange hashpartitioning") <= 2


def test_log_loss_one_agg_no_shuffle_beyond_agg(spark):
    from zef_spark.pipeline.evaluation import log_loss
    ev = spark.read.parquet(f"{SF}/events.parquet")
    evl = ev.select((F.col("event_type") == "purchase").alias("y"),
                    ((F.col("user_id") % 97 + 1) / 100.0).alias("p"))
    plan = _phys(log_loss(evl, "p", "y"))
    assert "Join" not in plan
    assert plan.count("FileScan") == 1


def test_quantization_zero_shuffle_transform(spark):
    """quantize_embeddings is row-local: no Exchange at all."""
    from zef_spark.pipeline.embeddings import quantize_embeddings
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _phys(quantize_embeddings(emb, "embedding"))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_quantization_profile_one_agg(spark):
    from zef_spark.pipeline.embeddings import quantization_profile
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _phys(quantization_profile(emb, "embedding"))
    assert "Join" not in plan
    assert plan.count("FileScan") == 1


def test_sig_safe_release_stays_in_codegen(spark):
    """The element_at rounding spelling keeps even an 8-chain
    release compiled: no CodeGenerator fallback on execution (the
    r09 cuped regression class). Executes the plan and checks the
    generated subtrees stay far below janino's 64KB method limit."""
    from zef_spark.pipeline.abtest import cuped_adjust
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = cuped_adjust(li, "l_returnflag", "l_extendedprice",
                      "l_quantity", "R", "N")
    df.collect()  # AQE finalizes subtrees only on execution
    out = df._jdf.queryExecution().debug().codegenToSeq()
    sizes = [len(out.apply(i)._2()) for i in range(out.size())]
    assert sizes and max(sizes) < 200_000, sizes
