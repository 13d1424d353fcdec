"""DataFrame-kind op semantics over the sf0.001 testdata."""

from pyspark.sql import functions as F

from zef_spark import ops as z


def test_filter_map_sort_take(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = (cust | z.filter[lambda r: r.c_acctbal > 0]
           | z.map[{"k": F.col("c_custkey"), "bal": F.col("c_acctbal")}]
           | z.sort["-bal", "k"] | z.take[3] | z.collect)
    assert len(out) == 3
    assert out[0][1] >= out[1][1] >= out[2][1]


def test_aggregates(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders | z.count | z.collect
    assert n == 1500
    s = orders.select("o_totalprice") | z.sum | z.collect
    assert s > 0
    mx = orders | z.max["o_totalprice"] | z.collect
    mn = orders | z.min["o_totalprice"] | z.collect
    assert mn < mx
    assert (orders | z.any[lambda r: r.o_totalprice > 0] | z.collect) is True


def test_group_by_agg(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rows = (orders | z.group_by["o_orderstatus",
                                {"n": F.count(F.lit(1))}]
            | z.sort["o_orderstatus"] | z.collect)
    assert sum(r[1] for r in rows) == 1500


def test_distinct_without(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    segs = cust.select("c_mktsegment") | z.distinct | z.collect
    assert 1 <= len(segs) <= 10
    sub = cust.where(F.col("c_custkey") <= 10).select("c_custkey")
    rest = cust.select("c_custkey") | z.without[sub] | z.count | z.collect
    assert rest == 150 - (cust.where(F.col("c_custkey") <= 10).count())


def test_window_sequence_ops(spark, sf_dir):
    from zef_spark.sources import load_events
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    en = ev | z.enumerate[["ts", "event_id"], "user_id"]
    assert "index" in en.columns
    first_idx = en.where(F.col("index") == 0).count()
    assert first_idx == ev.select("user_id").distinct().count()
    ch = ev | z.chunk[5, ["ts", "event_id"], "user_id"]
    assert ch.agg(F.max("chunk_id")).collect()[0][0] >= 0
    sc = ev | z.scan["sum", "value", ["ts", "event_id"], "user_id"]
    assert "scan" in sc.columns
    st = ev | z.stride[3, ["ts", "event_id"], "user_id"]
    assert st.count() < ev.count()


def test_sliding_df(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(20)
    sl = orders | z.sliding[3, "o_orderkey"]
    rows = sl.select("window_start", F.size("window").alias("n")).collect()
    assert all(r[1] == 3 for r in rows)
    assert len(rows) == 18  # 20 - 3 + 1


def test_concat_cartesian(spark, sf_dir):
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    assert (r.select("r_name") | z.concat[r.select("r_name")]
            | z.count | z.collect) == 10
    assert (r | z.cartesian_product[n] | z.count | z.collect) == 125


def test_max_by_first_last(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    top = orders | z.max_by["o_totalprice"] | z.collect
    mx = orders | z.max["o_totalprice"] | z.collect
    assert any(v == mx for v in top[0])
    f = orders | z.first["o_orderkey"] | z.collect
    l = orders | z.last["o_orderkey"] | z.collect
    assert f[0] != l[0]


def test_group_percentiles_exact_disc(spark):
    from zef_spark.ops.df_ops import group_percentiles
    rows = [("a", float(v)) for v in range(1, 11)] + [("b", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = {r["k"]: r for r in
           group_percentiles(df, "k", "v", ps=(0.5, 0.9)).collect()}
    # PERCENTILE_DISC: value at ceil(p*n) of the sorted list
    assert out["a"]["p50"] == 5.0 and out["a"]["p90"] == 9.0
    assert out["a"]["n"] == 10
    assert out["b"]["p50"] == 5.0 and out["b"]["p90"] == 5.0
    # naming from the percentage, not str(p)[2:] — p=0.5 is p50 (the
    # median), never 'p5'; p=0.05 and p=1.0 get distinct sane names
    cols = group_percentiles(df, "k", "v", ps=(0.05, 1.0)).columns
    assert "p5" in cols and "p100" in cols
