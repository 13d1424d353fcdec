"""pivot_table / unpivot / rollup_agg / cube_agg."""

from pyspark.sql import functions as F

from zef_spark import ops as z


def _sales(spark):
    return spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4), ("b", "x", 8)],
        "k string, cat string, v long")


def test_pivot_table_explicit_values(spark):
    wide = _sales(spark) | z.pivot_table["k", "cat", F.sum("v"),
                                         ["x", "y"]]
    rows = {r["k"]: (r["x"], r["y"]) for r in wide.collect()}
    assert rows == {"a": (1, 2), "b": (12, None)}


def test_pivot_roundtrips_through_unpivot(spark):
    wide = _sales(spark) | z.pivot_table["k", "cat", F.sum("v"),
                                         ["x", "y"]]
    long = (wide | z.unpivot["k", ["x", "y"], "cat", "v"]) \
        .where(F.col("v").isNotNull())
    back = {(r["k"], r["cat"], r["v"]) for r in long.collect()}
    assert back == {("a", "x", 1), ("a", "y", 2), ("b", "x", 12)}


def test_unpivot_is_shuffle_free(spark):
    plan = (_sales(spark) | z.unpivot["k", ["v"], "var", "val"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_rollup_agg_levels(spark):
    out = _sales(spark) | z.rollup_agg[["k", "cat"],
                                       {"n": F.count(F.lit(1))}]
    rows = {(r["k"], r["cat"], r["grouping_level"]): r["n"]
            for r in out.collect()}
    assert rows[("a", "x", 0)] == 1
    assert rows[("a", None, 1)] == 2       # per-k subtotal
    assert rows[(None, None, 3)] == 4      # grand total
    assert len(rows) == 3 + 2 + 1


def test_cube_agg_includes_cat_margin(spark):
    out = _sales(spark) | z.cube_agg[["k", "cat"],
                                     {"n": F.count(F.lit(1))}]
    rows = {(r["k"], r["cat"], r["grouping_level"]): r["n"]
            for r in out.collect()}
    assert rows[(None, "x", 2)] == 3       # cat margin, absent in rollup
    assert rows[(None, None, 3)] == 4


def test_pivot_and_rollup_single_aggregate_pass(spark):
    wide = _sales(spark) | z.pivot_table["k", "cat", F.sum("v"),
                                         ["x", "y"]]
    plan = wide._jdf.queryExecution().executedPlan().toString()
    # Spark pivots via a two-phase aggregate (by (k,cat) then by k) —
    # two exchanges but ONE source scan; the scan count is what blows
    # up at 100 TB
    assert plan.count("Scan") == 1
    assert plan.count("Exchange") <= 2
    ru = _sales(spark) | z.rollup_agg[["k"], {"n": F.count(F.lit(1))}]
    rplan = ru._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in rplan and rplan.count("Exchange") <= 1


def test_ranking_family(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 30.0),
         ("b", 4, 5.0)], "k string, id long, v double")
    out = (df
           | z.rank_by[["-v", "id"], "k", "rnk"]
           | z.dense_rank_by["-v", "k", "drnk"]
           | z.row_number_by["id", "k", "rn"]
           | z.percent_rank_by["v", "k", "pr"]
           | z.ntile_by[2, "id", "k", "half"]
           | z.lag_by["v", "id", "k", 1, 0.0, "prev"]
           | z.lead_by["v", "id", "k"])
    rows = {r["id"]: r for r in out.collect()}
    assert (rows[2]["rnk"], rows[3]["rnk"], rows[1]["rnk"]) == (1, 2, 3)
    assert (rows[2]["drnk"], rows[3]["drnk"]) == (1, 1)
    assert [rows[i]["rn"] for i in (1, 2, 3)] == [1, 2, 3]
    assert rows[1]["pr"] == 0.0 and rows[4]["pr"] == 0.0
    assert (rows[1]["half"], rows[3]["half"]) == (1, 2)
    assert (rows[1]["prev"], rows[2]["prev"]) == (0.0, 10.0)
    assert rows[3]["v_lead"] is None


def test_ranking_chain_single_shuffle(spark):
    df = spark.createDataFrame([("a", 1, 1.0)],
                               "k string, id long, v double")
    out = (df | z.rank_by[["-v"], "k"] | z.lag_by["v", "id", "k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_json_ops(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 5, "tag": "a"}'), (2, '{"k": 7}'), (3, None)],
        "id long, props string")
    one = df | z.json_extract["props", "$.k", "k"]
    assert {r["id"]: r["k"] for r in one.collect()} == \
        {1: "5", 2: "7", 3: None}
    multi = df | z.json_fields["props", {"k": "$.k", "tag": "$.tag"}]
    r1 = {r["id"]: (r["k"], r["tag"]) for r in multi.collect()}
    assert r1[1] == ("5", "a") and r1[2] == ("7", None)
    typed = df | z.json_parse["props", "k INT, tag STRING"]
    r2 = {r["id"]: r["props_parsed"] for r in typed.collect()}
    assert r2[1]["k"] == 5 and r2[1]["tag"] == "a"


def test_histogram_clamps_edges(spark):
    df = spark.createDataFrame([(x,) for x in
                                [-5.0, 0.0, 9.9, 10.0, 95.0, 200.0]],
                               "v double")
    h = {r["bin"]: r["n"] for r in
         (df | z.histogram["v", 10, 0.0, 100.0]).collect()}
    assert h[0] == 3      # -5 clamps in, 0.0 and 9.9 in bin 0
    assert h[1] == 1      # 10.0 opens bin 1
    assert h[9] == 2      # 95 in last bin, 200 clamps to it


def test_corr_matrix_single_pass(spark):
    df = spark.createDataFrame(
        [(float(i), float(2 * i), float(-i)) for i in range(10)],
        "a double, b double, c double")
    out = {(r["col_a"], r["col_b"]): r["corr"]
           for r in (df | z.corr_matrix[["a", "b", "c"]]).collect()}
    assert out[("a", "b")] == 1.0 and out[("a", "c")] == -1.0
    plan = (df | z.corr_matrix[["a", "b", "c"]]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") == 1


def test_convenience_verbs(spark):
    df = spark.createDataFrame([(1, [10, 20], None), (2, [], 5)],
                               "id long, xs array<int>, v int")
    ex = (df | z.explode["xs", "x"]).collect()
    assert sorted((r["id"], r["x"]) for r in ex) == [(1, 10), (1, 20)]
    exo = (df | z.explode["xs", "x", True]).collect()
    assert (2, None) in {(r["id"], r["x"]) for r in exo}
    pe = (df | z.pos_explode["xs"]).collect()
    assert {(r["pos"], r["value"]) for r in pe} == {(0, 10), (1, 20)}
    wc = df | z.with_columns[{"d": F.col("id") * 2, "s": "id + 1"}]
    r = {x["id"]: (x["d"], x["s"]) for x in wc.collect()}
    assert r[2] == (4, 3)
    assert (df | z.drop_columns["xs"]).columns == ["id", "v"]
    assert (df | z.rename_columns[{"v": "val"}]).columns == \
        ["id", "xs", "val"]
    assert (df | z.fill_na[0, ["v"]]).where("v = 0").count() == 1
    assert (df | z.drop_na["any", ["v"]]).count() == 1


def test_top_k_by_and_distinct_on(spark):
    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 9.0), ("a", 3, 7.0), ("b", 4, 1.0)],
        "k string, id long, v double")
    top2 = (df | z.top_k_by[2, ["-v", "id"], "k"]).collect()
    assert sorted((r["k"], r["id"]) for r in top2) == \
        [("a", 2), ("a", 3), ("b", 4)]
    one = (df | z.distinct_on["k", ["-v", "id"]]).collect()
    assert sorted((r["k"], r["id"]) for r in one) == [("a", 2), ("b", 4)]
    # global top-k plans as TakeOrdered, not a full sort
    plan = (df | z.top_k_by[2, "-v"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
