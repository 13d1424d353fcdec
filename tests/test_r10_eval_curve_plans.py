"""Plan-shape guards for the r10 de-scale-trapped eval-curve ops
(VERDICT r09 order #2): roc_points / average_precision / gain_curve
must never run a keyless single-partition window — on a CONTINUOUS
model score the distinct-score vocabulary is row-sized, and the r09
keyless `Window.orderBy(score.desc())` put the whole table on one
partition. The r10 plans route every cumulative sum through the
range-partitioned two-phase prefix-sum engine (_cum_desc, the
binary_auc/ranksum machinery)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _phys(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _continuous_scores(spark):
    """A genuinely continuous score: one distinct double per row."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    return li.select(
        (F.col("l_extendedprice")
         * (1 - F.col("l_discount"))).alias("score"),
        (F.col("l_returnflag") == "R").alias("label"))


def _assert_single_partitions_bounded(plan):
    """r12 contract (matches tools/keyless_window_scan.py): a
    SinglePartition exchange is legal ONLY for the in-plan range
    offsets — its input is the per-range totals aggregate keyed by
    `__rid`, which can never exceed n_ranges rows. Any OTHER
    single-partition exchange is a scale trap."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        below = "\n".join(lines[i + 1:i + 4])
        assert "HashAggregate(keys=[__rid" in below, (
            "unbounded single-partition exchange:\n"
            + "\n".join(lines[i:i + 4]))


def test_roc_points_no_single_partition_window(spark):
    from zef_spark.pipeline.evaluation import roc_points
    df = roc_points(_continuous_scores(spark), "score", "label")
    plan = _phys(df)
    # every Window must sit on a hash-partitioned exchange (__rid) or
    # be the BOUNDED __rid-ordered offsets window (r12 in-plan
    # offsets; input <= n_ranges rows by construction)
    _assert_single_partitions_bounded(plan)
    assert "Window" in plan  # the per-range local window is real


def test_average_precision_no_single_partition_window(spark):
    from zef_spark.pipeline.evaluation import average_precision
    df = average_precision(_continuous_scores(spark), "score",
                           "label")
    plan = _phys(df)
    # the ONLY single-partition exchange allowed is the final 1-row
    # global agg (partial agg upstream folds each partition to one
    # row first); every Window must carry the __rid partition spec
    assert plan.count("Window") >= 1
    import re
    for m in re.finditer(r"Window .*", plan):
        # locate the partition spec of each window operator
        assert "__rid" in m.group(0), m.group(0)


def test_gain_curve_no_single_partition_window(spark):
    from zef_spark.pipeline.evaluation import gain_curve
    df = gain_curve(_continuous_scores(spark), "score", "label")
    plan = _phys(df)
    _assert_single_partitions_bounded(plan)
    import re
    for m in re.finditer(r"Window .*", plan):
        assert "__rid" in m.group(0), m.group(0)


def test_roc_points_correct_on_continuous(spark):
    """Value check vs a driver-side reference on a small slice of a
    continuous score (no ties): tp/fp at every threshold."""
    from zef_spark.pipeline.evaluation import roc_points
    rows = [(0.91, True), (0.78, False), (0.65, True), (0.52, True),
            (0.40, False), (0.33, False), (0.21, True), (0.10, False)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = {r["threshold"]: (r["tp"], r["fp"], r["tpr"], r["fpr"])
           for r in roc_points(df, "score", "label").collect()}
    assert got[0.91] == (1, 0, 0.25, 0.0)
    assert got[0.65] == (2, 1, 0.5, 0.25)
    assert got[0.10] == (4, 4, 1.0, 1.0)
    assert len(got) == 8


def test_gain_curve_matches_prev_shape(spark):
    """Decile boundaries on a continuous score: bucket 10 captures
    everything; n_cum at bucket b is the first cum-count >= b*N/10."""
    from zef_spark.pipeline.evaluation import gain_curve
    rows = [(float(i) / 100.0, i % 3 == 0) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    out = {r["bucket"]: r for r in
           gain_curve(df, "score", "label").collect()}
    assert out[10]["n_cum"] == 100
    assert out[10]["capture"] == 1.0
    assert out[1]["n_cum"] == 10
    # top decile = scores .90-.99 → positives at 90,93,96,99 = 4 of
    # 34 total positives
    assert out[1]["pos_cum"] == 4
