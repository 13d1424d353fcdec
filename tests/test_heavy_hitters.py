"""Heavy hitters (pipeline/sketches.py heavy_hitters): exact result
guarantee from the Misra-Gries candidate phase."""

import pyspark.sql.functions as F

from zef_spark.pipeline.sketches import heavy_hitters


def test_matches_exact_having_query(spark):
    # zipf-ish: item i appears 1000//(i+1) times
    rows = [(f"w{i}",) for i in range(50) for _ in range(1000 // (i + 1))]
    df = spark.createDataFrame(rows, "tok string").repartition(16)
    got = {(r.item, r.n) for r in heavy_hitters(df, "tok", 0.02).collect()}
    exact = {(r.tok, r.n) for r in
             df.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
             .where(F.col("n") > 0.02 * df.count()).collect()}
    assert got == exact and len(got) > 3


def test_no_false_negatives_with_tight_counters(spark):
    rows = ([("hot",)] * 500) + [(f"cold{i}",) for i in range(400)]
    df = spark.createDataFrame(rows, "tok string").repartition(8)
    got = [r.item for r in
           heavy_hitters(df, "tok", 0.1, counters=20).collect()]
    assert got == ["hot"]


def test_candidate_phase_bounds_state(spark):
    # the MG summary must stay at <= partitions x counters rows even
    # with every value distinct
    from zef_spark.pipeline.sketches import _misra_gries_udf
    df = (spark.range(10000)
          .select(F.concat(F.lit("v"), F.col("id")).alias("__item"))
          .repartition(4))
    summaries = df.mapInPandas(_misra_gries_udf(10),
                               "item string, est long")
    assert summaries.count() <= 4 * 10
