"""profile_table / diff_tables / scd2_from_events."""

import datetime as dt

from pyspark.sql import functions as F

from zef_spark import ops as z


def test_profile_table(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 3.0), (3, None, None)],
        "id long, s string, v double")
    prof = {r["column"]: r for r in (df | z.profile_table).collect()}
    assert prof["id"]["n_rows"] == 3
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["n_distinct"] == 1
    assert prof["v"]["mean"] == 2.0
    assert prof["id"]["min"] == "1" and prof["id"]["max"] == "3"
    assert prof["s"]["mean"] is None  # non-numeric


def test_profile_single_pass(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    plan = (df | z.profile_table)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Scan") == 1


def test_diff_tables(spark):
    old = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 2), (3, "c", 3), (4, None, 4)],
        "k long, s string, v long")
    new = spark.createDataFrame(
        [(1, "a", 1), (2, "B", 2), (4, None, 4), (5, "e", 5)],
        "k long, s string, v long")
    rows = {r["k"]: (r["status"], sorted(r["changed_columns"]))
            for r in (old | z.diff_tables[new, "k"]).collect()}
    assert rows[1] == ("unchanged", [])
    assert rows[2] == ("changed", ["s"])
    assert rows[3][0] == "removed"
    assert rows[4] == ("unchanged", [])   # null-safe equality
    assert rows[5][0] == "added"


def test_scd2_from_events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, "x"), (1, base + dt.timedelta(1), "x"),   # no change
        (1, base + dt.timedelta(2), "y"),                    # change
        (2, base, "z"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v string")
    out = {(r["k"], r["v"]): (r["valid_from"], r["valid_to"])
           for r in (df | z.scd2_from_events["k", "ts", ["v"]]).collect()}
    assert out[(1, "x")] == (base, base + dt.timedelta(2))
    assert out[(1, "y")] == (base + dt.timedelta(2), None)
    assert out[(2, "z")] == (base, None)
    assert len(out) == 3  # the duplicate 'x' event collapsed
