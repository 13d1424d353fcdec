"""Round-9 hardening: the five ADVICE items + the theil_sen cost
guard (r08 verdict order #5) + the codegen-fallback guard plumbing.
Reference semantics under test: zefhub/zef exposes the same degenerate
cases through its op layer (e.g. `group_by` on empty partitions,
ITF: implementation_typing_functions.py) — here each degenerate input
must yield the CONTRACTED output (NULL / skip / raise), never a
silently-wrong number.
"""

import json
import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- #
# theil_sen max_points_per_key guard (r08 verdict order #5)
# ---------------------------------------------------------------- #

def test_theil_sen_guard_fires_with_hint(spark):
    from zef_spark.pipeline.wrangling import theil_sen
    df = spark.range(50).select(
        F.lit("k").alias("g"),
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2.0).alias("y"))
    out = theil_sen(df, "x", "y", by="g", max_points_per_key=10)
    with pytest.raises(Exception) as ei:
        out.collect()
    msg = str(ei.value)
    assert "theil_sen" in msg and "quadratic" in msg
    # the hint must name BOTH fixes: aggregate-first and the
    # explicit opt-out
    assert "Aggregate the series first" in msg
    assert "max_points_per_key=None" in msg


def test_theil_sen_guard_allows_bounded_and_optout(spark):
    from zef_spark.pipeline.wrangling import theil_sen
    df = spark.range(50).select(
        F.lit("k").alias("g"),
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2.0).alias("y"))
    ok = theil_sen(df, "x", "y", by="g",
                   max_points_per_key=50).collect()
    assert ok[0]["slope"] == 2.0
    # explicit opt-out: identical result, no guard in the plan
    off = theil_sen(df, "x", "y", by="g",
                    max_points_per_key=None).collect()
    assert off[0]["slope"] == 2.0


# ---------------------------------------------------------------- #
# js_divergence: a key with one sample entirely absent (ADVICE #2)
# ---------------------------------------------------------------- #

def test_js_divergence_empty_sample_yields_null(spark):
    from zef_spark.pipeline.wrangling import js_divergence
    rows = ([("only_b", "b", "x")] * 3 + [("only_b", "b", "y")] * 2
            + [("both", "a", "x"), ("both", "a", "y"),
               ("both", "b", "x"), ("both", "b", "x")])
    df = spark.createDataFrame(rows, "k string, s string, c string")
    out = {r["k"]: r for r in
           js_divergence(df, "s", "c", by="k").collect()}
    # absent reference sample: NULL kl/js (psi_drift's contract),
    # never NaN into the decimal cast, never a silent 0.0
    r = out["only_b"]
    assert r["n_a"] == 0 and r["n_b"] == 5
    assert r["kl_ab"] is None and r["kl_ba"] is None
    assert r["js"] is None
    # the healthy key still computes
    r2 = out["both"]
    assert r2["n_a"] == 2 and r2["n_b"] == 2
    assert r2["js"] is not None and r2["js"] >= 0.0


# ---------------------------------------------------------------- #
# kruskal_wallis: empty listed group NULLs H (ADVICE #3)
# ---------------------------------------------------------------- #

def test_kruskal_empty_group_nulls_statistic(spark):
    from zef_spark.pipeline.abtest import kruskal_wallis
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)],
        "g string, v double")
    row = kruskal_wallis(df, "g", "v",
                         ["a", "b", "ghost"]).collect()[0]
    # dof stays k-1 = 2 but H is NULL — matching anova_oneway's
    # degenerate-input contract instead of silently overstating dof
    assert row["dof"] == 2
    assert row["h"] is None and row["h_corrected"] is None
    # with all groups present the statistic computes
    ok = kruskal_wallis(df, "g", "v", ["a", "b"]).collect()[0]
    assert ok["h"] is not None


# ---------------------------------------------------------------- #
# round-magnitude lint: NULL-leading float column (ADVICE #4)
# ---------------------------------------------------------------- #

def test_lint_scans_past_leading_nulls():
    from tools.check_oracle import round_magnitude_violations
    # first row NULL, second row a 12-sig-digit d=6 grid value —
    # exactly the CASE/NULL-guarded columns the lint targets
    rows = [(None,), (123456.789012,)]
    bad = round_magnitude_violations("some_query", ["z"], rows)
    assert bad and bad[0].startswith("z=")


def test_lint_still_skips_nonfloat_columns():
    from tools.check_oracle import round_magnitude_violations
    rows = [(None,), ("not a float",), (123456.789012,)]
    assert round_magnitude_violations("q", ["c"], rows) == []


# ---------------------------------------------------------------- #
# MarkerCommitProtocol: atomic-with-content markers (ADVICE #1)
# ---------------------------------------------------------------- #

def test_posix_put_if_absent_atomic_with_content(tmp_path):
    from zef_spark.graph.sync import _posix_put_if_absent
    m = str(tmp_path / "m.json")
    assert _posix_put_if_absent(m, '{"segment": "seg-1"}')
    with open(m) as f:
        assert json.load(f)["segment"] == "seg-1"
    # second claim loses and does NOT clobber the winner's body
    assert not _posix_put_if_absent(m, '{"segment": "seg-2"}')
    with open(m) as f:
        assert json.load(f)["segment"] == "seg-1"
    # no tmp litter
    assert os.listdir(tmp_path) == ["m.json"]


def test_seg_dirs_skips_stably_empty_marker(tmp_path):
    """A crashed FOREIGN writer's empty marker must not wedge every
    refresh with JSONDecodeError (our own put is atomic-with-content,
    so an empty marker can only be foreign/corrupt)."""
    from zef_spark.graph.sync import _seg_dirs
    log = tmp_path / "txlog"
    cdir = log / "_commits"
    cdir.mkdir(parents=True)
    (log / "seg-aaaa").mkdir()
    (cdir / "000000000001.json").write_text(
        json.dumps({"segment": "seg-aaaa"}))
    (cdir / "000000000002.json").write_text("")  # crashed writer
    segs = _seg_dirs(str(tmp_path))
    assert [t for t, _ in segs] == [1]
    assert segs[0][1].endswith("seg-aaaa")


def test_read_marker_retries_then_none(tmp_path):
    from zef_spark.graph.sync import _read_marker
    p = tmp_path / "x.json"
    p.write_text("")
    assert _read_marker(str(p), retries=2, delay=0.0) is None
    p.write_text('{"segment": "s"}')
    assert _read_marker(str(p)) == "s"


# ---------------------------------------------------------------- #
# group_moments: stays inside whole-stage codegen (verdict order #3)
# ---------------------------------------------------------------- #

def test_group_moments_no_codegen_fallback(spark, sf_dir):
    """The fused project chain must stay far under janino's 64KB
    method limit (the r08 sweep saw `Code grows beyond 64 KB` →
    silent interpreted fallback). The generated code for EVERY
    whole-stage subtree of the moments query must stay small — the
    broken version's fused hashAgg output method alone exceeded
    65536 bytes because the mean/m2 trees re-expanded ~30× into the
    skew/kurtosis CASE chains."""
    from zef_spark.pipeline.wrangling import group_moments
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = group_moments(cust, "c_acctbal", by="c_mktsegment")
    code = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen")
    assert "WholeStageCodegen" in code
    for subtree in code.split("== Subtree ")[1:]:
        assert len(subtree.encode()) < 64000, (
            "a generated whole-stage subtree is at janino method-"
            "limit scale again — re-expanded expression trees?")
    assert len(df.collect()) == 5
