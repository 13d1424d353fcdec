"""The new pipeline ops are chainable through the ZefOp registry."""

import pyspark.sql.functions as F

from zef_spark import ops as z


def test_new_ops_chainable(spark):
    df = spark.createDataFrame([(1, [3.0, 4.0])],
                               "id long, vec array<double>")
    assert (df | z.l2_normalize["vec"]).collect()[0].unit_vec == [0.6, 0.8]

    toks = spark.createDataFrame([("x",)] * 3 + [("y",)], "tok string")
    hh = toks | z.heavy_hitters["tok", 0.5]
    assert [(r.item, r.n) for r in hh.collect()] == [("x", 3)]

    txt = spark.createDataFrame([("Prose line ends here.",)],
                                "text string")
    assert "gopher_keep" in (txt | z.gopher_rules["text"]).columns
    assert (txt | z.c4_line_clean["text"]).collect()[0].clean_text \
        == "Prose line ends here."


def test_registry_resolves_all_new_names(spark):
    from zef_spark.ops.core import OP_REGISTRY
    for name in ("nb_train", "nb_predict", "l2_normalize", "mean_pool",
                 "random_projection", "z_order", "gopher_rules",
                 "c4_line_clean", "gapfill", "heavy_hitters"):
        assert "df" in OP_REGISTRY.get(name, {}), name


def test_registry_resolves_r04_late_names(spark):
    from zef_spark.ops.core import OP_REGISTRY
    for name in ("fuzzy_join", "asof_join", "range_join", "parse_url",
                 "normalize_url", "registered_domain", "url_dedup",
                 "domain_caps", "apply_bpe"):
        assert "df" in OP_REGISTRY.get(name, {}), name


def test_core_surface_resolves_and_floor_pinned(spark):
    """Canonical §2 op names resolve in the registry, and the total
    surface never shrinks (a refactor that silently drops registered
    ops fails here, not in a user chain)."""
    from zef_spark import ops as z
    from zef_spark.ops.core import OP_REGISTRY
    core = [
        # 2.B-2.I sequence/agg/sort core
        "filter", "map", "without", "distinct", "sort", "take",
        "skip", "group_by", "frequencies", "reduce", "scan",
        "sliding", "chunk", "concat", "zip", "merge", "nth",
        "first", "last", "single", "sum", "mean", "variance",
        "max_by", "min_by", "insert", "update", "remove", "get",
        "select_keys", "reverse", "enumerate", "stride",
        # 2.J-2.K graph/temporal
        "all", "now", "Out", "Outs", "In", "Ins", "source", "target",
        "value", "uid", "gather", "exists_at", "time_travel",
        "select_by_field", "has_out", "has_in", "out_rels", "in_rels",
        # 2.H scalars
        "to_pascal_case", "split", "replace", "int_to_alpha",
        "value_hash", "add", "clamp",
        # 2.L-2.N streams/fx/wishes
        "subscribe", "for_each", "push", "tap", "run",
        # engine extras added r04
        "fuzzy_join", "normalize_url", "apply_bpe", "merge_intervals",
        "weighted_sample", "pivot_table", "rollup_agg", "rank_by",
        "profile_table", "diff_tables", "scd2_from_events", "ewma",
        "json_extract", "histogram", "corr_matrix", "explode",
        "stream_interval_join", "normalize_text", "plan_report",
    ]
    missing = [n for n in core if n not in OP_REGISTRY]
    assert not missing, f"ops fell out of the registry: {missing}"
    for n in core:
        assert getattr(z, n) is not None
    assert len(OP_REGISTRY) >= 340, (
        f"registry shrank to {len(OP_REGISTRY)} ops")
