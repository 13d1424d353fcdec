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
