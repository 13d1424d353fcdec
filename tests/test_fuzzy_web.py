"""fuzzy_join (q-gram blocked Levenshtein) and web-curation ops."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- fuzzy

def _names(spark, rows):
    return spark.createDataFrame([(i, s) for i, s in enumerate(rows)],
                                 "id long, name string")


@pytest.mark.slow  # r13 gate split: multi-minute test
def test_fuzzy_join_matches_bruteforce(spark):
    from zef_spark.pipeline.joins import fuzzy_join
    left = _names(spark, ["kitten", "sitting", "flaw", "lawn",
                          "spark engine", "spork engine", "zef", "",
                          "ab", "abc", "abcdef", "abcdxf"])
    got = {(r["name_l"], r["name_r"], r["distance"])
           for r in fuzzy_join(left, left, "name",
                               max_distance=2).collect()}
    # brute force with the same metric (Spark's levenshtein itself)
    brute = {(r["a"], r["b"], r["d"]) for r in
             left.alias("x").crossJoin(left.alias("y"))
             .select(F.col("x.name").alias("a"),
                     F.col("y.name").alias("b"),
                     F.levenshtein("x.name", "y.name").alias("d"))
             .where(F.col("d") <= 2).collect()}
    assert got == brute  # blocking is COMPLETE, filter is exact


def test_fuzzy_join_short_long_boundary(spark):
    """Pairs straddling the q*(t+1) length boundary (the short-block
    coverage proof) must not be lost."""
    from zef_spark.pipeline.joins import fuzzy_join
    # len 5 vs len 6/7 with distance <= 2; q=2,t=2 -> min_len 6
    left = _names(spark, ["abcde"])
    right = _names(spark, ["abcdef", "abcdefg", "zzzzzz"])
    got = {(r["name_l"], r["name_r"])
           for r in fuzzy_join(left, right, "name",
                               max_distance=2).collect()}
    assert got == {("abcde", "abcdef"), ("abcde", "abcdefg")}


def test_fuzzy_join_no_cartesian(spark):
    from zef_spark.pipeline.joins import fuzzy_join
    left = _names(spark, ["abcdefgh", "abcdefgx", "qrstuvwx"])
    plan = (fuzzy_join(left, left, "name")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_join_keep_payload(spark):
    from zef_spark.pipeline.joins import fuzzy_join
    left = _names(spark, ["abcdef"])
    right = _names(spark, ["abcdxf"])
    row = fuzzy_join(left, right, "name", keep=["id"]).collect()[0]
    assert (row["id_l"], row["id_r"], row["distance"]) == (0, 0, 1)


# ------------------------------------------------------------------ web

URLS = [
    (0, "HTTPS://WWW.Shop.CO.UK:443/Items/1?utm_source=ad&id=1#frag"),
    (1, "https://www.shop.co.uk/Items/1?id=1"),
    (2, "http://blog.example.com:80?ref=tw"),
    (3, "http://blog.example.com/"),
    (4, "https://news.example.com:8443/a?gclid=x&q=1&utm_medium=m"),
]


def _urls(spark):
    return spark.createDataFrame(URLS, "id long, url string")


def test_parse_url(spark):
    from zef_spark.pipeline.web import parse_url
    rows = {r["id"]: r for r in parse_url(_urls(spark)).collect()}
    assert rows[0]["scheme"] == "https"
    assert rows[0]["host"] == "www.shop.co.uk"
    assert rows[0]["port"] == "443"
    assert rows[0]["path"] == "/Items/1"
    assert rows[0]["query"] == "utm_source=ad&id=1"
    assert rows[0]["fragment"] == "frag"
    assert rows[3]["query"] == "" and rows[3]["fragment"] == ""


def test_normalize_url_collapses_variants(spark):
    from zef_spark.pipeline.web import normalize_url
    rows = {r["id"]: r["url_norm"]
            for r in normalize_url(_urls(spark)).collect()}
    # 0 and 1: same canonical URL (case, default port, tracking, frag)
    assert rows[0] == rows[1] == "https://www.shop.co.uk/Items/1?id=1"
    # 2 and 3: empty path -> "/", :80 stripped, ref= dropped
    assert rows[2] == rows[3] == "http://blog.example.com/"
    # non-default port survives; junk params dropped, real ones kept
    assert rows[4] == "https://news.example.com:8443/a?q=1"


def test_registered_domain(spark):
    from zef_spark.pipeline.web import parse_url, registered_domain
    df = registered_domain(parse_url(_urls(spark)))
    rows = {r["id"]: r["domain"] for r in df.collect()}
    assert rows[1] == "shop.co.uk"          # SLD suffix under ccTLD
    assert rows[3] == "example.com"         # plain eTLD+1
    assert rows[4] == "example.com"         # subdomain folded in


def test_url_dedup_and_domain_caps(spark):
    from zef_spark.pipeline.web import (domain_caps, normalize_url,
                                        parse_url, registered_domain,
                                        url_dedup)
    df = registered_domain(parse_url(normalize_url(_urls(spark))))
    ded = url_dedup(df, "url_norm", order_col="id")
    # 5 raw urls -> 3 canonical; min-id row kept
    kept = {r["url_norm"]: r["id"] for r in ded.collect()}
    assert len(kept) == 3
    assert kept["https://www.shop.co.uk/Items/1?id=1"] == 0
    capped = domain_caps(ded, "domain", max_per_domain=1,
                         order_col="id")
    assert capped.count() == 2  # one per domain


def test_web_ops_chainable(spark):
    from zef_spark import ops as z
    df = _urls(spark)
    out = (df | z.normalize_url | z.parse_url["url_norm"]
           | z.registered_domain)
    assert "domain" in out.columns


def test_fuzzy_join_gram_cap_bounds_work(spark):
    from zef_spark.pipeline.joins import fuzzy_join
    # shared hot prefix "aaaaaaaa" everywhere; distinct tails
    left = _names(spark, [f"aaaaaaaa{i:04d}" for i in range(30)])
    capped = fuzzy_join(left, left, "name", max_distance=1,
                        max_gram_df=5)
    full = fuzzy_join(left, left, "name", max_distance=1)
    # capped recall is a subset of full (documented trade)
    got_c = {(r["name_l"], r["name_r"]) for r in capped.collect()}
    got_f = {(r["name_l"], r["name_r"]) for r in full.collect()}
    assert got_c < got_f
    # a key with a LOW-frequency gram ('13' occurs once) still pairs…
    assert ("aaaaaaaa0013", "aaaaaaaa0013") in got_c
    # …while a key whose every gram is hot is lost — the recall cost
    # the docstring warns about (so max_gram_df defaults to None)
    assert ("aaaaaaaa0000", "aaaaaaaa0000") not in got_c
