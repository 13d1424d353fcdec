"""Web-corpus curation: URL parsing, normalization, registered-domain
extraction, and per-domain dedup/stats.

Web-scale training corpora (C4, RefinedWeb, FineWeb) key nearly every
curation decision off the URL: canonical-URL exact dedup, per-domain
caps, domain blocklists, domain mixing weights. The reference has no
URL layer (its ingest is typed graph wishes); these ops make the URL a
first-class column.

Scale notes: every op here is row-local string work (zero shuffle)
except the dedup/stats groupBys, which shuffle once on the normalized
URL / domain — exactly the key the downstream cap/mix step needs, so
the partitioning is reused. No UDFs: everything is built-in Column
functions (split / filter-lambda / array_join / regexp), i.e. inside
whole-stage codegen.

Engine-portability constraint (honored deliberately): no regex
lookarounds — the expressions mirror 1:1 into RE2-based engines
(DuckDB/Trino) so results are bit-identical across the oracle pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .._registry import register_op

#: query params that never identify content (tracking/session junk)
TRACKING_PARAMS = ("utm_", "gclid", "fbclid", "msclkid", "ref",
                   "sessionid", "phpsessid")

#: second-level labels that act as public suffixes (heuristic subset;
#: a production deploy swaps in the full Mozilla PSL as a broadcast map)
_SLD_SUFFIXES = ("co", "com", "net", "org", "ac", "gov", "edu")


def parse_url(df: DataFrame, col: str = "url") -> DataFrame:
    """Split ``col`` into scheme/host/port/path/query/fragment columns
    (empty string when absent). Pure regexp_extract — row-local."""
    u = F.col(col)
    return (df
            .withColumn("scheme", F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)))
            .withColumn("host", F.lower(F.regexp_extract(u, r"^[^:]+://([^/:?#]+)", 1)))
            .withColumn("port", F.regexp_extract(u, r"^[^:]+://[^/:?#]+:([0-9]+)", 1))
            .withColumn("path", F.regexp_extract(u, r"^[^:]+://[^/?#]*([^?#]*)", 1))
            .withColumn("query", F.regexp_extract(u, r"^[^#]*?\?([^#]*)", 1))
            .withColumn("fragment", F.regexp_extract(u, r"#(.*)$", 1)))


def _clean_query(qcol):
    """Drop tracking params from a raw query string, preserving the
    order of the survivors. split → lambda filter → rejoin; the
    prefix test is plain `startswith`/equality, no regex."""
    parts = F.split(qcol, "&")

    def is_junk(p):
        cond = p.startswith("utm_")
        for name in TRACKING_PARAMS[1:]:
            cond = cond | p.startswith(name + "=")
        return cond
    return F.array_join(F.filter(parts, lambda p: ~is_junk(p)), "&")


def normalize_url(df: DataFrame, col: str = "url",
                  out: str = "url_norm") -> DataFrame:
    """Canonical form for exact-URL dedup: lowercase scheme+host, strip
    the fragment, strip default ports (:80 http / :443 https), drop
    tracking query params, default empty path to "/", and drop a
    trailing "?" left by an emptied query. Deterministic, row-local.
    """
    u = F.col(col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    # authority INCLUDING any :port — default ports stripped just below
    host = F.lower(F.regexp_extract(u, r"^[^:]+://([^/?#]+)", 1))
    # strip default port for the scheme; keep explicit non-default ports
    host = F.when((scheme == "http") & host.endswith(":80"),
                  F.substring(host, F.lit(1), F.length(host) - 3)) \
            .when((scheme == "https") & host.endswith(":443"),
                  F.substring(host, F.lit(1), F.length(host) - 4)) \
            .otherwise(host)
    path = F.regexp_extract(u, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = _clean_query(F.regexp_extract(u, r"^[^#]*?\?([^#]*)", 1))
    norm = F.concat(scheme, F.lit("://"), host, path,
                    F.when(query == "", F.lit(""))
                    .otherwise(F.concat(F.lit("?"), query)))
    return df.withColumn(out, norm)


def registered_domain(df: DataFrame, host_col: str = "host",
                      out: str = "domain") -> DataFrame:
    """Heuristic eTLD+1: the last two host labels, or the last three
    when the second-to-last label is a common public second-level
    suffix under a 2-char ccTLD (co.uk, com.au, ...). Row-local array
    slicing; swap in the full public-suffix list (broadcast map join)
    for production crawls."""
    labels = F.split(F.col(host_col), r"\.")
    n = F.size(labels)
    sld = F.element_at(labels, n - 1)
    tld = F.element_at(labels, n)
    three = (n >= 3) & (F.length(tld) == 2) & sld.isin(*_SLD_SUFFIXES)
    dom = F.when(three, F.concat_ws(
        ".", F.element_at(labels, n - 2), sld, tld)) \
           .otherwise(F.when(n >= 2, F.concat_ws(".", sld, tld))
                      .otherwise(F.col(host_col)))
    return df.withColumn(out, dom)


def url_dedup(df: DataFrame, url_col: str = "url_norm",
              order_col: str | None = None) -> DataFrame:
    """Keep one row per normalized URL — the min(order_col) row when
    given (deterministic canonical pick), else any-first via min on
    all remaining columns packed by struct. One shuffle on the URL."""
    if order_col is None:
        others = [c for c in df.columns if c != url_col]
        return (df.groupBy(url_col)
                .agg(F.min(F.struct(*others)).alias("__r"))
                .select(url_col, *[F.col(f"__r.{c}").alias(c)
                                   for c in others]))
    others = [c for c in df.columns if c not in (url_col, order_col)]
    return (df.groupBy(url_col)
            .agg(F.min(F.struct(order_col, *others)).alias("__r"))
            .select(url_col, F.col(f"__r.{order_col}").alias(order_col),
                    *[F.col(f"__r.{c}").alias(c) for c in others]))


def domain_caps(df: DataFrame, domain_col: str = "domain",
                max_per_domain: int = 1000,
                order_col: str | None = None) -> DataFrame:
    """Per-domain document cap (anti-spam / diversity control in web
    corpora): keep at most ``max_per_domain`` rows per domain, lowest
    ``order_col`` first (deterministic). One shuffle on the domain."""
    from pyspark.sql import Window
    order = F.col(order_col) if order_col else F.monotonically_increasing_id()
    w = Window.partitionBy(domain_col).orderBy(order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_per_domain).drop("__rn"))


@register_op("parse_url", "df")
def _parse_url(df, col="url"):
    return parse_url(df, col)


@register_op("normalize_url", "df")
def _normalize_url(df, col="url", out="url_norm"):
    return normalize_url(df, col, out)


@register_op("registered_domain", "df")
def _registered_domain(df, host_col="host", out="domain"):
    return registered_domain(df, host_col, out)


@register_op("url_dedup", "df")
def _url_dedup(df, url_col="url_norm", order_col=None):
    return url_dedup(df, url_col, order_col)


@register_op("domain_caps", "df")
def _domain_caps(df, domain_col="domain", max_per_domain=1000,
                 order_col=None):
    return domain_caps(df, domain_col, max_per_domain, order_col)
