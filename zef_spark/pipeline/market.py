"""Market-basket analytics: frequent itemset pairs and association
rules over (basket, item) tables.

Reference parity: the reference exposes `frequencies`, `group_by` and
combinatorial ops (ITF `combinations`) from which basket co-occurrence
is hand-assembled; this module ships the assembled operators directly,
Spark-shaped: pair generation is an equi-join on the basket key (one
hash-partitioned shuffle, fan-out bounded by basket size squared — no
cross join), supports are keyed aggregates, and the only scalar that
moves to the driver plan is the basket count (a 1-row broadcast).

Determinism: supports/confidence/lift are exact integer-count ratios
rounded half-up at the end (`digits`), so any engine reproduces the
values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .._registry import register_op


def frequent_itemset_pairs(df: DataFrame, basket_col: str,
                           item_col: str, min_count: int = 2,
                           digits: int = 6) -> DataFrame:
    """(item_a, item_b, pair_count, support) — unordered item pairs
    co-occurring in at least ``min_count`` distinct baskets, with
    support = pair_count / n_baskets. Duplicate (basket, item) rows
    collapse first (a basket holds an itemSET).

    Plan: distinct (basket, item) → self equi-join on the basket key
    with ``item_a < item_b`` (hash join; fan-out is per-basket
    |items|², never |corpus|²) → one (a, b) hash agg. The basket
    total joins in as a 1-row broadcast. At 100 TB the basket key is
    the natural partitioner; a pathological mega-basket is the only
    skew source and is data-quality, not plan, territory."""
    items = (df.select(F.col(basket_col).alias("__bk"),
                       F.col(item_col).alias("__it"))
             .where(F.col("__bk").isNotNull()
                    & F.col("__it").isNotNull())
             .distinct())
    left = items.select("__bk", F.col("__it").alias("item_a"))
    right = items.select("__bk", F.col("__it").alias("item_b"))
    pairs = (left.join(right, "__bk")
             .where(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("pair_count"))
             .where(F.col("pair_count") >= int(min_count)))
    n_baskets = items.select("__bk").distinct() \
        .agg(F.count(F.lit(1)).alias("__nb"))
    return (pairs.crossJoin(F.broadcast(n_baskets))
            .select("item_a", "item_b", "pair_count",
                    F.round(F.col("pair_count")
                            / F.col("__nb"), digits).alias("support")))


def association_rules(df: DataFrame, basket_col: str, item_col: str,
                      min_count: int = 2, min_confidence: float = 0.0,
                      digits: int = 6) -> DataFrame:
    """(antecedent, consequent, pair_count, support, confidence,
    lift) — both directions of every frequent pair:

        confidence(a→b) = count(ab) / count(a)
        lift(a→b)       = n_baskets · count(ab) / (count(a)·count(b))

    lift > 1 means b is over-represented in a's baskets (the classic
    basket-affinity signal); lift is symmetric, confidence is not.

    Plan: the pair table from frequent_itemset_pairs (one basket-key
    shuffle) + one item-support agg joined twice by item key (hash
    joins — the item side is |vocabulary|-bounded, partitionable, and
    never quadratic). Exact integer ratios, rounded at the end."""
    items = (df.select(F.col(basket_col).alias("__bk"),
                       F.col(item_col).alias("__it"))
             .where(F.col("__bk").isNotNull()
                    & F.col("__it").isNotNull())
             .distinct())
    left = items.select("__bk", F.col("__it").alias("item_a"))
    right = items.select("__bk", F.col("__it").alias("item_b"))
    pairs = (left.join(right, "__bk")
             .where(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("pair_count"))
             .where(F.col("pair_count") >= int(min_count)))
    # emit both rule directions from the unordered pair
    rules = pairs.select(
        F.explode(F.array(
            F.struct(F.col("item_a").alias("antecedent"),
                     F.col("item_b").alias("consequent")),
            F.struct(F.col("item_b").alias("antecedent"),
                     F.col("item_a").alias("consequent")))).alias("__r"),
        "pair_count").select("__r.antecedent", "__r.consequent",
                             "pair_count")
    supp = items.groupBy(F.col("__it").alias("__item")) \
        .agg(F.count(F.lit(1)).alias("__cnt"))
    n_baskets = items.select("__bk").distinct() \
        .agg(F.count(F.lit(1)).alias("__nb"))
    out = (rules
           .join(supp.withColumnRenamed("__item", "antecedent")
                 .withColumnRenamed("__cnt", "__ca"), "antecedent")
           .join(supp.withColumnRenamed("__item", "consequent")
                 .withColumnRenamed("__cnt", "__cb"), "consequent")
           .crossJoin(F.broadcast(n_baskets)))
    conf = F.col("pair_count") / F.col("__ca")
    return (out.where(conf >= float(min_confidence))
            .select("antecedent", "consequent", "pair_count",
                    F.round(F.col("pair_count") / F.col("__nb"),
                            digits).alias("support"),
                    F.round(conf, digits).alias("confidence"),
                    F.round(F.col("__nb") * F.col("pair_count")
                            / (F.col("__ca") * F.col("__cb")),
                            digits).alias("lift")))


@register_op("frequent_itemset_pairs", "df")
def _fip_op(df, *args, **kw):
    return frequent_itemset_pairs(df, *args, **kw)


@register_op("association_rules", "df")
def _ar_op(df, *args, **kw):
    return association_rules(df, *args, **kw)
