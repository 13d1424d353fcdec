"""Filter/order/pagination/aggregate → DataFrame plan compiler.

Reference parity: build_filter_zefop + scalar_comparison_op
(python/zef/graphql/simplegql/generate_api2.py:785-861),
maybe_sort_result (:871-896), maybe_paginate_result (:900-905),
resolve_aggregate (:442-480). Semantics copied exactly:

- top level and every nesting level of a filter dict is an implicit AND
- ``and`` / ``or`` take lists of sub-filters; ``not`` one sub-filter
- ``id`` is an IN-list on the type's id column
- scalar comparisons {eq,in,contains,lt,le,gt,ge,between:{min,max}}
  are null-guarded (NULL fails every comparison)
- a bare bool means {eq: bool}
- relation filters: many-to-one = non-null + target matches sub-filter;
  list = {any: f} / {all: f} (vacuously true on empty) / {size: cmp}

Spark-first design: instead of per-object predicate closures, every
relation sub-filter becomes a DISTINCT key set of the parent's join
key, left-joined in as a boolean flag; the whole filter tree then
compiles to one boolean Column over the flagged DataFrame. Arbitrary
and/or/not nesting over EXISTS-style conditions works uniformly, the
flag joins are plain equi-joins Catalyst can broadcast when small, and
AQE handles skew. No correlated subqueries, no driver loops.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schema import GqlSchema, GqlType

_SCALAR_OPS = {"eq", "in", "contains", "lt", "le", "gt", "ge", "between"}


def _scalar_cmp(col, sub) -> F.Column:
    """generate_api2.py:839-861 — AND of ops, null-guarded."""
    if isinstance(sub, bool):
        sub = {"eq": sub}
    cond = col.isNotNull()
    for op, v in sub.items():
        if op == "eq":
            c = col == F.lit(v)
        elif op == "in":
            c = col.isin(list(v))
        elif op == "contains":
            c = col.contains(v)
        elif op == "lt":
            c = col < F.lit(v)
        elif op == "le":
            c = col <= F.lit(v)
        elif op == "gt":
            c = col > F.lit(v)
        elif op == "ge":
            c = col >= F.lit(v)
        elif op == "between":
            c = (col >= F.lit(v["min"])) & (col <= F.lit(v["max"]))
        else:
            raise ValueError(f"unknown comparison operator: {op}")
        cond = cond & c
    return cond


class FilterCompiler:
    """Compiles one filter tree against one type into (augmented
    DataFrame, predicate Column)."""

    def __init__(self, schema: GqlSchema, load):
        self.schema = schema
        self.load = load            # type name -> base DataFrame
        self._flag_ids = itertools.count()

    def apply(self, tname: str, df: DataFrame, fil: dict | None
              ) -> DataFrame:
        if not fil:
            return df
        df2, pred = self._augment(tname, df, fil)
        return df2.where(pred).select(*df.columns)

    # -- internals ----------------------------------------------------

    def _augment(self, tname: str, df: DataFrame, fil: dict
                 ) -> tuple[DataFrame, F.Column]:
        t = self.schema[tname]
        pred = F.lit(True)
        for key, sub in fil.items():
            if key == "and":
                for part in sub:
                    df, p = self._augment(tname, df, part)
                    pred = pred & p
            elif key == "or":
                p_or = F.lit(False)
                for part in sub:
                    df, p = self._augment(tname, df, part)
                    p_or = p_or | p
                pred = pred & p_or
            elif key == "not":
                df, p = self._augment(tname, df, sub)
                pred = pred & ~p
            elif key == "id":
                pred = pred & F.col(t.id_col).isin(list(sub))
            elif key in t.fields:
                pred = pred & _scalar_cmp(F.col(t.fields[key]), sub)
            elif key in t.relations:
                df, p = self._relation_pred(t, key, df, sub)
                pred = pred & p
            else:
                raise ValueError(f"unknown filter field {tname}.{key}")
        return df, pred

    def _flag_join(self, df: DataFrame, keys: DataFrame, local_key: str
                   ) -> tuple[DataFrame, str]:
        """Left-join a distinct key set as a boolean flag column."""
        flag = f"__gql_flag_{next(self._flag_ids)}"
        keys = keys.withColumn(flag, F.lit(True))
        return df.join(keys, df[local_key] == keys["__gql_key"], "left") \
                 .drop("__gql_key"), flag

    def _relation_pred(self, t: GqlType, fname: str, df: DataFrame, sub
                       ) -> tuple[DataFrame, F.Column]:
        rel = t.relations[fname]
        target_df = self.load(rel.target)

        if not rel.is_list:
            # many-to-one: non-null + related row matches (generate_
            # api2.py:830-832 And[Not[equals[None]]][sub_fil])
            matching = self.apply(rel.target, target_df, sub)
            keys = matching.select(
                F.col(rel.remote_key).alias("__gql_key")).distinct()
            df, flag = self._flag_join(df, keys, rel.local_key)
            return df, (F.col(rel.local_key).isNotNull() &
                        F.coalesce(F.col(flag), F.lit(False)))

        pred = F.lit(True)
        for lk, ls in sub.items():
            if lk == "any":
                matching = self.apply(rel.target, target_df, ls)
                keys = matching.select(F.col(rel.remote_key)
                                       .alias("__gql_key")).distinct()
                df, flag = self._flag_join(df, keys, rel.local_key)
                pred = pred & F.coalesce(F.col(flag), F.lit(False))
            elif lk == "all":
                # vacuous truth on empty: NOT EXISTS a violating row
                tgt, p = self._augment(rel.target, target_df, ls)
                violating = tgt.where(~p).select(
                    F.col(rel.remote_key).alias("__gql_key")).distinct()
                df, flag = self._flag_join(df, violating, rel.local_key)
                pred = pred & F.col(flag).isNull()
            elif lk == "size":
                counts = (target_df.groupBy(
                    F.col(rel.remote_key).alias("__gql_key"))
                    .agg(F.count(F.lit(1)).alias("__gql_cnt")))
                flag = f"__gql_flag_{next(self._flag_ids)}"
                df = (df.join(counts,
                              df[rel.local_key] == counts["__gql_key"],
                              "left")
                      .drop("__gql_key")
                      .withColumnRenamed("__gql_cnt", flag))
                pred = pred & _scalar_cmp(
                    F.coalesce(F.col(flag), F.lit(0)), ls)
            else:
                raise ValueError(f"unknown list filter keyword: {lk}")
        return df, pred


def apply_order(t: GqlType, df: DataFrame, order) -> DataFrame:
    """maybe_sort_result (generate_api2.py:871-896): {asc|desc: field,
    then: {...}} chains."""
    if order is None:
        return df
    keys = []
    cur = order
    while cur is not None:
        if "asc" in cur:
            keys.append(F.col(t.fields[cur["asc"]]).asc())
        elif "desc" in cur:
            keys.append(F.col(t.fields[cur["desc"]]).desc())
        cur = cur.get("then")
    return df.orderBy(*keys) if keys else df


def apply_pagination(df: DataFrame, first=None, offset=None) -> DataFrame:
    """maybe_paginate_result (:900-905): skip[offset] | take[first]."""
    if offset:
        df = df.offset(offset)
    if first is not None:
        df = df.limit(first)
    return df


def run_query(schema: GqlSchema, load, tname: str, fil=None, order=None,
              first=None, offset=None, columns=None) -> DataFrame:
    """query<T>(filter, order, first, offset) → DataFrame of gql-named
    scalar columns (resolve_query2, generate_api2.py:720-758)."""
    t = schema[tname]
    df = FilterCompiler(schema, load).apply(tname, load(tname), fil)
    df = apply_order(t, df, order)
    df = apply_pagination(df, first, offset)
    names = columns or list(t.fields)
    return df.select(*[F.col(t.fields[n]).alias(n) for n in names])


def run_aggregate(schema: GqlSchema, load, tname: str, fil=None
                  ) -> DataFrame:
    """aggregate<T>(filter) → one row: count + <field>{Min,Max,Sum,Avg}
    for every numeric field (generate_api2.py:119-204,442-480)."""
    t = schema[tname]
    base = load(tname)
    df = FilterCompiler(schema, load).apply(tname, base, fil)
    aggs = [F.count(F.lit(1)).alias("count")]
    for fname, col in t.numeric_fields(base).items():
        aggs += [F.min(col).alias(f"{fname}Min"),
                 F.max(col).alias(f"{fname}Max"),
                 F.sum(col).alias(f"{fname}Sum"),
                 F.avg(col).alias(f"{fname}Avg")]
    return df.agg(*aggs)
