"""Local stand-in for the driver's t2 correctness gate: run each
__spark_entry__ query on Spark AND its oracle SQL on DuckDB over the
same parquet, compare row-count, column names, and order-insensitive
values. Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Vacuity guard (r05 verdict §2): a PASS on 0 rows proves nothing —
# empty==empty let a dead literal ('GERMANY' vs NATION_* fixtures) sit
# green through three tri-scale sweeps. Queries whose EXPECTED result
# is empty must be allowlisted here; everything else fails on 0 rows.
INTENTIONALLY_EMPTY: set[str] = set()


def duck_run(sf_dir: str, sql: str):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def normalize(rows, cols):
    """Sort columns by name, stringify values (round-trip floats to
    9 sig figs), sort rows — order-insensitive canonical form.

    Dtype-STRICT on numeric kind: int-kind and float-kind values get
    distinct prefixes so an oracle column that DuckDB widens to
    HUGEINT/decimal-→-float can never string-match a Spark bigint
    here while failing the driver's value-hash (the r04
    p_pack_sequences artifact). Decimals canonicalize to float-kind —
    that matches how the driver's hash renders them on both sides.
    """
    import numpy as np
    from decimal import Decimal
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def canon(v):
        if v is None:
            return "∅"
        import pandas as pd
        if v is pd.NaT:
            return "∅"
        if isinstance(v, (bool, np.bool_)):
            return "b:" + str(bool(v)).lower()
        if isinstance(v, Decimal):
            v = float(v)
        if isinstance(v, (float, np.floating)):
            return "∅" if math.isnan(v) else f"f:{float(v):.9g}"
        if isinstance(v, (int, np.integer)):
            return f"i:{int(v)}"
        return str(v)
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


# r06 verdict order #1: the driver hashes RAW value renderings, so a
# Spark DECIMAL(28,2) "1166.10" can never match the DuckDB→pandas float
# "1166.1" even when numerically identical (the e_rfm_segments red row).
# normalize() canonicalizes Decimal→float, which MASKS exactly that
# class locally — so strict-decimal mode (default ON) fails any query
# whose Spark output schema still contains a DecimalType column.
# Allowlist only if the driver is known to hash it green.
DECIMAL_OK: set[str] = set()


def decimal_output_cols(sdf) -> list[str]:
    from pyspark.sql.types import DecimalType
    return [f.name for f in sdf.schema.fields
            if isinstance(f.dataType, DecimalType)]


def check(name: str, fn, sql: str, spark, sf_dir: str) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    dec = decimal_output_cols(sdf)
    if dec and name not in DECIMAL_OK:
        return False, (f"STRICT-DECIMAL: output cols {dec} are DecimalType"
                       " — cast to DOUBLE on both sides (driver hashes raw"
                       " renderings; '1166.10' != '1166.1')")
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    ddf = duck_run(sf_dir, sql)
    drows = [tuple(r) for r in ddf.itertuples(index=False)]
    dcols = list(ddf.columns)
    if sorted(scols) != sorted(dcols):
        return False, f"schema mismatch: spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"row count: spark={len(srows)} duck={len(drows)}"
    a, b = normalize(srows, scols), normalize(drows, dcols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    if not srows and name not in INTENTIONALLY_EMPTY:
        return False, ("VACUOUS: 0 rows on both sides — allowlist in "
                       "INTENTIONALLY_EMPTY only if empty is the "
                       "intended result")
    return True, f"OK ({len(srows)} rows)"


def main():
    import __spark_entry__ as entry
    from zef_spark import get_spark
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entry.queries(), entry.oracle_sql()
    failed, checked = [], 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        if name not in oracles:
            try:
                n = fn(spark, sf_dir).count()
                if n == 0 and name not in INTENTIONALLY_EMPTY:
                    failed.append(name)
                    print(f"  {name:40s} FAIL VACUOUS (0 rows)")
                else:
                    print(f"  {name:40s} rows-only ({n} rows)")
            except Exception as e:
                failed.append(name)
                print(f"  {name:40s} ERROR {type(e).__name__}: {e}")
            continue
        try:
            ok, msg = check(name, fn, oracles[name], spark, sf_dir)
        except Exception as e:
            ok, msg = False, f"ERROR {type(e).__name__}: {str(e)[:300]}"
        print(f"  {name:40s} {'PASS' if ok else 'FAIL'} {msg}")
        if not ok:
            failed.append(name)
    print(f"\n{checked - len(failed)}/{checked} pass"
          + ("" if not only else f" (subset of {len(qs)} registered)"))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
