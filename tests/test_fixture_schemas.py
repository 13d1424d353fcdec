"""Fail LOUDLY (with a targeted message) if the driver-generated
testdata fixtures change shape underneath us, instead of breaking
mid-plan in dozens of downstream tests.

Round-3 postmortem: events.parquet `ts` silently flipped from int64
ns-epoch to timestamp[us] and the stale conversion shim took down 7
CORRECTNESS rows, 6 tests, and the whole bench. `load_events`
(zef_spark/sources.py) now branches on the read dtype; this test
pins the set of dtypes it knows how to handle.
"""

import pyarrow.parquet as pq
import pytest

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# ts physical types load_events handles. Anything else must fail HERE.
_EVENT_TS_OK = {"int64", "timestamp[us]", "timestamp[ns]",
                "timestamp[us, tz=UTC]"}


def test_all_tables_present(sf_dir):
    for t in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        assert len(schema) > 0, f"{t}.parquet has no columns"


def test_events_ts_dtype_supported(sf_dir):
    schema = pq.read_schema(f"{sf_dir}/events.parquet")
    ts = str(schema.field("ts").type)
    assert ts in _EVENT_TS_OK, (
        f"events.parquet ts is now {ts!r} — extend "
        "zef_spark.sources.load_events to normalize it (this assertion "
        "exists so a fixture regeneration fails in ONE place)")


def test_load_events_normalizes_to_ntz(spark, sf_dir):
    from pyspark.sql.types import TimestampNTZType
    from zef_spark.sources import load_events
    ev = load_events(spark, f"{sf_dir}/events.parquet")
    assert isinstance(ev.schema["ts"].dataType, TimestampNTZType)
    assert ev.limit(1).count() == 1


def test_key_columns_exist(sf_dir):
    expectations = {
        "lineitem": {"l_orderkey", "l_partkey", "l_quantity",
                     "l_extendedprice", "l_discount", "l_shipdate"},
        "orders": {"o_orderkey", "o_custkey", "o_totalprice",
                   "o_orderdate"},
        "customer": {"c_custkey", "c_nationkey", "c_acctbal"},
        "events": {"event_id", "ts", "user_id", "event_type", "value"},
        "documents": {"doc_id", "text", "lang", "source"},
        "embeddings": {"vec_id", "embedding", "label"},
    }
    for table, cols in expectations.items():
        names = set(pq.read_schema(f"{sf_dir}/{table}.parquet").names)
        missing = cols - names
        assert not missing, f"{table}.parquet lost columns: {missing}"


def test_critical_column_dtypes_pinned(sf_dir):
    """Columns whose PHYSICAL type the engine's plans assume (decimal
    discipline, embedding kernels, timestamp joins). A regeneration
    that flips one should fail here with a named column, not as a
    value-hash mismatch three layers down."""
    expect = {
        "lineitem": {"l_quantity": {"double"},
                     "l_extendedprice": {"double"},
                     "l_discount": {"double"},
                     "l_shipdate": {"timestamp[us]", "timestamp[ns]"}},
        "orders": {"o_totalprice": {"double"},
                   "o_orderdate": {"timestamp[us]", "timestamp[ns]"}},
        "documents": {"text": {"string", "large_string"},
                      "n_chars": {"int64", "int32"}},
        "embeddings": {"embedding": {"list<element: float>",
                                     "list<element: double>"}},
        "events": {"value": {"double"}, "user_id": {"int64"},
                   "props": {"string", "large_string"}},
    }
    for table, cols in expect.items():
        schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
        types = {f.name: str(f.type) for f in schema}
        for col, ok in cols.items():
            assert types.get(col) in ok, (
                f"{table}.{col} is now {types.get(col)!r} (handled: "
                f"{sorted(ok)}) — audit every query touching it before "
                "extending this set")
