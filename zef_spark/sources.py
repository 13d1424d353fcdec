"""Sources & sinks (SURVEY §2.A): file/format IO surfaced both as
plain functions and as effect-style ops.

Reference parity: from_csv/to_csv (ITF:7715/7709), read_file/load_file
(ITF:7725/7750 — format sniffing), write_file/save_file
(ITF:7811/7777), to_json/from_json (ITF:7638/7656, whole-object codec
in serialization.py), to_yaml/from_yaml + to_toml/from_toml
(ITF:7678-7700, gated on lib availability), pandas_to_gd (ITF:7836 —
tabular → graph wishes), SQL import (experimental/sql_import.py →
spark.read.jdbc), NetworkX import
(experimental/importers/general.py:67-137).

Spark-first: everything maps onto spark.read/write; format sniffing
keys off extension like the reference's load_file. Driver-local codecs
(yaml/toml/clipboard) stay driver-side by design.
"""

from __future__ import annotations

import json as _json
import os

from pyspark.sql import DataFrame, SparkSession

_EXT_FORMAT = {
    ".csv": "csv", ".tsv": "csv", ".json": "json", ".jsonl": "json",
    ".ndjson": "json", ".parquet": "parquet", ".orc": "orc",
    ".txt": "text",
}


def load_events(spark: SparkSession, path: str,
                ts_col: str = "ts") -> DataFrame:
    """Load an event-log parquet with `ts_col` normalized to
    TIMESTAMP_NTZ regardless of the physical type on disk:
    int64 ns-epoch (read via nanosAsLong), TIMESTAMP(NANOS/MICROS),
    or TIMESTAMP_NTZ. Branching on the read schema means a fixture
    regeneration that flips the physical type cannot silently break
    every downstream events query."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    # nanosAsLong only affects TIMESTAMP(NANOS) columns; harmless
    # (and necessary for old fixtures) to set before the read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    dt = df.schema[ts_col].dataType
    if isinstance(dt, LongType):
        # ns-epoch long → µs. Integer DIV, not `/`: float division of
        # ns longs (> 2^53) loses the last µs digit in the mantissa.
        return df.withColumn(
            ts_col,
            F.timestamp_micros(F.expr(f"{ts_col} DIV 1000"))
            .cast("timestamp_ntz"))
    if isinstance(dt, TimestampNTZType):
        return df
    if isinstance(dt, TimestampType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp_ntz"))
    raise TypeError(
        f"unsupported dtype for event column {ts_col!r}: {dt}")


def from_csv(spark: SparkSession, path: str, header: bool = True,
             infer_schema: bool = True, **opts) -> DataFrame:
    return (spark.read.options(header=header, inferSchema=infer_schema,
                               **opts).csv(path))


def to_csv(df: DataFrame, path: str, header: bool = True, **opts):
    df.write.mode("overwrite").options(header=header, **opts).csv(path)


def load_file(spark: SparkSession, path: str, **opts) -> DataFrame:
    """Format-sniffing load (ITF:7750): extension decides the reader."""
    ext = os.path.splitext(path)[1].lower()
    fmt = _EXT_FORMAT.get(ext)
    if fmt is None:
        raise ValueError(f"cannot sniff format of {path!r}")
    reader = spark.read
    if fmt == "csv":
        reader = reader.options(header=True, inferSchema=True,
                                sep="\t" if ext == ".tsv" else ",")
    return reader.format(fmt).options(**opts).load(path)


def save_file(df: DataFrame, path: str, **opts):
    ext = os.path.splitext(path)[1].lower()
    fmt = _EXT_FORMAT.get(ext)
    if fmt is None:
        raise ValueError(f"cannot sniff format of {path!r}")
    df.write.mode("overwrite").format(fmt).options(**opts).save(path)


def read_file(path: str) -> str:
    """Driver-local raw read (ITF:7725) — small files only."""
    with open(path) as f:
        return f.read()


def write_file(content: str, path: str):
    with open(path, "w") as f:
        f.write(content)


# -- value codecs -----------------------------------------------------

def to_json(value) -> str:
    """Whole-value JSON codec (ITF:7638; serialization.py). Handles
    the engine's value types; DataFrames serialize schema+rows."""
    return _json.dumps(_jsonable(value))


def from_json(s: str):
    """Inverse of to_json: revives `_zef`-tagged payloads back into
    Token / FlatGraph / DataFrame (serialization.py round-trip:
    deserialize(serialize(x)) == x)."""
    return _revive(_json.loads(s))


def _revive(v):
    if isinstance(v, list):
        return [_revive(x) for x in v]
    if not isinstance(v, dict):
        return v
    tag = v.get("_zef")
    if tag == "token":
        from .tokens import Token
        return Token(v["kind"], v["name"])
    if tag == "flatgraph":
        from .flat_graph import FlatGraph
        return FlatGraph.from_rows(v["nodes"], v["edges"],
                                   [tuple(k) for k in v["keys"]])
    if tag == "dataframe":
        from pyspark.sql import SparkSession
        from pyspark.sql import types as T
        spark = SparkSession.getActiveSession()
        schema = T.StructType.fromJson(v["schema"])
        return spark.createDataFrame(v["rows"], schema)
    return {k: _revive(x) for k, x in v.items()}


def _jsonable(v):
    from .flat_graph import FlatEdge, FlatGraph, FlatNode
    from .tokens import Token
    if isinstance(v, Token):
        return {"_zef": "token", "kind": v.kind, "name": v.name}
    if isinstance(v, FlatGraph):
        # field values pass through when JSON-native (lossless
        # round-trip); to_rows()'s repr form is only for DataFrame lift
        jn = (str, int, float, bool, type(None))
        return {"_zef": "flatgraph",
                "nodes": [[n.idx, n.raet,
                           n.value if isinstance(n.value, jn)
                           else repr(n.value), n.origin_uid]
                          for n in v.nodes],
                "edges": [[e.idx, e.rt, e.src, e.dst] for e in v.edges],
                "keys": sorted(v.key_dict)}
    if isinstance(v, DataFrame):
        return {"_zef": "dataframe", "schema": v.schema.jsonValue(),
                "rows": [r.asDict(recursive=True) for r in v.collect()]}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    return v


def to_yaml(value) -> str:
    try:
        import yaml
    except ImportError as ex:  # pragma: no cover
        raise NotImplementedError("pyyaml not installed") from ex
    return yaml.safe_dump(_jsonable(value))


def from_yaml(s: str):
    try:
        import yaml
    except ImportError as ex:  # pragma: no cover
        raise NotImplementedError("pyyaml not installed") from ex
    return yaml.safe_load(s)


def _toml_scalar(v) -> str:
    import datetime
    import json as _json
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, str):
        return _json.dumps(v)          # TOML basic strings are JSON-compatible
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_toml_scalar(x) for x in v) + "]"
    raise NotImplementedError(
        f"to_toml: unsupported scalar type {type(v).__name__}")


def to_toml(value) -> str:
    """Minimal dependency-free TOML writer for the shapes the codec
    family serializes (reference serialization.py parity for config
    round-trips): a top-level dict of scalars/arrays plus nested
    dicts as [tables] (one level of nesting — TOML's common case).
    Values round-trip through tomllib (stdlib) — proven in tests.
    None values are SKIPPED (TOML has no null). For DataFrames use
    the json codec; TOML is a config format, not a data format."""
    value = _jsonable(value)
    if not isinstance(value, dict):
        raise NotImplementedError(
            "to_toml serializes a dict at top level (TOML documents "
            "are tables); wrap scalars, or use to_json")
    lines, tables = [], []
    for k, v in value.items():
        if v is None:
            continue
        key = k if k.replace("_", "").replace("-", "").isalnum() \
            else _toml_scalar(str(k))
        if isinstance(v, dict):
            tbl = [f"[{key}]"]
            for k2, v2 in v.items():
                if v2 is None:
                    continue
                if isinstance(v2, dict):
                    raise NotImplementedError(
                        "to_toml supports one level of table nesting")
                key2 = k2 if k2.replace("_", "").replace("-", "") \
                    .isalnum() else _toml_scalar(str(k2))
                tbl.append(f"{key2} = {_toml_scalar(v2)}")
            tables.append("\n".join(tbl))
        else:
            lines.append(f"{key} = {_toml_scalar(v)}")
    return "\n".join(lines + tables) + "\n"


def from_toml(s: str):
    import tomllib
    return tomllib.loads(s)


# -- tabular / external-graph importers -------------------------------

def pandas_to_gd(pdf, et, key_col: str):
    """pandas DataFrame → graph wishes (ITF:7836 pandas_to_gd): one
    entity per row, scalar columns as fields. Feed the result to
    graph.delta.transact. For bulk scale use graph.mapper instead."""
    from .graph.delta import E
    cols = [c for c in pdf.columns if c != key_col]
    return [E(et, name=str(row[key_col]),
              fields={c: row[c] for c in cols
                      if row[c] is not None and row[c] == row[c]})
            for _, row in pdf.iterrows()]


def from_jdbc(spark: SparkSession, url: str, table: str,
              **opts) -> DataFrame:
    """SQL import (experimental/sql_import.py analogue)."""
    return spark.read.options(**opts).jdbc(url, table)


def networkx_to_wishes(nxg, et_attr: str = "et", rt_attr: str = "rt"):
    """NetworkX graph → wishes (importers/general.py:67-137
    inject_networkx_into_zef analogue)."""
    from .graph.delta import E, R
    from .tokens import ET, RT
    wishes = []
    for n, data in nxg.nodes(data=True):
        et = data.get(et_attr, "Node")
        fields = {k: v for k, v in data.items() if k != et_attr}
        wishes.append(E(ET(et), name=str(n), fields=fields))
    for u, v, data in nxg.edges(data=True):
        wishes.append(R(str(u), RT(data.get(rt_attr, "Edge")), str(v)))
    return wishes
