"""Bitemporal graph table schemas (SURVEY §1.6 mapping).

The reference's append-only blob log (core/include/blobs.h:68-330,
mmap.h:34-60) becomes four columnar tables; tombstone edges
(TERMINATION_EDGE, blobs.h:252-268) become SCD-2 interval columns, and
the value-assignment history (ATTRIBUTE_VALUE_ASSIGNMENT_EDGE,
blobs.h:284) becomes interval rows in ``attr_values``.

Scale notes (100 TB posture):
- nodes/edges partitioned by ``et`` / ``rt`` on disk → the Spark-native
  "delegate index" (partition pruning replaces the reference's
  RAE_INSTANCE_EDGE spine, SURVEY §4).
- edges additionally bucketed by ``src_id`` so hop joins co-locate;
  a dst-ordered projection can be maintained for heavy In-traversals.
- ids are deterministic functions of (type, business key) — no
  monotonically_increasing_id, so regeneration is reproducible and
  joins never depend on nondeterministic state.
"""

from __future__ import annotations

from pyspark.sql import types as T

TXS_SCHEMA = T.StructType([
    T.StructField("tx_id", T.LongType(), False),
    T.StructField("time", T.TimestampNTZType(), False),
])

NODES_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("et", T.StringType(), False),      # ET.* or AET.* token name
    T.StructField("uid", T.StringType(), True),
    T.StructField("valid_from_tx", T.LongType(), False),
    T.StructField("valid_to_tx", T.LongType(), True),  # NULL = open
])

EDGES_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("rt", T.StringType(), False),
    T.StructField("uid", T.StringType(), True),
    T.StructField("src_id", T.LongType(), False),   # may reference edges.id
    T.StructField("dst_id", T.LongType(), False),
    T.StructField("valid_from_tx", T.LongType(), False),
    T.StructField("valid_to_tx", T.LongType(), True),
])

ATTR_VALUES_SCHEMA = T.StructType([
    T.StructField("ae_id", T.LongType(), False),
    # the field/relation token that owns this AE — a per-branch literal
    # in mapper-built graphs, so ``attr_rt = 'x'`` constant-folds away
    # every other union branch (and prunes partitions on disk)
    T.StructField("attr_rt", T.StringType(), True),
    T.StructField("vrt", T.StringType(), False),
    T.StructField("value_str", T.StringType(), True),
    T.StructField("value_int", T.LongType(), True),
    T.StructField("value_float", T.DoubleType(), True),
    T.StructField("value_bool", T.BooleanType(), True),
    T.StructField("value_time", T.TimestampNTZType(), True),
    # QuantityInt/QuantityFloat (reference scalars.h:133,164): value +
    # unit; int-ness is recorded in the vrt, the storage is one double
    T.StructField("value_quantity", T.StructType([
        T.StructField("value", T.DoubleType(), True),
        T.StructField("unit", T.StringType(), True),
    ]), True),
    # ZefEnumValue (reference tokens.h:302-318) as "Type.value" —
    # parquet dictionary-encodes the low-cardinality string for free
    T.StructField("value_enum", T.StringType(), True),
    T.StructField("assigned_at_tx", T.LongType(), False),
    T.StructField("superseded_at_tx", T.LongType(), True),
])

# Temporal tag→RAE naming (reference ASSIGN_TAG_NAME_EDGE /
# NEXT_TAG_NAME_ASSIGNMENT_EDGE, blobs.h:314-334): a tag is a name
# valid for one target over an interval; re-tagging closes the old row.
TAGS_SCHEMA = T.StructType([
    T.StructField("name", T.StringType(), False),
    T.StructField("target_id", T.LongType(), False),
    T.StructField("valid_from_tx", T.LongType(), False),
    T.StructField("valid_to_tx", T.LongType(), True),
])

VALUE_COLS = {
    "String": "value_str",
    "Int": "value_int",
    "Float": "value_float",
    "Bool": "value_bool",
    "Time": "value_time",
    "QuantityInt": "value_quantity",
    "QuantityFloat": "value_quantity",
    "Enum": "value_enum",
    # UserValueType instances: JSON envelope (user_value_type.py)
    "Serialized": "value_str",
}

# physical value columns, deduped (QuantityInt/QuantityFloat share
# one struct column) — use THIS for column iteration, not .values()
VALUE_COL_LIST = list(dict.fromkeys(VALUE_COLS.values()))

# Deterministic id layout: high bits = type code, low 52 bits = key.
# 52 key bits leave 10 bits for type codes (≤1023) within int64 —
# enough for ~4.5e15 distinct keys per type at 100 TB scale.
ID_KEY_BITS = 52


def make_id_expr(type_code: int, key_col):
    from pyspark.sql import functions as F
    return (F.lit(type_code).cast("long") * (1 << ID_KEY_BITS)
            + key_col.cast("long"))
