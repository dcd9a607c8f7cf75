"""Canonical schemas of the engine.

Mirrors the reference's data model (SURVEY.md §1):
- ``ValueRecord``/``Entry``  -> one row per object in a sorted snapshot
  (reference: pkg/graveler/graveler.go:443-457, pkg/catalog/catalog.proto:10-26)
- staged change rows carry ``is_tombstone`` (nil-Value tombstones,
  reference: pkg/graveler/graveler.go:455-457)
- Range / MetaRange manifests
  (reference: pkg/graveler/committed/range.go:10-17,
   pkg/graveler/committed/meta_range_writer.go:149-182)

``identity`` is kept as a lowercase-hex *string* (not binary) so results
hash identically across Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import types as T

ENTRY_FIELDS = [
    T.StructField("key", T.StringType(), False),
    T.StructField("identity", T.StringType(), False),
    T.StructField("address", T.StringType(), True),
    T.StructField("address_type", T.StringType(), True),
    T.StructField("size", T.LongType(), True),
    T.StructField("etag", T.StringType(), True),
    T.StructField("last_modified", T.TimestampType(), True),
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("content_type", T.StringType(), True),
]

ENTRY_SCHEMA = T.StructType(ENTRY_FIELDS)

# Staged change = entry columns + tombstone marker + layer priority.
# ``seq`` orders overlay layers: active staging token = 0, sealed tokens
# 1..n, committed snapshot = a large sentinel (see operators/overlay.py).
STAGED_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("is_tombstone", T.BooleanType(), False),
    ]
    + ENTRY_FIELDS
)

RANGE_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("range_id", T.StringType(), False),
        T.StructField("min_key", T.StringType(), False),
        T.StructField("max_key", T.StringType(), False),
        T.StructField("count", T.LongType(), False),
        T.StructField("estimated_size", T.LongType(), False),
    ]
)

ENTRY_COLS = [f.name for f in ENTRY_FIELDS]
