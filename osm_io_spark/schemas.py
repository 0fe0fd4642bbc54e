"""Typed schemas for every table the engine produces or consumes.

Mirrors the reference's data model (SURVEY.md §1):
- Node/Way/Relation: /root/reference/src/osm/model/{node,way,relation}.rs
- Tag array preserves duplicate keys + order (tag.rs:1-5)
- images: driver-mandated probe table (BASELINE.json input_hint)
- polygons: assembled build side (FIXTURES.md §7)
"""

from __future__ import annotations

from pyspark.sql import types as T

TAGS = T.ArrayType(T.StructType([
    T.StructField("k", T.StringType(), False),
    T.StructField("v", T.StringType(), False),
]), False)

_ELEMENT_META = [
    T.StructField("id", T.LongType(), False),
    T.StructField("version", T.IntegerType(), False),
    T.StructField("timestamp", T.LongType(), True),   # epoch millis
    T.StructField("changeset", T.LongType(), True),
    T.StructField("uid", T.IntegerType(), True),
    T.StructField("user", T.StringType(), True),
    T.StructField("visible", T.BooleanType(), False),
    T.StructField("tags", TAGS, False),
]

NODES = T.StructType([
    _ELEMENT_META[0], _ELEMENT_META[1],
    T.StructField("lat", T.DoubleType(), False),
    T.StructField("lon", T.DoubleType(), False),
    *_ELEMENT_META[2:],
])

WAYS = T.StructType([
    *_ELEMENT_META[:2],
    T.StructField("refs", T.ArrayType(T.LongType(), False), False),
    *_ELEMENT_META[2:],
])

MEMBERS = T.ArrayType(T.StructType([
    T.StructField("type", T.StringType(), False),   # Node | Way | Relation
    T.StructField("id", T.LongType(), False),
    T.StructField("role", T.StringType(), False),
]), False)

RELATIONS = T.StructType([
    *_ELEMENT_META[:2],
    T.StructField("members", MEMBERS, False),
    *_ELEMENT_META[2:],
])

# Driver-mandated image probe table (BASELINE.json:15) + engine-derived
# geotag/cell columns.
IMAGES = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType(), True),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("fmt", T.StringType(), False),
    T.StructField("caption", T.StringType(), True),
    T.StructField("phash", T.LongType(), True),
    T.StructField("lat", T.DoubleType(), False),
    T.StructField("lon", T.DoubleType(), False),
])

RING = T.ArrayType(T.StructType([
    T.StructField("lon", T.DoubleType(), False),
    T.StructField("lat", T.DoubleType(), False),
]), False)

POLYGONS = T.StructType([
    T.StructField("polygon_id", T.LongType(), False),
    T.StructField("source", T.StringType(), False),      # way | relation
    T.StructField("rings", T.ArrayType(RING, False), False),
    T.StructField("left", T.DoubleType(), False),
    T.StructField("bottom", T.DoubleType(), False),
    T.StructField("right", T.DoubleType(), False),
    T.StructField("top", T.DoubleType(), False),
    T.StructField("tags", TAGS, False),
])

BLOB_DESC = T.StructType([
    T.StructField("path", T.StringType(), False),
    T.StructField("blob_index", T.LongType(), False),
    T.StructField("offset", T.LongType(), False),
    T.StructField("length", T.LongType(), False),
    T.StructField("blob_type", T.StringType(), False),  # OSMHeader | OSMData
])
