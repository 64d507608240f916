"""Canonical entity schema and constants.

Mirrors the reference's data model (SURVEY.md §1; /root/reference
test/extract/input1.osm fixture shape) as one heterogeneous DataFrame:

  type: 0=node, 1=way, 2=relation  (reference: osmium::item_type)
  id/version/visible/changeset/ts/uid/user: common metadata
  ts: epoch MICROSECONDS (canonical unit everywhere — parquet derivations
      use unix_micros and the OPL reader/writer converts from/to the
      format's ISO-8601 seconds, sources/opl.py)
  tags: map<string,string>
  lon/lat: fixed-point int32 nanodegree*10 (degree × 1e7) — identical to
      osmium::Location's int32 fixed-point representation so point-in-polygon
      is bit-exact integer math (reference src/extract/extract_polygon.cpp:140-151)
  refs: ordered node refs (ways)
  members: array<struct<mtype,ref,role>> (relations)
"""

from __future__ import annotations

from pyspark.sql import types as T

NODE = 0
WAY = 1
RELATION = 2
CHANGESET = 3

TYPE_NAMES = {NODE: "node", WAY: "way", RELATION: "relation"}
NAME_TO_TYPE = {v: k for k, v in TYPE_NAMES.items()}

# degree -> fixed-point int32 scale (osmium::Location precision)
COORD_SCALE = 10_000_000

MEMBER_TYPE = T.StructType(
    [
        T.StructField("mtype", T.IntegerType(), False),
        T.StructField("ref", T.LongType(), False),
        T.StructField("role", T.StringType(), True),
    ]
)

ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("type", T.IntegerType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("version", T.IntegerType(), True),
        T.StructField("visible", T.BooleanType(), True),
        T.StructField("changeset", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("uid", T.IntegerType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("lon", T.IntegerType(), True),
        T.StructField("lat", T.IntegerType(), True),
        T.StructField("refs", T.ArrayType(T.LongType()), True),
        T.StructField("members", T.ArrayType(MEMBER_TYPE), True),
    ]
)

# BASELINE.json input_hint: the engine's native input table
IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), False),
    ]
)


def fp(degree: float) -> int:
    """Degree -> fixed-point int (osmium::Location semantics)."""
    return int(round(degree * COORD_SCALE))
