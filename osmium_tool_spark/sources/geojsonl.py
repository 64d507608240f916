"""Distributed newline-delimited GeoJSON (GeoJSONL / GeoJSON Text
Sequences) source.

The reference reads GeoJSON only driver-side and only for extract
polygon definitions (osmium-extract GeoJSON region files,
src/extract/geojson_file_parser.cpp; mirrored in
functions/geometry.py:241). A training-data pipeline meets GeoJSON the
other way around: feature CORPORA — billions of building footprints /
road segments / admin areas shipped as one-feature-per-line files,
precisely because the line-delimited form is splittable. This source
is the distributed counterpart: `spark.read.text` gives Spark its
normal split generation (a 100 GB .geojsonl fans out across executors
like any text file — no driver-side parse, no single-JSON-document
bottleneck), and ALL parsing is JVM-side Column work
(get_json_object + from_json with per-geometry-type schemas), no
Python in the row path.

Normalized output schema (one row per feature):

  fid        string        feature id ($.id; NULL when absent)
  geom_type  string        Point|LineString|Polygon|MultiPolygon
  rings      array<array<struct<lon:long,lat:long>>>   fixed-point 1e-7
  poly_idx   array<int>    polygon index per ring (MultiPolygon
                           grouping; all zeros otherwise)
  properties map<string,string>

Point/LineString normalize to a single "ring" (one path); Polygon to
its ring list; MultiPolygon flattens rings with `poly_idx` recording
which polygon each ring belongs to. Coordinates parse as doubles and
convert to the engine's fixed-point frame by round(x * 1e7) — exact
for any coordinate printed with <= 7 decimals (the engine's own
writers emit %.7f, so write->read round-trips bit-exactly).

Malformed lines: rows whose geometry type is missing/unsupported keep
geom_type NULL and NULL rings (callers filter or fail loudly — the
permissive-reader contract of spark.read.json's columnNameOfCorruptRecord,
restated for the geometry column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import COORD_SCALE

_POS = "array<double>"          # a single [lon, lat] position
_LINE = f"array<{_POS}>"        # LineString coords / one polygon ring
_POLY = f"array<{_LINE}>"       # Polygon coords (list of rings)
_MPOLY = f"array<{_POLY}>"      # MultiPolygon coords


def _fixed(x: Column) -> Column:
    """Degrees double -> fixed-point long (exact for <=7 printed
    decimals: the double is within 1e-9 relative of the decimal, so
    x*1e7 lands within far less than 0.5 of the integer)."""
    return F.round(x * F.lit(float(COORD_SCALE))).cast("long")


def _ring(coords: Column) -> Column:
    """array<array<double>> -> array<struct<lon:long,lat:long>>."""
    return F.transform(
        coords,
        lambda p: F.struct(
            _fixed(F.get(p, 0)).alias("lon"), _fixed(F.get(p, 1)).alias("lat")
        ),
    )


def _normalize(raw: DataFrame) -> DataFrame:
    """One-feature-JSON-per-row `value` column -> the normalized schema
    (shared by the distributed line reader and the FeatureCollection
    fallback, so both produce byte-identical frames). Leading RS bytes
    (0x1E) are stripped, so RFC 8142 GeoJSON Text Sequences — including
    this engine's own export `to_geojsonseq` output and the reference's
    geojsonseq files — read back directly."""
    raw = raw.withColumn("value", F.regexp_replace("value", "^\x1e+", ""))
    gtype = F.get_json_object("value", "$.geometry.type")
    gcoords = F.get_json_object("value", "$.geometry.coordinates")

    point = F.from_json(gcoords, _POS)
    line = F.from_json(gcoords, _LINE)
    poly = F.from_json(gcoords, _POLY)
    mpoly = F.from_json(gcoords, _MPOLY)

    rings = (
        F.when(gtype == "Point", F.array(_ring(F.array(point))))
        .when(gtype == "LineString", F.array(_ring(line)))
        .when(gtype == "Polygon", F.transform(poly, _ring))
        .when(
            gtype == "MultiPolygon",
            F.flatten(F.transform(mpoly, lambda p: F.transform(p, _ring))),
        )
    )
    poly_idx = (
        F.when(
            gtype == "MultiPolygon",
            F.flatten(
                F.transform(
                    mpoly,
                    lambda p, i: F.transform(p, lambda _: i.cast("int")),
                )
            ),
        )
        .when(
            gtype.isin("Point", "LineString", "Polygon"),
            F.transform(rings, lambda _: F.lit(0).cast("int")),
        )
    )
    return raw.filter(F.trim("value") != "").select(
        F.get_json_object("value", "$.id").alias("fid"),
        F.when(
            gtype.isin("Point", "LineString", "Polygon", "MultiPolygon"), gtype
        ).alias("geom_type"),
        rings.alias("rings"),
        poly_idx.alias("poly_idx"),
        F.from_json(
            F.get_json_object("value", "$.properties"), "map<string,string>"
        ).alias("properties"),
    )


def read_geojsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a newline-delimited GeoJSON feature file distributed; see
    module docstring for the normalized schema. `.gz`/`.bz2` suffixed
    files decompress transparently (Hadoop codec-by-extension — at the
    cost of splittability, the usual compressed-text trade)."""
    return _normalize(spark.read.text(path))


def geojsonl_line(
    fid: Column,
    geom_type: Column,
    rings: Column,
    properties: Column | None = None,
    poly_idx: Column | None = None,
) -> Column:
    """Serialize one feature row back to a GeoJSONL line (the writer
    half of the round trip): coordinates print %.7f from fixed-point,
    so read_geojsonl(write(x)) == x exactly. Takes the reader's
    normalized form: Point/LineString/Polygon use the ring list
    directly; MultiPolygon regroups rings into polygons by
    `poly_idx` (the reader's parallel array — without it every ring
    becomes its own polygon)."""
    def fmt(v: Column) -> Column:
        return F.format_string(
            "[%.7f,%.7f]",
            v["lon"] / F.lit(float(COORD_SCALE)),
            v["lat"] / F.lit(float(COORD_SCALE)),
        )

    ring_txt = lambda ring: F.concat(  # noqa: E731
        F.lit("["), F.array_join(F.transform(ring, fmt), ","), F.lit("]")
    )
    if poly_idx is None:
        polys = F.transform(rings, lambda r: F.array(r))
    else:
        tagged = F.zip_with(
            rings, poly_idx, lambda r, ix: F.struct(r.alias("r"), ix.alias("ix"))
        )
        polys = F.transform(
            F.sequence(F.lit(0), F.coalesce(F.array_max(poly_idx), F.lit(0))),
            lambda i: F.transform(
                F.filter(tagged, lambda s: s["ix"] == i), lambda s: s["r"]
            ),
        )
    poly_txt = lambda p: F.concat(  # noqa: E731
        F.lit("["), F.array_join(F.transform(p, ring_txt), ","), F.lit("]")
    )
    coords = (
        F.when(
            geom_type == "Point", fmt(F.get(F.get(rings, 0), 0))
        )
        .when(geom_type == "LineString", ring_txt(F.get(rings, 0)))
        .when(
            geom_type == "Polygon",
            F.concat(
                F.lit("["),
                F.array_join(F.transform(rings, ring_txt), ","),
                F.lit("]"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("["),
                F.array_join(F.transform(polys, poly_txt), ","),
                F.lit("]"),
            )
        )
    )
    props = (
        F.lit("{}")
        if properties is None
        else F.coalesce(F.to_json(properties), F.lit("{}"))
    )
    fid_json = F.when(fid.isNull(), F.lit("null")).otherwise(
        F.concat(
            F.lit('"'),
            F.regexp_replace(
                F.regexp_replace(fid.cast("string"), r"\\", r"\\\\"),
                '"',
                '\\\\"',
            ),
            F.lit('"'),
        )
    )
    return F.format_string(
        '{"type":"Feature","id":%s,"geometry":{"type":"%s","coordinates":%s},'
        '"properties":%s}',
        fid_json,
        geom_type,
        coords,
        props,
    )


def read_geojson_collection(
    spark: SparkSession,
    path: str,
    max_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """Plain single-document GeoJSON FeatureCollection reader — the
    format users actually have on disk before anyone re-shards it.

    A FeatureCollection is ONE json document; there is no line
    structure to split, so (exactly like the o5m reader's documented
    constraint, sources/o5m.py) this parses driver-side behind a size
    guard and fails loud past it: at corpus scale the answer is "store
    features line-delimited" (read_geojsonl), not a silent
    driver-memory gamble. The parsed features re-enter the engine
    through the SAME normalization path: each feature re-serializes to
    its compact single-line JSON and the result is handed to the
    distributed column parser, so both readers produce byte-identical
    frames and every downstream test covers both.
    """
    import json
    import os

    size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"read_geojson_collection: {path} is {size} bytes "
            f"(> {max_bytes}); a single-document FeatureCollection is "
            "not splittable — convert to line-delimited GeoJSON and use "
            "read_geojsonl"
        )
    opener = open
    if path.endswith(".gz"):
        import gzip

        opener = gzip.open
    with opener(path, "rt") as f:
        doc = json.load(f)
    if doc.get("type") != "FeatureCollection" or "features" not in doc:
        raise ValueError(
            f"read_geojson_collection: {path} is not a FeatureCollection"
        )
    lines = [
        (json.dumps(feat, separators=(",", ":")),) for feat in doc["features"]
    ]
    tmp = spark.createDataFrame(lines or [("",)], "value string")
    return _normalize(tmp)


def polygons_from_features(features: DataFrame) -> DataFrame:
    """Adapt the normalized feature frame to the spatial_join polygon
    contract: (poly_id, rings) with (x, y) ring structs — so a GeoJSON
    feature layer plugs straight into build_polygon_cell_index /
    spatial_join (the corpus-scale "which admin area contains each
    image" join) with zero driver-side geometry handling. Keeps
    Polygon and MultiPolygon features (a multipolygon's rings pool
    into one even-odd geometry, the engine's multipolygon model —
    functions/geometry.py ring pooling); drops everything else."""
    return features.filter(
        F.col("geom_type").isin("Polygon", "MultiPolygon")
    ).select(
        F.col("fid").alias("poly_id"),
        F.transform(
            F.col("rings"),
            lambda ring: F.transform(
                ring,
                lambda p: F.struct(
                    p["lon"].alias("x"), p["lat"].alias("y")
                ),
            ),
        ).alias("rings"),
    )
