"""OSM XML reader: .osm (data), .osh (history), .osc (change) files.

Reference format: man/osmium-file-formats.md:42-66; the XML shapes are
the reference's own test fixtures (test/sort/*.osm, test/time-filter/
input.osh, test/sort/input-change.osc). Change files wrap objects in
<create>/<modify>/<delete> sections — <delete> implies visible=false
unless an explicit visible attribute overrides (osmChange semantics).

Parsing runs on the DRIVER: XML is the reference's interchange format
for config/fixture-scale data; at engine scale the source of record is
the parquet/Iceberg entity table (SURVEY.md §1.4) and OPL covers
line-oriented text. `read_osm_xml` returns the canonical ENTITY_SCHEMA
frame (ts in epoch micros, coords fixed-point 1e-7 degrees) so every
operator and the CLI consume XML inputs transparently.
"""

from __future__ import annotations

import calendar
import time as _time
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from ..schema import COORD_SCALE, ENTITY_SCHEMA, NAME_TO_TYPE

_CHANGE_SECTIONS = ("create", "modify", "delete")


def _read_text(path: str) -> str:
    """Read XML text with gzip/bz2 autodetect by suffix (the reference
    supports .osm.gz/.osm.bz2 transparently, io.cpp:39-61)."""
    if path.endswith(".gz"):
        import gzip

        return gzip.open(path, "rt", encoding="utf-8").read()
    if path.endswith(".bz2"):
        import bz2

        return bz2.open(path, "rt", encoding="utf-8").read()
    with open(path) as f:
        return f.read()


def _parse_ts(v: str | None) -> int | None:
    if not v:
        return None
    return calendar.timegm(_time.strptime(v, "%Y-%m-%dT%H:%M:%SZ")) * 1_000_000


def _parse_object(el: ET.Element, in_delete: bool = False) -> dict | None:
    t = NAME_TO_TYPE.get(el.tag)
    if t is None:
        return None
    vis_attr = el.get("visible")
    visible = (vis_attr != "false") if vis_attr is not None else not in_delete
    row = {
        "type": t,
        "id": int(el.get("id")),
        "version": int(el.get("version")) if el.get("version") else None,
        "visible": visible,
        "changeset": int(el.get("changeset")) if el.get("changeset") else None,
        "ts": _parse_ts(el.get("timestamp")),
        "uid": int(el.get("uid")) if el.get("uid") else None,
        "user": el.get("user"),
        "tags": {c.get("k"): c.get("v") for c in el if c.tag == "tag"},
        "lon": None,
        "lat": None,
        "refs": None,
        "members": None,
    }
    if el.tag == "node":
        if el.get("lon") is not None:
            row["lon"] = int(round(float(el.get("lon")) * COORD_SCALE))
            row["lat"] = int(round(float(el.get("lat")) * COORD_SCALE))
    elif el.tag == "way":
        row["refs"] = [int(c.get("ref")) for c in el if c.tag == "nd"]
    else:
        row["members"] = [
            {
                "mtype": NAME_TO_TYPE[c.get("type")],
                "ref": int(c.get("ref")),
                "role": c.get("role") or "",
            }
            for c in el
            if c.tag == "member"
        ]
    return row


def parse_osm_xml(text: str) -> list[dict]:
    """XML text -> entity row dicts, preserving document order (the
    reference's stream order — order-validation tests depend on it)."""
    root = ET.fromstring(text)
    rows: list[dict] = []
    if root.tag == "osmChange":
        for sec in root:
            if sec.tag not in _CHANGE_SECTIONS:
                continue
            for el in sec:
                row = _parse_object(el, in_delete=(sec.tag == "delete"))
                if row is not None:
                    rows.append(row)
    else:
        for el in root:
            row = _parse_object(el)
            if row is not None:
                rows.append(row)
    return rows


def read_osm_xml(spark: SparkSession, path: str) -> DataFrame:
    """Read an .osm/.osh/.osc XML file into the canonical entity frame.

    Tags travel as an entries ARRAY and become a map via map_from_entries:
    converting a Python dict to a Spark map does NOT reliably preserve
    insertion order, but the reference's tag output order IS document
    order (export text/JSON formats print tags as listed in the file)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    rows = parse_osm_xml(_read_text(path))
    for r in rows:
        r["tags"] = list(r["tags"].items())
    fields = []
    for fld in ENTITY_SCHEMA.fields:
        if fld.name == "tags":
            fields.append(
                T.StructField(
                    "tags",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("key", T.StringType(), False),
                                T.StructField("value", T.StringType(), True),
                            ]
                        )
                    ),
                    True,
                )
            )
        else:
            fields.append(fld)
    df = spark.createDataFrame(rows, T.StructType(fields))
    return df.withColumn("tags", F.map_from_entries("tags")).select(
        *[f.name for f in ENTITY_SCHEMA.fields]
    )


CHANGESET_SCHEMA = (
    "id long, created_at long, closed_at long, open boolean, uid int, "
    "user string, num_changes long, num_comments long, "
    "min_lon long, min_lat long, max_lon long, max_lat long"
)


def read_changesets_xml(spark: SparkSession, path: str) -> DataFrame:
    """Read <changeset> elements (the Osmosis dump shape the reference's
    changeset-filter fixtures use) into the changeset frame consumed by
    operators/changesets.changeset_filter. num_comments counts
    <discussion> comments; absent bbox attributes stay NULL (an invalid
    bounds never matches a --bbox filter, reference
    command_changeset_filter.cpp:249)."""
    root = ET.fromstring(open(path).read())
    rows = []
    for el in root:
        if el.tag != "changeset":
            continue

        def coord(name: str):
            v = el.get(name)
            return int(round(float(v) * COORD_SCALE)) if v is not None else None

        discussion = el.find("discussion")
        rows.append(
            {
                "id": int(el.get("id")),
                "created_at": _parse_ts(el.get("created_at")),
                "closed_at": _parse_ts(el.get("closed_at")),
                "open": el.get("open") == "true",
                "uid": int(el.get("uid")) if el.get("uid") else None,
                "user": el.get("user"),
                "num_changes": int(el.get("num_changes") or 0),
                "num_comments": (
                    int(el.get("comments_count"))
                    if el.get("comments_count")
                    else len(discussion) if discussion is not None else 0
                ),
                "min_lon": coord("min_lon"),
                "min_lat": coord("min_lat"),
                "max_lon": coord("max_lon"),
                "max_lat": coord("max_lat"),
            }
        )
    return spark.createDataFrame(rows, CHANGESET_SCHEMA)
