"""Golden parity for export against the reference's committed GeoJSON
outputs (/root/reference/test/export) — byte-for-byte Feature lines,
including the coordinate formatting rule (trailing zeros trimmed but one
fractional digit kept: '2.0', never '2')."""

import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.operators.export import features, to_geojsonseq
from osmium_tool_spark.sources.osmxml import read_osm_xml

REF = "/root/reference/test/export"


def feature_lines(spark, input_name, unique_id=None):
    ents = read_osm_xml(spark, f"{REF}/{input_name}")
    f = features(ents).orderBy("type", "id")
    out = to_geojsonseq(f, with_id=False, unique_id=unique_id)
    return [r.feature for r in out.collect()]


def golden_lines(path):
    lines = []
    for ln in open(path):
        ln = ln.strip().rstrip(",")
        if ln.startswith('{"type":"Feature"'):
            lines.append(ln)
    return lines


def test_geojsonseq_byte_parity(spark):
    got = feature_lines(spark, "input.osm")
    want = golden_lines(f"{REF}/output.geojsonseq")
    assert got == want


def test_geojson_featurecollection_features_byte_parity(spark):
    got = feature_lines(spark, "input.osm")
    want = golden_lines(f"{REF}/output.geojson")
    assert got == want


def test_unique_id_type_id(spark):
    got = feature_lines(spark, "input.osm", unique_id="type_id")
    want = golden_lines(f"{REF}/output-uid.geojsonseq")
    assert got == want


def test_unique_id_counter(spark):
    got = feature_lines(spark, "input.osm", unique_id="counter")
    want = golden_lines(f"{REF}/output-cnt.geojsonseq")
    assert got == want


def test_missing_node_drops_way(spark):
    # a way referencing a missing node is skipped, everything else kept
    got = feature_lines(spark, "input-missing-node.osm")
    want = golden_lines(f"{REF}/output-missing-node.geojson")
    assert got == want


def test_single_node_way_empty(spark):
    got = feature_lines(spark, "input-single-node-way.osm")
    assert got == golden_lines(f"{REF}/output-empty.geojson") == []


def test_incomplete_relation(spark):
    # relation with missing member ways: the assembled area is skipped,
    # remaining features still exported (non -E mode)
    got = feature_lines(spark, "input-incomplete-relation.osm")
    want = golden_lines(f"{REF}/output-incomplete-relation.geojson")
    assert got == want


@pytest.mark.parametrize(
    "fname",
    ["input-missing-node.osm", "input-single-node-way.osm",
     "input-incomplete-rel-missing-way.osm"],
)
def test_stop_on_error_exit_1(spark, fname, tmp_path):
    # reference WILL_FAIL tests: osmium export -E exits non-zero on these
    from osmium_tool_spark.cli import main

    rc = main(
        ["export", f"{REF}/{fname}", "-E", "-o", str(tmp_path / "o.geojson")],
        spark=spark,
    )
    assert rc == 1


def test_no_stop_on_error_exports_rest(spark, tmp_path):
    import json as _json

    from osmium_tool_spark.cli import main

    out = str(tmp_path / "ok.geojson")
    rc = main(["export", f"{REF}/input-missing-node.osm", "-o", out], spark=spark)
    assert rc == 0
    doc = _json.loads(open(out).read())
    assert len(doc["features"]) == 3  # way 20 dropped, rest exported


def test_pg_ewkb_byte_parity(spark):
    from osmium_tool_spark.operators.export import features, to_pg

    ents = read_osm_xml(spark, f"{REF}/input.osm")
    f = features(ents).orderBy("type", "id")
    got = [r.row for r in to_pg(f).collect()]
    want = [ln.rstrip("\n") for ln in open(f"{REF}/output.pg") if ln.strip()]
    assert got == want


def test_pg_untagged_byte_parity(spark):
    from osmium_tool_spark.operators.export import features, to_pg

    ents = read_osm_xml(spark, f"{REF}/input.osm")
    f = features(ents, keep_untagged=True).orderBy("type", "id")
    got = [r.row for r in to_pg(f).collect()]
    want = [ln.rstrip("\n") for ln in open(f"{REF}/output-untagged.pg") if ln.strip()]
    assert got == want


def test_attributes_numeric_json_byte_parity(spark):
    # osmium export -n -a type,id,version,changeset,timestamp,uid,user,way_nodes
    from osmium_tool_spark.operators.export import (
        attributes_props_json,
        features,
        to_geojsonseq,
    )

    ents = read_osm_xml(spark, f"{REF}/input.osm")
    f = features(ents, keep_untagged=True)
    f = attributes_props_json(
        f, ents,
        ["type", "id", "version", "changeset", "timestamp", "uid", "user", "way_nodes"],
    ).orderBy("type", "id")
    got = [r.feature for r in to_geojsonseq(f, with_id=False, props_col="props").collect()]
    want = golden_lines(f"{REF}/output-attr.geojson")
    assert got == want


def test_attributes_chars_escaping_parity(spark):
    # JSON escaping of quotes/backslashes/control chars in user names and
    # tag values (input-chars.osm -> output-chars.geojson)
    from osmium_tool_spark.operators.export import (
        attributes_props_json,
        features,
        to_geojsonseq,
    )

    ents = read_osm_xml(spark, f"{REF}/input-chars.osm")
    f = features(ents, keep_untagged=True).orderBy("type", "id")
    f = attributes_props_json(
        f, ents,
        ["type", "id", "version", "changeset", "timestamp", "uid", "user", "way_nodes"],
    )
    got = sorted(
        r.feature for r in to_geojsonseq(f, with_id=False, props_col="props").collect()
    )
    want = sorted(golden_lines(f"{REF}/output-chars.geojson"))
    assert got == want


class TestLinearAreaRulesetMatrix:
    """The reference's full linear_tags/area_tags config matrix
    (test/export/CMakeLists.txt c-* cases): text-format output over
    way.osm must match the committed way-*.txt files line for line."""

    CASES = [
        ([], [], "way-all.txt"),
        (True, True, "way-all.txt"),
        (None, None, "way-all.txt"),
        (False, False, "way-none.txt"),
        (["barrier"], [], "way-tag-empty.txt"),
        ([], ["landuse"], "way-empty-tag.txt"),
        (["barrier"], ["landuse"], "way-tag-tag.txt"),
        (["does-not-exist"], [], "way-tagx-empty.txt"),
        ([], ["does-not-exist"], "way-empty-tagx.txt"),
        (["does-not-exist"], ["does-not-exist"], "way-tagx-tagx.txt"),
        (None, ["landuse"], "way-null-tag.txt"),
        (["barrier"], None, "way-tag-null.txt"),
    ]

    def _lines(self, spark, linear, area, keep_untagged=False):
        from osmium_tool_spark.operators.export import (
            features,
            to_text,
            with_attributes,
        )

        ents = read_osm_xml(spark, f"{REF}/way.osm")
        f = features(
            ents, keep_untagged=keep_untagged, linear_tags=linear,
            area_tags=area, geometry_format="wkt",
        )
        if not keep_untagged:
            # the text-format skip rule counts real TAGS, not attributes
            f = f.filter(F.size(F.map_keys("tags")) > 0)
        f = with_attributes(f, ents, ["id"])
        rows = to_text(f, keep_untagged=True).collect()
        # reference order: all linestrings (way order), then all areas
        feats = [
            (r.row.startswith("MULTIPOLYGON"), int(r.row.split("@id=")[1].split(",")[0]), r.row)
            for r in rows
        ]
        return [r for *_, r in sorted(feats)]

    @pytest.mark.parametrize(
        "linear,area,expected", CASES,
        ids=[f"{e}:{l}/{a}" for l, a, e in CASES],
    )
    def test_matrix(self, spark, linear, area, expected):
        got = self._lines(spark, linear, area)
        want = [ln.rstrip("\n") for ln in open(f"{REF}/{expected}") if ln.strip()]
        want = [r for *_, r in sorted(
            (w.startswith("MULTIPOLYGON"), int(w.split("@id=")[1].split(",")[0]), w)
            for w in want
        )]
        assert got == want

    def test_keep_untagged(self, spark):
        got = self._lines(spark, [], [], keep_untagged=True)
        want = [ln.rstrip("\n") for ln in open(f"{REF}/way-all-n.txt") if ln.strip()]
        want = [r for *_, r in sorted(
            (w.startswith("MULTIPOLYGON"), int(w.split("@id=")[1].split(",")[0]), w)
            for w in want
        )]
        assert got == want
