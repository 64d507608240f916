"""Golden parity for tags-filter (full 17-case matrix) and extract
(strategies, --clean, 64-bit ids, antimeridian and Alaska polygon
fixtures) run DIRECTLY against the reference's committed XML/OPL/GeoJSON
fixtures — complementing round 1's transliterated-fixture tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.functions.geometry import Extract, parse_geojson, parse_poly
from osmium_tool_spark.operators.extract import extract
from osmium_tool_spark.operators.sort_merge import cat
from osmium_tool_spark.operators.tags_filter import tags_filter
from osmium_tool_spark.sources.opl import read_opl
from osmium_tool_spark.sources.osmxml import read_osm_xml
from tests.test_reference_goldens_xml import canon_rows

REF = "/root/reference/test"
BBOX = (0.0, 0.0, 1.5, 10.0)


class TestTagsFilterGoldens:
    CASES = [
        ("input.osm", ["n/amenity"], {}, "output-amenity.osm"),
        ("input.osm", ["n/amenity"], {"omit_referenced": True}, "output-amenity.osm"),
        ("input.osm", ["w/highway"], {"omit_referenced": True}, "output-highway-R.osm"),
        ("input.osm", ["note"], {"omit_referenced": True}, "output-note-R.osm"),
        ("input.osm", ["note"], {"invert": True, "omit_referenced": True}, "output-note-iR.osm"),
        ("input.osm", ["w/highway"], {}, "output-highway.osm"),
        ("input.osm", ["w/highway"], {"invert": True}, "output-highway-i.osm"),
        ("input-nodes.osm", ["w/highway"], {"invert": True}, "output-nodes-highway-i.osm"),
        ("input.osm", ["r/note"], {}, "output-note-rel.osm"),
        ("input.osm", ["w/highway"], {"remove_tags": True}, "output-highway-t.osm"),
        ("input.osm", ["w/highway"], {"invert": True, "remove_tags": True}, "output-highway-it.osm"),
        ("input.osm", ["r/note"], {"remove_tags": True}, "output-note-rel-t.osm"),
        ("input-site.osm", ["r/site=1"], {}, "output-site-1.osm"),
        ("input-site.osm", ["r/site=2"], {}, "output-site-2.osm"),
        ("input-site.osm", ["r/site=2"], {"omit_referenced": True}, "output-site-R.osm"),
        ("input-site.osm", ["r/site"], {"omit_referenced": True}, "output-site-R-all.osm"),
        ("input-site.osm", ["r/site"], {"remove_tags": True}, "output-site-t.osm"),
    ]

    @pytest.mark.parametrize(
        "inp,exprs,kw,expected", CASES,
        ids=[f"{e}:{'+'.join(x)}{sorted(k)}" for _, x, k, e in CASES],
    )
    def test_tags_filter_golden(self, spark, inp, exprs, kw, expected):
        ents = read_osm_xml(spark, f"{REF}/tags-filter/{inp}")
        got = canon_rows(tags_filter(ents, exprs, **kw))
        want = canon_rows(read_osm_xml(spark, f"{REF}/tags-filter/{expected}"))
        assert got == want


class TestExtractGoldens:
    def _run(self, spark, inp, strategy, expected, **kw):
        ents = read_osm_xml(spark, f"{REF}/extract/{inp}")
        out = extract(
            ents, [Extract.bbox(0, *BBOX)], strategy=strategy, persist_input=False, **kw
        ).drop("extract_id")
        got = canon_rows(out)
        want = canon_rows(read_osm_xml(spark, f"{REF}/extract/{expected}"))
        assert got == want

    @pytest.mark.parametrize("inp,sfx", [("input1.osm", ""), ("input64.osm", "64")])
    def test_strategies(self, spark, inp, sfx):
        self._run(spark, inp, "simple", f"output-simple{sfx}.osm")
        self._run(spark, inp, "complete_ways", f"output-complete-ways{sfx}.osm")
        self._run(
            spark, inp, "complete_ways", f"output-complete-ways-norels{sfx}.osm",
            relations=False,
        )
        self._run(spark, inp, "smart", f"output-smart{sfx}.osm")
        self._run(spark, inp, "smart", f"output-smart{sfx}.osm", smart_types=["multipolygon"])
        self._run(spark, inp, "smart", f"output-smart{sfx}.osm", smart_types=[])  # any
        self._run(spark, inp, "smart", f"output-smart-nonmp{sfx}.osm", smart_types=["x"])

    @pytest.mark.parametrize("inp,sfx", [("input1.osm", ""), ("input64.osm", "64")])
    def test_clean(self, spark, inp, sfx):
        ents = read_osm_xml(spark, f"{REF}/extract/{inp}")
        out = extract(
            ents, [Extract.bbox(0, *BBOX)], strategy="complete_ways", persist_input=False
        ).drop("extract_id")
        out = cat([out], clean_attrs=["version", "uid"])

        def norm(rows):
            # zeroed attrs serialize as ABSENT in the reference XML: 0 == None
            return [
                (t, i, v or 0, vis, ts_, c, (u or 0), *rest)
                for (t, i, v, vis, ts_, c, u, *rest) in rows
            ]

        got = norm(canon_rows(out))
        want = norm(canon_rows(read_osm_xml(spark, f"{REF}/extract/output-clean{sfx}.osm")))
        assert got == want

    def test_simple_way_starts_outside(self, spark):
        self._run(
            spark, "input-way-starts-outside.osm", "simple",
            "output-simple-way-starts-outside.osm",
        )

    ANTIMERIDIAN = [
        (("bbox", (160.0, 60.0, 180.0, 80.0)), "output-antimeridian-east.opl"),
        (("bbox", (-180.0, 60.0, -160.0, 80.0)), "output-antimeridian-west.opl"),
        (("geojson", "polygon-russia-east.geojson"), "output-antimeridian-east.opl"),
        (("geojson", "polygon-russia-west.geojson"), "output-antimeridian-west.opl"),
        (("geojson", "polygon-russia-all.geojson"), "output-antimeridian-both.opl"),
        (("geojson", "polygon-russia-reverse.geojson"), "output-antimeridian-both.opl"),
    ]

    @pytest.mark.parametrize(
        "region,expected", ANTIMERIDIAN, ids=[f"{e}:{r[1]}" for r, e in ANTIMERIDIAN]
    )
    def test_antimeridian(self, spark, region, expected):
        ents = read_opl(spark, f"{REF}/extract/antimeridian.opl")
        if region[0] == "bbox":
            ex = Extract.bbox(0, *region[1])
        else:
            rings = parse_geojson(open(f"{REF}/extract/{region[1]}").read())
            ex = Extract.polygon(0, [np.asarray(r) for r in rings])
        out = extract(ents, [ex], strategy="simple", persist_input=False).drop("extract_id")
        got = canon_rows(out)
        want = canon_rows(read_opl(spark, f"{REF}/extract/{expected}"))
        assert got == want

    ALASKA = [
        ("w42394837.osm", "w42394837.opl", "polygon-us-alaska.geojson"),
        ("w46113981.osm", "w46113981.opl", "polygon-us-alaska.geojson"),
        ("w42394837.osm", "w42394837.opl", "polygon-us-alaska.poly"),
        ("w46113981.osm", "w46113981.opl", "polygon-us-alaska.poly"),
        ("w42394837.osm", "w42394837.opl", "polygon-us-alaska-no-feature.geojson"),
    ]

    @pytest.mark.parametrize(
        "inp,expected,poly", ALASKA, ids=[f"{i}:{p}" for i, _, p in ALASKA]
    )
    def test_alaska_polygons(self, spark, inp, expected, poly):
        # real-world antimeridian-adjacent polygons with many segments —
        # exercises the y-band Arrow kernel path (>64 segments)
        text = open(f"{REF}/extract/{poly}").read()
        rings = parse_geojson(text) if poly.endswith(".geojson") else parse_poly(text)
        ex = Extract.polygon(0, [np.asarray(r) for r in rings])
        ents = read_osm_xml(spark, f"{REF}/extract/{inp}")
        out = extract(ents, [ex], strategy="simple", persist_input=False).drop("extract_id")
        got = canon_rows(out)
        want = canon_rows(read_opl(spark, f"{REF}/extract/{expected}"))
        assert got == want
