"""Unit tests for geometry kernels — transliterated from the reference's
Catch2 unit tests (test/extract/test_unit.cpp) plus PIP edge cases from
src/extract/extract_polygon.cpp semantics."""

import numpy as np
import pytest

from osmium_tool_spark.functions.geometry import (
    BandIndex,
    Extract,
    is_ccw,
    normalize_ring,
    parse_geojson,
    parse_poly,
    signed_area2,
)
from osmium_tool_spark.schema import fp


def ring(pts):
    return np.array([(fp(x), fp(y)) for x, y in pts], dtype=np.int64)


SQUARE = ring([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])  # CCW


class TestRings:
    def test_ccw_detection(self):
        assert is_ccw(SQUARE)
        assert not is_ccw(SQUARE[::-1].copy())
        assert signed_area2(SQUARE) > 0

    def test_normalize_closes_and_orients(self):
        open_cw = ring([(0, 0), (0, 10), (10, 10), (10, 0)])  # CW, open
        r = normalize_ring(open_cw, outer=True)
        assert np.array_equal(r[0], r[-1])
        assert is_ccw(r)
        inner = normalize_ring(open_cw, outer=False)
        assert not is_ccw(inner)


class TestPIP:
    def test_square_basic(self):
        idx = BandIndex.build([SQUARE])
        xs = np.array([fp(5), fp(15), fp(-1), fp(0), fp(10)], dtype=np.int64)
        ys = np.array([fp(5), fp(5), fp(5), fp(0), fp(10)], dtype=np.int64)
        got = idx.contains(xs, ys)
        # center in; outside out; vertices count as inside (endpoint rule,
        # extract_polygon.cpp:137-139)
        assert got.tolist() == [True, False, False, True, True]

    def test_hole_even_odd(self):
        outer = SQUARE
        inner = normalize_ring(ring([(3, 3), (7, 3), (7, 7), (3, 7)]), outer=False)
        idx = BandIndex.build([outer, inner])
        xs = np.array([fp(5), fp(1), fp(3)], dtype=np.int64)
        ys = np.array([fp(5), fp(1), fp(3)], dtype=np.int64)
        got = idx.contains(xs, ys)
        # center is inside the hole -> out; (1,1) in; (3,3) on hole vertex -> in
        assert got.tolist() == [False, True, True]

    def test_two_outers(self):
        a = SQUARE
        b = normalize_ring(ring([(20, 20), (30, 20), (30, 30), (20, 30)]), outer=True)
        idx = BandIndex.build([a, b])
        xs = np.array([fp(5), fp(25), fp(15)], dtype=np.int64)
        ys = np.array([fp(5), fp(25), fp(15)], dtype=np.int64)
        assert idx.contains(xs, ys).tolist() == [True, True, False]

    def test_matches_naive_pnpoly(self):
        rng = np.random.default_rng(42)
        pts = rng.integers(-2000, 2000, size=(12, 2)).astype(np.int64)
        poly = normalize_ring(pts, outer=True)
        idx = BandIndex.build([poly])
        xs = rng.integers(-2500, 2500, size=5000).astype(np.int64)
        ys = rng.integers(-2500, 2500, size=5000).astype(np.int64)
        got = idx.contains(xs, ys)

        # naive reference implementation (same exact-int semantics)
        def naive(px, py):
            segs = np.hstack([poly[:-1], poly[1:]])
            inside = False
            for x1, y1, x2, y2 in segs:
                if (px == x1 and py == y1) or (px == x2 and py == y2):
                    return True
                if (y2 > py) != (y1 > py):
                    ax, ay = x1 - x2, y1 - y2
                    tx, ty = px - x2, py - y2
                    if (ay > 0) == (tx * ay < ax * ty):
                        inside = not inside
            return inside

        exp = np.array([naive(int(x), int(y)) for x, y in zip(xs, ys)])
        assert np.array_equal(got, exp)

    def test_band_structure(self):
        # many segments -> multiple bands, same answers as single-band naive
        n = 200
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        pts = np.stack([np.cos(ang) * 10**7, np.sin(ang) * 10**7], axis=1).astype(np.int64)
        poly = normalize_ring(pts, outer=True)
        idx = BandIndex.build([poly])
        assert idx.num_bands == (n) // 10
        xs = np.array([0, fp(0.5), fp(1.5)], dtype=np.int64)
        ys = np.array([0, fp(0.5), 0], dtype=np.int64)
        assert idx.contains(xs, ys).tolist() == [True, True, False]


class TestExtractRegion:
    def test_bbox_inclusive_any_corner_order(self):
        e = Extract.bbox(0, 10, 10, 0, 0)  # corners swapped
        xs = np.array([fp(5), fp(0), fp(10), fp(11)], dtype=np.int64)
        ys = np.array([fp(5), fp(0), fp(10), fp(5)], dtype=np.int64)
        assert e.contains(xs, ys).tolist() == [True, True, True, False]


class TestPolyParser:
    def test_one_outer(self):
        text = "name\nfirst\n 0.0 0.0\n 10.0 0.0\n 10.0 10.0\n 0.0 10.0\nEND\nEND\n"
        rings = parse_poly(text)
        assert len(rings) == 1
        assert np.array_equal(rings[0][0], rings[0][-1])  # auto-closed
        assert is_ccw(rings[0])

    def test_inner_ring_marker(self):
        text = (
            "name\nouter\n0 0\n10 0\n10 10\n0 10\nEND\n"
            "!inner\n3 3\n7 3\n7 7\n3 7\nEND\nEND\n"
        )
        rings = parse_poly(text)
        assert len(rings) == 2
        assert is_ccw(rings[0])
        assert not is_ccw(rings[1])

    def test_crlf(self):
        text = "name\r\nfirst\r\n0 0\r\n10 0\r\n5 10\r\nEND\r\nEND\r\n"
        assert len(parse_poly(text)) == 1

    def test_errors(self):
        with pytest.raises(ValueError):
            parse_poly("just-one-line")
        with pytest.raises(ValueError):
            parse_poly("name\nring\n0 0\n1 1\n2 0\n")  # missing END


class TestGeoJSON:
    def test_polygon(self):
        text = '{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]]]}'
        rings = parse_geojson(text)
        assert len(rings) == 1 and is_ccw(rings[0])

    def test_feature_collection_first_feature(self):
        text = (
            '{"type":"FeatureCollection","features":[{"type":"Feature","properties":{},'
            '"geometry":{"type":"MultiPolygon","coordinates":[[[[0,0],[10,0],[10,10],[0,0]]],'
            "[[[20,20],[30,20],[30,30],[20,20]]]]}}]}"
        )
        rings = parse_geojson(text)
        assert len(rings) == 2

    def test_wrong_type(self):
        with pytest.raises(ValueError):
            parse_geojson('{"type":"Point","coordinates":[0,0]}')


class TestOSMFilePolygonSource:
    """OSM file as extract region (reference src/extract/osm_file_parser.cpp:
    48-91): multipolygon/boundary relations' member ways stitched into
    rings. Fixture parity with /root/reference/test/extract/*.osm.opl."""

    REF = "/root/reference/test/extract"

    def _contains(self, rings, lon_deg, lat_deg):
        import numpy as np

        from osmium_tool_spark.functions.geometry import Extract
        from osmium_tool_spark.schema import fp

        e = Extract.polygon(0, rings)
        return bool(
            e.contains(np.array([fp(lon_deg)]), np.array([fp(lat_deg)]))[0]
        )

    def test_multipolygon_fixture(self):
        from osmium_tool_spark.functions.geometry import parse_osm_file

        text = open(f"{self.REF}/multipolygon.osm.opl").read()
        rings = parse_osm_file(text, fmt="opl")
        # square 10-19 with hole 11-18, plus square 20-29
        assert len(rings) == 3
        assert self._contains(rings, 10.5, 10.5)      # between outer and hole
        assert not self._contains(rings, 15.0, 15.0)  # inside the hole
        assert self._contains(rings, 25.0, 25.0)      # second square
        assert not self._contains(rings, 5.0, 5.0)    # outside everything

    def test_no_polygon_fixture_raises(self):
        from osmium_tool_spark.functions.geometry import parse_osm_file

        text = open(f"{self.REF}/no-polygon.osm.opl").read()
        with pytest.raises(ValueError, match="multipolygon"):
            parse_osm_file(text, fmt="opl")

    def test_empty_fixture_raises(self):
        from osmium_tool_spark.functions.geometry import parse_osm_file

        with pytest.raises(ValueError):
            parse_osm_file(open(f"{self.REF}/empty.osm.opl").read(), fmt="opl")

    def test_xml_variant(self):
        from osmium_tool_spark.functions.geometry import parse_osm_file

        xml = """<?xml version='1.0'?>
<osm version="0.6">
  <node id="1" lon="0.0" lat="0.0"/>
  <node id="2" lon="10.0" lat="0.0"/>
  <node id="3" lon="10.0" lat="10.0"/>
  <node id="4" lon="0.0" lat="10.0"/>
  <way id="10"><nd ref="1"/><nd ref="2"/><nd ref="3"/></way>
  <way id="11"><nd ref="3"/><nd ref="4"/><nd ref="1"/></way>
  <relation id="20">
    <member type="way" ref="10" role="outer"/>
    <member type="way" ref="11" role="outer"/>
    <tag k="type" v="multipolygon"/>
  </relation>
</osm>"""
        rings = parse_osm_file(xml, fmt="xml")
        assert len(rings) == 1
        assert self._contains(rings, 5.0, 5.0)
        assert not self._contains(rings, 15.0, 5.0)

    def test_missing_node_raises(self):
        from osmium_tool_spark.functions.geometry import parse_osm_file

        opl = "n1 x0 y0\nw10 Nn1,n2,n1\nr20 Ttype=multipolygon Mw10@outer\n"
        with pytest.raises(ValueError, match="Missing node"):
            parse_osm_file(opl, fmt="opl")
