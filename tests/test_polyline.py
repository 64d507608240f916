"""Encoded polyline serialization (operators/export.polyline_col)."""

import random

import pytest

from pyspark.sql import functions as F

from osmium_tool_spark.operators.export import polyline_col, way_polylines


def decode_polyline(s: str) -> list[tuple[int, int]]:
    """Independent reference decoder (spec's inverse): returns the
    SCALED integer (lat, lon) points."""
    pts, i = [], 0
    lat = lon = 0
    while i < len(s):
        for which in (0, 1):
            shift = result = 0
            while True:
                b = ord(s[i]) - 63
                i += 1
                result |= (b & 0x1F) << shift
                shift += 5
                if b < 0x20:
                    break
            d = ~(result >> 1) if result & 1 else result >> 1
            if which == 0:
                lat += d
            else:
                lon += d
        pts.append((lat, lon))
    return pts


def _df(spark, coords_rows):
    return spark.createDataFrame(
        coords_rows, "id long, coords array<struct<__lon:long,__lat:long>>"
    )


def test_public_spec_vector(spark):
    pts = [(38.5, -120.2), (40.7, -120.95), (43.252, -126.453)]
    coords = [
        {"__lon": int(lon * 1e7), "__lat": int(lat * 1e7)} for lat, lon in pts
    ]
    out = (
        _df(spark, [(1, coords)])
        .select(polyline_col(F.col("coords"), 100).alias("p"))
        .collect()[0]
        .p
    )
    assert out == "_p~iF~ps|U_ulLnnqC_mqNvxq`@"


@pytest.mark.parametrize("divisor", [100, 1])
def test_roundtrip_random(spark, divisor):
    rng = random.Random(41)
    rows = []
    want = {}
    for wid in range(40):
        n = rng.randrange(2, 12)
        coords = [
            {
                "__lon": rng.randrange(-1800000000, 1800000000),
                "__lat": rng.randrange(-900000000, 900000000),
            }
            for _ in range(n)
        ]
        rows.append((wid, coords))
        want[wid] = [
            (c["__lat"] // divisor, c["__lon"] // divisor) for c in coords
        ]
    out = _df(spark, rows).select(
        "id", polyline_col(F.col("coords"), divisor).alias("p")
    ).collect()
    for r in out:
        assert decode_polyline(r.p) == want[r.id], r.id


def test_null_ref_propagates(spark):
    coords = [
        {"__lon": 100, "__lat": 100},
        {"__lon": None, "__lat": None},  # unresolved node
        {"__lon": 300, "__lat": 300},
    ]
    out = (
        _df(spark, [(1, coords)])
        .select(polyline_col(F.col("coords"), 1).alias("p"))
        .collect()[0]
        .p
    )
    assert out is None


def test_way_polylines_composition(spark):
    nodes = spark.createDataFrame(
        [(1, 100, 200), (2, 300, 400), (3, 500, 600)],
        "id long, lon long, lat long",
    ).select(F.lit(0).alias("type"), "id", F.lit(1).alias("version"), "lon", "lat")
    ways = spark.createDataFrame(
        [(10, [1, 2, 3]), (11, [1]), (12, [1, 99])],
        "id long, refs array<long>",
    ).select("id", F.lit(1).alias("version"), "refs")
    out = {r.id: r for r in way_polylines(ways, nodes, divisor=1).collect()}
    assert set(out) == {10, 12}  # single-node way dropped
    assert decode_polyline(out[10].polyline) == [(200, 100), (400, 300), (600, 500)]
    assert out[12].polyline is None  # ref 99 unresolved -> null
    assert out[10].n_nodes == 3


def test_divisor_validation(spark):
    with pytest.raises(ValueError):
        polyline_col(F.col("coords"), 0)
