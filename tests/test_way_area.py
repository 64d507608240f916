"""way_area_centroid: exact shoelace area + centroid over way assembly.

Pins: open-auto-close == closed-ring equality, signed orientation,
exact decimal digits at world span (cross products > int64), centroid
IEEE form, degenerate and unresolved-ref NULL propagation.
"""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.operators.export import way_area_centroid


def _ways(spark, rows):
    # rows: (id, [ref ids])
    return spark.createDataFrame(
        [(i, 1, refs) for i, refs in rows], "id long, version int, refs array<long>"
    )


def _nodes(spark, pts):
    # pts: (id, lon, lat)
    return spark.createDataFrame(pts, "id long, lon long, lat long")


def test_square_open_and_closed_equal(spark):
    nodes = _nodes(spark, [(1, 0, 0), (2, 10, 0), (3, 10, 10), (4, 0, 10)])
    ways = _ways(spark, [(100, [1, 2, 3, 4]), (101, [1, 2, 3, 4, 1])])
    out = {r["id"]: r for r in way_area_centroid(ways, nodes).collect()}
    for wid in (100, 101):
        r = out[wid]
        assert r["area2"] == "200"
        assert r["is_ccw"] is True
        assert (r["cx"], r["cy"]) == (5.0, 5.0)
    assert out[100]["n_nodes"] == 4 and out[101]["n_nodes"] == 5


def test_clockwise_is_negative(spark):
    nodes = _nodes(spark, [(1, 0, 0), (2, 0, 10), (3, 10, 10), (4, 10, 0)])
    ways = _ways(spark, [(100, [1, 2, 3, 4])])
    r = way_area_centroid(ways, nodes).collect()[0]
    assert r["area2"] == "-200" and r["is_ccw"] is False
    assert (r["cx"], r["cy"]) == (5.0, 5.0)


def test_world_span_exceeds_int64(spark):
    # rectangle spanning the whole world: area2 = 2 * 3.6e9 * 1.8e9
    # = 1.296e19 > int64 max — decimal path required
    nodes = _nodes(spark, [
        (1, -1_800_000_000, -900_000_000), (2, 1_800_000_000, -900_000_000),
        (3, 1_800_000_000, 900_000_000), (4, -1_800_000_000, 900_000_000),
    ])
    ways = _ways(spark, [(100, [1, 2, 3, 4])])
    r = way_area_centroid(ways, nodes).collect()[0]
    assert Decimal(r["area2"]) == 2 * 3_600_000_000 * 1_800_000_000
    assert r["is_ccw"] is True
    assert (r["cx"], r["cy"]) == (0.0, 0.0)


def test_triangle_centroid_reference(spark):
    nodes = _nodes(spark, [(1, 0, 0), (2, 9, 0), (3, 0, 9)])
    ways = _ways(spark, [(100, [1, 2, 3])])
    r = way_area_centroid(ways, nodes).collect()[0]
    assert r["area2"] == "81"
    assert (r["cx"], r["cy"]) == (3.0, 3.0)


def test_degenerate_and_unresolved(spark):
    nodes = _nodes(spark, [(1, 0, 0), (2, 5, 5), (3, 10, 10)])
    ways = _ways(spark, [
        (100, [1, 2, 3]),       # collinear: area2 = 0
        (101, [1, 2, 999]),     # unresolved ref -> NULLs
        (102, [1, 2]),          # too short: dropped
    ])
    out = {r["id"]: r for r in way_area_centroid(ways, nodes).collect()}
    assert set(out) == {100, 101}
    assert out[100]["area2"] == "0" and out[100]["is_ccw"] is False
    assert out[100]["cx"] is None and out[100]["cy"] is None
    assert out[101]["area2"] is None and out[101]["is_ccw"] is None
    assert out[101]["cx"] is None
