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


def test_exact_centroid_surface_at_ulp_magnitudes(spark):
    """Round-5 pin for the CORRECTNESS_r04 way_area red row: at
    >2^53 numerator magnitudes the divided doubles cx/cy are NOT
    cross-engine bit-stable, so the hashed surface is the integer
    quadruple (x1, y1, cx_num, cy_num). Pin that the quadruple
    reconstructs the true rational centroid exactly (Fraction math)
    and the convenience doubles sit within 4 ulps of it."""
    from fractions import Fraction
    from math import ulp

    # world-span triangle: numerators ~1e28, far beyond 2^53
    pts = [(1, -1_799_999_999, -899_999_999),
           (2, 1_799_999_997, -899_999_993),
           (3, 3, 899_999_999)]
    nodes = _nodes(spark, pts)
    ways = _ways(spark, [(100, [1, 2, 3])])
    r = way_area_centroid(ways, nodes).collect()[0]

    a2 = Fraction(int(r["area2"]))
    assert abs(3 * a2) > 2**53  # the regime where doubles diverged
    cx_exact = r["x1"] + Fraction(int(r["cx_num"])) / (3 * a2)
    cy_exact = r["y1"] + Fraction(int(r["cy_num"])) / (3 * a2)
    # ground truth from pure-python shoelace on the same points
    xs = [p[1] for p in pts] + [pts[0][1]]
    ys = [p[2] for p in pts] + [pts[0][2]]
    a2_ref = sum((xs[i] - xs[0]) * (ys[i + 1] - ys[0])
                 - (xs[i + 1] - xs[0]) * (ys[i] - ys[0]) for i in range(3))
    cx_ref = xs[0] + Fraction(sum(
        ((xs[i] - xs[0]) + (xs[i + 1] - xs[0]))
        * ((xs[i] - xs[0]) * (ys[i + 1] - ys[0])
           - (xs[i + 1] - xs[0]) * (ys[i] - ys[0])) for i in range(3)),
        3 * a2_ref)
    cy_ref = ys[0] + Fraction(sum(
        ((ys[i] - ys[0]) + (ys[i + 1] - ys[0]))
        * ((xs[i] - xs[0]) * (ys[i + 1] - ys[0])
           - (xs[i + 1] - xs[0]) * (ys[i] - ys[0])) for i in range(3)),
        3 * a2_ref)
    assert int(r["area2"]) == a2_ref
    assert (cx_exact, cy_exact) == (cx_ref, cy_ref)
    # doubles are a convenience view: the x1 + num/den form cancels
    # catastrophically when the centroid sits near the origin but the
    # anchor is world-span, so absolute error ~ a few ulps of the
    # ANCHOR magnitude (≈5e-7 fixed-point units = 5e-14 degrees at
    # world span — harmless for display, fatal for hashing: exactly
    # why the gate hashes the integer quadruple instead)
    tol_x = 8 * ulp(max(abs(r["x1"]), 1.0))
    tol_y = 8 * ulp(max(abs(r["y1"]), 1.0))
    assert abs(r["cx"] - float(cx_exact)) <= tol_x
    assert abs(r["cy"] - float(cy_exact)) <= tol_y


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
