"""Marching-squares contour extraction (operators/tiles.contour_segments).

The parity test reimplements marching squares independently in numpy
(same 16-case table and saddle convention) over random fields, so the
distributed scatter/pivot/case pipeline is pinned against a direct
per-block reference.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.functions.cells import _LAT_MIN, _LAT_SPAN, _LON_MIN, _LON_SPAN
from osmium_tool_spark.operators.tiles import contour_segments

RES = 4
N = 1 << RES


def cell_center_lonlat(ix: int, iy: int) -> tuple[int, int]:
    lon = _LON_MIN + (ix * _LON_SPAN + _LON_SPAN // 2) // N
    lat = _LAT_MIN + (iy * _LAT_SPAN + _LAT_SPAN // 2) // N
    return lon, lat


def pts_for_cells(spark, cells: dict[tuple[int, int], int]):
    rows = []
    for (ix, iy), v in cells.items():
        lon, lat = cell_center_lonlat(ix, iy)
        rows += [(lon, lat)] * v
    return spark.createDataFrame(rows, "lon long, lat long")


def reference_segments(field: dict[tuple[int, int], int], t: float):
    """Independent per-block marching squares (same table/convention)."""
    out = []
    occupied = list(field)
    bxs = sorted({x - d for x, _ in occupied for d in (0, 1)})
    bys = sorted({y - d for _, y in occupied for d in (0, 1)})
    for bx in bxs:
        for by in bys:
            v00 = field.get((bx, by), 0)
            v10 = field.get((bx + 1, by), 0)
            v11 = field.get((bx + 1, by + 1), 0)
            v01 = field.get((bx, by + 1), 0)
            case = (v00 >= t) + 2 * (v10 >= t) + 4 * (v11 >= t) + 8 * (v01 >= t)
            eb = (bx + (t - v00) / (v10 - v00) if v10 != v00 else None, by)
            er = (bx + 1, by + (t - v10) / (v11 - v10) if v11 != v10 else None)
            et = (bx + (t - v01) / (v11 - v01) if v11 != v01 else None, by + 1)
            el = (bx, by + (t - v00) / (v01 - v00) if v01 != v00 else None)
            table = {
                1: [(el, eb)], 2: [(eb, er)], 3: [(el, er)], 4: [(er, et)],
                5: [(el, eb), (er, et)], 6: [(eb, et)], 7: [(el, et)],
                8: [(et, el)], 9: [(eb, et)], 10: [(eb, er), (et, el)],
                11: [(er, et)], 12: [(el, er)], 13: [(eb, er)], 14: [(el, eb)],
            }
            for p, q in table.get(case, []):
                out.append((bx, by, p[0], p[1], q[0], q[1]))
    return sorted(out)


def got_segments(spark, field, t):
    df = contour_segments(pts_for_cells(spark, field), res=RES, threshold=t)
    return sorted(
        (r.bx, r.by, r.x1, r.y1, r.x2, r.y2) for r in df.collect()
    )


def test_single_hot_cell_diamond(spark):
    field = {(5, 7): 5}
    segs = got_segments(spark, field, 2.5)
    assert len(segs) == 4  # one crossing segment in each of the 4 blocks
    assert segs == reference_segments(field, 2.5)
    # spot-pin one endpoint: block (4,6) is case 4 (only v11 inside)
    s = [x for x in segs if (x[0], x[1]) == (4, 6)][0]
    assert s[2:] == (5.0, 6.5, 4.5, 7.0)


def test_saddle_case_two_segments(spark):
    # v00 and v11 hot, v10/v01 cold -> case 5 in block (3,3): two segs
    field = {(3, 3): 4, (4, 4): 4}
    segs = got_segments(spark, field, 2.5)
    assert segs == reference_segments(field, 2.5)
    in_block = [s for s in segs if (s[0], s[1]) == (3, 3)]
    assert len(in_block) == 2


def test_random_field_parity(spark):
    rng = np.random.default_rng(11)
    field = {}
    for _ in range(60):
        ix, iy = int(rng.integers(2, 12)), int(rng.integers(2, 12))
        field[(ix, iy)] = int(rng.integers(1, 7))
    for t in (0.5, 1.5, 3.5):
        assert got_segments(spark, field, t) == reference_segments(field, t)


def test_weight_col(spark):
    lon, lat = cell_center_lonlat(6, 6)
    df = spark.createDataFrame([(lon, lat, 5)], "lon long, lat long, w long")
    segs = contour_segments(df, res=RES, threshold=2.5, weight_col="w").count()
    assert segs == 4


def test_empty_below_threshold(spark):
    field = {(5, 5): 1, (8, 8): 2}
    assert got_segments(spark, field, 2.5) == []
