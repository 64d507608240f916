"""Hilbert curve index (functions/cells): LUT derivation vs the classic
xy2d recurrence, continuity/bijection invariants, range decomposition
exactness, Column parity, and the Hilbert-clustered layout path.

Reference context: the reference engine has no standing spatial index —
every extract is a full pass (src/command_extract.cpp). The Hilbert index
is the engine's scale path (SURVEY.md §1.4): S2-style curve locality so a
bbox extract over a clustered table reads contiguous ranges.
"""

import random

import pytest

from pyspark.sql import functions as F

from osmium_tool_spark.functions.cells import (
    HILBERT_DIGIT,
    HILBERT_INV,
    HILBERT_NEXT,
    hilbert_cell,
    hilbert_cell_py,
    hilbert_py,
    hilbert_ranges,
    hilbert_xy_py,
    morton_ranges,
)

LON_SPAN, LAT_SPAN = 3_600_000_000, 1_800_000_000


def xy2d_reference(n: int, x: int, y: int) -> int:
    """Independent reference: the classic xy2d rotation recurrence
    (literal loop with coordinate mutation — the form the LUTs were
    derived FROM, kept verbatim as the cross-check)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_luts_are_the_recurrence():
    rng = random.Random(42)
    for res in (1, 2, 3, 5, 8, 16, 30):
        n = 1 << res
        for _ in range(200):
            x, y = rng.randrange(n), rng.randrange(n)
            assert hilbert_py(x, y, res) == xy2d_reference(n, x, y)


def test_order1_known_vectors():
    # the canonical U-shape: (0,0)->0 (0,1)->1 (1,1)->2 (1,0)->3
    assert [hilbert_py(x, y, 1) for (x, y) in [(0, 0), (0, 1), (1, 1), (1, 0)]] == [
        0, 1, 2, 3,
    ]


def test_continuity_and_bijection():
    # consecutive distances are always grid-adjacent (the property Morton
    # lacks), and the curve visits every cell exactly once
    res = 5
    pts = [hilbert_xy_py(d, res) for d in range(4 ** res)]
    assert all(
        abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1 for a, b in zip(pts, pts[1:])
    )
    assert sorted(pts) == [(x, y) for x in range(32) for y in range(32)]


def test_xy_roundtrip():
    rng = random.Random(7)
    for res in (2, 6, 12, 20):
        n = 1 << res
        for _ in range(200):
            x, y = rng.randrange(n), rng.randrange(n)
            assert hilbert_xy_py(hilbert_py(x, y, res), res) == (x, y)


def test_inverse_lut_consistency():
    for s in range(len(HILBERT_DIGIT) // 4):
        for d in range(4):
            xo, yo = HILBERT_INV[s][d]
            assert HILBERT_DIGIT[s * 4 + xo * 2 + yo] == d
            assert 0 <= HILBERT_NEXT[s * 4 + xo * 2 + yo] < len(HILBERT_DIGIT) // 4


def _enumerate_box_cells(a, c, b, d, res):
    n = 1 << res
    x0 = min(max((a + LON_SPAN // 2) * n // LON_SPAN, 0), n - 1)
    x1 = min(max((b + LON_SPAN // 2) * n // LON_SPAN, 0), n - 1)
    y0 = min(max((c + LAT_SPAN // 2) * n // LAT_SPAN, 0), n - 1)
    y1 = min(max((d + LAT_SPAN // 2) * n // LAT_SPAN, 0), n - 1)
    return {
        hilbert_py(x, y, res) for x in range(x0, x1 + 1) for y in range(y0, y1 + 1)
    }


def test_ranges_exact_uncapped():
    rng = random.Random(11)
    res = 6
    for _ in range(30):
        a, b = sorted(rng.randrange(-LON_SPAN // 2, LON_SPAN // 2) for _ in range(2))
        c, d = sorted(rng.randrange(-LAT_SPAN // 2, LAT_SPAN // 2) for _ in range(2))
        got = set()
        tag = res << 56
        for lo, hi in hilbert_ranges(a, c, b, d, res, max_ranges=10 ** 9):
            got |= set(range(lo - tag, hi - tag + 1))
        assert got == _enumerate_box_cells(a, c, b, d, res)


def test_ranges_capped_superset_and_sorted():
    rng = random.Random(13)
    res = 8
    for _ in range(20):
        a, b = sorted(rng.randrange(-LON_SPAN // 2, LON_SPAN // 2) for _ in range(2))
        c, d = sorted(rng.randrange(-LAT_SPAN // 2, LAT_SPAN // 2) for _ in range(2))
        capped = hilbert_ranges(a, c, b, d, res, max_ranges=8)
        assert len(capped) <= 8
        assert capped == sorted(capped)
        tag = res << 56
        want = _enumerate_box_cells(a, c, b, d, res)
        covered = set()
        for lo, hi in capped:
            covered |= set(range(lo - tag, hi - tag + 1))
        assert want <= covered  # superset: never lose a cell


def test_hilbert_beats_morton_range_count():
    # the continuity payoff: over random boxes the continuous curve needs
    # (in aggregate) about half the ranges Z-order does at equal res
    rng = random.Random(17)
    res = 10
    h = m = 0
    for _ in range(60):
        a, b = sorted(rng.randrange(-LON_SPAN // 2, LON_SPAN // 2) for _ in range(2))
        c, d = sorted(rng.randrange(-LAT_SPAN // 2, LAT_SPAN // 2) for _ in range(2))
        h += len(hilbert_ranges(a, c, b, d, res, max_ranges=10 ** 9))
        m += len(morton_ranges(a, c, b, d, res, max_ranges=10 ** 9))
    assert h < m


def test_column_parity(spark):
    rng = random.Random(23)
    rows = [
        (
            i,
            rng.randrange(-LON_SPAN // 2, LON_SPAN // 2),
            rng.randrange(-LAT_SPAN // 2, LAT_SPAN // 2),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, lon long, lat long")
    for res in (1, 7, 12, 16):
        out = df.select(
            "id", "lon", "lat",
            hilbert_cell(F.col("lon"), F.col("lat"), res).alias("hc"),
        ).collect()
        for r in out:
            assert r.hc == hilbert_cell_py(r.lon, r.lat, res)


def test_hilbert_layout_prunes_and_matches(spark, tmp_path):
    from osmium_tool_spark.sources.layout import bbox_scan_clustered, write_clustered

    rng = random.Random(29)
    rows = [
        (
            i,
            rng.randrange(-LON_SPAN // 2, LON_SPAN // 2),
            rng.randrange(-LAT_SPAN // 2, LAT_SPAN // 2),
        )
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "id long, lon long, lat long")
    path = str(tmp_path / "hclustered")
    write_clustered(df, path, res=8, partitions=16, curve="hilbert")
    bbox = (-300_000_000, -200_000_000, 400_000_000, 300_000_000)
    out, stats = bbox_scan_clustered(spark, path, bbox, res=8, curve="hilbert")
    got = sorted(r.id for r in out.collect())
    want = sorted(
        i for (i, lo, la) in rows
        if bbox[0] <= lo <= bbox[2] and bbox[1] <= la <= bbox[3]
    )
    assert got == want
    assert stats["files_read"] < stats["files_total"]  # pruning engaged


def test_write_clustered_rejects_unknown_curve(spark):
    from osmium_tool_spark.sources.layout import write_clustered

    df = spark.range(1).select(
        F.col("id"), F.lit(0).alias("lon"), F.lit(0).alias("lat")
    )
    with pytest.raises(ValueError):
        write_clustered(df, "/tmp/never", res=4, curve="peano")
