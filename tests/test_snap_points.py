"""snap_points: map-matching (nearest-segment join within max_dist).

Semantics under test:
  - exact nearest segment among ALL segments within max_dist, even when
    the winner sits in a neighboring cell (padded-cover completeness)
  - interior / endpoint projection cases (t clamped to [0, 1])
  - deterministic (way_id, seq) tie-break on equidistant segments
  - degenerate zero-length segments snap as points
  - points with nothing within max_dist are absent
  - brute-force float parity on random localized input
  - loud pad guard when max_dist spans too many cells
"""

import math

import pytest

from osmium_tool_spark.operators.spatial_join import snap_points

D = 10_000_000  # 1 degree fixed-point


def _pts(spark, rows):
    return spark.createDataFrame(rows, "point_id long, lon long, lat long")


def _segs(spark, rows):
    return spark.createDataFrame(
        rows, "way_id long, seq long, x1 long, y1 long, x2 long, y2 long"
    )


def _brute(pts, segs, max_dist):
    out = {}
    for pid, px, py in pts:
        best = None
        for wid, seq, x1, y1, x2, y2 in segs:
            dx, dy = x2 - x1, y2 - y1
            wx, wy = px - x1, py - y1
            tnum = wx * dx + wy * dy
            tden = dx * dx + dy * dy
            if tnum <= 0:
                d2, t = float(wx * wx + wy * wy), 0.0
            elif tnum >= tden:
                vx, vy = px - x2, py - y2
                d2, t = float(vx * vx + vy * vy), 1.0
            else:
                cr = wx * dy - wy * dx
                d2 = float(cr) * float(cr) / float(tden)
                t = float(tnum) / float(tden)
            if d2 <= float(max_dist) * float(max_dist):
                key = (d2, wid, seq)
                if best is None or key < best[0]:
                    best = (key, (pid, wid, seq, d2, t))
        if best:
            out[pid] = best[1]
    return set(out.values())


def test_interior_endpoint_and_t(spark):
    segs = [(7, 1, 0, 0, 10 * D, 0)]
    pts = [
        (1, 5 * D, 2 * D),      # interior projection, t=0.5
        (2, -3 * D, 4 * D),     # before start -> endpoint a, t=0
        (3, 13 * D, -4 * D),    # past end -> endpoint b, t=1
    ]
    got = {
        r.point_id: r
        for r in snap_points(
            _pts(spark, pts), _segs(spark, segs), res=5, max_dist=6 * D
        ).collect()
    }
    assert got[1].t == 0.5 and got[1].dist2 == float(2 * D) ** 2
    assert got[2].t == 0.0 and got[2].dist2 == float(3 * D) ** 2 + float(4 * D) ** 2
    assert got[3].t == 1.0 and got[3].dist2 == float(3 * D) ** 2 + float(4 * D) ** 2


def test_neighbor_cell_winner(spark):
    # point sits just inside cell C; the nearest segment lies wholly in
    # the adjacent cell. res 5 -> cell = 11.25 x 5.625 deg. Put the point
    # near a cell edge and the winner ~0.2 deg across it, with a decoy
    # 3 deg away inside the point's own cell.
    edge_x = -180 * D + 11.25 * D * 16  # x boundary between cells 15|16
    px = int(edge_x) - D // 5  # 0.2 deg left of the boundary
    py = 2 * D
    segs = [
        (1, 1, int(edge_x) + D // 5, 0, int(edge_x) + D // 5, 4 * D),  # winner
        (2, 1, px - 3 * D, 0, px - 3 * D, 4 * D),  # decoy in own cell
    ]
    out = snap_points(
        _pts(spark, [(9, px, py)]), _segs(spark, segs), res=5, max_dist=D
    ).collect()
    assert len(out) == 1 and out[0].way_id == 1
    assert math.isclose(out[0].dist2, (2 * D / 5) ** 2, rel_tol=1e-12)


def test_tie_breaks_by_way_seq(spark):
    segs = [
        (5, 2, -D, 2 * D, D, 2 * D),
        (5, 1, -D, -2 * D, D, -2 * D),  # same distance, lower seq
        (3, 9, 2 * D, -D, 2 * D, D),    # same distance, lowest way
    ]
    out = snap_points(
        _pts(spark, [(1, 0, 0)]), _segs(spark, segs), res=6, max_dist=3 * D
    ).collect()
    assert (out[0].way_id, out[0].seq) == (3, 9)


def test_degenerate_point_segment(spark):
    segs = [(4, 1, D, D, D, D)]
    out = snap_points(
        _pts(spark, [(1, 0, 0)]), _segs(spark, segs), res=6, max_dist=2 * D
    ).collect()
    assert out[0].t == 0.0
    assert out[0].dist2 == 2 * float(D) ** 2


def test_out_of_range_absent(spark):
    segs = [(4, 1, 50 * D, 0, 51 * D, 0)]
    out = snap_points(
        _pts(spark, [(1, 0, 0)]), _segs(spark, segs), res=5, max_dist=D
    ).collect()
    assert out == []


def test_random_brute_parity(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    segs, pts = [], []
    for w in range(60):
        bx = int(rng.integers(-160, 160)) * D
        by = int(rng.integers(-70, 70)) * D
        for s in range(1, 4):
            segs.append(
                (w, s,
                 bx + int(rng.integers(-D, D)), by + int(rng.integers(-D, D)),
                 bx + int(rng.integers(-D, D)), by + int(rng.integers(-D, D)))
            )
        pts.append(
            (w * 10, bx + int(rng.integers(-2 * D, 2 * D)),
             by + int(rng.integers(-2 * D, 2 * D)))
        )
    got = {
        (r.point_id, r.way_id, r.seq, r.dist2, r.t)
        for r in snap_points(
            _pts(spark, pts), _segs(spark, segs), res=8, max_dist=3 * D
        ).collect()
    }
    assert got == _brute(pts, segs, 3 * D)


def test_pad_guard_raises(spark):
    with pytest.raises(ValueError, match="coarsen res"):
        snap_points(_pts(spark, []), _segs(spark, []), res=12, max_dist=20 * D)
    with pytest.raises(ValueError, match="positive"):
        snap_points(_pts(spark, []), _segs(spark, []), res=5, max_dist=0)
