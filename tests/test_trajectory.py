"""resample_track (operators/trajectory.py)."""

import pytest

from osmium_tool_spark.operators.trajectory import resample_track


def _run(spark, rows, step):
    df = spark.createDataFrame(rows, "key long, ts long, x long, y long")
    return sorted(
        (r.key, r.t, r.x, r.y)
        for r in resample_track(df, step=step).collect()
    )


def test_linear_interpolation(spark):
    # one segment from t=0 (0,0) to t=100 (1000, 2000), step 25:
    # samples at 0, 25, 50, 75 (interior; 100 excluded) + 100 (end on clock)
    rows = [(1, 0, 0, 0), (1, 100, 1000, 2000)]
    got = _run(spark, rows, 25)
    assert got == [
        (1, 0, 0.0, 0.0),
        (1, 25, 250.0, 500.0),
        (1, 50, 500.0, 1000.0),
        (1, 75, 750.0, 1500.0),
        (1, 100, 1000.0, 2000.0),
    ]


def test_end_not_on_clock(spark):
    rows = [(1, 0, 0, 0), (1, 90, 900, 900)]
    got = _run(spark, rows, 25)
    assert [t for (_, t, _, _) in got] == [0, 25, 50, 75]  # no 90


def test_offset_start(spark):
    # first sample is the first clock tick INSIDE the span
    rows = [(1, 30, 0, 0), (1, 130, 1000, 1000)]
    got = _run(spark, rows, 50)
    assert [t for (_, t, _, _) in got] == [50, 100]
    assert got[0][2] == pytest.approx((50 - 30) / 100 * 1000)


def test_multi_segment_and_keys(spark):
    rows = [
        (1, 0, 0, 0), (1, 40, 400, 0), (1, 100, 1000, 0),
        (2, 0, 5, 5),
    ]
    got = _run(spark, rows, 20)
    k1 = [(t, x) for (k, t, x, _) in got if k == 1]
    assert k1 == [(0, 0.0), (20, 200.0), (40, 400.0), (60, 600.0),
                  (80, 800.0), (100, 1000.0)]
    # singleton track at t=0 (on clock) emits its single point
    assert [(t, x) for (k, t, x, _) in got if k == 2] == [(0, 5.0)]


def test_duplicate_ts_deterministic(spark):
    rows = [(1, 0, 0, 0), (1, 0, 9, 9), (1, 10, 100, 100)]
    a = _run(spark, rows, 5)
    b = _run(spark, list(reversed(rows)), 5)
    assert a == b  # (ts, x, y) tiebreak, input order irrelevant
    # the zero-length segment emits nothing; the LATER duplicate row
    # ((ts,x,y) order puts (0,9,9) second) anchors the next segment,
    # so the t=0 sample reads (9, 9) — the documented contract
    assert a[0] == (1, 0, 9.0, 9.0)


def test_validation(spark):
    df = spark.createDataFrame([(1, 0, 0, 0)], "key long, ts long, x long, y long")
    with pytest.raises(ValueError):
        resample_track(df, step=0)
