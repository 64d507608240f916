"""geohash_col: known-vector parity + pure-Python reference parity.

Known vectors are the canonical public examples (Wikipedia/Niemeyer):
ezs42 ~ (42.605, -5.603), u4pruydqqvj ~ (57.64911, 10.40744).
"""

import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.functions.cells import GEOHASH_BASE32, geohash_col

D = 10_000_000  # fixed-point per degree


def ref_geohash(lon_deg: float, lat_deg: float, precision: int) -> str:
    """Classic interval-halving reference implementation."""
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    bits, out, even = 0, [], True
    ch = 0
    for _ in range(5 * precision):
        if even:
            mid = (lo_lon + hi_lon) / 2
            b = lon_deg >= mid
            lo_lon, hi_lon = (mid, hi_lon) if b else (lo_lon, mid)
        else:
            mid = (lo_lat + hi_lat) / 2
            b = lat_deg >= mid
            lo_lat, hi_lat = (mid, hi_lat) if b else (lo_lat, mid)
        ch = (ch << 1) | int(b)
        even = not even
        bits += 1
        if bits == 5:
            out.append(GEOHASH_BASE32[ch])
            bits, ch = 0, 0
    return "".join(out)


def _gh(spark, rows, precision):
    df = spark.createDataFrame(rows, "lon long, lat long")
    return [
        r["gh"]
        for r in df.select(
            geohash_col(F.col("lon"), F.col("lat"), precision).alias("gh")
        ).collect()
    ]


def test_known_vectors(spark):
    rows = [
        (int(-5.603 * D), int(42.605 * D)),
        (int(10.40744 * D), int(57.64911 * D)),
    ]
    got = _gh(spark, rows, 5)
    assert got[0] == "ezs42"
    assert got[1] == ref_geohash(10.40744, 57.64911, 5) == "u4pru"
    got11 = _gh(spark, rows[1:], 11)
    assert got11[0] == "u4pruydqqvj"


def ref_geohash_fp(lon_fp: int, lat_fp: int, precision: int) -> str:
    """Bit-extraction reference mirroring the engine's exact arithmetic
    (int64 multiply, ONE double division, floor) — the interval-halving
    form can disagree on bin boundaries by double-rounding, the binned
    form cannot."""
    import math

    nbits = 5 * precision
    nlon, nlat = (nbits + 1) // 2, nbits // 2
    lonb = min(int(math.floor(float((lon_fp + 1_800_000_000) * (1 << nlon))
                              / 3_600_000_000)), (1 << nlon) - 1)
    latb = min(int(math.floor(float((lat_fp + 900_000_000) * (1 << nlat))
                              / 1_800_000_000)), (1 << nlat) - 1)
    out = []
    for k in range(precision):
        code = 0
        for j in range(5):
            i = 5 * k + j
            bit = ((lonb >> (nlon - 1 - i // 2)) if i % 2 == 0
                   else (latb >> (nlat - 1 - i // 2))) & 1
            code = (code << 1) | bit
        out.append(GEOHASH_BASE32[code])
    return "".join(out)


def test_reference_parity_random(spark):
    import random

    random.seed(11)
    rows = [
        (random.randrange(-1_800_000_000, 1_800_000_000),
         random.randrange(-900_000_000, 900_000_000))
        for _ in range(300)
    ]
    for precision in (1, 4, 7, 12):
        got = _gh(spark, rows, precision)
        want = [ref_geohash_fp(lon, lat, precision) for lon, lat in rows]
        assert got == want
    # the two references agree away from bin boundaries: spot-check the
    # halving form on a safe interior subset at moderate precision
    subset = rows[:50]
    assert [ref_geohash_fp(lon, lat, 5) for lon, lat in subset] == [
        ref_geohash(lon / D, lat / D, 5) for lon, lat in subset
    ]


def test_edges_and_validation(spark):
    rows = [
        (1_800_000_000, 900_000_000),    # +180/+90 clamp
        (-1_800_000_000, -900_000_000),  # min corner
        (0, 0),
    ]
    got = _gh(spark, rows, 6)
    assert got[1] == "0" * 6          # all-low bits
    assert got[0] == "z" * 6          # clamped all-high bits
    assert got[2] == ref_geohash(0.0, 0.0, 6) == "s00000"
    with pytest.raises(ValueError):
        geohash_col(F.col("lon"), F.col("lat"), 0)
    with pytest.raises(ValueError):
        geohash_col(F.col("lon"), F.col("lat"), 13)
