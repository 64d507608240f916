"""Tile renderer: density_pixels (exact integer pixel math) and
render_density_tiles (distributed grayscale-PNG map tiles).

The PNG decoder below is written from the public spec (RFC 2083):
signature, chunk walk with CRC verification, zlib-inflate IDAT,
filter-byte-0 scanlines — so the encoder is pinned independently of
its own code.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.operators.tiles import density_pixels, render_density_tiles


def decode_png_gray(png: bytes) -> np.ndarray:
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos, w = 8, None
    idat = b""
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        typ = png[pos + 4 : pos + 8]
        data = png[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", png[pos + 8 + length : pos + 12 + length])
        assert crc == zlib.crc32(typ + data), f"bad CRC on {typ!r}"
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            assert (depth, color, comp, filt, inter) == (8, 0, 0, 0, 0)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    rows = np.frombuffer(raw, np.uint8).reshape(h, w + 1)
    assert (rows[:, 0] == 0).all(), "non-zero filter byte"
    return rows[:, 1:].copy()


def pts(spark, coords):
    return spark.createDataFrame(
        [(int(x), int(y)) for x, y in coords], "lon long, lat long"
    )


def test_pixel_math_and_y_flip(spark):
    # res 4 (16x16 world px), tile_shift 2 (4x4 tiles): world px size is
    # 225e6 x 112.5e6 units. A point at the world's top-left corner lands
    # in world px (0, 15) -> tile (0, 3), in-tile px (0, py=0) (row 0 = top).
    rows = density_pixels(
        pts(spark, [(-1_800_000_000, 899_999_999)]), res=4, tile_shift=2
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.tile_ix, r.tile_iy, r.px, r.py) == (0, 3, 0, 0)
    assert r.val == 255 // 16  # one point, saturation 16


def test_saturation_ramp_exact(spark):
    # k points on one pixel -> val = min(255, k*255 div 4)
    base = [(0, 0)] * 7
    rows = density_pixels(pts(spark, base), res=4, tile_shift=2, saturation=4).collect()
    assert len(rows) == 1
    assert rows[0].val == 255  # 7*255//4 = 446 -> clamped
    rows = density_pixels(
        pts(spark, [(0, 0)] * 3), res=4, tile_shift=2, saturation=4
    ).collect()
    assert rows[0].val == 3 * 255 // 4


def test_weight_col(spark):
    df = spark.createDataFrame(
        [(0, 0, 5), (0, 0, 3)], "lon long, lat long, w long"
    )
    rows = density_pixels(df, res=4, tile_shift=2, saturation=16, weight_col="w").collect()
    assert rows[0].val == 8 * 255 // 16


def test_render_roundtrip_matches_pixels(spark):
    # deterministic scatter across several tiles; decode every PNG and
    # compare against the density_pixels frame pixel-for-pixel.
    n = 400
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % 3_600_000_000 - 1_800_000_000).alias("lon"),
        ((F.col("id") * 2246822519) % 1_800_000_000 - 900_000_000).alias("lat"),
    )
    px = {}
    for r in density_pixels(df, res=6, tile_shift=3).collect():
        px.setdefault((r.tile_ix, r.tile_iy), {})[(r.py, r.px)] = r.val
    tiles = render_density_tiles(df, res=6, tile_shift=3).collect()
    assert {(t.tile_ix, t.tile_iy) for t in tiles} == set(px)
    for t in tiles:
        img = decode_png_gray(bytes(t.png))
        assert img.shape == (8, 8)
        want = np.zeros((8, 8), np.uint8)
        for (py, x), v in px[(t.tile_ix, t.tile_iy)].items():
            want[py, x] = v
        assert (img == want).all()
        assert t.n_px == len(px[(t.tile_ix, t.tile_iy)])
        assert t.max_val == int(want.max())


def test_empty_tiles_absent_and_determinism(spark):
    df = pts(spark, [(0, 0), (1, 1)])  # both in one pixel
    a = render_density_tiles(df, res=6, tile_shift=3).collect()
    b = render_density_tiles(df.repartition(7), res=6, tile_shift=3).collect()
    assert len(a) == 1 and len(b) == 1
    assert bytes(a[0].png) == bytes(b[0].png)  # byte-deterministic


def test_bad_args(spark):
    df = pts(spark, [(0, 0)])
    with pytest.raises(ValueError):
        density_pixels(df, res=4, tile_shift=5)
    with pytest.raises(ValueError):
        density_pixels(df, res=4, tile_shift=2, saturation=0)
