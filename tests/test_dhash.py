"""image_dhash (operators/multimodal.py): exact dHash over the real
from-spec PNG codec loop."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from osmium_tool_spark.functions import png
from osmium_tool_spark.operators.multimodal import image_dhash
from osmium_tool_spark.sources.images import encode_pattern_png_images


def ref_dhash(img: np.ndarray, grid: int = 8) -> tuple[int, int]:
    """Independent reference: explicit python-loop block sums + packing."""
    h, w = img.shape
    bw, bh = w // (grid + 1), h // grid
    hi = lo = 0
    bits = []
    for r in range(grid):
        for c in range(grid):
            sa = int(
                img[r * bh:(r + 1) * bh, c * bw:(c + 1) * bw].astype(int).sum()
            )
            sb = int(
                img[r * bh:(r + 1) * bh, (c + 1) * bw:(c + 2) * bw]
                .astype(int)
                .sum()
            )
            bits.append(1 if sa > sb else 0)
    for b in bits[:32]:
        hi = (hi << 1) | b
    for b in bits[32:]:
        lo = (lo << 1) | b
    return hi, lo


def pattern(val: int, w: int = 18, h: int = 16) -> np.ndarray:
    xs = np.arange(w) * 7
    ys = np.arange(h) * 13
    return ((val * 31 + ys[:, None] + xs[None, :]) % 256).astype(np.uint8)


def test_spark_matches_reference(spark):
    rows = [(i, (i * 37) % 256, 18, 16) for i in range(64)]
    df = spark.createDataFrame(rows, "image_id long, val int, w int, h int")
    out = image_dhash(encode_pattern_png_images(df), grid=8).collect()
    assert len(out) == 64
    for r in out:
        hi, lo = ref_dhash(pattern((r.image_id * 37) % 256))
        assert (r.dhash_hi, r.dhash_lo) == (hi, lo), r.image_id
        assert 0 <= r.dhash_hi < 2 ** 32 and 0 <= r.dhash_lo < 2 ** 32


def test_codec_loop_is_real(spark):
    # encode -> decode round trip must reproduce the source pixels the
    # reference hash was computed from (codec bug => hash flip)
    df = spark.createDataFrame(
        [(7, 123, 36, 32)], "image_id long, val int, w int, h int"
    )
    payload = bytes(
        encode_pattern_png_images(df).collect()[0].bytes
    )
    img = png.luma(png.decode(payload))
    xs = np.arange(36) * 7
    ys = np.arange(32) * 13
    want = ((123 * 31 + ys[:, None] + xs[None, :]) % 256).astype(np.uint8)
    assert np.array_equal(img, want)


def test_bad_dims_fail_loud(spark):
    df = spark.createDataFrame(
        [(1, 5, 17, 16)], "image_id long, val int, w int, h int"
    )
    with pytest.raises(Exception, match="not divisible"):
        image_dhash(encode_pattern_png_images(df), grid=8).collect()


def test_grid_validation(spark):
    df = spark.createDataFrame(
        [(1, 5, 18, 16)], "image_id long, val int, w int, h int"
    )
    with pytest.raises(ValueError):
        image_dhash(df, grid=0)
    with pytest.raises(ValueError):
        image_dhash(df, grid=16)


def test_brightness_invariance_and_transpose_distance(spark):
    # dHash is a gradient hash: a uniform brightness shift (no clipping)
    # moves every block sum equally, so the hash is IDENTICAL; the
    # transposed gradient restructures blocks and must land far away
    base = pattern(100)
    plus = np.clip(base.astype(int) + 5, 0, 250).astype(np.uint8)
    transposed = pattern(100, 16, 18).T  # 18x16 again, gradient rotated
    rows = [
        (0, bytearray(png.encode_gray(base))),
        (1, bytearray(png.encode_gray(plus))),
        (2, bytearray(png.encode_gray(np.ascontiguousarray(transposed)))),
    ]
    df = spark.createDataFrame(rows, "image_id long, bytes binary")
    out = {r.image_id: r for r in image_dhash(df, grid=8).collect()}

    def hamming(x, y):
        return bin(x.dhash_hi ^ y.dhash_hi).count("1") + bin(
            x.dhash_lo ^ y.dhash_lo
        ).count("1")

    assert hamming(out[0], out[1]) == 0  # brightness-shift invariant
    assert hamming(out[0], out[2]) > 8  # structural change moves it


def test_string_id_type_passthrough(spark):
    df = spark.createDataFrame(
        [("imgX", 5, 18, 16)], "image_id string, val int, w int, h int"
    )
    out = image_dhash(encode_pattern_png_images(df), grid=8)
    assert dict(out.dtypes)["image_id"] == "string"
    assert out.collect()[0].image_id == "imgX"


def test_near_dup_matches_brute_force(spark):
    # pigeonhole recall guarantee: the banded join must reproduce the
    # brute-force pair set exactly for max_hamming < bands
    from osmium_tool_spark.operators.dedup import dhash_near_dup_pairs

    rows = [(i, (i * 37) % 256, 18, 16) for i in range(80)]
    df = spark.createDataFrame(rows, "image_id long, val int, w int, h int")
    imgs = encode_pattern_png_images(df)
    got = {
        (r.a, r.b, r.hamming)
        for r in dhash_near_dup_pairs(imgs, max_hamming=3, bands=4).collect()
    }
    hashes = {
        r.image_id: (r.dhash_hi, r.dhash_lo)
        for r in image_dhash(imgs, grid=8).collect()
    }
    want = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(hashes[a][0] ^ hashes[b][0]).count("1") + bin(
                hashes[a][1] ^ hashes[b][1]
            ).count("1")
            if d <= 3:
                want.add((a, b, d))
    assert got == want and want  # non-empty: exact-dup val clusters exist


def test_near_dup_validation(spark):
    from osmium_tool_spark.operators.dedup import dhash_near_dup_pairs

    df = spark.createDataFrame(
        [(1, 5, 18, 16)], "image_id long, val int, w int, h int"
    )
    with pytest.raises(ValueError):
        dhash_near_dup_pairs(df, max_hamming=4, bands=4)  # recall not guaranteed
    with pytest.raises(ValueError):
        dhash_near_dup_pairs(df, max_hamming=1, bands=3)  # band misalignment


def test_mixed_png_jpeg_table(spark):
    """r5: the dhash kernel dispatches on magic bytes — a mixed
    PNG+JPEG table hashes end-to-end, and a JPEG re-encode of the SAME
    pattern lands within a small Hamming distance of its PNG twin
    (q95 on the smooth low-frequency half of the gradient; perceptual
    hashes are exactly the thing lossy compression must not move)."""
    import numpy as np

    from osmium_tool_spark.functions import jpeg as _jpeg
    from osmium_tool_spark.functions import png as _png

    def smooth(val, w=18, h=16):
        xs = np.arange(w, dtype=np.float64) * 5
        ys = np.arange(h, dtype=np.float64) * 7
        return np.clip(
            128 + 80 * np.sin((val + ys[:, None] + xs[None, :]) / 40.0),
            0, 255,
        ).astype(np.uint8)

    rows = []
    for i in range(16):
        img = smooth((i * 37) % 256)
        payload = (_png.encode_gray(img) if i % 2 == 0
                   else _jpeg.encode_gray(img, 95))
        rows.append((i, payload))
    df = spark.createDataFrame(rows, "image_id long, bytes binary")
    out = {r.image_id: r for r in image_dhash(df, grid=8).collect()}
    assert len(out) == 16

    def ham(a, b):
        return bin(a ^ b).count("1")

    # direct check: encode the same val both ways and compare
    img = smooth(42)
    both = spark.createDataFrame(
        [(100, _png.encode_gray(img)), (101, _jpeg.encode_gray(img, 95))],
        "image_id long, bytes binary")
    r = {x.image_id: x for x in image_dhash(both, grid=8).collect()}
    d = (ham(r[100].dhash_hi, r[101].dhash_hi)
         + ham(r[100].dhash_lo, r[101].dhash_lo))
    assert d <= 6, f"hamming {d} between PNG and q95 JPEG of same image"
