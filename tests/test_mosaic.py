"""mosaic_tiles: per-tile contact sheets over real PNG payloads.

The decode → thumbnail → paste → encode loop runs the from-spec codec
both ways; pins:
  - numpy-reference parity for a gradient source (exact NN indices)
  - constant-source mean: mosaic mean_luma == sum(vals)/grid² exactly
  - deterministic top-k: first grid² image_ids per cell, row-major
  - overflow cells keep only grid² thumbs; short cells keep background 0
  - arg validation
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.functions import png as png_codec
from osmium_tool_spark.operators.multimodal import mosaic_tiles
from osmium_tool_spark.sources.images import encode_gray_png_images


def _img_rows(spark, rows):
    # rows: (image_id, w, h, val, lon, lat)
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, val int, lon long, lat long"
    )
    return encode_gray_png_images(df)


def test_constant_mean_and_topk(spark):
    # 6 images in one res-2 cell (cell of lon/lat ~ (5e8, 2e8)); grid=2
    # keeps only the first 4 by image_id
    rows = [(f"img{i}", 8 + i, 6 + i, 10 * i + 5, 500_000_000 + i, 200_000_000)
            for i in range(6)]
    imgs = _img_rows(spark, rows)
    out = mosaic_tiles(imgs, res=2, grid=2, thumb=16).collect()
    assert len(out) == 1
    m = out[0]
    assert (m["w"], m["h"], m["n_imgs"]) == (32, 32, 4)
    decoded = png_codec.luma(png_codec.decode(bytes(m["png"])))
    want_mean = sum(10 * i + 5 for i in range(4)) / 4.0
    assert decoded.mean() == want_mean  # exact: ints / power of two
    # slot layout row-major by image_id order
    assert decoded[0, 0] == 5 and decoded[0, 31] == 15
    assert decoded[31, 0] == 25 and decoded[31, 31] == 35


def test_gradient_parity_with_numpy_reference(spark):
    h, w = 11, 7
    grad = (np.arange(h)[:, None] * 17 + np.arange(w)[None, :] * 5) % 256
    payload = png_codec.encode_gray(grad.astype(np.uint8))
    df = spark.createDataFrame(
        [("g1", payload, 100, 100)], "image_id string, bytes binary, lon long, lat long"
    )
    out = mosaic_tiles(df, res=3, grid=1, thumb=16).collect()
    assert len(out) == 1
    got = png_codec.luma(png_codec.decode(bytes(out[0]["png"])))
    ys = np.arange(16) * h // 16
    xs = np.arange(16) * w // 16
    want = grad[np.ix_(ys, xs)].astype(np.float64)
    assert np.array_equal(got, want)


def test_multi_cell_and_short_cells(spark):
    # two cells: 1 image in one, 3 in the other (grid=2 -> 4 slots)
    rows = [("a0", 8, 8, 100, -900_000_000, -450_000_000)] + [
        (f"b{i}", 8, 8, 50, 900_000_000, 450_000_000) for i in range(3)
    ]
    imgs = _img_rows(spark, rows)
    out = {r["cell"]: r for r in mosaic_tiles(imgs, res=2, grid=2, thumb=8).collect()}
    assert len(out) == 2
    means = sorted(
        png_codec.luma(png_codec.decode(bytes(r["png"]))).mean()
        for r in out.values()
    )
    assert means == [100 / 4.0, 3 * 50 / 4.0]
    assert sorted(r["n_imgs"] for r in out.values()) == [1, 3]


def test_bad_args(spark):
    df = spark.createDataFrame([], "image_id string, bytes binary, lon long, lat long")
    with pytest.raises(ValueError):
        mosaic_tiles(df, res=2, grid=0)
    with pytest.raises(ValueError):
        mosaic_tiles(df, res=2, thumb=0)


def test_mixed_png_jpeg_inputs(spark):
    """r5: the paste kernel dispatches on magic bytes — a contact
    sheet over a MIXED PNG+JPEG cell decodes both for real. JPEG rows
    are constant-gray images (DC-only: from-spec JPEG reconstructs a
    constant plane near-exactly), so the decoded mosaic means stay
    within 1 luma of the all-PNG expectation."""
    from osmium_tool_spark.functions import jpeg as jpeg_codec

    rows = [("a0", 16, 16, 40, 500_000_000, 200_000_000),
            ("a1", 16, 16, 80, 500_000_001, 200_000_000)]
    png_half = _img_rows(spark, rows[:1])
    import numpy as np
    jpg_payload = jpeg_codec.encode_gray(
        np.full((16, 16), 80, np.uint8), quality=92)
    jpg_half = spark.createDataFrame(
        [("a1", 16, 16, 80, 500_000_001, 200_000_000, jpg_payload, "jpeg")],
        "image_id string, w int, h int, val int, lon long, lat long,"
        " bytes binary, fmt string")
    imgs = png_half.unionByName(jpg_half)
    out = mosaic_tiles(imgs, res=2, grid=2, thumb=8).collect()
    assert len(out) == 1 and out[0]["n_imgs"] == 2
    decoded = png_codec.luma(png_codec.decode(bytes(out[0]["png"])))
    assert abs(float(decoded[0:8, 0:8].mean()) - 40.0) <= 1.0   # PNG slot
    assert abs(float(decoded[0:8, 8:16].mean()) - 80.0) <= 1.0  # JPEG slot
