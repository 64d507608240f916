"""Pixel/caption invariant harness (input_hint: PSNR>=40dB for lossy,
exact for lossless, caption equality)."""

import math

import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.operators.invariants import pixel_invariant_violations, psnr


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, pixels array<double>, fmt string, caption string"
    )


def test_psnr_formula(spark):
    # constant offset of 1 on 255-peak: PSNR = 10*log10(255^2) ≈ 48.13 dB
    df = spark.createDataFrame(
        [([10.0, 20.0], [11.0, 21.0])], "a array<double>, b array<double>"
    )
    got = df.select(psnr(F.col("a"), F.col("b"))).collect()[0][0]
    assert got == pytest.approx(10 * math.log10(255**2), abs=1e-9)


def test_violations(spark):
    before = _df(
        spark,
        [
            ("ok_lossless", [1.0, 2.0], "png", "cap"),
            ("ok_lossy", [100.0, 100.0], "jpeg", "cap"),
            ("bad_lossless", [1.0, 2.0], "png", "cap"),
            ("bad_lossy", [100.0, 100.0], "jpeg", "cap"),
            ("bad_caption", [1.0], "png", "cap"),
            ("bad_size", [1.0, 2.0], "png", "cap"),
            ("gone", [1.0], "png", "cap"),
        ],
    )
    after = _df(
        spark,
        [
            ("ok_lossless", [1.0, 2.0], "png", "cap"),
            ("ok_lossy", [101.0, 99.0], "jpeg", "cap"),      # ~48 dB, passes
            ("bad_lossless", [1.0, 2.5], "png", "cap"),      # any diff fails
            ("bad_lossy", [150.0, 40.0], "jpeg", "cap"),     # huge error
            ("bad_caption", [1.0], "png", "DIFFERENT"),
            ("bad_size", [1.0, 2.0, 3.0], "png", "cap"),
        ],
    )
    v = {r.image_id: r.reason for r in
         pixel_invariant_violations(before, after).collect()}
    assert "ok_lossless" not in v and "ok_lossy" not in v
    assert v["bad_lossless"] == "lossless_pixels_differ"
    assert v["bad_lossy"] == "psnr_below_threshold"
    assert v["bad_caption"] == "caption_mismatch"
    assert v["bad_size"] == "size_mismatch"
    assert v["gone"] == "missing_row"
