"""Slippy-map XYZ tile + Bing quadkey (functions/cells.py)."""

import math
import random

import pytest

from pyspark.sql import functions as F

from osmium_tool_spark.functions.cells import (
    WEBMERCATOR_MAX_LAT,
    quadkey_col,
    slippy_tile_cols,
)


def ref_tile(lon_deg: float, lat_deg: float, zoom: int) -> tuple[int, int]:
    """Independent reference: the OSM-wiki formula via math.asinh."""
    n = 1 << zoom
    tx = int(math.floor((lon_deg + 180.0) / 360.0 * n))
    lat = min(max(lat_deg, -WEBMERCATOR_MAX_LAT), WEBMERCATOR_MAX_LAT)
    ty = int(
        math.floor((1.0 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2.0 * n)
    )
    return min(max(tx, 0), n - 1), min(max(ty, 0), n - 1)


def ref_quadkey(tx: int, ty: int, zoom: int) -> str:
    return "".join(
        str((((ty >> i) & 1) << 1) | ((tx >> i) & 1))
        for i in range(zoom - 1, -1, -1)
    )


def _run(spark, rows, zoom):
    df = spark.createDataFrame(rows, "id long, lon long, lat long")
    tx, ty = slippy_tile_cols(F.col("lon"), F.col("lat"), zoom)
    staged = df.select("id", "lon", "lat", tx.alias("tx"), ty.alias("ty"))
    return staged.select(
        "id", "lon", "lat", "tx", "ty",
        quadkey_col(F.col("tx"), F.col("ty"), zoom).alias("qk"),
    ).collect()


def test_matches_reference_formula(spark):
    rng = random.Random(19)
    rows = [
        (
            i,
            rng.randrange(-1800000000, 1800000000),
            rng.randrange(-900000000, 900000000),
        )
        for i in range(400)
    ]
    # pole / seam / equator exactness probes
    rows += [
        (400, -1800000000, 900000000),
        (401, 1799999999, -900000000),
        (402, 0, 0),
        (403, 0, 850511287),  # just inside the cutoff
        (404, 0, 850511288),  # just outside -> clamped edge row
    ]
    for zoom in (1, 5, 10, 17):
        out = _run(spark, rows, zoom)
        for r in out:
            want = ref_tile(r.lon / 1e7, r.lat / 1e7, zoom)
            assert (r.tx, r.ty) == want, (zoom, r.lon, r.lat)
            assert r.qk == ref_quadkey(r.tx, r.ty, zoom)


def test_bing_doc_vector(spark):
    # Bing Maps tile-system doc: tile (3, 5) at level 3 -> quadkey "213"
    assert ref_quadkey(3, 5, 3) == "213"
    df = spark.createDataFrame([(3, 5)], "tx long, ty long")
    out = df.select(quadkey_col(F.col("tx"), F.col("ty"), 3).alias("qk")).collect()
    assert out[0].qk == "213"


def test_quadkey_prefix_is_parent(spark):
    # a parent tile's quadkey is the prefix of every child's
    df = spark.createDataFrame([(1, 100000000, 200000000)], "id long, lon long, lat long")
    tx, ty = slippy_tile_cols(F.col("lon"), F.col("lat"), 12)
    r12 = df.select(tx.alias("tx"), ty.alias("ty")).select(
        quadkey_col(F.col("tx"), F.col("ty"), 12).alias("qk")
    ).collect()[0].qk
    tx6, ty6 = slippy_tile_cols(F.col("lon"), F.col("lat"), 6)
    r6 = df.select(tx6.alias("tx"), ty6.alias("ty")).select(
        quadkey_col(F.col("tx"), F.col("ty"), 6).alias("qk")
    ).collect()[0].qk
    assert r12.startswith(r6)


def test_validation(spark):
    with pytest.raises(ValueError):
        slippy_tile_cols(F.col("lon"), F.col("lat"), 23)
    with pytest.raises(ValueError):
        quadkey_col(F.col("tx"), F.col("ty"), 0)
