"""Z-order clustered layout: morton_ranges planning + file pruning."""

import random

import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.functions.cells import (
    cell_id_py,
    morton_py,
    morton_ranges,
)
from osmium_tool_spark.schema import COORD_SCALE, fp
from osmium_tool_spark.sources.layout import (
    bbox_scan_clustered,
    clustered_scan,
    write_clustered,
)

RES = 6


def brute_cells(lon_a, lat_a, lon_b, lat_b, res):
    n = 1 << res
    lon_min, lat_min = -180 * COORD_SCALE, -90 * COORD_SCALE
    lon_span, lat_span = 360 * COORD_SCALE, 180 * COORD_SCALE
    x0 = min(max((lon_a - lon_min) * n // lon_span, 0), n - 1)
    x1 = min(max((lon_b - lon_min) * n // lon_span, 0), n - 1)
    y0 = min(max((lat_a - lat_min) * n // lat_span, 0), n - 1)
    y1 = min(max((lat_b - lat_min) * n // lat_span, 0), n - 1)
    return {
        (res << 56) | morton_py(x, y, res)
        for x in range(x0, x1 + 1)
        for y in range(y0, y1 + 1)
    }


def test_morton_ranges_exact_cover_property():
    rng = random.Random(7)
    for _ in range(100):
        res = rng.randint(1, 7)
        lon_a, lon_b = sorted(rng.randint(-180 * COORD_SCALE, 180 * COORD_SCALE) for _ in range(2))
        lat_a, lat_b = sorted(rng.randint(-90 * COORD_SCALE, 90 * COORD_SCALE) for _ in range(2))
        ranges = morton_ranges(lon_a, lat_a, lon_b, lat_b, res, max_ranges=10**9)
        got = set()
        for lo, hi in ranges:
            got.update(range(lo, hi + 1))
        assert got == brute_cells(lon_a, lat_a, lon_b, lat_b, res)


def test_morton_ranges_cap_is_superset():
    lon_a, lat_a, lon_b, lat_b = fp(-10), fp(-10), fp(25), fp(30)
    full = morton_ranges(lon_a, lat_a, lon_b, lat_b, 7, max_ranges=10**9)
    capped = morton_ranges(lon_a, lat_a, lon_b, lat_b, 7, max_ranges=5)
    assert len(capped) <= 5 < len(full)
    want = set()
    for lo, hi in full:
        want.update(range(lo, hi + 1))
    got = set()
    for lo, hi in capped:
        got.update(range(lo, hi + 1))
    assert want <= got


def test_morton_ranges_whole_world_is_one_range():
    r = morton_ranges(fp(-180), fp(-90), fp(180), fp(90), 5)
    assert len(r) == 1
    lo, hi = r[0]
    assert hi - lo + 1 == 4**5


def test_cell_id_py_matches_column(spark):
    rows = [(fp(-12.3), fp(45.6)), (fp(179.99), fp(-89.9)), (fp(0.0), fp(0.0))]
    df = spark.createDataFrame(rows, "lon long, lat long")
    from osmium_tool_spark.functions.cells import cell_id

    got = [r[0] for r in df.select(cell_id(F.col("lon"), F.col("lat"), RES)).collect()]
    assert got == [cell_id_py(lon, lat, RES) for lon, lat in rows]


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zlayout") / "tbl")
    n = 50_000
    df = spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % (360 * COORD_SCALE) - 180 * COORD_SCALE).alias("lon"),
        ((F.col("id") * 2246822519) % (180 * COORD_SCALE) - 90 * COORD_SCALE).alias("lat"),
    )
    write_clustered(df, path, RES, partitions=16)
    return path, df


def test_clustered_bbox_scan_equals_full_filter(spark, clustered):
    path, df = clustered
    bbox = (fp(10.0), fp(20.0), fp(40.0), fp(45.0))
    out, stats = bbox_scan_clustered(spark, path, bbox, RES)
    got = sorted(r["id"] for r in out.collect())
    want = sorted(
        r["id"]
        for r in df.filter(
            F.col("lon").between(bbox[0], bbox[2]) & F.col("lat").between(bbox[1], bbox[3])
        ).collect()
    )
    assert got == want and len(got) > 0


def test_clustered_scan_prunes_files(spark, clustered):
    path, _ = clustered
    bbox = (fp(10.0), fp(20.0), fp(40.0), fp(45.0))
    _, stats = bbox_scan_clustered(spark, path, bbox, RES)
    # a ~3% world bbox over a 16-file clustered table must skip most files
    assert stats["files_total"] >= 16
    assert stats["files_read"] < stats["files_total"] / 2
    assert stats["files_read"] >= 1


def test_clustered_scan_empty_ranges(spark, clustered):
    path, _ = clustered
    df, stats = clustered_scan(spark, path, [(0, -1)])
    assert stats["files_read"] == 0 and df.count() == 0


def test_pushed_range_predicate_reaches_scan(spark, clustered):
    path, _ = clustered
    bbox = (fp(10.0), fp(20.0), fp(40.0), fp(45.0))
    out, _ = bbox_scan_clustered(spark, path, bbox, RES)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "cell" in plan


def test_clustered_bbox_scan_antimeridian(spark, clustered):
    path, df = clustered
    # 170°E .. -170°E (crosses the antimeridian), mid latitudes
    bbox = (fp(170.0), fp(-30.0), fp(-170.0), fp(30.0))
    out, stats = bbox_scan_clustered(spark, path, bbox, RES)
    got = sorted(r["id"] for r in out.collect())
    want = sorted(
        r["id"]
        for r in df.filter(
            ((F.col("lon") >= bbox[0]) | (F.col("lon") <= bbox[2]))
            & F.col("lat").between(bbox[1], bbox[3])
        ).collect()
    )
    assert got == want and len(got) > 0
    assert stats["files_read"] < stats["files_total"]
