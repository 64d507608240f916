"""tile_pyramid: cascade-equals-direct property, measures, guards."""

import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.functions.cells import cell_id
from osmium_tool_spark.operators.tiles import tile_pyramid


@pytest.fixture(scope="module")
def points(spark):
    # deterministic spread incl. the extreme corners (clamp path)
    return spark.range(0, 2000).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % 3600000000 - 1800000000).alias("lon"),
        ((F.col("id") * 2246822519) % 1800000000 - 900000000).alias("lat"),
    )


def direct_level(points, r):
    return (
        points.select(cell_id(F.col("lon"), F.col("lat"), r).alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
    )


def test_cascade_equals_direct_per_level(points):
    out = tile_pyramid(points, res=7, min_res=0).cache()
    try:
        for r in (7, 5, 2, 0):
            got = {
                (row["cell"], row["n"])
                for row in out.filter(F.col("res") == r).collect()
            }
            want = {
                (row["cell"], row["n"]) for row in direct_level(points, r).collect()
            }
            assert got == want, f"res {r} cascade != direct group-by"
    finally:
        out.unpersist()


def test_root_level_totals(points):
    out = tile_pyramid(points, res=5, min_res=0)
    root = out.filter(F.col("res") == 0).collect()
    assert len(root) == 1
    assert root[0]["n"] == 2000


def test_measures_roll_up(points):
    out = tile_pyramid(
        points, res=4, min_res=1, measures={"idsum": F.col("id")}
    )
    rows = out.groupBy("res").agg(
        F.sum("n").alias("n"), F.sum("idsum").alias("s")
    ).collect()
    assert len(rows) == 4  # res 4..1
    expect_s = sum(range(2000))
    for row in rows:
        assert row["n"] == 2000
        assert row["s"] == expect_s


def test_level_count_and_schema(points):
    out = tile_pyramid(points, res=3, min_res=3)
    assert [f.name for f in out.schema.fields] == ["res", "cell", "n"]
    assert out.select("res").distinct().count() == 1


def test_bad_args(points):
    with pytest.raises(ValueError):
        tile_pyramid(points, res=4, min_res=5)
    with pytest.raises(ValueError):
        tile_pyramid(points, res=4, min_res=-1)
