"""Multi-resolution tile pyramid rollup (raster↔vector tiling surface).

The reference assigns features to tiles at one zoom at a time (export/tiling
per SURVEY.md §2.9); a tile *server* over the 10^12-image table needs every
zoom level of the pyramid at once. Computing each level independently would
re-scan the fact table Z times; this operator instead aggregates the finest
resolution once (the only shuffle proportional to the input) and derives each
coarser level by re-aggregating the previous level's ~4×-smaller output —
parent cell ids are a bit-shift of child ids (`functions/cells.cell_parent`),
so level r's rollup is exactly level r+1's partial aggregate. Floor-division
nesting guarantees the cascade equals a direct per-level group-by:
floor(floor(a/b)/c) == floor(a/(b*c)), hence parent(cell_R(p)) == cell_r(p).

At 100 TB: one input-sized hash aggregate (map-side combine absorbs the
dense-cell skew), then log₂-many shuffles over geometrically shrinking
aggregate frames — versus Z full scans for the naive plan, or one scan with
Z-way grouping-sets (which multiplies the shuffle write by Z).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cells import cell_id, cell_parent


def tile_pyramid(
    df: DataFrame,
    res: int,
    min_res: int = 0,
    lon: str | Column = "lon",
    lat: str | Column = "lat",
    measures: dict[str, Column] | None = None,
) -> DataFrame:
    """Per-cell aggregates at every resolution in [min_res, res].

    ``measures`` maps output column name -> SUM-combinable input expression
    (counts, sums; anything re-aggregable by + across children). The result
    always carries ``n`` (feature count). Output schema:
    (res:int, cell:long, n:long, <measures...>).
    """
    if not 0 <= min_res <= res:
        raise ValueError(f"need 0 <= min_res <= res, got {min_res}..{res}")
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    measures = measures or {}

    base = df.select(
        cell_id(lon, lat, res).alias("cell"),
        F.lit(1).cast("long").alias("n"),
        *[expr.cast("long").alias(name) for name, expr in measures.items()],
    )
    sums = [F.sum("n").alias("n")] + [
        F.sum(name).alias(name) for name in measures
    ]
    # Each level is persisted: the final UNION's branches would otherwise
    # re-derive every level from the raw input (a DataFrame union does not
    # share subplans across branches), turning the cascade back into Z full
    # scans — .explain showed one input-sized Exchange chain PER level
    # before this. A level frame is aggregate-sized (≤4^r cells), so the
    # cache cost is negligible next to the input.
    level = base.groupBy("cell").agg(*sums).persist()

    out = level.select(F.lit(res).alias("res"), "cell", "n", *measures)
    for r in range(res - 1, min_res - 1, -1):
        level = (
            level.select(
                cell_parent(F.col("cell"), r + 1, r).alias("cell"),
                "n",
                *measures,
            )
            .groupBy("cell")
            .agg(*sums)
            .persist()
        )
        out = out.unionByName(
            level.select(F.lit(r).alias("res"), "cell", "n", *measures)
        )
    return out


def zonal_stats(
    points: DataFrame,
    extracts: list,
    measures: dict[str, Column] | None = None,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Per-zone aggregates of the points inside each region — the classic
    raster/vector ZONAL STATISTICS operator (per-polygon count / sum /
    mean of a measure), built on the extract PIP machinery.

    The reference's extract emits the cut-out rows; a tile/analytics
    server over the 10^12-image table more often wants the per-region
    AGGREGATE (image count, mean quality, etc. per admin polygon). This
    fuses assignment and aggregation in one plan: assign_extracts runs
    the codegen/JVM PIP (small polygons) or the Arrow y-band kernel with
    the cell-cover interior shortcut (large ones), carrying
    `payload_cols` through the kernel so the aggregate NEVER re-joins
    the fact table on id — at 10^12 rows that re-join is a full shuffle.

    `measures` maps output name -> aggregate Column over the assigned
    frame (F.sum/avg/min/max of payload columns); `n` (point count) is
    always included. Plan shape: scan -> PIP filter -> ONE hash
    aggregate keyed by extract_id (<=500 distinct keys, map-side combine
    reduces each task to <=500 rows before the exchange).
    """
    from .extract import assign_extracts

    aggs = [F.count("*").alias("n")]
    for name, expr in (measures or {}).items():
        aggs.append(expr.alias(name))
    assigned = assign_extracts(points, extracts, payload_cols=payload_cols or [])
    return assigned.groupBy("extract_id").agg(*aggs)
