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


# 3x3 binomial (Gaussian-approximating) kernel; integer weights sum to 16
BINOMIAL_3X3: dict[tuple[int, int], int] = {
    (0, 0): 4,
    (1, 0): 2, (-1, 0): 2, (0, 1): 2, (0, -1): 2,
    (1, 1): 1, (1, -1): 1, (-1, 1): 1, (-1, -1): 1,
}


def density_surface(
    points: DataFrame,
    res: int = 6,
    lon_col: str = "lon",
    lat_col: str = "lat",
    kernel: dict[tuple[int, int], int] | None = None,
) -> DataFrame:
    """Smoothed point-density raster (heatmap): rasterize + 3x3 convolve.

    The raster half of the raster<->vector story: cell counts convolved
    with an integer kernel (default binomial 1-2-1, the separable
    Gaussian approximation) give the density surface a tile renderer or
    a sampling-weight map reads. Integer weights keep the math exact —
    no float accumulation to diverge between engines or reruns.

    Scale shape: ONE corpus-sized hash aggregate (the rasterize), then
    the convolution runs on the OCCUPIED-CELL frame — each cell scatters
    count x weight to its 9 targets via one explode + one re-aggregate
    (9x a cell-bounded frame, not the point count; no join, no window).
    Longitude wraps at the antimeridian; latitude targets outside the
    grid are dropped (clamping would double-count the pole rows).

    Returns (ix, iy, n_points, density): every cell that RECEIVES any
    contribution appears; n_points is its own raw count (0 if the cell
    is empty but lit by a neighbor); density = sum of count x weight.
    """
    from ..functions.cells import _ix, _iy

    kernel = BINOMIAL_3X3 if kernel is None else kernel
    if not kernel:
        raise ValueError("density_surface: empty kernel")
    n = 1 << res
    counts = points.select(
        _ix(F.col(lon_col), res).alias("ix"), _iy(F.col(lat_col), res).alias("iy")
    ).groupBy("ix", "iy").agg(F.count("*").alias("n_points"))

    scatter = F.filter(
        F.array(
            *[
                F.when(
                    (F.col("iy") + dy >= 0) & (F.col("iy") + dy < n),
                    F.struct(
                        ((F.col("ix") + dx + n) % n).alias("tx"),
                        (F.col("iy") + dy).alias("ty"),
                        (F.col("n_points") * F.lit(w)).alias("contrib"),
                    ),
                )
                for (dx, dy), w in sorted(kernel.items())
            ]
        ),
        lambda x: x.isNotNull(),
    )
    density = (
        counts.select(F.explode(scatter).alias("s"))
        .groupBy(F.col("s.tx").alias("ix"), F.col("s.ty").alias("iy"))
        .agg(F.sum("s.contrib").alias("density"))
    )
    return density.join(counts, ["ix", "iy"], "left").select(
        "ix",
        "iy",
        F.coalesce("n_points", F.lit(0)).cast("long").alias("n_points"),
        F.col("density").cast("long").alias("density"),
    )
