"""Hierarchical grid-cell index (H3/S2-style) as pure Column expressions.

A Morton (Z-order) quadtree over the fixed-point equirectangular plane:
at resolution ``r`` (0..30) the world splits into 2^r × 2^r cells; a cell id
packs (resolution, interleaved x/y bits) into one int64. All of encode /
parent / children / neighbor-ring are JVM-side Column math (whole-stage
codegen) — no Python in the hot path — so cell assignment, tile partitioning
and kNN cell-ring expansion ride Catalyst/Tungsten.

Design notes for 100 TB scale:
  - cell ids are a natural Iceberg partition/sort column: range predicates on
    a parent cell prune child files (min/max stats on the packed id work
    because children share the parent's bit prefix at fixed resolution).
  - kNN via cell-ring expansion (north rule): candidate pairs are generated
    by equi-joining on neighbor cell ids (ring k), so the join is a plain
    shuffle-hash/broadcast equi-join — no cross product.
  - skewed (dense) cells get salted sub-splits (operators/extract.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schema import COORD_SCALE

# world extents in fixed-point units
_LON_SPAN = 360 * COORD_SCALE  # 3_600_000_000
_LAT_SPAN = 180 * COORD_SCALE  # 1_800_000_000
_LON_MIN = -180 * COORD_SCALE
_LAT_MIN = -90 * COORD_SCALE

MAX_RES = 30


def _ix(lon: Column, res: int) -> Column:
    """Cell x ordinate: floor((lon - lon_min) * 2^res / lon_span), clamped."""
    n = 1 << res
    raw = ((lon.cast("long") - _LON_MIN) * n) / F.lit(_LON_SPAN)
    return F.least(F.floor(raw).cast("long"), F.lit(n - 1))


def _iy(lat: Column, res: int) -> Column:
    n = 1 << res
    raw = ((lat.cast("long") - _LAT_MIN) * n) / F.lit(_LAT_SPAN)
    return F.least(F.floor(raw).cast("long"), F.lit(n - 1))


def _interleave(x: Column, y: Column, res: int) -> Column:
    """Interleave res-bit x and y into a 2*res-bit Morton code (Column)."""
    code = F.lit(0).cast("long")
    for b in range(res):
        xb = F.shiftright(x, b).bitwiseAND(F.lit(1))
        yb = F.shiftright(y, b).bitwiseAND(F.lit(1))
        code = code.bitwiseOR(F.shiftleft(xb, 2 * b)).bitwiseOR(F.shiftleft(yb, 2 * b + 1))
    return code


def cell_id(lon: Column, lat: Column, res: int) -> Column:
    """Pack (res, morton(x,y)) into int64: (res << 56) | morton."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution {res} out of range")
    morton = _interleave(_ix(lon, res), _iy(lat, res), res)
    return F.shiftleft(F.lit(res).cast("long"), 56).bitwiseOR(morton)


def cell_res(cell: Column) -> Column:
    return F.shiftright(cell, 56).bitwiseAND(F.lit(0xFF)).cast("int")


def cell_xy(cell: Column, res: int) -> tuple[Column, Column]:
    """De-interleave a cell id back to (x, y) ordinates at resolution res."""
    x = F.lit(0).cast("long")
    y = F.lit(0).cast("long")
    for b in range(res):
        x = x.bitwiseOR(F.shiftleft(F.shiftright(cell, 2 * b).bitwiseAND(F.lit(1)), b))
        y = y.bitwiseOR(F.shiftleft(F.shiftright(cell, 2 * b + 1).bitwiseAND(F.lit(1)), b))
    return x, y


def cell_parent(cell: Column, res: int, parent_res: int) -> Column:
    """Parent cell id at a coarser resolution (drop low Morton bits)."""
    if parent_res > res:
        raise ValueError("parent_res must be <= res")
    morton = cell.bitwiseAND(F.lit((1 << 56) - 1))
    pm = F.shiftright(morton, 2 * (res - parent_res))
    return F.shiftleft(F.lit(parent_res).cast("long"), 56).bitwiseOR(pm)


def cell_from_xy(x: Column, y: Column, res: int) -> Column:
    n = 1 << res
    xv = F.when(x < 0, x + n).when(x >= n, x - n).otherwise(x)  # lon wraps ±180
    yv = F.greatest(F.lit(0).cast("long"), F.least(y, F.lit(n - 1).cast("long")))
    return F.shiftleft(F.lit(res).cast("long"), 56).bitwiseOR(_interleave(xv, yv, res))


def neighbor_cells(cell: Column, res: int, ring: int) -> Column:
    """Array of cell ids within Chebyshev distance ``ring`` (the (2k+1)^2
    block including the center) — kNN cell-ring expansion primitive.

    Longitude wraps across the antimeridian; latitude clamps at the poles
    (out-of-range y duplicates the clamped cell; callers dedupe via
    array_distinct).
    """
    x, y = cell_xy(cell.bitwiseAND(F.lit((1 << 56) - 1)), res)
    cells = []
    for dx in range(-ring, ring + 1):
        for dy in range(-ring, ring + 1):
            cells.append(cell_from_xy(x + dx, y + dy, res))
    return F.array_distinct(F.array(*cells))


def ring_cells(cell: Column, res: int, ring: int) -> Column:
    """Only the cells at exactly Chebyshev distance ``ring`` (the expansion
    frontier for iterative kNN search)."""
    if ring == 0:
        return F.array(cell)
    x, y = cell_xy(cell.bitwiseAND(F.lit((1 << 56) - 1)), res)
    cells = []
    for dx in range(-ring, ring + 1):
        for dy in range(-ring, ring + 1):
            if max(abs(dx), abs(dy)) == ring:
                cells.append(cell_from_xy(x + dx, y + dy, res))
    return F.array_distinct(F.array(*cells))
