"""quadtree_leaves: adaptive tiling semantics and invariants.

Reference analog: extract's hand-written region list (command_extract.cpp
config mode) — this operator derives a balanced region set from the data.

Properties under test:
  - disjoint cover: sum(leaf n) == input count, every point in exactly 1 leaf
  - no leaf is an ancestor of another leaf
  - capacity respected except at max_res
  - a leaf above min_res exists only because its parent was over capacity
  - parity with a driver-side recursive reference implementation
  - min_res == max_res degenerates to one flat level
"""

import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.functions.cells import cell_id, cell_id_py
from osmium_tool_spark.operators.tiles import quadtree_leaves

MASK = (1 << 56) - 1


@pytest.fixture(scope="module")
def points(spark):
    # multiplicative-hash spread plus a deliberate hotspot: 600 points
    # crammed into one tiny box so several levels must split
    spread = spark.range(0, 1400).select(
        ((F.col("id") * 2654435761) % 3600000000 - 1800000000).alias("lon"),
        ((F.col("id") * 2246822519) % 1800000000 - 900000000).alias("lat"),
    )
    hot = spark.range(0, 600).select(
        (F.col("id") % 40 * 1000 + 123_000_000).alias("lon"),
        (F.col("id") % 15 * 1000 + 456_000_000).alias("lat"),
    )
    return spread.unionByName(hot)


def ref_quadtree(pts, capacity, max_res, min_res):
    """Driver-side recursive reference: the definition, literally."""
    from collections import Counter

    leaves = {}

    def counts_at(r):
        return Counter(cell_id_py(lon, lat, r) for lon, lat in pts)

    per_res = {r: counts_at(r) for r in range(min_res, max_res + 1)}

    def rec(r, cell):
        n = per_res[r][cell]
        if n == 0:
            return
        if n <= capacity or r == max_res:
            leaves[(r, cell)] = n
            return
        child_base = ((r + 1) << 56) | ((cell & MASK) << 2)
        for q in range(4):
            rec(r + 1, child_base | q)

    root_cells = set(per_res[min_res])
    for c in root_cells:
        rec(min_res, c)
    return leaves


def test_parity_with_recursive_reference(spark, points):
    pts = [(r["lon"], r["lat"]) for r in points.collect()]
    want = ref_quadtree(pts, capacity=60, max_res=6, min_res=2)
    got = {
        (r["res"], r["cell"]): r["n"]
        for r in quadtree_leaves(points, capacity=60, max_res=6, min_res=2).collect()
    }
    assert got == want


def test_disjoint_cover_and_capacity(spark, points):
    total = points.count()
    leaves = quadtree_leaves(points, capacity=60, max_res=6, min_res=2).collect()
    assert sum(r["n"] for r in leaves) == total
    # capacity respected except at the floor
    for r in leaves:
        assert r["n"] <= 60 or r["res"] == 6
    # no leaf is an ancestor of another: compare morton prefixes
    ids = {(r["res"], r["cell"] & MASK) for r in leaves}
    for ra, ma in ids:
        for rb, mb in ids:
            if ra < rb and (mb >> (2 * (rb - ra))) == ma:
                pytest.fail(f"leaf ({ra},{ma}) is an ancestor of ({rb},{mb})")


def test_every_point_in_exactly_one_leaf(spark, points):
    leaves = quadtree_leaves(points, capacity=60, max_res=6, min_res=2)
    # assign each point to its cell at every res, keep matches with leaves
    matched = None
    for r in range(2, 7):
        a = points.select(cell_id(F.col("lon"), F.col("lat"), r).alias("cell"))
        m = a.join(leaves.filter(F.col("res") == r).select("cell"), "cell")
        matched = m if matched is None else matched.unionByName(m)
    assert matched.count() == points.count()


def test_flat_when_min_equals_max(spark, points):
    flat = quadtree_leaves(points, capacity=1, max_res=3, min_res=3)
    direct = (
        points.select(cell_id(F.col("lon"), F.col("lat"), 3).alias("cell"))
        .groupBy("cell").count()
    )
    assert flat.count() == direct.count()
    assert {r["res"] for r in flat.select("res").distinct().collect()} == {3}


def test_bad_res_raises(spark, points):
    with pytest.raises(ValueError):
        quadtree_leaves(points, capacity=10, max_res=2, min_res=3)


class TestCompactCover:
    def _cells(self, spark, rows, res):
        from osmium_tool_spark.functions.cells import cell_from_xy

        return spark.createDataFrame(rows, "pid long, x long, y long").select(
            "pid", cell_from_xy(F.col("x"), F.col("y"), res).alias("cell"))

    @staticmethod
    def _unpack(rows):
        return sorted((r.pid, r.cell >> 56, r.cell & ((1 << 56) - 1))
                      for r in rows)

    def test_full_quad_compacts(self, spark):
        from osmium_tool_spark.functions.cells import compact_cover

        rows = [(1, 0, 0), (1, 1, 0), (1, 0, 1), (1, 1, 1), (1, 3, 3)]
        got = self._unpack(compact_cover(
            self._cells(spark, rows, 2), res=2, min_res=0,
            key_cols=["pid"]).collect())
        assert got == [(1, 1, 0), (1, 2, 15)]

    def test_cascades_to_min_res(self, spark):
        from osmium_tool_spark.functions.cells import compact_cover

        # a full 4x4 block at res 2 -> one res-0 cell
        rows = [(1, x, y) for x in range(4) for y in range(4)]
        got = self._unpack(compact_cover(
            self._cells(spark, rows, 2), res=2, min_res=0,
            key_cols=["pid"]).collect())
        assert got == [(1, 0, 0)]
        # min_res=1 stops one level earlier: four res-1 cells
        got1 = self._unpack(compact_cover(
            self._cells(spark, rows, 2), res=2, min_res=1,
            key_cols=["pid"]).collect())
        assert got1 == [(1, 1, 0), (1, 1, 1), (1, 1, 2), (1, 1, 3)]

    def test_keys_compact_independently(self, spark):
        from osmium_tool_spark.functions.cells import compact_cover

        quad = [(1, 0, 0), (1, 1, 0), (1, 0, 1), (1, 1, 1)]
        three = [(2, 0, 0), (2, 1, 0), (2, 0, 1)]
        got = self._unpack(compact_cover(
            self._cells(spark, quad + three, 2), res=2, min_res=0,
            key_cols=["pid"]).collect())
        assert (1, 1, 0) in got                # pid 1 compacted
        assert sum(1 for g in got if g[0] == 2) == 3  # pid 2 unchanged

    def test_area_preserved(self, spark):
        """Sum of 4^(res - cell_res) over the output equals the input
        cell count — compaction never changes the covered area."""
        from osmium_tool_spark.functions.cells import compact_cover

        rows = {(7, (i * 13) % 16, (i * 7) % 16) for i in range(200)}
        df = self._cells(spark, sorted(rows), 4)
        out = compact_cover(df, res=4, min_res=0, key_cols=["pid"]).collect()
        area = sum(4 ** (4 - (r.cell >> 56)) for r in out)
        assert area == len(rows)

    def test_bad_args(self, spark):
        import pytest as _pytest

        from osmium_tool_spark.functions.cells import compact_cover

        df = self._cells(spark, [(1, 0, 0)], 2)
        with _pytest.raises(ValueError, match="min_res"):
            compact_cover(df, res=2, min_res=3)
