"""Extract strategy parity vs the reference's golden outputs
(test/extract/input1.osm + output-simple/complete-ways/smart, bbox 0,0,1.5,10
per test/extract/CMakeLists.txt:10-50)."""

import pytest

from osmium_tool_spark.functions.geometry import Extract
from osmium_tool_spark.operators.extract import extract
from osmium_tool_spark.sources import fixtures


def result_set(df):
    return {(r["type"], r["id"]) for r in df.select("type", "id").collect()}


BBOX = [Extract.bbox(0, 0, 0, 1.5, 10)]


@pytest.fixture(scope="module")
def input1(spark):
    df = fixtures.extract_input1(spark).cache()
    df.count()
    return df


class TestExtractInput1:
    def test_simple(self, input1):
        got = result_set(extract(input1, BBOX, strategy="simple"))
        assert got == fixtures.EXTRACT1_EXPECTED["simple"]

    def test_complete_ways(self, input1):
        got = result_set(extract(input1, BBOX, strategy="complete_ways"))
        assert got == fixtures.EXTRACT1_EXPECTED["complete_ways"]

    def test_complete_ways_no_relations(self, input1):
        got = result_set(extract(input1, BBOX, strategy="complete_ways", relations=False))
        assert got == fixtures.EXTRACT1_EXPECTED["complete_ways_norels"]

    def test_smart(self, input1):
        got = result_set(extract(input1, BBOX, strategy="smart"))
        assert got == fixtures.EXTRACT1_EXPECTED["smart"]

    def test_smart_types_any_matches_smart_default_here(self, input1):
        # with types=any every marked relation completes its members;
        # on input1 r31..r36 only r34 has w21 to add, r31/r32 members already
        # decided; r32 (n13, outside) never marked
        got = result_set(extract(input1, BBOX, strategy="smart", smart_types=[]))
        assert got == fixtures.EXTRACT1_EXPECTED["smart"]

    def test_smart_nonmp_type_no_completion(self, input1):
        # -S types=boundary: r34 is multipolygon, does not qualify -> same as
        # complete_ways result (output-smart-nonmp.osm analog)
        got = result_set(extract(input1, BBOX, strategy="smart", smart_types=["boundary"]))
        assert got == fixtures.EXTRACT1_EXPECTED["complete_ways"]

    def test_polygon_region_same_as_bbox(self, input1):
        # a polygon covering the same half-plane must match the bbox result
        import numpy as np

        from osmium_tool_spark.functions.geometry import normalize_ring
        from osmium_tool_spark.schema import fp

        ring = normalize_ring(
            np.array(
                [(fp(0), fp(0)), (fp(1.5), fp(0)), (fp(1.5), fp(10)), (fp(0), fp(10))],
                dtype=np.int64,
            ),
            outer=True,
        )
        got = result_set(extract(input1, [Extract.polygon(0, [ring])], strategy="simple"))
        assert got == fixtures.EXTRACT1_EXPECTED["simple"]

    def test_multi_extract_assignment(self, input1):
        # two disjoint regions in one pass -> per-extract tile assignment
        exs = [Extract.bbox(0, 0, 0, 1.5, 10), Extract.bbox(1, 1.6, 0, 3, 10)]
        df = extract(input1, exs, strategy="simple")
        got = {(r["extract_id"], r["type"], r["id"]) for r in df.collect()}
        exp0 = {(0, t, i) for t, i in fixtures.EXTRACT1_EXPECTED["simple"]}
        # region 1 holds nodes 13..16 (lon=2), ways touching them: w20 (n13), w21
        exp1 = {
            (1, 0, 13), (1, 0, 14), (1, 0, 15), (1, 0, 16),
            (1, 1, 20), (1, 1, 21),
            # relations via first-n/w-member rule: r32(n13 marked), r33(w20),
            # r34(w20); r31's first member n10 unmarked
            (1, 2, 32), (1, 2, 33), (1, 2, 34),
        }
        assert got == exp0 | exp1

    def test_output_order_contract(self, input1):
        rows = extract(input1, BBOX, strategy="complete_ways").collect()
        keys = [(r["type"], abs(r["id"]) if r["id"] < 0 else r["id"]) for r in rows]
        assert keys == sorted(keys)
