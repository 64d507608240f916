"""Golden parity for getid / removeid / merge-changes /
add-locations-to-ways against the reference's committed fixtures
(/root/reference/test/{getid,removeid,merge-changes,add-locations-to-ways}
CMakeLists.txt matrices), via sources/osmxml."""

import xml.etree.ElementTree as ET

import pytest

from osmium_tool_spark.operators import idops, sort_merge
from osmium_tool_spark.operators.locations import add_locations_to_ways
from osmium_tool_spark.schema import NODE, RELATION, WAY
from osmium_tool_spark.sources.osmxml import read_osm_xml
from tests.test_reference_goldens_xml import canon_rows

REF = "/root/reference/test"


def idset(df):
    return {(r.type, r.id) for r in df.select("type", "id").collect()}


class TestGetIdGoldens:
    def test_plain_inline_ids(self, spark):
        # "getid input.osm n11,n12 w21" — comma-packed tokens
        inp = read_osm_xml(spark, f"{REF}/getid/input.osm")
        ids = idops.parse_id_list(["n11,n12", "w21"])
        got = canon_rows(idops.getid(inp, ids))
        want = canon_rows(read_osm_xml(spark, f"{REF}/getid/output.osm"))
        assert got == want

    def test_id_file_with_comments(self, spark):
        # "getid -i idfile input.osm" — blank lines, ' '/'#' comments,
        # leading/trailing whitespace (src/id_file.cpp:39-50)
        inp = read_osm_xml(spark, f"{REF}/getid/input.osm")
        ids = idops.read_id_file(f"{REF}/getid/idfile")
        got = canon_rows(idops.getid(inp, ids))
        want = canon_rows(read_osm_xml(spark, f"{REF}/getid/output-file.osm"))
        assert got == want

    RECURSIVE = [
        ("source", "in10", "out10"),
        ("source", "in21", "out21"),
        ("source", "in30", "out30"),
        ("source", "in31", "out31"),
        ("source", "in32", "out32"),
        ("source-no-rr", "in10", "out10"),
        ("source-no-rr", "in21", "out21"),
        ("source-no-rr", "in30", "out30"),
        ("source-no-rr", "in32", "out32"),
        ("relloop", "relloop", "relloop-out"),  # CYCLIC rel<->rel closure
    ]

    @pytest.mark.parametrize(
        "source,idsrc,expected", RECURSIVE, ids=[f"{s}/{o}" for s, _, o in RECURSIVE]
    )
    def test_recursive_closure(self, spark, source, idsrc, expected):
        # both id channels must agree: -I <osm file> and -i <id file>
        inp = read_osm_xml(spark, f"{REF}/getid/{source}.osm")
        want = canon_rows(read_osm_xml(spark, f"{REF}/getid/{expected}.osm"))
        for ids in (
            idops.ids_from_osm_file(spark, f"{REF}/getid/{idsrc}.osm"),
            idops.read_id_file(f"{REF}/getid/{idsrc}.id"),
        ):
            got = canon_rows(idops.getid(inp, ids, recursive=True))
            assert got == want

    @pytest.mark.parametrize("idsrc", ["in19", "in29", "in39"])
    def test_missing_ids_empty_output(self, spark, idsrc):
        inp = read_osm_xml(spark, f"{REF}/getid/source.osm")
        ids = idops.read_id_file(f"{REF}/getid/{idsrc}.id")
        assert idops.getid(inp, ids, recursive=True).count() == 0


class TestRemoveIdGoldens:
    CASES = [
        (["n11,n12"], None, "output-n11n12.osm"),
        (["10,w21"], None, "output-n10w21.osm"),  # bare id defaults to node
        (["r30"], None, "output-r30.osm"),
        ([], "n12w20.ids", "output-n12w20.osm"),
    ]

    @pytest.mark.parametrize("tokens,idfile,expected", CASES, ids=[e for *_, e in CASES])
    def test_removeid_golden(self, spark, tokens, idfile, expected):
        inp = read_osm_xml(spark, f"{REF}/removeid/input.osm")
        ids = (
            idops.read_id_file(f"{REF}/removeid/{idfile}")
            if idfile
            else idops.parse_id_list(tokens)
        )
        got = canon_rows(idops.removeid(inp, ids))
        want = canon_rows(read_osm_xml(spark, f"{REF}/removeid/{expected}"))
        assert got == want


class TestMergeChangesGoldens:
    CASES = [
        (False, "change1.osc", "change2.osc", "merged.osc"),
        (True, "change1.osc", "change2.osc", "simplified.osc"),
        (False, "change1-only-version.osc", "change2-only-version.osc",
         "merged-both-only-version.osc"),
        (True, "change1-only-version.osc", "change2-only-version.osc",
         "simplified-both-only-version.osc"),
        (False, "change1-only-version.osc", "change2.osc",
         "merged-first-only-version.osc"),
        (True, "change1-only-version.osc", "change2.osc",
         "simplified-first-only-version.osc"),
        (False, "change1.osc", "change2-only-version.osc",
         "merged-second-only-version.osc"),
        (True, "change1.osc", "change2-only-version.osc",
         "simplified-second-only-version.osc"),
    ]

    @pytest.mark.parametrize(
        "simplify,in1,in2,expected", CASES, ids=[e for *_, e in CASES]
    )
    def test_merge_changes_golden(self, spark, simplify, in1, in2, expected):
        c1 = read_osm_xml(spark, f"{REF}/merge-changes/{in1}")
        c2 = read_osm_xml(spark, f"{REF}/merge-changes/{in2}")
        got = canon_rows(sort_merge.merge_changes([c1, c2], simplify=simplify))
        want = canon_rows(read_osm_xml(spark, f"{REF}/merge-changes/{expected}"))
        assert got == want


def _expected_way_locations(path):
    """Parse the reference's locations-on-ways output: nd elements carry
    lat/lon attributes."""
    from osmium_tool_spark.schema import fp

    root = ET.fromstring(open(path).read())
    ways, nodes = {}, set()
    for el in root:
        if el.tag == "way":
            ways[int(el.get("id"))] = [
                (fp(float(nd.get("lon"))), fp(float(nd.get("lat"))))
                for nd in el
                if nd.tag == "nd"
            ]
        elif el.tag == "node":
            nodes.add(int(el.get("id")))
    return ways, nodes


class TestAddLocationsGoldens:
    def test_tagged_nodes_default(self, spark):
        inp = read_osm_xml(spark, f"{REF}/add-locations-to-ways/input.osm")
        out = add_locations_to_ways(inp)
        want_ways, want_nodes = _expected_way_locations(
            f"{REF}/add-locations-to-ways/output.osm"
        )
        got_ways = {
            r.id: [(loc.lon, loc.lat) for loc in r.locations]
            for r in out.filter(out.type == WAY).collect()
        }
        assert got_ways == want_ways
        got_nodes = {r.id for r in out.filter(out.type == NODE).collect()}
        assert got_nodes == want_nodes  # untagged nodes dropped

    def test_keep_all_nodes(self, spark):
        inp = read_osm_xml(spark, f"{REF}/add-locations-to-ways/input.osm")
        out = add_locations_to_ways(inp, keep_untagged_nodes=True)
        _, want_nodes = _expected_way_locations(
            f"{REF}/add-locations-to-ways/output-n.osm"
        )
        got_nodes = {r.id for r in out.filter(out.type == NODE).collect()}
        assert got_nodes == want_nodes
