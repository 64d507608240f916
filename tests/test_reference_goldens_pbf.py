"""Golden parity for the PBF reader (test/formats conversion matrix):
every f1*.osm.pbf variant (dense/non-dense nodes, zlib/uncompressed
blobs, with/without metadata) must decode to the same entities as
f1.osm, and the pbf -> opl path must be BYTE-identical to the committed
f1.osm.opl."""

import pytest

from osmium_tool_spark.sources.osmxml import read_osm_xml
from osmium_tool_spark.sources.pbf import read_osm_pbf
from tests.test_reference_goldens_xml import canon_rows

REF = "/root/reference/test"


def meta_rows(df):
    # PBF has no "absent" encoding for uid/user in dense info: uid 0 and
    # empty user mean unset (the reference's own f1.osm.opl golden prints
    # "i0 u" for the XML node without uid/user) — normalize both sides
    return sorted(
        (r.type, r.id, r.version, r.ts, r.uid or 0, r.user or "", r.changeset,
         tuple(sorted((r.tags or {}).items())), r.lon, r.lat,
         tuple(r.refs or ()),
         tuple((m.mtype, m.ref, m.role) for m in (r.members or ())))
        for r in df.collect()
    )


def nometa_rows(df):
    return sorted(
        (r.type, r.id, tuple(sorted((r.tags or {}).items())), r.lon, r.lat,
         tuple(r.refs or ()),
         tuple((m.mtype, m.ref, m.role) for m in (r.members or ())))
        for r in df.collect()
    )


@pytest.mark.parametrize(
    "fname",
    ["f1.osm.pbf", "f1-nodensenodes.osm.pbf", "f1-nocompression.osm.pbf"],
)
def test_pbf_full_metadata_matches_xml(spark, fname):
    got = meta_rows(read_osm_pbf(spark, f"{REF}/formats/{fname}"))
    want = meta_rows(read_osm_xml(spark, f"{REF}/formats/f1.osm"))
    assert got == want


@pytest.mark.parametrize(
    "fname", ["f1-nometadata.osm.pbf", "f1-nodensenodes-nometadata.osm.pbf"]
)
def test_pbf_nometadata_matches_xml_content(spark, fname):
    got = nometa_rows(read_osm_pbf(spark, f"{REF}/formats/{fname}"))
    want = nometa_rows(read_osm_xml(spark, f"{REF}/formats/f1.osm"))
    assert got == want


@pytest.mark.parametrize(
    "fname",
    ["empty.osm.pbf", "empty-nodensenodes.osm.pbf", "empty-nocompression.osm.pbf",
     "empty-nometadata.osm.pbf", "empty-nodensenodes-nometadata.osm.pbf"],
)
def test_pbf_empty_variants(spark, fname):
    assert read_osm_pbf(spark, f"{REF}/formats/{fname}").count() == 0


def test_pbf_to_opl_byte_parity(spark):
    # "cat f1.osm.pbf -f opl" golden: serialized lines == f1.osm.opl bytes
    from osmium_tool_spark.functions.sortkeys import canonical_sort
    from osmium_tool_spark.sources.opl import to_opl_lines

    df = read_osm_pbf(spark, f"{REF}/formats/f1.osm.pbf")
    got = [r.value for r in to_opl_lines(canonical_sort(df)).collect()]
    want = [ln.rstrip("\n") for ln in open(f"{REF}/formats/f1.osm.opl") if ln.strip()]
    assert got == want


def test_pbf_cat_input1(spark):
    got = meta_rows(read_osm_pbf(spark, f"{REF}/cat/input1.osm.pbf"))
    want = meta_rows(read_osm_xml(spark, f"{REF}/cat/input1.osm"))
    assert got == want


def test_cli_pbf_to_opl_and_xml(spark, tmp_path):
    # "cat f1.osm.pbf -f opl" end-to-end through the CLI == f1.osm.opl bytes
    from osmium_tool_spark.cli import main

    out = str(tmp_path / "out.opl")
    rc = main(["cat", f"{REF}/formats/f1.osm.pbf", "-o", out], spark=spark)
    assert rc == 0
    import glob

    text = "".join(open(p).read() for p in sorted(glob.glob(f"{out}/part-*")))
    want = open(f"{REF}/formats/f1.osm.opl").read()
    assert text == want
    # pbf -> sort -> xml: byte-identical to the committed f1.osm
    out2 = str(tmp_path / "out.osm")
    rc = main(["--generator", "test", "sort", f"{REF}/formats/f1.osm.pbf", "-o", out2], spark=spark)
    assert rc == 0
    want_xml = open(f"{REF}/formats/f1.osm").read().replace(
        '<osm version="0.6" upload="false" generator="test">',
        '<osm version="0.6" generator="test">',
    )
    assert open(out2).read() == want_xml
