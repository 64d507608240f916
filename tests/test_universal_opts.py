"""Universal CLI options shared by every reference command:
-v/--verbose, --progress, -F/--input-format, -O/--overwrite, --fsync
(man/common-options.md, input-options.md, output-options.md)."""

import os

import pytest

from osmium_tool_spark.cli import main
from osmium_tool_spark.sources import fixtures


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("uni") / "input1")
    fixtures.extract_input1(spark).write.parquet(d)
    return d


def test_overwrite_refused_without_O(spark, input_dir, tmp_path, capsys):
    # reference: libosmium opens outputs O_EXCL; an existing file raises
    # "Open failed for '<file>': File exists" -> exit 2
    out = str(tmp_path / "out.opl")
    with open(out, "w") as f:
        f.write("sentinel\n")
    rc = main(["cat", input_dir, "-o", out], spark=spark)
    assert rc == 2
    assert "File exists" in capsys.readouterr().err
    with open(out) as f:  # target untouched
        assert f.read() == "sentinel\n"


def test_overwrite_with_O(spark, input_dir, tmp_path):
    out = str(tmp_path / "out.opl")
    with open(out, "w") as f:
        f.write("sentinel\n")
    rc = main(["cat", input_dir, "-O", "-o", out], spark=spark)
    assert rc == 0
    with open(out) as f:
        body = f.read()
    assert "sentinel" not in body and body.startswith("n")


def test_overwrite_parquet_dir_with_O(spark, input_dir, tmp_path):
    out = str(tmp_path / "pq")
    assert main(["cat", input_dir, "-o", out], spark=spark) == 0
    assert main(["cat", input_dir, "-o", out], spark=spark) == 2  # exists
    assert main(["cat", "-O", input_dir, "-o", out], spark=spark) == 0
    assert spark.read.parquet(out).count() > 0


def test_input_format_forces_suffixless_read(spark, input_dir, tmp_path):
    # write OPL, strip the suffix, read back only via -F opl
    opl = str(tmp_path / "data.opl")
    assert main(["cat", input_dir, "-o", opl], spark=spark) == 0
    bare = str(tmp_path / "data")  # no suffix -> parquet by default
    os.rename(opl, bare)
    out = str(tmp_path / "round.opl")
    rc = main(["cat", "-F", "opl", bare, "-o", out], spark=spark)
    assert rc == 0
    with open(out) as a, open(opl, "w") as _:
        pass  # keep flake quiet; compare against a fresh render below
    assert main(["cat", "-O", input_dir, "-o", opl], spark=spark) == 0
    with open(out) as a, open(opl) as b:
        assert a.read() == b.read()


def test_verbose_prints_elapsed_lines(spark, input_dir, tmp_path, capsys):
    out = str(tmp_path / "v.opl")
    rc = main(["cat", "-v", input_dir, "-o", out], spark=spark)
    assert rc == 0
    err = capsys.readouterr().err
    # libosmium verbose_output format: "[ M:SS] message"
    assert "] Started osmium cat" in err and "] Done." in err
    assert err.splitlines()[0].startswith("[ 0:")


def test_fsync_flag(spark, input_dir, tmp_path):
    out = str(tmp_path / "f.opl")
    rc = main(["cat", "--fsync", input_dir, "-o", out], spark=spark)
    assert rc == 0 and os.path.getsize(out) > 0


def test_progress_flags_accepted(spark, input_dir, tmp_path):
    out = str(tmp_path / "p.opl")
    assert main(["cat", "--progress", input_dir, "-o", out], spark=spark) == 0
    assert main(["cat", "--no-progress", "-O", input_dir, "-o", out],
                spark=spark) == 0


def test_input_format_forces_compressed_xml(spark, tmp_path, capsys):
    # -F osm.gz on a suffixless gzip'd XML blob (reference io.cpp:129-141:
    # the -F string names compression too)
    import gzip
    import shutil

    blob = str(tmp_path / "blob.bin")
    with open("/root/reference/test/cat/input1.osm", "rb") as s, \
            gzip.open(blob, "wb") as d:
        shutil.copyfileobj(s, d)
    rc = main(["cat", "-F", "osm.gz", blob, "-f", "opl", "-o", "-"],
              spark=spark)
    assert rc == 0
    body = capsys.readouterr().out
    assert body.startswith("n1 v1 dV") and body.count("\n") >= 3


def test_getid_verbose_ids_missing(spark, input_dir, tmp_path, capsys):
    # --verbose-ids implies -v, lists requested ids, and prints the
    # reference's "Missing node IDs: ..." stderr lines on exit 1
    out = str(tmp_path / "g.opl")
    rc = main(["getid", "--verbose-ids", input_dir, "n10", "n99999",
               "-o", out], spark=spark)
    assert rc == 1
    err = capsys.readouterr().err
    assert "looking for these ids:" in err
    assert "Missing node IDs: 99999" in err


def test_extract_output_format_and_stdout(spark, input_dir, tmp_path, capsys):
    # extract -f overrides the -o suffix; -o -/-f writes stdout
    out = str(tmp_path / "e.dat")
    rc = main(["extract", "--bbox=-180,-90,180,90", input_dir,
               "-o", out, "-f", "opl"], spark=spark)
    assert rc == 0
    with open(out) as f:
        assert f.read().startswith("n")
    rc = main(["extract", "--bbox=-180,-90,180,90", input_dir,
               "-o", "-", "-f", "opl"], spark=spark)
    assert rc == 0
    assert capsys.readouterr().out.startswith("n")


def test_query_locations_index_dump_opl(spark, input_dir, tmp_path, capsys):
    idx = str(tmp_path / "idx")
    assert main(["create-locations-index", input_dir, "-i", idx],
                spark=spark) == 0
    # -f opl => metadata-less OPL node dump (reference add_metadata=none)
    assert main(["query-locations-index", "-i", idx, "--dump", "-f", "opl"],
                spark=spark) == 0
    lines = capsys.readouterr().out.splitlines()
    assert lines and all(l.startswith("n") and " T x" in l for l in lines)
    # -o FILE honors -O refusal
    dst = str(tmp_path / "d.opl")
    assert main(["query-locations-index", "-i", idx, "--dump", "-o", dst],
                spark=spark) == 0
    assert main(["query-locations-index", "-i", idx, "--dump", "-o", dst],
                spark=spark) == 2
    with open(dst) as f:
        assert f.read().splitlines() == lines
