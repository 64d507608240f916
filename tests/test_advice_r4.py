"""Round-4 ADVICE fixes:

1. `diff -f opl -o FILE` writes marked OPL to the file (reference
   behavior; previously silently wrote a parquet dataset).
2. OPL omit quirk (command_diff.cpp:149-157): --ignore-changeset drops
   BOTH the c and u fields from the output line; --ignore-user affects
   only the comparison; --ignore-uid drops i (golden
   output-compact-c-nouid-opl pins the uid case).
3. sample_hash yields a non-negative residue, so bernoulli_sample
   honours the rate for negative ids too.
4. extract config "output": "-" streams bytes (binary-safe for pbf).
"""

import json

import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.cli import main

DIFF = "/root/reference/test/diff"


class TestDiffOplToFile:
    def test_marked_opl_file_matches_stdout_golden(self, spark, tmp_path):
        out = str(tmp_path / "d.opl")
        rc = main(["diff", "-f", "opl", f"{DIFF}/input1.osm",
                   f"{DIFF}/input2.osm", "-o", out], spark=spark)
        assert rc == 1  # differences found
        assert open(out).read() == open(f"{DIFF}/output.opl").read()

    def test_suppress_common_file(self, spark, tmp_path):
        out = str(tmp_path / "dc.opl")
        rc = main(["diff", "-f", "opl", "-c", f"{DIFF}/input1.osm",
                   f"{DIFF}/input2.osm", "-o", out], spark=spark)
        assert rc == 1
        assert open(out).read() == open(f"{DIFF}/output-c.opl").read()

    def test_ignore_uid_file_matches_golden(self, spark, tmp_path):
        out = str(tmp_path / "n.opl")
        rc = main(["diff", "-f", "opl", "-c", "--ignore-uid",
                   f"{DIFF}/input1.osm", f"{DIFF}/input2.osm",
                   "-o", out], spark=spark)
        assert rc == 1
        assert open(out).read() == open(
            f"{DIFF}/output-compact-c-nouid-opl").read()

    def test_ignore_uid_equal_inputs_empty_file(self, spark, tmp_path):
        out = str(tmp_path / "e.opl")
        rc = main(["diff", "-f", "opl", "-c", "--ignore-uid",
                   f"{DIFF}/input1uid.osm", f"{DIFF}/input2uid.osm",
                   "-o", out], spark=spark)
        assert rc == 0
        assert open(out).read() == ""


class TestIgnoreChangesetQuirk:
    def _lines(self, capsys, spark, *flags):
        rc = main(["diff", "-f", "opl", "-c", *flags,
                   f"{DIFF}/input1.osm", f"{DIFF}/input2.osm"], spark=spark)
        assert rc == 1
        return [ln for ln in capsys.readouterr().out.splitlines() if ln]

    def test_ignore_changeset_drops_c_and_u(self, spark, capsys):
        # reference quirk: the add_metadata string skips BOTH "+changeset"
        # and "+user" under --ignore-changeset (command_diff.cpp:149-157)
        for ln in self._lines(capsys, spark, "--ignore-changeset"):
            fields = ln[1:].split(" ")
            assert not any(f.startswith("c") for f in fields), ln
            assert not any(f.startswith("u") for f in fields), ln
            assert any(f.startswith("i") for f in fields), ln  # uid stays

    def test_ignore_user_keeps_all_fields(self, spark, capsys):
        for ln in self._lines(capsys, spark, "--ignore-user"):
            fields = ln[1:].split(" ")
            assert any(f.startswith("c") for f in fields), ln
            assert any(f.startswith("i") for f in fields), ln
            assert any(f.startswith("u") for f in fields), ln


class TestNegativeIdSampling:
    def _ids(self, spark):
        return spark.createDataFrame(
            [(i,) for i in range(-50, 51) if i != 0], "id long"
        )

    def test_rate_zero_keeps_nothing(self, spark):
        from osmium_tool_spark.operators.sample import bernoulli_sample

        assert bernoulli_sample(self._ids(spark), 0.0).count() == 0

    def test_rate_one_keeps_all(self, spark):
        from osmium_tool_spark.operators.sample import bernoulli_sample

        assert bernoulli_sample(self._ids(spark), 1.0).count() == 100

    def test_negative_ids_sampled_at_rate(self, spark):
        from osmium_tool_spark.operators.sample import bernoulli_sample

        df = spark.createDataFrame([(-i,) for i in range(1, 2001)], "id long")
        kept = bernoulli_sample(df, 0.2).count()
        # before the fix every negative id survived (2000); a correct
        # 20% draw lands well inside [250, 550]
        assert 250 <= kept <= 550, kept

    def test_hash_nonnegative(self, spark):
        from osmium_tool_spark.operators.sample import sample_hash

        rows = self._ids(spark).select(
            sample_hash(F.col("id")).alias("h")).collect()
        assert all(r["h"] >= 0 for r in rows)


class TestExtractConfigStdoutBinary:
    def test_pbf_to_stdout(self, spark, tmp_path, capsysbinary):
        cfg = {
            "directory": str(tmp_path),
            "extracts": [{
                "output": "-",
                "output_format": "pbf",
                "bbox": [-180, -90, 180, 90],
            }],
        }
        cfile = tmp_path / "c.json"
        cfile.write_text(json.dumps(cfg))
        rc = main(["extract", "-c", str(cfile),
                   f"{DIFF}/input1.osm"], spark=spark)
        assert rc == 0
        out = capsysbinary.readouterr().out
        # a valid PBF stream starts with the 4-byte BlobHeader length and
        # contains the OSMHeader marker
        assert b"OSMHeader" in out[:64]
        assert b"OSMData" in out


class TestStdoutOutput:
    """Reference stdout-output rule (io.cpp:157-167): '-o -' or missing
    -o writes to stdout and then -f is REQUIRED."""

    SORT = "/root/reference/test/sort"
    CAT = "/root/reference/test/cat"

    def test_cat_opl_to_stdout(self, spark, capsys):
        rc = main(["--generator", "test", "cat", f"{self.CAT}/input1.osm",
                   "-f", "opl"], spark=spark)
        assert rc == 0
        assert capsys.readouterr().out == open(
            f"{self.CAT}/output1.osm.opl").read()

    def test_sort_xml_to_dash(self, spark, capsys):
        rc = main(["--generator", "test", "sort", f"{self.SORT}/input-simple1.osm",
                   f"{self.SORT}/input-simple2.osm", "-o", "-", "-f", "osm"],
                  spark=spark)
        assert rc == 0
        assert capsys.readouterr().out == open(
            f"{self.SORT}/output-simple.osm").read()

    def test_cat_pbf_to_stdout_binary(self, spark, capsysbinary):
        rc = main(["cat", f"{self.CAT}/input1.osm", "-f", "pbf"], spark=spark)
        assert rc == 0
        out = capsysbinary.readouterr().out
        assert b"OSMHeader" in out[:64] and b"OSMData" in out

    def test_missing_output_and_format_exits_2(self, spark, capsys):
        rc = main(["cat", f"{self.CAT}/input1.osm"], spark=spark)
        assert rc == 2
        assert "Missing output file" in capsys.readouterr().err

    def test_dash_without_format_exits_2(self, spark, capsys):
        rc = main(["cat", f"{self.CAT}/input1.osm", "-o", "-"], spark=spark)
        assert rc == 2
        assert "STDOUT" in capsys.readouterr().err

    def test_format_overrides_suffix(self, spark, tmp_path):
        # reference precedence: -f beats the output suffix (io.cpp File
        # ctor) — an unknown suffix with -f opl must yield OPL, not a
        # parquet directory
        out = str(tmp_path / "out.dat")
        rc = main(["--generator", "test", "cat", f"{self.CAT}/input1.osm",
                   "-o", out, "-f", "opl"], spark=spark)
        assert rc == 0
        import os

        assert os.path.isfile(out)
        assert open(out).read() == open(f"{self.CAT}/output1.osm.opl").read()

    def test_format_gz_with_plain_suffix(self, spark, tmp_path):
        import gzip

        out = str(tmp_path / "plain.out")
        rc = main(["--generator", "test", "cat", f"{self.CAT}/input1.osm",
                   "-o", out, "-f", "opl.gz"], spark=spark)
        assert rc == 0
        assert gzip.open(out, "rt").read() == open(
            f"{self.CAT}/output1.osm.opl").read()

    def test_o5m_output_rejected(self, spark, tmp_path):
        # o5m is read-only in the reference (osmium-file-formats.md:48);
        # previously this silently wrote a parquet directory
        with pytest.raises(SystemExit, match="o5m"):
            main(["cat", f"{self.CAT}/input1.osm",
                  "-o", str(tmp_path / "x.o5m")], spark=spark)

    def test_xml_suffix_writes_xml(self, spark, tmp_path):
        out = str(tmp_path / "out.xml")
        rc = main(["--generator", "test", "sort",
                   "/root/reference/test/sort/input-simple1.osm",
                   "/root/reference/test/sort/input-simple2.osm",
                   "-o", out], spark=spark)
        assert rc == 0
        import os

        assert os.path.isfile(out)
        assert open(out).read() == open(
            "/root/reference/test/sort/output-simple.osm").read()
