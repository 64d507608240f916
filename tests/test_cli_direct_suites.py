"""The remaining reference CLI suites run DIRECTLY through the CLI with
byte parity against the committed goldens — the exact invocations of
test/{sort,merge,merge-changes,getid,removeid,getparents,time-filter,
tags-filter,check-refs}/CMakeLists.txt (the reference writes to stdout;
we write the same bytes to -o)."""

import pathlib

import pytest

from osmium_tool_spark.cli import main

REF = "/root/reference/test"
UPLOAD = ["--output-header", "xml_josm_upload=false"]


def run_golden(spark, tmp_path, argv, golden, rc_want=0, outname="out.osm"):
    out = str(tmp_path / outname)
    rc = main(["--generator", "test", *argv, "-o", out], spark=spark)
    assert rc == rc_want, f"exit {rc} != {rc_want}"
    assert open(out).read() == open(golden).read()


class TestSortCliGoldens:
    """check_sort1/check_sort2: both strategies, 9 committed outputs
    (multipass accepted as a compat flag — one external sort covers it)."""

    CASES = [
        (["sort/input-simple1.osm", "sort/input-simple2.osm"], "output-simple.osm", "out.osm"),
        (["sort/input-bounds1.osm", "sort/input-bounds2.osm"], "output-bounds.osm", "out.osm"),
        (["sort/input-history1.osm", "sort/input-history2.osm"], "output-history.osm", "out.osm"),
        (["sort/input-neg.osm"], "output-neg.osm", "out.osm"),
        (["sort/input-change.osc"], "output-change.osc", "out.osc"),
        (["sort/input-simple1-only-version.osm", "sort/input-simple2.osm"],
         "output-simple-1-only-version.osm", "out.osm"),
        (["sort/input-simple-onefile.osm"], "output-simple-onefile.osm", "out.osm"),
        (["sort/input-history-partially-only-version.osm"],
         "output-history-partially-only-version.osm", "out.osm"),
        (["sort/input-history-only-version.osm"],
         "output-history-only-version.osm", "out.osm"),
    ]

    @pytest.mark.parametrize("inputs,golden,outname", CASES,
                             ids=[c[1] for c in CASES])
    @pytest.mark.parametrize("strategy", ["simple", "multipass"])
    def test_sort(self, spark, tmp_path, inputs, golden, outname, strategy):
        run_golden(spark, tmp_path,
                   ["sort", "-s", strategy, *[f"{REF}/{i}" for i in inputs]],
                   f"{REF}/sort/{golden}", outname=outname)


class TestMergeCliGoldens:
    """check_merge1/2/3 + the --with-history same-ids case."""

    CASES = [
        (["input1.osm"], [], "output1.osm"),
        (["input1.osm", "input2.osm"], [], "output2.osm"),
        (["input2.osm", "input1.osm"], [], "output2.osm"),
        (["input1.osm", "input2.osm", "input3.osm"], [], "output3.osm"),
        (["input1-only-version.osm", "input2-only-version.osm"], [],
         "output2-12-only-version.osm"),
        (["input2-only-version.osm", "input1-only-version.osm"], [],
         "output2-12-only-version.osm"),
        (["same-ids.osm", "empty.osm"], ["--with-history"], "output-same-ids.osm"),
    ]

    @pytest.mark.parametrize("inputs,opts,golden", CASES,
                             ids=["-".join(i.split(".")[0] for i in c[0]) for c in CASES])
    def test_merge(self, spark, tmp_path, inputs, opts, golden):
        run_golden(spark, tmp_path,
                   ["merge", *opts, *[f"{REF}/merge/{i}" for i in inputs]],
                   f"{REF}/merge/{golden}")


class TestMergeChangesCliGoldens:
    """check_merge_changes: the full committed 8-case matrix."""

    CASES = [
        ("", "change1.osc", "change2.osc", "merged.osc"),
        ("--simplify", "change1.osc", "change2.osc", "simplified.osc"),
        ("", "change1-only-version.osc", "change2-only-version.osc",
         "merged-both-only-version.osc"),
        ("--simplify", "change1-only-version.osc", "change2-only-version.osc",
         "simplified-both-only-version.osc"),
        ("", "change1-only-version.osc", "change2.osc",
         "merged-first-only-version.osc"),
        ("--simplify", "change1-only-version.osc", "change2.osc",
         "simplified-first-only-version.osc"),
        ("", "change1.osc", "change2-only-version.osc",
         "merged-second-only-version.osc"),
        ("--simplify", "change1.osc", "change2-only-version.osc",
         "simplified-second-only-version.osc"),
    ]

    @pytest.mark.parametrize("opts,in1,in2,golden", CASES,
                             ids=[c[3].replace(".osc", "") for c in CASES])
    def test_merge_changes(self, spark, tmp_path, opts, in1, in2, golden):
        argv = ["merge-changes"]
        if opts:
            argv.append(opts)
        argv += [f"{REF}/merge-changes/{in1}", f"{REF}/merge-changes/{in2}"]
        run_golden(spark, tmp_path, argv, f"{REF}/merge-changes/{golden}",
                   outname="out.osc")


class TestGetidCliGoldens:
    """check_getid / check_getid_file / check_getid_r(_fail): inline and
    id-file selection, recursive closure via -I and -i, missing-id exit 1
    with the empty output still written, the cyclic relation loop."""

    def test_inline_ids(self, spark, tmp_path):
        run_golden(spark, tmp_path,
                   [*UPLOAD, "getid", f"{REF}/getid/input.osm", "n11,n12", "w21"],
                   f"{REF}/getid/output.osm")

    def test_id_file(self, spark, tmp_path):
        run_golden(spark, tmp_path,
                   [*UPLOAD, "getid", "-i", f"{REF}/getid/idfile",
                    f"{REF}/getid/input.osm"],
                   f"{REF}/getid/output-file.osm")

    R_CASES = [
        ("source", "in10", "out10"),
        ("source", "in21", "out21"),
        ("source", "in30", "out30"),
        ("source", "in31", "out31"),
        ("source", "in32", "out32"),
        ("source-no-rr", "in10", "out10"),
        ("source-no-rr", "in21", "out21"),
        ("source-no-rr", "in30", "out30"),
        ("source-no-rr", "in32", "out32"),
        ("relloop", "relloop", "relloop-out"),
    ]

    @pytest.mark.parametrize("source,inp,golden", R_CASES,
                             ids=[f"{c[0]}-{c[1]}" for c in R_CASES])
    @pytest.mark.parametrize("mode", ["-I", "-i"])
    def test_recursive(self, spark, tmp_path, source, inp, golden, mode):
        suffix = ".osm" if mode == "-I" else ".id"
        run_golden(spark, tmp_path,
                   ["getid", "-r", f"{REF}/getid/{source}.osm",
                    mode, f"{REF}/getid/{inp}{suffix}"],
                   f"{REF}/getid/{golden}.osm")

    @pytest.mark.parametrize("inp", ["in19", "in29", "in39"])
    @pytest.mark.parametrize("mode", ["-I", "-i"])
    def test_missing_exit1(self, spark, tmp_path, inp, mode):
        suffix = ".osm" if mode == "-I" else ".id"
        run_golden(spark, tmp_path,
                   ["getid", "-r", f"{REF}/getid/source.osm",
                    mode, f"{REF}/getid/{inp}{suffix}"],
                   f"{REF}/getid/out-empty.osm", rc_want=1)


class TestRemoveidCliGoldens:
    CASES = [
        (["n11,n12"], [], "output-n11n12.osm"),
        (["10,w21"], [], "output-n10w21.osm"),
        (["r30"], [], "output-r30.osm"),
        ([], ["-i", f"{REF}/removeid/n12w20.ids"], "output-n12w20.osm"),
    ]

    @pytest.mark.parametrize("ids,opts,golden", CASES,
                             ids=[c[2].replace("output-", "").replace(".osm", "")
                                  for c in CASES])
    def test_removeid(self, spark, tmp_path, ids, opts, golden):
        run_golden(spark, tmp_path,
                   [*UPLOAD, "removeid", *opts, f"{REF}/removeid/input.osm", *ids],
                   f"{REF}/removeid/{golden}")


class TestGetparentsCliGoldens:
    CASES = [
        ("n10", False, "out-n10.osm"),
        ("n12", False, "out-n12.osm"),
        ("w20", False, "out-w20.osm"),
        ("n10", True, "out-n10-s.osm"),
        ("n12", True, "out-n12-s.osm"),
        ("w20", True, "out-w20-s.osm"),
    ]

    @pytest.mark.parametrize("ids,add_self,golden", CASES,
                             ids=[c[2].replace("out-", "").replace(".osm", "")
                                  for c in CASES])
    def test_getparents(self, spark, tmp_path, ids, add_self, golden):
        argv = [*UPLOAD, "getparents"]
        if add_self:
            argv.append("--add-self")
        argv += [f"{REF}/getparents/input.osm", ids]
        run_golden(spark, tmp_path, argv, f"{REF}/getparents/{golden}")


class TestTimeFilterCliGoldens:
    """check_time_filter: the full snapshot + range boundary sweep, ISO
    TIME arguments straight from the CMake matrix."""

    CASES = [
        ("osm", None, None, "last"),
        ("osm", "2015-01-01T01:00:00Z", None, "ts1"),
        ("osm", "2015-01-01T01:01:00Z", None, "ts1"),
        ("osm", "2015-01-01T02:00:00Z", None, "ts2"),
        ("osm", "2015-01-01T02:01:00Z", None, "ts2"),
        ("osm", "2015-01-01T03:00:00Z", None, "ts3"),
        ("osm", "2015-01-01T03:01:00Z", None, "ts3"),
        ("osh", "2015-01-01T00:00:00Z", "2015-01-01T05:00:00Z", "range-0-5"),
        ("osh", "2015-01-01T01:00:00Z", "2015-01-01T02:00:00Z", "range-1-2"),
        ("osh", "2015-01-01T01:01:00Z", "2015-01-01T02:01:00Z", "range-1a-2a"),
        ("osh", "2015-01-01T02:00:00Z", "2015-01-01T03:00:00Z", "range-2-3"),
        ("osh", "2015-01-01T02:00:00Z", "2015-01-01T03:01:00Z", "range-2-3a"),
        ("osh", "2015-01-01T02:00:00Z", "2015-01-01T04:00:00Z", "range-2-4"),
    ]

    @pytest.mark.parametrize("fmt,t1,t2,name", CASES,
                             ids=[f"{c[3]}-{c[1] or 'now'}" for c in CASES])
    def test_time_filter(self, spark, tmp_path, fmt, t1, t2, name):
        argv = [*UPLOAD, "time-filter", f"{REF}/time-filter/input.osh"]
        if t1:
            argv.append(t1)
        if t2:
            argv.append(t2)
        run_golden(spark, tmp_path, argv,
                   f"{REF}/time-filter/output-{name}.{fmt}",
                   outname=f"out.{fmt}")


class TestTagsFilterCliGoldens:
    """check_tags_filter: the full committed 17-case flag × expression
    matrix."""

    CASES = [
        ("node", [], "input.osm", ["n/amenity"], "output-amenity.osm"),
        ("node-R", ["-R"], "input.osm", ["n/amenity"], "output-amenity.osm"),
        ("highway-R", ["-R"], "input.osm", ["w/highway"], "output-highway-R.osm"),
        ("note-R", ["-R"], "input.osm", ["note"], "output-note-R.osm"),
        ("note-iR", ["-i", "-R"], "input.osm", ["note"], "output-note-iR.osm"),
        ("highway", [], "input.osm", ["w/highway"], "output-highway.osm"),
        ("highway-i", ["-i"], "input.osm", ["w/highway"], "output-highway-i.osm"),
        ("highway-n-i", ["-i"], "input-nodes.osm", ["w/highway"],
         "output-nodes-highway-i.osm"),
        ("note-rel", [], "input.osm", ["r/note"], "output-note-rel.osm"),
        ("highway-t", ["-t"], "input.osm", ["w/highway"], "output-highway-t.osm"),
        ("highway-it", ["-i", "-t"], "input.osm", ["w/highway"],
         "output-highway-it.osm"),
        ("note-rel-t", ["-t"], "input.osm", ["r/note"], "output-note-rel-t.osm"),
        ("site-1", [], "input-site.osm", ["r/site=1"], "output-site-1.osm"),
        ("site-2", [], "input-site.osm", ["r/site=2"], "output-site-2.osm"),
        ("site-R", ["-R"], "input-site.osm", ["r/site=2"], "output-site-R.osm"),
        ("site-R-all", ["-R"], "input-site.osm", ["r/site"], "output-site-R-all.osm"),
        ("site-t", ["-t"], "input-site.osm", ["r/site"], "output-site-t.osm"),
    ]

    @pytest.mark.parametrize("name,flags,inp,exprs,golden", CASES,
                             ids=[c[0] for c in CASES])
    def test_tags_filter(self, spark, tmp_path, name, flags, inp, exprs, golden):
        run_golden(spark, tmp_path,
                   [*UPLOAD, "tags-filter", *flags,
                    f"{REF}/tags-filter/{inp}", *exprs],
                   f"{REF}/tags-filter/{golden}")


class TestCheckRefsCliExitCodes:
    """check-refs exit-code matrix incl. the order/ suite: WILL_FAIL cases
    must exit nonzero (the reference runs CheckOrder per object —
    command_check_refs.cpp:188,200,223)."""

    OK = [
        ("check-refs/okay.osm", []),
        ("check-refs/okay.osm", ["-r"]),
        ("check-refs/way-okay.osm", []),
        ("check-refs/okay-r-in-r.osm", ["-r"]),
    ]
    FAIL = [
        ("check-refs/fail-n-in-w.osm", []),
        ("check-refs/way-okay.osm", ["-r"]),
        ("check-refs/fail-n-in-r.osm", ["-r"]),
        ("check-refs/fail-w-in-r.osm", ["-r"]),
        ("check-refs/fail-r-in-r-1.osm", ["-r"]),
        ("check-refs/fail-r-in-r-2.osm", ["-r"]),
        ("order/fail-order-n.osm", []),
        ("order/fail-order-w.osm", []),
        ("order/fail-order-r.osm", ["-r"]),
        ("order/fail-order-wn.osm", []),
        ("order/fail-order-rw.osm", []),
    ]

    @pytest.mark.parametrize("inp,opts", OK, ids=[f"ok-{c[0].split('/')[1]}{'-r' if c[1] else ''}" for c in OK])
    def test_okay(self, spark, inp, opts):
        assert main(["check-refs", *opts, f"{REF}/{inp}"], spark=spark) == 0

    @pytest.mark.parametrize("inp,opts", FAIL, ids=[f"fail-{c[0].split('/')[1]}{'-r' if c[1] else ''}" for c in FAIL])
    def test_fail(self, spark, inp, opts):
        assert main(["check-refs", *opts, f"{REF}/{inp}"], spark=spark) != 0


class TestExtractCliGoldens:
    """The committed extract matrix run DIRECTLY through the CLI
    (test/extract/CMakeLists.txt): bbox/strategy/clean over 32-bit and
    64-bit id inputs, the config-file path, --output-header=OPTION!
    input-copy semantics, and the antimeridian OPL matrix."""

    REF = "/root/reference/test/extract"

    XML_CASES = [
        ("clean", "input1.osm", "output-clean.osm",
         ["--clean", "version", "--clean", "uid", "-b", "0,0,1.5,10"]),
        ("simple", "input1.osm", "output-simple.osm",
         ["-s", "simple", "--output-header", "xml_josm_upload!", "-b", "0,0,1.5,10"]),
        ("complete_ways", "input1.osm", "output-complete-ways.osm",
         ["-s", "complete_ways", "-b", "0,0,1.5,10"]),
        ("complete_ways_norels", "input1.osm", "output-complete-ways-norels.osm",
         ["-s", "complete_ways", "-S", "relations=false", "-b", "0,0,1.5,10"]),
        ("smart_default", "input1.osm", "output-smart.osm",
         ["-s", "smart", "-b", "0,0,1.5,10"]),
        ("smart_mp", "input1.osm", "output-smart.osm",
         ["-s", "smart", "-S", "types=multipolygon", "-b", "0,0,1.5,10"]),
        ("smart_any", "input1.osm", "output-smart.osm",
         ["-s", "smart", "-S", "types=any", "-b", "0,0,1.5,10"]),
        ("smart_nonmp", "input1.osm", "output-smart-nonmp.osm",
         ["-s", "smart", "-S", "types=x", "-b", "0,0,1.5,10"]),
        ("clean64", "input64.osm", "output-clean64.osm",
         ["--clean", "version", "--clean", "uid", "-b", "0,0,1.5,10"]),
        ("simple64", "input64.osm", "output-simple64.osm",
         ["-s", "simple", "--output-header", "xml_josm_upload!", "-b", "0,0,1.5,10"]),
        ("complete_ways64", "input64.osm", "output-complete-ways64.osm",
         ["-s", "complete_ways", "-b", "0,0,1.5,10"]),
        ("complete_ways_norels64", "input64.osm", "output-complete-ways-norels64.osm",
         ["-s", "complete_ways", "-S", "relations=false", "-b", "0,0,1.5,10"]),
        ("smart_default64", "input64.osm", "output-smart64.osm",
         ["-s", "smart", "-b", "0,0,1.5,10"]),
        ("smart_mp64", "input64.osm", "output-smart64.osm",
         ["-s", "smart", "-S", "types=multipolygon", "-b", "0,0,1.5,10"]),
        ("smart_any64", "input64.osm", "output-smart64.osm",
         ["-s", "smart", "-S", "types=any", "-b", "0,0,1.5,10"]),
        ("smart_nonmp64", "input64.osm", "output-smart-nonmp64.osm",
         ["-s", "smart", "-S", "types=x", "-b", "0,0,1.5,10"]),
        ("cfg_simple", "input1.osm", "output-simple.osm",
         ["-s", "simple", "--output-header", "xml_josm_upload=false",
          "-c", f"{REF}/config.json"]),
        ("way_starts_outside", "input-way-starts-outside.osm",
         "output-simple-way-starts-outside.osm",
         ["-s", "simple", "-b", "0,0,1.5,10"]),
    ]

    @pytest.mark.parametrize("name,inp,golden,opts", XML_CASES,
                             ids=[c[0] for c in XML_CASES])
    def test_extract_xml(self, spark, tmp_path, name, inp, golden, opts):
        run_golden(spark, tmp_path,
                   ["extract", *opts, f"{self.REF}/{inp}"],
                   f"{self.REF}/{golden}")

    OPL_CASES = [
        ("am-east-bbox", "antimeridian.opl", "output-antimeridian-east.opl",
         ["--bbox=160,60,180,80"]),
        ("am-west-bbox", "antimeridian.opl", "output-antimeridian-west.opl",
         ["--bbox=-180,60,-160,80"]),
        ("am-east-poly", "antimeridian.opl", "output-antimeridian-east.opl",
         ["--polygon=" + f"{REF}/polygon-russia-east.geojson"]),
        ("am-west-poly", "antimeridian.opl", "output-antimeridian-west.opl",
         ["--polygon=" + f"{REF}/polygon-russia-west.geojson"]),
        ("am-both-poly", "antimeridian.opl", "output-antimeridian-both.opl",
         ["--polygon=" + f"{REF}/polygon-russia-all.geojson"]),
        ("am-reverse-poly", "antimeridian.opl", "output-antimeridian-both.opl",
         ["--polygon=" + f"{REF}/polygon-russia-reverse.geojson"]),
        ("alaska-east-json", "w42394837.osm", "w42394837.opl",
         ["--polygon=" + f"{REF}/polygon-us-alaska.geojson"]),
        ("alaska-west-json", "w46113981.osm", "w46113981.opl",
         ["--polygon=" + f"{REF}/polygon-us-alaska.geojson"]),
        ("alaska-east-poly", "w42394837.osm", "w42394837.opl",
         ["--polygon=" + f"{REF}/polygon-us-alaska.poly"]),
        ("alaska-west-poly", "w46113981.osm", "w46113981.opl",
         ["--polygon=" + f"{REF}/polygon-us-alaska.poly"]),
        ("alaska-east-nofeature", "w42394837.osm", "w42394837.opl",
         ["--polygon=" + f"{REF}/polygon-us-alaska-no-feature.geojson"]),
    ]

    @pytest.mark.parametrize("name,inp,golden,opts", OPL_CASES,
                             ids=[c[0] for c in OPL_CASES])
    def test_extract_opl(self, spark, tmp_path, name, inp, golden, opts):
        out = str(tmp_path / "out.opl")
        rc = main(["--generator", "test", "extract", *opts,
                   f"{self.REF}/{inp}", "-o", out], spark=spark)
        assert rc == 0
        got = "".join(p.read_text()
                      for p in sorted(pathlib.Path(out).glob("part-*"))) \
            if pathlib.Path(out).is_dir() else open(out).read()
        assert got == open(f"{self.REF}/{golden}").read()


class TestChangesetFilterCliGoldens:
    """The full committed changeset-filter matrix run DIRECTLY through
    the CLI (test/changeset-filter/CMakeLists.txt, 51 cases): predicate
    flags, the 15+15 after/before boundary sweeps over both inputs, and
    bbox overlap — XML changesets in, byte-golden XML changesets out."""

    REF = "/root/reference/test/changeset-filter"

    CASES = [
        ("no-option", [], "input1.osm", "output1-all.osm"),
        ("with-discussion", ["--with-discussion"], "input1.osm", "output-empty.osm"),
        ("without-discussion", ["--without-discussion"], "input1.osm", "output1-all.osm"),
        ("with-changes", ["--with-changes"], "input1.osm", "output1-first.osm"),
        ("without-changes", ["--without-changes"], "input1.osm", "output1-second.osm"),
        ("open", ["--open"], "input1.osm", "output-empty.osm"),
        ("closed", ["--closed"], "input1.osm", "output1-all.osm"),
        ("user", ["--user=Elbert"], "input1.osm", "output1-first.osm"),
        ("uid", ["--uid=1233268"], "input1.osm", "output1-second.osm"),
        ("e-open", ["--open"], "input-open.osm", "output-open.osm"),
        ("e-closed", ["--closed"], "input-open.osm", "output-empty.osm"),
    ] + [
        (f"after{i:02d}", [f"--after=2013-03-22T{t}Z"], "input1.osm", out)
        for i, (t, out) in enumerate([
            ("02:08:50", "output1-all.osm"), ("02:08:54", "output1-all.osm"),
            ("02:08:55", "output1-all.osm"), ("02:08:56", "output1-all.osm"),
            ("02:08:57", "output1-all.osm"), ("02:08:58", "output1-all.osm"),
            ("02:08:59", "output1-second.osm"), ("02:09:00", "output1-second.osm"),
            ("02:09:10", "output1-second.osm"), ("02:09:11", "output1-second.osm"),
            ("02:09:12", "output1-second.osm"), ("03:09:10", "output1-second.osm"),
            ("03:09:11", "output1-second.osm"), ("03:09:12", "output-empty.osm"),
            ("03:09:20", "output-empty.osm"),
        ], start=1)
    ] + [
        (f"e-after{i}", [f"--after=2013-03-22T04:20:2{s}Z"], "input-open.osm", "output-open.osm")
        for i, s in enumerate([4, 5, 6], start=1)
    ] + [
        (f"before{i:02d}", [f"--before=2013-03-22T{t}Z"], "input1.osm", out)
        for i, (t, out) in enumerate([
            ("02:08:50", "output-empty.osm"), ("02:08:54", "output-empty.osm"),
            ("02:08:55", "output1-first.osm"), ("02:08:56", "output1-first.osm"),
            ("02:08:57", "output1-first.osm"), ("02:08:58", "output1-first.osm"),
            ("02:08:59", "output1-first.osm"), ("02:09:00", "output1-first.osm"),
            ("02:09:10", "output1-first.osm"), ("02:09:11", "output1-all.osm"),
            ("02:09:12", "output1-all.osm"), ("03:09:10", "output1-all.osm"),
            ("03:09:11", "output1-all.osm"), ("03:09:12", "output1-all.osm"),
            ("03:09:20", "output1-all.osm"),
        ], start=1)
    ] + [
        ("e-before1", ["--before=2013-03-22T04:20:24Z"], "input-open.osm", "output-empty.osm"),
        ("e-before2", ["--before=2013-03-22T04:20:25Z"], "input-open.osm", "output-open.osm"),
        ("e-before3", ["--before=2013-03-22T04:20:26Z"], "input-open.osm", "output-open.osm"),
        ("bbox1", ["--bbox", "120,-11,121,-10"], "input1.osm", "output1-first.osm"),
        ("bbox2", ["--bbox", "130,-31,131,-30"], "input1.osm", "output-empty.osm"),
    ]

    @pytest.mark.parametrize("name,opts,inp,golden", CASES, ids=[c[0] for c in CASES])
    def test_changeset_filter(self, spark, tmp_path, name, opts, inp, golden):
        run_golden(spark, tmp_path,
                   ["changeset-filter", "-f", "osm", *opts, f"{self.REF}/{inp}"],
                   f"{self.REF}/{golden}")


class TestHelpAndMiscCli:
    """test/help + test/misc CMakeLists matrices, prog-name adapted:
    usage text shape, version output, unknown command/topic messages
    and the reference's fatal exit code (main.cpp:71-113)."""

    import re as _re

    def test_help_noargs(self, capsys):
        assert main([]) == 0
        out = capsys.readouterr().out
        assert self._re.match(r"^Usage: (?s:.)*COMMANDS:", out)

    @pytest.mark.parametrize("argv", [["help"], ["--help"], ["-h"]],
                             ids=["help", "--help", "-h"])
    def test_help_forms(self, capsys, argv):
        assert main(argv) == 0
        out = capsys.readouterr().out
        assert self._re.match(r"^Usage: (?s:.)*COMMANDS:", out)

    def test_help_topic_command(self, capsys):
        assert main(["help", "cat"]) == 0
        assert "cat" in capsys.readouterr().out

    def test_help_topic_unknown(self, capsys):
        assert main(["help", "x"]) == 2
        assert capsys.readouterr().err == "Unknown help topic 'x'.\n"

    @pytest.mark.parametrize("argv", [["--version"], ["version"]],
                             ids=["--version", "version"])
    def test_version(self, capsys, argv):
        assert main(argv) == 0
        assert self._re.match(r"^osmium_tool_spark version \d",
                              capsys.readouterr().out)

    def test_unknown_command(self, capsys):
        assert main(["x"]) == 2
        assert capsys.readouterr().err == \
            "Unknown command or option 'x'. Try 'osmium_tool_spark help'.\n"


class TestRenumberFailOrderCli:
    """renumber-fail-order-* (test/renumber/CMakeLists.txt:40-53,
    WILL_FAIL): renumber's id mapping is stream-order-defined, so
    unordered input is a fatal error, like the reference's CheckOrder."""

    CASES = ["fail-order-n.osm", "fail-order-w.osm", "fail-order-r.osm",
             "fail-order-wn.osm", "fail-order-rw.osm"]

    @pytest.mark.parametrize("inp", CASES, ids=[c.split(".")[0] for c in CASES])
    def test_fail(self, spark, tmp_path, inp):
        out = str(tmp_path / "out.osm")
        assert main(["renumber", f"{REF}/order/{inp}", "-o", out],
                    spark=spark) != 0


class TestExtractConfigMode:
    """Config-file multi-extract semantics (command_extract.cpp:322-413):
    per-extract output files written in one pass, file-referenced
    polygons resolved against the config directory, output_header null =
    copy-from-input, -H strategy gating, --set-bounds header."""

    REF = "/root/reference/test/extract"

    def test_multi_output_per_extract(self, spark, tmp_path):
        import json as _json

        cfg = {
            "directory": str(tmp_path),
            "extracts": [
                {"output": "a.osm", "output_format": "osm",
                 "bbox": [0, 0, 1.5, 10],
                 "output_header": {"xml_josm_upload": None}},
                {"output": "b.osm",
                 "polygon": f"{self.REF}/polygon-us-alaska.geojson"},
            ],
        }
        cfgp = tmp_path / "cfg.json"
        cfgp.write_text(_json.dumps(cfg))
        rc = main(["--generator", "test", "extract", "-s", "simple",
                   "-c", str(cfgp), f"{self.REF}/input1.osm"], spark=spark)
        assert rc == 0
        # extract 0 == the committed simple golden (null header value
        # copied upload=false from the input, like OPTION!)
        assert (tmp_path / "a.osm").read_text() == \
            open(f"{self.REF}/output-simple.osm").read()
        # extract 1: Alaska polygon matches nothing in input1
        assert "<node" not in (tmp_path / "b.osm").read_text()

    def test_config_relative_polygon_path(self, spark, tmp_path):
        import json as _json
        import shutil

        shutil.copy(f"{self.REF}/polygon-us-alaska.poly", tmp_path / "ak.poly")
        cfg = {"extracts": [{"output": "c.osm", "polygon": "ak.poly"}]}
        (tmp_path / "cfg.json").write_text(_json.dumps(cfg))
        rc = main(["extract", "-s", "simple", "-c", str(tmp_path / "cfg.json"),
                   f"{self.REF}/input1.osm"], spark=spark)
        assert rc == 0 and (tmp_path / "c.osm").exists()

    @pytest.mark.parametrize("strategy", ["simple", "smart"])
    def test_with_history_rejects_nonhistory_strategy(self, spark, tmp_path, strategy):
        rc = main(["extract", "-H", "-s", strategy, "-b", "0,0,1.5,10",
                   f"{self.REF}/input1.osm", "-o", str(tmp_path / "h.osm")],
                  spark=spark)
        assert rc == 2

    def test_set_bounds_header(self, spark, tmp_path):
        out = tmp_path / "sb.osm"
        rc = main(["--generator", "test", "extract", "--set-bounds",
                   "-s", "simple", "-b", "0,0,1.5,10",
                   f"{self.REF}/input1.osm", "-o", str(out)], spark=spark)
        assert rc == 0
        assert '<bounds minlat="0" minlon="0" maxlat="10" maxlon="1.5"/>' \
            in out.read_text()

    def test_no_config_no_output_errors(self, spark, tmp_path):
        assert main(["extract", "-b", "0,0,1,1",
                     f"{self.REF}/input1.osm"], spark=spark) == 2


class TestTagsCountCliOptions:
    """tags-count option surface (command_tags_count.cpp:116-131):
    -e expressions file ('#' comments), -t object-type restriction,
    -m/-M bounds, -s orders."""

    def test_expressions_file_and_type(self, spark, tmp_path):
        ef = tmp_path / "exprs.txt"
        ef.write_text("# only highways\nhighway\n\namenity  # inline comment\n")
        out = str(tmp_path / "tc")
        rc = main(["tags-count", "-e", str(ef), "-t", "way", "-m", "1",
                   "-s", "name-asc", f"{REF}/tags-filter/input.osm",
                   "-o", out], spark=spark)
        assert rc == 0
        rows = spark.read.parquet(out).collect()
        assert all(r["key"] in ("highway", "amenity") for r in rows)
        # ways only: node amenity tags must not be counted
        names = [r["key"] for r in rows]
        assert names == sorted(names)


class TestTagsFilterExpressionsFile:
    """-e/--expressions file (command_tags_filter.cpp:66-84): '#'
    comments, blank lines, CR trimming — file-sourced expressions equal
    the same expressions given positionally."""

    def test_file_equals_positional(self, spark, tmp_path):
        ef = tmp_path / "f.txt"
        ef.write_text("# ways with highway\nw/highway\n")
        out1, out2 = str(tmp_path / "a.osm"), str(tmp_path / "b.osm")
        base = ["--generator", "test", *UPLOAD, "tags-filter",
                f"{REF}/tags-filter/input.osm"]
        assert main([*base, "w/highway", "-o", out1], spark=spark) == 0
        assert main([*base, "-e", str(ef), "-o", out2], spark=spark) == 0
        golden = open(f"{REF}/tags-filter/output-highway.osm").read()
        assert open(out1).read() == golden == open(out2).read()

    def test_no_expressions_errors(self, spark, tmp_path):
        assert main(["tags-filter", f"{REF}/tags-filter/input.osm",
                     "-o", str(tmp_path / "x.osm")], spark=spark) == 2


class TestSmallOptionParity:
    """Round-3 option-surface sweep: --default-type, getid -t,
    getparents id files, diff --ignore-changeset/--ignore-user/-t,
    derive-changes --update-timestamp, check-refs --show-ids,
    query-locations-index -n/--dump, create-locations-index --update."""

    def test_default_type_way(self, spark, tmp_path):
        out = str(tmp_path / "o.opl")
        rc = main(["getid", "--default-type", "way", f"{REF}/getid/input.osm",
                   "20", "-o", out], spark=spark)
        assert rc == 0
        text = open(out).read() if not pathlib.Path(out).is_dir() else "".join(
            p.read_text() for p in sorted(pathlib.Path(out).glob("part-*")))
        assert text.startswith("w20 ")

    def test_getid_remove_tags(self, spark, tmp_path):
        out = str(tmp_path / "o.opl")
        rc = main(["getid", "-r", "-t", f"{REF}/getid/input.osm",
                   "w21", "r30", "-o", out], spark=spark)
        assert rc == 0
        text = open(out).read() if not pathlib.Path(out).is_dir() else "".join(
            p.read_text() for p in sorted(pathlib.Path(out).glob("part-*")))
        lines = text.splitlines()
        # requested w21 keeps xyz=abc; pulled-in w20 loses foo=bar
        for ln in lines:
            fields = ln.split(" ")
            tag_field = next(f for f in fields if f.startswith("T"))
            if ln.startswith("w21"):
                assert tag_field == "Txyz=abc"
            else:
                assert tag_field == "T", ln

    def test_getparents_id_file(self, spark, tmp_path):
        idf = tmp_path / "ids.txt"
        idf.write_text("n10\n")
        out1, out2 = str(tmp_path / "a.osm"), str(tmp_path / "b.osm")
        argv = ["--generator", "test", *UPLOAD, "getparents",
                f"{REF}/getparents/input.osm"]
        assert main([*argv, "n10", "-o", out1], spark=spark) == 0
        assert main([*argv, "-i", str(idf), "-o", out2], spark=spark) == 0
        assert open(out1).read() == open(out2).read()

    def test_diff_ignore_user_changeset(self, spark, tmp_path):
        # inputs differing only in uid/user/changeset compare equal
        # when all three are ignored
        rc = main(["diff", "-q", "--ignore-uid", "--ignore-user",
                   "--ignore-changeset",
                   f"{REF}/diff/input1.osm", f"{REF}/diff/input2.osm"],
                  spark=spark)
        assert rc in (0, 1)  # just exercises the flags end-to-end

    def test_derive_changes_update_timestamp(self, spark, tmp_path):
        import time as _t

        out = str(tmp_path / "ch.osc")
        rc = main(["--generator", "test", "derive-changes", "--update-timestamp",
                   f"{REF}/derive-changes/input1.osm",
                   f"{REF}/derive-changes/input2.osm", "-o", out], spark=spark)
        assert rc == 0
        xml = open(out).read()
        year = _t.strftime("%Y", _t.gmtime())
        assert "<delete>" in xml and f'timestamp="{year}-' in xml

    def test_check_refs_show_ids(self, spark, capsys):
        rc = main(["check-refs", "-i", f"{REF}/check-refs/fail-n-in-w.osm"],
                  spark=spark)
        assert rc == 1
        outp = capsys.readouterr().out
        assert "in w" in outp

    def test_locations_index_node_id_dump_update(self, spark, tmp_path, capsys):
        idx = str(tmp_path / "idx")
        src = f"{REF}/getid/input.osm"
        assert main(["create-locations-index", src, "-i", idx], spark=spark) == 0
        assert main(["query-locations-index", "-i", idx, "-n", "10"],
                    spark=spark) == 0
        assert capsys.readouterr().out.startswith("10 ")
        assert main(["query-locations-index", "-i", idx, "--dump"],
                    spark=spark) == 0
        assert len(capsys.readouterr().out.splitlines()) > 1
        # --update with the same input is a no-op merge
        assert main(["create-locations-index", "-u", src, "-i", idx],
                    spark=spark) == 0
        assert main(["query-locations-index", "-i", idx, "-n", "10"],
                    spark=spark) == 0
        assert capsys.readouterr().out.startswith("10 ")


class TestInfoFlags:
    """-C/--print-default-config (byte parity with
    command_export.cpp:296-316), -I/--show-index-types, fileinfo -t,
    renumber --show-index."""

    def test_print_default_config(self, capsys):
        assert main(["export", "-C"]) == 0
        out = capsys.readouterr().out
        assert out.startswith('{\n    "attributes"') and out.endswith("}\n")
        assert '"way_nodes": false' in out

    def test_show_index_types(self, capsys):
        assert main(["add-locations-to-ways", "-I"]) == 0
        assert "none" in capsys.readouterr().out

    def test_fileinfo_object_type(self, spark, capsys):
        rc = main(["fileinfo", "-g", "data.count.nodes", "-t", "way",
                   f"{REF}/getid/input.osm"], spark=spark)
        assert rc == 0
        assert capsys.readouterr().out.strip() == "0"

    def test_renumber_show_index(self, spark, tmp_path, capsys):
        idx = str(tmp_path / "idx")
        out = str(tmp_path / "o.osm")
        rc = main(["--generator", "test", "renumber", "--index-dir", idx,
                   f"{REF}/renumber/input-sorted.osm", "-o", out], spark=spark)
        assert rc == 0
        capsys.readouterr()
        rc = main(["renumber", f"--show-index=node", "--index-dir", idx],
                  spark=spark)
        assert rc == 0
        lines = capsys.readouterr().out.splitlines()
        assert lines and all(" -> " in ln for ln in lines)
        assert main(["renumber", "--show-index=x", "--index-dir", idx],
                    spark=spark) == 2


class TestExtractConfigStdout:
    """The reference's own config.json uses "output": "-" (stdout):
    running it byte-matches output-simple.osm on stdout."""

    def test_reference_config_json(self, spark, capsys):
        ref = "/root/reference/test/extract"
        rc = main(["--generator", "test", "extract", "-s", "simple",
                   "--output-header", "xml_josm_upload=false",
                   "-c", f"{ref}/config.json", f"{ref}/input1.osm"],
                  spark=spark)
        assert rc == 0
        assert capsys.readouterr().out == open(f"{ref}/output-simple.osm").read()
