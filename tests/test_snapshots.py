"""Snapshot-table layer (sources/snapshots.py): append/overwrite
commits, time travel, rollback-as-snapshot, atomic current pointer,
expiry GC, and the CheckpointedPipeline metrics-table integration."""

import json
import os

import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.sources.snapshots import SnapshotTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("d"), F.col("id")).alias("text")
    )


class TestSnapshots:
    def test_append_and_time_travel(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        s1 = t.append(spark, _df(spark, 0, 10))
        s2 = t.append(spark, _df(spark, 10, 25))
        assert (s1, s2) == (1, 2)
        assert t.current_id() == 2
        assert t.read(spark).count() == 25
        assert t.read(spark, snapshot_id=1).count() == 10
        assert {r.doc_id for r in t.read(spark, 1).collect()} == set(range(10))
        m = t.manifest(2)
        assert m["operation"] == "append"
        assert m["added_rows"] == 15 and m["parent_id"] == 1

    def test_overwrite_keeps_old_snapshot_readable(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.append(spark, _df(spark, 0, 10))
        t.overwrite(spark, _df(spark, 100, 103))
        assert t.read(spark).count() == 3
        assert t.read(spark, 1).count() == 10

    def test_rollback_is_a_new_snapshot(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.append(spark, _df(spark, 0, 10))
        t.append(spark, _df(spark, 10, 20))
        s3 = t.rollback(spark, 1)
        assert s3 == 3 and t.current_id() == 3
        assert t.read(spark).count() == 10
        # history is append-only; snapshot 2 still time-travels
        assert t.read(spark, 2).count() == 20
        assert t.manifest(3)["rolled_back_to"] == 1
        # a new instance on the same root sees identical state
        t2 = SnapshotTable(t.root)
        assert t2.snapshot_ids() == [1, 2, 3]
        assert t2.read(spark).count() == 10

    def test_immutable_files_shared_across_snapshots(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.append(spark, _df(spark, 0, 10))
        f1 = set(t.manifest(1)["files"])
        t.append(spark, _df(spark, 10, 20))
        f2 = set(t.manifest(2)["files"])
        assert f1 < f2  # append inherits, never rewrites

    def test_expire_gc_keeps_inherited_files(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.append(spark, _df(spark, 0, 10))
        t.overwrite(spark, _df(spark, 50, 60))  # snap1's files now orphaned
        t.append(spark, _df(spark, 60, 70))  # snap3 inherits snap2's files
        expired = t.expire(keep_last=1)
        assert expired == [1, 2]
        assert t.snapshot_ids() == [3]
        # snap3 still fully readable: snap2's files were inherited -> live
        assert t.read(spark).count() == 20
        # snap1's files are gone from disk
        gone = [
            p for p in (os.path.join(t.root, "data", "snap-00000001"),)
            if os.path.isdir(p)
        ]
        assert gone == []
        with pytest.raises(ValueError):
            t.manifest(1)

    def test_atomic_pointer_and_empty_table(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        assert t.current_id() is None
        with pytest.raises(ValueError):
            t.read(spark)
        t.append(spark, _df(spark, 0, 3))
        # pointer is a bare int, swung by rename (no .tmp left behind)
        assert open(t._current_file()).read().strip() == "1"
        assert not os.path.exists(t._current_file() + ".tmp")
        with pytest.raises(ValueError):
            t.expire(keep_last=0)

    def test_schema_recorded_and_used(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.append(spark, _df(spark, 0, 5))
        man = t.manifest()
        names = [f["name"] for f in man["schema"]["fields"]]
        assert names == ["doc_id", "text"]


class TestPipelineMetricsTable:
    def test_metrics_persisted_as_snapshots(self, spark, tmp_path):
        from osmium_tool_spark.plans.checkpointed import CheckpointedPipeline

        mt = SnapshotTable(str(tmp_path / "metrics"))
        pipe = CheckpointedPipeline(str(tmp_path / "run"), metrics_table=mt)

        @pipe.stage("load")
        def load(spark_, prev):
            return _df(spark_, 0, 100)

        @pipe.stage("filter")
        def filt(spark_, prev):
            return prev.filter(F.col("doc_id") % 2 == 0)

        out = pipe.run(spark)
        assert out.count() == 50
        hist = mt.read(spark).orderBy("stage").collect()
        assert [r.stage for r in hist] == ["filter", "load"]
        filt_row = [r for r in hist if r.stage == "filter"][0]
        assert filt_row.rows_in == 100 and filt_row.rows_out == 50
        assert sum(filt_row.partition_rows) == 50
        # each stage appended one snapshot, each tagged with its stage
        assert len(mt.snapshot_ids()) == 2
        assert mt.manifest(1)["stage"] == "load"

        # resume: nothing re-runs, no new metrics snapshots
        pipe2 = CheckpointedPipeline(str(tmp_path / "run"), metrics_table=mt)

        @pipe2.stage("load")
        def load2(spark_, prev):
            raise AssertionError("must not re-run")

        @pipe2.stage("filter")
        def filt2(spark_, prev):
            raise AssertionError("must not re-run")

        assert pipe2.run(spark).count() == 50
        assert len(mt.snapshot_ids()) == 2

        # force_from re-runs the suffix and appends fresh metrics
        pipe3 = CheckpointedPipeline(str(tmp_path / "run"), metrics_table=mt)

        @pipe3.stage("load")
        def load3(spark_, prev):
            raise AssertionError("must not re-run")

        @pipe3.stage("filter")
        def filt3(spark_, prev):
            return prev.filter(F.col("doc_id") % 4 == 0)

        assert pipe3.run(spark, force_from="filter").count() == 25
        assert len(mt.snapshot_ids()) == 3
        latest = mt.read(spark)
        assert latest.filter(F.col("rows_out") == 25).count() == 1

    def test_lineage_jsonl_still_written(self, spark, tmp_path):
        from osmium_tool_spark.plans.checkpointed import CheckpointedPipeline

        pipe = CheckpointedPipeline(str(tmp_path / "run2"))

        @pipe.stage("only")
        def only(spark_, prev):
            return _df(spark_, 0, 7)

        pipe.run(spark)
        lines = open(os.path.join(pipe.root, "lineage.jsonl")).read().splitlines()
        assert len(lines) == 1 and json.loads(lines[0])["rows_out"] == 7


class TestIncrementalRead:
    def test_delta_between_appends(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.append(spark, _df(spark, 0, 10))
        t.append(spark, _df(spark, 10, 25))
        t.append(spark, _df(spark, 25, 30))
        delta = t.read_incremental(spark, from_id=1, to_id=3)
        assert {r.doc_id for r in delta.collect()} == set(range(10, 30))
        assert t.read_incremental(spark, 2).count() == 5  # to current
        assert t.read_incremental(spark, 0, 1).count() == 10
        assert t.read_incremental(spark, 3, 3).count() == 0

    def test_delta_errors(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        with pytest.raises(ValueError):
            t.read_incremental(spark, 0)
        t.append(spark, _df(spark, 0, 3))
        with pytest.raises(ValueError):
            t.read_incremental(spark, 2, 1)


class TestStatsPruningAndCompact:
    def test_manifest_stats_prune_files(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"), stats_cols=["doc_id"])
        t.append(spark, _df(spark, 0, 10).coalesce(1))
        t.append(spark, _df(spark, 10, 20).coalesce(1))
        t.append(spark, _df(spark, 20, 30).coalesce(1))
        man = t.manifest()
        assert len(man["files"]) == 3
        assert all(f in man["file_stats"] for f in man["files"])
        # range inside the middle file: one file scanned
        assert len(t.scan_files(where={"doc_id": (12, 18)})) == 1
        # boundary-inclusive ranges keep both touching files
        assert len(t.scan_files(where={"doc_id": (9, 10)})) == 2
        # open-ended bounds
        assert len(t.scan_files(where={"doc_id": (None, 5)})) == 1
        assert len(t.scan_files(where={"doc_id": (25, None)})) == 1
        # result is EXACT (residual filter on surviving files)
        got = sorted(r.doc_id for r in t.read(spark, where={"doc_id": (12, 18)}).collect())
        assert got == list(range(12, 19))
        # no-match range reads empty with the right schema
        empty = t.read(spark, where={"doc_id": (100, 200)})
        assert empty.count() == 0 and empty.columns == ["doc_id", "text"]

    def test_unstatsed_files_never_pruned(self, spark, tmp_path):
        plain = SnapshotTable(str(tmp_path / "t"))  # no stats recorded
        plain.append(spark, _df(spark, 0, 10).coalesce(1))
        statted = SnapshotTable(plain.root, stats_cols=["doc_id"])
        statted.append(spark, _df(spark, 10, 20).coalesce(1))
        # file from the stats-less commit survives any range
        assert len(statted.scan_files(where={"doc_id": (1000, 2000)})) == 1
        assert statted.read(spark, where={"doc_id": (0, 5)}).count() == 6

    def test_compact(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"), stats_cols=["doc_id"])
        for lo in range(0, 40, 10):
            t.append(spark, _df(spark, lo, lo + 10).coalesce(1))
        assert len(t.manifest()["files"]) == 4
        sid = t.compact(spark, target_files=1)
        man = t.manifest(sid)
        assert len(man["files"]) == 1
        assert man["compacted_from"] == 4
        assert t.read(spark).count() == 40
        # pre-compaction snapshot still readable; stats refreshed
        assert t.read(spark, 4).count() == 40
        assert man["file_stats"][man["files"][0]]["doc_id"] == [0, 39]
        with pytest.raises(ValueError):
            t.compact(spark, target_files=0)
