"""MERGE INTO over the snapshot table (sources/snapshots.py
SnapshotTable.merge_into) — Iceberg-model copy-on-write MERGE:
matched UPDATE / matched DELETE / unmatched INSERT, the SQL-standard
source-cardinality guard, and time travel across a merge commit."""

import tempfile

import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.sources.snapshots import SnapshotTable


def _table(spark, rows):
    t = SnapshotTable(tempfile.mkdtemp(prefix="mergetest-"))
    t.append(spark, spark.createDataFrame(rows, "k long, v string"))
    return t


def _state(t, spark):
    return {
        (r.k, r.v) for r in t.read(spark).collect()
    }


def test_update_and_insert(spark):
    t = _table(spark, [(1, "a"), (2, "b"), (3, "c")])
    src = spark.createDataFrame([(2, "B"), (9, "I")], "k long, v string")
    t.merge_into(spark, src, on="k")
    assert _state(t, spark) == {(1, "a"), (2, "B"), (3, "c"), (9, "I")}


def test_update_only_no_insert(spark):
    t = _table(spark, [(1, "a"), (2, "b")])
    src = spark.createDataFrame([(2, "B"), (9, "I")], "k long, v string")
    t.merge_into(spark, src, on="k", insert_not_matched=False)
    assert _state(t, spark) == {(1, "a"), (2, "B")}


def test_delete_matched(spark):
    t = _table(spark, [(1, "a"), (2, "b"), (3, "c")])
    src = spark.createDataFrame([(2, "x"), (9, "I")], "k long, v string")
    t.merge_into(spark, src, on="k", when_matched="delete")
    assert _state(t, spark) == {(1, "a"), (3, "c"), (9, "I")}


def test_delete_matched_no_insert(spark):
    t = _table(spark, [(1, "a"), (2, "b")])
    src = spark.createDataFrame([(2, "x"), (9, "I")], "k long, v string")
    t.merge_into(spark, src, on="k", when_matched="delete",
                 insert_not_matched=False)
    assert _state(t, spark) == {(1, "a")}


def test_composite_key(spark):
    t = SnapshotTable(tempfile.mkdtemp(prefix="mergetest-"))
    t.append(spark, spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b")], "k1 long, k2 long, v string"))
    src = spark.createDataFrame([(1, 2, "B"), (2, 1, "I")],
                                "k1 long, k2 long, v string")
    t.merge_into(spark, src, on=["k1", "k2"])
    got = {(r.k1, r.k2, r.v) for r in t.read(spark).collect()}
    assert got == {(1, 1, "a"), (1, 2, "B"), (2, 1, "I")}


def test_duplicate_source_keys_raise(spark):
    t = _table(spark, [(1, "a")])
    src = spark.createDataFrame([(2, "x"), (2, "y")], "k long, v string")
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge_into(spark, src, on="k")
    # nothing committed: table still at snapshot 1
    assert t.current_id() == 1


def test_schema_mismatch_raises(spark):
    t = _table(spark, [(1, "a")])
    src = spark.createDataFrame([(2, 5)], "k long, other long")
    with pytest.raises(ValueError, match="columns"):
        t.merge_into(spark, src, on="k")


def test_bad_args(spark):
    t = _table(spark, [(1, "a")])
    src = spark.createDataFrame([(2, "x")], "k long, v string")
    with pytest.raises(ValueError, match="empty key"):
        t.merge_into(spark, src, on=[])
    with pytest.raises(ValueError, match="update|delete"):
        t.merge_into(spark, src, on="k", when_matched="upsert")


def test_time_travel_across_merge(spark):
    t = _table(spark, [(1, "a"), (2, "b")])
    pre = t.current_id()
    src = spark.createDataFrame([(2, "B")], "k long, v string")
    sid = t.merge_into(spark, src, on="k")
    assert sid == pre + 1
    assert t.manifest(sid)["operation"] == "merge"
    # old snapshot unchanged, new one merged
    old = {(r.k, r.v) for r in t.read(spark, snapshot_id=pre).collect()}
    assert old == {(1, "a"), (2, "b")}
    assert _state(t, spark) == {(1, "a"), (2, "B")}


def test_column_order_differs(spark):
    """Source column ORDER may differ; names must match."""
    t = _table(spark, [(1, "a")])
    src = spark.createDataFrame([("B", 1)], "v string, k long")
    t.merge_into(spark, src, on="k")
    assert _state(t, spark) == {(1, "B")}
