"""Streaming image ingest: dedup-on-arrival, metrics, idempotent replay."""

import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.schema import IMAGE_SCHEMA
from osmium_tool_spark.streaming.image_ingest import ImageIngest, ingest_stream


def mk_batch(spark, ids_and_phash):
    rows = [
        (f"img{i}", None, 64, 64, "png", f"caption {i}", p) for i, p in ids_and_phash
    ]
    return spark.createDataFrame(rows, IMAGE_SCHEMA)


def test_ingest_batch_dedups_and_appends(spark, tmp_path):
    ing = ImageIngest(str(tmp_path / "tbl"))
    m1 = ing.ingest_batch(mk_batch(spark, [(1, 10), (2, 20), (3, 10)]), 0)
    # phash 10 duplicated within the batch -> one survivor
    assert m1 == {
        "batch_id": 0, "arrived": 3, "intra_batch_dups": 1,
        "already_present": 0, "appended": 2,
    }
    # second batch: one already-present key, one new
    m2 = ing.ingest_batch(mk_batch(spark, [(4, 20), (5, 30)]), 1)
    assert m2["already_present"] == 1 and m2["appended"] == 1
    standing = ing.standing(spark)
    assert standing.count() == 3
    # deterministic keeper: min image_id wins the intra-batch tie
    keep = {r["phash"]: r["image_id"] for r in standing.collect()}
    assert keep[10] == "img1"


def test_ingest_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (checkpoint recovery) must be a no-op."""
    ing = ImageIngest(str(tmp_path / "tbl"))
    batch = mk_batch(spark, [(1, 10), (2, 20)])
    ing.ingest_batch(batch, 0)
    m = ing.ingest_batch(batch, 0)  # replay
    assert m["appended"] == 0 and m["already_present"] == 2
    assert ing.standing(spark).count() == 2


def test_ingest_metrics_journal(spark, tmp_path):
    ing = ImageIngest(str(tmp_path / "tbl"))
    ing.ingest_batch(mk_batch(spark, [(1, 10)]), 0)
    ing.ingest_batch(mk_batch(spark, [(2, 20)]), 1)
    ms = ing.metrics()
    assert [m["batch_id"] for m in ms] == [0, 1]
    assert sum(m["appended"] for m in ms) == 2


def test_ingest_stream_availablenow(spark, tmp_path):
    """End-to-end through Structured Streaming: two landing files drain
    into the standing table with cross-batch dedup."""
    landing = str(tmp_path / "landing")
    mk_batch(spark, [(1, 10), (2, 20)]).coalesce(1).write.mode("append").parquet(landing)
    mk_batch(spark, [(3, 20), (4, 30)]).coalesce(1).write.mode("append").parquet(landing)
    q = ingest_stream(
        spark, landing, str(tmp_path / "tbl"), IMAGE_SCHEMA,
        checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    ing = ImageIngest(str(tmp_path / "tbl"))
    standing = ing.standing(spark)
    assert standing is not None
    got = sorted(r["phash"] for r in standing.collect())
    assert got == [10, 20, 30]  # phash 20 arrived twice across batches
    assert sum(m["already_present"] + m["intra_batch_dups"] for m in ing.metrics()) == 1


def test_ingest_stream_resume_no_duplicates(spark, tmp_path):
    """New landing data after a restart is picked up; old batches are not
    re-applied (checkpoint) and would be no-ops anyway (anti-join)."""
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    tbl = str(tmp_path / "tbl")
    mk_batch(spark, [(1, 10)]).coalesce(1).write.mode("append").parquet(landing)
    q = ingest_stream(spark, landing, tbl, IMAGE_SCHEMA, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    mk_batch(spark, [(2, 10), (3, 40)]).coalesce(1).write.mode("append").parquet(landing)
    q = ingest_stream(spark, landing, tbl, IMAGE_SCHEMA, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    standing = ImageIngest(tbl).standing(spark)
    assert sorted(r["phash"] for r in standing.collect()) == [10, 40]
