"""Streaming image ingest: dedup-on-arrival into the standing table.

The batch engine dedups the corpus after the fact (operators/dedup.py);
a production 10^12-image table is APPENDED to continuously, and the
cheap win is rejecting duplicates at the door. Spark-first shape:

  landing dir (append-only parquet of image batches)
      --readStream (maxFilesPerTrigger)-->  micro-batches
      --foreachBatch-->
          1. intra-batch exact dedup (first-by-image_id per phash key)
          2. anti-join against the standing table's phash key set
          3. append survivors to the standing table + cell-count metrics

The standing-table membership probe is an anti-join against ONLY the key
column (phash) — column-pruned scan of the standing table, broadcast
when the landing batch is small (AQE decides). On Iceberg this is
`MERGE INTO ... WHEN NOT MATCHED THEN INSERT`; here the standing table
is an append-only parquet dir + a per-batch metrics journal, which makes
the stream resumable: Structured Streaming's checkpoint replays an
uncommitted batch, and the phash anti-join makes the replayed insert a
no-op (idempotent upsert — the exactly-once trick).

Exact-key dedup only: near-dup (hamming/LSH) on arrival would need the
banded index maintained incrementally — that is the batch engine's job
(dedup.phash_near_dup_pairs on a schedule), not the ingest hot path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class ImageIngest:
    """Dedup-on-arrival ingest into an append-only standing image table.

    ``key`` is the exact-duplicate key column (default phash — the
    decoded-content fingerprint, so re-encoded byte-identical uploads
    dedup too). Metrics (per batch: arrived / intra-batch dups /
    already-present / appended) are journaled to ``metrics.jsonl`` in the
    table dir — the lineage analog of plans/checkpointed."""

    def __init__(self, table_dir: str, key: str = "phash"):
        self.table_dir = table_dir
        self.key = key
        os.makedirs(table_dir, exist_ok=True)
        self.data_dir = os.path.join(table_dir, "data")
        self.metrics_path = os.path.join(table_dir, "metrics.jsonl")

    def standing(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.isdir(self.data_dir) or not any(
            f.endswith(".parquet") for _, _, fs in os.walk(self.data_dir) for f in fs
        ):
            return None
        return spark.read.parquet(self.data_dir)

    def ingest_batch(self, batch_df: DataFrame, batch_id: int) -> dict:
        """foreachBatch body — also callable directly for batch backfill."""
        spark = batch_df.sparkSession
        k = self.key
        arrived = batch_df.count()
        # 1. intra-batch exact dedup, deterministic keeper (min image_id)
        deduped = (
            batch_df.withColumn(
                "__rk",
                F.row_number().over(
                    Window.partitionBy(k).orderBy(F.col("image_id"))
                ),
            )
            .filter(F.col("__rk") == 1)
            .drop("__rk")
        )
        # 2. membership probe: anti-join against the standing key set only
        standing = self.standing(spark)
        if standing is not None:
            fresh = deduped.join(
                standing.select(k).distinct(), on=k, how="left_anti"
            )
        else:
            fresh = deduped
        fresh = fresh.persist()
        appended = fresh.count()
        # 3. append survivors
        if appended:
            fresh.write.mode("append").parquet(self.data_dir)
        intra_dups = arrived - deduped.count()
        metrics = {
            "batch_id": batch_id,
            "arrived": arrived,
            "intra_batch_dups": intra_dups,
            "already_present": arrived - intra_dups - appended,
            "appended": appended,
        }
        fresh.unpersist()
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(metrics) + "\n")
        return metrics

    def metrics(self) -> list[dict]:
        if not os.path.exists(self.metrics_path):
            return []
        with open(self.metrics_path) as f:
            return [json.loads(line) for line in f if line.strip()]


def ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    table_dir: str,
    schema,
    checkpoint_dir: str,
    key: str = "phash",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Wire the landing dir to an ImageIngest via Structured Streaming.
    Returns the StreamingQuery; with ``available_now`` the query drains
    the current landing content and stops (batch-test / catch-up mode),
    otherwise it runs continuously."""
    ingest = ImageIngest(table_dir, key=key)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: ingest.ingest_batch(df, bid) and None
        )
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
