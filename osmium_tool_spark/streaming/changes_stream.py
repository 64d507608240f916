"""Structured Streaming surface: change files as a CDC stream.

The reference's incremental model is batch change files (.osc) applied
with latest-version-wins semantics (/root/reference/src/
command_apply_changes.cpp:339-369; man/osmium-file-formats.md:28-32).
Spark-first, that becomes:

  change dir (append-only parquet)  --readStream-->  micro-batches
      --foreachBatch-->  latest-wins MERGE into the snapshot table

Plus a streaming tile rollup (windowed aggregation with a watermark) for
the continuously-ingested image table — the incremental form of the
tile-assign stage. On Iceberg the foreachBatch body is a MERGE INTO;
here the snapshot is a versioned parquet directory (same semantics,
driver-visible versions double as checkpoints).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_change_stream(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """Change batches as a file stream (each file = one .osc analog)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


class SnapshotStore:
    """Versioned parquet snapshot with latest-wins upsert — the
    Iceberg-MERGE stand-in. Each version is immutable; `current` points at
    the newest complete one (checkpoint/resume = re-open `current`)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _meta_path(self) -> str:
        return os.path.join(self.root, "current.json")

    def current_version(self) -> int:
        if not os.path.exists(self._meta_path()):
            return -1
        with open(self._meta_path()) as f:
            return json.load(f)["version"]

    def read(self, spark: SparkSession) -> DataFrame | None:
        v = self.current_version()
        if v < 0:
            return None
        return spark.read.parquet(os.path.join(self.root, f"v{v}"))

    def write(self, df: DataFrame) -> int:
        v = self.current_version() + 1
        df.write.mode("overwrite").parquet(os.path.join(self.root, f"v{v}"))
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": v}, f)
        os.replace(tmp, self._meta_path())  # atomic pointer flip
        return v


def apply_changes_stream(
    changes: DataFrame,
    store: SnapshotStore,
    checkpoint_dir: str,
):
    """Latest-wins CDC apply as a streaming query.

    Every micro-batch runs the SAME windowed dedup as the batch operator
    (operators/changes.apply_changes): per (type,id) the highest
    (version, batch order) wins, deletes drop rows. foreachBatch gives
    exactly-once via the checkpoint + idempotent snapshot versioning."""
    from ..operators.changes import apply_changes

    def process(batch_df: DataFrame, batch_id: int):
        spark = batch_df.sparkSession
        base = store.read(spark)
        if base is None:
            base = batch_df.limit(0)
        merged = apply_changes(base, [batch_df])
        store.write(merged)

    return (
        changes.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def stream_tile_counts(
    nodes: DataFrame, res: int = 8, watermark: str = "10 minutes", window: str = "1 minute"
) -> DataFrame:
    """Streaming tile rollup: event-time windowed counts per cell.

    `nodes` must carry an event-time column `ts_ev` (timestamp); late rows
    beyond the watermark are dropped — the incremental tile-assign stage
    for a continuously ingested image table."""
    from ..functions.cells import cell_id

    return (
        nodes.withWatermark("ts_ev", watermark)
        .withColumn("cell", cell_id(F.col("lon"), F.col("lat"), res))
        .groupBy(F.window("ts_ev", window), F.col("cell"))
        .agg(F.count("*").alias("n"))
    )
