"""Batch sessionization — the SQL-expressible twin of
streaming/sessionize.py (same session semantics, one batch plan).

A session is a maximal run of a key's events with no gap > `gap`
between consecutive events. The batch form is the classic two-window
composition:

  1. lag(ts) over (key ORDER BY ts)      -> gap to previous event
  2. running SUM of (gap > threshold)    -> session ordinal per key
  3. groupBy(key, ordinal)               -> start / end / count

Scale shape: both windows partition by the key — Spark plans ONE hash
exchange on key reused by both windows and the final aggregate (no
extra shuffle; the aggregate is partial-combined). Skewed keys (one
user with millions of events) serialize within their partition like any
keyed window; the streaming variant has the same per-key contract.

The streaming operator is the arrival-time/stateful form of exactly
this computation; tests pin that both produce identical session rows on
the same input (streaming emits only watermark-closed sessions — the
batch form sees the whole input, so the parity check closes every
session by appending a far-future sentinel per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(key, session_start, session_end, n_events), epoch-microsecond
    bounds — identical schema and semantics to streaming sessionize."""
    gap_us = int(gap_seconds) * 1_000_000
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))

    w = Window.partitionBy("key").orderBy("__ts_us")
    marked = (
        events.select(F.col(key_col).cast("string").alias("key"), ts_us.alias("__ts_us"))
        .withColumn("__prev", F.lag("__ts_us").over(w))
        .withColumn(
            "__new",
            (F.col("__prev").isNull() | (F.col("__ts_us") - F.col("__prev") > gap_us)).cast("long"),
        )
        .withColumn("__sess", F.sum("__new").over(w))
    )
    return marked.groupBy("key", "__sess").agg(
        F.min("__ts_us").alias("session_start"),
        F.max("__ts_us").alias("session_end"),
        F.count("*").alias("n_events"),
    ).select("key", "session_start", "session_end", "n_events")
