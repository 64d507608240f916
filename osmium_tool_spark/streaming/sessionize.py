"""Stateful streaming sessionization via applyInPandasWithState.

The custom-stateful-operator slot of the streaming surface (the CDC
reader, snapshot upsert, dedup-on-arrival ingest and watermarked tile
rollup cover the built-in operator shapes; this one needs true per-key
state): group an event stream by key and emit one row per SESSION — a
maximal run of events with no gap larger than `gap` — when the
watermark proves the session can no longer grow.

Semantics (the canonical web-analytics sessionizer):

  - state per key: (session_start, last_ts, n_events)
  - an arriving event extends the open session if ts <= last_ts + gap,
    else the old session is emitted immediately and a new one opens;
  - the open session is emitted when the EVENT-TIME TIMEOUT fires —
    i.e. when the stream's watermark passes last_ts + gap, which is
    exactly the proof that no in-order event can extend it. Late events
    beyond the watermark are dropped by the upstream withWatermark.

Scale shape: state lives in the state store partitioned by key (RocksDB
/ HDFS-backed on a cluster); each micro-batch shuffles only that
batch's events on the key — state never reshuffles. The pandas variant
processes each key's batch as one Arrow frame (no per-row Python
dispatch beyond the per-key call).

Timestamps are epoch MICROSECONDS (the engine's canonical ts unit).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start", LongType()),  # epoch micros
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_start", LongType()),
        StructField("last_ts", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "0 seconds",
) -> DataFrame:
    """events (streaming) -> one row per closed session
    (key, session_start, session_end, n_events).

    `ts_col` must be a timestamp column (event time); `watermark` is the
    allowed lateness passed to withWatermark — late events beyond it are
    dropped, which is what makes the event-time timeout a sound proof of
    session closure.
    """
    gap_us = int(gap_seconds) * 1_000_000

    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_start": [start],
                    "session_end": [last],
                    "n_events": [n],
                }
            )
            return

        ts = (
            pd.concat([p["__ts_us"] for p in pdfs])
            .sort_values(kind="mergesort")
            .to_numpy()
        )
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = int(ts[0]), int(ts[0]) - 1, 0

        closed = {"key": [], "session_start": [], "session_end": [], "n_events": []}
        for t in ts:
            t = int(t)
            if n > 0 and t > last + gap_us:
                closed["key"].append(key[0])
                closed["session_start"].append(start)
                closed["session_end"].append(last)
                closed["n_events"].append(n)
                start, n = t, 0
            if n == 0:
                start = min(start, t)
            last = max(last, t)
            n += 1

        state.update((start, last, n))
        # close the open session once the watermark passes last + gap
        state.setTimeoutTimestamp((last + gap_us) // 1000 + 1)
        if closed["key"]:
            yield pd.DataFrame(closed)

    ts = F.col(ts_col).cast("timestamp")  # accept TIMESTAMP_NTZ inputs too
    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        ts.alias("__ts_ev"),
        F.unix_micros(ts).alias("__ts_us"),
    ).withWatermark("__ts_ev", watermark)

    return keyed.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
