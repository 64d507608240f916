"""Stateful streaming sessionization (applyInPandasWithState).

Drives the operator as an ACTUAL streaming query (file source, one file
per micro-batch, memory sink) and checks both closure paths: a gap
inside one batch closes a session immediately; the event-time timeout
closes a session once the watermark passes last_ts + gap.
"""

import os
import shutil

from pyspark.sql import functions as F


def _write_batch(spark, src: str, idx: int, rows):
    d = f"{src}/b{idx}"
    spark.createDataFrame(rows, "user_id string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).coalesce(1).write.parquet(d)
    for fn in os.listdir(d):
        if fn.endswith(".parquet"):
            dst = f"{src}/{idx:03d}.parquet"
            shutil.move(f"{d}/{fn}", dst)
            # file-source ordering follows modification time: make it explicit
            os.utime(dst, (1700000000 + idx, 1700000000 + idx))
    shutil.rmtree(d)


def test_sessionize_in_batch_and_timeout_closure(spark, tmp_path):
    from osmium_tool_spark.streaming.sessionize import sessionize

    src = str(tmp_path / "events_stream")
    os.makedirs(src)
    # batch 0: A has a 2-event session, then a >gap jump (in-batch closure);
    # B opens a 1-event session
    _write_batch(spark, src, 0, [
        ("A", "2024-01-01 00:00:00"),
        ("A", "2024-01-01 00:00:10"),
        ("A", "2024-01-01 00:20:00"),
        ("B", "2024-01-01 00:00:05"),
    ])
    # batch 1: far-future event advances the watermark past B's gap
    _write_batch(spark, src, 1, [("C", "2024-01-01 02:00:00")])
    # batch 2: even later event; A's second session times out
    _write_batch(spark, src, 2, [("D", "2024-01-01 03:00:00")])

    stream = spark.readStream.schema("user_id string, ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = sessionize(stream, gap_seconds=60, key_col="user_id", ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT key, session_start, session_end, n_events FROM sessions_stream"
    ).collect()
    got = {(r.key, r.session_start, r.session_end, r.n_events) for r in rows}

    def us(s):
        import datetime

        return int(
            datetime.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
            .replace(tzinfo=datetime.timezone.utc)
            .timestamp()
            * 1_000_000
        )

    # A's first session closed IN-BATCH by the 20-minute jump; B, A's
    # second session and C closed by event-time TIMEOUT (the final
    # watermark 03:00 passes C's 02:01 deadline in the wrap-up batch);
    # D stays open — its 03:01 deadline is beyond the final watermark.
    expected = {
        ("A", us("2024-01-01 00:00:00"), us("2024-01-01 00:00:10"), 2),
        ("B", us("2024-01-01 00:00:05"), us("2024-01-01 00:00:05"), 1),
        ("A", us("2024-01-01 00:20:00"), us("2024-01-01 00:20:00"), 1),
        ("C", us("2024-01-01 02:00:00"), us("2024-01-01 02:00:00"), 1),
    }
    assert got == expected


def test_sessionize_merges_within_gap_across_batches(spark, tmp_path):
    """Events for the same key arriving in different micro-batches within
    the gap merge into ONE session (state carries across batches)."""
    from osmium_tool_spark.streaming.sessionize import sessionize

    src = str(tmp_path / "events_stream2")
    os.makedirs(src)
    _write_batch(spark, src, 0, [("A", "2024-01-01 00:00:00")])
    _write_batch(spark, src, 1, [("A", "2024-01-01 00:00:30")])
    _write_batch(spark, src, 2, [("Z", "2024-01-01 05:00:00")])
    _write_batch(spark, src, 3, [("Z", "2024-01-01 06:00:00")])

    stream = spark.readStream.schema("user_id string, ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = sessionize(stream, gap_seconds=60, key_col="user_id", ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_stream2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT key, n_events FROM sessions_stream2 WHERE key = 'A'"
    ).collect()
    assert [(r.key, r.n_events) for r in rows] == [("A", 2)]


def test_streaming_matches_batch_on_testdata(spark, tmp_path):
    """The stateful streaming sessionizer and the windowed batch twin
    produce IDENTICAL session rows on the same input, once every session
    is closed (a far-future sentinel per key advances the watermark past
    every real session's deadline; sentinel sessions are dropped)."""
    from tests.conftest import SF_DIR
    from osmium_tool_spark.operators.sessions import sessionize_batch
    from osmium_tool_spark.streaming.sessionize import sessionize

    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts")
        .filter(F.col("user_id") % 17 == 0)  # keep the stream small
    )
    batch = {
        (r.key, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(events, gap_seconds=300).collect()
    }

    src = str(tmp_path / "ev"); os.makedirs(src)
    events.coalesce(1).write.parquet(src + "/b")
    for fn in os.listdir(src + "/b"):
        if fn.endswith(".parquet"):
            shutil.move(f"{src}/b/{fn}", f"{src}/000.parquet")
            os.utime(f"{src}/000.parquet", (1700000000, 1700000000))
    shutil.rmtree(src + "/b")
    sentinel = events.groupBy("user_id").agg(
        (F.max("ts") + F.expr("INTERVAL 10 DAYS")).alias("ts")
    )
    sentinel.coalesce(1).write.parquet(src + "/b2")
    for fn in os.listdir(src + "/b2"):
        if fn.endswith(".parquet"):
            shutil.move(f"{src}/b2/{fn}", f"{src}/001.parquet")
            os.utime(f"{src}/001.parquet", (1700000001, 1700000001))
    shutil.rmtree(src + "/b2")

    stream = spark.readStream.schema("user_id long, ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = sessionize(stream, gap_seconds=300, key_col="user_id", ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {
        (r.key, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sessions_parity").collect()
        if r.n_events > 0
    }
    # drop the sentinel singletons (one per key, 10 days after the last event)
    sent_us = {
        (str(r.user_id), r.us)
        for r in sentinel.select(
            "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
        ).collect()
    }
    streamed = {s for s in streamed if (s[0], s[1]) not in sent_us}
    assert streamed == batch
