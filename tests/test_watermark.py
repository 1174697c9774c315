"""Watermark semantics: in append mode, a window is emitted only after
the watermark passes its end, and events later than the watermark are
dropped — the state-eviction contract that bounds streaming state at
scale (SCALING §8)."""

from __future__ import annotations

import os
import uuid

import pyspark.sql.functions as F


def test_late_events_dropped_after_watermark(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)

    def write_batch(rows, filename):
        df = spark.createDataFrame(
            rows, "user_id long, ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("append").parquet(src)

    T = "2025-01-01 {:02d}:{:02d}:00"
    # batch A: one event at 00:30, one at 03:30 (advances event-time max)
    write_batch(
        [(1, T.format(0, 30), 1.0), (1, T.format(3, 30), 1.0)], "a"
    )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = stream.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        # batch B: a late event at 00:45 — the watermark is now
        # 03:30 - 1h = 02:30, so the [00:00, 01:00) window is closed and
        # this event must be DROPPED, not merged
        write_batch([(1, T.format(0, 45), 1.0)], "b")
        q.processAllAvailable()
        # batch C: advance once more so closed windows flush
        write_batch([(1, T.format(4, 30), 1.0)], "c")
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        r["w"]["start"].strftime("%H:%M"): r["n"]
        for r in spark.table(name).collect()
    }
    # the 00:00 window was finalized with exactly ONE event — the late
    # arrival did not reopen or increment it
    assert rows.get("00:00") == 1
