"""Structured Streaming variants of the event analytics (SURVEY §2.9/§2.11).

The reference is pure batch; this module runs the same windowed
aggregations as a stream: ``readStream`` over the events parquet,
event-time tumbling windows with a watermark for late data, memory sink
for synchronous test drives (``processAllAvailable``).

On a real cluster the source would be Kafka/files-on-arrival and the sink
a Delta/parquet append; watermark + window state lives in the state
store, partitioned by window × event_type — bounded by (windows ×
types), not input volume.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_engine_confs
from ..sources.testdata import event_stream


def streaming_hourly_event_stats(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Hourly per-type event counts/sums computed via a streaming query.

    Drives the stream to completion synchronously (memory sink) and
    returns the batch-equivalent result: one row per (hour, event_type)
    with count and 2-decimal value sum. Timestamps are emitted as epoch
    micros so results are oracle-comparable.
    """
    ensure_engine_confs(spark)
    stream = event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value_d"),
        )
    )
    name = f"hourly_events_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    out = spark.table(name)
    return out.select(
        F.unix_micros(F.col("w.start")).alias("hour_start_us"),
        "event_type",
        "n_events",
        F.round(F.col("sum_value_d").cast("double"), 2).alias("sum_value"),
    )


def streaming_events_by_segment(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-static join: the event stream enriched against the static
    customer dimension (broadcast per micro-batch), aggregated per
    market segment.

    The static side is re-read per micro-batch by Structured Streaming;
    Catalyst broadcasts it (dim-sized), so the join adds no shuffle to
    the stream. Returns [segment, n_events, sum_value] — oracle-checked
    against the equivalent batch join.
    """
    ensure_engine_confs(spark)
    stream = event_stream(spark, sf_dir)
    customers = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    joined = stream.withWatermark("ts", watermark).join(
        F.broadcast(customers), "user_id"
    )
    agg = joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value_d"),
    )
    name = f"seg_events_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.table(name).select(
        "segment",
        "n_events",
        F.round(F.col("sum_value_d").cast("double"), 2).alias("sum_value"),
    )
