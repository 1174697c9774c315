"""Structured Streaming parity: the streaming hourly aggregation must
equal the batch events_hourly result (modulo column naming)."""

from __future__ import annotations

from conftest import SF_DIR
from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY
from uni_mannheim_masters_thesis_spark.streaming.events import (
    streaming_hourly_event_stats,
)


def test_streaming_equals_batch(spark):
    stream_rows = {
        (r.hour_start_us, r.event_type): (r.n_events, r.sum_value)
        for r in streaming_hourly_event_stats(spark, SF_DIR).collect()
    }
    batch_rows = {
        (r.hour_start_us, r.event_type): (r.n_events, r.sum_value)
        for r in REGISTRY["events_hourly"].fn(spark, SF_DIR).collect()
    }
    assert stream_rows == batch_rows
