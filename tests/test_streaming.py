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


def test_parquet_sink_with_checkpoint_exactly_once(spark, tmp_path):
    """Production sink path (SCALING §8): file sink + checkpoint. A
    restarted query must NOT re-emit data already committed — the
    checkpoint's file-sink log makes the append exactly-once."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(start):
        spark.range(start, start + 100).select(
            F.col("id"), (F.col("id") % 7).alias("bucket")
        ).coalesce(1).write.mode("append").parquet(src)

    write_batch(0)

    def run_once():
        q = (
            spark.readStream.schema("id long, bucket long")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()                       # processes batch 1
    write_batch(100)
    run_once()                       # restart: must pick up ONLY batch 2
    got = spark.read.parquet(out)
    assert got.count() == 200        # no duplicates from the restart
    assert got.select(F.sum("id")).first()[0] == sum(range(200))


def test_streaming_cms_matches_batch(spark):
    """The streamed CMS counter table must be bit-identical to the
    batch-built one (counter sums commute), and every heavy-hitter
    contract flag must hold."""
    from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY

    rows = (
        REGISTRY["streaming_heavy_hitters"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) == 10
    assert all(r["ok_stream_equals_batch"] for r in rows)
    assert all(r["ok_cms_ge_exact"] for r in rows)
    assert all(r["ok_cms_within_eps"] for r in rows)


def test_cusum_fold_rejects_out_of_order_day():
    """The CUSUM fold's cross-batch ordering contract is enforced: a
    batch that reopens an already-closed day must raise, not silently
    fold deviations out of order (ADVICE r11)."""
    import pandas as pd
    import pytest

    from uni_mannheim_masters_thesis_spark.streaming.stateful import (
        _US_PER_DAY,
        _make_cusum_update,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._t = None

        @property
        def get(self):
            return self._t

        def update(self, t):
            self.exists = True
            self._t = t

    upd = _make_cusum_update({"click": (10.0, 2.0)})
    state = FakeState()
    batch1 = pd.DataFrame(
        {"us": [2 * _US_PER_DAY + 5], "value": [3.0], "event_id": [1]}
    )
    list(upd(("click",), [batch1], state))  # closes nothing, opens day 2
    late = pd.DataFrame(
        {"us": [1 * _US_PER_DAY + 5], "value": [4.0], "event_id": [2]}
    )
    with pytest.raises(ValueError, match="out-of-order day"):
        list(upd(("click",), [late], state))


def test_cusum_fold_multi_batch_ordered_replay(spark, tmp_path):
    """Cross-batch state evidence for the CUSUM fold (the single-batch
    replay blind spot from ADVICE r11): events split into one parquet
    file PER DAY, streamed with maxFilesPerTrigger=1 so every day
    arrives in its own micro-batch (oldest first — the fold's ordering
    contract holds by construction). The max-eseq value per (type,
    day) must equal the plain-Python CUSUM recursion on the same
    data, proving day-close folds survive state round-trips instead
    of riding a single addBatch."""
    import os
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    from uni_mannheim_masters_thesis_spark.streaming.runtime import drain
    from uni_mannheim_masters_thesis_spark.streaming.stateful import (
        _CUSUM_OUT_SCHEMA,
        _CUSUM_STATE_SCHEMA,
        _US_PER_DAY,
        _make_cusum_update,
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    mu, sigma = 10.0, 2.0
    k = 0.5 * sigma
    days = {0: [3.0, 4.5], 1: [12.25, 1.0], 2: [30.0], 3: [0.5, 0.5, 0.5]}
    src = tmp_path / "days"
    src.mkdir()
    eid = 0
    for d, vals in days.items():
        rows = []
        for v in vals:
            rows.append((eid, d * _US_PER_DAY + 1000 + eid, float(v)))
            eid += 1
        pdf = pd.DataFrame(rows, columns=["event_id", "us", "value"])
        pdf["event_type"] = "click"
        f = src / f"day{d}.parquet"
        pdf.to_parquet(f)
        # FileStreamSource orders by modification time: make it strict
        t = _time.time() + d
        os.utime(f, (t, t))

    static = spark.read.parquet(str(src))
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    folded = stream.groupBy("event_type").applyInPandasWithState(
        _make_cusum_update({"click": (mu, sigma)}),
        outputStructType=_CUSUM_OUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    prog = []
    out = drain(folded, "update", progress_out=prog)
    got = {
        int(r["day_start_us"] // _US_PER_DAY): round(r["s_cusum"], 9)
        for r in out.groupBy("event_type", "day_start_us")
        .agg(F.max_by("cusum", "eseq").alias("s_cusum"))
        .collect()
    }
    # at least one batch per day file => day-closes crossed state
    assert len([p for p in prog if p.get("numInputRows", 0) > 0]) >= len(days)
    s = 0.0
    want = {}
    for d in sorted(days):
        s = max(0.0, s + (sum(days[d]) - mu - k))
        want[d] = round(s, 9)
    assert got == want, (got, want)


def _day_files(tmp_path, days, us_step):
    """One parquet file per chunk with strictly increasing mtimes so
    FileStreamSource at maxFilesPerTrigger=1 replays them in order."""
    import os
    import time as _time

    import pandas as pd

    src = tmp_path / "chunks"
    src.mkdir()
    eid = 0
    for i, vals in enumerate(days):
        rows = []
        for v in vals:
            rows.append((eid, i * us_step + eid, float(v)))
            eid += 1
        pdf = pd.DataFrame(rows, columns=["event_id", "us", "value"])
        pdf["user_id"] = 7
        f = src / f"chunk{i}.parquet"
        pdf.to_parquet(f)
        t = _time.time() + i
        os.utime(f, (t, t))
    return src


def test_twap_and_ewma_folds_multi_batch_ordered_replay(spark, tmp_path):
    """Cross-batch state evidence for the TWAP and EWMA folds: chunked
    one-file-per-batch ordered replay must equal the plain sequential
    fold — segments that SPAN batch boundaries (TWAP's last_value
    carried in state) and the order-sensitive EWMA recursion both
    survive state round-trips."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from uni_mannheim_masters_thesis_spark.streaming.runtime import drain
    from uni_mannheim_masters_thesis_spark.streaming import stateful as S

    chunks = [[5.0, 7.0], [9.0], [1.0, 3.0, 2.0]]
    src = _day_files(tmp_path, chunks, us_step=1_000_000)
    static = spark.read.parquet(str(src))

    def chunk_stream():
        return (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

    # --- TWAP ---
    folded = chunk_stream().groupBy("user_id").applyInPandasWithState(
        S._twap_update,
        outputStructType=S._TWAP_OUT_SCHEMA,
        stateStructType=S._TWAP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    rows = sorted(
        drain(folded, "update").collect(), key=lambda r: -r["n_segments"]
    )
    got = rows[0]
    flat = [v for c in chunks for v in c]
    us = []
    eid = 0
    for i, c in enumerate(chunks):
        for _ in c:
            us.append(i * 1_000_000 + eid)
            eid += 1
    acc_wv = acc_dt = 0
    for j in range(1, len(flat)):
        dt = us[j] - us[j - 1]
        acc_wv += flat[j - 1] * dt
        acc_dt += dt
    assert got["n_segments"] == len(flat) - 1
    assert got["observed_us"] == acc_dt
    assert abs(got["twap"] - acc_wv / acc_dt) < 1e-9

    # --- EWMA ---
    alpha = 0.2
    folded = chunk_stream().groupBy("user_id").applyInPandasWithState(
        S._make_ewma_update(alpha),
        outputStructType=S._EWMA_OUT_SCHEMA,
        stateStructType=S._EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    rows = sorted(
        drain(folded, "update").collect(), key=lambda r: -r["n_events"]
    )
    got = rows[0]
    ewma = None
    for x in flat:
        ewma = x if ewma is None else alpha * x + (1 - alpha) * ewma
    assert got["n_events"] == len(flat)
    assert abs(got["ewma"] - ewma) < 1e-12


def test_twap_and_ewma_folds_reject_out_of_order():
    """Both order-sensitive folds refuse a batch that time-travels
    behind their state instead of silently corrupting it."""
    import pandas as pd
    import pytest

    from uni_mannheim_masters_thesis_spark.streaming import stateful as S

    class FakeState:
        def __init__(self):
            self.exists = False
            self._t = None

        @property
        def get(self):
            return self._t

        def update(self, t):
            self.exists = True
            self._t = t

    # TWAP
    st = FakeState()
    b1 = pd.DataFrame({"us": [2_000_000], "value": [5.0], "event_id": [1]})
    list(S._twap_update((7,), [b1], st))
    late = pd.DataFrame({"us": [1_000_000], "value": [9.0], "event_id": [2]})
    with pytest.raises(ValueError, match="out-of-order"):
        list(S._twap_update((7,), [late], st))

    # EWMA
    st = FakeState()
    upd = S._make_ewma_update(0.2)
    list(upd((7,), [b1], st))
    with pytest.raises(ValueError, match="out-of-order"):
        list(upd((7,), [late], st))
