"""Multi-micro-batch throughput evidence for the stateful streaming
operators (round-6 verdict task 5).

Every other streaming query here drains in ONE micro-batch (the whole
events table is a single parquet file), which proves semantics but says
nothing about state-store behavior over a long run. This module replays
the events table as a time-ordered sequence of >= 10 file drops
(``repartitionByRange`` on ts, ``maxFilesPerTrigger=1``) through the two
heaviest stateful operators — session-window aggregation and the
stream-stream interval join — and reports per-micro-batch input rows,
trigger latency, and state rows, with hard ``ok_*`` invariants:

- ``ok_min_batches``: each query processed >= ``MIN_BATCHES`` data
  micro-batches (the file split actually drove a long run);
- ``ok_flat_latency``: the median trigger time of the LAST 3 data
  batches is <= 3x the median of batches 2-4 (batch 1 is excluded —
  it pays plan compilation). Linear state growth or a leak shows up as
  a monotone latency ramp and fails this;
- ``ok_state_evicts`` (interval join): final buffered state rows are
  below total joined-side input rows — the watermark + interval bound
  actually evicted rows during the run (without the time-bound join
  condition two-stream state grows without limit).

State-store backend (the 100 TB deployment axis): the default
HDFS-backed provider keeps every store's working set on-heap — fine
for bounded test state, wrong for the billions of keys a
1000-executor sessionization carries. Production runs the RocksDB
provider (local-SSD spill, bounded block cache; pair it with
``spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled``
so commits upload per-batch deltas instead of full snapshots). Since
round 8 the harness EXECUTES that claim instead of footnoting it:
the full replay runs under BOTH providers (the swap is one session
conf — no query changes), each run carries a ``provider`` column and
its reported state bytes, and every ok_* invariant (flat latency,
watermark eviction, batch-exact join parity) must hold under both.
"""

from __future__ import annotations

import os
import statistics
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_engine_confs
from ..sources.testdata import load_table, normalize_ts
from .runtime import drain

N_SPLITS = 12
MIN_BATCHES = 10
_LATENCY_RATIO_BOUND = 3.0

# Both state-store backends Spark ships: the default on-heap provider
# and the RocksDB provider (local-SSD spill, bounded block cache) that
# a 1000-executor deployment would run. Listed explicitly so the
# harness EXECUTES the deployment claim instead of documenting it.
_PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


def split_events_dir(spark: SparkSession, sf_dir: str, n: int = N_SPLITS) -> str:
    """Write the events table as ``n`` time-range parquet files (once
    per process per sf_dir) — FileStreamSource + maxFilesPerTrigger=1
    then replays them as ``n`` time-ordered micro-batches, the arrival
    pattern a file-drop ingestion produces.

    The slices are written SEQUENTIALLY with strictly increasing
    mtimes: FileStreamSource orders files by modification time, and a
    single parallel ``repartitionByRange`` write lands its part files
    in arbitrary mtime order — replaying time slices out of order then
    makes whole slices 'late', and the watermark silently drops their
    rows (observed: 17/23 join pairs survived a scrambled replay).
    """
    # cache key: abs path + events-table mtime, not just the basename —
    # two datasets sharing a directory basename (sf0.1 under different
    # roots, a rebuilt .sf1) must NOT reuse each other's stale slices
    import hashlib

    ev_path = os.path.join(sf_dir, "events.parquet")
    try:
        mtime = int(os.path.getmtime(ev_path))
    except OSError:
        mtime = 0
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{mtime}".encode()
    ).hexdigest()[:10]
    base = os.path.join(
        tempfile.gettempdir(),
        f"umt_stream_split_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{n}_{key}",
    )
    from ..cachedir import staged_cache_dir

    return staged_cache_dir(
        base, "_UMT_SPLIT_DONE",
        lambda stage: _build_event_splits(spark, sf_dir, stage, n),
    )


def _build_event_splits(
    spark: SparkSession, sf_dir: str, base: str, n: int
) -> None:
    """Write the n time-slice files into ``base`` (a private staging
    dir — the atomic-rename publication in split_events_dir guarantees
    no other process can replay a partially-written slice set)."""
    import glob
    import shutil
    import time

    ev = load_table(spark, sf_dir, "events")
    # time-ordered slices via range repartitioning: range partition i
    # holds the i-th (ts, event_id) range, so slices replay in time
    # order — same guarantee ntile-over-a-global-window gave, without
    # funnelling the table through one WindowExec partition (slice row
    # counts are sample-balanced rather than exactly equal, which the
    # replay does not care about). The cache() pins the sampled range
    # boundaries so the n filter jobs below all see the same buckets.
    sliced = (
        ev.repartitionByRange(n, F.col("ts"), F.col("event_id"))
        .withColumn("_b", F.spark_partition_id() + 1)
        .cache()
    )
    t0 = time.time() - 2 * n
    for i in range(1, n + 1):
        staging = tempfile.mkdtemp(prefix="umt_slice_")
        (
            sliced.filter(F.col("_b") == i)
            .drop("_b")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(staging)
        )
        parts = glob.glob(os.path.join(staging, "part-*.parquet"))
        if not parts:  # a sample-balanced range slice can be empty
            shutil.rmtree(staging, ignore_errors=True)
            continue
        part = parts[0]
        dest = os.path.join(base, f"batch_{i:02d}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (t0 + i, t0 + i))
        shutil.rmtree(staging, ignore_errors=True)
    sliced.unpersist()


def _file_stream(spark: SparkSession, src: str) -> DataFrame:
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    return normalize_ts(stream, "ts")


def _session_agg(stream: DataFrame) -> DataFrame:
    # append mode: only sessions the watermark has closed are emitted,
    # so per-batch output (and state) stays bounded by ACTIVE sessions
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def _interval_join(stream_a: DataFrame, stream_b: DataFrame) -> DataFrame:
    clicks = (
        stream_a.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        stream_b.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    return clicks.join(
        purchases,
        F.expr(
            "user_id = p_user AND p_ts >= c_ts "
            "AND p_ts <= c_ts + interval 30 minutes"
        ),
        "inner",
    )


def _batch_rows(name: str, progress: list[dict]) -> list[dict]:
    rows = []
    for p in progress:
        if not p.get("numInputRows"):
            continue  # zero-input bookkeeping triggers
        state = p.get("stateOperators") or []
        rows.append(
            {
                "query": name,
                "batch_id": int(p["batchId"]),
                "input_rows": int(p["numInputRows"]),
                "duration_ms": int(
                    p.get("durationMs", {}).get("triggerExecution", 0)
                ),
                "state_rows": int(
                    sum(int(s.get("numRowsTotal", 0)) for s in state)
                ),
                "state_bytes": int(
                    sum(int(s.get("memoryUsedBytes", 0)) for s in state)
                ),
            }
        )
    rows.sort(key=lambda r: r["batch_id"])
    return rows


def _flat_latency(rows: list[dict]) -> bool:
    if len(rows) < MIN_BATCHES:
        return False
    early = [r["duration_ms"] for r in rows[1:4]]
    late = [r["duration_ms"] for r in rows[-3:]]
    return statistics.median(late) <= _LATENCY_RATIO_BOUND * max(
        statistics.median(early), 1.0
    )


def streaming_throughput_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (state-store provider, query, data micro-batch) with
    the ok_* invariants described in the module docstring stamped on
    every row.

    The full ≥10-micro-batch replay runs TWICE — once on the default
    HDFS-backed in-memory provider and once on RocksDB
    (``spark.sql.streaming.stateStore.providerClass`` is a session
    conf read at query start, so the swap needs no query changes;
    that conf-only swap is itself the 100 TB deployment claim, now
    executed rather than footnoted). Both providers must drain the
    same joined-pair count as the batch twin, hold their final
    interval-join state below total joined-side input (watermark
    eviction), and keep trigger latency flat across the run; RocksDB
    rows additionally carry its off-heap state footprint in
    ``state_bytes``."""
    ensure_engine_confs(spark)
    src = split_events_dir(spark, sf_dir)

    # batch twin of the interval join, computed once: every provider's
    # in-order multi-batch replay must retain EVERY pair the batch
    # self-join finds (nothing lost to watermark eviction across file
    # boundaries, regardless of state backend)
    ev = load_table(spark, sf_dir, "events")
    bc = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    bp = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    batch_pairs = bc.join(
        bp,
        F.expr(
            "user_id = p_user AND p_ts >= c_ts "
            "AND p_ts <= c_ts + interval 30 minutes"
        ),
    ).count()

    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    out = []
    try:
        for provider, cls in _PROVIDERS.items():
            spark.conf.set(key, cls)
            sess_prog: list[dict] = []
            drain(
                _session_agg(_file_stream(spark, src)),
                "append",
                name_prefix=f"tput_sessions_{provider}",
                progress_out=sess_prog,
            )
            join_prog: list[dict] = []
            drained_pairs = drain(
                _interval_join(
                    _file_stream(spark, src), _file_stream(spark, src)
                ),
                "append",
                name_prefix=f"tput_ivjoin_{provider}",
                progress_out=join_prog,
            )
            n_pairs = drained_pairs.count()

            sess_rows = _batch_rows("session_window", sess_prog)
            join_rows = _batch_rows("interval_join", join_prog)
            flat = {
                "session_window": _flat_latency(sess_rows),
                "interval_join": _flat_latency(join_rows),
            }
            total_join_input = sum(r["input_rows"] for r in join_rows)
            final_join_state = join_rows[-1]["state_rows"] if join_rows else 0
            evicts = 0 < final_join_state < total_join_input
            for r in sess_rows + join_rows:
                out.append(
                    {
                        "provider": provider,
                        **r,
                        "n_joined_pairs": n_pairs,
                        "ok_min_batches": len(sess_rows) >= MIN_BATCHES
                        and len(join_rows) >= MIN_BATCHES,
                        "ok_flat_latency": flat[r["query"]],
                        "ok_state_evicts": evicts,
                        "ok_pairs_match_batch": n_pairs == batch_pairs,
                    }
                )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return spark.createDataFrame(
        out,
        "provider string, query string, batch_id int, input_rows long, "
        "duration_ms long, state_rows long, state_bytes long, "
        "n_joined_pairs long, ok_min_batches boolean, "
        "ok_flat_latency boolean, ok_state_evicts boolean, "
        "ok_pairs_match_batch boolean",
    )
