"""Structured Streaming CDC ingestion into the copy-on-write lakehouse
table (sources/lakehouse.py) via ``foreachBatch``.

This closes the loop between the repo's two lakehouse halves: the
batch MERGE queries compute CDC semantics as relations, and the table
layer materializes versioned snapshots — here a STREAM drives the
table, the way a production bronze→silver pipeline actually runs:

- the events table replays as multiple time-ordered micro-batches
  (``split_events_dir``'s file drops, ``maxFilesPerTrigger=1``);
- every micro-batch reduces to a CDC batch (latest state per key
  within the batch, ``error`` events as tombstones) and is MERGEd
  into the table inside ``foreachBatch`` — Spark guarantees
  ``foreachBatch`` runs micro-batches sequentially in order, which is
  exactly the commit discipline the single-writer table needs;
- each non-empty micro-batch produces ONE table version (CREATE for
  the first, MERGE after), so the commit log mirrors the stream's
  batch sequence.

Because each merge applies per-key last-writer-wins and batches
arrive in (ts, event_id) order, the final table state equals the
GLOBAL latest-event-per-key fold over the whole log, with
error-latest keys absent — independent of where the batch boundaries
fall. That is the hash-exact oracle contract
(``streaming_lakehouse_sink`` in plans/registry.py).

**Exactly-once under replay.** ``foreachBatch`` is at-least-once: a
crash between a table commit and the checkpoint advance replays the
batch on restart. The sink therefore records each batch_id in its
commit's manifest NOTE — the note rides the same atomic manifest
write as the data, so "was this batch applied?" is answered by the
table itself, transactionally. ``apply_cdc_batch`` skips any
batch_id at or below the last committed watermark: replays neither
change content NOR mint phantom versions (the Delta
txnAppId/txnVersion idempotent-writer recipe, unit-tested).

At 100 TB: foreachBatch-MERGE is the standard Delta/Iceberg streaming
upsert sink; the per-batch cost is the CDC reduction (one shuffle on
the key) plus a copy-on-write rewrite of only the touched buckets.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import ensure_engine_confs
from ..sources.testdata import normalize_ts
from .runtime import _CKPT_ROOT, stream_state_partitions
from .throughput import split_events_dir


def apply_cdc_batch(
    spark: SparkSession, table_dir: str, batch: DataFrame, batch_id: int
) -> bool:
    """Reduce one micro-batch to CDC and commit it EXACTLY ONCE:
    the batch_id is written into the commit's manifest note (atomic
    with the data), and any batch at or below the table's last
    committed batch_id is skipped — so foreachBatch replays after a
    crash neither change content nor mint phantom versions. Returns
    True iff the table was mutated."""
    from ..sources.lakehouse import (
        create_table,
        last_committed_note,
        merge_table,
    )

    # a micro-batch is empty iff its CDC reduction is (row_number = 1
    # keeps one row per user present) — test the SOURCE batch, which
    # answers without paying the window shuffle an extra time
    if batch.isEmpty():
        return False
    w = Window.partitionBy("user_id").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    cdc = (
        batch.select(
            "event_id", "user_id", "event_type", "value",
            F.unix_micros("ts").alias("us"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            (F.col("event_type") == "error").alias("__delete"),
        )
    )
    note = {"batch_id": batch_id}
    if not os.path.exists(os.path.join(table_dir, "_LATEST")):
        create_table(
            cdc.filter(~F.col("__delete")).drop("__delete"),
            table_dir,
            "user_id",
            note=note,
        )
        return True
    last = last_committed_note(table_dir).get("batch_id")
    if last is not None and batch_id <= last:
        return False  # replayed batch: already committed transactionally
    merge_table(spark, table_dir, cdc, "user_id", "__delete", note=note)
    return True


def stream_cdc_into_table(
    spark: SparkSession, sf_dir: str, table_dir: str,
    n_splits: int = 5,
) -> dict[str, int]:
    """Replay the events log as ``n_splits`` micro-batches and MERGE
    each into a lakehouse table at ``table_dir``. Returns run evidence:
    ``n_data_batches`` (non-empty micro-batches processed) and
    ``n_versions`` (table versions committed).

    ``n_splits`` trades evidence for wall-clock at TEST scale only —
    the exactly-once contract (batch_id watermark riding the atomic
    manifest commit) is identical for any batch count, and the final
    table state is batch-boundary-independent by construction. 5
    batches still exercises CREATE + 4 sequential MERGEs + replay
    skipping; production batch cadence is the trigger interval."""
    from ..sources.lakehouse import latest_version

    ensure_engine_confs(spark)
    src = split_events_dir(spark, sf_dir, n=n_splits)
    static = spark.read.parquet(src)
    stream = normalize_ts(
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        "ts",
    )

    state = {"n_data_batches": 0}

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if apply_cdc_batch(spark, table_dir, batch, batch_id):
            state["n_data_batches"] += 1

    name = f"lakehouse_sink_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"{name}_", dir=_CKPT_ROOT)
    try:
        # per-micro-batch plans (CDC window + MERGE join) inherit the
        # session shuffle width — 32 partitions of scheduling overhead
        # for KB-scale batches. Cap them like every other drain (the
        # runtime's state-partition discipline); the CDC reduction and
        # the MERGE are partitioning-independent (deterministic
        # row_number total order / equi-join), so the committed table
        # bytes are unchanged. Production sizes this to stream volume.
        with stream_state_partitions(spark):
            query = (
                stream.writeStream.foreachBatch(_apply)
                .option("checkpointLocation", ckpt)
                .start()
            )
            try:
                query.processAllAvailable()
            finally:
                try:
                    query.stop()
                finally:
                    sc = spark.sparkContext
                    sc.setLocalProperty("spark.sql.execution.id", None)
                    sc.setLocalProperty("spark.sql.execution.root.id", None)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "n_data_batches": state["n_data_batches"],
        "n_versions": latest_version(table_dir),
    }
