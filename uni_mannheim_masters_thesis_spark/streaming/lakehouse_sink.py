"""Structured Streaming CDC ingestion into the copy-on-write lakehouse
table (sources/lakehouse.py) via ``foreachBatch``.

This closes the loop between the repo's two lakehouse halves: the
batch MERGE queries compute CDC semantics as relations, and the table
layer materializes versioned snapshots — here a STREAM drives the
table, the way a production bronze→silver pipeline actually runs:

- the events table replays as ≥10 time-ordered micro-batches
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

At 100 TB: foreachBatch-MERGE is the standard Delta/Iceberg streaming
upsert sink; the per-batch cost is the CDC reduction (one shuffle on
the key) plus a copy-on-write rewrite of only the touched buckets,
and checkpointing makes the sink restartable (a replayed batch
re-merges idempotently — last-writer-wins per key is idempotent under
replay of the same batch).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import ensure_engine_confs
from ..sources.testdata import normalize_ts
from .runtime import _CKPT_ROOT
from .throughput import split_events_dir


def stream_cdc_into_table(
    spark: SparkSession, sf_dir: str, table_dir: str
) -> dict[str, int]:
    """Replay the events log as micro-batches and MERGE each into a
    lakehouse table at ``table_dir``. Returns run evidence:
    ``n_data_batches`` (non-empty micro-batches processed) and
    ``n_versions`` (table versions committed)."""
    from ..sources.lakehouse import (
        create_table,
        latest_version,
        merge_table,
    )

    ensure_engine_confs(spark)
    src = split_events_dir(spark, sf_dir)
    static = spark.read.parquet(src)
    stream = normalize_ts(
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        "ts",
    )

    state = {"created": False, "n_data_batches": 0}

    def _apply(batch: DataFrame, batch_id: int) -> None:
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
        if cdc.isEmpty():
            return
        state["n_data_batches"] += 1
        if not state["created"]:
            create_table(
                cdc.filter(~F.col("__delete")).drop("__delete"),
                table_dir,
                "user_id",
            )
            state["created"] = True
        else:
            merge_table(spark, table_dir, cdc, "user_id", "__delete")

    name = f"lakehouse_sink_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"{name}_", dir=_CKPT_ROOT)
    try:
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
