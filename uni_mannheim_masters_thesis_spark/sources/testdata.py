"""Loaders for the driver's synthetic testdata tables.

Tables (one parquet each, see TESTDATA.md / FIXTURES.md §B):
``region nation customer supplier part orders lineitem events documents
embeddings``.

The generator wrote timestamp columns as parquet ``TIMESTAMP(NANOS)``,
which Spark's vectorized reader rejects. We read them via
``spark.sql.legacy.parquet.nanosAsLong`` and convert losslessly to
``timestamp`` (microsecond precision; the data carries no sub-microsecond
digits). Integer division (`div`) keeps the arithmetic exact — a
float division would lose precision above 2^53 ns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_engine_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# timestamp-typed columns per table (stored as TIMESTAMP(NANOS) in parquet)
_NS_TIMESTAMP_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def normalize_ts(df: DataFrame, col: str) -> DataFrame:
    """Coerce a testdata timestamp column to session-TZ ``timestamp``.

    The generator has stored timestamps as either parquet TIMESTAMP(NANOS)
    (surfacing as ``bigint`` under ``nanosAsLong``) or TIMESTAMP(MICROS,
    utc=false) (surfacing as ``timestamp_ntz``) across regenerations, so
    every reader — batch AND streaming — must branch on the observed
    dtype rather than assume one encoding. Shared here so the branches
    can't drift apart again (round-2 regression: the streaming readers
    assumed bigint-nanos and broke on TIMESTAMP_NTZ data).
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":  # TIMESTAMP(NANOS) read under nanosAsLong
        df = df.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast("timestamp")
        )
    elif dtype == "timestamp_ntz":  # TIMESTAMP(MICROS, utc=false)
        # values are UTC wall-clock; session TZ is pinned UTC, so the
        # cast is value-preserving and enables unix_micros etc.
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with proper timestamp types."""
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NS_TIMESTAMP_COLS.get(name, ()):
        df = normalize_ts(df, c)
    return df


def event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events table with the same ts normalization
    as the batch loader.

    FileStreamSource needs a DIRECTORY. The events table arrives either
    as a single file ``events.parquet`` (driver testdata) or as a
    parquet directory ``events.parquet/`` (any ``df.write`` output,
    e.g. the scale-check's Nx dataset) — a filename glob over ``sf_dir``
    silently matches ZERO files in the directory layout, so branch on
    the layout instead of globbing blind.
    """
    ensure_engine_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    static = spark.read.parquet(path)
    reader = spark.readStream.schema(static.schema)
    if os.path.isdir(path):
        stream = reader.parquet(path)
    else:
        stream = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    return normalize_ts(stream, "ts")


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view (mirrors the DuckDB oracle setup)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
