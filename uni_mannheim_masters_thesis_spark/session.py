"""SparkSession factory.

Local-mode defaults match the test/bench environment (``local[N]``, one
JVM); the same settings are the right starting point on a real cluster:
AQE on (runtime coalescing + skew-join splitting), shuffle partitions
sized to cores, UTC session time zone (required for DuckDB-oracle
comparability — DuckDB timestamps are UTC-naive), Arrow enabled for any
pandas_udf path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 8


def get_session(app_name: str = "umt_spark", cpus: int | None = None) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults."""
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata stores timestamps as parquet TIMESTAMP(NANOS),
        # which Spark cannot read natively; read as long + convert
        # (see sources.testdata.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Set the runtime-settable confs the engine relies on.

    Called by every loader so externally-created sessions (e.g. the
    driver's) behave identically to ours.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # foreign sessions (e.g. the driver's) default to 200 shuffle
    # partitions — wrong for local mode; AQE coalescing then shrinks
    # them, but starting at ~cores avoids the scheduling overhead
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    return spark
