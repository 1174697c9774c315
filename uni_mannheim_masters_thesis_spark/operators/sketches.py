"""Count-min sketch as plain DataFrame aggregations (SURVEY §2.11
sketches; no reference analogue — the reference never needs
approximate counting at its scale, this is the 100 TB path).

A CMS is depth hash rows x width buckets of commutative counter sums,
so it is expressible as ``explode(bucket coordinates) -> groupBy ->
count`` with nothing custom: the counter table is partition-order
invariant (sums commute), mergeable (map-side combine), bounded at
``depth * width`` rows regardless of input size, and works identically
over a batch DataFrame and a Structured Streaming one (a streaming
groupBy over bucket coordinates keeps state bounded at depth*width —
input-volume- AND key-cardinality-independent).

Estimates come from joining candidate keys' bucket coordinates back
against the counter table and taking ``min`` over the depth rows —
never collecting the sketch to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 5
CMS_WIDTH = 2048


def cms_buckets(col: Column, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> Column:
    """Array of (hash_index, bucket) coordinates for one key value —
    ``depth`` independent seeded xxhash64 functions mod ``width``."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("hi"),
                F.pmod(F.xxhash64(col, F.lit(i)), F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_counter_table(
    df: DataFrame, key: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """The CMS counter relation [hi, bucket, c] for ``df[key]`` —
    works unchanged on batch and streaming DataFrames."""
    return (
        df.select(F.explode(cms_buckets(F.col(key), depth, width)).alias("s"))
        .select("s.hi", "s.bucket")
        .groupBy("hi", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimates(
    candidates: DataFrame,
    counters: DataFrame,
    key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for each candidate key: join the
    candidates' bucket coordinates against the counter table, estimate
    = min counter over the depth rows. Returns [<key>, est]."""
    return (
        candidates.select(key, F.explode(cms_buckets(F.col(key), depth, width)).alias("s"))
        .select(key, "s.hi", "s.bucket")
        .join(counters, ["hi", "bucket"])
        .groupBy(key)
        .agg(F.min("c").alias("est"))
    )
