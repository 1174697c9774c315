"""Relational operator compositions the reference does imperatively.

- ``per_group_first`` — the reference's "first triple per context" loop
  (``Read_And_Clean.py:114-124``, J1/O3): per-group LIMIT 1 via a
  row_number window. Deterministic only if ``order_cols`` is a total
  order — callers must include a tiebreaker key.
- ``topk_per_group`` — generalizes the reference's thresholded-sorted
  topic lists (``polysemous_words.py:80-82``, O1/O4).

Scale: both are a single hash-shuffle on the partition keys; AQE
skew-split handles hot groups. No driver-side loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def per_group_first(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column | str],
) -> DataFrame:
    """First row per group under a total order (J1: per-group LIMIT 1)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    k: int,
) -> DataFrame:
    """Top-k rows per group under a total order (O4)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
