"""Stateful streaming operators over the events table (SURVEY §2.9/§2.11).

- ``streaming_sessionization``: native ``session_window`` (30-min gap)
  over the event stream with a watermark — the state store holds one
  open session per (user, gap-window), merged as events arrive; bounded
  by active users, not input volume.
- ``stateful_user_counts``: a *custom* stateful operator via
  ``applyInPandasWithState`` — per-user running counters kept in
  ``GroupState`` across micro-batches (the engine's template for
  operators Structured Streaming lacks natively). Arrow-batched, one
  state row per user.

Both drive the stream synchronously to completion (memory sink +
``processAllAvailable``) and return the final batch result so the
driver/oracle can check them like any other query.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..session import ensure_engine_confs
from ..sources.testdata import event_stream as _event_stream
from .runtime import drain


def _drain(agg: DataFrame, output_mode: str) -> DataFrame:
    return drain(agg, output_mode, name_prefix="stateful")


def streaming_sessionization(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user session stats via native session_window state merging.

    Returns [user_id, session_start_us, n_events, sum_value]; identical
    semantics to the batch sessionization query (gap-based sessions), so
    the two can be cross-checked.
    """
    ensure_engine_confs(spark)
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value_d"),
        )
    )
    out = _drain(agg, "complete")
    return out.select(
        "user_id",
        F.unix_micros(F.col("w.start")).alias("session_start_us"),
        "n_events",
        F.round(F.col("sum_value_d").cast("double"), 2).alias("sum_value"),
    )


def streaming_session_attribution(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-touch attribution maintained by session_window state.

    The state store merges each user's open session as events arrive
    and carries THREE aggregates per session: the lexicographic-min
    (ts, event_id, event_type) struct (the entry channel — min over
    structs is associative, so state merges preserve it exactly), the
    DECIMAL purchase sum, and the purchase count. The drained
    per-session frame is then rolled up per entry channel — identical
    output contract to the batch ``session_attribution`` (which uses
    the lag formulation; note session_window opens a NEW session at
    gap >= 30 min where the batch query uses strictly >, so the oracle
    replays the >= islands).
    """
    ensure_engine_confs(spark)
    stream = _event_stream(spark, sf_dir)
    dec0 = F.lit(0).cast("decimal(18,2)")
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.min(F.struct("ts", "event_id", "event_type")).alias("entry"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,2)"),
                ).otherwise(dec0)
            ).alias("purchase_value"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purch"),
        )
    )
    out = _drain(agg, "complete")
    return out.groupBy(F.col("entry")["event_type"].alias("entry_type")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_purch") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_converting"),
        F.sum("n_purch").cast("long").alias("n_purchases"),
        F.round(F.sum("purchase_value").cast("double"), 2).alias(
            "attributed_value"
        ),
    )


_STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("value_cents", LongType())]
)
_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
    ]
)


def _update_user_counts(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """GroupState update: accumulate (count, integer-cents sum) per user.

    Cents (int64) keep the accumulation exact and order-independent —
    float accumulation in state would drift across micro-batch orders.
    """
    (user_id,) = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(round(pdf["value"].astype(float).sum() * 100))
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [int(user_id)], "n_events": [n], "value_cents": [cents]}
    )


def stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator: per-user running totals via
    applyInPandasWithState (update mode, no timeout).

    Returns the final per-user counters [user_id, n_events, sum_value].
    """
    ensure_engine_confs(spark)
    stream = _event_stream(spark, sf_dir).select(
        "user_id", F.col("value").cast("double").alias("value")
    )
    counted = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_counts,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _drain(counted, "update")
    # update-mode memory sink may hold one row per micro-batch per user;
    # the final state is the row with the highest event count — max_by,
    # NOT per-column max, which would pair counters from different
    # micro-batches (wrong whenever value_cents is non-monotonic, e.g.
    # negative event values)
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("value_cents", "n_events").alias("value_cents"),
        )
        .select(
            "user_id",
            "n_events",
            F.round(F.col("value_cents") / 100.0, 2).alias("sum_value"),
        )
    )


_EWMA_STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("ewma", DoubleType())]
)
_EWMA_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ewma", DoubleType()),
    ]
)


def _make_ewma_update(alpha: float):
    beta = 1.0 - alpha

    def _update(key, pdfs, state: GroupState):
        """GroupState update: fold the textbook EWMA recursion
        (ewma_i = alpha*x_i + beta*ewma_{i-1}, init = first value) in
        strict (us, event_id) order WITHIN each arriving micro-batch.
        The recursion is order-sensitive, and a key's rows arrive as
        MULTIPLE Arrow chunks whose boundaries follow partition layout,
        not event time — so all chunks must be concatenated and sorted
        ONCE before folding (sorting each chunk separately broke ~6% of
        users the first time the directory-layout sf1 table streamed
        through). Cross-micro-batch order is the source's
        responsibility (default FileStreamSource trigger: every
        available file in one batch; the multi-slice replay writes
        slices in time order)."""
        (user_id,) = key
        n, ewma = state.get if state.exists else (0, None)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["us", "event_id"])
        for x in pdf["value"].astype(float):
            ewma = x if ewma is None else alpha * x + beta * ewma
            n += 1
        state.update((n, float(ewma) if ewma is not None else 0.0))
        yield pd.DataFrame(
            {"user_id": [int(user_id)], "n_events": [n], "ewma": [ewma]}
        )

    return _update


def streaming_ewma(
    spark: SparkSession, sf_dir: str, alpha: float = 0.2
) -> DataFrame:
    """Per-user EWMA maintained as streaming state: the sequential
    recursion the batch query (`ewma_user_value`) deliberately avoids
    is exactly what a stateful stream is FOR — one (n, ewma) state row
    per user, O(1) per event, folded in event-time order inside each
    micro-batch via applyInPandasWithState.

    Returns the final [user_id, n_events, ewma] per user. The batch
    twin's closed form and this recursion agree to ~1e-9 relative
    (identical real-number semantics, different float evaluation
    order); `streaming_ewma_parity` pins that agreement per user.
    """
    ensure_engine_confs(spark)
    stream = _event_stream(spark, sf_dir).select(
        "user_id",
        F.col("value").cast("double").alias("value"),
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    folded = stream.groupBy("user_id").applyInPandasWithState(
        _make_ewma_update(alpha),
        outputStructType=_EWMA_OUT_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _drain(folded, "update")
    # final state = the row carrying the highest per-user event count
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("ewma", "n_events").alias("ewma"),
    )
