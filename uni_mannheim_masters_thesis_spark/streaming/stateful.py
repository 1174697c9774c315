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

import math
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
    [
        StructField("n_events", LongType()),
        StructField("ewma", DoubleType()),
        # last folded event time: lets the fold detect (and refuse)
        # out-of-order cross-batch delivery instead of silently folding
        # the order-sensitive recursion wrong (same contract as
        # streaming_cusum / streaming_twap)
        StructField("last_us", LongType()),
    ]
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
        if state.exists:
            n, ewma, last_us = state.get
            if n == 0:
                ewma = None
        else:
            n, ewma, last_us = 0, None, -1
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["us", "event_id"])
        for us, x in zip(
            pdf["us"].astype("int64"), pdf["value"].astype(float)
        ):
            us = int(us)
            if us < last_us:
                # the recursion is order-sensitive: a later batch
                # delivering an earlier event cannot be folded in
                # retroactively — fail loudly (cross-batch contract)
                raise ValueError(
                    f"streaming_ewma[{user_id}]: out-of-order event at "
                    f"{us}us after {last_us}us; per-key event-time "
                    "order across micro-batches is required"
                )
            ewma = x if ewma is None else alpha * x + beta * ewma
            n += 1
            last_us = us
        state.update((n, float(ewma) if ewma is not None else 0.0, last_us))
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


# --- round 11: streaming CUSUM + streaming TWAP ---------------------------
#
# Both follow the streaming_ewma contract: the batch twin computes the
# oracle-exact values with NO sequential fold (reflection identity /
# LEAD segments), while the stream keeps exactly the O(keys) state the
# recursion needs — the batch-avoids-what-streams-need pairing.

from pyspark.sql.types import StringType  # noqa: E402

_US_PER_DAY = 86_400_000_000

_CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("cur_day", LongType()),
        StructField("day_sum", DoubleType()),
        StructField("p", DoubleType()),
        StructField("min_p", DoubleType()),
        StructField("eseq", LongType()),
    ]
)
_CUSUM_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("day_start_us", LongType()),
        StructField("cusum", DoubleType()),
        StructField("eseq", LongType()),
    ]
)


def _make_cusum_update(refstats: dict):
    """refstats: {event_type: (mu, sigma)} — the static per-type daily
    baseline, computed batch-side (the streaming_drift_monitor static-
    reference discipline: a production monitor pins its baseline)."""

    def _update(key, pdfs, state: GroupState):
        (etype,) = key
        mu, sigma = refstats[etype]
        k = 0.5 * sigma
        if state.exists:
            cur_day, day_sum, p, min_p, eseq = state.get
        else:
            cur_day, day_sum, p, min_p, eseq = -1, 0.0, 0.0, 0.0, 0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["us", "event_id"])
        out_day, out_cusum, out_seq = [], [], []
        for us, x in zip(pdf["us"].astype("int64"), pdf["value"].astype(float)):
            # match the batch twin's DECIMAL(18,2) daily sums exactly:
            # fold 2-decimal values so per-day accumulation can't drift
            # past the parity tolerance on high-count days. Quantize
            # HALF-AWAY-FROM-ZERO (the Spark/DuckDB decimal-cast mode),
            # not Python's round() (banker's half-even): an exactly-
            # representable .xx5 value like 0.125 casts to 0.13 in both
            # engines but round(0.125, 2) == 0.12 — the same
            # floor(+0.5) idiom the batch interpolation queries use
            x = (
                math.floor(x * 100.0 + 0.5) / 100.0
                if x >= 0.0
                else -math.floor(-x * 100.0 + 0.5) / 100.0
            )
            d = int(us) // _US_PER_DAY
            if cur_day >= 0 and d < cur_day:
                # a closed day reopened: the fold already mixed later
                # days into the prefix sum, so the recursion is
                # unrecoverable — fail loudly instead of emitting a
                # corrupted max-eseq row (see streaming_cusum docstring)
                raise ValueError(
                    f"streaming_cusum[{etype}]: out-of-order day "
                    f"{d} after {cur_day}; per-key event-time order "
                    "across micro-batches is required"
                )
            if cur_day >= 0 and d != cur_day:
                # close cur_day: fold its deviation into the prefix sum
                p += day_sum - mu - k
                min_p = min(min_p, p)
                eseq += 1
                out_day.append(cur_day * _US_PER_DAY)
                out_cusum.append(p - min(0.0, min_p))
                out_seq.append(eseq)
                day_sum = 0.0
            cur_day = d
            day_sum += x
            eseq += 1
        state.update((cur_day, day_sum, p, min_p, eseq))
        # as-if-complete emission for the OPEN day: superseded by its
        # close emission in a later batch unless this batch holds its
        # final event — where as-if-complete IS complete, so the last
        # emission per day (max eseq) always carries the final value
        if cur_day >= 0:
            p_v = p + (day_sum - mu - k)
            min_v = min(min_p, p_v)
            out_day.append(cur_day * _US_PER_DAY)
            out_cusum.append(p_v - min(0.0, min_v))
            out_seq.append(eseq)
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(out_day),
                "day_start_us": out_day,
                "cusum": out_cusum,
                "eseq": out_seq,
            }
        )

    return _update


def streaming_cusum(
    spark: SparkSession, sf_dir: str, refstats: dict
) -> DataFrame:
    """Per-type streaming CUSUM monitor: the sequential recursion
    S_i = max(0, S_{i-1} + (x_i - mu - k)) the batch query
    (``cusum_changepoint``) avoids via the reflection identity is the
    natural per-key streaming fold — one (open-day accumulator, prefix
    sum, prefix min) state row per event type, O(1) per event. Emits
    each day's CUSUM when the day closes (plus an as-if-complete row
    for the open day, superseded by later emissions); the final
    per-(type, day) value is the max-eseq row.

    ORDERING CONTRACT: the fold assumes events arrive in per-key
    event-time order ACROSS micro-batches (within a batch it sorts).
    The file-replay harness satisfies this by draining the parquet
    source in a single batch; a batch that reopens an already-closed
    day raises rather than silently folding deviations out of order.
    Cross-batch correctness is pinned by
    ``test_cusum_fold_multi_batch_ordered_replay`` (one file per day,
    ``maxFilesPerTrigger=1`` — every day-close crosses a state
    round-trip and the max-eseq values still equal the recursion).
    Values are rounded to 2 decimals before folding so per-day sums
    match the batch twin's DECIMAL(18,2) arithmetic exactly."""
    ensure_engine_confs(spark)
    stream = _event_stream(spark, sf_dir).select(
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    folded = stream.groupBy("event_type").applyInPandasWithState(
        _make_cusum_update(refstats),
        outputStructType=_CUSUM_OUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = drain(folded, "update")
    return out.groupBy("event_type", "day_start_us").agg(
        F.max_by("cusum", "eseq").alias("s_cusum")
    )


_TWAP_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("last_value", DoubleType()),
        StructField("acc_wv", DoubleType()),
        StructField("acc_dt", LongType()),
        StructField("n_segments", LongType()),
    ]
)
_TWAP_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_segments", LongType()),
        StructField("observed_us", LongType()),
        StructField("twap", DoubleType()),
    ]
)


def _twap_update(key, pdfs, state: GroupState):
    (user_id,) = key
    if state.exists:
        last_us, last_value, acc_wv, acc_dt, n = state.get
    else:
        last_us, last_value, acc_wv, acc_dt, n = -1, 0.0, 0.0, 0, 0
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["us", "event_id"])
    for us, x in zip(pdf["us"].astype("int64"), pdf["value"].astype(float)):
        us = int(us)
        if last_us >= 0:
            dt = us - last_us
            if dt < 0:
                # a later batch delivered an earlier event: the fold
                # would add a NEGATIVE duration segment — unrecoverable
                # (same contract as streaming_cusum); fail loudly
                raise ValueError(
                    f"streaming_twap[{user_id}]: out-of-order event at "
                    f"{us}us after {last_us}us; per-key event-time "
                    "order across micro-batches is required"
                )
            acc_wv += last_value * dt
            acc_dt += dt
            n += 1
        last_us, last_value = us, x
    state.update((last_us, last_value, acc_wv, acc_dt, n))
    if acc_dt > 0:
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "n_segments": [n],
                "observed_us": [acc_dt],
                "twap": [acc_wv / acc_dt],
            }
        )


def streaming_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user streaming time-weighted average: one (last event,
    weighted-sum accumulator) state row per user, O(1) per event —
    the online fold of the batch twin's (``time_weighted_average``)
    LEAD-segment formulation. Integer micros accumulate exactly
    (observed_us must EQUAL the batch value); the weighted value sum
    is a float fold whose order the parity flag tolerances."""
    ensure_engine_confs(spark)
    stream = _event_stream(spark, sf_dir).select(
        "user_id",
        F.col("value").cast("double").alias("value"),
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    folded = stream.groupBy("user_id").applyInPandasWithState(
        _twap_update,
        outputStructType=_TWAP_OUT_SCHEMA,
        stateStructType=_TWAP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = drain(folded, "update")
    return out.groupBy("user_id").agg(
        F.max("n_segments").alias("s_n_segments"),
        F.max_by("observed_us", "n_segments").alias("s_observed_us"),
        F.max_by("twap", "n_segments").alias("s_twap"),
    )
