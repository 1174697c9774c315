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


def asof_join(
    probes: DataFrame,
    quotes: DataFrame,
    on: str,
    ts_col: str,
    value_cols: Sequence[str],
    seq_col: str | None = None,
    direction: str = "backward",
    tolerance: int | float | None = None,
) -> DataFrame:
    """As-of join with the full merge_asof surface. Per probe row:

    - ``backward`` (default): the latest quote with ``q.ts <= p.ts``;
    - ``forward``: the earliest quote with ``q.ts >= p.ts``;
    - ``nearest``: the closer of the two (ties break backward, the
      pandas ``merge_asof`` convention);

    ``tolerance`` (in ``ts_col`` units) nulls out matches farther than
    the bound — a row-local post-predicate, no extra pass.

    Spark has no native as-of join; the naive form (range join + per-probe
    extremum) explodes to |probes|x|quotes-per-key|. This is the scalable
    union-merge form instead: tag both sides, union, ONE window per
    direction over (key, ts) carrying the quote values with
    ``last(..., ignorenulls=True)`` — a single shuffle on the key
    (nearest adds a second SORT, never a second exchange), linear in
    rows, no pair blowup. Ties (quote.ts == probe.ts) match in every
    direction because quotes sort before probes at equal ts (tag 0 < 1);
    pass ``seq_col`` (a unique id present on both sides) to make the
    order total and the result fully deterministic.

    Returns the probe rows + ``asof_<ts_col>`` + carried value columns
    (null where no quote qualifies).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    seq = (F.col(seq_col) if seq_col else F.monotonically_increasing_id())
    q = quotes.select(
        on,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__tag"),
        seq.alias("__seq"),
        F.col(ts_col).alias("__q_ts"),
        *[F.col(c).alias(f"__q_{c}") for c in value_cols],
    )
    p = probes.select(
        on,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__tag"),
        seq.alias("__seq"),
        F.lit(None).cast(q.schema["__q_ts"].dataType).alias("__q_ts"),
        *[
            F.lit(None).cast(q.schema[f"__q_{c}"].dataType).alias(f"__q_{c}")
            for c in value_cols
        ],
        *[c for c in probes.columns if c not in (on, ts_col)],
    )
    merged = q.select(*[F.lit(None).cast(p.schema[c].dataType).alias(c)
                        if c not in q.columns else F.col(c)
                        for c in p.columns]).unionByName(p)
    cols: list = [F.col("*")]
    if direction in ("backward", "nearest"):
        wb = (
            Window.partitionBy(on)
            .orderBy("__ts", "__tag", "__seq")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cols.append(F.last("__q_ts", ignorenulls=True).over(wb).alias("__b_ts"))
        cols.extend(
            F.last(f"__q_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
            for c in value_cols
        )
    if direction in ("forward", "nearest"):
        # descending ts: the frame up to the probe holds every quote at
        # or after it; last non-null = the earliest such quote. Quotes
        # still sort before probes at equal ts (tag 0 < 1).
        wf = (
            Window.partitionBy(on)
            .orderBy(F.col("__ts").desc(), "__tag", "__seq")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cols.append(F.last("__q_ts", ignorenulls=True).over(wf).alias("__f_ts"))
        cols.extend(
            F.last(f"__q_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
            for c in value_cols
        )
    carried = merged.select(*cols)

    if direction == "backward":
        chosen_ts = F.col("__b_ts")
        chosen = {c: F.col(f"__b_{c}") for c in value_cols}
    elif direction == "forward":
        chosen_ts = F.col("__f_ts")
        chosen = {c: F.col(f"__f_{c}") for c in value_cols}
    else:
        use_b = F.col("__f_ts").isNull() | (
            F.col("__b_ts").isNotNull()
            & (
                (F.col("__ts") - F.col("__b_ts"))
                <= (F.col("__f_ts") - F.col("__ts"))
            )
        )
        chosen_ts = F.when(use_b, F.col("__b_ts")).otherwise(F.col("__f_ts"))
        chosen = {
            c: F.when(use_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}"))
            for c in value_cols
        }
    if tolerance is not None:
        ok = chosen_ts.isNotNull() & (
            F.abs(F.col("__ts") - chosen_ts) <= F.lit(tolerance)
        )
        chosen_ts = F.when(ok, chosen_ts)
        chosen = {c: F.when(ok, e) for c, e in chosen.items()}
    carried = carried.select(
        "*",
        chosen_ts.alias(f"asof_{ts_col}"),
        *[chosen[c].alias(f"asof_{c}") for c in value_cols],
    )
    keep = [on, "__ts", f"asof_{ts_col}"] + [f"asof_{c}" for c in value_cols] + [
        c for c in probes.columns if c not in (on, ts_col)
    ]
    return (
        carried.filter(F.col("__tag") == 1)
        .select(*keep)
        .withColumnRenamed("__ts", ts_col)
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: spread a hot key across ``n_salts`` reducer
    partitions (SURVEY §7.3 concept skew; SCALING §3).

    The large side gets a deterministic salt from a hash of the full row;
    the small side is exploded ×``n_salts`` so every (key, salt) pair
    still matches. Use when AQE's skew splitting isn't enough (e.g. one
    concept holding 10% of all sentences). Result equals the plain join
    for large-side-preserving join types only — right/full outer would
    null-extend each of the ``n_salts`` small-side replicas of an
    unmatched key, so those types are rejected.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "cross",
               "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: join type {how!r} would duplicate unmatched "
            f"small-side rows across salts; use one of {sorted(allowed)}"
        )
    salt = F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in large.columns])), F.lit(n_salts)
    ).cast("int")
    l_salted = large.withColumn("__salt", salt)
    s_exploded = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(s_exploded, [key, "__salt"], how).drop("__salt")
