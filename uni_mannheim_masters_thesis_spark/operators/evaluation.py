"""Gold-standard evaluation operators (reference ``evaluate.py``).

- ``confusion_matrix`` — TP/FP/TN/FN via four conditional sums in ONE
  pass (A4; replaces the per-concept Python loop at
  ``evaluate.py:176-215``). Map-side partial aggregation means the
  shuffle carries 4 longs per partition regardless of input size.
- ``classification_metrics`` — precision/recall/accuracy/F1 scalar
  expressions (A5; ``EVResult`` at ``evaluate.py:21-63``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cnt(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def confusion_matrix(df: DataFrame, pred: Column, gold: Column) -> DataFrame:
    """One-row DataFrame[tp, fp, tn, fn] from boolean pred/gold columns."""
    return df.agg(
        _cnt(gold & pred).alias("tp"),
        _cnt(~gold & pred).alias("fp"),
        _cnt(~gold & ~pred).alias("tn"),
        _cnt(gold & ~pred).alias("fn"),
    )


def _safe_div(num: Column, den: Column) -> Column:
    return F.when(den == 0, F.lit(0.0)).otherwise(num / den)


def classification_metrics(cm: DataFrame, ndigits: int = 6) -> DataFrame:
    """Append precision/recall/accuracy/f1 to a confusion-matrix row."""
    tp, fp, tn, fn = (F.col(c).cast("double") for c in ("tp", "fp", "tn", "fn"))
    precision = _safe_div(tp, tp + fp)
    recall = _safe_div(tp, tp + fn)
    accuracy = _safe_div(tp + tn, tp + fp + tn + fn)
    f1 = _safe_div(2 * precision * recall, precision + recall)
    return cm.select(
        "tp",
        "fp",
        "tn",
        "fn",
        F.round(precision, ndigits).alias("precision"),
        F.round(recall, ndigits).alias("recall"),
        F.round(accuracy, ndigits).alias("accuracy"),
        F.round(f1, ndigits).alias("f1"),
    )
