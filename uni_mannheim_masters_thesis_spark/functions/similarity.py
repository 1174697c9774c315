"""Similarity scalar functions.

- ``jaro_winkler`` — fuzzy string similarity (reference ``evaluate.py:19,
  100-106``, strsimpy JaroWinkler, threshold 0.95). No Spark builtin, so
  this is one of the engine's two sanctioned pandas_udfs (SURVEY §2.10):
  Arrow-batched, vectorized over pairs.
- ``cosine_similarity`` / ``dot`` — embedding cosine via ``zip_with`` +
  ``aggregate`` higher-order functions: pure JVM expressions, no UDF,
  so brute-force kNN stays inside WholeStageCodegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(i + match_window + 1, len2)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    transpositions //= 2
    return (
        matches / len1 + matches / len2 + (matches - transpositions) / matches
    ) / 3.0


def jaro_winkler_py(s1: str, s2: str, prefix_weight: float = 0.1,
                    boost_threshold: float = 0.7) -> float:
    """Plain-Python Jaro-Winkler (standard: prefix bonus only above 0.7)."""
    if s1 is None or s2 is None:
        return 0.0
    sim = _jaro(s1, s2)
    if sim > boost_threshold:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        sim += prefix * prefix_weight * (1.0 - sim)
    return sim


@F.pandas_udf(T.DoubleType())
def jaro_winkler(s1: pd.Series, s2: pd.Series) -> pd.Series:
    """Vectorized Jaro-Winkler similarity over string pairs."""
    return pd.Series(
        [jaro_winkler_py(a, b) for a, b in zip(s1, s2)], dtype="float64"
    )


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (JVM-side, no UDF).

    Left-to-right sequential fold — deterministic and bit-identical to a
    sequential kernel, which keeps oracle comparisons exact.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (JVM-side)."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def sq_dist(a: Column, b: Column) -> Column:
    """Squared euclidean distance of two array<double> columns
    (left-to-right HOF fold, same determinism contract as ``dot``)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
