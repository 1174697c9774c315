"""Round-12 operator tests: per-model battery slices, the HDP
suggested-LDA export, and the RFF exact-kernel bound."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from conftest import SF_DIR
from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY


def test_battery_member_matches_composite_row(spark):
    """A battery_* slice must reproduce the composite battery's row for
    the same model EXACTLY (same estimator params, same seed, same
    shared split): the split changed the bench accounting, never the
    fits."""
    composite = {
        r["model"]: (r["tp"], r["fp"], r["tn"], r["fn"])
        for r in REGISTRY["classifier_battery"].fn(spark, SF_DIR).collect()
    }
    for member in ("decision_tree", "gaussian_nb"):
        row = (
            REGISTRY[f"battery_{member}"].fn(spark, SF_DIR).first()
        )
        assert (row["tp"], row["fp"], row["tn"], row["fn"]) == composite[
            member
        ], member
        assert row["ok_counts"] and row["ok_metric_range"]


def test_battery_member_unknown_name_raises(spark):
    from uni_mannheim_masters_thesis_spark.ml.classify import (
        run_battery_member,
    )

    df = spark.range(1)
    with pytest.raises(KeyError, match="unknown battery member"):
        run_battery_member(df, df, "no_such_model")


def test_suggested_lda_export_is_row_stochastic_and_dense(spark):
    """The export's structural contract: topics renumbered densely
    0..k'-1 in old-topic order, per-topic weights sum to 1, every term
    resolves in the vocabulary, and ONLY kept topics are exported."""
    from uni_mannheim_masters_thesis_spark.ml.shared import (
        shared_corpus,
        shared_hdp,
    )
    from uni_mannheim_masters_thesis_spark.ml.topic_quality import (
        suggested_lda_export,
    )

    cv_model, _ = shared_corpus(spark, SF_DIR)
    model, masses = shared_hdp(spark, SF_DIR, truncation_k=20)
    vocab = list(cv_model.vocabulary)
    export = suggested_lda_export(model, masses, vocab, top_n=10)
    rows = export.collect()
    kept = sorted(
        r["topic"] for r in masses.filter("kept").select("topic").collect()
    )
    got_old = sorted({r["old_topic"] for r in rows})
    assert got_old == kept
    new_ids = sorted({r["new_topic"] for r in rows})
    assert new_ids == list(range(len(kept)))  # dense renumbering
    # old-topic order preserved under renumbering
    pairs = sorted({(r["old_topic"], r["new_topic"]) for r in rows})
    assert [n for _, n in pairs] == list(range(len(kept)))
    from collections import defaultdict

    sums = defaultdict(float)
    for r in rows:
        sums[r["new_topic"]] += r["init_weight"]
        assert vocab[r["term_id"]] == r["term"]
    for t, s in sums.items():
        assert abs(s - 1.0) < 1e-9, (t, s)


def test_rff_exact_comparison_deterministic(spark):
    """Same session, same inputs -> bit-identical comparison dict (the
    slice is sorted, the map seeded, the solves closed-form)."""
    from uni_mannheim_masters_thesis_spark.ml.kernel import (
        rff_exact_comparison,
    )
    from uni_mannheim_masters_thesis_spark.ml.shared import (
        shared_scaled_doc_split,
    )

    train, test = shared_scaled_doc_split(spark, SF_DIR)
    a = rff_exact_comparison(train, test, n_train_slice=120, n_test_slice=60)
    b = rff_exact_comparison(train, test, n_train_slice=120, n_test_slice=60)
    assert a == b
    assert 0.0 <= a["f1_exact_kernel"] <= 1.0
    assert 0.0 <= a["f1_rff"] <= 1.0
    assert a["mean_gram_err"] < a["max_gram_err"]


def test_battery_suite_skip_keeps_driver_coverage():
    """classifier_battery must stay in the registry (driver contract)
    while being bench-skipped, and all seven members must be registered
    rows-only queries."""
    from uni_mannheim_masters_thesis_spark.plans.registry import (
        _DRIVER_SUITES,
    )

    assert "classifier_battery" in REGISTRY
    assert "classifier_battery" in _DRIVER_SUITES
    members = [q for q in REGISTRY if q.startswith("battery_")]
    assert len(members) == 7
    for m in members:
        assert REGISTRY[m].sql is None  # rows-only by design
        assert m not in _DRIVER_SUITES


def test_incremental_fuzzy_dedup_policy_and_stages(spark):
    """Hand-built micro-case: exact twin in index -> exact_dup with
    dist 0; fuzzy overlap -> fuzzy_dup with exact Jaccard; disjoint
    arrival -> admitted; empty-token arrival -> admitted with zero
    matches; within-batch exact twin -> lower id wins (greedy)."""
    from uni_mannheim_masters_thesis_spark.operators.dedup import (
        incremental_fuzzy_dedup,
        minhash_band_table,
        minhash_token_sets,
        token_set_fingerprint,
    )

    existing = spark.createDataFrame(
        [
            (1, ["alpha", "beta", "gamma", "delta"]),
            (2, ["mu", "nu", "xi", "omicron"]),
        ],
        "doc_id long, tokens array<string>",
    )
    ets = minhash_token_sets(existing).withColumn(
        "tsfp", token_set_fingerprint(F.col("ts"))
    )
    ebands = minhash_band_table(ets.select("id", "ts"))
    arriving = spark.createDataFrame(
        [
            (10, ["delta", "gamma", "beta", "alpha"]),  # exact set twin of 1
            (11, ["alpha", "beta", "gamma", "epsilon"]),  # fuzzy vs 1 (J=3/5)
            (12, ["zeta", "eta", "theta"]),               # disjoint
            (13, []),                                      # empty
            (14, ["zeta", "theta", "eta"]),               # exact twin of 12
        ],
        "doc_id long, tokens array<string>",
    )
    rows = {
        r["doc_id"]: r
        for r in incremental_fuzzy_dedup(arriving, ebands, ets).collect()
    }
    assert rows[10]["stage"] == "exact_dup" and not rows[10]["admitted"]
    assert rows[10]["best_match_id"] == 1
    assert rows[10]["best_match_dist"] == 0.0
    assert rows[10]["n_existing_matches"] == 1

    assert rows[11]["stage"] == "fuzzy_dup" and not rows[11]["admitted"]
    assert rows[11]["best_match_id"] == 1
    assert abs(rows[11]["best_match_dist"] - (1 - 3 / 5)) < 1e-9

    assert rows[12]["stage"] == "admitted" and rows[12]["admitted"]
    assert rows[12]["best_match_id"] is None

    assert rows[13]["stage"] == "admitted" and rows[13]["admitted"]
    assert rows[13]["n_existing_matches"] == 0

    # 14 is an exact twin of batch-mate 12 (lower id, itself admitted)
    assert rows[14]["stage"] == "exact_dup" and not rows[14]["admitted"]
    assert rows[14]["best_match_id"] == 12
    assert rows[14]["n_batch_matches"] == 1
    assert rows[14]["n_existing_matches"] == 0
