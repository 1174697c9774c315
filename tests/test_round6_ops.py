"""Semantic property tests for the round-6 operators — invariants the
oracle hash can't express, at sf0.001."""

from __future__ import annotations

from conftest import SF_DIR
from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY


def test_gopher_admission_rule_accounting(spark):
    """Per source: admitted ≤ docs; rejected docs are bounded by the
    union and max of the per-rule failure tallies; the rate is exactly
    admitted/docs."""
    rows = REGISTRY["gopher_admission"].fn(spark, SF_DIR).collect()
    assert rows
    fail_cols = [c for c in rows[0].asDict() if c.startswith("n_fail_")]
    assert len(fail_cols) == 6
    for r in rows:
        rejected = r["n_docs"] - r["n_admitted"]
        assert 0 <= r["n_admitted"] <= r["n_docs"]
        fails = [r[c] for c in fail_cols]
        # every rejected doc fails >= 1 rule; every failed rule rejects
        assert max(fails) <= rejected <= sum(fails)
        assert abs(r["admission_rate"] - round(r["n_admitted"] / r["n_docs"], 6)) < 1e-9


def test_make_wiki_dictionary_ids_dense_and_tfidf_positive(spark):
    """Token ids form a dense 0..V-1 range after the file roundtrip
    (an id gap means the dictionary format dropped a row) and every
    reported TF-IDF weight is positive (tf >= 1, idf > 0 since
    df <= n_docs < n_docs + 1)."""
    rows = REGISTRY["make_wiki_pipeline"].fn(spark, SF_DIR).collect()
    assert rows
    ids = {r["token_id"] for r in rows}
    # the doc_id<20 slice need not touch every dictionary entry, but
    # ids it does touch must be within a dense non-negative range
    assert min(ids) >= 0
    assert all(r["tfidf"] > 0 for r in rows)
    # one id per token and vice versa (bijection on the observed slice)
    tok_by_id = {}
    for r in rows:
        assert tok_by_id.setdefault(r["token_id"], r["token"]) == r["token"]
    id_by_tok = {}
    for r in rows:
        assert id_by_tok.setdefault(r["token"], r["token_id"]) == r["token_id"]
