"""End-to-end smoke of the reference-parity facade (pipeline.py): the
full reference dataflow — N-Quads → clean → corpus → LDA → polysemy →
gold evaluation → quality report — driven through the facade the way a
reference user would drive the original scripts."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from conftest import SF_DIR
from uni_mannheim_masters_thesis_spark import pipeline as P

PREFIX = "http://example.org/concept/"


def _nq_lines() -> list[str]:
    lines = []
    for i, (concept, words) in enumerate(
        [
            ("apple_", "an apple is a sweet edible fruit produced by trees"),
            ("bank_", "a bank is a financial institution that accepts deposits"),
            ("bass_", "the bass is a freshwater fish prized by anglers"),
        ]
    ):
        g = f"http://x.org/prov/{i}"
        d = f"http://x.org/deriv/{i}"
        lines += [
            f'<{PREFIX}{concept}> <http://x.org/skos#broader> <{PREFIX}thing_> <{g}> .',
            f'<{g}> <http://www.w3.org/ns/prov#wasDerivedFrom> <{d}> .',
            f'<{d}> <http://www.w3.org/ns/prov#value> "{words}" .',
        ]
    return lines


@pytest.fixture(scope="module")
def nq_path(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nq")
    path = os.path.join(str(d), "sample.nq")
    with open(path, "w") as f:
        f.write("\n".join(_nq_lines()) + "\n")
    return path


def test_fix_dataset_uris_roundtrip(spark, tmp_path, nq_path):
    out = str(tmp_path / "fixed")
    P.fix_dataset_uris(spark, nq_path, out, "x.org", "y.org")
    fixed = spark.read.text(out)
    assert fixed.filter(F.col("value").contains("x.org")).count() == 0
    assert fixed.filter(F.col("value").contains("y.org")).count() > 0


def test_read_and_clean_produces_tokens(spark, nq_path):
    docs = P.read_and_clean(spark, nq_path, concept_prefix=PREFIX)
    rows = {r["concept"]: r for r in docs.collect()}
    assert set(rows) == {"apple_", "bank_", "bass_"}
    assert "fruit" in rows["apple_"]["tokens"]
    # stopwords removed, short tokens removed
    assert "a" not in rows["bank_"]["tokens"]
    assert "is" not in rows["bass_"]["tokens"]


def test_full_reference_dataflow(spark, nq_path):
    docs = P.read_and_clean(spark, nq_path, concept_prefix=PREFIX)
    cv_model, corpus = P.build_corpus(
        docs, min_doc_words=3, min_df=1.0, max_df=1.0
    )
    corpus = corpus.withColumn("doc_id", F.xxhash64("concept")).cache()
    assert len(cv_model.vocabulary) > 5

    model = dict(P.lda_sweep(corpus, ks=[3], max_iter=3))[3]
    scored = P.detect_polysemy(model, corpus, min_probability=0.05)
    assert scored.filter(F.col("is_polysemous").isNull()).count() == 0

    gold = spark.createDataFrame(
        [("apple_", 2), ("bank_", 1), ("bass_", 1)], "concept string, gold_label int"
    )
    report = P.evaluate_predictions(scored, gold, key="concept")
    row = report.first()
    assert row["tp"] + row["fp"] + row["tn"] + row["fn"] == 3
    assert 0.0 <= row["f1"] <= 1.0

    quality = P.model_quality_report(model, corpus, top_n=5)
    qrows = quality.collect()
    assert len(qrows) == 3  # one per topic
    # u_mass is typically negative at corpus scale, but the +1 smoothing
    # makes always-co-occurring pairs positive on a 3-doc fixture —
    # assert finiteness, not sign
    assert all(r["coherence"] is not None for r in qrows)
    assert all(r["log_perplexity"] > 0 for r in qrows)


def test_hdp_emulation_prunes(spark, nq_path):
    docs = P.read_and_clean(spark, nq_path, concept_prefix=PREFIX)
    _, corpus = P.build_corpus(docs, min_doc_words=3, min_df=1.0, max_df=1.0)
    _, masses = P.hdp(corpus.cache(), truncation_k=8, mass_threshold=0.05)
    rows = masses.collect()
    assert len(rows) == 8
    assert any(r["kept"] for r in rows)


def test_supervised_run_reports_all_models(spark):
    report = P.supervised_run(spark, SF_DIR)
    models = {r["model"] for r in report.collect()}
    assert {"logistic_regression", "linear_svc", "gaussian_nb",
            "decision_tree", "random_forest", "gbt"} <= models


def test_hdp_emulation_at_reference_truncation_scale(spark):
    """M2 T-scale behavior: the reference truncates HDP at T=1000
    (wiki_hdp.py:19). A full T=1000 LDA is out of unit-test budget, but
    the pruning behavior must hold as truncation grows: at T ≫ the
    corpus's effective topic count, the kept set stabilizes (pruned
    topics absorb ~no corpus mass) and total mass stays a distribution."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from uni_mannheim_masters_thesis_spark.functions.text import tokens_pipeline
    from uni_mannheim_masters_thesis_spark.ml.topic_quality import hdp_emulation
    from uni_mannheim_masters_thesis_spark.ml.topics import vectorize
    from uni_mannheim_masters_thesis_spark.sources.testdata import load_table

    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 120)
    toks = docs.select(
        "doc_id", tokens_pipeline(F.col("text")).alias("tokens")
    ).filter(F.size("tokens") > 0)
    _, corpus = vectorize(toks, vocab_size=1 << 14)
    corpus = corpus.cache()
    try:
        _, m_small = hdp_emulation(corpus, truncation_k=20, max_iter=3)
        _, m_large = hdp_emulation(corpus, truncation_k=60, max_iter=3)
        small, large = m_small.collect(), m_large.collect()
        # corpus mass is a distribution at every truncation level
        assert abs(sum(r.corpus_mass for r in small) - 1.0) < 1e-6
        assert abs(sum(r.corpus_mass for r in large) - 1.0) < 1e-6
        kept_small = sum(r.kept for r in small)
        kept_large = sum(r.kept for r in large)
        # raising the truncation does not inflate the kept topic count
        # proportionally — extra capacity lands below the mass threshold
        # (HDP's "suggested topic count" stabilizes)
        assert kept_large <= kept_small * 2
        assert kept_large < 60
    finally:
        corpus.unpersist()


def test_cv_coherence_sliding_window_counts_match_enumeration(spark):
    """The interval-union window counting inside cv_coherence must equal
    brute-force enumeration of gensim-style sliding windows. Checked via
    a tiny corpus where enumeration is feasible in plain python."""
    from pyspark.ml.clustering import LDA
    from pyspark.sql import functions as F

    from uni_mannheim_masters_thesis_spark.ml.topic_quality import cv_coherence
    from uni_mannheim_masters_thesis_spark.ml.topics import vectorize

    docs = [
        (0, ["cat", "dog", "cat", "bird", "dog", "cat", "fish", "dog"]),
        (1, ["cat", "cat", "cat", "dog"]),
        (2, ["bird", "fish", "bird", "fish", "bird"]),
        (3, ["dog"]),
    ]
    window = 3
    df = spark.createDataFrame(docs, ["doc_id", "tokens"])
    cv_model, corpus = vectorize(df, vocab_size=64)
    model = LDA(k=2, maxIter=3, seed=42, optimizer="online").fit(corpus)
    out = cv_coherence(model, df, cv_model.vocabulary, top_n=3, window=window)
    rows = out.collect()
    assert len(rows) == 2
    assert all(-1.0 - 1e-9 <= r["cv_coherence"] <= 1.0 + 1e-9 for r in rows)

    # independently verify the window math the implementation relies on:
    # enumerate sliding windows and compare counts for one term pair
    def windows(tokens):
        n = len(tokens)
        k = max(n - window + 1, 1)
        return [set(tokens[s : s + window]) for s in range(k)]

    all_wins = [w for _, toks in docs for w in windows(toks)]
    n_cat = sum(1 for w in all_wins if "cat" in w)
    n_cat_dog = sum(1 for w in all_wins if "cat" in w and "dog" in w)
    # recompute with the interval method (same formulas as cv_coherence)
    def interval_count(toks, term):
        n = len(toks)
        nw = max(n - window + 1, 1)
        ivs = sorted(
            (max(p - window + 1, 0), min(p, nw - 1))
            for p, t in enumerate(toks) if t == term
        )
        merged, total = [], 0
        for lo, hi in ivs:
            if merged and lo <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        return merged, sum(hi - lo + 1 for lo, hi in merged)

    got_cat = sum(interval_count(toks, "cat")[1] for _, toks in docs)
    assert got_cat == n_cat
    got_pair = 0
    for _, toks in docs:
        mi, _ = interval_count(toks, "cat")
        mj, _ = interval_count(toks, "dog")
        for lo_i, hi_i in mi:
            for lo_j, hi_j in mj:
                got_pair += max(0, min(hi_i, hi_j) - max(lo_i, lo_j) + 1)
    assert got_pair == n_cat_dog


def test_cv_coherence_full_chain_matches_reference_enumeration(spark):
    """END-TO-END c_v parity (r7 verdict task 9): the distributed
    implementation's final per-topic scores must numerically equal an
    independent plain-python replay of the FULL Röder et al. chain —
    explicit sliding-window enumeration (no interval unions), NPMI
    matrix, S_one_set indirect cosine, arithmetic-mean aggregation —
    on a corpus small enough to brute-force."""
    import numpy as np
    from pyspark.ml.clustering import LDA

    from uni_mannheim_masters_thesis_spark.ml.topic_quality import cv_coherence
    from uni_mannheim_masters_thesis_spark.ml.topics import vectorize

    docs = [
        (0, ["cat", "dog", "cat", "bird", "dog", "cat", "fish", "dog"]),
        (1, ["cat", "cat", "cat", "dog", "fish", "cat"]),
        (2, ["bird", "fish", "bird", "fish", "bird", "cat"]),
        (3, ["dog", "bird", "dog"]),
        (4, ["fish"]),
    ]
    window = 3
    df = spark.createDataFrame(docs, ["doc_id", "tokens"])
    cv_model, corpus = vectorize(df, vocab_size=64)
    model = LDA(k=2, maxIter=3, seed=42, optimizer="online").fit(corpus)
    got = {
        r["topic"]: r["cv_coherence"]
        for r in cv_coherence(
            model, df, cv_model.vocabulary, top_n=3, window=window
        ).collect()
    }

    # --- independent reference: enumerate every boolean window --------
    wins = []
    for _, toks in docs:
        k = max(len(toks) - window + 1, 1)
        wins += [set(toks[s : s + window]) for s in range(k)]
    n_windows = len(wins)

    def p(*terms):
        return sum(1 for w in wins if all(t in w for t in terms)) / n_windows

    eps = 1e-12

    def npmi(ti, tj):
        if ti == tj:
            return 1.0
        pij, pi, pj = p(ti, tj), p(ti), p(tj)
        if pij <= 0 or pi <= 0 or pj <= 0:
            return 0.0
        return float(np.log((pij + eps) / (pi * pj)) / -np.log(pij + eps))

    topics = model.describeTopics(3).collect()
    for row in topics:
        terms = [cv_model.vocabulary[t] for t in row["termIndices"]]
        M = np.array([[npmi(a, b) for b in terms] for a in terms])
        tv = M.sum(axis=0)
        sims = []
        for i in range(len(terms)):
            nv, nt = np.linalg.norm(M[i]), np.linalg.norm(tv)
            sims.append(
                float(M[i] @ tv / (nv * nt)) if nv > 0 and nt > 0 else 0.0
            )
        want = round(float(np.mean(sims)), 6)
        assert abs(got[row["topic"]] - want) < 1e-9, (
            row["topic"], got[row["topic"]], want,
        )
