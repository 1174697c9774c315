"""Golden-output tests against the reference's OWN shipped evaluation
fixtures (SURVEY §5.2 layer 2): the gold-standard label table and the
confusion-matrix/metric operators must reproduce the reference's
published numbers (BASELINE.md: 3,929 concepts = 390 polysemous
label-1 + 3,539 non-polysemous label-2; concept∩wiki set = 3,758).

The fixtures are read from /root/reference (read-only data, not code)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

GOLD_DIR = "/root/reference/data/evaluation/wiki"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLD_DIR), reason="reference fixtures not present"
)


@pytest.fixture(scope="module")
def gold(spark):
    with open(f"{GOLD_DIR}/conceptInWikiOrDisambiguation.json") as f:
        d = json.load(f)
    return spark.createDataFrame(
        [(k, int(v)) for k, v in d.items()], "concept string, gold_label int"
    ).cache()


def test_gold_set_counts_match_baseline(spark, gold):
    # BASELINE.md: 3,929 concepts — 390 disambiguation (1), 3,539 wiki (2)
    counts = {r["gold_label"]: r["n"] for r in
              gold.groupBy("gold_label").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {1: 390, 2: 3539}
    assert gold.count() == 3929


def test_concept_wiki_set_size_matches_baseline(spark):
    # conceptWikis.json is a jsonpickle set {"py/set": [...]} — S5's
    # pickled-set-to-table mapping (SURVEY §2.1)
    with open(f"{GOLD_DIR}/conceptWikis.json") as f:
        payload = json.load(f)
    titles = payload["py/set"]
    df = spark.createDataFrame([(t,) for t in titles], "title string")
    assert df.distinct().count() == 3758  # BASELINE.md row 6


def test_metrics_on_reference_gold_reproduce_reference_semantics(spark, gold):
    """Run the engine's J9+A4+A5 path on the real gold table with the
    degenerate always-polysemous rule; P/R/Acc/F1 then have closed-form
    values the reference's EVResult math (evaluate.py:21-63) must give:
    every label-1 is a TP, every label-2 a FP."""
    from uni_mannheim_masters_thesis_spark.pipeline import evaluate_predictions

    preds = gold.select("concept", F.lit(True).alias("is_polysemous"))
    row = evaluate_predictions(preds, gold, key="concept").first()
    assert (row["tp"], row["fp"], row["tn"], row["fn"]) == (390, 3539, 0, 0)
    assert row["precision"] == round(390 / 3929, 6)
    assert row["recall"] == 1.0
    assert row["accuracy"] == round(390 / 3929, 6)
    f1 = 2 * (390 / 3929) / (390 / 3929 + 1.0)
    assert abs(row["f1"] - f1) < 1e-6


def test_clean_names_cover_gold_concepts(spark):
    with open(f"{GOLD_DIR}/cleanConceptNames.json") as f:
        names = json.load(f)
    assert len(names) == 3929  # one clean name per gold concept


# -- shipped topic model consistency (M2 HDP emulation premise) ---------------

MODEL_NPY = "/root/reference/output/models/concept/lda_10.gensim.expElogbeta.npy"


@pytest.mark.skipif(
    not os.path.isfile(MODEL_NPY), reason="reference model not present"
)
def test_shipped_lda10_consistent_with_hdp_emulation_premise():
    """The thesis's ACTUAL operating point is the shipped k=10 model
    (polysemous_words.py:18-19 loads lda_10.gensim). Our M2 HDP
    emulation (ml/topic_quality.py hdp_emulation) approximates HDP as
    LDA at a truncation level + corpus-mass pruning — its premise is
    that the thesis point sits where NO topic would be pruned (k=10 is
    at or below the corpus's intrinsic topic count, so HDP-style
    pruning keeps all 10). That premise is checkable from the shipped
    term-topic matrix alone (expElogbeta.npy — a plain float array; the
    .state/.id2word pickles are never loaded):

    - exactly 10 topics over the thesis vocabulary;
    - every topic is a proper (sub-)distribution after gensim's
      exp(digamma) normalization;
    - every topic LEARNED structure: an unused topic under online LDA
      stays at the symmetric prior, i.e. near-uniform with entropy
      ~log(V); all shipped topics sit far below that ceiling
      (measured 2.8-5.2 vs log(781)=6.66);
    - no two topics collapsed into duplicates (pairwise cosine far
      from 1; measured max 0.372).

    A pruned-or-degenerate shipped topic would falsify the emulation's
    mass-threshold semantics; this pins the comparison the round-9
    verdict asked for (referenced from COVERAGE.md's M2 row).
    """
    import numpy as np

    a = np.load(MODEL_NPY, allow_pickle=False).astype(np.float64)
    k, v = a.shape
    assert k == 10  # the thesis operating point
    assert np.isfinite(a).all() and (a > 0).all()
    row_sums = a.sum(axis=1)
    # exp(E[log beta]) under-sums 1 by Jensen; must stay a sub-distribution
    assert ((row_sums > 0.3) & (row_sums <= 1.0 + 1e-6)).all()
    p = a / row_sums[:, None]
    entropy = -(p * np.log(p)).sum(axis=1)
    # every topic far below the uniform/unused ceiling log(V)
    assert (entropy < 0.85 * np.log(v)).all()
    # and none degenerate to a near-single-term spike
    assert (entropy > 1.0).all()
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    cos = an @ an.T
    off = cos - np.eye(k)
    assert off.max() < 0.8  # no duplicated/collapsed topic pair
