"""End-to-end supervised pipeline (reference ``supervised_classifier.py``
__main__, lines 755-796): documents → topics → features → classifier
battery → per-model metrics.

The testdata has no gold polysemy table, so the pipeline derives a
learnable binary label (long-document indicator) — the plumbing (M5
features, M17 split, M19 scaling, M6-M16 battery, M23 evaluation) is
identical to the reference's; only the label source differs, exactly as
FIXTURES.md §A3 anticipates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.classify import (
    assemble_features,
    run_battery,
)
from ..ml.topics import infer_topics
from ..sources.testdata import load_table


def build_feature_table(
    spark: SparkSession, sf_dir: str, k: int = 10, max_iter: int = 5
) -> DataFrame:
    # max_iter=5 matches the reference's LdaMulticore(passes=5)
    # (webisalod_lda.py:55); the topic vectors only feed the classifier
    # battery here, so extra EM iterations buy nothing downstream
    """documents → tokens → TF vectors → LDA topics → assembled features
    with a derived binary label (n_chars above the corpus median).

    Rides the session-shared tokenized corpus and LDA fit (ml.shared) —
    the M25/M26 quality queries evaluate the same corpus, so the
    vocabulary group-count runs once per session, not once per query.
    The n_chars label source joins back broadcast-style on doc_id.
    """
    from ..ml.shared import shared_lda

    docs = load_table(spark, sf_dir, "documents")
    median_chars = docs.agg(F.expr("percentile_approx(n_chars, 0.5)")).first()[0]
    model, corpus = shared_lda(spark, sf_dir, k=k, max_iter=max_iter)
    dist = infer_topics(model, corpus)
    chars = docs.select("doc_id", "n_chars")
    feats = (
        dist.join(F.broadcast(chars), "doc_id")
        .withColumn("doc_len", F.size("tokens").cast("double"))
        .withColumn(
            "label", (F.col("n_chars") >= F.lit(median_chars)).cast("double")
        )
    )
    return assemble_features(
        feats.select("doc_id", "label", "topicDistribution", "doc_len")
    )


def supervised_battery_report(
    spark: SparkSession, sf_dir: str, include_mlp: bool = False
) -> DataFrame:
    """One row per classifier with P/R/Acc/F1 on the held-out split."""
    from ..ml.shared import shared_scaled_doc_split

    # M17 split + M19 scaling come from the session-shared cache — the
    # battery, mlp_classifier and kernel_svm_rff all score the SAME
    # scaled holdout, and the split/scale pipeline runs once per session
    train, test = shared_scaled_doc_split(spark, sf_dir)
    n_features = len(train.select("features").first()["features"])
    # F1 floor 0.75: observed per-model F1 on this task is 0.86-0.99
    # across sf0.001/0.01/0.1 — the floor leaves margin for
    # partition-count-driven fit drift (the determinism gate varies
    # shuffle partitioning) while still catching a collapse-to-chance
    # (~0.5) regression in featurization, scaling, or any single fit
    return run_battery(
        train, test, include_mlp=include_mlp, n_features=n_features,
        f1_floor=0.75,
    )


def supervised_member_report(
    spark: SparkSession, sf_dir: str, member: str
) -> DataFrame:
    """Single-model slice of the battery on the SAME shared scaled
    split — one fit per query so each bench wall is plan-determined
    (the composite ``classifier_battery`` stays registered for the
    M5-M23 end-to-end contract but is bench-skipped as a suite)."""
    from ..ml.classify import run_battery_member
    from ..ml.shared import shared_scaled_doc_split

    train, test = shared_scaled_doc_split(spark, sf_dir)
    return run_battery_member(train, test, member, f1_floor=0.75)
