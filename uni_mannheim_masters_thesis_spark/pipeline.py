"""Reference-parity facade: one function per reference entry point.

A user of ``arshad115/Uni-Mannheim-Masters-Thesis`` drives it through
six scripts; this module exposes the same steps 1:1 on the engine, so
switching means swapping the script call for the facade call:

| reference entry point | facade function |
|---|---|
| ``fix_dataset_uris.py`` (URI rewrite) | :func:`fix_dataset_uris` |
| ``Read_And_Clean.py`` ``processFile`` | :func:`read_and_clean` |
| ``webisalod_lda.py`` (corpus + k-sweep) | :func:`build_corpus`, :func:`lda_sweep` |
| ``wiki_hdp.py`` (HDP) | :func:`hdp` |
| ``polysemous_words.py`` ``train_evaluate`` | :func:`detect_polysemy`, :func:`evaluate_predictions` |
| ``supervised_classifier.py`` ``__main__`` | :func:`supervised_run` |
| ``coherence_log_perplexity.py`` | :func:`model_quality_report` |

Every function is lazy-DataFrame in/out (except model handles) and
composes the operator modules; nothing here adds new semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import MIN_DOC_WORDS, tokens_pipeline
from .ml.topics import (
    MIN_TOPIC_PROBABILITY,
    MIN_TOPICS_POLYSEMOUS,
    fit_lda,
    infer_topics,
    polysemy_flag,
    vectorize,
)
from .operators.evaluation import classification_metrics, confusion_matrix
from .sources.nquads import provenance_sentences, read_nquads

CONCEPT_PREFIX = "http://webisa.webdatacommons.org/concept/"  # Utils/Constants.py:2


def fix_dataset_uris(
    spark: SparkSession, in_path: str, out_path: str, old: str, new: str
) -> None:
    """``fix_dataset_uris.py:1-12``: stream lines, literal replace, sink.

    ``old``/``new`` are passed as literal Columns (never interpolated
    into SQL text) so quotes and regex/SQL metacharacters are inert.
    """
    (
        spark.read.text(in_path)
        .select(F.replace(F.col("value"), F.lit(old), F.lit(new)).alias("value"))
        .write.mode("overwrite")
        .text(out_path)
    )


def read_and_clean(
    spark: SparkSession, nq_path: str, concept_prefix: str = CONCEPT_PREFIX
) -> DataFrame:
    """``Read_And_Clean.py`` ``processFile`` (lines 100-156): N-Quads →
    provenance traversal → cleaned tokens per concept.

    Returns DataFrame[concept, sentence, tokens] — the engine's
    replacement for the per-concept raw/clean file pair (S4): one table,
    both representations.
    """
    quads = read_nquads(spark, nq_path)
    sentences = provenance_sentences(quads, concept_prefix)
    return sentences.withColumn("tokens", tokens_pipeline(F.col("sentence")))


def build_corpus(
    docs: DataFrame,
    tokens_col: str = "tokens",
    min_doc_words: int = MIN_DOC_WORDS,
    vocab_size: int = 1 << 18,
    min_df: float = 3.0,
    max_df: float = 0.8,
):
    """``webisalod_lda.py:35-50``: length filter (P3) + Dictionary (A1,
    with the extremes filter A3) + doc2bow (A2).

    Returns (CountVectorizerModel, corpus DataFrame with ``features``).
    """
    admitted = docs.filter(F.size(tokens_col) >= F.lit(min_doc_words))
    return vectorize(
        admitted,
        tokens_col=tokens_col,
        vocab_size=vocab_size,
        min_df=min_df,
        max_df=max_df,
    )


def lda_sweep(corpus: DataFrame, ks=range(10, 100, 10), max_iter: int = 10):
    """``webisalod_lda.py:53-58`` / ``wiki_lda.py:17-21``: the k-sweep.

    Yields (k, LDAModel). The corpus should be ``.cache()``d by the
    caller — every fit re-reads it (the reference's 99-fit loop).
    """
    for k in ks:
        yield k, fit_lda(corpus, k=k, max_iter=max_iter)


def hdp(corpus: DataFrame, truncation_k: int = 50, mass_threshold: float = 0.005):
    """``wiki_hdp.py:19-26``: HDP emulation (documented deviation —
    LDA at truncation k + corpus-mass pruning; SURVEY §7.3)."""
    from .ml.topic_quality import hdp_emulation

    return hdp_emulation(corpus, truncation_k=truncation_k,
                         mass_threshold=mass_threshold)


def detect_polysemy(
    model,
    corpus: DataFrame,
    min_probability: float = MIN_TOPIC_PROBABILITY,
    min_topics: int = MIN_TOPICS_POLYSEMOUS,
) -> DataFrame:
    """``polysemous_words.py:78-86`` ``getConceptTopics`` + rule M4:
    infer topics, apply the probability floor, flag polysemy."""
    dist = infer_topics(model, corpus)
    return dist.withColumn(
        "is_polysemous",
        polysemy_flag(F.col("topicDistribution"), min_probability, min_topics),
    )


def evaluate_predictions(
    predictions: DataFrame,
    gold: DataFrame,
    key: str,
    pred_col: str = "is_polysemous",
    gold_col: str = "gold_label",
) -> DataFrame:
    """``evaluate.py:176-215`` + ``EVResult`` (21-63): join predictions
    to the gold table (J9, broadcast — gold is dimension-sized), tally
    the confusion matrix (A4) and derive P/R/Acc/F1 (A5)."""
    joined = predictions.join(F.broadcast(gold), key)
    cm = confusion_matrix(
        joined, pred=F.col(pred_col), gold=F.col(gold_col) == 1
    )
    return classification_metrics(cm)


def supervised_run(
    spark: SparkSession, sf_dir: str, include_mlp: bool = False
) -> DataFrame:
    """``supervised_classifier.py:755-796`` ``__main__``: features →
    split → scale → battery → per-model metric rows."""
    from .plans.supervised import supervised_battery_report

    return supervised_battery_report(spark, sf_dir, include_mlp=include_mlp)


def model_quality_report(model, corpus: DataFrame, top_n: int = 10) -> DataFrame:
    """``coherence_log_perplexity.py:36-55``: log-perplexity (M25) +
    per-topic u_mass coherence (M26) in one report."""
    from .ml.topic_quality import log_perplexity, umass_coherence

    lp = log_perplexity(model, corpus)
    coh = umass_coherence(model, corpus, top_n=top_n)
    return coh.withColumn("log_perplexity", F.lit(lp))


def publish_metrics(
    metrics: DataFrame, schema: str, fmt: str = "json"
) -> DataFrame:
    """S13 (metrics sink): the reference pushes experiment scalars to
    Neptune.ai over the network (``polysemous_words.py:181-195,259-262``;
    ``supervised_classifier.py:200-201,527-537``). The engine keeps
    metrics as a relation and publishes through a durable ``df.write``
    sink instead — JSON-lines here (CSV via ``fmt='csv'``); on a cluster
    the same call targets object storage, JDBC, or a Kafka topic. Returns
    the read-back relation so callers (and the correctness oracle) can
    verify the published values byte-for-byte."""
    from .sources.formats import csv_roundtrip, json_roundtrip

    rt = json_roundtrip if fmt == "json" else csv_roundtrip
    return rt(metrics, schema)
