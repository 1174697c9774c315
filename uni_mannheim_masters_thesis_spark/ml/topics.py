"""Topic modeling + polysemy rule (the reference's analytical core).

Maps the reference's gensim pipeline to MLlib:

- vocabulary + BoW (``Dictionary``/``doc2bow``, webisalod_lda.py:41-50)
  → ``CountVectorizer`` (A1/A2; minDF/maxDF mirror the extremes filter A3).
- LDA training (``LdaMulticore``, webisalod_lda.py:53-58, wiki_lda.py:17-21)
  → ``pyspark.ml.clustering.LDA`` with the online optimizer (distributed;
  each EM step is a Spark job, scaling to the 4.7M-doc wiki corpus).
- topic inference (``get_document_topics``, polysemous_words.py:80-81)
  → ``LDAModel.transform`` + probability-floor filter (P10/M3).
- polysemy rule (polysemous_words.py:84, M4): polysemous ⇔
  #topics(prob ≥ minimum_probability) > minimum_topics — a pure Column
  expression over the topic-distribution vector, no UDF.

Operating point from the reference: minimum_probability = 0.0575,
minimum_topics_polysemeous = 2 (polysemous_words.py:54-57; BASELINE.md).
"""

from __future__ import annotations

from pyspark.ml.clustering import LDA, LDAModel
from pyspark.ml.feature import CountVectorizer, CountVectorizerModel
from pyspark.ml.functions import vector_to_array
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MIN_TOPIC_PROBABILITY = 0.0575  # polysemous_words.py:55
MIN_TOPICS_POLYSEMOUS = 2       # polysemous_words.py:56


def vectorize(
    docs: DataFrame,
    tokens_col: str = "tokens",
    features_col: str = "features",
    vocab_size: int = 1 << 18,
    min_df: float = 1.0,
    max_df: float | None = None,
) -> tuple[CountVectorizerModel, DataFrame]:
    """Fit a vocabulary and produce term-frequency vectors (A1/A2/A3).

    ``min_df``/``max_df`` follow CountVectorizer semantics (fraction if
    ≤ 1.0, absolute count otherwise) and mirror the reference's extremes
    filter (``filter_extremes(no_below=3, no_above=0.8)``,
    webisalod_lda.py:42). One shuffle (token group-count) then a
    broadcast-map transform; at 100 TB the vocabulary (≤ vocab_size
    entries) broadcasts while the corpus never leaves the executors.
    """
    cv = CountVectorizer(
        inputCol=tokens_col,
        outputCol=features_col,
        vocabSize=vocab_size,
        minDF=min_df,
    )
    if max_df is not None:
        cv.setMaxDF(max_df)
    model = cv.fit(docs)
    return model, model.transform(docs)


def fit_lda(
    corpus: DataFrame,
    k: int = 10,
    max_iter: int = 20,
    features_col: str = "features",
    seed: int = 42,
) -> LDAModel:
    """Train LDA (M1). Online optimizer = distributed mini-batch EM."""
    lda = LDA(
        k=k,
        maxIter=max_iter,
        seed=seed,
        optimizer="online",
        featuresCol=features_col,
    )
    return lda.fit(corpus)


def infer_topics(model: LDAModel, corpus: DataFrame) -> DataFrame:
    """Per-document topic distribution (M3) as ``topicDistribution``."""
    return model.transform(corpus)


def polysemy_n_topics(
    topic_dist: Column,
    min_probability: float = MIN_TOPIC_PROBABILITY,
) -> Column:
    """#topics with prob ≥ floor, from a topicDistribution vector (P10)."""
    return F.size(
        F.filter(
            vector_to_array(topic_dist),
            lambda p: p >= F.lit(min_probability),
        )
    )


def polysemy_flag(
    topic_dist: Column,
    min_probability: float = MIN_TOPIC_PROBABILITY,
    min_topics: int = MIN_TOPICS_POLYSEMOUS,
) -> Column:
    """The M4 rule: polysemous ⇔ #topics(prob ≥ floor) > min_topics."""
    return polysemy_n_topics(topic_dist, min_probability) > F.lit(min_topics)
