"""Topic-model quality metrics + HDP emulation (M2, M25, M26).

- ``log_perplexity`` — MLlib's held-out likelihood metric
  (reference ``coherence_log_perplexity.py:36-43``).
- ``umass_coherence`` — u_mass topic coherence as a pure DataFrame
  aggregation (reference ``coherence_log_perplexity.py:45-52``, gensim
  CoherenceModel(coherence='u_mass')): top-n terms per topic from
  ``describeTopics`` joined against the doc-term incidence table,
  pairwise co-document counts, then
  sum over ordered pairs (i>j) of ln((D(wi,wj)+1)/D(wj)).
  No MLlib equivalent exists — this is the documented custom
  aggregation (SURVEY §4.3).
- ``hdp_emulation`` — the reference's nonparametric HDP
  (``wiki_hdp.py:19-26``, T=1000 truncation) has no distributed
  equivalent; we emulate with LDA at large k and post-hoc pruning of
  low-mass topics (documented deviation, SURVEY §7.3), mirroring
  ``suggested_lda_model()`` (wiki_hdp.py:25).
"""

from __future__ import annotations

from pyspark.ml.clustering import LDA, LDAModel
from pyspark.ml.stat import Summarizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def log_perplexity(model: LDAModel, corpus: DataFrame) -> float:
    """M25: upper bound on negative log-likelihood per token."""
    return float(model.logPerplexity(corpus))


def doc_term_incidence(corpus: DataFrame, features_col: str = "features",
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term_id) distinct incidence pairs from TF vectors."""
    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array(F.col(features_col))
    return (
        corpus.select(id_col, F.posexplode(arr).alias("term_id", "tf"))
        .filter(F.col("tf") > 0)
        .select(id_col, "term_id")
    )


def umass_coherence(
    model: LDAModel,
    corpus: DataFrame,
    top_n: int = 10,
    id_col: str = "doc_id",
    features_col: str = "features",
) -> DataFrame:
    """M26: per-topic u_mass coherence.

    Returns DataFrame[topic, coherence]. All heavy work is two
    aggregations over the incidence table; the topic-term lists are tiny
    (k × top_n) and broadcast.
    """
    topics = model.describeTopics(top_n).select(
        "topic", F.posexplode("termIndices").alias("rank", "term_id")
    )
    # restrict the incidence table to the k×top_n topic terms FIRST —
    # the co-occurrence self-join below is then O(top_terms² per doc)
    # instead of O(vocab² per doc), and the aggregated `co` table is at
    # most (k·top_n)² rows, safely broadcastable at any corpus size
    terms = topics.select("term_id").distinct()
    inc = (
        doc_term_incidence(corpus, features_col, id_col)
        .join(F.broadcast(terms), "term_id")
        .cache()
    )
    try:
        # D(w): document frequency per top term
        docfreq = inc.groupBy("term_id").agg(
            F.countDistinct(id_col).alias("df")
        )

        # D(wi, wj): co-document counts for ordered pairs within a topic
        ti = topics.select("topic", F.col("rank").alias("rank_i"), F.col("term_id").alias("term_i"))
        tj = topics.select("topic", F.col("rank").alias("rank_j"), F.col("term_id").alias("term_j"))
        pairs = ti.join(tj, "topic").filter(F.col("rank_i") > F.col("rank_j"))

        inc_i = inc.select(F.col(id_col).alias("d"), F.col("term_id").alias("term_i"))
        inc_j = inc.select(F.col(id_col).alias("d2"), F.col("term_id").alias("term_j"))
        co = (
            inc_i.join(inc_j, (F.col("d") == F.col("d2")))
            .groupBy("term_i", "term_j")
            .agg(F.count(F.lit(1)).alias("co_df"))
        )

        scored = (
            pairs.join(F.broadcast(co), ["term_i", "term_j"], "left")
            .join(F.broadcast(docfreq.select(F.col("term_id").alias("term_j"), "df")), "term_j")
            .fillna({"co_df": 0})
            .withColumn("score", F.log((F.col("co_df") + 1.0) / F.col("df")))
        )
        return scored.groupBy("topic").agg(
            F.round(F.sum("score"), 6).alias("coherence")
        ).localCheckpoint(eager=True)
    finally:
        inc.unpersist()


def hdp_emulation(
    corpus: DataFrame,
    truncation_k: int = 50,
    mass_threshold: float = 0.005,
    max_iter: int = 20,
    features_col: str = "features",
    seed: int = 42,
) -> tuple[LDAModel, DataFrame]:
    """M2: LDA at truncation-level k, then prune topics by corpus mass.

    Returns (model, DataFrame[topic, corpus_mass, kept]). The suggested
    topic count = number of kept topics — the analogue of HDP's
    suggested_lda_model export.
    """
    lda = LDA(k=truncation_k, maxIter=max_iter, seed=seed,
              optimizer="online", featuresCol=features_col)
    model = lda.fit(corpus)
    dist = model.transform(corpus)
    mean_vec = dist.select(
        Summarizer.mean(F.col("topicDistribution")).alias("m")
    ).first()["m"]
    rows = [(i, float(v)) for i, v in enumerate(mean_vec)]
    spark = corpus.sparkSession
    masses = spark.createDataFrame(rows, ["topic", "corpus_mass"]).withColumn(
        "kept", F.col("corpus_mass") >= F.lit(mass_threshold)
    )
    return model, masses
