"""Hyperparameter search + transfer evaluation (reference M22 / M24).

- **Grid search** (`grid_search_logistic`): the reference runs
  ``BayesSearchCV`` (30 iter, scoring='f1',
  ``supervised_classifier.py:227-234``) — MLlib has no Bayesian
  optimizer, so this is the documented deviation to
  ``CrossValidator`` + ``ParamGridBuilder`` (SURVEY §2.8 M22). Each
  (fold, param) fit is a distributed Spark job; the grid loop is
  driver-side and small.
- **Hold-out transfer** (`holdout_transfer`): the reference trains on
  length-admitted docs and scores the trained model on the
  length-*excluded* docs (``testModelonExcluded``,
  ``supervised_classifier.py:546-561``) — here: fit on one partition of
  the data, transform the excluded partition, report the same A4/A5
  confusion metrics.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .classify import evaluate_binary

SEED = 42


def grid_search_logistic(
    data: DataFrame,
    reg_params=(0.01, 0.1, 1.0),
    elastic_net=(0.0, 0.5),
    num_folds: int = 3,
    features_col: str = "features",
    label_col: str = "label",
    seed: int = SEED,
) -> DataFrame:
    """M22: k-fold CV over an LR param grid, scored by F1.

    Returns one row per grid point: [reg_param, elastic_net_param,
    avg_f1, is_best] — the shape of the reference's search log
    (polysemous_words.py:164-178).
    """
    lr = LogisticRegression(
        maxIter=50, featuresCol=features_col, labelCol=label_col
    )
    grid = (
        ParamGridBuilder()
        .addGrid(lr.regParam, list(reg_params))
        .addGrid(lr.elasticNetParam, list(elastic_net))
        .build()
    )
    evaluator = MulticlassClassificationEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName="f1"
    )
    cv = CrossValidator(
        estimator=lr,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=num_folds,
        seed=seed,
        parallelism=4,
    )
    model = cv.fit(data)
    rows = [
        (
            float(pm[lr.regParam]),
            float(pm[lr.elasticNetParam]),
            float(metric),
        )
        for pm, metric in zip(grid, model.avgMetrics)
    ]
    best = max(r[2] for r in rows)
    spark = data.sparkSession
    out = spark.createDataFrame(
        rows, "reg_param double, elastic_net_param double, avg_f1 double"
    )
    return out.select(
        "reg_param",
        "elastic_net_param",
        F.round("avg_f1", 6).alias("avg_f1"),
        (F.col("avg_f1") >= F.lit(best)).alias("is_best"),
    )


def holdout_transfer(
    admitted: DataFrame,
    excluded: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
) -> DataFrame:
    """M24: fit on the admitted set, score the excluded set; one row of
    [split, n, tp, fp, tn, fn, precision, recall, accuracy, f1] for each
    of in-domain (admitted 20% holdout) and transfer (excluded)."""
    train, holdout = admitted.randomSplit([0.8, 0.2], seed=SEED)
    lr = LogisticRegression(
        maxIter=50, regParam=0.1, featuresCol=features_col, labelCol=label_col
    )
    model = lr.fit(train)
    out = None
    for split_name, part in (("in_domain", holdout), ("transfer", excluded)):
        scored = model.transform(part)
        row = (
            evaluate_binary(scored, label_col=label_col)
            .withColumn("split", F.lit(split_name))
            .withColumn("n", F.lit(part.count()))
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "split", "n", "tp", "fp", "tn", "fn", "precision", "recall", "accuracy", "f1"
    )


def adaptive_search_logistic(
    data: DataFrame,
    coarse=(0.001, 0.01, 0.1, 1.0),
    refine_factor: float = 3.0,
    num_folds: int = 3,
    features_col: str = "features",
    label_col: str = "label",
    seed: int = SEED,
) -> DataFrame:
    """M22, sequential variant: the reference's ``skopt.forest_minimize``
    (polysemous_words.py:271-281) is a sequential model-based search —
    each trial conditions on previous results. Full surrogate modeling
    adds nothing at this grid size, so this is the honest distributed
    middle ground (documented deviation): a coarse CV sweep, then a
    second sweep zoomed around the coarse argmax (±refine_factor in log
    space). Returns one row per trial with the stage that produced it.
    """
    stage1 = grid_search_logistic(
        data, reg_params=coarse, elastic_net=(0.0,),
        num_folds=num_folds, features_col=features_col,
        label_col=label_col, seed=seed,
    ).withColumn("stage", F.lit(1))
    best = stage1.orderBy(F.desc("avg_f1"), "reg_param").first()["reg_param"]
    refined = sorted({best / refine_factor, best, best * refine_factor})
    stage2 = grid_search_logistic(
        data, reg_params=refined, elastic_net=(0.0, 0.5),
        num_folds=num_folds, features_col=features_col,
        label_col=label_col, seed=seed,
    ).withColumn("stage", F.lit(2))
    trials = stage1.unionByName(stage2)
    top = trials.agg(F.max("avg_f1")).first()[0]
    return trials.select(
        "stage", "reg_param", "elastic_net_param", "avg_f1",
        (F.col("avg_f1") >= F.lit(top)).alias("is_best"),
    )
