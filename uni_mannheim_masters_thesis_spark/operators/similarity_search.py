"""Similarity search over embedding columns.

- ``knn_bruteforce`` — exact cosine top-k: probes × corpus cross join
  with the probe side broadcast, cosine via zip_with/aggregate HOFs
  (JVM-side, no UDF), row_number window for top-k. This is the baseline
  path: at 100 TB the corpus scan is embarrassingly parallel and the
  probe set broadcasts; the only shuffle is the final (tiny) top-k.
- ``lsh_ann`` — the scale path: ``BucketedRandomProjectionLSH`` buckets
  both sides so candidate generation is a bucket equi-join instead of a
  cross product (generalizes reference M14 kNN, SURVEY §2.11).

Cosine math is done in float64 after an explicit cast from the stored
float32, with a left-to-right sequential fold — deterministic and
oracle-exact.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import cosine_similarity


def knn_bruteforce(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 6,
) -> DataFrame:
    """Exact cosine top-k neighbors for each probe (self-matches excluded).

    Returns DataFrame[probe_id, neighbor_id, cosine_sim], deterministic
    tie-break on neighbor id.
    """
    from ..functions.similarity import dot

    # norms are precomputed ONCE per row (not per pair): the pair loop
    # then does a single dot-product fold — 3× less HOF work, and the
    # cosine value is bit-identical (sqrt(dot(v,v)) either way)
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("probe_vec"),
    ).withColumn("probe_norm", F.sqrt(dot(F.col("probe_vec"), F.col("probe_vec"))))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cand_vec"),
    ).withColumn("cand_norm", F.sqrt(dot(F.col("cand_vec"), F.col("cand_vec"))))
    pairs = (
        F.broadcast(p)
        .crossJoin(c)
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            dot(F.col("probe_vec"), F.col("cand_vec"))
            / (F.col("probe_norm") * F.col("cand_norm")),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("probe_id", "neighbor_id", F.round("sim", ndigits).alias("cosine_sim"))
    )


def lsh_ann(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate NN via random-projection LSH (Euclidean buckets).

    Candidate generation is a bucket equi-join; exact distance is then
    computed only on candidates. Returns
    DataFrame[probe_id, neighbor_id, eucl_dist].
    """
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(id_col, array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    p = probes.select(id_col, array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(c)
    joined = model.approxSimilarityJoin(p, c, float("inf"), distCol="eucl_dist")
    pairs = joined.select(
        F.col(f"datasetA.{id_col}").alias("probe_id"),
        F.col(f"datasetB.{id_col}").alias("neighbor_id"),
        "eucl_dist",
    ).filter(F.col("probe_id") != F.col("neighbor_id"))
    w = Window.partitionBy("probe_id").orderBy("eucl_dist", "neighbor_id")
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def majority_vote(
    nn: DataFrame,
    labels: DataFrame,
    neighbor_col: str = "neighbor_id",
    probe_col: str = "probe_id",
    label_col: str = "label",
) -> DataFrame:
    """kNN-classifier vote (M14, ``KNeighborsClassifier`` semantics,
    supervised_classifier.py:427-446): join neighbor labels (broadcast —
    the label table is id+label only), count votes per probe, keep the
    majority with a deterministic tie-break on the smallest label.

    Returns DataFrame[probe_id, predicted_label, n_votes]. Works over
    ANY neighbor relation — brute-force for exactness, ``lsh_ann`` for
    the 100 TB path.
    """
    votes = (
        nn.join(F.broadcast(labels), neighbor_col)
        .groupBy(probe_col, label_col)
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy(probe_col).orderBy(F.desc("n_votes"), label_col)
    return (
        votes.withColumn("__vr", F.row_number().over(w))
        .filter(F.col("__vr") == 1)
        .select(
            probe_col,
            F.col(label_col).cast("int").alias("predicted_label"),
            F.col("n_votes").cast("long").alias("n_votes"),
        )
    )


def ivf_ann(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: KMeans partitions the corpus into
    ``n_lists`` cells; each probe searches only its ``n_probe`` nearest
    cells, so the scan cost drops from O(corpus) to
    O(corpus * n_probe / n_lists) per probe.

    At scale the cell assignment is the partitioning key: write the
    corpus bucketed/partitioned by ``cell`` once, and every probe batch
    touches only the matching partitions (partition pruning on the
    equi-join below). The centroid table is tiny and broadcasts.

    Returns DataFrame[probe_id, neighbor_id, cosine_sim, cell].
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cand_vec"),
    ).withColumn("features", array_to_vector("cand_vec"))
    km = KMeans(k=n_lists, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(c)
    assigned = model.transform(c).select("neighbor_id", "cand_vec", "cell").cache()

    centroids = [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())]
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(centroids, "cell int, centroid array<double>")

    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("probe_vec"),
    )
    # nearest n_probe cells per probe: tiny cross join vs the centroid table
    from ..functions.similarity import sq_dist

    d2 = sq_dist(F.col("probe_vec"), F.col("centroid"))
    wc = Window.partitionBy("probe_id").orderBy("cell_dist", "cell")
    probe_cells = (
        p.crossJoin(F.broadcast(cent_df))
        .withColumn("cell_dist", d2)
        .withColumn("__cr", F.row_number().over(wc))
        .filter(F.col("__cr") <= n_probe)
        .select("probe_id", "probe_vec", "cell")
    )
    # candidate join restricted to the selected cells (partition-pruned at scale)
    cand = F.broadcast(probe_cells).join(assigned, "cell").filter(
        F.col("probe_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn(
        "sim", cosine_similarity(F.col("probe_vec"), F.col("cand_vec"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("probe_id", "neighbor_id", F.round("sim", 6).alias("cosine_sim"), "cell")
    )
