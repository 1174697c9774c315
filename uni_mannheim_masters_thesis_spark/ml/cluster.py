"""Deterministic Lloyd's k-means over quantized embedding vectors.

The clustering stage of semantic curation (SemDeDup, Abbas et al. 2023,
clusters the corpus with k-means before within-cluster cosine pruning;
our ``semantic_dedup_srp`` uses SRP buckets for the same role — this
module supplies the k-means alternative as a first-class operator).

Engine-portable determinism contract (shared with the DuckDB oracle in
``plans/registry.py``):

- coordinates are quantized ``floor(double(x) * SCALE)`` int64 — every
  later distance / argmin / inertia is exact integer arithmetic, immune
  to summation order;
- centroids initialize from the ``k`` smallest ``vec_id`` rows;
- each update is ``floor(double(sum) / count)`` per coordinate — the
  int/int double division is bit-identical across engines (sums stay
  below 2^53 at test scale; at petabyte row counts promote the sum to
  DECIMAL before the divide);
- argmin ties break on the smaller centroid id;
- empty clusters keep their previous centroid.

Scale shape (the Lloyd's broadcast pattern): centroids are k x d
literals baked into the assignment expression, so each iteration is one
map-only scan plus a (cid, pos)-keyed partial aggregation that returns
exactly k x d rows to the driver — no shuffle of the vectors themselves,
no driver collect that grows with the data. Iteration count is fixed
(mini-batch style refinement, not convergence-looped), so the whole
operator is ITERS + 1 scans of a cached quantized projection.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KMEANS_SCALE = 10_000


def quantize_vectors(df: DataFrame, vec_col: str = "embedding",
                     id_col: str = "vec_id",
                     scale: int = KMEANS_SCALE) -> DataFrame:
    """Project (id, qv) with qv = floor(double(x) * scale) per coordinate."""
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long"),
    )
    return df.select(F.col(id_col).alias("vec_id"), qv.alias("qv"))


def _sqdist(qv: F.Column, centroid: list[int]) -> F.Column:
    # ONE array Literal node, not CreateArray over d child literals:
    # with k=4 and d=64 the per-element form put ~256 literal nodes in
    # every assignment expression and whole-stage codegen recompiled
    # that tree each iteration (~2 s/pass measured at bench scale —
    # compile time, not data time)
    carr = F.lit([int(v) for v in centroid]).cast("array<long>")
    diff2 = F.zip_with(qv, carr, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diff2, F.lit(0).cast("long"), lambda a, d: a + d)


def _assigned(quant: DataFrame,
              centroids: list[tuple[int, list[int]]]) -> DataFrame:
    """Project (vec_id, qv, cid, d) — nearest centroid per row, ties to
    the smallest cid.

    Shape: one projection computes each squared distance ONCE, then the
    argmin is ``least`` + an ascending-cid ``when`` chain over the
    projected columns. (The earlier array_min-of-structs form carried
    every sqdist HOF inside one giant nested expression; Catalyst spent
    ~4 s per iteration analyzing it vs ~1.4 s for this split —
    measured, data-size-independent.)"""
    d = quant.select(
        "vec_id", "qv",
        *[_sqdist(F.col("qv"), vec).alias(f"_d{c}") for c, vec in centroids],
    )
    best = F.least(*[F.col(f"_d{c}") for c, _ in centroids])
    cid = F.when(F.col(f"_d{centroids[0][0]}") == best, centroids[0][0])
    for c, _ in centroids[1:]:
        cid = cid.when(F.col(f"_d{c}") == best, c)
    return d.select(
        "vec_id", "qv", cid.cast("int").alias("cid"), best.alias("d")
    )


def lloyd_kmeans(quant: DataFrame, k: int = 4, iters: int = 2) -> DataFrame:
    """Run `iters` deterministic Lloyd updates; return per-cluster stats.

    `quant` must be (vec_id bigint, qv array<bigint>).  Output:
    (cluster_id int, n_members bigint, inertia_q bigint,
    centroid_md5 string) for every non-empty final cluster.
    """
    quant = quant.persist()
    try:
        seed_rows = quant.orderBy("vec_id").limit(k).collect()
        centroids = [(i, list(r["qv"])) for i, r in enumerate(seed_rows)]

        for _ in range(iters):
            sums = (
                _assigned(quant, centroids)
                .select("cid", F.posexplode("qv"))
                .groupBy("cid", "pos")
                .agg(F.sum("col").alias("s"), F.count(F.lit(1)).alias("c"))
                .collect()  # bounded: exactly k x d rows
            )
            by_cid: dict[int, list[tuple[int, int, int]]] = {}
            for r in sums:
                by_cid.setdefault(r["cid"], []).append((r["pos"], r["s"], r["c"]))
            centroids = [
                (
                    cid_,
                    [
                        # float() casts mirror CAST(sum AS DOUBLE)/count
                        int(math.floor(float(s) / float(c)))
                        for _, s, c in sorted(by_cid[cid_])
                    ]
                    if cid_ in by_cid
                    else vec,  # empty cluster keeps its centroid
                )
                for cid_, vec in centroids
            ]

        md5s = {
            cid_: hashlib.md5(
                ",".join(str(v) for v in vec).encode()
            ).hexdigest()
            for cid_, vec in centroids
        }
        md5_expr = F.create_map(
            *[x for cid_, h in md5s.items() for x in (F.lit(cid_), F.lit(h))]
        )
        return (
            _assigned(quant, centroids)
            .select(F.col("cid").alias("cluster_id"), "d")
            .groupBy("cluster_id")
            .agg(
                F.count(F.lit(1)).alias("n_members"),
                F.sum("d").alias("inertia_q"),
            )
            .withColumn("centroid_md5", md5_expr[F.col("cluster_id")])
            .orderBy("cluster_id")
        )
    finally:
        quant.unpersist()


def kmeans_cluster_stats(spark: SparkSession, embeddings: DataFrame,
                         k: int = 4, iters: int = 2) -> DataFrame:
    return lloyd_kmeans(quantize_vectors(embeddings), k=k, iters=iters)
