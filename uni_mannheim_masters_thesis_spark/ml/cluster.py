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


def _book_lit(centroids: list[tuple[int, list[int]]]) -> F.Column:
    """The codebook as ONE array<array<long>> literal, position = cid.
    Requires (and asserts) the 0..k-1 positional cid order that
    ``lloyd_centroids`` maintains."""
    assert [c for c, _ in centroids] == list(range(len(centroids)))
    return F.lit([list(v) for _, v in centroids]).cast("array<array<long>>")


def _dist_arr(qv: F.Column, centroids: list[tuple[int, list[int]]]) -> F.Column:
    """array of k squared distances, index = cid — a single transform
    fold over the codebook literal. One expression per codebook instead
    of k projected columns: with k=16 x m=8 subspaces the per-column
    form put 128 aggregate-lambda expressions in one projection and
    Catalyst's analysis dominated the runtime (~16 s at bench scale vs
    ~4 s for this form; the flops are identical)."""
    return F.transform(
        _book_lit(centroids),
        lambda cent: F.aggregate(
            F.zip_with(qv, cent, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda a, d: a + d,
        ),
    )


def _assigned(quant: DataFrame,
              centroids: list[tuple[int, list[int]]]) -> DataFrame:
    """Project (vec_id, qv, cid, d) — nearest centroid per row, ties to
    the smallest cid (array_position returns the FIRST index holding
    the minimum)."""
    d = quant.select("vec_id", "qv", _dist_arr(F.col("qv"), centroids).alias("_da"))
    best = F.array_min(F.col("_da"))
    cid = (F.array_position(F.col("_da"), best) - 1).cast("int")
    return d.select("vec_id", "qv", cid.alias("cid"), best.alias("d"))


def lloyd_centroids(
    quant: DataFrame, k: int = 4, iters: int = 2
) -> list[tuple[int, list[int]]]:
    """The deterministic Lloyd centroid loop alone: seeds from the k
    smallest vec_ids, ``iters`` floor-div updates, empty clusters keep
    their centroid. Returns the final [(cid, coords)] list — shared by
    ``lloyd_kmeans`` (full-vector clustering) and the product-quantizer
    codebooks (per-subspace clustering)."""
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
    return centroids


def lloyd_kmeans(quant: DataFrame, k: int = 4, iters: int = 2) -> DataFrame:
    """Run `iters` deterministic Lloyd updates; return per-cluster stats.

    `quant` must be (vec_id bigint, qv array<bigint>).  Output:
    (cluster_id int, n_members bigint, inertia_q bigint,
    centroid_md5 string) for every non-empty final cluster.
    """
    quant = quant.persist()
    try:
        centroids = lloyd_centroids(quant, k=k, iters=iters)

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


def pq_train(quant: DataFrame, m: int, k: int,
             iters: int) -> list[list[tuple[int, list[int]]]]:
    """Train one deterministic Lloyd codebook per subspace over an
    already-quantized (vec_id, qv) frame. Returns m codebooks of
    [(code, coords)]. floor-quantize and slice commute coordinate-wise,
    so slicing the quantized vector equals quantizing the slice — the
    DuckDB twin does the latter."""
    first = quant.select(F.size("qv").alias("d")).first()
    if first is None:
        raise ValueError("pq_train: empty input")
    d = int(first["d"])
    if d % m != 0:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    sub = d // m
    # the m codebooks are independent — train them as concurrent Spark
    # job groups (each is a chain of small driver-bounded collects, so
    # serial execution would pay m x the driver round-trip latency)
    from concurrent.futures import ThreadPoolExecutor

    def one(j: int):
        sq = quant.select(
            "vec_id", F.slice("qv", j * sub + 1, sub).alias("qv")
        )
        return lloyd_centroids(sq, k=k, iters=iters)

    with ThreadPoolExecutor(max_workers=m) as ex:
        return list(ex.map(one, range(m)))


def pq_adc_topk(spark: SparkSession, embeddings: DataFrame,
                probe_cap: int = 20, m: int = 4, k: int = 8,
                iters: int = 2, topk: int = 5,
                trained: tuple | None = None,
                codes: DataFrame | None = None) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ code table: each
    probe precomputes an m x k integer distance table to the codebooks
    (driver-side — m*k*probes values), then every corpus vector is
    scored as the SUM of table lookups indexed by its codes. The scan
    reads the 4-int code tuple, never the raw vector — the PQ read
    reduction in action. Returns (probe_id, neighbor_id, adc_q) rows,
    top-k per probe by (adc_q, neighbor_id)."""
    from pyspark.sql import Window

    owns_cache = trained is None
    if trained is not None:
        # the caller's shared cached frame — do NOT unpersist it here
        quant, books = trained
    else:
        quant = quantize_vectors(embeddings).persist()
        books = None
    try:
        if books is None:
            books = pq_train(quant, m=m, k=k, iters=iters)
        m = len(books)
        sub = len(books[0][0][1])
        if codes is None:
            codes = pq_codes_projection(quant, books, with_qerr=False)
        else:
            # caller's (possibly cached) code table — the ADC scan only
            # reads vec_id + the m code columns
            codes = codes.select(
                "vec_id", *[f"code{j}" for j in range(m)]
            )

        probe_rows = quant.filter(F.col("vec_id") < probe_cap).collect()
        dt_rows = []
        for r in probe_rows:
            qv = list(r["qv"])
            dt = [
                [
                    sum(
                        (a - b) * (a - b)
                        for a, b in zip(qv[j * sub:(j + 1) * sub], vec)
                    )
                    for _, vec in cents
                ]
                for j, cents in enumerate(books)
            ]
            dt_rows.append((int(r["vec_id"]), dt))
        pdf = spark.createDataFrame(
            dt_rows, "probe_id bigint, dt array<array<bigint>>"
        )
        adc = None
        for j in range(m):
            term = F.element_at(
                F.element_at("dt", j + 1), F.col(f"code{j}") + 1
            )
            adc = term if adc is None else adc + term
        scored = (
            codes.crossJoin(F.broadcast(pdf))
            .filter(F.col("vec_id") != F.col("probe_id"))
            .select(
                "probe_id",
                F.col("vec_id").alias("neighbor_id"),
                adc.cast("long").alias("adc_q"),
            )
        )
        w = Window.partitionBy("probe_id").orderBy("adc_q", "neighbor_id")
        result = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= topk)
            .drop("__rn")
            .localCheckpoint(eager=True)  # settle before unpersist
        )
        return result
    finally:
        if owns_cache:
            quant.unpersist()


def exact_quantized_topk(spark: SparkSession, embeddings: DataFrame,
                         probe_cap: int = 20, topk: int = 5) -> DataFrame:
    """EXACT integer-euclidean top-k over the quantized vectors — the
    deterministic ground truth the ADC path is measured against (both
    sides rank the same floor(x*1e4) int64 space, so recall isolates
    quantization loss; and being all-integer, a DuckDB oracle replays
    the ranking bit-exactly)."""
    from pyspark.sql import Window

    quant = quantize_vectors(embeddings)
    probes = quant.filter(F.col("vec_id") < probe_cap).select(
        F.col("vec_id").alias("probe_id"), F.col("qv").alias("pv")
    )
    d = F.aggregate(
        F.zip_with(F.col("qv"), F.col("pv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    scored = (
        quant.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            d.alias("d_q"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy("d_q", "neighbor_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= topk)
        .drop("__rn")
    )


def pq_codes_projection(quant: DataFrame,
                        books: list[list[tuple[int, list[int]]]],
                        with_qerr: bool = True) -> DataFrame:
    """One map-only projection encoding every row against the trained
    codebooks: (vec_id, code0..code{m-1}[, qerr_q])."""
    m = len(books)
    sub = len(books[0][0][1])
    dists = quant.select(
        "vec_id",
        *[
            _dist_arr(
                F.slice(F.col("qv"), j * sub + 1, sub), cents
            ).alias(f"_da{j}")
            for j, cents in enumerate(books)
        ],
    )
    out = [F.col("vec_id")]
    qerr = None
    for j in range(m):
        da = F.col(f"_da{j}")
        best = F.array_min(da)
        out.append(
            (F.array_position(da, best) - 1).cast("int").alias(f"code{j}")
        )
        qerr = best if qerr is None else qerr + best
    if with_qerr:
        out.append(qerr.cast("long").alias("qerr_q"))
    return dists.select(*out)


def pq_encode(spark: SparkSession, embeddings: DataFrame,
              m: int = 4, k: int = 8, iters: int = 2) -> DataFrame:
    """Product quantization (Jégou, Douze, Schmid 2011, "Product
    Quantization for Nearest Neighbor Search"): split each vector into
    ``m`` subspaces, train a ``k``-centroid codebook per subspace under
    the integer Lloyd contract above, and encode every vector as its
    per-subspace argmin codes.

    Output: (vec_id, code0..code{m-1} int, qerr_q bigint) — qerr_q is
    the exact integer squared quantization error summed over subspaces.
    Fully deterministic, hash-exact against the DuckDB replay.

    Scale shape: training is ITERS+1 scans per subspace with k×sub-row
    partial aggregations (the Lloyd broadcast pattern, vectors never
    shuffle); encoding is ONE map-only projection computing all m×k
    subspace distances with the codebooks baked as literals — at 100 TB
    the encode is embarrassingly parallel and the 8-bit-per-subspace
    code table is what downstream ADC search scans instead of the raw
    vectors (a 32x read reduction at m=4, k<=256 over 64 float32s)."""
    quant = quantize_vectors(embeddings).persist()
    try:
        books = pq_train(quant, m=m, k=k, iters=iters)
        return pq_codes_projection(quant, books, with_qerr=True)
    finally:
        quant.unpersist()
