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


def _sql_bigint_array(x) -> str:
    """Nested python ints → a Spark SQL array literal string. Building
    big nested literals through ``F.lit`` walks the structure over
    py4j element by element (~1.4 s for a 1024-value codebook set);
    one SQL string parses JVM-side in microseconds."""
    if isinstance(x, (list, tuple)):
        return "array(" + ",".join(_sql_bigint_array(v) for v in x) + ")"
    return f"{int(x)}L"


def _book_lit(centroids: list[tuple[int, list[int]]]) -> F.Column:
    """The codebook as ONE array<array<long>> literal, position = cid.
    Requires (and asserts) the 0..k-1 positional cid order that
    ``lloyd_centroids`` maintains."""
    assert [c for c, _ in centroids] == list(range(len(centroids)))
    return F.expr(_sql_bigint_array([list(v) for _, v in centroids]))


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


PQ_TRAIN_SAMPLE_CAP = 10_000


def pq_train(quant: DataFrame, m: int, k: int,
             iters: int) -> list[list[tuple[int, list[int]]]]:
    """Train one deterministic Lloyd codebook per subspace. Returns m
    codebooks of [(code, coords)]. floor-quantize and slice commute
    coordinate-wise, so slicing the quantized vector equals quantizing
    the slice — the DuckDB twin does the latter.

    Codebooks train on a BOUNDED deterministic sample (``vec_id <
    PQ_TRAIN_SAMPLE_CAP``) collected once to the driver, where the
    integer Lloyd loop runs in numpy under the exact same contract
    (min-vec_id seeds, exact int64 distances, argmin ties to the
    smaller code, floor(double(sum)/count) updates, empty clusters
    keep their centroid). This is how production PQ trains — Faiss
    recommends a fixed 30k-256k training sample regardless of corpus
    size — and it is the 100 TB shape: the sample collect is O(cap),
    training cost is independent of the corpus, and the corpus-sized
    work (encode projection, ADC scan) stays fully distributed. The
    r7 distributed per-subspace Lloyd jobs spent ~7 s of fixed
    scan/analysis cost to aggregate 2 000 test vectors; the sampled
    trainer is equivalent on every test scale (corpus <= cap trains
    on everything) and strictly the right call above it. The DuckDB
    oracle applies the same cap to its training CTEs."""
    rows = sorted(
        quant.filter(F.col("vec_id") < PQ_TRAIN_SAMPLE_CAP).collect(),
        key=lambda r: int(r["vec_id"]),
    )
    return pq_train_rows(rows, m, k, iters)


def pq_train_rows(rows: list, m: int, k: int,
                  iters: int) -> list[list[tuple[int, list[int]]]]:
    """The driver-side numpy Lloyd core of :func:`pq_train`, over an
    already-collected vec_id-sorted sample (callers that hold the
    sample — e.g. the session cache feeding both trainer and recall
    probes — skip the collect)."""
    import numpy as np

    if not rows:
        raise ValueError("pq_train: empty input")
    X = np.array([list(r["qv"]) for r in rows], dtype=np.int64)
    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    sub = d // m

    books = []
    for j in range(m):
        S = X[:, j * sub:(j + 1) * sub]
        C = S[:k].copy()  # seeds: the k smallest vec_ids (rows sorted)
        for _ in range(iters):
            # exact int64 squared distances; argmin ties break to the
            # FIRST (= smallest) code, matching array_position / the
            # SQL row_number() ORDER BY d, cid
            D = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = D.argmin(axis=1)
            newC = C.copy()
            for c in range(k):
                mask = a == c
                if mask.any():
                    sums = S[mask].sum(axis=0)
                    cnt = float(int(mask.sum()))
                    newC[c] = np.array(
                        [
                            # float() casts mirror CAST(sum AS DOUBLE)/count
                            int(math.floor(float(v) / cnt))
                            for v in sums
                        ],
                        dtype=np.int64,
                    )
                # else: empty cluster keeps its centroid
            C = newC
        books.append([(c, [int(v) for v in C[c]]) for c in range(k)])
    return books


def pq_recall_candidates(spark: SparkSession, trained: tuple,
                         codes: DataFrame, probe_cap: int = 20,
                         topk: int = 5) -> DataFrame:
    """Fused exact + ADC ranking for the PQ recall contract, ONE plan.

    The ADC side is the deployment search shape: each probe
    precomputes an m x k integer distance table to the codebooks
    (driver-side — m*k*probes values, broadcast), and every corpus
    row is scored as the SUM of table lookups indexed by its CODE
    COLUMNS from the materialized code table — the 8-int tuple, never
    the raw vector. The exact side is the same-metric ground truth:
    full-vector integer euclidean distance. Computing both in one
    projection over one probe-broadcast scan lets the two
    ``row_number`` rankings ride a single probe_id exchange (two sort
    specs, one shuffle) instead of two independent crossJoin+window
    plans — the r7 composition compiled and ran the corpus scan
    twice. Returns (probe_id, neighbor_id, rn_exact, rn_adc)
    restricted to rows in either top-k — at most 2*k*probes rows,
    localCheckpointed so the recall report reads a settled relation.

    Verification semantics are unchanged from the split form: both
    rankings order by (score, neighbor_id), probes exclude
    themselves, and recall isolates quantization loss because both
    sides rank the same floor(x*1e4) int64 space."""
    from pyspark.sql import Window

    quant, books, sample = trained
    m = len(books)
    sub = len(books[0][0][1])
    codes = codes.select("vec_id", *[f"code{j}" for j in range(m)])
    base = quant.join(codes, "vec_id")  # both session-cached, id-keyed

    # probes come straight from the trainer's collected sample (it is
    # vec_id-sorted and always covers vec_id < probe_cap) — no extra job
    probe_rows = [r for r in sample if int(r["vec_id"]) < probe_cap]
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
        dt_rows.append((int(r["vec_id"]), qv, dt))
    pdf = spark.createDataFrame(
        dt_rows, "probe_id bigint, pv array<bigint>, dt array<array<bigint>>"
    )

    d_q = F.aggregate(
        F.zip_with(F.col("qv"), F.col("pv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    adc = None
    for j in range(m):
        term = F.element_at(
            F.element_at("dt", j + 1), F.col(f"code{j}") + 1
        )
        adc = term if adc is None else adc + term
    scored = (
        base.crossJoin(F.broadcast(pdf))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            d_q.alias("d_q"),
            adc.cast("long").alias("adc_q"),
        )
    )
    we = Window.partitionBy("probe_id").orderBy("d_q", "neighbor_id")
    wa = Window.partitionBy("probe_id").orderBy("adc_q", "neighbor_id")
    return (
        scored.withColumn("rn_exact", F.row_number().over(we))
        .withColumn("rn_adc", F.row_number().over(wa))
        .filter((F.col("rn_exact") <= topk) | (F.col("rn_adc") <= topk))
        .select("probe_id", "neighbor_id", "rn_exact", "rn_adc")
        .localCheckpoint(eager=True)
    )


def pq_codes_projection(quant: DataFrame,
                        books: list[list[tuple[int, list[int]]]],
                        with_qerr: bool = True) -> DataFrame:
    """One map-only projection encoding every row against the trained
    codebooks: (vec_id, code0..code{m-1}[, qerr_q]).

    All m codebooks ride ONE three-level array literal and a nested
    index-aware transform (outer lambda gets the subspace index j, so
    the generated code LOOPS over subspaces instead of unrolling m
    separate fold expressions) — the unrolled per-subspace form
    compiled ~2x slower in Janino at m=8,k=16 while executing the
    same flops. The m distance arrays land in one named column; codes
    and the quantization error are cheap array reads off it."""
    m = len(books)
    sub = len(books[0][0][1])
    for cents in books:
        assert [c for c, _ in cents] == list(range(len(cents)))
    allb = F.expr(
        _sql_bigint_array([[list(v) for _, v in cents] for cents in books])
    )
    das = F.transform(
        allb,
        lambda book, j: F.transform(
            book,
            lambda cent: F.aggregate(
                F.zip_with(
                    F.slice(F.col("qv"), j * sub + 1, F.lit(sub)),
                    cent,
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0).cast("long"),
                lambda a, d: a + d,
            ),
        ),
    )
    dists = quant.select("vec_id", das.alias("_das"))
    out = [F.col("vec_id")]
    for j in range(m):
        da = F.element_at("_das", j + 1)
        out.append(
            (F.array_position(da, F.array_min(da)) - 1)
            .cast("int")
            .alias(f"code{j}")
        )
    if with_qerr:
        out.append(
            F.aggregate(
                F.transform("_das", lambda da: F.array_min(da)),
                F.lit(0).cast("long"),
                lambda a, d: a + d,
            ).alias("qerr_q")
        )
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
