"""Invariant tests for batch-3 operators: resampling (M20/M21), format
roundtrips (S5-S11), IVF ANN, and the stateful streaming counters."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from conftest import SF_DIR
from uni_mannheim_masters_thesis_spark.ml.resample import (
    remove_tomek_links,
    smote,
    tomek_links,
)
from uni_mannheim_masters_thesis_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def binarized(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    return emb.select(
        "vec_id", "embedding", (F.col("label") == 0).cast("int").alias("label")
    ).cache()


def test_smote_reaches_parity(spark, binarized):
    out = smote(binarized, minority_label=1)
    counts = {r["label"]: r["n"] for r in
              out.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts[1] == counts[0]


def test_smote_synthetic_rows_marked_and_minority(spark, binarized):
    out = smote(binarized, minority_label=1)
    synth = out.filter(F.col("vec_id") < 0)
    assert synth.count() > 0
    assert synth.filter(F.col("label") != 1).count() == 0
    # synthetic vectors have the same dimensionality
    dims = synth.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r["d"] for r in dims] == [64]


def test_smote_deterministic(spark, binarized):
    a = sorted(smote(binarized, minority_label=1)
               .filter(F.col("vec_id") < 0)
               .select(F.round(F.element_at("embedding", 1), 6).alias("x"))
               .toPandas()["x"].tolist())
    b = sorted(smote(binarized, minority_label=1)
               .filter(F.col("vec_id") < 0)
               .select(F.round(F.element_at("embedding", 1), 6).alias("x"))
               .toPandas()["x"].tolist())
    assert a == b


def test_tomek_links_are_cross_class(spark, binarized):
    links = tomek_links(binarized).collect()
    assert len(links) > 0
    for r in links:
        assert r["label_a"] != r["label_b"]
        assert r["id_a"] < r["id_b"]


def test_tomek_removal_only_drops_majority(spark, binarized):
    before = {r["label"]: r["n"] for r in
              binarized.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    cleaned = remove_tomek_links(binarized, majority_label=0)
    after = {r["label"]: r["n"] for r in
             cleaned.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert after[1] == before[1]          # minority untouched
    assert after[0] < before[0]           # some majority members dropped


def test_dictionary_text_roundtrip_preserves_rows(spark):
    from uni_mannheim_masters_thesis_spark.sources.formats import (
        read_dictionary_text,
        write_dictionary_text,
    )

    vocab = spark.createDataFrame(
        [(0, "alpha", 10), (1, "beta", 3), (2, "gamma", 7)],
        "id int, token string, docfreq long",
    )
    target = write_dictionary_text(vocab, num_docs=42)
    back = read_dictionary_text(spark, target)
    assert sorted(back.collect()) == sorted(vocab.collect())


def test_matrix_market_roundtrip_exact(spark):
    from uni_mannheim_masters_thesis_spark.sources.formats import (
        read_matrix_market,
        write_matrix_market,
    )

    trip = spark.createDataFrame(
        [(0, 0, 1.5), (0, 3, 0.25), (2, 1, 3.125)],
        "row_id long, col_id long, value double",
    )
    target = write_matrix_market(trip, n_rows=3, n_cols=4)
    back = read_matrix_market(spark, target)
    assert sorted(back.collect()) == sorted(trip.collect())


def test_ivf_ann_subset_of_cells(spark):
    from uni_mannheim_masters_thesis_spark.operators.similarity_search import ivf_ann

    emb = load_table(spark, SF_DIR, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    out = ivf_ann(emb, probes, k=5, n_lists=4, n_probe=2)
    rows = out.collect()
    assert len(rows) == 15  # 3 probes × 5 neighbors
    # each probe's neighbors come from at most n_probe cells
    cells_per_probe = {}
    for r in rows:
        cells_per_probe.setdefault(r["probe_id"], set()).add(r["cell"])
    assert all(len(c) <= 2 for c in cells_per_probe.values())


def test_asof_join_tie_and_missing(spark):
    from uni_mannheim_masters_thesis_spark.operators.relational import asof_join

    quotes = spark.createDataFrame(
        [(1, 100, 10, 1.0), (1, 200, 11, 2.0), (2, 500, 12, 9.0)],
        "user_id long, ts_us long, event_id long, value double",
    )
    probes = spark.createDataFrame(
        [(1, 150, 20), (1, 200, 21), (1, 50, 22), (3, 999, 23)],
        "user_id long, ts_us long, event_id long",
    )
    out = {r["event_id"]: r for r in asof_join(
        probes, quotes, on="user_id", ts_col="ts_us",
        value_cols=["value"], seq_col="event_id",
    ).collect()}
    assert out[20]["asof_value"] == 1.0        # latest quote before 150
    assert out[21]["asof_value"] == 2.0        # tie: quote at equal ts matches
    assert out[22]["asof_value"] is None       # no quote precedes 50
    assert out[23]["asof_value"] is None       # key with no quotes at all


def test_smote_extreme_shortfall_reaches_parity(spark):
    # n_min=3, n_maj=40: quota per point (14,13,13) exceeds the 2
    # available neighbor edges — edges must be reused (resampling with
    # replacement), still reaching exact parity
    import random

    random.seed(7)
    rows = [(i, [random.random() for _ in range(8)], 0) for i in range(40)]
    rows += [(100 + i, [random.random() for _ in range(8)], 1) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = smote(df, minority_label=1)
    counts = {r["label"]: r["n"] for r in
              out.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {0: 40, 1: 40}
    # all synthetic ids unique
    synth_ids = [r["vec_id"] for r in out.filter(F.col("vec_id") < 0).collect()]
    assert len(synth_ids) == len(set(synth_ids)) == 37


def test_connected_components_raises_on_non_convergence(spark, monkeypatch):
    import pytest as _pytest

    from uni_mannheim_masters_thesis_spark.operators.dedup import (
        connected_components,
    )

    # the guard lives in the distributed loop; pin that path (r13's
    # small-edge-list dispatch would otherwise resolve the chain locally)
    monkeypatch.setenv("SPARK_GRAFT_CC_LOCAL_BUDGET", "0")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)


def test_salted_join_rejects_right_outer(spark):
    import pytest as _pytest

    from uni_mannheim_masters_thesis_spark.operators.relational import salted_join

    df = spark.createDataFrame([(1, "a")], "k long, x string")
    with _pytest.raises(ValueError, match="join type"):
        salted_join(df, df, "k", how="full")


def test_rff_approximates_rbf_kernel(spark):
    """E[z(x)·z(y)] = exp(-γ‖x−y‖²): the seeded RFF map must reproduce
    the rbf kernel within the O(1/√D) Monte-Carlo error."""
    import math
    import random

    from uni_mannheim_masters_thesis_spark.ml.kernel import rff_features

    random.seed(3)
    rows = [(i, [random.gauss(0, 1) for _ in range(16)]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    gamma = 0.05
    z = {r["vec_id"]: r["rff"] for r in
         rff_features(df, n_features=512, gamma=gamma).collect()}
    vecs = dict(rows)
    for a, b in [(0, 1), (2, 3), (4, 5), (6, 7)]:
        approx = sum(x * y for x, y in zip(z[a], z[b]))
        d2 = sum((x - y) ** 2 for x, y in zip(vecs[a], vecs[b]))
        exact = math.exp(-gamma * d2)
        assert abs(approx - exact) < 0.12, (a, b, approx, exact)


def test_tomek_lsh_matches_exact_path(spark, binarized):
    from uni_mannheim_masters_thesis_spark.ml.resample import tomek_links

    exact = sorted(
        (r.id_a, r.id_b)
        for r in tomek_links(binarized, method="numpy").collect()
    )
    lsh = sorted(
        (r.id_a, r.id_b)
        for r in tomek_links(binarized, method="lsh").collect()
    )
    assert lsh == exact


def test_tomek_blocked_matches_exact_path(spark, binarized):
    """The default (blocked distributed BLAS) path is EXACT — identical
    link set to the in-memory kernel, with no driver-side collect."""
    from uni_mannheim_masters_thesis_spark.ml.resample import tomek_links

    exact = sorted(
        (r.id_a, r.id_b)
        for r in tomek_links(binarized, method="numpy").collect()
    )
    blocked = sorted(
        (r.id_a, r.id_b)
        for r in tomek_links(binarized).collect()  # default method
    )
    assert blocked == exact


def test_dense_index_is_permutation(spark):
    from uni_mannheim_masters_thesis_spark.ml.resample import _dense_index

    df = spark.createDataFrame([(i,) for i in range(257)], ["id"])
    out = _dense_index(df, "id").collect()
    assert sorted(r["__pr"] for r in out) == list(range(1, 258))
    # deterministic across invocations
    again = _dense_index(df, "id").collect()
    assert {r["id"]: r["__pr"] for r in out} == {
        r["id"]: r["__pr"] for r in again
    }


def test_tpe_search_deterministic_and_improves(spark):
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from uni_mannheim_masters_thesis_spark.ml.search import (
        adaptive_search_logistic,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias(
            "features"
        ),
        (F.col("label") < 5).cast("double").alias("label"),
    ).cache()
    out1 = adaptive_search_logistic(emb, n_trials=6, n_init=3).collect()
    out2 = adaptive_search_logistic(emb, n_trials=6, n_init=3).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    assert sum(1 for r in out1 if r["is_best"]) >= 1
    # proposals stay inside the declared search space
    assert all(1e-4 - 1e-12 <= r["reg_param"] <= 10.0 + 1e-9 for r in out1)


def test_knn_auto_dispatch_by_size(spark):
    """knn_within(method='auto') broadcasts small inputs (numpy path)
    but switches to the blocked distributed kernel when the estimated
    dense build side exceeds the broadcast budget — same exact results
    either way, different plan (no driver collect on the big side)."""
    from unittest import mock

    from uni_mannheim_masters_thesis_spark.ml import resample
    from uni_mannheim_masters_thesis_spark.ml.resample import knn_within

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    with mock.patch.object(
        resample, "_knn_within_blocked", wraps=resample._knn_within_blocked
    ) as blocked, mock.patch.object(
        resample, "_knn_within_numpy", wraps=resample._knn_within_numpy
    ) as numpy_path:
        small = knn_within(emb, k=3)  # fits the 64 MiB default budget
        assert numpy_path.call_count == 1 and blocked.call_count == 0
        # force "too big to broadcast" via a tiny budget
        big = knn_within(emb, k=3, broadcast_budget_bytes=1)
        assert blocked.call_count == 1
    # neighbor ids + ranks identical; distances agree to float noise
    # (BLAS matmul blocking differs between the two kernels by an ulp)
    s_rows = sorted((r.id, r.nn_rank, r.nn_id, r.dist) for r in small.collect())
    b_rows = sorted((r.id, r.nn_rank, r.nn_id, r.dist) for r in big.collect())
    assert [(a, b, c) for a, b, c, _ in s_rows] == [
        (a, b, c) for a, b, c, _ in b_rows
    ]
    assert all(
        abs(sd - bd) <= 1e-9 * max(1.0, sd)
        for (*_, sd), (*_, bd) in zip(s_rows, b_rows)
    )


def test_rule_point_search_synthetic_landscape(spark):
    """On a synthetic corpus where the optimal rule point is interior
    and ALL THREE dimensions matter (min_probability, min_topics, and
    the MIN_DOC_LEN admission gate), the surrogate search finds a point
    that dominates all eight box corners, stays in the box, and is
    deterministic across invocations."""
    from uni_mannheim_masters_thesis_spark.ml.search import rule_point_search

    # 450 docs in three strata:
    # - gold-positive docs (len 300): 3 topic probs at 0.08, visible
    #   only when min_prob <= 0.08 and min_topics <= 3;
    # - negatives (len 300): one dominant topic;
    # - SHORT NOISE (len 10): gold-positive label but negative-looking
    #   probs — perfect F1 additionally requires min_doc_len in
    #   (10, 300] to exclude them, so the length gate genuinely bites
    rows = []
    for i in range(400):
        if i % 2:
            rows.append(([0.08, 0.08, 0.08, 0.76] + [0.0] * 6, True, 300))
        else:
            rows.append(([0.9, 0.06, 0.04] + [0.0] * 7, False, 300))
    for _ in range(50):
        rows.append(([0.9, 0.06, 0.04] + [0.0] * 7, True, 10))
    scored = spark.createDataFrame(
        rows, "topic_probs array<double>, gold boolean, doc_len int"
    )
    out = rule_point_search(scored).collect()
    assert len(out) == 15
    assert all(r.ok_trials_complete and r.ok_f1_range and r.ok_in_box
               and r.ok_best_geq_corners for r in out)
    best = max(out, key=lambda r: r.f1)
    # perfect separation is reachable only at interior points (e.g.
    # min_prob <= 0.08, min_topics in {2,3}, min_doc_len in (10, 300])
    # — no box corner can reach it: len=5 admits the noise, len=500
    # admits nothing — so the is_best winner must be interior (the
    # pinned box CENTER (0.075, 3, 252) is one such point, making the
    # perfect plateau deterministically reachable)
    assert best.f1 == 1.0
    assert (best.min_probability, best.min_topics) not in {
        (0.05, 1), (0.05, 5), (0.1, 1), (0.1, 5)
    } or best.min_doc_len not in (5, 500)
    assert 10 < best.min_doc_len <= 300
    # corner trials: the min_doc_len=500 corners admit zero docs (F1 0)
    # and the min_doc_len=5 corners admit the noise (F1 < 1)
    for r in out[:8]:
        assert r.f1 < 1.0
    again = rule_point_search(scored).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.01", "/root/testdata/sf0.1"],
    ids=["sf0.01", "sf0.1-bench-scale"],
)
def test_knn_dispatch_boundary_blocked_hash_matches_numpy(spark, sf_dir):
    """r11 verdict item 7: the knn_within auto-dispatch is the SMOTE
    scale-safety story — pin its equivalence AT BENCH SCALE, not just
    on a 50-row slice. The budget is forced just below the minority
    class's measured dense bytes, so 'auto' must engage the blocked
    distributed kernel, and its full (id, nn_id, rank, dist) output
    must hash-equal the numpy broadcast path's on the same data."""
    import hashlib
    import os

    from uni_mannheim_masters_thesis_spark.ml.resample import (
        _dense_matrix_bytes,
        knn_within,
    )

    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    minority = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("label") == 0)
        .select("vec_id", "embedding")
    )
    dense_bytes = _dense_matrix_bytes(minority, "embedding")
    assert dense_bytes > 0

    def _digest(df):
        rows = sorted(
            (r["id"], r["nn_id"], r["nn_rank"], round(r["dist"], 9))
            for r in df.collect()
        )
        return hashlib.sha256(repr(rows).encode()).hexdigest()

    auto = knn_within(
        minority, k=5, broadcast_budget_bytes=dense_bytes - 1
    )
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan, plan  # blocked kernel engaged
    assert "MapInPandas" not in plan, plan        # numpy path NOT planned
    numpy_path = knn_within(minority, k=5, method="numpy")
    assert _digest(auto) == _digest(numpy_path)
