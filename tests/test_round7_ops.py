"""Semantic property tests for the round-7 operators — invariants the
oracle hash can't express, at sf0.001."""

from __future__ import annotations

from conftest import SF_DIR
from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY


def test_embedding_kmeans_partition_and_inertia(spark):
    """Every vector lands in exactly one cluster (member counts sum to
    the table count), cluster ids stay within the seeded range, and the
    total quantized inertia is non-increasing over Lloyd iterations
    (floor-quantized centroid updates keep the classic monotonicity at
    this scale)."""
    from uni_mannheim_masters_thesis_spark.ml.cluster import (
        lloyd_kmeans,
        quantize_vectors,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    quant = quantize_vectors(emb)

    inertias = []
    for iters in (0, 1, 2):
        rows = lloyd_kmeans(quant, k=4, iters=iters).collect()
        assert sum(r["n_members"] for r in rows) == n
        assert all(0 <= r["cluster_id"] < 4 for r in rows)
        assert all(
            len(r["centroid_md5"]) == 32
            and set(r["centroid_md5"]) <= set("0123456789abcdef")
            for r in rows
        )
        inertias.append(sum(r["inertia_q"] for r in rows))
    assert inertias[0] >= inertias[1] >= inertias[2]


def test_duplicate_span_coverage_invariants(spark):
    """Every reported doc has >=1 removed window; merged spans cover at
    least one window's worth of tokens but never more than the doc;
    windows-per-span accounting is consistent (a span of length L built
    from K-token windows holds at most L-K+1 and at least
    ceil(L/K)... >=1 windows); the ratio is exactly covered/n_tokens."""
    K = 8
    rows = REGISTRY["duplicate_span_coverage"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_dup_windows"] >= 1
        assert r["n_spans"] >= 1
        assert K <= r["covered_tokens"] <= r["n_tokens"]
        # each merged span is >= K tokens -> coverage >= n_spans * K
        assert r["covered_tokens"] >= r["n_spans"] * K
        # a span of length L holds at most L-K+1 start positions
        assert r["n_dup_windows"] <= r["covered_tokens"] - r["n_spans"] * (K - 1)
        assert abs(
            r["coverage_ratio"] - round(r["covered_tokens"] / r["n_tokens"], 6)
        ) < 1e-9
        assert len(r["spans_md5"]) == 32


def test_duplicate_span_keep_first_never_marks_unique_docs(spark):
    """A document whose every window is globally unique must not appear
    in the manifest — and the keep-first policy means at least one
    occurrence of every duplicated window hash survives outside it."""
    from pyspark.sql import functions as F

    out = REGISTRY["duplicate_span_coverage"].fn(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    n_flagged = out.count()
    assert 0 < n_flagged < n_docs
    # total removed windows < total duplicated window occurrences
    # (first occurrence of each hash is always kept)
    total_removed = out.agg(F.sum("n_dup_windows")).first()[0]
    assert total_removed >= n_flagged


def test_streaming_throughput_multi_batch_invariants(spark):
    """The multi-micro-batch replay must run under BOTH state-store
    providers (default HDFS-backed and RocksDB), process >=10 data
    batches per stateful query each, keep per-batch latency flat, evict
    two-stream join state, and lose ZERO pairs versus the batch
    interval self-join — the r8 proof that the RocksDB deployment claim
    is a conf swap, not a code change."""
    rows = REGISTRY["streaming_throughput_report"].fn(spark, SF_DIR).collect()
    by_pq = {}
    for r in rows:
        by_pq.setdefault((r["provider"], r["query"]), []).append(r)
        assert r["ok_min_batches"], r
        assert r["ok_flat_latency"], r
        assert r["ok_state_evicts"], r
        assert r["ok_pairs_match_batch"], r
        assert r["input_rows"] > 0
    assert set(by_pq) == {
        (p, q)
        for p in ("hdfs", "rocksdb")
        for q in ("session_window", "interval_join")
    }
    for (p, q), qrows in by_pq.items():
        assert len(qrows) >= 10, (p, q, len(qrows))
        # batch ids are the distinct consecutive micro-batches
        ids = sorted(r["batch_id"] for r in qrows)
        assert ids == list(range(ids[0], ids[0] + len(ids)))
    # RocksDB actually held state (its memory metric is the block-cache
    # + memtable footprint — nonzero whenever stores were loaded)
    rocks_state = [
        r["state_bytes"]
        for r in rows
        if r["provider"] == "rocksdb" and r["state_rows"] > 0
    ]
    assert rocks_state and max(rocks_state) > 0
    # both providers drained identical join results
    pairs = {r["provider"]: r["n_joined_pairs"] for r in rows}
    assert pairs["hdfs"] == pairs["rocksdb"]


def test_pq_encode_total_and_determinism(spark):
    """Every vector gets exactly one code tuple; codes stay inside the
    16-entry codebooks; the integer quantization error is non-negative;
    and a second invocation is bit-identical (the Lloyd contract)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    rows1 = REGISTRY["pq_encode_codes"].fn(spark, SF_DIR).collect()
    assert len(rows1) == n
    for r in rows1:
        for j in range(8):
            assert 0 <= r[f"code{j}"] < 16
        assert r["qerr_q"] >= 0
    rows2 = REGISTRY["pq_encode_codes"].fn(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))


def test_pq_adc_recall_beats_random_and_flags_hold(spark):
    """The ADC ranking must beat the random-top-5 baseline by orders of
    magnitude (ok_mean_recall floor 0.2 vs ~0.005 random at sf0.001)
    and every exact row carries the full 5-neighbor set."""
    rows = REGISTRY["pq_ann_recall"].fn(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_exact"] == 5
        assert r["ok_mean_recall"] is True
        assert len(r["exact_top5_md5"]) == 32


def test_embedding_kmeans_registry_shape(spark):
    """The registered query returns the documented 4-column schema and
    at most k rows, deterministically across invocations."""
    df = REGISTRY["embedding_kmeans"].fn(spark, SF_DIR)
    assert df.columns == ["cluster_id", "n_members", "inertia_q", "centroid_md5"]
    rows1 = df.collect()
    rows2 = REGISTRY["embedding_kmeans"].fn(spark, SF_DIR).collect()
    assert rows1 == rows2
    assert 0 < len(rows1) <= 4


def test_dsir_selection_rank_permutation_and_quota(spark):
    """Every document appears exactly once, sel_rank is a permutation of
    1..n, exactly ceil(n/5) docs are selected, and the selected set is
    exactly the rank-prefix (Gumbel-top-k semantics)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    rows = REGISTRY["dsir_selection"].fn(spark, SF_DIR).collect()
    assert len(rows) == n
    assert sorted(r["sel_rank"] for r in rows) == list(range(1, n + 1))
    k = (n + 4) // 5
    selected = {r["doc_id"] for r in rows if r["is_selected"] == 1}
    assert len(selected) == k
    by_rank = sorted(rows, key=lambda r: r["sel_rank"])
    assert all(r["is_selected"] == 1 for r in by_rank[:k])
    assert all(r["is_selected"] == 0 for r in by_rank[k:])


def test_dsir_weights_favor_the_target_language(spark):
    """The importance weights must separate the target distribution:
    mean log-weight of lang='en' docs strictly above mean log-weight of
    lang='zh' docs (the least-latin, least-en-like slice). A hashing or
    smoothing regression that flattens the weights breaks this."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    rows = (
        REGISTRY["dsir_selection"].fn(spark, SF_DIR)
        .join(docs, "doc_id")
        .collect()
    )
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["log_weight"])
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert mean(by_lang["en"]) > mean(by_lang["zh"])
    # and the target language dominates the selected quota
    sel = [r for r in rows if r["is_selected"] == 1]
    en_share_sel = sum(1 for r in sel if r["lang"] == "en") / len(sel)
    en_share_all = len(by_lang["en"]) / len(rows)
    assert en_share_sel > en_share_all


def test_hybrid_rrf_fusion_invariants(spark):
    """Top-10 fused list: scores strictly ordered desc with doc_id
    tiebreak, every row carries at least one arm membership (rank in
    1..20, 0 = absent), and the score equals the closed-form RRF of the
    reported ranks."""
    rows = REGISTRY["hybrid_retrieval_rrf"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    keys = [(-r["rrf_score"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert 0 <= r["lex_rank"] <= 20 and 0 <= r["dense_rank"] <= 20
        assert r["lex_rank"] > 0 or r["dense_rank"] > 0
        expect = round(
            (1.0 / (60 + r["lex_rank"]) if r["lex_rank"] else 0.0)
            + (1.0 / (60 + r["dense_rank"]) if r["dense_rank"] else 0.0),
            9,
        )
        assert abs(r["rrf_score"] - expect) < 1e-12


def test_cdc_merge_semantics(spark):
    """MERGE law checks against a direct recomputation: surviving keys
    = (base ∪ cdc-upserts) minus cdc-deletes; actions match membership;
    the reported state is the latest op's payload."""
    from pyspark.sql import functions as F

    from uni_mannheim_masters_thesis_spark.sources.testdata import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.unix_micros("ts").alias("us"),
    )
    lo, hi = ev.agg(F.min("us"), F.max("us")).first()
    mid = (lo + hi) // 2
    rows = ev.collect()
    latest_base, latest_cdc, n_base, n_cdc = {}, {}, {}, {}
    for r in sorted(rows, key=lambda r: (r["us"], r["event_id"])):
        if r["us"] <= mid:
            latest_base[r["user_id"]] = r
            n_base[r["user_id"]] = n_base.get(r["user_id"], 0) + 1
        else:
            latest_cdc[r["user_id"]] = r
            n_cdc[r["user_id"]] = n_cdc.get(r["user_id"], 0) + 1

    out = {r["user_id"]: r
           for r in REGISTRY["cdc_merge_upsert"].fn(spark, SF_DIR).collect()}
    deleted = {u for u, r in latest_cdc.items() if r["event_type"] == "error"}
    expected_keys = (set(latest_base) | set(latest_cdc)) - deleted
    assert set(out) == expected_keys
    for u, r in out.items():
        src = latest_cdc.get(u) or latest_base[u]
        assert r["last_event_type"] == src["event_type"]
        assert abs(r["last_value"] - round(src["value"], 2)) < 1e-9
        assert r["n_base_ops"] == n_base.get(u, 0)
        assert r["n_cdc_ops"] == n_cdc.get(u, 0)
        if u not in latest_cdc:
            assert r["merge_action"] == "unchanged"
        elif u not in latest_base:
            assert r["merge_action"] == "insert"
        else:
            assert r["merge_action"] == "update"
    # the tombstone path must actually fire on this dataset
    assert deleted, "fixture has no trailing-error users; test is vacuous"


def test_scd2_intervals_tile_the_timeline(spark):
    """Per user: versions are contiguous half-open intervals
    ([from, to) chains with no gaps/overlaps), exactly one is_current
    row with int64-max valid_to, version numbers are 1..k in interval
    order, adjacent versions change state, and n_events sums to the
    user's event count."""
    from pyspark.sql import functions as F

    from uni_mannheim_masters_thesis_spark.sources.testdata import load_table

    ev_counts = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = REGISTRY["scd2_state_intervals"].fn(spark, SF_DIR).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(by_user) == set(ev_counts)
    INT64_MAX = 9223372036854775807
    for u, vs in by_user.items():
        vs.sort(key=lambda r: r["valid_from_us"])
        assert [r["version_no"] for r in vs] == list(range(1, len(vs) + 1))
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]  # no gap/overlap
            assert a["state"] != b["state"]  # runs are maximal
            assert a["is_current"] == 0
        assert vs[-1].is_current == 1
        assert vs[-1].valid_to_us == INT64_MAX
        assert sum(r["n_events"] for r in vs) == ev_counts[u]


def test_pq_encode_standalone_wrapper(spark):
    """ml.cluster.pq_encode — the cache-free public API (train + encode
    in one call, own persist lifecycle) — produces the identical code
    table the session-cached path serves, at non-default (m=4, k=8)."""
    from uni_mannheim_masters_thesis_spark.ml.cluster import (
        pq_codes_projection,
        pq_encode,
        pq_train,
        quantize_vectors,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = pq_encode(spark, emb, m=4, k=8, iters=2).collect()
    assert len(rows) == emb.count()
    for r in rows:
        for j in range(4):
            assert 0 <= r[f"code{j}"] < 8
        assert r["qerr_q"] >= 0
    quant = quantize_vectors(emb)
    books = pq_train(quant, m=4, k=8, iters=2)
    again = pq_codes_projection(quant, books, with_qerr=True).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ewma_matches_sequential_recursion(spark):
    """The closed-form decimal-summed EWMA must equal the textbook
    sequential recursion (ewma_i = 0.2*x_i + 0.8*ewma_{i-1}, init =
    first value) computed row-by-row in Python, to the output round."""
    from pyspark.sql import functions as F

    from uni_mannheim_masters_thesis_spark.sources.testdata import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "value", F.unix_micros("ts").alias("us"), "event_id"
    ).collect()
    seq = {}
    by_user = {}
    for r in sorted(ev, key=lambda r: (r["us"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r["value"])
    for u, xs in by_user.items():
        e = xs[0]
        for x in xs[1:]:
            e = 0.2 * x + 0.8 * e
        seq[u] = e
    out = REGISTRY["ewma_user_value"].fn(spark, SF_DIR).collect()
    assert {r["user_id"] for r in out} == set(seq)
    for r in out:
        assert r["n_events"] == len(by_user[r["user_id"]])
        assert r["last_value"] == round(by_user[r["user_id"]][-1], 2)
        assert abs(r["ewma"] - seq[r["user_id"]]) < 1e-5
