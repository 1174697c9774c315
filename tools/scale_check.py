"""Scale-up smoke check: time representative registry queries at 1x and
Nx the input scale (default 10x) on the same local box.

The Nx dataset duplicates each FACT table N times with the primary id
shifted by a copy offset while dimension tables stay as-is, so every
fact row still joins exactly one dimension row (no join fan-out) and
text/embedding payloads repeat — which is exactly the stress dedup /
curation operators must absorb (10x corpus, 10x duplicates).

Usage:
    python tools/scale_check.py [sf_dir] [factor]

Writes the scaled dataset under <repo>/.scaleN/ (git-ignored) and
prints a markdown table of per-query 1x/Nx seconds + ratio, suitable
for SCALING.md §10.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY  # noqa: E402
from uni_mannheim_masters_thesis_spark.session import get_session  # noqa: E402
from uni_mannheim_masters_thesis_spark.sources.testdata import load_table  # noqa: E402

# fact table -> primary id column shifted per copy; all other tables are
# dimensions and are copied unchanged (foreign keys keep pointing at the
# single original dim row — joins stay 1:1 per fact row at any factor)
_FACT_IDS = {
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
_DIMS = ("region", "nation", "customer", "supplier", "part")

# representative plan shapes: scan-agg, fact⋈dim, explode+group, window,
# dedup accounting, curation (shingle join, bigram agg, fingerprint
# containment), per-doc wide projection
_QUERIES = [
    "pricing_summary",
    "top_brands_by_revenue",
    "vocabulary",
    "events_sessionization",
    "dedup_stats_by_source",
    "text_profile",
    "benchmark_contamination",
    "repetition_quality",
    "cross_source_containment",
    "document_packing",
    # round-3 additions: rewritten rolling-hash fingerprint, morphy
    # lemmatizer map, LM-perplexity scoring, centered per-group trend
    "winnowing_fingerprint",
    "lemmatized_tokens",
    "quality_perplexity",
    "user_value_trend",
    # round-4 additions: window-min fingerprint SETS, temperature
    # mixture weights, partition-pruned layout roundtrip, stream-stream
    # interval join (capped state partitions), lexicon anti-join regroup
    "winnowing_fingerprint_set",
    "mixture_temperature_weights",
    "partitioned_write_pruning",
    "streaming_interval_join",
    "custom_lexicon_tokens",
    # round-4 additions: block-fingerprint paragraph dedup, bounded
    # counter-table CMS heavy hitters (batch + streaming), retrieval
    # index build + BM25 ranking
    "paragraph_dedup",
    "heavy_hitters_sketch",
    "streaming_heavy_hitters",
    "inverted_index_postings",
    "bm25_retrieval",
    # round-4 additions: SRP-bucketed semantic dedup (bucket equi-join
    # over plan-time ±1 projections), range-ranked global shuffle order
    "semantic_dedup_srp",
    "minhash_neardup_pairs",
    "training_order_shuffle",
    # round-4: one-shuffle staged funnel + cohort retention over events
    "funnel_conversion",
    "cohort_retention",
    # round-5: single-exchange session attribution, bounded ROWS-frame
    # rolling features, one-pass multi-distinct profile, two-phase
    # range-rank deciles, integer-exact PageRank over the neardup graph
    "session_attribution",
    "rolling_user_features",
    "column_profile",
    "decile_bucketing",
    "neardup_pagerank",
    "neardup_triangles",
    "events_hourly_gapfill",
    "measure_correlation",
    # round-5 completion (VERDICT r5 item 3): integer-cent histogram,
    # blocking-key JW linkage, first-5-step journey mining, streaming
    # first-touch attribution, broadcast IQR fences, the remaining
    # round-5 ops without a scale row
    "value_histogram",
    "blocked_jw_linkage",
    "session_paths",
    "streaming_session_attribution",
    "iqr_outlier_fences",
    # round-6: rule-operating-point surrogate search (cached LDA
    # inference + per-trial confusion aggregates), make_wiki
    # composition (XML ingest -> tokenize -> dictionary file -> TF-IDF)
    "rule_point_search",
    "make_wiki_pipeline",
    # round-7: deterministic integer Lloyd's k-means (literal-baked
    # map-only assignment), duplicate-span dedup (two narrow-column
    # shuffles), LSH kNN vote with the fixed probe panel
    "embedding_kmeans",
    "duplicate_span_coverage",
    "knn_vote_lsh",
    # round-7 late additions: DSIR scoring join (bucket-int shuffle +
    # two-phase global rank), the RRF fusion over two k-row lists, and
    # the two event-log lakehouse shapes (windowed MERGE / SCD-2)
    "dsir_selection",
    "hybrid_retrieval_rrf",
    "cdc_merge_upsert",
    "scd2_state_intervals",
    "ewma_user_value",
    # round-8: copy-on-write lakehouse table (bucket-granular MERGE,
    # time travel, manifest pruning), sample-trained PQ + fused recall
    "lakehouse_merge_roundtrip",
    "lakehouse_time_travel",
    "lakehouse_manifest_pruning",
    "pq_encode_codes",
    "pq_ann_recall",
    # round-8 session 2: table lifecycle (OPTIMIZE/VACUUM read +
    # accounting), incremental MV refresh, streaming CDC sink, manual
    # skew salting, BPE train + encode
    "lakehouse_read_after_vacuum",
    "lakehouse_optimize_vacuum",
    "lakehouse_incremental_mv",
    "streaming_lakehouse_sink",
    "skewed_join_salted",
    "bpe_merge_training",
    "bpe_encode_documents",
    "lakehouse_change_feed",
    "zorder_zone_map_pruning",
    # round-8 session 3: metadata-only schema evolution + restore,
    # one-pass expectation suite, bloom semi-join pruning, GK quantile
    # contract, HRW sharding, exact-k stratified sample
    "lakehouse_schema_evolution",
    "lakehouse_restore",
    "data_quality_expectations",
    "bloom_semijoin_pruning",
    "approx_quantile_contract",
    "rendezvous_sharding",
    "stratified_sample_exact",
    "bucketed_colocated_join",
    "lakehouse_rebucket",
    "lakehouse_quality_gate",
    "quality_quarantine_split",
    "events_asof_nearest",
    "event_pattern_match",
    "incremental_dedup_commit",
    "lakehouse_shallow_clone",
    "lakehouse_gdpr_purge",
    "pseudonymized_export",
    "k_anonymity_audit",
    "events_linear_interpolation",
    "levenshtein_blocked_pairs",
    "multimodal_resize",
    "skew_detection_report",
    "matryoshka_truncation_overlap",
    "hard_negative_mining",
    "curriculum_interleave",
    "join_cardinality_estimate",
    "graph_ann_beam_search",
    # round-9 additions
    "binary_neardup_pairs",
    "ann_index_build",
    "ann_query_from_index",
    "binary_dedup_manifest",
    "binary_chunk_savings",
    "ann_index_delete",
    "streaming_ann_index_refresh",
    # round-9 session 2: Markov matrix, drift monitor, RFM quintiles,
    # basket mining, chi-square, Benford, PMI bigrams, Heaps curve,
    # A-ES weighted sampling
    "markov_transitions",
    "distribution_drift_report",
    "rfm_segments",
    "market_basket_pairs",
    "chi_square_independence",
    "benford_digit_audit",
    "pmi_collocations",
    "heaps_vocab_growth",
    "weighted_sample_aes",
    "zipf_law_fit",
    "gini_concentration",
    "revenue_yoy_growth",
    "streaming_drift_monitor",
    "seasonal_anomaly_report",
    "winsorized_stats",
    "conversion_lag_percentiles",
    "bootstrap_mean_ci",
    "retrieval_metrics_ndcg",
    "ab_test_welch",
    "label_centroid_similarity",
    "share_of_parent_rollup",
    "scd2_point_in_time_join",
    "multimodal_container_parse",
    "sole_blame_suppliers",
    "customer_order_histogram",
    "cumulative_unique_users",
    "behavioral_topk_similarity",
    "replica_merkle_diff",
    "negative_sampling_table",
    # round-10 additions: the e2e curation DAG + the five most
    # expensive bench queries (r9 verdict task 9's sf1 spot set)
    "curation_pipeline_e2e",
    "truncation_loss_report",
    "unigram_entropy_quality",
    "token_budget_waterfill",
    "rule_point_search",
    "graph_ann_beam_search",
    "classifier_battery",
    "streaming_lakehouse_sink",
    "spellcheck_filtered",
    "smote_class_balance",
    # round-11 additions: TPC-H shape closure, sequential stats +
    # streaming twins, ranking metrics on the prefix-scan kernel
    "promo_revenue_share",
    "national_market_share",
    "important_parts_share",
    "top_supplier_by_revenue",
    "disjunctive_predicate_revenue",
    "global_sales_opportunity",
    "min_cost_supplier_per_part",
    "local_supplier_volume",
    "large_volume_orders",
    "dominant_part_suppliers",
    "cusum_changepoint",
    "time_weighted_average",
    "streaming_cusum_parity",
    "streaming_twap_parity",
    "roc_auc_exact",
    "pr_auc_exact",
    "probability_calibration_ece",
    # round-12 additions: the final three TPC-H shapes (Q9 two-fact-
    # column profit, Q10 returned-item top-k, Q12 two-way CASE count)
    # + the per-model battery slices' heaviest member
    "part_type_profit",
    "returned_item_ranking",
    "shipping_delay_priority_counts",
    "battery_modified_huber_sgd",
    "hdp_suggested_lda",
    "kernel_svm_rff",
    "incremental_fuzzy_dedup",
]


def _stage_snapshot(spark) -> dict:
    """(stageId, attempt) -> (shuffle write bytes, read bytes) for every
    stage the app status store retains. Diffing snapshots around a query
    attributes its shuffle volume; keying by stage id keeps the delta
    correct even if the store evicts old stages between snapshots."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    gw = sc._gateway
    empty = sc._jvm.java.util.ArrayList()
    darr = gw.new_array(gw.jvm.double, 0)
    out = {}
    stages = store.stageList(empty, False, False, darr, empty)
    it = stages.iterator()
    while it.hasNext():
        st = it.next()
        out[(st.stageId(), st.attemptId())] = (
            st.shuffleWriteBytes(), st.shuffleReadBytes()
        )
    return out


def build_scaled(spark, sf_dir: str, out_dir: str, factor: int) -> None:
    if os.path.isdir(out_dir):
        if os.environ.get("SCALE_REUSE") == "1" and all(
            os.path.isdir(os.path.join(out_dir, f"{t}.parquet"))
            for t in list(_FACT_IDS) + list(_DIMS)
        ):
            return  # reuse the previously built dataset (same sf/factor)
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    for name in _DIMS:
        load_table(spark, sf_dir, name).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    for name, id_col in _FACT_IDS.items():
        base = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        offset = (base.agg(F.max(id_col)).first()[0] or 0) + 1
        copies = [
            base.withColumn(id_col, F.col(id_col) + F.lit(int(i * offset)))
            for i in range(factor)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))


def time_queries(spark, sf_dir: str) -> dict[str, tuple[float, float]]:
    """name -> (seconds, shuffle write MB). Time is the min of two runs
    (single-JVM GC hiccups otherwise masquerade as scale effects, see
    bench.py); shuffle bytes come from the second run's stage delta and
    are deterministic per plan."""
    out = {}
    for name in _QUERIES:
        t0 = time.time()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        t1 = time.time() - t0
        before = _stage_snapshot(spark)
        t0 = time.time()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        t2 = time.time() - t0
        after = _stage_snapshot(spark)
        shuffle_w = sum(
            w for k, (w, _) in after.items() if k not in before
        )
        out[name] = (round(min(t1, t2), 2), round(shuffle_w / 1e6, 1))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # optional: restrict to the named queries (argv[3:])
    if len(sys.argv) > 3:
        global _QUERIES
        only = set(sys.argv[3:])
        unknown = only - set(_QUERIES)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        _QUERIES = [q for q in _QUERIES if q in only]
    out_dir = os.path.join(_REPO, f".scale{factor}")
    spark = get_session("scale_check")
    t0 = time.time()
    build_scaled(spark, sf_dir, out_dir, factor)
    print(f"built {factor}x dataset in {time.time() - t0:.0f}s at {out_dir}",
          file=sys.stderr)
    base = time_queries(spark, sf_dir)
    scaled = time_queries(spark, out_dir)
    print(f"| query | 1x ({os.path.basename(sf_dir.rstrip('/'))}) | {factor}x | time ratio | shuffle 1x | shuffle {factor}x | shuffle ratio |")
    print("|---|---|---|---|---|---|---|")
    for name in _QUERIES:
        (bt, bw), (st_, sw) = base[name], scaled[name]
        tr = st_ / bt if bt > 0 else float("nan")
        wr = sw / bw if bw > 0 else float("nan")
        print(f"| {name} | {bt}s | {st_}s | {tr:.1f}x | {bw}MB | {sw}MB | {wr:.1f}x |")


if __name__ == "__main__":
    main()
