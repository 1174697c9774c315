"""SURVEY §2 coverage map: every operator ID → implementation + registry
queries. ``python tools/coverage_map.py`` regenerates ``COVERAGE.md``;
``tests/test_coverage.py`` asserts the map is complete and every claim
resolves (query exists in the registry, impl imports).

Format: ID -> (impl path "module:attr" or note, [registry query names]).
IDs whose impl starts with "excluded:" are documented out-of-scope items.
"""

from __future__ import annotations

COVERAGE: dict[str, tuple[str, list[str]]] = {
    # --- §2.1 scans / sources / sinks -----------------------------------
    "S1": ("sources.nquads:read_nquads", ["nquads_provenance"]),
    "S2": ("pipeline:fix_dataset_uris", ["replace_rewrite"]),
    "S3": ("sources.testdata:load_table", ["clean_documents"]),
    "S4": (
        "pipeline:read_and_clean  # one partitioned table replaces "
        "file-per-concept (SCALING §1)",
        ["clean_documents", "partitioned_write_pruning"],
    ),
    "S5": ("sources.formats:json_roundtrip", ["artifact_formats_roundtrip", "json_artifact_roundtrip"]),
    "S6": ("sources.formats:csv_roundtrip", ["artifact_formats_roundtrip", "csv_metrics_roundtrip"]),
    "S7": ("sources.formats:csv_roundtrip", ["artifact_formats_roundtrip", "csv_metrics_roundtrip", "orc_corpus_roundtrip"]),
    "S8": ("operators.dedup:exact_dedup  # line-set scan = text read + distinct",
           ["distinct_user_event_pairs"]),
    "S9": ("sources.formats:read_dictionary_text", ["artifact_formats_roundtrip", "dictionary_text_roundtrip", "make_wiki_pipeline"]),
    "S10": ("sources.formats:read_matrix_market", ["artifact_formats_roundtrip", "matrix_market_roundtrip"]),
    "S11": ("sources.formats:model_save_load_roundtrip", ["model_save_load"]),
    "S12": ("plans.registry:q_xml_roundtrip", ["artifact_formats_roundtrip", "xml_corpus_roundtrip", "make_wiki_pipeline"]),
    "S13": ("pipeline:publish_metrics", ["classification_metrics_events"]),
    # --- §2.2 projections / filters -------------------------------------
    "P1": ("sources.nquads:provenance_sentences", ["nquads_provenance"]),
    "P2": ("sources.nquads:provenance_sentences", ["nquads_provenance"]),
    "P3": ("pipeline:build_corpus", ["flagship_polysemy", "doc_length_classes"]),
    "P4": ("functions.text:remove_stopwords", ["tokenized_documents", "custom_lexicon_tokens"]),
    "P5": ("functions.text:drop_short_tokens", ["tokenized_documents"]),
    "P6": ("plans.registry:q_spellcheck", ["spellcheck_filtered", "custom_lexicon_tokens"]),
    "P7": ("plans.registry:q_spellcheck", ["spellcheck_filtered", "custom_lexicon_tokens"]),
    "P8": ("functions.text:drop_empty", ["tokenized_documents"]),
    "P9": (
        "sources.testdata:load_table  # table model has no missing files; "
        "dropna at ingest",
        ["clean_documents"],
    ),
    "P10": ("ml.topics:polysemy_n_topics", ["polysemy_rule_vectors"]),
    # --- §2.3 string/text functions -------------------------------------
    "T1": ("functions.text:clean_string", ["clean_documents"]),
    "T2": ("functions.text:clean_string", ["clean_documents"]),
    "T3": ("functions.text:remove_numbers", ["tokenized_documents"]),
    "T4": ("functions.text:tokenize  # NLTK-parity golden: tests/test_nltk_parity_golden.py (spec-derived word_tokenize goldens; divergence bounded to the 8 Treebank alpha contractions)", ["tokenized_documents"]),
    "T5": ("functions.text:morphy_lemmatize  # NLTK-parity golden: tests/test_nltk_parity_golden.py (morphy(7WN) goldens; divergences bounded to pos-priority + oov-stem classes)", ["lemmatized_tokens"]),
    "T6": ("pipeline:fix_dataset_uris", ["replace_rewrite"]),
    "T7": ("functions.text:tokenize", ["tokenized_documents", "lemmatized_tokens"]),
    "T8": ("plans.registry:q_concat", ["concat_segment_name"]),
    "T9": ("functions.similarity:jaro_winkler", ["jaro_winkler_pairs"]),
    "T10": ("sources.nquads:provenance_sentences  # key mangling at ingest",
            ["nquads_provenance"]),
    # --- §2.4 joins ------------------------------------------------------
    "J1": ("operators.relational:per_group_first",
           ["first_order_per_customer", "nquads_provenance"]),
    "J2": ("sources.nquads:provenance_sentences", ["nquads_provenance"]),
    "J3": ("sources.nquads:provenance_sentences", ["nquads_provenance"]),
    "J4": ("pipeline:evaluate_predictions", ["classification_metrics_events"]),
    "J5": ("pipeline:evaluate_predictions  # broadcast dim lookup",
           ["revenue_by_nation"]),
    "J6": ("plans.registry:q_nation_except", ["set_ops_nations", "nation_presence_except"]),
    "J7": ("plans.registry:q_nation_intersect", ["set_ops_nations", "nation_presence_intersect"]),
    "J8": ("plans.registry:q_membership", ["set_ops_nations", "membership_classification"]),
    "J9": ("operators.evaluation:confusion_matrix", ["confusion_matrix_events"]),
    # --- §2.5 aggregations -----------------------------------------------
    "A1": ("ml.topics:vectorize", ["vocabulary"]),
    "A2": ("ml.topics:vectorize", ["term_frequency"]),
    "A3": ("pipeline:build_corpus", ["vocabulary"]),
    "A4": ("operators.evaluation:confusion_matrix", ["confusion_matrix_events"]),
    "A5": ("operators.evaluation:classification_metrics",
           ["classification_metrics_events"]),
    "A6": ("operators.textstats:word_count", ["token_stats", "dedup_stats_by_source"]),
    "A7": ("plans.registry:q_fold_metric_stats", ["fold_metric_stats"]),
    "A8": ("ml.search:grid_search_logistic  # max over model scores",
           ["grid_search_lr", "top_brands_by_revenue"]),
    "A9": ("ml.classify:add_stratified_fold", ["stratified_fold_balance"]),
    "A10": ("plans.registry:q_tfidf", ["tfidf", "make_wiki_pipeline"]),
    # --- §2.6 sorts / limits / top-k -------------------------------------
    "O1": ("operators.relational:topk_per_group", ["top3_lineitems_per_supplier"]),
    "O2": ("plans.registry:q_sorted_vectors", ["sorted_topic_vectors"]),
    "O3": ("operators.relational:per_group_first", ["first_order_per_customer"]),
    "O4": ("operators.relational:topk_per_group",
           ["top_users_by_value", "knn_bruteforce_cosine"]),
    # --- §2.7 set ops / dedup --------------------------------------------
    "D1": ("operators.dedup:exact_dedup", ["dedup_stats_by_source"]),
    "D2": ("operators.dedup:exact_dedup", ["distinct_user_event_pairs"]),
    "D3": ("plans.registry:q_nation_intersect",
           ["set_ops_nations", "nation_presence_intersect",
            "nation_presence_except", "union_all_entity_counts"]),
    # --- §2.8 ML ---------------------------------------------------------
    "M1": ("ml.topics:fit_lda",
           ["flagship_polysemy", "lda_log_perplexity", "lda_k_sweep"]),
    "M2": ("ml.topic_quality:hdp_emulation  # shipped-model pin: tests/test_reference_gold.py validates the k=10 operating point (all 10 shipped topics alive/distinct) against the emulation premise; suggested_lda_model export analogue (wiki_hdp.py:25): ml.topic_quality:suggested_lda_export", ["topic_quality_suite", "hdp_topic_mass", "hdp_suggested_lda"]),
    "M3": ("ml.topics:infer_topics", ["flagship_polysemy"]),
    "M4": ("ml.topics:polysemy_flag", ["polysemy_rule_vectors", "flagship_polysemy"]),
    "M5": ("ml.classify:assemble_features", ["classifier_battery"]),
    "M6": ("ml.classify:classifier_battery", ["classifier_battery", "battery_logistic_regression"]),
    "M7": ("ml.classify:classifier_battery  # deviation: ≡ M6 (solver ≠ semantics)",
           ["classifier_battery", "battery_logistic_regression"]),
    "M8": ("ml.classify:ModifiedHuberGD  # REAL modified-Huber loss (r10): deterministic full-batch GD, one distributed d+1-sum aggregation per iteration; formerly a LinearSVC stand-in",
           ["classifier_battery", "battery_modified_huber_sgd"]),
    "M9": ("ml.kernel:kernel_svm_sweep  # r13: the reference's FULL "
           "33-config runAllSVM sweep (linear + rbf x {0.1,1,10,100} + "
           "poly x gamma x degree 0..6, supervised_classifier.py:292-314) "
           "— rbf via per-gamma Random Fourier Features with a measured "
           "exact-kernel bound per gamma; poly via the EXACT "
           "sqrt-multinomial homogeneous feature map (no approximation) "
           "with gamma folded into the regularizer; kernel_svm_report "
           "remains the single-config headline",
           ["kernel_svm_sweep", "kernel_svm_rff", "classifier_battery",
            "battery_linear_svc"]),
    "M10": ("ml.classify:classifier_battery", ["classifier_battery", "battery_gaussian_nb"]),
    "M11": ("ml.classify:classifier_battery", ["classifier_battery", "battery_linear_svc"]),
    "M12": ("ml.classify:classifier_battery", ["classifier_battery", "battery_random_forest"]),
    "M13": ("ml.classify:classifier_battery", ["classifier_battery", "battery_gbt"]),
    "M14": ("operators.similarity_search:majority_vote",
            ["knn_classifier_vote", "knn_vote_lsh", "lsh_ann_neighbors"]),
    "M15": ("ml.classify:classifier_battery", ["classifier_battery", "battery_decision_tree"]),
    "M16": ("ml.classify:mlp_spec", ["classifier_battery", "mlp_classifier"]),
    "M17": ("ml.classify:train_test_split", ["classifier_battery", "battery_logistic_regression"]),
    "M18": ("ml.classify:add_stratified_fold",
            ["stratified_fold_balance", "fold_assignment"]),
    "M19": ("ml.classify:scale_features", ["classifier_battery", "battery_gaussian_nb"]),
    "M20": ("ml.resample:smote", ["resampling_report", "smote_class_balance"]),
    "M21": ("ml.resample:remove_tomek_links  # blocked exact 1-NN "
            "(distributed BLAS), no driver-side collect",
            ["resampling_report", "tomek_link_removal"]),
    "M22": ("ml.search:forest_ei_search  # + adaptive_search_logistic "
            "+ rule_point_search — surrogate search over BOTH "
            "reference loops: classifier hyperparams (BayesSearchCV "
            "analogue, TPE) and the polysemy-rule operating point, "
            "where the r9 forest_ei arm runs the reference's ACTUAL "
            "algorithm shape (extra-trees regression surrogate + "
            "expected-improvement acquisition) at its exact 500-call "
            "budget (polysemous_words.py:29-30,271-281; batch-EI, "
            "~25 distributed passes) head-to-head vs the TPE stand-in "
            "and an equal-budget random baseline "
            "(ok_surrogate_beats_random); FULL 3-D space MIN_DOC_LEN "
            "[5,500] x minimum_probability [0.05,0.1] x minimum_topics "
            "[1,5], per-call admission gate on the cached frame; r13 "
            "adds the MLP BayesSearchCV arm (adaptive_search_mlp): "
            "forest-EI at the reference's exact n_iter=30 over its 5-D "
            "MLP grid (supervised_classifier.py:493-524), objective = "
            "ml.mlp distributed full-batch trainer (batch-lockstep "
            "epochs, one gradient pass per epoch for a whole proposal "
            "batch), equal-budget random arm for ok_best_geq_random",
            ["adaptive_search_lr", "grid_search_lr", "rule_point_search",
             "adaptive_search_mlp"]),
    "M23": ("ml.classify:evaluate_binary", ["classifier_battery", "battery_gbt"]),
    "M24": ("ml.search:holdout_transfer", ["holdout_transfer_report"]),
    "M25": ("ml.topic_quality:log_perplexity", ["topic_quality_suite", "lda_log_perplexity"]),
    "M26": ("ml.topic_quality:umass_coherence",
            ["topic_quality_suite", "topic_coherence_umass",
             "topic_coherence_cv"]),
    # --- §2.11 extended (BASELINE.json north star) -----------------------
    "X-dedup-exact": ("operators.dedup:exact_dedup", ["dedup_stats_by_source"]),
    "X-dedup-minhash": ("operators.dedup:minhash_banded_pairs  # production "
                        "path; operators.dedup:minhash_lsh_pairs (MLlib "
                        "approxSimilarityJoin) is a bench-scale "
                        "verification twin only — scale traffic goes "
                        "through the banded/incremental machinery",
                        ["minhash_neardup_pairs", "minhash_signatures"]),
    "X-dedup-simhash": ("operators.dedup:add_simhash", ["simhash_documents"]),
    "X-dedup-ngram-jaccard": ("plans.registry:q_ngram_jaccard",
                              ["ngram_jaccard_pairs", "document_jaccard_neardup"]),
    "X-dedup-embedding": ("functions.similarity:cosine_similarity",
                          ["embedding_cosine_neardup"]),
    "X-ann-bruteforce": ("operators.similarity_search:knn_bruteforce",
                         ["knn_bruteforce_cosine"]),
    "X-ann-lsh": ("operators.similarity_search:lsh_ann", ["lsh_ann_neighbors"]),
    "X-ann-ivf": ("operators.similarity_search:ivf_ann", ["ivf_ann_recall"]),
    "X-multimodal-decode": ("operators.multimodal:decode_binary_column",
                            ["multimodal_pipeline", "multimodal_decode"]),
    "X-multimodal-frames": ("plans.registry:q_frame_sample",
                            ["multimodal_pipeline", "multimodal_frame_sample"]),
    "X-text-langid": ("operators.textstats:langid", ["language_id"]),
    "X-text-quality": ("operators.textstats:stopword_ratio",
                      ["text_profile", "text_quality",
                       "quality_perplexity"]),
    "X-text-tokens": ("operators.textstats:word_count",
                      ["text_profile", "token_stats", "bpe_subword_counts"]),
    "X-text-fingerprint": ("operators.textstats:fingerprint",
                           ["text_profile", "document_fingerprints",
                            "winnowing_fingerprint",
                            "winnowing_fingerprint_set"]),
    "X-stream-window": ("streaming.events:streaming_hourly_event_stats",
                        ["streaming_windowed_suite", "streaming_events_hourly",
                         "events_sliding_window"]),
    "X-stream-session": ("streaming.stateful:streaming_sessionization",
                         ["streaming_windowed_suite", "streaming_sessionization",
                          "events_sessionization"]),
    "X-stream-stateful": ("streaming.stateful:stateful_user_counts  # + "
                          "streaming_ewma: per-key EWMA recursion as "
                          "GroupState, batch-closed-form parity flag "
                          "hash-enforced (streaming_ewma_parity)",
                          ["streaming_stateful_suite", "stateful_user_counts",
                           "streaming_ewma_parity"]),
    "X-stream-static-join": ("streaming.events:streaming_events_by_segment",
                             ["streaming_stateful_suite",
                              "streaming_events_by_segment"]),
    "X-stream-stream-join": ("streaming.events:streaming_interval_join",
                             ["streaming_stateful_suite",
                              "streaming_interval_join"]),
    "X-stream-dedup": ("plans.registry:q_streaming_dedup",
                       ["streaming_stateful_suite",
                        "streaming_first_event_per_user_type"]),
    "X-asof-join": ("operators.relational:asof_join", ["events_asof_join"]),
    "X-dedup-clusters": ("operators.dedup:connected_components",
                         ["neardup_clusters"]),
    "X-range-join": ("plans.registry:q_range_join", ["value_bucket_range_join"]),
    "X-subquery-decorrelation": ("plans.registry:q_small_quantity",
                                 ["small_quantity_revenue",
                                  "orders_with_returns_exists"]),
    "X-grouped-regression": ("plans.registry:q_user_trend",
                             ["user_value_trend", "grouped_trend_pandas"]),
    "X-train-packing": ("plans.registry:q_document_packing",
                        ["training_prep_manifest", "document_packing"]),
    "X-train-splits": ("plans.registry:q_split_manifest",
                       ["training_prep_manifest", "dataset_split_manifest"]),
    "X-train-quantization": ("plans.registry:q_embedding_quant",
                             ["training_prep_manifest", "embedding_quantization"]),
    "X-curation-contamination": ("plans.registry:q_benchmark_contamination",
                                 ["curation_suite", "benchmark_contamination"]),
    "X-curation-repetition": ("plans.registry:q_repetition_quality",
                              ["curation_suite", "repetition_quality"]),
    "X-dedup-canonical": ("plans.registry:q_dedup_canonical",
                          ["curation_suite", "dedup_canonical"]),
    "X-dedup-incremental": ("plans.registry:q_cross_source_containment",
                            ["curation_suite", "cross_source_containment"]),
    "X-train-mixture": ("plans.registry:q_mixture_sampling",
                        ["curation_suite", "mixture_sampling_manifest",
                         "mixture_temperature_weights"]),
    "X-curation-pii": ("plans.registry:q_pii_redaction",
                       ["curation_suite", "pii_redaction"]),
    "X-text-entropy": (
        "plans.q_text:q_unigram_entropy  # per-doc unigram Shannon "
        "entropy (ln(n) - sum c*ln c / n, doc-rounded), per-source "
        "rollup + low-entropy boilerplate count",
        ["unigram_entropy_quality"],
    ),
    "X-train-waterfill": (
        "plans.q_curation:q_token_budget_waterfill  # exact integer "
        "waterfill of a token budget over sources under per-source "
        "epoch caps: HUGEINT threshold split + Hamilton remainder",
        ["token_budget_waterfill"],
    ),
    "X-train-truncation": (
        "plans.q_curation:q_truncation_loss  # context-length overflow "
        "pricing: per ctx_len docs truncated / tokens lost / pct of "
        "token budget, map-only + 4-cell aggregate",
        ["truncation_loss_report"],
    ),
    "X-curation-e2e": (
        "plans.q_curation:q_curation_pipeline_e2e  # the full DAG: "
        "clean -> Gopher gate -> exact dedup -> shingle-MinHash fuzzy "
        "dedup (connected components, keep-one) -> Hamilton "
        "temperature mixture -> hash-shard manifest, hash-exact "
        "incl. the funnel counts",
        ["curation_pipeline_e2e"],
    ),
    "X-train-chunking": ("plans.registry:q_document_chunking",
                         ["curation_suite", "document_chunking"]),
    "X-dedup-paragraph": ("plans.registry:q_paragraph_dedup",
                          ["curation_suite", "paragraph_dedup"]),
    "X-sketch-heavy-hitters": ("plans.registry:q_heavy_hitters_sketch",
                               ["curation_suite", "heavy_hitters_sketch"]),
    "X-stream-sketch": ("streaming.events:streaming_cms_counters",
                        ["streaming_stateful_suite",
                         "streaming_heavy_hitters"]),
    "X-retrieval-index": ("plans.registry:q_inverted_index",
                          ["curation_suite", "inverted_index_postings"]),
    "X-retrieval-bm25": ("plans.registry:q_bm25",
                         ["curation_suite", "bm25_retrieval"]),
    "X-dedup-semantic": ("plans.registry:q_semantic_dedup_srp",
                         ["training_prep_manifest", "semantic_dedup_srp"]),
    "X-stream-throughput": ("streaming.throughput:streaming_throughput_report"
                            "  # >=10 micro-batch state-store run: flat "
                            "latency, watermark eviction, batch-exact join "
                            "parity — executed under BOTH the default and RocksDB state-store providers",
                            ["streaming_throughput_report"]),
    "X-dedup-substring": ("plans.registry:q_duplicate_span_coverage  # "
                          "Lee et al. 2021 arbitrary-offset duplicate "
                          "spans: 8-token window hash join, keep-first "
                          "removal manifest, exact interval-union coverage",
                          ["duplicate_span_coverage"]),
    "X-ann-pq": ("ml.cluster:pq_encode  # product quantization (Jégou et "
                 "al. 2011): per-subspace integer-Lloyd codebooks, "
                 "hash-exact encode + ADC search with recall contract",
                 ["pq_encode_codes", "pq_ann_recall"]),
    "X-select-dsir": ("plans.registry:q_dsir_selection  # DSIR (Xie et "
                      "al. 2023): hashed-unigram importance weights "
                      "target-vs-raw, Gumbel-top-k resample, hash-exact",
                      ["dsir_selection"]),
    "X-retrieval-hybrid": ("plans.registry:q_hybrid_rrf  # reciprocal-"
                           "rank fusion (Cormack et al. 2009) of the "
                           "BM25 and exact-cosine arms, hash-exact",
                           ["hybrid_retrieval_rrf"]),
    "X-cdc-merge": ("plans.registry:q_cdc_merge  # lakehouse MERGE "
                    "INTO: latest-op-per-key CDC apply with upsert/"
                    "delete-tombstone semantics, join rides the window "
                    "partitioning (plan-tested), hash-exact",
                    ["cdc_merge_upsert"]),
    "X-scd2-history": ("plans.registry:q_scd2_intervals  # SCD Type-2 "
                       "dimension history: gaps-and-islands run "
                       "collapse + [from,to) versioning on ONE user_id "
                       "exchange (plan-tested), hash-exact",
                       ["scd2_state_intervals"]),
    "X-lakehouse-table": ("sources.lakehouse:merge_table  # CoW table (with "
                          "create_table): versioned parquet snapshots, "
                          "bucket-granular MERGE rewrites (unchanged "
                          "buckets carried by manifest reference), "
                          "os.replace-atomic commits, read back off disk "
                          "hash-exact vs a relational era fold",
                          ["lakehouse_merge_roundtrip"]),
    "X-lakehouse-timetravel": ("sources.lakehouse:read_table  # version=N: "
                               "immutable manifests reconstruct any "
                               "committed snapshot — snapshot-isolation "
                               "reads, all 3 versions hash-exact",
                               ["lakehouse_time_travel"]),
    "X-lakehouse-skipping": ("sources.lakehouse:read_table  # point_keys: "
                             "manifest-level data skipping: bucket "
                             "routing + per-bucket min/max key stats "
                             "prune the scan (inputFiles plan-tested)",
                             ["lakehouse_manifest_pruning"]),
    "X-lakehouse-history": ("sources.lakehouse:table_history  # DESCRIBE "
                            "HISTORY from the commit log; manifest "
                            "bookkeeping hash-verified against first "
                            "principles",
                            ["lakehouse_history"]),
    "X-cluster-kmeans": ("ml.cluster:kmeans_cluster_stats  # deterministic "
                         "integer Lloyd's — the k-means clustering arm "
                         "SemDeDup (Abbas et al. 2023) uses before "
                         "within-cluster pruning; hash-exact vs DuckDB",
                         ["embedding_kmeans"]),
    "X-train-shuffle": ("plans.registry:q_training_order_shuffle",
                        ["training_prep_manifest", "training_order_shuffle"]),
    "X-event-funnel": ("plans.registry:q_funnel_conversion",
                       ["streaming_windowed_suite", "funnel_conversion"]),
    "X-event-cohort": ("plans.registry:q_cohort_retention",
                       ["streaming_windowed_suite", "cohort_retention"]),
    "X-event-attribution": ("plans.registry:q_session_attribution",
                            ["streaming_windowed_suite",
                             "session_attribution"]),
    "X-feature-rolling": ("plans.registry:q_rolling_user_features  # + "
                          "q_ewma_user_value: closed-form EWMA, exact "
                          "decimal sums, single user_id exchange",
                          ["streaming_windowed_suite",
                           "rolling_user_features", "ewma_user_value"]),
    "X-profile-columns": ("plans.registry:q_column_profile",
                          ["training_prep_manifest", "column_profile"]),
    "X-feature-bucketing": ("plans.registry:q_decile_bucketing",
                            ["training_prep_manifest", "decile_bucketing"]),
    "X-graph-pagerank": ("plans.registry:q_neardup_pagerank",
                         ["curation_suite", "neardup_pagerank"]),
    "X-graph-triangles": ("plans.registry:q_neardup_triangles",
                          ["curation_suite", "neardup_triangles"]),
    "X-stream-attribution": ("streaming.stateful:streaming_session_attribution",
                             ["streaming_stateful_suite",
                              "streaming_session_attribution"]),
    "X-clean-outliers": ("plans.registry:q_iqr_outliers",
                         ["training_prep_manifest", "iqr_outlier_fences"]),
    "X-linkage-blocked": ("plans.registry:q_blocked_jw",
                          ["curation_suite", "blocked_jw_linkage"]),
    "X-ts-gapfill": ("plans.registry:q_events_gapfill",
                     ["streaming_windowed_suite", "events_hourly_gapfill"]),
    "X-stats-correlation": ("plans.registry:q_measure_correlation",
                            ["training_prep_manifest",
                             "measure_correlation"]),
    "X-profile-histogram": ("plans.registry:q_value_histogram",
                            ["training_prep_manifest", "value_histogram"]),
    "X-event-paths": ("plans.registry:q_session_paths",
                      ["streaming_windowed_suite", "session_paths"]),
    "X-quality-admission": ("plans.registry:q_gopher_admission",
                            ["curation_suite", "gopher_admission"]),
    "X-similarity-sparse": ("plans.registry:q_sparse_cosine_pairs",
                            ["curation_suite", "sparse_cosine_pairs"]),
    "X-split-leakage": ("plans.registry:q_leakage_safe_split",
                        ["training_prep_manifest", "leakage_safe_split"]),
    "X-lakehouse-optimize": ("sources.lakehouse:optimize_table  # OPTIMIZE "
                             "compaction: latest snapshot rewritten "
                             "self-contained, one file per bucket; "
                             "read-back hash-exact vs the raw era fold",
                             ["lakehouse_read_after_vacuum"]),
    "X-lakehouse-vacuum": ("sources.lakehouse:vacuum_table  # retention "
                           "delete of unreferenced bucket dirs; the dir "
                           "accounting is derived from first principles "
                           "in the oracle SQL",
                           ["lakehouse_optimize_vacuum",
                            "lakehouse_read_after_vacuum"]),
    "X-lakehouse-ivm": ("sources.lakehouse:upsert_combine  # incremental "
                        "materialized-view maintenance: delta partial "
                        "aggregates folded into bucket-pruned stored "
                        "state; hash-exact vs the full recompute",
                        ["lakehouse_incremental_mv"]),
    "X-stream-lakehouse-sink": ("streaming.lakehouse_sink:"
                                "stream_cdc_into_table  # foreachBatch "
                                "CDC MERGE, one version per micro-batch, "
                                "EXACTLY-ONCE under replay (batch_id "
                                "watermark rides the atomic manifest "
                                "commit); final table hash-exact vs the "
                                "global latest-per-key fold",
                                ["streaming_lakehouse_sink"]),
    "X-join-salted": ("operators.relational:salted_join  # manual skew "
                      "spread (x8 salts) for hot keys AQE cannot split; "
                      "hash-exact vs the plain join",
                      ["skewed_join_salted"]),
    "X-bpe-training": ("ml.bpe:bpe_train  # distributed BPE merge-table "
                       "training (Sennrich 2016): word-dict collapse + "
                       "per-step pair-count argmax + codegen greedy "
                       "fold; dual-algorithm DuckDB oracle, hash-exact",
                       ["bpe_merge_training"]),
    "X-bpe-encoding": ("plans.registry:q_bpe_encode_documents  # corpus "
                       "tokenization with the trained vocab: per-doc "
                       "word counts join the merged symbol dict (one "
                       "word-key shuffle, text never re-scanned per "
                       "merge); fertility ratio output; hash-exact",
                       ["bpe_encode_documents"]),
    "X-lakehouse-cdf": ("sources.lakehouse:table_changes  # change data "
                        "feed: version-diff relation tagged insert/"
                        "update/delete with before/after payloads, one "
                        "co-located key exchange; hash-exact vs the "
                        "era-fold diff",
                        ["lakehouse_change_feed"]),
    "X-lakehouse-zorder": ("sources.lakehouse:create_zordered_table  # "
                           "OPTIMIZE ZORDER BY: Morton-interleaved "
                           "clustering + per-file two-column zone maps; "
                           "range queries prune files on either dim "
                           "before the scan plans; hash-exact vs the "
                           "raw-table aggregate",
                           ["zorder_zone_map_pruning"]),
    "X-lakehouse-evolution": ("sources.lakehouse:add_column  # "
                              "metadata-only ALTER TABLE ADD COLUMN: "
                              "manifest-level schema widening, old files "
                              "null-fill at read, follow-up MERGE "
                              "backfills only its buckets; hash-exact vs "
                              "the era fold",
                              ["lakehouse_schema_evolution"]),
    "X-lakehouse-restore": ("sources.lakehouse:restore_table  # RESTORE "
                            "VERSION AS OF: metadata-only rollback commit "
                            "re-referencing the target's buckets+schema; "
                            "intermediate history stays readable; "
                            "hash-exact",
                            ["lakehouse_restore"]),
    "X-lakehouse-rebucket": ("sources.lakehouse:rebucket_table  # "
                             "partition evolution (Iceberg bucket-spec "
                             "change): self-contained rewrite under a new "
                             "bucket count; per-version layouts in the "
                             "manifest keep old snapshots point-lookup "
                             "routable; follow-up MERGE CoWs at the new "
                             "granularity; hash-exact",
                             ["lakehouse_rebucket"]),
    "X-lakehouse-quality-gate": ("plans.registry:q_lakehouse_quality_gate"
                                 "  # per-commit CI gate: the expectation "
                                 "suite validated against every committed "
                                 "table version (key uniqueness, "
                                 "completeness, compliance), one "
                                 "single-pass agg per snapshot; all nine "
                                 "(version, constraint) metrics "
                                 "hash-exact",
                                 ["lakehouse_quality_gate"]),
    "X-quality-expectations": ("operators.expectations:run_checks  # "
                               "Deequ-style declarative constraint suite "
                               "(completeness/uniqueness/compliance/"
                               "membership/regex/distribution + broadcast "
                               "referential integrity) validated in ONE "
                               "aggregation pass; exact-int/count "
                               "divisions, hash-exact with no rounding",
                               ["data_quality_expectations"]),
    "X-quality-quarantine": ("plans.registry:q_quality_quarantine_split  "
                             "# row-level first-failing-rule routing "
                             "(CASE cascade, map-only) with per-reason "
                             "counts + key checksum hashed; the "
                             "quarantine/clean split ahead of the lake",
                             ["quality_quarantine_split"]),
    "X-join-bloom": ("operators.sketches:bloom_build  # distributed bloom "
                     "bitset via bit_or monoid (8 KB, cardinality-free) + "
                     "row-local might_contain probe ahead of the exact "
                     "semi join; hash-exact vs plain EXISTS",
                     ["bloom_semijoin_pruning"]),
    "X-join-bucketed": ("plans.registry:q_bucketed_colocated_join  # "
                        "bucketBy tables on the join keys: zero-exchange "
                        "sort-merge join consuming the on-disk "
                        "partitioning, plan-tested; hash-exact vs the "
                        "plain join",
                        ["bucketed_colocated_join"]),
    "X-sketch-quantile": ("plans.registry:q_approx_quantile_contract  # "
                          "Greenwald-Khanna percentile_approx checked "
                          "against its |rank - p*n| <= n/accuracy "
                          "guarantee; exact percentiles + "
                          "genuinely-computed ok flags hashed",
                          ["approx_quantile_contract"]),
    "X-shard-rendezvous": ("plans.registry:q_rendezvous_sharding  # HRW "
                           "consistent sharding as row-local array_max "
                           "over md5-prefix integer scores; the N->N+1 "
                           "minimal-movement theorem hash-verified per "
                           "shard",
                           ["rendezvous_sharding"]),
    "X-sample-stratified": ("plans.registry:q_stratified_sample_exact  # "
                            "exact-k per-stratum reservoir via "
                            "content-stable md5 ranks (no rand()); "
                            "selected membership pinned by doc_id "
                            "checksum",
                            ["stratified_sample_exact"]),
    "X-asof-full-surface": ("operators.relational:asof_join  # full "
                            "merge_asof surface: backward/forward/nearest "
                            "directions (ties break backward) + tolerance "
                            "null-out; one key exchange feeding both "
                            "window sorts (plan-tested)",
                            ["events_asof_nearest", "events_asof_join"]),
    "X-dedup-incremental-store": ("plans.registry:"
                                  "q_incremental_dedup_commit  # batch-"
                                  "vs-persisted-store dedup: bucket-"
                                  "pruned state reads, CoW merge of new "
                                  "fingerprints only; per-era accounting "
                                  "hash-exact vs first principles",
                                  ["incremental_dedup_commit"]),
    "X-lakehouse-clone": ("sources.lakehouse:clone_table  # zero-copy "
                          "SHALLOW CLONE: v1 references source files by "
                          "absolute path; divergent merges CoW into the "
                          "clone's own dir; clone vacuum can never touch "
                          "source files (unit-tested); hash-exact both "
                          "tables",
                          ["lakehouse_shallow_clone"]),
    "X-lakehouse-gdpr": ("plans.registry:q_lakehouse_gdpr_purge  # "
                         "right-to-be-forgotten: tombstone MERGE + "
                         "OPTIMIZE + VACUUM, then physical erasure "
                         "proven by a recursive residual-file scan and "
                         "an explicit time-travel failure; hash-exact",
                         ["lakehouse_gdpr_purge"]),
    "X-ts-interpolation": ("plans.registry:"
                           "q_events_linear_interpolation  # linear "
                           "lerp gap-fill between nearest observed "
                           "neighbors via the two-direction carry "
                           "machinery (one exchange, two window "
                           "sorts); mode-free half-up quantization "
                           "keeps the hash exact across engines",
                           ["events_linear_interpolation"]),
    "X-linkage-levenshtein": ("plans.registry:"
                              "q_levenshtein_blocked_pairs  # blocked "
                              "edit-distance matching with the built-in "
                              "F.levenshtein (whole-stage codegen, no "
                              "Python); (brand,size) equi-join blocking; "
                              "matched membership pinned by key "
                              "checksum",
                              ["levenshtein_blocked_pairs"]),
    "X-multimodal-resize": ("operators.multimodal:resize_binary_column"
                            "  # aspect-preserving 224-box fit geometry "
                            "(downscale-only) over the Arrow-batched "
                            "binary column; resample stubbed, geometry "
                            "IEEE-exact and hash-replayed by the oracle",
                            ["multimodal_resize"]),
    "X-ops-skew-report": ("plans.registry:q_skew_detection_report  # "
                          "per-join-key hot-key ceiling + max/mean skew "
                          "factor in one pass per family; flags keys "
                          "above the salting threshold; mode-free "
                          "quantization, hash-exact",
                          ["skew_detection_report"]),
    "X-ann-matryoshka": ("plans.registry:"
                         "q_matryoshka_truncation_overlap  # MRL "
                         "prefix-truncation acceptance gate: full-dim "
                         "vs 16-dim top-10 overlap per probe, both "
                         "rankings off one pair frame (one exchange, "
                         "two sorts); bit-identical cosine folds",
                         ["matryoshka_truncation_overlap"]),
    "X-train-hard-negatives": ("plans.registry:q_hard_negative_mining"
                               "  # contrastive pair mining: per-anchor "
                               "best positive + hard negative + margin "
                               "in ONE aggregation pass (max-by-struct "
                               "per arm, no window/self-join); mined "
                               "identities hash-exact",
                               ["hard_negative_mining"]),
    "X-train-curriculum": ("plans.registry:q_curriculum_interleave  # "
                           "difficulty-quartile banding via plan-literal "
                           "percentiles + banded md5 shuffle + "
                           "round-robin interleave; top-40 order "
                           "hash-pinned",
                           ["curriculum_interleave"]),
    "X-ops-join-cardinality": ("plans.registry:"
                               "q_join_cardinality_estimate  # join "
                               "output size predicted exactly from two "
                               "per-key count histograms (narrow-tuple "
                               "dot product) then hash-verified against "
                               "the executed join + hot-key ceiling",
                               ["join_cardinality_estimate"]),
    "X-window-ranking-surface": ("plans.registry:"
                                 "q_ranking_function_surface  # rank / "
                                 "dense_rank / percent_rank / cume_dist "
                                 "/ ntile over one partitioned window "
                                 "family (one exchange, three sorts, "
                                 "zero global windows); hash-exact",
                                 ["ranking_function_surface"]),
    "X-ops-plan-audit": ("plans.registry:q_plan_invariant_audit  # "
                         "physical-plan scale invariants (bucketed "
                         "zero-exchange join, row-local bloom probe, "
                         "window-free mining, salted key, single asof "
                         "exchange) surfaced as ok_ flags; rows-only by "
                         "design — primary evidence is the WIDENED CI "
                         "twin tests/test_plan_invariants.py (adds the "
                         "global-window sweep, broadcast dim joins, "
                         "bucket-pruned point reads)",
                         ["plan_invariant_audit"]),
    "X-ann-graph-beam": ("plans.registry:q_graph_ann_beam_search  # "
                         "HNSW-layer-0 beam search over a degree-8 kNN "
                         "graph (3 hops, beam 16, deterministic "
                         "tie-breaks); oracle unrolls the identical "
                         "hops; per-probe recall@10 hash-exact",
                         ["graph_ann_beam_search"]),
    "X-gov-pseudonymize": ("plans.registry:q_pseudonymized_export  # "
                           "stable salted-md5 pseudonyms + measure "
                           "banding, map-only; joinability preserved "
                           "(distinct pseudonyms == distinct keys, "
                           "genuinely counted and hashed)",
                           ["pseudonymized_export"]),
    "X-gov-kanonymity": ("plans.registry:q_k_anonymity_audit  # "
                         "quasi-identifier equivalence-class audit: "
                         "groups below k + suppression accounting in "
                         "one exchange; hash-exact",
                         ["k_anonymity_audit"]),
    "X-event-patterns": ("plans.registry:q_event_pattern_match  # "
                         "MATCH_RECOGNIZE-style row-pattern counts over "
                         "per-user ordered initial-strings (one key "
                         "exchange of 1-char tokens, row-local regex); "
                         "non-overlapping scan semantics proven identical "
                         "across engines",
                         ["event_pattern_match"]),
    "X-ann-index-persist": ("ml.ann_index:build_ivf_index  # IVF "
                            "centroids + per-cell posting lists as "
                            "VERSIONED lakehouse tables: deterministic "
                            "integer-Lloyd build (even-id half), "
                            "same-centroid MERGE refresh (odd half), "
                            "vector-level GDPR delete (touched cells "
                            "rewrite, emptied cells tombstone, prior "
                            "version is the audit trail), "
                            "time-travelable history; build evidence "
                            "read off disk, hash-exact",
                            ["ann_index_build", "ann_index_delete",
                             "ann_index_purge_vacuum"]),
    "X-ann-index-serve": ("ml.ann_index:query_ivf_index  # ANN served "
                          "from the persisted index ONLY (probes out "
                          "of postings, cells out of centroids, "
                          "bucket-pruned point read of probed cells; "
                          "inputFiles plan-tested); exact int64-L2 "
                          "top-5 hash-exact vs relational re-derivation",
                          ["ann_query_from_index"]),
    "X-dedup-prefix-filter": ("plans.q_similarity:q_prefix_filter_neardup"
                              "  # AllPairs/PPJoin prefix filtering "
                              "(Bayardo et al. WWW'07): global df order, "
                              "integer prefix bound, equi-join on prefix "
                              "tokens — LOSSLESS (pytest proves output "
                              "identity with the exact all-pairs join); "
                              "integer thresholding, hash-exact",
                              ["prefix_filter_neardup"]),
    "X-ts-downsample": ("plans.q_events:q_m4_downsample  # M4 "
                        "visualization downsampling (Jugel et al. "
                        "VLDB 2014): per (series, pixel-bucket) "
                        "min/max/first/last with integer bucketing "
                        "and (ts,id)-deterministic edge picks; one "
                        "key exchange, output bounded by "
                        "series x width x 4; hash-exact",
                        ["m4_downsample"]),
    "X-stream-ann-refresh": ("ml.ann_index:stream_ivf_index  # "
                             "streaming maintenance of the persisted "
                             "IVF index: foreachBatch assigns each "
                             "micro-batch to the stored centroids and "
                             "MERGEs per cell, batch_id watermark on "
                             "the atomic manifest commit = exactly-"
                             "once (live replay proof); final state "
                             "hash-equals the one-shot build",
                             ["streaming_ann_index_refresh"]),
    "X-dedup-binary": ("operators.binary_dedup:binary_neardup_pairs  # "
                       "byte-level fuzzy dedup of binary payloads: "
                       "content-defined chunking (stateless "
                       "window-hash boundaries, pure Column "
                       "expression) + MinHash over chunk digests + "
                       "banded candidate join + exact chunk-Jaccard "
                       "verify + keep-one cluster manifest "
                       "(connected components; singletons keep "
                       "themselves); payload bytes never shuffle",
                       ["binary_neardup_pairs", "binary_dedup_manifest",
                        "binary_chunk_savings"]),
    "X-event-markov": ("plans.q_events:q_markov_transitions  # "
                       "first-order Markov transition matrix over "
                       "per-user event streams: lag window on the "
                       "shared user-keyed exchange, map-side-"
                       "combinable |types|^2 cells, row-stochastic "
                       "normalization; hash-exact",
                       ["markov_transitions"]),
    "X-quality-drift": ("plans.q_events:q_distribution_drift  # "
                        "two-sample drift monitor: PSI + JSD "
                        "(Laplace-smoothed 20-bin) + binned KS via a "
                        "bounded triangular self-join ECDF — two "
                        "scans, only (bin,count) cells shuffle; "
                        "hash-exact",
                        ["distribution_drift_report"]),
    "X-analytics-rfm": ("plans.q_relational:q_rfm_segments  # RFM "
                        "quintile segmentation: three range-"
                        "partitioned global ranks "
                        "(ordered_dense_rank), explicit quintile "
                        "formula bit-equal to the oracle's "
                        "ROW_NUMBER windows; hash-exact",
                        ["rfm_segments"]),
    "X-mining-basket": ("plans.q_relational:q_market_basket_pairs  # "
                        "market-basket pair mining (a-priori first "
                        "pass): broadcast dim lookup, in-row pair "
                        "comb over sorted basket arrays (no fact "
                        "self-join), support/confidence/lift at 1% "
                        "min-support; hash-exact",
                        ["market_basket_pairs"]),
    "X-stats-chi2": ("plans.q_relational:q_chi_square_independence  # "
                     "Pearson chi-square of independence + Cramer's V "
                     "on the segment x priority contingency table; "
                     "zero-observed cells materialized from the "
                     "margin cross; hash-exact",
                     ["chi_square_independence"]),
    "X-quality-benford": ("plans.q_relational:q_benford_digit_audit  # "
                          "Benford first-digit audit of order totals: "
                          "one scan into <=9 cells vs log10(1+1/d); "
                          "hash-exact",
                          ["benford_digit_audit"]),
    "X-text-collocations": ("plans.q_text:q_pmi_collocations  # PMI "
                            "collocations: in-row bigram zip_with "
                            "(no posexplode self-join), broadcast "
                            "unigram margins, TakeOrdered top-20; "
                            "hash-exact",
                            ["pmi_collocations"]),
    "X-text-heaps": ("plans.q_text:q_heaps_vocab_growth  # Heaps-law "
                     "vocabulary growth at 4 corpus prefixes from ONE "
                     "pass (first-occurrence doc per type); "
                     "hash-exact",
                     ["heaps_vocab_growth"]),
    "X-sample-weighted": ("plans.q_curation:q_weighted_sample_aes  # "
                          "Efraimidis-Spirakis A-ES weighted sampling "
                          "without replacement, content-stable "
                          "md5-seeded uniforms, distributed "
                          "TakeOrdered top-k; hash-exact",
                          ["weighted_sample_aes"]),
    "X-text-zipf": ("plans.q_text:q_zipf_law_fit  # Zipf rank-"
                    "frequency log-log OLS over the top-500 ranks: "
                    "1e-9-quantized log coordinates, DECIMAL(38,0)/"
                    "HUGEINT sufficient statistics, two-phase global "
                    "rank; hash-exact",
                    ["zipf_law_fit"]),
    "X-stats-gini": ("plans.q_relational:q_gini_concentration  # "
                     "exact Gini coefficient + top-decile share of "
                     "per-customer spend: integer-cent partials, "
                     "range-partitioned global rank, DECIMAL(38,0) "
                     "rank-weighted sums; hash-exact",
                     ["gini_concentration"]),
    "X-time-yoy": ("plans.q_relational:q_revenue_yoy_growth  # "
                   "year-over-year growth per nation: broadcast dim "
                   "joins, cell-level lag window (never over fact "
                   "rows); hash-exact",
                   ["revenue_yoy_growth"]),
    "X-stream-drift": ("streaming.events:streaming_daily_drift  # "
                       "streaming twin of the drift monitor: per-day "
                       "PSI of the arriving click distribution vs the "
                       "static purchase reference; stream state "
                       "bounded at windows x 20 bin-count rows, PSI "
                       "math batch-side on the drained cells; "
                       "hash-exact vs the batch replay",
                       ["streaming_drift_monitor"]),
    "X-ts-anomaly": ("plans.q_events:q_seasonal_anomaly_report  # "
                     "hour-of-day seasonal z-score anomaly scan over "
                     "the dense (calendar-spine) hourly series; "
                     "integer sufficient statistics, IEEE-exact z "
                     "(no transcendentals); hash-exact",
                     ["seasonal_anomaly_report"]),
    "X-clean-winsorize": ("plans.q_relational:q_winsorized_stats  # "
                          "winsorized mean/std per group: exact p01/"
                          "p99 fences (6-decimal rounded on both "
                          "engines), DECIMAL micro-unit sufficient "
                          "statistics; hash-exact",
                          ["winsorized_stats"]),
    "X-event-conversion-lag": ("plans.q_events:q_conversion_lag  # "
                               "first-view to first-purchase lag "
                               "distribution: integer-micro lags, "
                               "exact interpolated p50/p90; "
                               "hash-exact",
                               ["conversion_lag_percentiles"]),
    "X-stats-bootstrap": ("plans.q_events:q_bootstrap_mean_ci  # "
                          "Poisson(1) bootstrap CI (Chamandy et al. "
                          "2012): map-side per-replicate weights from "
                          "content-stable md5 uniforms, micro-unit "
                          "integer replicate sums, exact percentile "
                          "CI over B means; hash-exact",
                          ["bootstrap_mean_ci"]),
    "X-retrieval-metrics": ("plans.q_text:q_retrieval_metrics  # "
                            "nDCG@10 / MRR / P@10 per query term over "
                            "the BM25-scored match lists (9-decimal "
                            "score rounding + doc_id tiebreak before "
                            "ranking); hash-exact",
                            ["retrieval_metrics_ndcg"]),
    "X-stats-ab-test": ("plans.q_events:q_ab_test_welch  # Welch "
                        "two-sample t + Welch-Satterthwaite dof + "
                        "Cohen's d from exact micro-unit integer "
                        "sufficient statistics, one aggregate pass; "
                        "hash-exact",
                        ["ab_test_welch"]),
    "X-sim-centroids": ("plans.q_similarity:q_label_centroid_similarity"
                        "  # exact pairwise label-centroid cosine: 1/n "
                        "cancels, so integer 1e-7-quantized SUM vectors "
                        "stay exact until one divide+sqrt; hash-exact",
                        ["label_centroid_similarity"]),
    "X-olap-share-of-parent": ("plans.q_relational:q_share_of_parent  # "
                               "nation-in-region / region-in-total "
                               "contribution shares, DECIMAL-exact "
                               "cells, window over 25 rows; hash-exact",
                               ["share_of_parent_rollup"]),
    "X-scd2-pit-join": ("plans.q_lakehouse:q_scd2_pit_join  # point-in-"
                        "time join of facts against SCD2 validity "
                        "intervals: entity-key equi-join with interval "
                        "containment as residual filter; hash-exact",
                        ["scd2_point_in_time_join"]),
    "X-multimodal-container": ("plans.q_sources:q_multimodal_container"
                               "  # RIFF-style container pack + header "
                               "parse roundtrip as pure binary column "
                               "expressions (magic, u16 dims, sha256 "
                               "payload integrity); hash-exact",
                               ["multimodal_container_parse"]),
    "X-subquery-multi-exists": ("plans.q_relational:"
                                "q_sole_blame_suppliers  # TPC-H Q21 "
                                "shape (correlated EXISTS + NOT "
                                "EXISTS) decorrelated to one per-order "
                                "profile aggregate; hash-exact",
                                ["sole_blame_suppliers"]),
    "X-join-outer-histogram": ("plans.q_relational:"
                               "q_customer_order_histogram  # TPC-H "
                               "Q13 shape: LEFT OUTER join preserving "
                               "the zero bucket + double aggregate; "
                               "hash-exact",
                               ["customer_order_histogram"]),
    "X-event-adoption": ("plans.q_relational:q_cumulative_unique_users"
                         "  # per-type cumulative distinct users via "
                         "first-seen-day collapse + bounded triangular "
                         "cumsum (no running distinct, no global "
                         "window); hash-exact",
                         ["cumulative_unique_users"]),
    "X-sim-behavioral-topk": ("plans.q_events:q_behavioral_topk  # "
                              "blocked top-k user similarity (REPOSE/"
                              "EDBT'20 shape): quantized share "
                              "signature equi-join prunes candidates, "
                              "exact integer-dot cosine ranks them, "
                              "TakeOrdered bounds the result; "
                              "hash-exact",
                              ["behavioral_topk_similarity"]),
    "X-lakehouse-anti-entropy": ("plans.q_lakehouse:"
                                 "q_replica_merkle_diff  # merkle-"
                                 "style replica reconciliation: "
                                 "commutative per-bucket content-hash "
                                 "digests of two snapshots, bucket-"
                                 "level diff without a change log; "
                                 "hash-exact vs first-principles "
                                 "rebuild",
                                 ["replica_merkle_diff"]),
    "X-train-negative-sampling": ("plans.q_text:"
                                  "q_negative_sampling_table  # "
                                  "word2vec count^0.75 sampling table "
                                  "with EXACT largest-remainder "
                                  "apportionment of a fixed budget "
                                  "(sqrt(sqrt(c^3)) keeps the weight "
                                  "IEEE-exact; all rounding integer); "
                                  "hash-exact",
                                  ["negative_sampling_table"]),
    # --- round 11: remaining TPC-H shapes + sequential stats + metrics --
    "X-agg-conditional-share": ("plans.q_relational:"
                                "q_promo_revenue_share  # TPC-H Q14 "
                                "shape: CASE-gated numerator subset of "
                                "denominator in ONE pass; hash-exact",
                                ["promo_revenue_share"]),
    "X-join-market-share": ("plans.q_relational:"
                            "q_national_market_share  # TPC-H Q8 "
                            "shape: two snowflake arms off one fact, "
                            "yearly share; hash-exact",
                            ["national_market_share"]),
    "X-agg-global-scalar-having": ("plans.q_relational:"
                                   "q_important_parts_share  # TPC-H "
                                   "Q11 shape: grouped agg filtered vs "
                                   "1-row broadcast re-aggregation; "
                                   "hash-exact",
                                   ["important_parts_share"]),
    "X-agg-global-max-select": ("plans.q_relational:"
                                "q_top_supplier_by_revenue  # TPC-H "
                                "Q15 shape: view computed once, ties "
                                "at the global max kept via exact-"
                                "decimal equality; hash-exact",
                                ["top_supplier_by_revenue"]),
    "X-pred-disjunctive-join": ("plans.q_relational:"
                                "q_disjunctive_predicate_revenue  # "
                                "TPC-H Q19 shape: OR-of-ANDs left as "
                                "one Column so Catalyst derives "
                                "single-side implications; hash-exact",
                                ["disjunctive_predicate_revenue"]),
    "X-subquery-scalar-anti": ("plans.q_relational:"
                               "q_global_sales_opportunity  # TPC-H "
                               "Q22 shape: scalar-avg subquery + LEFT "
                               "ANTI join after the selective filter; "
                               "hash-exact",
                               ["global_sales_opportunity"]),
    "X-join-argmin-dims": ("plans.q_relational:"
                           "q_min_cost_supplier_per_part  # TPC-H Q2 "
                           "shape: per-group argmin under a TOTAL "
                           "order + dim decoration; hash-exact",
                           ["min_cost_supplier_per_part"]),
    "X-ts-cusum": ("plans.q_events:q_cusum_changepoint  # one-sided "
                   "CUSUM via the reflection identity S=P-min(0,min "
                   "prefix P): two stacked windows over bounded daily "
                   "cells, no sequential loop; hash-exact",
                   ["cusum_changepoint"]),
    "X-ts-time-weighted": ("plans.q_events:q_time_weighted_average  # "
                           "LEAD-segment TWAP, exact DECIMAL x micros "
                           "weighted sums, one division per user; "
                           "hash-exact",
                           ["time_weighted_average"]),
    "X-eval-auc": ("plans.q_ml:q_roc_auc_exact  # tie-corrected "
                   "Mann-Whitney 2U in BIGINT over bounded score "
                   "cells, cumulated by the two-phase distributed "
                   "prefix scan (operators.indexing:ordered_prefix_sum"
                   "); hash-exact",
                   ["roc_auc_exact"]),
    "X-eval-pr-auc": ("plans.q_ml:q_pr_auc_exact  # step-wise average "
                      "precision over the same cells: prefix-scan "
                      "cumulatives, 9-decimal-quantized DECIMAL term "
                      "sums (order-independent); hash-exact",
                      ["pr_auc_exact"]),
    "X-eval-calibration": ("plans.q_ml:q_probability_calibration_ece"
                           "  # fixed-width reliability bins with "
                           "exact-decimal bin means (never ntile); "
                           "hash-exact",
                           ["probability_calibration_ece"]),
    "X-stream-cusum": ("streaming.stateful:streaming_cusum  # per-type "
                       "CUSUM recursion as applyInPandasWithState "
                       "(O(types) state) vs the batch reflection "
                       "identity; parity flag hash-gated",
                       ["streaming_cusum_parity"]),
    "X-stream-twap": ("streaming.stateful:streaming_twap  # per-user "
                      "online TWAP fold (O(users) state), integer "
                      "micros exact vs the batch LEAD-segment form; "
                      "parity flag hash-gated",
                      ["streaming_twap_parity"]),
    "X-join-cross-arm-equality": ("plans.q_relational:"
                                  "q_local_supplier_volume  # TPC-H Q5 "
                                  "shape: the two dim arms tied to "
                                  "EACH OTHER (s_nationkey = "
                                  "c_nationkey); hash-exact",
                                  ["local_supplier_volume"]),
    "X-agg-having-semijoin": ("plans.q_relational:"
                              "q_large_volume_orders  # TPC-H Q18 "
                              "shape: HAVING filter before any join, "
                              "survivors decorated + TakeOrdered; "
                              "hash-exact",
                              ["large_volume_orders"]),
    "X-agg-group-share-threshold": ("plans.q_relational:"
                                    "q_dominant_part_suppliers  # "
                                    "TPC-H Q20 shape: per-group share "
                                    "vs profile threshold by EXACT "
                                    "decimal cross-multiplication; "
                                    "hash-exact",
                                    ["dominant_part_suppliers"]),
    "X-scan-only-aggregate": ("plans.q_relational:"
                              "q_forecast_revenue_change  # TPC-H Q6 "
                              "shape: all predicates PushedFilters, "
                              "4-column ReadSchema, no join (plan-"
                              "tested); hash-exact",
                              ["forecast_revenue_change"]),
    "X-pred-symmetric-pair": ("plans.q_relational:"
                              "q_nation_pair_volume  # TPC-H Q7 "
                              "shape: (A,B) OR (B,A) across two dim "
                              "arms, IN-set derived per arm; "
                              "hash-exact",
                              ["nation_pair_volume"]),
    "X-agg-distinct-after-anti": ("plans.q_relational:"
                                  "q_supplier_count_by_part_attrs  # "
                                  "TPC-H Q16 shape: NOT-IN as LEFT "
                                  "ANTI before the distinct-pair "
                                  "collapse + COUNT DISTINCT; "
                                  "hash-exact",
                                  ["supplier_count_by_part_attrs"]),
    # --- round 12: the final three TPC-H shapes -------------------------
    "X-agg-two-fact-profit": ("plans.q_relational:q_part_type_profit"
                              "  # TPC-H Q9 shape: dim column mixed "
                              "into the per-row profit expression "
                              "(p_retailprice plays ps_supplycost; no "
                              "partsupp ships), exact scale-4 decimal "
                              "subtraction; hash-exact",
                              ["part_type_profit"]),
    "X-join-topk-returns": ("plans.q_relational:q_returned_item_ranking"
                            "  # TPC-H Q10 shape: quarter+returnflag "
                            "filtered 4-way join, top-20 under a "
                            "TOTAL order on the EXACT decimal "
                            "revenue; hash-exact",
                            ["returned_item_ranking"]),
    "X-dedup-incremental-fuzzy": ("operators.dedup:"
                                  "incremental_fuzzy_dedup  # nightly-"
                                  "increment MinHash, STAGED: exact "
                                  "set-fingerprint bucket stats drop "
                                  "identical-copy mass first (no pair "
                                  "enumeration), survivors band-join "
                                  "the PERSISTED corpus index + "
                                  "batch-mates, exact-Jaccard verify, "
                                  "greedy one-pass admission; "
                                  "hash-exact at sf0.01/10x/sf1, "
                                  "1.4x wall at 10x",
                                  ["incremental_fuzzy_dedup", "multi_increment_dedup_replay"]),
    "X-agg-two-way-case-count": ("plans.q_relational:"
                                 "q_shipping_delay_priority_counts"
                                 "  # TPC-H Q12 shape: complementary "
                                 "CASE counts in ONE aggregate, mode "
                                 "class derived from integer day "
                                 "arithmetic (no l_shipmode ships); "
                                 "hash-exact",
                                 ["shipping_delay_priority_counts"]),
}

# the full SURVEY §2 inventory the map must cover
ALL_IDS = (
    [f"S{i}" for i in range(1, 14)]
    + [f"P{i}" for i in range(1, 11)]
    + [f"T{i}" for i in range(1, 11)]
    + [f"J{i}" for i in range(1, 10)]
    + [f"A{i}" for i in range(1, 11)]
    + [f"O{i}" for i in range(1, 5)]
    + [f"D{i}" for i in range(1, 4)]
    + [f"M{i}" for i in range(1, 27)]
)


def generate_markdown() -> str:
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY

    lines = [
        "# COVERAGE — SURVEY §2 operator inventory → implementation",
        "",
        "Generated by `python tools/coverage_map.py`; checked by",
        "`tests/test_coverage.py`. `[oracle]` = DuckDB-hash-verified query,",
        "`[rows]` = rows-only driver check.",
        "",
        "| ID | Implementation | Registry queries |",
        "|---|---|---|",
    ]
    for op_id in ALL_IDS + [k for k in COVERAGE if k.startswith("X-")]:
        impl, queries = COVERAGE[op_id]
        qcells = []
        for q in queries:
            mode = "oracle" if REGISTRY[q].sql is not None else "rows"
            qcells.append(f"`{q}` [{mode}]")
        lines.append(f"| {op_id} | `{impl}` | {', '.join(qcells) or '—'} |")
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    import os

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "COVERAGE.md")
    with open(out, "w") as f:
        f.write(generate_markdown())
    print(f"wrote {out}")
