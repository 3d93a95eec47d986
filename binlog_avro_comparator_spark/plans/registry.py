"""Query registry: the driver contract surface.

``queries()`` maps names to (spark, sf_dir) -> DataFrame callables;
``oracle_sql()`` maps the same names to DuckDB SQL that computes the
identical result over the same parquet tables.  Column names/aliases
match pairwise -- the driver sorts columns by name before value-hashing.

Round 7 split the implementations into family modules (q_cdc /
q_streaming / q_corpus / q_ann / q_analytics, plus the oracle SQL in
oracles_cdc / oracles_corpus / oracles_analytics with shared CTE
fragments in oracle_ctes); this module re-exports every name and owns
the two contract functions, so the ordering of the queries() dict --
which the external driver samples -- stays in one reviewable place.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from .q_cdc import *  # noqa: F401,F403
from .q_streaming import *  # noqa: F401,F403
from .q_corpus import *  # noqa: F401,F403
from .q_ann import *  # noqa: F401,F403
from .q_analytics import *  # noqa: F401,F403
from . import oracles_cdc as _oracles_1
from . import oracles_corpus as _oracles_2
from . import oracles_analytics as _oracles_3




# NOTE on ordering: the external correctness driver checks the FIRST 50
# entries of the queries() dict (CORRECTNESS_r02 covered exactly queries
# 1..50).  Window priority (r3 freeze rule, refined r10 per the r9
# verdict item 5): (1) never-driver-verified or CHANGED queries lead;
# (2) the window back-fills with the entries whose last DRIVER
# verification is OLDEST (r11: the 10 remaining r02-verified entries
# the r10 backfill did not reach, then the r03-verified originals),
# so driver evidence rotates instead of re-sampling recent rounds.
# The two lists below encode that order; the literal dict keeps its
# historical grouping and the final reorder is mechanical.  ALL
# entries, window or not, are value-verified locally each round at
# sf0.01 by scratch/check.py -- see FULLSWEEP_r11.md.
_R11_WINDOW_HEAD = [
    # new in r11: the type-aware column matrix, the live-feed column
    # guard (read-time compose over the statement-log fold), and --
    # from the continuation sessions -- the statement-vocabulary census
    # over the m=3 sub-split fixture (TRUNCATE / INDEX / MAINTENANCE),
    # the cross-source schema agreement (batch / fold-declared stream /
    # both-sides-live), the incremental LSH index fold, and time-travel
    # reads over the versioned fold state
    "cdc_ddl_statement_census",
    "cdc_schema_vs_lake",
    "cdc_schema_vs_lake_stream",
    "cdc_schema_vs_lake_live",
    "corpus_lsh_incremental",
    "corpus_simhash_incremental",
    "cdc_schema_timeline_asof",
    "cdc_schema_types",
    "cdc_schema_types_stream",
    "cdc_payload_diff_guarded_stream",
    # changed in r11: the DDL grammar completion (OPTION_NO_EFFECT,
    # multi-pair RENAME explode, paren multi-ADD) re-certifies the
    # whole DDL tier on the mod-13 fixture
    "cdc_schema_timeline",
    "cdc_schema_columns",
    "cdc_ddl_partial_parse",
    "cdc_ddl_window_columns",
    "cdc_payload_diff_guarded",
    "cdc_payload_diff_column_guarded",
    "cdc_ddl_guard_impact",
    "cdc_schema_timeline_stream",
    "cdc_schema_columns_stream",
]
_R11_WINDOW_BACKFILL = [
    # stalest driver evidence first: r02 leftovers, then the r03 set
    "events_windowed_stream",
    "lang_id",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "simhash_fingerprints",
    "simhash_near_pairs",
    "text_clean",
    "text_quality",
    "tfidf_top_terms",
    "token_count",
    "big_ticket_orders",
    "cdc_apply_changes",
    "cdc_avro_native_scan_jvm",
    "cdc_parse_binlog_text_pyds",
    "cdc_snapshot_stream",
    "corpus_mixture_sample",
    "customer_nation_revenue",
    "doc_bigram_logprob",
    "doc_chunks",
    "doc_dsir_weights",
    "doc_fuzzy_contamination",
    "doc_pack_sequences",
    "doc_redact_pii",
    "doc_repeated_spans",
    "doc_span_removal",
    "doc_split_assignments",
    "embedding_cluster_profiles",
    "embedding_kmeans",
    "events_dedup_stream",
    "events_funnel",
    "events_join_stream",
]


def queries() -> dict[str, QueryFn]:
    base = _queries_grouped()
    head = _R11_WINDOW_HEAD + _R11_WINDOW_BACKFILL
    # uniqueness locked explicitly: a duplicate between the two lists
    # would silently shrink the driver's first-50 window (dict merge
    # dedupes keys) while the length assert stayed green
    assert len(head) == 50 and len(set(head)) == 50
    assert all(k in base for k in head)
    return {**{k: base[k] for k in head}, **base}


def _queries_grouped() -> dict[str, QueryFn]:
    return {
        # -- NEW in r9: lead the driver window (r3 freeze rule).
        # cdc_schema_timeline / cdc_payload_diff_guarded /
        # cdc_schema_columns close the r8 verdict's top item (DDL
        # timeline + the payload-diff guard at the DDL boundary + the
        # effective column inventory); the incremental folds are
        # verdict item 2; the perceptual tier is item 3.  The r8
        # entries that follow back-fill the 50-entry window with
        # cumulative-green rows; embedding_knn_label_audit /
        # embedding_bitext_margin re-certify the r9 guard-rail change,
        # media_ahash/media_perceptual_dup/video_perceptual_dup the
        # decorrelated fixtures. --
        # -- NEW in the r9 continuation session (23 entries): privacy
        # release audit, calendar seasonal decomposition, growth
        # accounting (batch + incremental fold), net-effect changelog
        # compaction, multi-master conflicts, encoding-corruption gate,
        # code-switch profile, supplier set similarity, integer-exact
        # autocorrelation/MASE/SLO-burn, power-iteration PCA, cohort
        # LTV, fulfillment SLA, embedding dim census, engagement
        # panel, audio perceptual near-dup, SPC p-chart, sourcing HHI,
        # survivorship audit.  All lead the driver window (r3 freeze
        # rule); every entry value-verified at sf0.01 before
        # registration. --
        # -- NEW or CHANGED in r10: lead the driver window (r3 freeze
        # rule).  The DDL grammar completion (r9 verdict item 1)
        # re-certifies the four r9 DDL entries on the extended fixture
        # (multi-clause ALTER, MODIFY/CHANGE/RENAME COLUMN, RENAME
        # TABLE threaded through the timeline) and adds the
        # PARTIAL_PARSE channel + the column-granular quarantine
        # (item 2).  supplier_similarity / events_hourly_autocorr /
        # media_audio_perceptual_dup re-certify the ADVICE fixes
        # (pair symmetry, double-cast Pearson terms, long phash). --
        # -- NEW or CHANGED in r11: the online-DDL grammar completion
        # (option clauses stay OPTION_NO_EFFECT, multi-pair RENAME
        # explodes -- the gh-ost atomic swap threads the live name --
        # paren multi-column ADD parses) re-certifies the DDL tier on
        # the mod-13 fixture; cdc_schema_types is the type-aware
        # matrix with the narrowing plant. --
        # -- r11 continuation: the statement-vocabulary completion
        # (TRUNCATE / standalone INDEX / multi-name MAINTENANCE on the
        # m=3 sub-split fixture) re-certifies the tier again, with
        # cdc_ddl_statement_census as the vocabulary showcase. --
        "cdc_ddl_statement_census": _q_cdc_ddl_statement_census,
        "cdc_schema_vs_lake": _q_cdc_schema_vs_lake,
        "cdc_schema_vs_lake_stream": _q_cdc_schema_vs_lake_stream,
        "cdc_schema_vs_lake_live": _q_cdc_schema_vs_lake_live,
        "corpus_lsh_incremental": _q_corpus_lsh_incremental,
        "corpus_simhash_incremental": _q_corpus_simhash_incremental,
        "cdc_schema_timeline_asof": _q_cdc_schema_timeline_asof,
        "cdc_schema_types": _q_cdc_schema_types,
        "cdc_schema_types_stream": _q_cdc_schema_types_stream,
        "cdc_payload_diff_guarded_stream": _q_cdc_payload_diff_guarded_stream,
        "cdc_payload_diff_column_guarded": _q_cdc_payload_diff_column_guarded,
        "cdc_ddl_partial_parse": _q_cdc_ddl_partial_parse,
        "cdc_ddl_window_columns": _q_cdc_ddl_window_columns,
        "cdc_schema_timeline_stream": _q_cdc_schema_timeline_stream,
        "cdc_schema_columns_stream": _q_cdc_schema_columns_stream,
        "embedding_pq_distortion": _q_pq_distortion,
        "dedup_survivorship_conflicts": _q_survivorship_conflicts,
        "orders_returns_control": _q_returns_control,
        "part_sourcing_hhi": _q_sourcing_hhi,
        "events_slo_burn": _q_slo_burn,
        "media_audio_perceptual_dup": _q_audio_perceptual_dup,
        "events_engagement_ratios": _q_engagement_ratios,
        "events_lifecycle_incremental": _q_events_lifecycle_incremental,
        "embedding_dim_stats": _q_embedding_dim_stats,
        "customer_cohort_ltv": _q_cohort_ltv,
        "orders_fulfillment_sla": _q_fulfillment_sla,
        "events_forecast_baseline": _q_forecast_baseline,
        "events_top_movers": _q_top_movers,
        "embedding_pca_power": _q_pca_power,
        "supplier_similarity": _q_supplier_similarity,
        "events_hourly_autocorr": _q_hourly_autocorr,
        "doc_encoding_anomalies": _q_encoding_anomalies,
        "doc_code_switch": _q_code_switch,
        "cdc_changelog_compaction": _q_cdc_changelog_compaction,
        "cdc_multimaster_conflicts": _q_cdc_multimaster_conflicts,
        "customer_k_anonymity": _q_k_anonymity,
        "orders_seasonal_profile": _q_seasonal_profile,
        "events_user_lifecycle": _q_user_lifecycle,
        "cdc_schema_timeline": _q_cdc_schema_timeline,
        "cdc_payload_diff_guarded": _q_cdc_payload_diff_guarded,
        "cdc_schema_columns": _q_cdc_schema_columns,
        "cdc_ddl_guard_impact": _q_cdc_ddl_guard_impact,
        # production incremental folds for the complete-mode streams
        # (r8 verdict item 2): versioned-state foreachBatch, multi
        # micro-batch replay, state never holds the event history
        "cdc_transactions_incremental": _q_cdc_transactions_incremental,
        "events_funnel_incremental": _q_events_funnel_incremental,
        # perceptual media tier (r8 verdict item 3): decoded-content
        # aHash catches the re-encodes byte chunking provably misses
        "media_ahash": _q_media_ahash,
        "media_perceptual_dup": _q_media_perceptual_dup,
        "video_perceptual_dup": _q_video_perceptual_dup,
        "embedding_prototypes": _q_embedding_prototypes,
        # -- NEW or CHANGED in r8: lead the driver window (r3 freeze
        # rule).  The two *_bucketed entries are the r7 verdict's
        # top item (candidates= scale path for the embedding audits);
        # embedding_bitext_margin is re-certified because the ranked
        # pool changed to the published union-of-shortlists;
        # embedding_knn_label_audit re-certifies the shared-vote-tail
        # refactor; the cdc_* entries re-certify the ADVICE fixes
        # (per-UUID watermark, total rotate ordering, byte-offset
        # stream resume). --
        "cdc_table_scorecard": _q_table_scorecard,
        "cdc_transactions_stream": _q_cdc_transactions_stream,
        "events_funnel_stream": _q_events_funnel_stream,
        "cdc_match_timeline": _q_match_timeline,
        "cdc_gtid_coverage": _q_gtid_coverage,
        "embedding_knn_audit_bucketed": _q_knn_audit_bucketed,
        "embedding_bitext_margin_bucketed": _q_bitext_margin_bucketed,
        "corpus_bpe_vocab": _q_bpe_vocab,
        "corpus_bpe_encode": _q_bpe_encode,
        "ann_ivf_pq_topk": _q_ann_ivf_pq_topk,
        "embedding_coreset": _q_embedding_coreset,
        "corpus_data_card": _q_data_card,
        "doc_quality_blend": _q_quality_blend,
        "dedup_threshold_curve": _q_threshold_curve,
        "media_near_dup": _q_media_near_dup,
        "embedding_dup_clusters": _q_embedding_dup_clusters,
        "events_bot_scores": _q_bot_scores,
        "graph_near_dup_kcore": _q_graph_kcore,
        "ann_ivf_probe_curve": _q_ivf_probe_curve,
        "dedup_impact_report": _q_dedup_impact,
        "cdc_near_miss_keys": _q_near_miss_keys,
        "events_feed_gaps": _q_feed_gaps,
        "media_type_census": _q_media_type_census,
        "ann_ivf_probe_pruned": _q_ivf_probe_pruned,
        "embedding_bitext_margin": _q_bitext_margin,
        "embedding_knn_label_audit": _q_knn_label_audit,
        "cdc_parse_stream_pyds": _q_cdc_parse_stream_pyds,
        "cdc_parse_stream_binlogbin": _q_cdc_parse_stream_binlogbin,
        "cdc_consistency_watermark": _q_consistency_watermark,
        "cdc_snapshot_at_watermark": _q_snapshot_at_watermark,
        "cdc_rotate_chain": _q_cdc_rotate_chain,
        "cdc_gtid_set": _q_cdc_gtid_set,
        "doc_tfidf_neighbors": _q_tfidf_neighbors,
        "cdc_transactions": _q_cdc_transactions,
        "dedup_cluster_sizes": _q_cluster_size_histogram,
        "events_watermark_plan": _q_watermark_plan,
        "ann_ivf_probe_incremental": _q_ivf_probe_incremental,
        "events_session_gaps": _q_session_gaps,
        # -- r6 tail that never landed in a driver window (the r6 batch
        # overflowed the 50-entry window): these 24 lead round 7 so each
        # finally gets a CORRECTNESS row (r3 freeze rule) --
        "cdc_scd2_audit": _q_scd2_audit,
        "events_join_plan": _q_join_plan,
        "lang_id_confusion": _q_lang_confusion,
        "dedup_transitive_closure": _q_dedup_closure,
        "dedup_template": _q_template_dedup,
        "cdc_binlog_variant": _q_binlog_variant,
        "events_conversion_ab": _q_conversion_ab,
        "orders_benford_audit": _q_benford,
        "customer_abc_classes": _q_abc_classes,
        "events_anomaly_stream": _q_anomaly_stream,
        "embedding_label_drift": _q_embedding_drift,
        "events_attribution_multitouch": _q_multitouch,
        "events_attribution_position": _q_multitouch_position,
        "dedup_prefix_filter_pairs": _q_prefix_filter,
        "events_attribution_decay": _q_multitouch_decay,
        "dedup_containment_pairs": _q_containment,
        "corpus_token_allocation": _q_token_allocation,
        "corpus_source_redundancy": _q_source_redundancy,
        "dedup_minhash_error": _q_minhash_error,
        "lineitem_median_of_means": _q_median_of_means,
        "dedup_label_consensus": _q_label_consensus,
        "customer_rfm_scores": _q_rfm,
        "events_funnel_timing": _q_funnel_timing,
        "corpus_zipf_fit": _q_zipf,
        # -- NEW in r7: inside the driver window on first registration --
        "dedup_closure_overflow": _q_closure_overflow,
        "cdc_avro_logical_scan": _q_cdc_avro_logical_scan,
        "cdc_avro_schema_census": _q_cdc_avro_schema_census,
        "lineitem_range_sort_plan": _q_range_sort_plan,
        "corpus_shingle_saturation": _q_shingle_saturation,
        "corpus_vocab_drift": _q_vocab_drift,
        "corpus_epoch_manifest": _q_epoch_manifest,
        "corpus_vocab_drift_stream": _q_vocab_drift_stream,
        "lineitem_zorder_skipping": _q_zorder_skipping_report,
        "corpus_contamination_by_source": _q_contamination_by_source,
        "ann_ivf_list_balance": _q_ivf_list_balance,
        # -- r6-verified (driver-green in CORRECTNESS_r06) --
        "cdc_parse_binlog_typed": _q_cdc_parse_binlog_typed,
        "cdc_payload_diff_typed": _q_cdc_payload_diff_typed,
        "embedding_kmeans_gemm": _q_kmeans_gemm,
        "cdc_payload_findings_stream": _q_cdc_payload_findings_stream,
        "cdc_binlog_skip_stats": _q_cdc_binlog_skip_stats,
        "cdc_parse_binlog_stream": _q_cdc_parse_binlog_stream,
        "cdc_gtid_gaps": _q_cdc_gtid_gaps,
        "cdc_order_audit": _q_cdc_order_audit,
        "cdc_lag_timeline": _q_cdc_lag_timeline,
        # -- round-6 continuation additions (inside the driver's
        # 50-entry window for their first driver row; the displaced
        # r5 rows keep their r5 driver evidence and stay green in
        # the local full-registry sweep) --
        "embedding_sign_bits": _q_embedding_sign_bits,
        "ann_hamming_topk": _q_ann_hamming_topk,
        "ann_recall_report": _q_ann_recall_report,
        "events_kmv_setops": _q_kmv_setops,
        "cdc_avro_evolved_scan": _q_cdc_avro_evolved_scan,
        "events_running_stats_stream": _q_events_running_stats_stream,
        "corpus_bpe_merges": _q_bpe_merges,
        "lineitem_hilbert_layout": _q_hilbert_layout,
        "doc_leakage_safe_splits": _q_leakage_safe_splits,
        "events_attribution": _q_purchase_attribution,
        "events_hll_sketch_union": _q_hll_sketch_union,
        "dedup_keep_best": _q_dedup_keep_best,
        "cdc_resume_bookmarks": _q_cdc_resume_bookmarks,
        "events_skew_report": _q_events_skew_report,
        "doc_hybrid_search": _q_hybrid_search,
        "dedup_incremental": _q_incremental_dedup,
        "events_hdr_stream": _q_events_hdr_stream,
        "ann_matryoshka_recall": _q_matryoshka_recall,
        "events_winsorized": _q_winsorized,
        "lineitem_zorder3_layout": _q_zorder3_layout,
        "orders_rolling_mau": _q_rolling_mau,
        "lineitem_bootstrap_mean": _q_bootstrap_mean,
        "events_ab_test": _q_ab_test_welch,
        "events_value_trend": _q_value_trend_ols,
        "events_cusum_changepoints": _q_cusum_changepoints,
        "lineitem_basket_pairs": _q_basket_brand_pairs,
        "ann_hard_negatives": _q_hard_negatives,
        "gdpr_erasure_audit": _q_erasure_audit,
        "cdc_ivm_refresh": _q_ivm_refresh,
        "customer_360_profile": _q_customer_360,
        "events_chi_square": _q_chi_square,
        "events_psi_drift": _q_psi_drift,
        "events_ks_drift": _q_ks_drift,
        "cdc_ivm_stream": _q_ivm_stream,
        "events_mad_anomalies": _q_mad_anomalies,
        "media_arrow_digest": _q_media_arrow_digest,
        "events_twap_daily": _q_twap_daily,
        "events_path_trigrams": _q_path_trigrams,
        "events_hll_rolling": _q_hll_rolling,
        "events_psi_stream": _q_psi_stream,
        "dedup_method_agreement": _q_dedup_agreement,
        # -- NEW in r5: the payload tier + merge sit first (CDC core),
        # then the corpus-analysis / retrieval / graph / sketch / PQ
        # additions. --
        "cdc_parse_binlog_rows": _q_cdc_parse_binlog_rows,
        "cdc_payload_diff": _q_cdc_payload_diff,
        "cdc_payload_diff_stream": _q_cdc_payload_diff_stream,
        "cdc_payload_summary": _q_cdc_payload_summary,
        "cdc_merge_upsert": _q_cdc_merge_upsert,
        "cdc_scd2_history": _q_cdc_scd2_history,
        "cdc_scd2_lookup": _q_cdc_scd2_lookup,
        "lineitem_measure_profile": _q_lineitem_measure_profile,
        "events_retention_cohorts": _q_events_retention_cohorts,
        "events_type_transitions": _q_events_type_transitions,
        "events_cms_counts": _q_events_cms_counts,
        "doc_inverted_index": _q_doc_inverted_index,
        "doc_term_pmi": _q_doc_term_pmi,
        "doc_shingle_novelty": _q_doc_shingle_novelty,
        "doc_bm25_topk": _q_doc_bm25_topk,
        "doc_weighted_sample": _q_doc_weighted_sample,
        "graph_supplier_pagerank": _q_graph_supplier_pagerank,
        "graph_near_dup_triangles": _q_graph_near_dup_triangles,
        "embedding_pq_codes": _q_embedding_pq_codes,
        "ann_pq_adc_topk": _q_ann_pq_adc_topk,
        "doc_bloom_contamination": _q_doc_bloom_contamination,
        "events_hdr_quantiles": _q_hdr_quantiles,
        # -- impl or oracle changed in r5 (ADVICE fixes: z-score zero
        # guard, MG null-key contract, 5.7-after-8.0 ict reset,
        # session-oracle tie order): re-certify under the driver --
        "events_value_anomalies": _q_value_anomalies,
        "events_burst_minutes": _q_burst_minutes,
        "corpus_heavy_langs": _q_heavy_langs,
        "cdc_parse_binlog_binary": _q_cdc_parse_binlog_binary,
        "events_session_stream": _q_events_session_stream,
        # -- r4-green regression coverage fills the window to 50 --
        "doc_top_terms_udtf": _q_top_terms_udtf,
        "lineitem_zorder_layout": _q_zorder_layout,
        "cdc_snapshot_incremental": _q_cdc_snapshot_incremental,
        # -- NEW in r4 (registered only after the never-verified head
        # above, per the r3 freeze rule; all 30 r4 additions sit inside
        # the 50-entry window so each gets a driver row in its first
        # round) --
        "discounted_revenue": _q_discounted_revenue,
        "promo_revenue_share": _q_promo_revenue_share,
        "late_line_priority_mix": _q_late_line_priority_mix,
        "volume_shipping": _q_volume_shipping,
        "nation_market_share": _q_nation_market_share,
        "returned_item_losses": _q_returned_item_losses,
        "important_parts": _q_important_parts,
        "top_revenue_supplier": _q_top_revenue_supplier,
        "min_cost_supplier_per_part": _q_min_cost_supplier_per_part,
        "excess_quantity_suppliers": _q_excess_quantity_suppliers,
        "idle_rich_customers": _q_idle_rich_customers,
        "doc_type_token_ratio": _q_type_token_ratio,
        "shipping_priority": _q_shipping_priority,
        "supplier_part_counts": _q_supplier_part_counts,
        "small_quantity_revenue": _q_small_quantity_revenue,
        "brand_bracket_revenue": _q_brand_bracket_revenue,
        "corpus_source_reputation": _q_source_reputation,
        "doc_source_filter": _q_doc_source_filter,
        "events_enrich_stream": _q_events_enrich_stream,
        "doc_gopher_quality": _q_gopher_quality,
        "cdc_latency_stats": _q_cdc_latency_stats,
        "media_video_frames_riff": _q_media_video_frames_riff,
        "events_time_rollup": _q_events_time_rollup,
        "events_gap_fill": _q_events_gap_fill,
        "cdc_snapshot_diff": _q_cdc_snapshot_diff,
        "cdc_replica_checksums": _q_cdc_replica_checksums,
        "doc_arrow_slugs": _q_doc_slugs,
        "doc_levenshtein_pairs": _q_levenshtein_pairs,
        # -- freshest green tier (regression coverage) --
        "doc_boilerplate_removal": _q_remove_boilerplate,
        "embedding_semdedup": _q_semdedup,
        # ---- driver window boundary (position 50) ----
        # (the 17 r5 additions + 5 r5-changed re-certifications pushed
        # these r4-green rows out of the window; they keep their r4
        # driver evidence and stay value-verified each round by
        # scratch/check.py at sf0.01 and sf0.1)
        "doc_unigram_logprob": _q_unigram_logprob,
        "corpus_mixture_weights": _q_mixture_weights,
        "doc_sample_k_per_group": _q_sample_k_per_group,
        "customer_order_distribution": _q_customer_order_distribution,
        "late_shipment_orders": _q_late_shipment_orders,
        "monthly_revenue_growth": _q_monthly_revenue_growth,
        "events_hll_distinct_users": _q_hll_distinct_users,
        "star_data_quality": _q_data_quality_report,
        "doc_length_bucket_padding": _q_length_bucket_padding,
        "embedding_quantize_int8": _q_quantize_int8,
        "media_image_features": _q_media_features,
        "events_left_join_stream": _q_events_left_join_stream,
        "events_join_stream": _q_events_join_stream,
        "big_ticket_orders": _q_big_ticket_orders,
        "doc_dsir_weights": _q_dsir_weights,
        "doc_bigram_logprob": _q_bigram_logprob,
        "embedding_cluster_profiles": _q_cluster_profiles,
        "events_top_type_stream": _q_events_top_type_stream,
        "cdc_parse_binlog_text_pyds": _q_cdc_parse_pyds,
        "late_exclusive_suppliers": _q_late_exclusive_suppliers,
        "doc_fuzzy_contamination": _q_fuzzy_contamination,
        "media_exact_dedup": _q_media_exact_dedup,
        "doc_span_removal": _q_remove_spans,
        "cdc_avro_native_scan_jvm": _q_cdc_avro_native_scan_jvm,
        "events_kmv_distinct_users": _q_kmv_distinct,
        "events_salted_type_stats": _q_salted_type_stats,
        "doc_repeated_spans": _q_repeated_spans,
        "ngram_jaccard_pairs": _q_jaccard_pairs,
        "doc_redact_pii": _q_redact_pii,
        "doc_split_assignments": _q_split_assignments,
        "embedding_kmeans": _q_kmeans,
        "events_rank_family": _q_rank_family,
        "orders_cube": _q_orders_cube,
        "events_dedup_stream": _q_events_dedup_stream,
        "cdc_snapshot_stream": _q_cdc_snapshot_stream,
        "events_trailing_10min": _q_trailing_10min,
        "part_above_brand_avg": _q_part_above_brand_avg,
        "top_parts_per_brand": _q_top_parts_per_brand,
        "events_value_histogram": _q_value_histogram,
        "cdc_apply_changes": _q_cdc_apply_changes,
        "regional_supplier_volume": _q_regional_supplier_volume,
        "part_profit_by_nation": _q_part_profit_by_nation,
        "events_funnel": _q_events_funnel,
        "doc_pack_sequences": _q_pack_sequences,
        "doc_chunks": _q_doc_chunks,
        "corpus_mixture_sample": _q_mixture_sample,
        "media_video_frames": _q_media_video_frames,
        "media_audio_features": _q_media_audio_features,
        "q1_pricing_summary": _q_q1,
        "top_revenue_orders": _q_top_revenue,
        "customer_nation_revenue": _q_nation_revenue,
        "high_value_customers": _q_high_value_customers,
        "user_set_ops": _q_user_set_ops,
        "revenue_rollup": _q_revenue_rollup,
        # -- stable tier --
        "cdc_binlog_events": _q_cdc_binlog_events,
        "cdc_avro_rows": _q_cdc_avro_rows,
        "cdc_avro_native_scan": _q_cdc_avro_native_scan,
        "cdc_binlog_prepared": _q_cdc_binlog_prepared,
        "cdc_matches": _q_cdc_matches,
        "cdc_avro_only": _q_cdc_avro_only,
        "cdc_binlog_only": _q_cdc_binlog_only,
        "cdc_findings": _q_cdc_findings,
        "cdc_summary": _q_cdc_summary,
        "cdc_parse_binlog_text": _q_cdc_parse_roundtrip,
        "dedup_exact": _q_dedup_exact,
        "token_count": _q_token_count,
        "text_quality": _q_text_quality,
        "lang_id": _q_lang_id,
        "doc_fingerprint": _q_doc_fingerprint,
        "tfidf_top_terms": _q_tfidf,
        "distinct_users_per_type": _q_distinct_users,
        "minhash_signatures": _q_minhash_signatures,
        "minhash_lsh_pairs": _q_lsh_pairs,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_keep_canonical": _q_dedup_keep_canonical,
        "corpus_curation_pipeline": _q_corpus_curation,
        "doc_shards": _q_shard_assignments,
        "doc_quality_deciles": _q_quality_deciles,
        "corpus_vocab_topk": _q_corpus_vocab,
        "doc_token_ids": _q_token_ids,
        "text_clean": _q_clean_text,
        "doc_length_quantiles": _q_length_quantiles,
        "doc_stratified_sample": _q_stratified_sample,
        "doc_repetition": _q_repetition,
        "doc_contamination": _q_contamination,
        "simhash_fingerprints": _q_simhash,
        "simhash_near_pairs": _q_simhash_pairs,
        "embedding_near_dup": _q_embedding_near_dup,
        "ann_cosine_topk": _q_ann_cosine_topk,
        "ann_cosine_topk_lsh": _q_ann_cosine_topk_lsh,
        "ann_cosine_topk_ivf": _q_ann_cosine_topk_ivf,
        "ann_cosine_topk_pandas": _q_ann_cosine_topk_pandas,
        "events_sessionize": _q_events_sessionize,
        "events_running_windows": _q_running_windows,
        "events_asof_purchase": _q_asof_purchase,
        "events_props_stats": _q_events_props_stats,
        "events_type_pivot": _q_events_pivot,
        "events_view_click_range": _q_view_click_range,
        "events_windowed_stream": _q_events_windowed_stream,
        "cdc_findings_stream": _q_cdc_findings_stream,
    }


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}
    _oracles_1.add(sql)
    _oracles_2.add(sql)
    _oracles_3.add(sql)
    return sql
