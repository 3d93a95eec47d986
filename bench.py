"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to full materialization with a count over the
result (no driver-side collect of payload rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.plans import registry

# Headline set: flagship CDC diff + one per extension family + the
# relational bench queries.
BENCH_QUERIES = [
    "cdc_findings",
    "cdc_summary",
    "cdc_parse_binlog_text",
    "events_sessionize",
    "dedup_exact",
    "doc_fingerprint",
    "tfidf_top_terms",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "ngram_jaccard_pairs",
    "ann_cosine_topk",
    "ann_cosine_topk_pandas",
    "ann_cosine_topk_lsh",
    "media_image_features",
    "q1_pricing_summary",
    "top_revenue_orders",
    "customer_nation_revenue",
    "revenue_rollup",
]

# Added after round 1 -- timed separately so the headline total stays
# comparable round-over-round.
EXTRA_QUERIES = [
    "ann_cosine_topk_ivf",
    "dedup_clusters",
    "events_windowed_stream",
    "cdc_avro_native_scan",
    "events_asof_purchase",
    "events_kmv_distinct_users",
    # round 3
    "late_exclusive_suppliers",
    "doc_top_terms_udtf",
    "cdc_parse_binlog_text_pyds",
    "events_top_type_stream",
    "events_left_join_stream",
    "embedding_cluster_profiles",
    "lineitem_zorder_layout",
    "events_hll_distinct_users",
    "doc_boilerplate_removal",
    "embedding_semdedup",
    "embedding_quantize_int8",
    "doc_dsir_weights",
    "doc_bigram_logprob",
    "customer_order_distribution",
    "late_shipment_orders",
    "big_ticket_orders",
    "monthly_revenue_growth",
    "doc_span_removal",
    "cdc_avro_native_scan_jvm",
    "cdc_apply_changes",
    "events_funnel",
    "regional_supplier_volume",
    "part_profit_by_nation",
    "doc_pack_sequences",
    "doc_chunks",
    "corpus_mixture_sample",
    "doc_redact_pii",
    "doc_split_assignments",
    "embedding_kmeans",
    "events_rank_family",
    "orders_cube",
    "events_trailing_10min",
    "part_above_brand_avg",
    # round 4
    "discounted_revenue",
    "promo_revenue_share",
    "late_line_priority_mix",
    "volume_shipping",
    "nation_market_share",
    "returned_item_losses",
    "important_parts",
    "top_revenue_supplier",
    "min_cost_supplier_per_part",
    "excess_quantity_suppliers",
    "idle_rich_customers",
    "doc_type_token_ratio",
    "events_session_stream",
    "cdc_parse_binlog_binary",
    "shipping_priority",
    "supplier_part_counts",
    "small_quantity_revenue",
    "brand_bracket_revenue",
    "corpus_source_reputation",
    "doc_source_filter",
    "events_enrich_stream",
    "doc_gopher_quality",
    "corpus_heavy_langs",
    "cdc_latency_stats",
    "media_video_frames_riff",
    "events_time_rollup",
    "events_gap_fill",
    "cdc_snapshot_diff",
    "cdc_replica_checksums",
    "doc_arrow_slugs",
    "doc_levenshtein_pairs",
    "events_value_anomalies",
    "events_burst_minutes",
    # round 5
    "cdc_parse_binlog_rows",
    "cdc_payload_diff",
    "cdc_payload_summary",
    "events_retention_cohorts",
    "events_type_transitions",
    "doc_inverted_index",
    "doc_term_pmi",
    "doc_shingle_novelty",
    "graph_supplier_pagerank",
    "embedding_pq_codes",
    "ann_pq_adc_topk",
    "cdc_payload_diff_stream",
    "cdc_merge_upsert",
    "doc_bm25_topk",
    "doc_weighted_sample",
    "graph_near_dup_triangles",
    "events_cms_counts",
    "doc_bloom_contamination",
    "events_hdr_quantiles",
    "cdc_scd2_history",
    "cdc_scd2_lookup",
    "lineitem_measure_profile",
    # round 6
    "cdc_parse_binlog_typed",
    "cdc_payload_diff_typed",
    "embedding_kmeans_gemm",
    "cdc_payload_findings_stream",
    "cdc_binlog_skip_stats",
    "cdc_parse_binlog_stream",
    "cdc_gtid_gaps",
    "cdc_order_audit",
    "cdc_lag_timeline",
    # round 6 continuation (quantization/eval/retrieval/stats tiers)
    "embedding_sign_bits",
    "ann_hamming_topk",
    "ann_recall_report",
    "events_kmv_setops",
    "events_hll_sketch_union",
    "cdc_avro_evolved_scan",
    "corpus_bpe_merges",
    "lineitem_hilbert_layout",
    "doc_leakage_safe_splits",
    "events_attribution",
    "dedup_keep_best",
    "cdc_resume_bookmarks",
    "events_skew_report",
    "doc_hybrid_search",
    "dedup_incremental",
    "ann_matryoshka_recall",
    "events_winsorized",
    "lineitem_zorder3_layout",
    "orders_rolling_mau",
    "lineitem_bootstrap_mean",
    # round 6 continuation (statistics/drift/IVM/compliance tier)
    "events_ab_test",
    "events_value_trend",
    "events_cusum_changepoints",
    "lineitem_basket_pairs",
    "ann_hard_negatives",
    "gdpr_erasure_audit",
    "cdc_ivm_refresh",
    "customer_360_profile",
    "events_chi_square",
    "events_psi_drift",
    "events_ks_drift",
    "events_mad_anomalies",
    "events_twap_daily",
    "events_path_trigrams",
    "media_arrow_digest",
    "events_hll_rolling",
    "dedup_method_agreement",
    "cdc_scd2_audit",
    "events_join_plan",
    "lang_id_confusion",
    "dedup_transitive_closure",
    "dedup_template",
    "cdc_binlog_variant",
    "events_conversion_ab",
    "orders_benford_audit",
    "customer_abc_classes",
    "embedding_label_drift",
    "events_attribution_multitouch",
    "events_attribution_position",
    "dedup_prefix_filter_pairs",
    "events_attribution_decay",
    "dedup_containment_pairs",
    "corpus_token_allocation",
    "corpus_source_redundancy",
    "dedup_minhash_error",
    "lineitem_median_of_means",
    "dedup_label_consensus",
    "customer_rfm_scores",
    "events_funnel_timing",
    # round 7
    "dedup_transitive_closure",
    "dedup_closure_overflow",
    "cdc_avro_logical_scan",
    "cdc_avro_schema_census",
    "cdc_rotate_chain",
    "embedding_bitext_margin",
    "embedding_knn_label_audit",
    "lineitem_range_sort_plan",
    # round 8
    "embedding_knn_audit_bucketed",
    "embedding_bitext_margin_bucketed",
    "corpus_bpe_vocab",
    "corpus_bpe_encode",
    "ann_ivf_probe_pruned",
    "cdc_consistency_watermark",
    # round 8 continuation (CDC ops rollups, IVF-PQ, curation)
    "cdc_table_scorecard",
    "cdc_match_timeline",
    "cdc_gtid_coverage",
    "ann_ivf_pq_topk",
    "embedding_coreset",
    "corpus_data_card",
    "doc_quality_blend",
    "ann_ivf_probe_curve",
    "dedup_impact_report",
    "cdc_near_miss_keys",
    "events_feed_gaps",
    # round 9
    "cdc_schema_timeline",
    "cdc_payload_diff_guarded",
    "cdc_schema_columns",
    "cdc_ddl_guard_impact",
    "cdc_transactions_incremental",
    "events_funnel_incremental",
    "media_ahash",
    "media_perceptual_dup",
    "video_perceptual_dup",
    "embedding_prototypes",
    # round 9 continuation session
    "customer_k_anonymity",
    "orders_seasonal_profile",
    "events_user_lifecycle",
    "cdc_changelog_compaction",
    "cdc_multimaster_conflicts",
    "doc_encoding_anomalies",
    "doc_code_switch",
    "supplier_similarity",
    "events_hourly_autocorr",
    "embedding_pca_power",
    "events_forecast_baseline",
    "events_top_movers",
    "customer_cohort_ltv",
    "orders_fulfillment_sla",
    "embedding_dim_stats",
    "events_lifecycle_incremental",
    "events_engagement_ratios",
    "media_audio_perceptual_dup",
    "orders_returns_control",
    "part_sourcing_hhi",
    "events_slo_burn",
    "dedup_survivorship_conflicts",
    "embedding_pq_distortion",
    # round 10 (DDL grammar completion + column-granular quarantine +
    # streaming timeline)
    "cdc_payload_diff_column_guarded",
    "cdc_ddl_partial_parse",
    "cdc_ddl_window_columns",
    "cdc_schema_timeline_stream",
    "cdc_schema_columns_stream",
    # round 11 (type-aware matrix + live-feed column guard)
    "cdc_schema_types",
    "cdc_schema_types_stream",
    "cdc_payload_diff_guarded_stream",
]

# Plan-stable anchor (r8 verdict item 5): q1_pricing_summary's plan has
# been unchanged since round 1, so its wall measures the VM, not the
# code.  ref_warm_sec is the round-8 mid-round tracked series value
# (BASELINE.md "Round-8 tracked series"); the normalized totals are
# what the wall would read at reference VM speed -- the drift-immune
# number for cross-round comparison.
ANCHOR_QUERY = "q1_pricing_summary"
ANCHOR_REF_WARM_SEC = 0.293


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    # warm the JVM/codegen once with the cheapest query so the first
    # measured entry doesn't pay session spin-up
    qs["cdc_summary"](spark, sf_dir).count()

    def run_set(
        names: list[str],
        prewarm: bool = False,
        runs: int | None = None,
        anchor_every: int = 0,
        segment_anchors: list | None = None,
    ) -> tuple[dict[str, float], dict[str, float]]:
        """(first-pass, best-of-N) timings.  With ``prewarm`` each query
        runs ONCE un-timed before the measured passes: first-use codegen
        and fixture materialization shift run-to-run as the registry
        grows, which manufactured false per-query "regressions" for
        three rounds (e.g. ann_cosine_topk_lsh 0.87->1.41->2.15 cold
        while its warm time IMPROVED) -- pre-warming makes the headline
        a stable plan-execution number instead of a codegen lottery.
        The best-of pass is still reported as the steady-state a
        long-lived cluster session would see."""
        if runs is None:
            runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
        if prewarm:
            for name in names:
                qs[name](spark, sf_dir).count()
        first: dict[str, float] = {}
        best: dict[str, float] = {}
        for i in range(max(1, runs)):
            # r11 (r10 verdict item 8): anchors probe EVERY measured
            # pass, not just the first, so the committed JSON can carry
            # a best-of-N SEGMENTED headline -- the representative
            # number on a degrading-VM day, instead of whichever noise
            # band the first pass landed in
            pass_segs: list | None = (
                [] if (anchor_every and segment_anchors is not None) else None
            )
            seg_wall = 0.0
            for j, name in enumerate(names):
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                dt = round(time.time() - t0, 3)
                if i == 0:
                    first[name] = dt
                seg_wall += dt
                if name not in best or dt < best[name]:
                    best[name] = dt
                # interleaved anchor probes (round-9 final lesson: the
                # VM band spans ~2x WITHIN one extras pass, which two
                # endpoint anchors cannot see -- probe every
                # ``anchor_every`` entries so each segment's wall can
                # be normalized by the drift measured NEXT TO it)
                if pass_segs is not None and (j + 1) % anchor_every == 0:
                    t0 = time.time()
                    qs[ANCHOR_QUERY](spark, sf_dir).count()
                    a = time.time() - t0
                    pass_segs.append(
                        {
                            "after": j + 1,
                            "anchor_sec": round(a, 3),
                            "drift": round(a / ANCHOR_REF_WARM_SEC, 3),
                            "segment_wall": round(seg_wall, 3),
                        }
                    )
                    seg_wall = 0.0
            if pass_segs is not None and seg_wall:
                t0 = time.time()
                qs[ANCHOR_QUERY](spark, sf_dir).count()
                a = time.time() - t0
                pass_segs.append(
                    {
                        "after": len(names),
                        "anchor_sec": round(a, 3),
                        "drift": round(a / ANCHOR_REF_WARM_SEC, 3),
                        "segment_wall": round(seg_wall, 3),
                    }
                )
            if pass_segs is not None:
                segment_anchors.append(pass_segs)
        return first, best

    def seg_normalized(segments: list) -> float | None:
        """Per-segment drift normalization (the PRIMARY tracked series
        since r10 -- BASELINE.md "Round-10 tracked series"): each
        segment's wall divided by the drift its ADJACENT anchor probe
        measured, so the intra-run VM band (~2x within one r9 run)
        cannot contaminate round-over-round comparison."""
        if not segments:
            return None
        return round(
            sum(
                seg["segment_wall"] / max(seg["drift"], 1e-9)
                for seg in segments
            ),
            3,
        )

    def time_anchor(runs: int = 3) -> float:
        """Best-of-N warm wall of the plan-stable anchor (it was
        prewarmed by the headline pass or the session warmup)."""
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            qs[ANCHOR_QUERY](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        return round(best, 3)

    qs[ANCHOR_QUERY](spark, sf_dir).count()  # anchor's own prewarm
    anchor_start = time_anchor()
    head_anchors: list = []
    timings, warm = run_set(
        BENCH_QUERIES, prewarm=True,
        anchor_every=6, segment_anchors=head_anchors,
    )
    total = round(sum(timings.values()), 3)
    headline_seg = seg_normalized(head_anchors[0]) if head_anchors else None
    # best-of-N segmented: min over the measured passes' per-segment-
    # normalized totals (each pass normalized by ITS OWN adjacent
    # anchor probes) -- the representative steady-state figure
    head_seg_passes = [
        v for v in (seg_normalized(p) for p in head_anchors)
        if v is not None
    ]
    headline_seg_best = min(head_seg_passes) if head_seg_passes else None
    # r8 (r7 verdict item 7): the extra tier gets the SAME shared-
    # session warm pass as the headline -- its dominant first-pass
    # costs were one-time fixture builds and streaming-sink setup, not
    # plan execution -- and ONE measured pass, so total bench wall is
    # unchanged (still 2 passes over the tier) while extra_total reads
    # the steady-state a long-lived session sees.
    seg_anchors: list = []
    extra, extra_warm = run_set(
        EXTRA_QUERIES, prewarm=True, runs=1,
        anchor_every=30, segment_anchors=seg_anchors,
    )
    anchor_end = time_anchor()
    extra_total_seg = seg_normalized(seg_anchors[0]) if seg_anchors else None
    # VM speed relative to the reference box-day; >1 = this run's VM
    # is slower.  Normalized totals divide the drift out.
    drift = round(
        ((anchor_start + anchor_end) / 2) / ANCHOR_REF_WARM_SEC, 3
    )
    anchor = {
        "query": ANCHOR_QUERY,
        "ref_warm_sec": ANCHOR_REF_WARM_SEC,
        "start_sec": anchor_start,
        "end_sec": anchor_end,
        "vm_drift": drift,
    }
    # the SEGMENTED numbers are the primary tracked series since r10;
    # the endpoint-drift normalization stays for r8/r9 comparability
    normalized = {
        "headline_total_segmented": headline_seg,
        "headline_total_segmented_best": headline_seg_best,
        "extra_total_segmented": extra_total_seg,
        "headline_total": round(total / drift, 3),
        "warm_total": round(sum(warm.values()) / drift, 3),
        "extra_total": round(sum(extra.values()) / drift, 3),
    }
    # Detail lines FIRST, final summary line LAST and SHORT: the driver
    # tail-captures stdout and parses the last JSON line -- round 3's
    # single 2.4 KB line got its head truncated and recorded as
    # parsed:null.  Keep everything the driver needs (metric/value/
    # queries/sf contract) in a compact final line and push the big
    # per-query dicts to their own preceding lines.
    print(json.dumps({"detail": "extra_queries", "timings": extra}))
    print(json.dumps({"detail": "headline_segment_anchors", "segments": head_anchors[0] if head_anchors else []}))
    print(json.dumps({"detail": "headline_segment_anchors_later_passes", "segments": head_anchors[1:]}))
    print(json.dumps({"detail": "extra_segment_anchors", "segments": seg_anchors[0] if seg_anchors else []}))
    print(json.dumps({"detail": "extra_queries_warm", "timings": extra_warm}))
    print(json.dumps({"detail": "queries_warm", "timings": warm}))
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "warm_total": round(sum(warm.values()), 3),
                "extra_total": round(sum(extra.values()), 3),
                "anchor": anchor,
                "normalized": normalized,
                "prewarmed": True,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
