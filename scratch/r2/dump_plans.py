"""Regenerate PLANS.md: EXPLAIN FORMATTED trees of the flagship
queries whose plan shapes carry the SCALE.md claims."""

import sys

sys.path.insert(0, "/root/repo")
from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.plans.registry import queries

SF = "/root/testdata/sf0.001"
PICKS = [
    ("cdc_findings", "the whole CDC diff: ONE full-outer sort-merge join, findings exploded from per-row structs"),
    ("q1_pricing_summary", "filter pushed to parquet, partial aggregation map-side combined"),
    ("top_revenue_orders", "global top-k as TakeOrderedAndProject, never a single-task window"),
    ("corpus_vocab_topk", "vocab top-k: same TakeOrderedAndProject shape over the word counts"),
    ("doc_quality_deciles", "decile binning WITHOUT a global window: 1-row percentile frame broadcast"),
    ("minhash_lsh_pairs", "explode-bands single self-equi-join (cached signature frame, one scan subtree)"),
    ("cdc_apply_changes", "snapshot materialization: ONE partial_max_by hash/sort aggregate, no rank window"),
    ("events_funnel", "funnel: one per-user exchange, zero joins, stages walked inside the row"),
    ("regional_supplier_volume", "Q5 star shape: date pushdown at the orders scan, pruned dims broadcast"),
    ("embedding_kmeans", "k-means iteration: broadcast centroids + partial_max_by argmin, no window"),
    # round 4
    ("discounted_revenue", "Q6 shape: all four predicates pushed to the parquet scan, 1-row map-side-combined sum"),
    ("volume_shipping", "Q7 shape: nation-filtered dims broadcast; the one shuffle join is the honest lineitem x orders orderkey join"),
    ("min_cost_supplier_per_part", "Q2 shape: argmin as groupBy + join-back (aggregate-to-aggregate), no window over the fact"),
    ("returned_item_losses", "Q10 shape: facts filtered + aggregated BEFORE dimension hookups; TakeOrderedAndProject top-20"),
    ("idle_rich_customers", "Q22 shape: broadcast scalar average + LEFT ANTI on the date-pruned orders keys"),
    ("shipping_priority", "Q3 shape: per-order revenue aggregated BELOW the join, segment semi-join, TakeOrderedAndProject top-10"),
    ("brand_bracket_revenue", "Q19 shape: disjunctive brackets as RESIDUAL on one partkey equi-join, never a nested loop"),
    ("supplier_part_counts", "Q16 shape: distinct pairs first, broadcast anti join, count-distinct over the deduped frame"),
    ("doc_source_filter", "source reputation: ~#sources aggregate broadcast back onto the corpus, zero fact shuffle"),
    ("events_time_rollup", "hypertable rollup: ONE scan + Expand + partial agg, no per-granularity union"),
    ("events_gap_fill", "gap fill: per-user sequence explode + user-partitioned LOCF window"),
    ("cdc_snapshot_diff", "snapshot version diff: one full-outer join over two aggregate-sized states"),
    # round 5 (continued)
    ("cdc_payload_diff", "payload tier: ONE inner equi-join on the shared compare key + per-row column-union explode"),
    ("graph_supplier_pagerank", "PageRank: per-iteration join + map-side-combined sum over the cached edge frame, integer units"),
    ("ann_pq_adc_topk", "PQ ADC: codebooks + sliced queries broadcast, corpus side carries codes only, WindowGroupLimit top-k"),
    ("doc_shingle_novelty", "novelty: first-holder min-agg + single tag join, hashes on the wire"),
    ("events_retention_cohorts", "retention: one per-user shuffle, offset matrix re-group, offset-0 sizes broadcast back"),
    ("doc_bloom_contamination", "bloom decontamination: bitmap built by bit_or partial agg, n_hashes broadcast joins, ONE per-doc shuffle"),
    ("events_hdr_quantiles", "histogram quantiles: map-side-combined bucket counts; window only over the aggregated histogram"),
    ("cdc_merge_upsert", "MERGE INTO: one full-outer join, struct coalesce survivor pick, tombstone filter"),
    ("doc_bm25_topk", "BM25: literal IN prunes to query-term postings pre-shuffle, TakeOrderedAndProject top-k"),
    ("cdc_scd2_history", "SCD2 history: both windows (interval lead + version row_number) share ONE user_id Exchange"),
    ("cdc_scd2_lookup", "SCD2 point-in-time lookup: equi hash join on the key, interval containment as residual, no range join"),
    ("lineitem_measure_profile", "unpivot + grouping sets: two Expands over ONE scan, one shuffled hash agg for all sets"),
    # round 6
    ("cdc_parse_binlog_typed", "typed row-image decode: pruned (path, content) binaryFile scan -> ONE MapInPandas, no exchange before decode"),
    ("cdc_payload_diff_typed", "typed payload diff: same single inner equi-join + column-union explode as the 5-column tier"),
    ("embedding_kmeans_gemm", "large-k assignment: MapInPandas GEMM argmin -- NO k-fold row expansion, no window"),
    # round 6 continuation
    ("embedding_sign_bits", "binary quantization: 64-row per-dim stats agg broadcast back, corpus never shuffles"),
    ("ann_hamming_topk", "Hamming ANN: two WindowGroupLimit stages, queries broadcast, no corpus-vs-corpus shuffle join"),
    ("events_kmv_setops", "KMV set ops: pairwise stage on the n_types-row sketch frame, exact exhibit as the one corpus join"),
    ("events_attribution", "attribution: ONE user_id Exchange shared by sessionization + all windows, zero joins"),
    ("corpus_bpe_merges", "BPE merges: vocab-sized pair agg, TakeOrderedAndProject top-k"),
    ("lineitem_hilbert_layout", "Hilbert keys: pure per-row fold projection, no exchange"),
    # round 6 continuation (statistics / drift / IVM / compliance)
    ("events_ab_test", "Welch A/B: ONE map-side-combined aggregate, no join -- (type x 6) sums on the wire"),
    ("events_value_trend", "closed-form OLS: one aggregate of exact sufficient statistics, no sort, no join"),
    ("cdc_ivm_refresh", "IVM refresh: delta fold + ONE equi-join against the stored snapshot + tiny signed agg; history never rescanned"),
    ("events_psi_drift", "PSI gate: 1-row decile edge frame broadcast, scan-speed array-filter bucketing"),
    ("gdpr_erasure_audit", "erasure audit: request set broadcast, fact scan map-side, 1-row aggregates"),
    ("events_join_plan", "join planner: two key-count aggregates + key-sized join -- key cardinality, not fact tonnage"),
    ("lineitem_basket_pairs", "market basket: distinct (order, brand) frame, per-basket-bounded self-join, broadcast marginals"),
    ("customer_abc_classes", "Pareto ABC: bucketed two-phase exact-decimal prefix sum -- the entity window is PARTITIONED by revenue bucket"),
    # round 7
    ("dedup_prefix_filter_pairs", "PPJoin: length window + positional bound filter INSIDE the prefix self-join, before verification"),
    ("dedup_containment_pairs", "containment join: n_dst >= ceil(t*n_src) size prune rides the candidate join"),
    ("dedup_transitive_closure", "closure: min-label fixpoint (linear) + label self-join -- no recursive pair expansion"),
    ("cdc_avro_logical_scan", "logical-type avro lake: pruned binaryFile scan -> ONE MapInPandas decode to typed columns"),
    ("cdc_rotate_chain", "rotate chain: per-file decode, single lead() window over the file-cardinality frame"),
    # round 8
    ("embedding_knn_audit_bucketed", "kNN audit scale tier: LSH bucket self-join candidates, JVM fold cosines, window top-k -- no driver collect, no MapInPandas"),
    ("embedding_bitext_margin_bucketed", "bitext scale tier: cross-segment bucket candidates; fwd/bwd shortlists as windows WITHIN candidates"),
    ("ann_ivf_probe_pruned", "persisted IVF probe: literal centroid_id IN (...) PartitionFilters -- unprobed list directories never read"),
    ("cdc_snapshot_at_watermark", "watermark applied: per-source min-of-max broadcast back, one filtered aggregate over the feed"),
    ("cdc_gtid_set", "gtid_executed intervals: islands trick -- one per-sid window + one aggregate, interval-cardinality output"),
    ("doc_tfidf_neighbors", "lexical more-like-this: df-capped posting-list self-join, decimal-summed products, window top-k"),
    # round 8 continuation
    ("cdc_table_scorecard", "per-table scorecard: the ONE full-outer diff join + one table-cardinality conditional-sum rollup"),
    ("cdc_gtid_coverage", "transaction coverage: same single join, per-key landed collapse then per-GTID fold, both map-side combined"),
    ("ann_ivf_pq_topk", "IVF-PQ composed: probes + codebooks + sliced queries broadcast; corpus side carries candidates + codes only"),
    ("embedding_coreset", "coreset: broadcast k-row percentile boundary frame, selection is a per-row comparison"),
    ("media_near_dup", "blob near-dup: blobs collapse to chunk hashes at the scan, rare-chunk candidates, candidate-bounded intersection"),
    ("doc_quality_blend", "quality blend: three CACHED signal frames (no pipeline re-run per consumer), 1-row boundary broadcasts"),
    ("cdc_near_miss_keys", "near-miss recovery: bucketed tolerance join over the anti residues -- equi join + residual, no theta join"),
    ("events_feed_gaps", "feed silence: distinct active minutes first, islands lag window over the aggregated frame only"),
    # round 9
    ("cdc_schema_timeline", "DDL timeline: full text parse -> regexp extraction -> ONE table-partitioned SCD2 window, statement-cardinality end to end"),
    ("cdc_payload_diff_guarded", "guarded diff: cached payload frames feed matched-set + diff once; windows broadcast; keyed left-anti suppression"),
    ("cdc_schema_columns", "column matrix: versions x touched-columns grid + carry-forward last(effect) window -- linear in statements"),
    ("media_perceptual_dup", "perceptual pairs: blobs -> 4 band ints at the scan (payload never shuffles), band equi-join candidates, xor/bit_count verify"),
    ("video_perceptual_dup", "video near-dup: container walk + frame hashes at the scan, rare-hash candidates, candidate-bounded set intersection"),
    # round 9 continuation
    ("supplier_similarity", "set-similarity join: part-side inverted index, df-cap prune, cached distinct frame, WindowGroupLimit top-k peers"),
    ("embedding_pca_power", "power iteration: exact-decimal projection/back-projection aggregates, 64-row direction broadcast, lineage checkpointed per pass"),
    ("events_hourly_autocorr", "autocorrelation: calendar-sized hour frame self-joined at lag offsets, integer Pearson terms map-side combined"),
    ("customer_cohort_ltv", "LTV triangle: per-customer first-month agg, calendar x calendar triangle, running window over the triangle only"),
    ("events_engagement_ratios", "DAU/WAU/MAU: one explode + ONE conditional-distinct aggregate keyed by day -- no window function"),
    ("cdc_multimaster_conflicts", "conflicts: per-key lag window + one aggregate, writer census rides the same pass, incident-sized output"),
    ("cdc_changelog_compaction", "compaction: ONE min_by/max_by hash aggregate -- the apply_changes cost model, minimal-changelog output"),
    ("events_slo_burn", "SLO burn: hour rollup + 6-offset explode into ONE conditional aggregate -- both trailing windows, no window function"),
    ("part_sourcing_hhi", "HHI: two map-side-combined aggregates, exact-decimal share algebra, ONE division per bracket"),
    ("media_audio_perceptual_dup", "audio near-dup: wave decode + contour hash INSIDE the scan batch, equi-join candidates on the hash int"),
    ("dedup_survivorship_conflicts", "survivorship audit: shared cluster frame, one struct-max aggregate, conflict-cardinality output"),
    # round 10
    ("cdc_payload_diff_column_guarded", "column-granular quarantine: shared matched-key exchange, broadcast window-columns probe, co-partitioned (key, column) left-anti -- zero new shuffle keys over the whole-key guard"),
    ("cdc_ddl_window_columns", "drift windows + moved sets: clause explode is JVM regexp over the statement frame; one clause-cardinality aggregate; opener-cardinality broadcastable output"),
    ("cdc_ddl_partial_parse", "PARTIAL_PARSE channel: clause explode + filter, statement-cardinality in, anomaly-cardinality out, no shuffle beyond the parse"),
]


def main():
    spark = get_spark("plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    out = [
        "# Physical plans (EXPLAIN FORMATTED, sf0.001, local[8])",
        "",
        "Generated by scratch/dump_plans.py -- regenerate after plan-affecting",
        "changes.  These are the plans the scale claims in SCALE.md rest on;",
        "tests/test_plans.py pins the load-bearing properties.",
        "",
    ]
    for name, note in PICKS:
        df = qs[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        tree = plan.split("\n\n")[0]
        out += [f"## {name}", "", note, "", "```", tree, "```", ""]
    open("/root/repo/PLANS.md", "w").write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
