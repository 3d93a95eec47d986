"""document / text / dedup corpus queries (split from registry.py, round 7; behavior
identical -- see registry.py for the assembly order)."""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403


def _q_dedup_exact(spark, sf_dir):
    return exact_dedup(_docs(spark, sf_dir))


def _q_token_count(spark, sf_dir):
    return token_stats(_docs(spark, sf_dir))


def _q_text_quality(spark, sf_dir):
    return quality_scores(_docs(spark, sf_dir))


def _q_lang_id(spark, sf_dir):
    return lang_id(_docs(spark, sf_dir))


def _q_doc_fingerprint(spark, sf_dir):
    return fingerprints(_docs(spark, sf_dir))


def _q_tfidf(spark, sf_dir):
    return tfidf_top_terms(_docs(spark, sf_dir))


def _q_minhash_signatures(spark, sf_dir):
    return minhash_signatures(_docs(spark, sf_dir))


def _q_lsh_pairs(spark, sf_dir):
    return lsh_candidate_pairs(_docs(spark, sf_dir))


def _q_clean_text(spark, sf_dir):
    ensure_session_conf(spark)
    return clean_text(_docs(spark, sf_dir))


def _q_length_quantiles(spark, sf_dir):
    ensure_session_conf(spark)
    return length_quantiles(_docs(spark, sf_dir))


def _q_stratified_sample(spark, sf_dir):
    ensure_session_conf(spark)
    return stratified_sample(_docs(spark, sf_dir))


def _q_unigram_logprob(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.textstats import unigram_logprob_scores

    return unigram_logprob_scores(_docs(spark, sf_dir))


def _q_mixture_weights(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.textstats import mixture_weights

    return mixture_weights(_docs(spark, sf_dir))


def _q_sample_k_per_group(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.textstats import sample_k_per_group

    return sample_k_per_group(_docs(spark, sf_dir))


def _q_pack_sequences(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.textstats import pack_sequences

    return pack_sequences(_docs(spark, sf_dir))


def _q_doc_chunks(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.textstats import chunk_documents

    return chunk_documents(_docs(spark, sf_dir))


def _q_mixture_sample(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.textstats import mixture_sample

    return mixture_sample(_docs(spark, sf_dir))


def _inject_pii(docs: DataFrame) -> DataFrame:
    """The synthetic corpus contains no digits at all, so a redaction
    query over it would be a trivially-zero oracle.  Deterministically
    append doc_id-derived PII (email / IPv4 / phone / SSN-shaped id,
    each on a different doc_id stride) with an expression the DuckDB
    twin states verbatim -- the redaction regexes then do real work and
    the redacted text is value-compared byte-for-byte."""
    did = F.col("doc_id")
    ds = did.cast("string")
    piece = lambda mod, col: F.when(did % mod == 0, col).otherwise(F.lit(""))
    email = piece(3, F.concat(F.lit(" user"), ds, F.lit("@example.com")))
    ip = piece(4, F.concat(F.lit(" 10.0."), (did % 256).cast("string"), F.lit(".7")))
    phone = piece(
        5, F.concat(F.lit(" +1 555 0"), (F.lit(100) + did % 900).cast("string"), F.lit(" 99"))
    )
    ssn = piece(7, F.concat(F.lit(" 123-45-"), (F.lit(1000) + did % 9000).cast("string")))
    return docs.withColumn("text", F.concat(F.col("text"), email, ip, phone, ssn))


def _q_fuzzy_contamination(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.dedup import fuzzy_contamination_pairs

    return fuzzy_contamination_pairs(_docs(spark, sf_dir))


def _q_length_bucket_padding(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.textstats import length_bucket_padding

    return length_bucket_padding(_docs(spark, sf_dir))


def _q_dsir_weights(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.textstats import dsir_importance_weights

    return dsir_importance_weights(_docs(spark, sf_dir))


def _q_bigram_logprob(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.textstats import bigram_logprob_scores

    return bigram_logprob_scores(_docs(spark, sf_dir))


def _q_redact_pii(spark, sf_dir):
    ensure_session_conf(spark)
    return redact_pii(_inject_pii(_docs(spark, sf_dir)))


def _q_split_assignments(spark, sf_dir):
    ensure_session_conf(spark)
    return split_assignments(_docs(spark, sf_dir))


def _q_repeated_spans(spark, sf_dir):
    ensure_session_conf(spark)
    return repeated_span_stats(_docs(spark, sf_dir))


def _q_remove_spans(spark, sf_dir):
    ensure_session_conf(spark)
    return remove_repeated_spans(_docs(spark, sf_dir))


def _q_remove_boilerplate(spark, sf_dir):
    ensure_session_conf(spark)
    # seg_words=3 / df_threshold=4 so the synthetic corpus (small vocab,
    # no newlines) actually has over-threshold segments at test scale
    return remove_boilerplate_segments(
        _docs(spark, sf_dir), seg_words=3, df_threshold=4
    )


def _q_dedup_keep_canonical(spark, sf_dir):
    ensure_session_conf(spark)
    # metadata-only projection: the driver hash compares scalar columns
    return dedup_keep_canonical(_docs(spark, sf_dir)).select(
        "doc_id", "lang", "source", "n_chars"
    )


def _q_repetition(spark, sf_dir):
    ensure_session_conf(spark)
    return repetition_scores(_docs(spark, sf_dir))


def _q_contamination(spark, sf_dir):
    ensure_session_conf(spark)
    return contamination_scores(_docs(spark, sf_dir))


def _q_doc_bloom_contamination(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.textstats import bloom_contamination

    return bloom_contamination(_docs(spark, sf_dir))


def _q_shard_assignments(spark, sf_dir):
    ensure_session_conf(spark)
    return shard_assignments(_docs(spark, sf_dir))


def _q_quality_deciles(spark, sf_dir):
    ensure_session_conf(spark)
    return quality_deciles(_docs(spark, sf_dir))


def _q_corpus_vocab(spark, sf_dir):
    ensure_session_conf(spark)
    return corpus_vocab_topk(_docs(spark, sf_dir))


def _q_token_ids(spark, sf_dir):
    ensure_session_conf(spark)
    return encode_token_ids(_docs(spark, sf_dir))


def _q_corpus_curation(spark, sf_dir):
    """The whole curation pipeline composed as ONE plan: drop
    repetitious documents (ratio > 0.2), drop non-canonical near-dup
    cluster members, drop benchmark-contaminated documents (> 1/3 of
    shingles leaked), then report per-language survivors.  Everything
    but the clustering fixpoint is a single lazy Catalyst plan -- the
    point of building each step as a DataFrame operator."""
    from ..operators.curation import curation_survivors

    ensure_session_conf(spark)
    survivors = curation_survivors(_docs(spark, sf_dir))
    return survivors.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def _q_dedup_clusters(spark, sf_dir):
    ensure_session_conf(spark)
    return dedup_clusters(_docs(spark, sf_dir))


def _q_jaccard_pairs(spark, sf_dir):
    return jaccard_pairs(_docs(spark, sf_dir))


def _q_simhash(spark, sf_dir):
    return simhash_fingerprints(_docs(spark, sf_dir))


def _q_simhash_pairs(spark, sf_dir):
    return simhash_near_pairs(_docs(spark, sf_dir))


def _q_incremental_dedup(spark, sf_dir):
    """Nightly-ingest dedup probe: the new batch (doc_id % 10 == 0)
    checked against the historical corpus, best match + verdict per
    new doc (dedup.incremental_dedup_matches)."""
    ensure_session_conf(spark)
    from ..operators.dedup import incremental_dedup_matches

    return incremental_dedup_matches(_docs(spark, sf_dir))


def _q_hybrid_search(spark, sf_dir):
    """Hybrid BM25 + dense retrieval with reciprocal-rank fusion
    (textstats.hybrid_search_topk): lexical shortlist, cosine re-rank
    against the query embedding, RRF fuse -- the RAG serving shape."""
    ensure_session_conf(spark)
    from ..operators.textstats import hybrid_search_topk

    return hybrid_search_topk(
        _docs(spark, sf_dir), load_table(spark, sf_dir, "embeddings")
    )


def _q_dedup_keep_best(spark, sf_dir):
    """Quality-aware dedup survivors: longest member per near-dup
    cluster (dedup.dedup_keep_best) -- the keep-most-complete policy
    next to keep-canonical."""
    ensure_session_conf(spark)
    from ..operators.dedup import dedup_keep_best

    return dedup_keep_best(_docs(spark, sf_dir))


def _q_leakage_safe_splits(spark, sf_dir):
    """Cluster-level train/val/test split: near-dup groups hash as one
    unit so no duplicate pair straddles splits
    (textstats.leakage_safe_splits over dedup_clusters)."""
    ensure_session_conf(spark)
    from ..operators.textstats import leakage_safe_splits

    return leakage_safe_splits(_docs(spark, sf_dir))


def _q_bpe_merges(spark, sf_dir):
    """Top BPE merge candidates over the documents corpus: one
    tokenizer-trainer iteration, pair counts on the distinct-word
    table weighted by frequency (textstats.bpe_merge_candidates)."""
    ensure_session_conf(spark)
    from ..operators.textstats import bpe_merge_candidates

    return bpe_merge_candidates(_docs(spark, sf_dir))


def _q_bpe_vocab(spark, sf_dir):
    """The FULL iterated BPE trainer (textstats.bpe_train, r7 verdict
    item 3): 8 merge rounds over the distinct-word table, greedy
    left-to-right application, re-count after every merge -- the
    merges table a tokenizer ships, vs. bpe_merge_candidates' single
    diagnostic iteration."""
    ensure_session_conf(spark)
    from ..operators.textstats import bpe_train

    return bpe_train(_docs(spark, sf_dir), n_merges=8)


def _q_bpe_encode(spark, sf_dir):
    """The trained BPE vocabulary applied back to the corpus
    (textstats.bpe_encode_report): per-word token counts after 8
    merges -- the compression/fertility report a token-budget planner
    consumes."""
    ensure_session_conf(spark)
    from ..operators.textstats import bpe_encode_report

    return bpe_encode_report(_docs(spark, sf_dir), n_merges=8)


def _q_cluster_size_histogram(spark, sf_dir):
    """Near-dup cluster-size distribution (dedup.cluster_size_histogram):
    the duplication-scale summary over the verified components frame."""
    ensure_session_conf(spark)
    from ..operators.dedup import cluster_size_histogram

    return cluster_size_histogram(_docs(spark, sf_dir))


def _q_tfidf_neighbors(spark, sf_dir):
    """Doc-to-doc TF-IDF cosine top-k via the inverted-index join
    (textstats.tfidf_neighbors): the lexical 'more like this' next to
    the embedding ANN ladder; the df cap is the scale guarantee."""
    ensure_session_conf(spark)
    from ..operators.textstats import tfidf_neighbors

    return tfidf_neighbors(_docs(spark, sf_dir), k=5)


def _q_top_terms_udtf(spark, sf_dir):
    ensure_session_conf(spark)
    from ..operators.textstats import top_terms_per_doc

    return top_terms_per_doc(_docs(spark, sf_dir))


def _q_doc_inverted_index(spark, sf_dir):
    return inverted_index(_docs(spark, sf_dir))


def _q_doc_term_pmi(spark, sf_dir):
    return term_pmi(_docs(spark, sf_dir))


def _q_doc_shingle_novelty(spark, sf_dir):
    return shingle_novelty(_docs(spark, sf_dir))


def _q_doc_bm25_topk(spark, sf_dir):
    from ..operators.textstats import bm25_topk

    return bm25_topk(_docs(spark, sf_dir))


def _q_doc_weighted_sample(spark, sf_dir):
    from ..operators.textstats import weighted_sample_topk

    return weighted_sample_topk(_docs(spark, sf_dir))


def _q_graph_near_dup_triangles(spark, sf_dir):
    """Triangles over the LSH candidate pairs: mutually-similar
    cliques, the dedup-QA view of the near-dup graph."""
    from ..operators.graph import triangles

    return triangles(lsh_candidate_pairs(_docs(spark, sf_dir)))


def _q_graph_kcore(spark, sf_dir):
    """Rounds-bounded k-core peel over the LSH candidate pairs
    (graph.kcore_nodes): the global-density dedup-QA view next to
    triangles' local one -- core members are the safest collapses."""
    from ..operators.graph import kcore_nodes

    ensure_session_conf(spark)
    return kcore_nodes(lsh_candidate_pairs(_docs(spark, sf_dir)))


def _q_type_token_ratio(spark, sf_dir):
    ensure_session_conf(spark)
    return type_token_ratio(_docs(spark, sf_dir))


def _q_levenshtein_pairs(spark, sf_dir):
    ensure_session_conf(spark)
    return levenshtein_near_pairs(_docs(spark, sf_dir))


def _q_doc_slugs(spark, sf_dir):
    ensure_session_conf(spark)
    return doc_slugs(_docs(spark, sf_dir))


def _q_heavy_langs(spark, sf_dir):
    ensure_session_conf(spark)
    return misra_gries_heavy_hitters(_docs(spark, sf_dir), "lang", share=0.25)


def _q_source_reputation(spark, sf_dir):
    ensure_session_conf(spark)
    return source_reputation(_docs(spark, sf_dir))


def _q_doc_source_filter(spark, sf_dir):
    ensure_session_conf(spark)
    return filter_by_source_reputation(_docs(spark, sf_dir))


def _q_dedup_agreement(spark, sf_dir):
    """Cross-method near-dup agreement audit
    (dedup.dedup_method_agreement): union of the graded pair plans,
    one flag groupBy, three 1-row aggregates."""
    ensure_session_conf(spark)
    from ..operators.dedup import dedup_method_agreement

    return dedup_method_agreement(_docs(spark, sf_dir))


def _q_lang_confusion(spark, sf_dir):
    """Lang-id heuristic confusion matrix vs ground truth
    (textstats.lang_id_confusion): graded readout over the verified
    lang_id plan."""
    ensure_session_conf(spark)
    from ..operators.textstats import lang_id_confusion

    return lang_id_confusion(_docs(spark, sf_dir))


def _q_dedup_closure(spark, sf_dir):
    """Transitive closure of the near-dup pair graph as unordered
    component pairs (dedup.closure_pairs).  Round-7 re-expression of
    the r6 recursive-CTE reach query: (a) semantics upgraded from
    monotone-path reach to true UNDIRECTED closure -- edges (1,5),(2,5)
    now surface (1,2), which the increasing-path recursion missed;
    (b) computed as min-label fixpoint + label self-join, so
    intermediates are linear in nodes+edges instead of enumerating
    every path through a dense component; (c) guarded by a component-
    size cap with a counted overflow twin (dedup_closure_overflow).
    The recursive-CTE pair expansion survives as the DuckDB ORACLE,
    where sf0.01 scale keeps it cheap."""
    ensure_session_conf(spark)
    from ..operators.dedup import closure_pairs

    return closure_pairs(_docs(spark, sf_dir))


def _q_closure_overflow(spark, sf_dir):
    """The counted overflow channel for the closure guard
    (dedup.closure_overflow): components larger than the cap surface
    as (cluster_id, n_docs, n_pairs_suppressed) report rows instead of
    O(n^2) pairs.  Registered with cap=2 so the sf0.01 corpus
    exercises the channel with a real row (production default 10k)."""
    ensure_session_conf(spark)
    from ..operators.dedup import closure_overflow

    return closure_overflow(_docs(spark, sf_dir), cap=2)


def _q_template_dedup(spark, sf_dir):
    """Template-level dedup (dedup.template_dedup): digit/whitespace
    normalization then the exact_dedup hash-group shape."""
    ensure_session_conf(spark)
    from ..operators.dedup import template_dedup

    return template_dedup(_docs(spark, sf_dir))


def _q_prefix_filter(spark, sf_dir):
    """Exact prefix-filter set-similarity join (dedup.prefix_filter_pairs):
    complete at the threshold, rare-first global token order."""
    ensure_session_conf(spark)
    from ..operators.dedup import prefix_filter_pairs

    return prefix_filter_pairs(_docs(spark, sf_dir))


def _q_containment(spark, sf_dir):
    """Directional containment join (dedup.containment_pairs): the
    quote/subset detector, complete at the threshold."""
    ensure_session_conf(spark)
    from ..operators.dedup import containment_pairs

    return containment_pairs(_docs(spark, sf_dir))


def _q_token_allocation(spark, sf_dir):
    """Water-filling token budget allocation across sources
    (textstats.token_allocation): closed-form level over sorted caps."""
    ensure_session_conf(spark)
    from ..operators.textstats import token_allocation

    return token_allocation(_docs(spark, sf_dir))


def _q_source_redundancy(spark, sf_dir):
    """Per-source near-dup redundancy (dedup.source_redundancy):
    cluster membership joined back for the feed-level verdict."""
    ensure_session_conf(spark)
    from ..operators.dedup import source_redundancy

    return source_redundancy(_docs(spark, sf_dir))


def _q_minhash_error(spark, sf_dir):
    """MinHash estimator calibration (dedup.minhash_estimate_error):
    signature-agreement estimate vs exact Jaccard per LSH pair."""
    ensure_session_conf(spark)
    from ..operators.dedup import minhash_estimate_error

    return minhash_estimate_error(_docs(spark, sf_dir))


def _q_label_consensus(spark, sf_dir):
    """Near-dup cluster label consensus (dedup.cluster_label_consensus):
    majority lang per component, disagreement flags."""
    ensure_session_conf(spark)
    from ..operators.dedup import cluster_label_consensus

    return cluster_label_consensus(_docs(spark, sf_dir))


def _q_zipf(spark, sf_dir):
    """Zipf rank-frequency fit over the top-500 vocabulary
    (textstats.zipf_fit)."""
    ensure_session_conf(spark)
    from ..operators.textstats import zipf_fit

    return zipf_fit(_docs(spark, sf_dir))


def _q_shingle_saturation(spark, sf_dir):
    """Shingle-vocabulary saturation diagnostic
    (dedup.shingle_saturation): is the exact pair-join tier safe at
    k=3 on this corpus, or does the vocabulary saturate (templated
    text) and demand larger k / the LSH tier."""
    ensure_session_conf(spark)
    from ..operators.dedup import shingle_saturation

    return shingle_saturation(_docs(spark, sf_dir))


def _q_vocab_drift(spark, sf_dir):
    """Content-drift gate (textstats.vocab_drift): PSI over the word
    distribution between corpus halves, top drift-driving words."""
    ensure_session_conf(spark)
    from ..operators.textstats import vocab_drift

    return vocab_drift(_docs(spark, sf_dir))


def _q_epoch_manifest(spark, sf_dir):
    """Deterministic epoch-shuffle manifest (textstats.epoch_manifest):
    per-epoch reproducible global data order, shard + position per
    document."""
    ensure_session_conf(spark)
    from ..operators.textstats import epoch_manifest

    return epoch_manifest(_docs(spark, sf_dir))


def _q_contamination_by_source(spark, sf_dir):
    """Per-SOURCE contamination rollup: which feed leaks benchmark
    text (the actionable form of the per-doc score -- you stop
    ingesting a feed, not a document).  Composes the verified
    contamination frame with one source join + one aggregate."""
    ensure_session_conf(spark)
    from ..operators.textstats import contamination_scores

    docs = _docs(spark, sf_dir)
    scored = contamination_scores(docs)
    return (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("contamination") >= 0.5, 1).otherwise(0)
            ).alias("n_contaminated"),
            F.round(
                F.sum(F.col("contamination").cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("mean_contamination"),
        )
    )


def _q_data_card(spark, sf_dir):
    """Per-source data card (textstats.data_card): the datasheet
    rollup -- volume, tokens, language spread, contamination rate,
    near-dup rate -- composed from the verified token_stats,
    contamination_scores, and dedup_clusters frames so the card can
    never disagree with the operators it summarizes."""
    ensure_session_conf(spark)
    from ..operators.textstats import contamination_scores, data_card

    docs = _docs(spark, sf_dir)
    return data_card(
        docs,
        token_stats(docs),
        contamination_scores(docs),
        dedup_clusters(docs),
    )


def _q_threshold_curve(spark, sf_dir):
    """Dedup threshold calibration (dedup.threshold_curve): candidate
    pairs bucketed by 0.1 Jaccard bands with cumulative at-or-above
    counts -- the dial-sweep readout before choosing t."""
    ensure_session_conf(spark)
    from ..operators.dedup import threshold_curve

    return threshold_curve(_docs(spark, sf_dir))


def _q_dedup_impact(spark, sf_dir):
    """Dedup impact report (dedup.dedup_impact_report): per-source doc
    and character volume the canonical-survivor pass removes -- the
    cost/benefit readout before shipping a dedup pass."""
    ensure_session_conf(spark)
    from ..operators.dedup import dedup_impact_report

    return dedup_impact_report(_docs(spark, sf_dir))


def _q_quality_blend(spark, sf_dir):
    """Ensemble quality score (textstats.quality_blend): LM fit +
    repetition + lexical diversity, each decile-normalized off one
    broadcast percentile row, averaged into one filter-friendly
    score -- stacked weak signals instead of one trusted filter."""
    ensure_session_conf(spark)
    from ..operators.textstats import quality_blend

    return quality_blend(_docs(spark, sf_dir))


_FR_RUN = ("le la les et des un une le la les " * 4).strip()


def _corrupted_text_view(documents):
    """Planted transport-corruption view (SQL-mirrorable, same
    discipline as every fixture divergence): doc_id%13==3 gets a
    mojibake prefix, %29==7 a replacement char, %37==5 a C0 control
    byte; everything else passes through clean."""
    did = F.col("doc_id")
    corrupted = (
        F.when(did % 13 == 3, F.concat(F.lit("\u00c3\u00a9ber "), F.col("text")))
        .when(did % 29 == 7, F.concat(F.col("text"), F.lit(" \ufffd")))
        .when(did % 37 == 5, F.concat(F.col("text"), F.lit("\u0007")))
        .otherwise(F.col("text"))
    )
    return documents.select("doc_id", corrupted.alias("text"))


def _q_encoding_anomalies(spark, sf_dir):
    """Transport-corruption gate (textstats.encoding_anomalies):
    replacement chars, C0 control bleed, UTF-8-as-Latin-1 mojibake
    marks + printable-ASCII ratio over the planted-corruption view."""
    ensure_session_conf(spark)
    from ..operators.textstats import encoding_anomalies

    return encoding_anomalies(
        _corrupted_text_view(load_table(spark, sf_dir, "documents"))
    )


def _q_code_switch(spark, sf_dir):
    """Segment-level language mixing (textstats.code_switch_profile):
    docs with doc_id%11==2 get a 40-word French-stopword run appended
    (the planted code-switch); the profile reports segment languages,
    switch counts, and the code_switched flag."""
    ensure_session_conf(spark)
    from ..operators.textstats import code_switch_profile

    docs = load_table(spark, sf_dir, "documents")
    mixed = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 2,
            F.concat(F.col("text"), F.lit(" " + _FR_RUN)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return code_switch_profile(mixed)


def _q_pca_power(spark, sf_dir):
    """Top principal component by 3 power iterations
    (similarity.pca_power_top1): covariance-free X^T(Xv) passes, one
    lazy plan, the kmeans rounding contract -- plus eigenvalue and
    explained-variance share."""
    ensure_session_conf(spark)
    from ..operators.similarity import pca_power_top1

    return pca_power_top1(load_table(spark, sf_dir, "embeddings"))


def _q_embedding_dim_stats(spark, sf_dir):
    """Per-dimension embedding health census
    (similarity.embedding_dim_stats): exact-decimal moments, dead-dim
    flags -- the whitening / truncation input table."""
    ensure_session_conf(spark)
    from ..operators.similarity import embedding_dim_stats

    return embedding_dim_stats(load_table(spark, sf_dir, "embeddings"))


def _q_survivorship_conflicts(spark, sf_dir):
    """Survivorship-policy disagreement audit
    (dedup.survivorship_conflicts): clusters where keep-best and
    keep-canonical ship different corpora -- the review queue for a
    policy switch."""
    ensure_session_conf(spark)
    from ..operators.dedup import survivorship_conflicts

    return survivorship_conflicts(load_table(spark, sf_dir, "documents"))


__all__ = [_n for _n in list(globals()) if not _n.startswith('__') and _n != '_shared']
