"""One-shot mechanical splitter for plans/registry.py (r6 verdict item
7): one module per query family + sequential oracle-SQL chunks,
re-exported through the unchanged queries()/oracle_sql() surface.
Text-preserving: every block moves verbatim (comments included)."""

from __future__ import annotations

import ast
import re
from pathlib import Path

P = Path("binlog_avro_comparator_spark/plans")
src = (P / "registry.py").read_text()
lines = src.splitlines(keepends=True)
tree = ast.parse(src)


def block_name(n):
    if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return n.name
    if isinstance(n, (ast.Assign, ast.AnnAssign)):
        t = n.targets[0] if isinstance(n, ast.Assign) else n.target
        if isinstance(t, ast.Name):
            return t.id
    return None


# ---- partition plan --------------------------------------------------------
STREAM = {
    "_STREAM_SINK_SEQ", "_stream_state_partitions", "_drain_to_table",
    "_q_events_dedup_stream", "_q_events_join_stream",
    "_q_events_left_join_stream", "_q_cdc_snapshot_incremental",
    "_q_events_top_type_stream", "_q_cdc_snapshot_stream",
    "_q_events_hdr_stream", "_q_cdc_findings_stream",
    "_q_events_windowed_stream", "_q_events_session_stream",
    "_q_events_running_stats_stream", "_q_cdc_payload_findings_stream",
    "_q_cdc_parse_binlog_stream", "_q_cdc_payload_diff_stream",
    "_q_events_enrich_stream", "_q_ivm_stream", "_q_psi_stream",
    "_q_anomaly_stream",
}
ANN = {
    "_q_cluster_profiles", "_q_quantize_int8", "_q_semdedup", "_q_kmeans",
    "_q_kmeans_gemm", "_q_embedding_near_dup", "_q_ann_cosine_topk",
    "_q_ann_cosine_topk_lsh", "_q_matryoshka_recall", "_q_ann_recall_report",
    "_q_embedding_sign_bits", "_q_ann_hamming_topk", "_q_ann_cosine_topk_ivf",
    "_q_ann_cosine_topk_pandas", "_q_embedding_pq_codes", "_q_ann_pq_adc_topk",
    "_q_media_exact_dedup", "_q_media_features", "_q_media_video_frames",
    "_q_media_video_frames_riff", "_q_media_audio_features",
    "_q_media_arrow_digest", "_q_hard_negatives", "_q_embedding_drift",
}
CORPUS_EXPLICIT = {
    "_inject_pii", "_q_top_terms_udtf", "_q_graph_near_dup_triangles",
    "_q_hybrid_search", "_q_incremental_dedup", "_q_dedup_keep_best",
    "_q_leakage_safe_splits", "_q_bpe_merges", "_q_type_token_ratio",
    "_q_levenshtein_pairs", "_q_heavy_langs", "_q_source_reputation",
    "_q_jaccard_pairs", "_q_simhash", "_q_simhash_pairs",
    "_q_minhash_signatures", "_q_lsh_pairs", "_q_clean_text",
    "_q_length_quantiles", "_q_stratified_sample", "_q_unigram_logprob",
    "_q_mixture_weights", "_q_sample_k_per_group", "_q_pack_sequences",
    "_q_mixture_sample", "_q_fuzzy_contamination", "_q_length_bucket_padding",
    "_q_dsir_weights", "_q_bigram_logprob", "_q_redact_pii",
    "_q_split_assignments", "_q_repeated_spans", "_q_remove_spans",
    "_q_remove_boilerplate", "_q_repetition", "_q_contamination",
    "_q_shard_assignments", "_q_quality_deciles", "_q_token_ids",
    "_q_token_count", "_q_text_quality", "_q_lang_id", "_q_tfidf",
    "_q_zipf", "_q_label_consensus", "_q_minhash_error",
    "_q_source_redundancy", "_q_token_allocation", "_q_containment",
    "_q_prefix_filter", "_q_template_dedup", "_q_closure_overflow",
    "_q_lang_confusion", "_q_dedup_agreement",
}
SHARED = {"_cdc_frames", "_docs"}


def classify(name: str) -> str:
    if name is None:
        return "q_streaming"  # the lone mid-file contextmanager import
    if name in SHARED:
        return "_shared"
    if name in STREAM:
        return "q_streaming"
    if name in ANN:
        return "q_ann"
    if name in CORPUS_EXPLICIT:
        return "q_corpus"
    for pat in ("_q_doc_", "_q_corpus", "_q_dedup"):
        if name.startswith(pat):
            return "q_corpus"
    if name.startswith("_q_cdc") or name in (
        "_q_scd2_audit", "_q_join_plan", "_q_binlog_variant",
        "_q_erasure_audit", "_q_ivm_refresh", "_q_events_skew_report",
    ):
        return "q_cdc"
    if not name.startswith("_q_"):
        # fixture constants / renderers / helper frames: live with CDC
        # (the only family that synthesizes byte fixtures)
        return "q_cdc"
    return "q_analytics"


# ---- walk top-level blocks -------------------------------------------------
HEAD_END = 133          # 1-based: docstring + imports + QueryFn (lines 1..133)
QUERIES_START = None
ORACLE_HELPER_START = None

blocks = []  # (module, start_line, end_line) 1-based inclusive
nodes = [n for n in tree.body if n.lineno > HEAD_END]
prev_end = HEAD_END
queries_node = oracle_node = None
for n in nodes:
    name = block_name(n)
    start = prev_end + 1          # carry comments/blank lines along
    end = n.end_lineno
    if isinstance(n, ast.FunctionDef) and n.name == "queries":
        queries_node = (start, end)
        prev_end = end
        continue
    if isinstance(n, ast.FunctionDef) and n.name == "oracle_sql":
        oracle_node = (start, end, n)
        prev_end = end
        continue
    if queries_node and not oracle_node:
        mod = "oracle_ctes"        # constants between queries() and oracle_sql()
    else:
        mod = classify(name)
    blocks.append((mod, start, end))
    prev_end = end

TAIL_START = prev_end + 1  # anything after oracle_sql (should be nothing)

mods: dict[str, list[str]] = {}
for mod, s, e in blocks:
    mods.setdefault(mod, []).append("".join(lines[s - 1 : e]))

HEADERS = {
    "q_cdc": "CDC parity + binlog/avro fixture infrastructure",
    "q_streaming": "Structured Streaming queries (memory-sink drained)",
    "q_corpus": "document / text / dedup corpus queries",
    "q_ann": "embedding / ANN / multimodal queries",
    "q_analytics": "relational + distributed-statistics queries",
    "oracle_ctes": "shared DuckDB oracle CTE fragments and builders",
}

shared_head = "".join(lines[:HEAD_END])
shared_extra = "".join(mods.pop("_shared", []))
(P / "_shared.py").write_text(
    shared_head
    + shared_extra
    + "\n\n# star-import surface for the family modules (underscore names"
    "\n# included -- the registry re-exports everything)\n"
    "__all__ = [_n for _n in list(globals()) if not _n.startswith('__')]\n"
)

ALL_FOOT = (
    "\n\n__all__ = [_n for _n in list(globals()) if not _n.startswith('__')"
    " and _n != '_shared']\n"
)

EXTRA_IMPORTS = {
    # cross-family helpers: streaming queries reuse the CDC fixture
    # dirs + payload map; the oracle CTE constants reference the typed
    # schema names that live with the CDC fixtures
    "q_streaming": ["q_cdc", "q_corpus", "q_ann", "q_analytics"],
    "oracle_ctes": ["q_cdc"],
}

for mod in ("q_cdc", "q_corpus", "q_ann", "q_analytics", "q_streaming",
            "oracle_ctes"):
    body = "".join(mods.get(mod, []))
    extra = "".join(
        f"from .{m} import *  # noqa: F401,F403\n"
        for m in EXTRA_IMPORTS.get(mod, [])
    )
    (P / f"{mod}.py").write_text(
        f'"""{HEADERS[mod]} (split from registry.py, round 7; behavior\n'
        f'identical -- see registry.py for the assembly order)."""\n\n'
        "from __future__ import annotations\n\n"
        "from ._shared import *  # noqa: F401,F403\n"
        + extra
        + body
        + ALL_FOOT
    )

# ---- oracle_sql chunks -----------------------------------------------------
os_start, os_end, on = oracle_node
first = on.body[0]            # AnnAssign: sql = { ... }
dict_node = first.value
entries = []                  # (start_line, end_line) per key:value
prev = first.lineno           # 'sql: dict[str, str] = {' line
for k, v in zip(dict_node.keys, dict_node.values):
    s = prev + 1              # carry comment lines preceding the key
    entries.append((s, v.end_lineno))
    prev = v.end_lineno
lit_close = first.end_lineno  # the '}' line

total = entries[-1][1] - entries[0][0]
cut = total // 3
chunks, cur, cur_start = [], 0, entries[0][0]
for s, e in entries:
    cur = e - cur_start
    if cur >= cut and len(chunks) < 2:
        chunks.append((cur_start, e))
        cur_start = e + 1
chunks.append((cur_start, entries[-1][1]))

tail = "".join(lines[lit_close : os_end])     # statements after the literal
tail = re.sub(r"\n    return sql\n?$", "\n", tail)

names = ["oracles_cdc", "oracles_corpus", "oracles_analytics"]
for i, (s, e) in enumerate(chunks):
    body = "".join(lines[s - 1 : e])
    extra = tail if i == 2 else ""
    (P / f"{names[i]}.py").write_text(
        f'"""DuckDB oracle SQL, part {i+1}/3 (split from registry.py,\n'
        f'round 7).  ASSEMBLY ORDER IS LOAD-BEARING: later entries compose\n'
        f'earlier ones via f-strings, so registry.oracle_sql() must call\n'
        f'the three add() builders in file order."""\n\n'
        "from __future__ import annotations\n\n"
        "from ._shared import *  # noqa: F401,F403\n"
        "from .oracle_ctes import *  # noqa: F401,F403\n\n\n"
        "def add(sql: dict) -> None:\n"
        "    sql.update({\n"
        + body
        + "    })\n"
        + extra
    )

# ---- new registry.py -------------------------------------------------------
qs, qe = queries_node
queries_src = "".join(lines[qs - 1 : qe])
new_registry = (
    '"""Query registry: the driver contract surface.\n\n'
    "``queries()`` maps names to (spark, sf_dir) -> DataFrame callables;\n"
    "``oracle_sql()`` maps the same names to DuckDB SQL that computes the\n"
    "identical result over the same parquet tables.  Column names/aliases\n"
    "match pairwise -- the driver sorts columns by name before value-hashing.\n\n"
    "Round 7 split the implementations into family modules (q_cdc /\n"
    "q_streaming / q_corpus / q_ann / q_analytics, plus the oracle SQL in\n"
    "oracles_cdc / oracles_corpus / oracles_analytics with shared CTE\n"
    "fragments in oracle_ctes); this module re-exports every name and owns\n"
    "the two contract functions, so the ordering of the queries() dict --\n"
    "which the external driver samples -- stays in one reviewable place.\n"
    '"""\n\n'
    "from __future__ import annotations\n\n"
    "from ._shared import *  # noqa: F401,F403\n"
    "from .q_cdc import *  # noqa: F401,F403\n"
    "from .q_streaming import *  # noqa: F401,F403\n"
    "from .q_corpus import *  # noqa: F401,F403\n"
    "from .q_ann import *  # noqa: F401,F403\n"
    "from .q_analytics import *  # noqa: F401,F403\n"
    "from . import oracles_cdc as _oracles_1\n"
    "from . import oracles_corpus as _oracles_2\n"
    "from . import oracles_analytics as _oracles_3\n\n\n"
    + queries_src
    + "\n\ndef oracle_sql() -> dict[str, str]:\n"
    "    sql: dict[str, str] = {}\n"
    "    _oracles_1.add(sql)\n"
    "    _oracles_2.add(sql)\n"
    "    _oracles_3.add(sql)\n"
    "    return sql\n"
)
(P / "registry.py").write_text(new_registry)
print("wrote modules; chunk key boundaries:")
for i, (s, e) in enumerate(chunks):
    print(f"  {names[i]}: lines {s}-{e}")
