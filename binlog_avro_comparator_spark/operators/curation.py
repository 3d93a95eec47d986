"""The corpus-curation composition, shared by the oracle-checked
``corpus_curation_pipeline`` query and the ``curate`` CLI so the two
can never drift: repetition cap -> near-dup canonicalization ->
contamination cap (everything but the clustering fixpoint is one lazy
plan; see SCALE.md for the per-stage shuffle audit)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import dedup_keep_canonical
from .textstats import contamination_scores, repetition_scores


def curation_survivors(
    documents: DataFrame,
    max_repetition: float = 0.2,
    max_contamination: float = 1.0 / 3.0,
    benchmark_max_id: int = 10,
    drop_benchmark: bool = False,
    max_iter: int = 15,
) -> DataFrame:
    """Documents surviving all curation filters (full rows).

    ``drop_benchmark=True`` additionally removes the benchmark/eval
    documents themselves -- a TRAINING corpus must exclude the eval
    texts outright, not just partial leaks of them (the CLI defaults to
    dropping; the oracle-checked query keeps them for contract
    stability)."""
    rep_ok = (
        repetition_scores(documents)
        .filter(F.col("repetition_ratio") <= max_repetition)
        .select("doc_id")
    )
    kept = dedup_keep_canonical(documents, max_iter=max_iter).join(rep_ok, on="doc_id")
    contaminated = (
        contamination_scores(documents, benchmark_max_id=benchmark_max_id)
        .filter(F.col("contamination") > max_contamination)
        .select("doc_id")
    )
    out = kept.join(contaminated, on="doc_id", how="left_anti")
    if drop_benchmark:
        out = out.filter(F.col("doc_id") >= benchmark_max_id)
    return out
