"""Spark MLlib bridge: the engine's operators feed ML pipelines
directly -- quality/LM/repetition scores become a feature vector, and
a distributed estimator trains on them without leaving the cluster.

The demonstration task is the classic curation move: train a cheap
linear classifier that predicts membership in a REFERENCE slice (here
``lang == target_lang``; in production, "looks like curated wiki" vs
"random crawl") from the engine's own quality signals, then score the
whole corpus with the fitted model as a curation signal -- the
classifier-based filtering step of the published data-curation
recipes, where DSIR (textstats.dsir_importance_weights) is the
importance-sampling alternative.

Scale notes: feature building is the engine's zero-shuffle scoring
operators + VectorAssembler (a per-row projection); LogisticRegression
trains via distributed L-BFGS (each iteration is one pass of gradient
partials, map-side combined -- the aggregate shape every operator here
uses); scoring is a per-row model application, no shuffle.  Training
is float-iterative and NOT oracle-reproducible across engines, so this
module is pytest-verified (fixed seed, separability assertions) rather
than registry-paired -- the registry stays 100% oracle-paired by
design."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import quality_scores, repetition_scores, token_stats


def quality_feature_frame(documents: DataFrame) -> DataFrame:
    """(doc_id, label, features): the engine's scoring operators joined
    into one numeric frame -- three per-row scoring passes over the
    same scan, one doc_id join tree, no corpus shuffle beyond it."""
    from pyspark.ml.feature import VectorAssembler

    q = quality_scores(documents).select(
        "doc_id", "stopword_ratio", "chars_per_word", "punct_ratio"
    )
    r = repetition_scores(documents).select("doc_id", "repetition_ratio")
    t = token_stats(documents).select("doc_id", "n_ws_tokens", "n_bpe_tokens")
    base = (
        documents.select("doc_id", "lang")
        .join(q, on="doc_id")
        .join(r, on="doc_id")
        .join(t, on="doc_id")
    )
    assembler = VectorAssembler(
        inputCols=[
            "stopword_ratio",
            "chars_per_word",
            "punct_ratio",
            "repetition_ratio",
            "n_ws_tokens",
            "n_bpe_tokens",
        ],
        outputCol="features",
    )
    return assembler.transform(base)


def train_slice_classifier(
    documents: DataFrame, target_lang: str = "en", max_iter: int = 20
):
    """Fit the reference-slice classifier; returns (model, scored)
    where ``scored`` carries p_target per document."""
    from pyspark.ml.classification import LogisticRegression

    feats = quality_feature_frame(documents).withColumn(
        "label", (F.col("lang") == target_lang).cast("double")
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=0.01, featuresCol="features", labelCol="label"
    )
    model = lr.fit(feats)
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(feats).select(
        "doc_id",
        "lang",
        "label",
        F.element_at(vector_to_array("probability"), 2).alias("p_target"),
    )
    return model, scored
