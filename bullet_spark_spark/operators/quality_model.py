"""Trained quality classification — the learned counterpart of
text.quality_score's heuristics (the FineWeb-Edu / DCLM pattern: label a
seed set, train a lightweight text classifier, score the full corpus,
filter on predicted quality).

All stages are Spark-native MLlib, so the whole path is distributed:

- RegexTokenizer + HashingTF are narrow per-row maps (no vocabulary
  build, no shuffle — the hashing trick is what makes the featurizer
  viable at corpus scale where a fitted vocabulary would be its own
  distributed dictionary problem).
- IDF is one aggregate over the corpus (document frequencies), applied
  as a broadcast re-scale.
- LogisticRegression trains via distributed L-BFGS: each iteration is a
  treeAggregate of per-partition gradient partials, with the coefficient
  vector (num_features floats) broadcast back — driver state is the
  coefficient vector, never corpus rows.
- Scoring is a map over the corpus with the model broadcast.

At 100 TB the seed/training set is sampled (millions of rows, not the
corpus); scoring is the full-corpus pass and is embarrassingly parallel.

Reference analog: none (bullet has no ML surface); this extends the M5
quality family the same way bigram_logprob_scores extends lang_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 16,
    reg_param: float = 0.01,
    max_iter: int = 40,
):
    """Fit tokenize → hashing-TF → IDF → logistic regression on labeled
    documents; returns the PipelineModel. ``num_features`` is the
    hashing-trick width (collisions trade accuracy for a fixed-size,
    vocabulary-free feature space)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, IDF, RegexTokenizer

    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="__qc_toks", pattern=r"\s+"
            ),
            HashingTF(
                inputCol="__qc_toks",
                outputCol="__qc_tf",
                numFeatures=num_features,
            ),
            IDF(inputCol="__qc_tf", outputCol="__qc_feat"),
            LogisticRegression(
                featuresCol="__qc_feat",
                labelCol=label_col,
                regParam=reg_param,
                maxIter=max_iter,
            ),
        ]
    )
    return pipe.fit(df)


def score_quality(model, df: DataFrame, keep_cols: list[str] | None = None) -> DataFrame:
    """Score a corpus with a trained classifier → input columns (or
    ``keep_cols``) + ``quality_prob`` (P(label=1)). One distributed map;
    the model broadcasts."""
    scored = model.transform(df)
    prob1 = _vector_element(scored["probability"], 1)
    out_cols = keep_cols if keep_cols is not None else df.columns
    return scored.select(*out_cols, prob1.alias("quality_prob"))


def _vector_element(vec, i: int):
    """Element i of an ML Vector column as a double (Spark exposes this
    as the SQL-accessible vector_to_array)."""
    from pyspark.ml.functions import vector_to_array

    return vector_to_array(vec)[i].cast("double")


def classifier_auc(
    scored: DataFrame, label_col: str = "label", prob_col: str = "quality_prob"
) -> float:
    """Area under the ROC curve of the scored frame, via MLlib's own
    BinaryClassificationEvaluator (distributed threshold sweep) — the
    Spark-native evaluator rather than a hand-rolled global rank window,
    which would move the corpus to one task."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    ev = BinaryClassificationEvaluator(
        rawPredictionCol=prob_col,
        labelCol=label_col,
        metricName="areaUnderROC",
    )
    return float(
        ev.evaluate(
            scored.select(
                F.col(prob_col).cast("double").alias(prob_col),
                F.col(label_col).cast("double").alias(label_col),
            )
        )
    )


def calibration_table(
    scored: DataFrame,
    label_col: str = "label",
    prob_col: str = "quality_prob",
    n_buckets: int = 10,
) -> DataFrame:
    """Reliability diagram data: bucket predicted probability into
    ``n_buckets`` equal-width bins → (bucket, n, avg_prob, pos_rate).
    A well-calibrated classifier has avg_prob ≈ pos_rate per bucket —
    the standard check before using predicted probability as a FILTER
    THRESHOLD (a miscalibrated 0.9 is not a 90% precision gate). One
    map-side-combinable aggregate over the scored frame; the output is
    n_buckets rows."""
    b = F.least(
        F.floor(F.col(prob_col) * n_buckets).cast("int"), F.lit(n_buckets - 1)
    )
    return (
        scored.groupBy(b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(prob_col), 6).alias("avg_prob"),
            F.round(F.avg(F.col(label_col).cast("double")), 6).alias("pos_rate"),
        )
        .orderBy("bucket")
    )


def load_frozen_release(path: str | None = None) -> dict:
    """Load a frozen release-gate artifact (JSON: intercept, weights,
    threshold, stopword vocabulary). Defaults to the repo-pinned
    ``quality_release_v1.json`` next to this module — the distilled,
    REPRODUCIBLE form of a trained classifier: the MLlib model's hashed
    features are engine-opaque, so the release gate ships as a linear
    scorer over interpretable portable features instead (the same
    distill-for-serving step production quality filters take so a corpus
    release can be re-verified years later without the training stack)."""
    import json
    import os

    if path is None:
        path = os.path.join(os.path.dirname(__file__), "quality_release_v1.json")
    with open(path) as f:
        return json.load(f)


def frozen_release_gate(
    df: DataFrame,
    model: dict | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score + filter-flag a corpus with a FROZEN linear quality model →
    (id_col, score, kept): score = round(sigmoid(intercept + Σ wᵢ·fᵢ), 6),
    kept = score ≥ threshold — the deterministic release-gate decision.
    The gate compares the ROUNDED score so the kept flag is a pure
    function of the emitted surface (no hidden-precision boundary between
    what is published and what was filtered).

    Features (all engine-portable, the same definitions the heuristic
    quality family uses): alpha_ratio (alphabetic chars / chars),
    punct_ratio (punctuation chars / chars), stop_ratio (pinned-vocabulary
    stopword tokens / tokens), log_len (ln of char length).

    Scale shape: one narrow codegen map over the corpus — no shuffle, no
    Python, no model object; the "model" is four doubles and a 10-word
    vocabulary folded into the plan as literals."""
    m = model if model is not None else load_frozen_release()
    w = m["weights"]
    t = F.col(text_col)
    toks = F.split(F.regexp_replace(F.trim(F.lower(t)), r"\s+", " "), " ")
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", "")).cast("double") / F.length(t)
    punct = F.length(F.regexp_replace(t, r"[^\p{Punct}]", "")).cast("double") / F.length(t)
    stop = (
        F.size(F.filter(toks, lambda x: x.isin(*m["stopwords_en"]))).cast("double")
        / F.size(toks)
    )
    log_len = F.log(F.length(t).cast("double"))
    # strict left-to-right accumulation: the SQL oracle writes the same
    # expression tree, so the float result is bit-identical pre-rounding
    z = (
        F.lit(float(m["intercept"]))
        + F.lit(float(w["alpha_ratio"])) * alpha
        + F.lit(float(w["punct_ratio"])) * punct
        + F.lit(float(w["stop_ratio"])) * stop
        + F.lit(float(w["log_len"])) * log_len
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return df.select(
        F.col(id_col),
        score.alias("score"),
        (score >= F.lit(float(m["threshold"]))).alias("kept"),
    )


def quality_filter(
    model,
    df: DataFrame,
    threshold: float = 0.5,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Corpus filtering on predicted quality: score with the broadcast
    model and keep rows with P(quality) ≥ threshold. The full-corpus
    pass of the FineWeb-Edu flow — embarrassingly parallel, no
    shuffle beyond what scoring's map introduces (none)."""
    return score_quality(model, df, keep_cols=keep_cols).filter(
        F.col("quality_prob") >= threshold
    )
