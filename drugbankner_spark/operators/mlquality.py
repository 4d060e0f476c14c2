"""Trainable document-quality classifier (E3 engine extension).

The rule-based Gopher filter (textanalysis.gopher_quality_filter)
catches mechanical garbage; production corpus pipelines (CCNet,
RefinedWeb, fastText-style filtering) pair it with a LEARNED
classifier: hash text into a fixed-width sparse vector, train logistic
regression against a labeled seed set (e.g. "looks like Wikipedia" vs
"random crawl"), score the whole corpus, keep above a threshold.

Spark-first: features come from `pyspark.ml.feature.HashingTF` (JVM
hashing-trick, the ml-vector twin of textanalysis.hashed_tf_vectors),
training is `pyspark.ml.classification.LogisticRegression` (distributed
LBFGS — the driver holds one coefficient vector of `num_features`
doubles, executors do the gradient passes), scoring is a pure
`model.transform` projection. At 100 TB you train on a sampled seed set
(millions of rows) and score with one scan — no shuffle at all in the
scoring plan beyond the scan itself.

Determinism note: LBFGS aggregates partial gradients in partition
order, so coefficients can differ in the last ulps across cluster
layouts — tests therefore assert separation quality (planted AUC,
threshold behavior) and save/load round-trips, not exact coefficient
bytes. That is the honest contract for any distributed trainer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _feature_pipeline(num_features: int):
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol="text", outputCol="_tokens", pattern=r"\s+",
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol="_tokens", outputCol="features",
        numFeatures=num_features, binary=False,
    )
    return [tok, tf]


def train_quality_classifier(
    labeled_docs: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 16,
    max_iter: int = 50,
    reg_param: float = 1e-4,
):
    """Fit the tokenize→hash→logistic-regression pipeline on a labeled
    seed set (`label` 1.0 = high quality). Returns a fitted
    ``PipelineModel`` (save with ``model.write().overwrite().save(p)``,
    reload with ``PipelineModel.load(p)``)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    lr = LogisticRegression(
        featuresCol="features", labelCol=label_col,
        maxIter=max_iter, regParam=reg_param, standardization=False,
    )
    stages = [*_feature_pipeline(num_features), lr]
    df = labeled_docs.select(
        F.col(text_col).alias("text"),
        F.col(label_col).cast("double").alias(label_col),
    )
    return Pipeline(stages=stages).fit(df)


def score_quality(
    docs: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, quality_prob) for every document — P(label=1) from the
    fitted model. One scan, no shuffle: tokenize/hash/dot-product are
    all projections."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(
        docs.select(F.col(id_col), F.col(text_col).alias("text"))
    )
    return scored.select(
        id_col,
        F.round(
            vector_to_array(F.col("probability"))[1], 6
        ).alias("quality_prob"),
    )


def filter_by_quality(
    docs: DataFrame,
    model,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Survivors of the learned filter: docs whose P(high quality) ≥
    threshold, original columns preserved (semi join on the scored
    ids — broadcast-able when the survivor set is small, plain
    shuffle-hash otherwise; Catalyst picks)."""
    keep = score_quality(docs, model, text_col, id_col).filter(
        F.col("quality_prob") >= threshold
    ).select(id_col)
    return docs.join(keep, id_col, "semi")
