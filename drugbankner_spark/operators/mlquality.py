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


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (round 6). Xie et al.
# 2023 (arXiv:2302.03169): score every raw document by the hashed-n-gram
# log-likelihood ratio between a TARGET distribution (the data you want
# more of, e.g. curated in-domain text) and the RAW crawl distribution,
# then keep the top-weighted docs. The published method; the third rung
# of the curation ladder beside the Gopher rules and the trained
# classifier above.
# ---------------------------------------------------------------------------


def hashed_ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    kernel: str = "md5",
    flag=None,
) -> DataFrame:
    """(id, bucket, n): counts of whitespace unigrams AND bigrams
    hashed into ``dim`` buckets — DSIR's feature map. One explode (the
    bigram array is built from the SAME projected token array, so the
    split runs once per doc) + one map-side-combinable agg; nothing
    driver-side. Same dual hash kernel as the dedup family
    (dedup.content_hash32): md5 for cross-engine oracles, xxhash64 for
    production.

    ``flag``: optional boolean Column over ``df``'s columns; when
    given, the output carries it as ``_tgt`` (constant per id — it
    joins the groupBy key, which cannot change the (id, bucket, n)
    triples). Lets :func:`dsir_log_weights` fit both of its corpus
    models from ONE tokenize+hash pass when the target corpus is a
    predicate-slice of the raw pool (round 15)."""
    from drugbankner_spark.operators.dedup import content_hash32
    from drugbankner_spark.tables import spread_input

    proj = [F.col(id_col), F.col(text_col)]
    if flag is not None:
        proj.append(flag.alias("_tgt"))
    key_cols = [id_col] if flag is None else [id_col, "_tgt"]
    # tokenize + md5-per-feature is per-row-heavy: spread a
    # one-row-group input so the scan stage uses every core
    # (guide §2.5; no-op when the input already splits)
    pre = spread_input(df.select(*proj)).select(
        *key_cols,
        F.filter(
            F.split(F.col(text_col), " "), lambda t: t != F.lit("")
        ).alias("_tk"),
    )
    tk = F.col("_tk")
    feats = pre.select(
        *key_cols,
        F.explode(
            F.concat(
                tk,
                F.transform(
                    # sequence(2, 1) DESCENDS in Spark — guard the
                    # single-token doc with an empty index array
                    F.when(
                        F.size(tk) >= 2, F.sequence(F.lit(2), F.size(tk))
                    ).otherwise(F.expr("array()").cast("array<int>")),
                    lambda i: F.concat_ws(
                        " ", F.element_at(tk, i - 1), F.element_at(tk, i)
                    ),
                ),
            )
        ).alias("feat"),
    )
    return (
        feats.select(
            *key_cols,
            F.pmod(content_hash32(F.col("feat"), kernel), F.lit(dim)).alias(
                "bucket"
            ),
        )
        .groupBy(*key_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _bucket_log_probs(
    counts: DataFrame, spark, dim: int, alpha: float
) -> DataFrame:
    """(bucket, logp): Laplace-smoothed log-probability of each of the
    ``dim`` buckets under a bag-of-features model fit on ``counts``.
    The model is a BOUNDED dim-row table (the full bucket range comes
    from one sequence explode, so zero-count buckets get the smoothing
    floor) — broadcast-able by construction, never a scale concern."""
    grid = spark.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("bucket")
    )
    per_bucket = counts.groupBy("bucket").agg(F.sum("n").alias("cnt"))
    total = counts.agg(F.sum("n").alias("_tot"))
    return (
        grid.join(per_bucket, "bucket", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            (
                F.log(F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
                - F.log(F.col("_tot") + F.lit(alpha * dim))
            ).alias("logp"),
        )
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    kernel: str = "md5",
    alpha: float = 1.0,
    target_pred=None,
) -> DataFrame:
    """Per-raw-doc DSIR importance log-weight, rounded to 6dp:
    Σ_buckets c_b · (log p_target(b) − log p_raw(b)), with c the doc's
    hashed unigram+bigram counts and both models Laplace-smoothed
    bag-of-features fits. Positive ⇒ the doc looks more like the target
    corpus than the raw pool.

    Scale shape: two bounded dim-row model fits (one agg over each
    corpus's exploded features), ONE broadcast join of the dim-row
    log-ratio dim against the raw counts, one per-doc agg. The raw
    corpus shuffles only (id, bucket, n) — never text. 100 TB-safe:
    the model is ``dim`` rows no matter the corpus size.

    ``target_pred`` (round 15, guide §1.2 "don't compute things
    twice"): when the target corpus is a predicate-slice of ``raw``
    (the common curation setup — e.g. ``lang = 'en'``), pass the
    predicate instead of a ``target`` frame. The target model then
    falls out of the SAME tokenize+hash pass as the raw model — the
    per-bucket fit aggregates both corpora in one exchange
    (conditional sum), the totals come off the dim-row result, and
    the second corpus-scale tokenize/explode/agg chain disappears
    (sf0.1 plan: 32 → 9 Exchanges). The per-doc (id, bucket, n)
    triples are untouched (the flag joins the groupBy key, constant
    per id), both models see exactly the counts they saw before
    (conditional integer sums), and the smoothing/log math is the
    same expression tree — results are bit-identical, which the
    unchanged DuckDB oracle checks."""
    from drugbankner_spark.caching import shared_persist

    spark = raw.sparkSession
    if target_pred is not None:
        flagged = shared_persist(
            hashed_ngram_counts(
                raw, text_col, id_col, dim, kernel, flag=target_pred
            )
        )
        grid = spark.range(1).select(
            F.explode(
                F.sequence(F.lit(0), F.lit(dim - 1))
            ).alias("bucket")
        )
        per_bucket = flagged.groupBy("bucket").agg(
            F.sum("n").alias("_cr"),
            F.sum(F.when(F.col("_tgt"), F.col("n"))).alias("_ct"),
        )
        totals = per_bucket.agg(
            F.sum("_cr").alias("_tot_r"),
            F.sum("_ct").alias("_tot_t"),
        )
        a = F.lit(alpha)
        ratio = (
            grid.join(per_bucket, "bucket", "left")
            .crossJoin(F.broadcast(totals))
            .select(
                "bucket",
                (
                    (F.log(F.coalesce(F.col("_ct"), F.lit(0)) + a)
                     - F.log(F.col("_tot_t") + F.lit(alpha * dim)))
                    - (F.log(F.coalesce(F.col("_cr"), F.lit(0)) + a)
                       - F.log(F.col("_tot_r") + F.lit(alpha * dim)))
                ).alias("_ratio"),
            )
        )
        return (
            flagged.join(F.broadcast(ratio), "bucket")
            .groupBy(id_col)
            .agg(
                F.round(F.sum(F.col("n") * F.col("_ratio")), 6).alias(
                    "dsir_log_weight"
                )
            )
        )
    # branch-point law (ADVICE r04): raw_counts feeds BOTH the raw
    # model fit and the final per-doc join — without the persist the
    # raw corpus is tokenized + feature-hashed twice (guide §1.2: don't
    # compute things twice before tuning anything else)
    raw_counts = shared_persist(
        hashed_ngram_counts(raw, text_col, id_col, dim, kernel)
    )
    tgt_counts = hashed_ngram_counts(target, text_col, id_col, dim, kernel)
    ratio = (
        _bucket_log_probs(tgt_counts, spark, dim, alpha)
        .withColumnRenamed("logp", "_lt")
        .join(
            _bucket_log_probs(raw_counts, spark, dim, alpha)
            .withColumnRenamed("logp", "_lr"),
            "bucket",
        )
        .select("bucket", (F.col("_lt") - F.col("_lr")).alias("_ratio"))
    )
    return (
        raw_counts.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.round(F.sum(F.col("n") * F.col("_ratio")), 6).alias(
                "dsir_log_weight"
            )
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    kernel: str = "md5",
    alpha: float = 1.0,
) -> DataFrame:
    """Top-k raw docs by DSIR weight (deterministic id tiebreak),
    original columns preserved. orderBy+limit plans as
    TakeOrderedAndProject — per-partition heaps, only k rows to the
    driver-side merge, no global sort."""
    w = dsir_log_weights(raw, target, text_col, id_col, dim, kernel, alpha)
    keep = (
        w.orderBy(F.desc("dsir_log_weight"), F.asc(id_col))
        .limit(k)
        .select(id_col, "dsir_log_weight")
    )
    return raw.join(F.broadcast(keep), id_col)
