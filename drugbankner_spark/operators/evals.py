"""Evaluation-metric operators (E5-adjacent, round 5 late): the scoring
half of a training pipeline — given (prediction, reference) pairs,
compute the standard extractive-QA / summarization metrics at corpus
scale. Everything is pure column expressions (higher-order array
functions — whole-stage codegen, zero Python, zero shuffle per row), so
scoring a 100 TB eval dump is a single scan.

Metrics follow the SQuAD/ROUGE conventions:
- ``exact_match``: normalized string equality (lowercase, collapsed
  whitespace).
- ``token_f1``: multiset token overlap — precision = overlap/|pred|,
  recall = overlap/|ref|, F1 = 2PR/(P+R); 0 when either side is empty
  unless both are (then 1, the SQuAD empty-answer convention).
- ``rouge_n``: n-gram recall — |overlapping n-grams| / |ref n-grams|
  (multiset semantics, matching rouge_score's default).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def _toks(col: Column) -> Column:
    t = F.split(_norm(col), " ")
    return F.filter(t, lambda x: x != "")


def _ngrams(toks: Column, n: int) -> Column:
    """Token n-grams as joined strings; [] when fewer than n tokens."""
    return F.when(F.size(toks) < n, F.array().cast("array<string>")) \
        .otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        )


def _multiset_overlap(a: Column, b: Column) -> Column:
    """Σ over distinct elements of min(count_a, count_b) — the multiset
    intersection size, as a pure higher-order expression."""
    return F.aggregate(
        F.array_distinct(a),
        F.lit(0),
        lambda acc, t: acc + F.least(
            F.size(F.filter(a, lambda x: x == t)),
            F.size(F.filter(b, lambda x: x == t)),
        ),
    )


def eval_scores(
    pairs: DataFrame,
    pred_col: str = "prediction",
    ref_col: str = "reference",
    rouge_n: int = 2,
) -> DataFrame:
    """Per-row scores: (all input columns) + exact_match, token_f1,
    rouge_n (recall). Round aggregate means separately —
    ``pairs.agg(avg(...))`` — so per-example scores stay joinable back
    to their items for error analysis."""
    # pre-project the token and n-gram arrays: _multiset_overlap's fold
    # references its inputs inside a lambda, and lambda-captured child
    # expressions are re-evaluated per element — with inline
    # split/transform inputs the overlap would re-tokenize (and
    # re-build the n-gram array) once per distinct token (round-6
    # lambda-capture audit). Column references make each re-read O(1).
    pre = pairs.select(
        "*",
        _toks(F.col(pred_col)).alias("_p"),
        _toks(F.col(ref_col)).alias("_r"),
    ).select(
        "*",
        _ngrams(F.col("_p"), rouge_n).alias("_pg"),
        _ngrams(F.col("_r"), rouge_n).alias("_rg"),
    )
    p, r = F.col("_p"), F.col("_r")
    overlap = _multiset_overlap(p, r)
    both_empty = (F.size(p) == 0) & (F.size(r) == 0)
    prec = overlap / F.size(p)
    rec = overlap / F.size(r)
    f1 = F.when(both_empty, F.lit(1.0)).when(
        (F.size(p) == 0) | (F.size(r) == 0) | (overlap == 0), F.lit(0.0)
    ).otherwise(2 * prec * rec / (prec + rec))
    pg, rg = F.col("_pg"), F.col("_rg")
    rouge = F.when(F.size(rg) == 0, F.lit(0.0)).otherwise(
        _multiset_overlap(pg, rg) / F.size(rg)
    )
    return pre.select(
        *[F.col(c) for c in pairs.columns],
        (_norm(F.col(pred_col)) == _norm(F.col(ref_col)))
        .alias("exact_match"),
        F.round(f1, 6).alias("token_f1"),
        F.round(rouge, 6).alias(f"rouge_{rouge_n}"),
    )


def bleu_corpus(
    pairs: DataFrame,
    pred_col: str = "prediction",
    ref_col: str = "reference",
    max_n: int = 4,
) -> DataFrame:
    """Corpus-level BLEU (Papineni et al. 2002) over (prediction,
    reference) pairs: per n = 1..max_n the CLIPPED n-gram matches are
    summed across the corpus before dividing (the corpus statistic,
    not a mean of sentence BLEUs), plus the brevity-penalty length
    totals. Single-reference form (the common data-pipeline case:
    scoring a decoded/augmented text against its source).

    Per pair: one pre-projected token array each side (lambda-capture
    audit: the clipped-overlap fold re-reads its inputs per element,
    so they must be column references), 2·max_n gram arrays, max_n
    clipped-overlap folds. Then ONE map-side-combinable global agg —
    the whole corpus collapses to a single row, scale-safe.

    FLOAT-PARITY LAW: no transcendental leaves this operator.
    Matches/totals/lengths are exact BIGINTs; precisions are single
    IEEE divisions; ``bleu_no_bp`` is the 4-way geometric mean via
    sqrt(sqrt(((p1·p2)·p3)·p4)) — multiplication order pinned, sqrt
    correctly rounded per IEEE on both engines (requires max_n=4);
    ``bp_log_ratio`` = min(0, 1 − r/c) is division+subtraction only.
    Full BLEU = bleu_no_bp · exp(bp_log_ratio): the one exp() is left
    to the CALLER (exp is not correctly-rounded cross-engine; golden
    tests compute it in Python). Any p_n = 0 ⇒ bleu_no_bp = 0
    (unsmoothed convention)."""
    if max_n != 4:
        raise ValueError("the pinned sqrt(sqrt()) geometric mean "
                         "requires max_n=4")
    pre = pairs.select(
        _toks(F.col(pred_col)).alias("_p"),
        _toks(F.col(ref_col)).alias("_r"),
    )
    gram_cols = []
    for n in range(1, max_n + 1):
        gram_cols += [
            _ngrams(F.col("_p"), n).alias(f"_pg{n}"),
            _ngrams(F.col("_r"), n).alias(f"_rg{n}"),
        ]
    g = pre.select(F.size("_p").alias("_lp"), F.size("_r").alias("_lr"),
                   *gram_cols)
    per_pair = g.select(
        "_lp",
        "_lr",
        *[
            _multiset_overlap(F.col(f"_pg{n}"), F.col(f"_rg{n}"))
            .alias(f"_m{n}")
            for n in range(1, max_n + 1)
        ],
        *[F.size(f"_pg{n}").alias(f"_t{n}") for n in range(1, max_n + 1)],
    )
    agg = per_pair.agg(
        F.sum("_lp").cast("long").alias("pred_len"),
        F.sum("_lr").cast("long").alias("ref_len"),
        *[F.sum(f"_m{n}").cast("long").alias(f"match_{n}")
          for n in range(1, max_n + 1)],
        *[F.sum(f"_t{n}").cast("long").alias(f"total_{n}")
          for n in range(1, max_n + 1)],
    )
    prec = [
        F.when(F.col(f"total_{n}") == 0, F.lit(0.0))
        .otherwise(F.col(f"match_{n}") / F.col(f"total_{n}"))
        .alias(f"p_{n}")
        for n in range(1, max_n + 1)
    ]
    with_p = agg.select("*", *prec)
    geo = F.sqrt(F.sqrt(
        ((F.col("p_1") * F.col("p_2")) * F.col("p_3")) * F.col("p_4")
    ))
    bp_log = F.least(
        F.lit(0.0),
        F.lit(1.0) - F.col("ref_len") / F.col("pred_len"),
    )
    return with_p.select(
        "*",
        geo.alias("bleu_no_bp"),
        F.when(F.col("pred_len") == 0, F.lit(None).cast("double"))
        .otherwise(bp_log).alias("bp_log_ratio"),
    )


def inject_needles(
    docs: DataFrame,
    needle: Column | str,
    depth_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Needle-in-a-haystack eval construction: insert ``needle`` (a
    column expression, so per-doc needles work) at a controlled token
    DEPTH of each document — the standard long-context retrieval probe
    (place a known fact at 10%/50%/90% depth, ask the model for it,
    measure recall by depth). Pure array expressions, zero shuffle.
    Output: (id, text, needle_pos, n_tokens) where needle_pos is the
    0-based token index of the inserted needle."""
    if not 0.0 <= depth_frac <= 1.0:
        raise ValueError("inject_needles: depth_frac must be in [0, 1]")
    ndl = F.lit(needle) if isinstance(needle, str) else needle
    toks = F.split(F.col(text_col), " ")
    pos = F.floor(F.size(toks) * depth_frac).cast("int")
    injected = F.concat(
        F.slice(toks, 1, pos),
        F.array(ndl),
        F.slice(toks, pos + 1, F.size(toks) - pos),
    )
    return docs.select(
        F.col(id_col),
        F.array_join(injected, " ").alias(text_col),
        pos.cast("long").alias("needle_pos"),
        (F.size(toks) + 1).cast("long").alias("n_tokens"),
    )


def rouge_l_scores(
    pairs: DataFrame,
    pred_col: str = "prediction",
    ref_col: str = "reference",
    id_col: str = "doc_id",
) -> DataFrame:
    """ROUGE-L: longest-common-subsequence F-measure over tokens —
    order-sensitive where ROUGE-n is bag-like. The O(|p|·|r|) LCS
    dynamic program has no bounded SQL form, so it runs as an
    Arrow-batched kernel (rolling 1-row DP array — O(min) memory per
    pair). Output: (id, lcs_len, rouge_l_p, rouge_l_r, rouge_l_f)."""
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType([
        pairs.schema[id_col],
        T.StructField("lcs_len", T.LongType()),
        T.StructField("rouge_l_p", T.DoubleType()),
        T.StructField("rouge_l_r", T.DoubleType()),
        T.StructField("rouge_l_f", T.DoubleType()),
    ])

    def lcs(a: list, b: list) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = [0] * (len(b) + 1)
        for x in a:
            cur = [0]
            for j, y in enumerate(b, 1):
                cur.append(
                    prev[j - 1] + 1 if x == y
                    else max(prev[j], cur[j - 1])
                )
            prev = cur
        return prev[-1]

    def run(batches):
        for pdf in batches:
            rows = []
            for did, p, r in zip(pdf[id_col], pdf[pred_col], pdf[ref_col]):
                pt = (p or "").lower().split()
                rt = (r or "").lower().split()
                n = lcs(pt, rt)
                prec = n / len(pt) if pt else 0.0
                rec = n / len(rt) if rt else 0.0
                f = (2 * prec * rec / (prec + rec)) if n else 0.0
                rows.append((did, n, round(prec, 6), round(rec, 6),
                             round(f, 6)))
            yield pd.DataFrame(
                rows, columns=[id_col, "lcs_len", "rouge_l_p",
                               "rouge_l_r", "rouge_l_f"],
            )

    return pairs.select(id_col, pred_col, ref_col).mapInPandas(
        run, out_schema
    )


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 5,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query retrieval quality (round 6, closing the loop on the
    e2_retrieval_topk pipeline): given ranked ``results`` and a
    ``qrels`` relevance set (query_col, doc_col), emit per query —
    n_relevant, n_retrieved_relevant (within rank ≤ k), recall_at_k
    (STANDARD recall: hits / n_relevant — comparable to published
    recall@k numbers), capped_recall_at_k (hits / min(n_relevant, k),
    a.k.a. R-capped recall — the "did we fill the budget" variant that
    reaches 1.0 when every slot is a hit; ADVICE r06 flagged that
    shipping THIS under the name recall_at_k misleads), and
    reciprocal_rank (1/rank of the FIRST relevant hit; 0 when none
    retrieved). Average reciprocal_rank across queries for MRR.

    Pure relational: one semi-shaped inner join results⋈qrels on
    (query, doc) + two aggs keyed by query — nothing bigger than the
    result set (queries × k rows) ever shuffles, so the metric costs
    nothing next to the retrieval itself. Rounded to 6dp for
    cross-engine hash parity."""
    hits = (
        results.filter(F.col(rank_col) <= k)
        .join(qrels.select(query_col, doc_col), [query_col, doc_col])
        .groupBy(query_col)
        .agg(
            F.count(F.lit(1)).alias("n_retrieved_relevant"),
            F.min(rank_col).alias("_first_rank"),
        )
    )
    totals = qrels.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_relevant")
    )
    return (
        totals.join(hits, query_col, "left")
        .select(
            F.col(query_col),
            "n_relevant",
            F.coalesce("n_retrieved_relevant", F.lit(0)).alias(
                "n_retrieved_relevant"
            ),
            F.round(
                F.coalesce("n_retrieved_relevant", F.lit(0))
                / F.col("n_relevant"),
                6,
            ).alias("recall_at_k"),
            F.round(
                F.coalesce("n_retrieved_relevant", F.lit(0))
                / F.least(F.col("n_relevant"), F.lit(k)),
                6,
            ).alias("capped_recall_at_k"),
            F.coalesce(
                F.round(1.0 / F.col("_first_rank"), 6), F.lit(0.0)
            ).alias("reciprocal_rank"),
        )
    )


def ndcg_at_k(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 5,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """nDCG@k over GRADED relevance (round 6, completing the retrieval
    metric family beside recall@k/MRR): DCG = Σ rel_i / log2(rank_i+1)
    over retrieved docs at rank ≤ k; IDCG from the qrels' top-k grades
    sorted descending; ndcg = DCG/IDCG. Every query id seen in EITHER
    ``results`` or ``qrels`` gets a row: queries with no positive
    grade (zero-grade qrels only, or absent from qrels entirely) emit
    ndcg_at_k = 0.0 rather than dropping — ADVICE r06 flagged that the
    round-6 version silently dropped them, inflating downstream
    mean-nDCG. Linear gain (rel, not 2^rel-1) — the original
    Järvelin-Kekäläinen form; swap the gain expression for the burst
    variant if needed. Rounded to 6dp for cross-engine parity.

    Relational shape: one (query, doc) join + per-query agg for DCG,
    one qrels window for IDCG, one distinct over the (small) query-id
    union — costs nothing next to retrieval."""
    from pyspark.sql import Window

    log2 = lambda c: F.log(c.cast("double")) / F.log(F.lit(2.0))
    dcg = (
        results.filter(F.col(rank_col) <= k)
        .join(qrels.select(query_col, doc_col, rel_col),
              [query_col, doc_col])
        .groupBy(query_col)
        .agg(F.sum(
            F.col(rel_col) / log2(F.col(rank_col) + 1)
        ).alias("_dcg"))
    )
    w = Window.partitionBy(query_col).orderBy(
        F.desc(rel_col), F.asc(doc_col)
    )
    ideal = (
        qrels.filter(F.col(rel_col) > 0)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(query_col)
        .agg(F.sum(
            F.col(rel_col) / log2(F.col("_rn") + 1)
        ).alias("_idcg"))
    )
    all_queries = (
        results.select(query_col)
        .unionByName(qrels.select(query_col))
        .distinct()
    )
    return (
        all_queries.join(ideal, query_col, "left")
        .join(dcg, query_col, "left")
        .select(
            F.col(query_col),
            F.when(F.col("_idcg").isNull(), F.lit(0.0))
            .otherwise(
                F.round(
                    F.coalesce(F.col("_dcg"), F.lit(0.0))
                    / F.col("_idcg"),
                    6,
                )
            )
            .alias("ndcg_at_k"),
        )
    )


def calibration_report(
    preds: DataFrame,
    conf_col: str = "confidence",
    label_col: str = "correct",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + Expected Calibration Error (Guo et al.
    2017) over (confidence ∈ [0,1], correct ∈ {0,1}) predictions:
    equal-width bins, per-bin count / mean confidence / empirical
    accuracy / |gap|, plus the same ECE value on every row (weighted
    mean |gap|, the standard single-number summary — carried as a
    column so the report stays ONE DataFrame). Convention: confidence
    1.0 lands in the LAST bin (least(floor(c·B), B−1)); empty bins are
    simply absent (they contribute 0 to ECE). One agg + one 1-row
    broadcast join; 6dp for cross-engine parity."""
    b = F.lit(n_bins)
    binned = preds.select(
        F.least(
            F.floor(F.col(conf_col) * b).cast("int"), b - 1
        ).alias("bin"),
        F.col(conf_col).alias("_c"),
        F.col(label_col).cast("double").alias("_y"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("_c"), 6).alias("avg_confidence"),
        F.round(F.avg("_y"), 6).alias("accuracy"),
        F.round(F.abs(F.avg("_c") - F.avg("_y")), 6).alias("abs_gap"),
    )
    total = per_bin.agg(
        F.round(
            F.sum(F.col("n") * F.abs(
                F.col("avg_confidence") - F.col("accuracy")
            )) / F.sum("n"), 6,
        ).alias("ece")
    )
    return per_bin.crossJoin(F.broadcast(total))


def ner_span_metrics(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "doc_id",
    start_col: str = "start",
    label_col: str = "label",
    length_col: str = "length",
) -> DataFrame:
    """Span-level NER evaluation (the CoNLL exact-match convention —
    the metric the reference's scispaCy pipeline would be scored by):
    a prediction is a true positive iff (doc, start, length, label)
    all match a gold span. Per label: tp/fp/fn + precision/recall/F1,
    plus one ``__micro__`` row aggregated over all labels (6dp; empty
    denominators → 0.0, the seqeval convention).

    Shape: duplicate spans collapse first (distinct), then ONE inner
    join on the full span key counts TP per label, and the per-label
    totals derive from two count aggs — no anti-joins needed since
    fp = n_pred − tp and fn = n_gold − tp. Everything keys on (doc,
    span), clickstream-scale safe."""
    key = [id_col, start_col, length_col, label_col]
    p = pred.select(*key).distinct()
    g = gold.select(*key).distinct()
    tp = (
        p.join(g, key)
        .groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    np_ = p.groupBy(label_col).agg(F.count(F.lit(1)).alias("n_pred"))
    ng = g.groupBy(label_col).agg(F.count(F.lit(1)).alias("n_gold"))
    per = (
        np_.join(ng, label_col, "full")
        .join(tp, label_col, "left")
        .select(
            F.col(label_col).alias("label"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
            (F.coalesce("n_pred", F.lit(0))
             - F.coalesce("tp", F.lit(0))).alias("fp"),
            (F.coalesce("n_gold", F.lit(0))
             - F.coalesce("tp", F.lit(0))).alias("fn"),
        )
    )
    micro = per.agg(
        F.lit("__micro__").alias("label"),
        F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"),
    )
    allrows = per.unionByName(micro)
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")),
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")),
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        prec + rec > 0, 2 * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return allrows.select(
        "label", "tp", "fp", "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def stream_calibration_partials(
    preds_stream: DataFrame,
    state_dir: str,
    conf_col: str = "confidence",
    label_col: str = "correct",
    n_bins: int = 10,
) -> None:
    """Streaming maintenance of the calibration report: per
    micro-batch, land MERGEABLE per-bin partials (bin, n, sum_conf,
    sum_correct) in an epoch-keyed partition (dynamic partition
    overwrite — replayed epochs stay idempotent; the sketches/
    time-series partials pattern). ECE and the reliability curve are
    ratios of sums, so they reconstruct EXACTLY at read
    (:func:`read_calibration`) — the bin table is ≤ n_bins × epochs
    rows, never prediction volume."""
    from drugbankner_spark.operators.scale import upsert_partitions
    from drugbankner_spark.streaming.streams import run_foreach_batch

    b = F.lit(n_bins)

    def admit(batch_df: DataFrame, epoch_id: int) -> None:
        part = (
            batch_df.select(
                F.least(
                    F.floor(F.col(conf_col) * b).cast("int"), b - 1
                ).alias("bin"),
                F.col(conf_col).alias("_c"),
                F.col(label_col).cast("double").alias("_y"),
            )
            .groupBy("bin")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("_c").alias("sum_conf"),
                F.sum("_y").alias("sum_correct"),
            )
            .withColumn("_epoch", F.lit(int(epoch_id)))
        )
        upsert_partitions(part, state_dir, ["_epoch"])

    run_foreach_batch(preds_stream, admit, output_mode="update",
                      max_files_per_trigger=1)


def compact_calibration_state(spark, state_dir: str,
                              up_to_epoch: int) -> int:
    """Fold old epochs of a :func:`stream_calibration_partials` state
    dir into one base generation: per-bin sums merge associatively,
    routed through the sum-family
    :func:`sketches.compact_epoch_state` protocol (manifest-committed,
    object-store safe, read-anytime — round 15 closes the family: the
    calibration partials were the one sum-family face without a
    compactor, so a long-lived stream's read cost grew with epoch
    count forever). Read cost after: ≤ n_bins base rows + the
    un-folded tail epochs."""
    from drugbankner_spark.operators.sketches import compact_epoch_state

    def fold(old: DataFrame) -> DataFrame:
        return old.groupBy("bin").agg(
            F.sum("n").alias("n"),
            F.sum("sum_conf").alias("sum_conf"),
            F.sum("sum_correct").alias("sum_correct"),
        )

    return compact_epoch_state(spark, state_dir, up_to_epoch, fold)


def read_calibration(spark, state_dir: str) -> DataFrame:
    """Merge the streamed per-bin partials and emit the SAME schema as
    :func:`calibration_report` — sums add across epochs, the ratios
    and ECE recompute at read. Live rows resolve through the
    compaction manifest with the list/manifest consistency retry
    (:func:`sketches._live_rows`), so reads stay exactly-once at any
    point of a concurrent :func:`compact_calibration_state`."""
    from drugbankner_spark.operators.sketches import _live_rows

    parts = _live_rows(spark, state_dir)
    per_bin = parts.groupBy("bin").agg(
        F.sum("n").alias("n"),
        F.round(F.sum("sum_conf") / F.sum("n"), 6)
        .alias("avg_confidence"),
        F.round(F.sum("sum_correct") / F.sum("n"), 6).alias("accuracy"),
        F.round(
            F.abs(F.sum("sum_conf") / F.sum("n")
                  - F.sum("sum_correct") / F.sum("n")), 6
        ).alias("abs_gap"),
    )
    total = per_bin.agg(
        F.round(
            F.sum(F.col("n") * F.abs(
                F.col("avg_confidence") - F.col("accuracy")
            )) / F.sum("n"), 6,
        ).alias("ece")
    )
    return per_bin.crossJoin(F.broadcast(total))


def classification_report(
    preds: DataFrame,
    id_col: str = "example_id",
    pred_col: str = "predicted",
    gold_col: str = "gold",
) -> DataFrame:
    """Per-class precision/recall/F1 + support over (predicted, gold)
    label pairs — the sklearn-style report as ONE label-pair count agg
    plus two marginal rollups (the confusion matrix is the
    intermediate, so no second scan). One ``__accuracy__`` row carries
    overall accuracy in all three metric columns. 6dp; empty
    denominators → 0.0."""
    pairs = preds.groupBy(
        F.col(pred_col).alias("p"), F.col(gold_col).alias("g")
    ).agg(F.count(F.lit(1)).alias("n"))
    tp = pairs.filter(F.col("p") == F.col("g")).select(
        F.col("g").alias("label"), F.col("n").alias("tp")
    )
    np_ = pairs.groupBy(F.col("p").alias("label")).agg(
        F.sum("n").alias("n_pred")
    )
    ng = pairs.groupBy(F.col("g").alias("label")).agg(
        F.sum("n").alias("support")
    )
    per = (
        ng.join(np_, "label", "full")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("support", F.lit(0)).alias("support"),
            F.coalesce("tp", F.lit(0)).alias("_tp"),
            F.coalesce("n_pred", F.lit(0)).alias("_np"),
        )
    )
    prec = F.when(F.col("_np") > 0, F.col("_tp") / F.col("_np")) \
        .otherwise(F.lit(0.0))
    rec = F.when(F.col("support") > 0,
                 F.col("_tp") / F.col("support")).otherwise(F.lit(0.0))
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)) \
        .otherwise(F.lit(0.0))
    rows = per.select(
        "label", "support",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
    acc = per.agg(
        F.lit("__accuracy__").alias("label"),
        F.sum("support").alias("support"),
        F.round(F.sum("_tp") / F.sum("support"), 6).alias("precision"),
        F.round(F.sum("_tp") / F.sum("support"), 6).alias("recall"),
        F.round(F.sum("_tp") / F.sum("support"), 6).alias("f1"),
    )
    return rows.unionByName(acc)


def agreement_metrics(
    preds: DataFrame,
    pred_col: str = "predicted",
    gold_col: str = "gold",
) -> DataFrame:
    """Chance-corrected agreement over (predicted, gold) label pairs:
    multi-class Matthews correlation (the Gorodkin R_K form) and
    Cohen's kappa — the two summary numbers ``classification_report``
    deliberately doesn't fold into one cell. For label-quality audits
    (rater vs rater, weak supervision vs gold) where accuracy is
    inflated by class imbalance.

    With s = pairs, c = correct, p_k/t_k = predicted/true counts:

        kappa = (c·s − Σ p_k·t_k) / (s² − Σ p_k·t_k)
        MCC   = (c·s − Σ p_k·t_k) /
                (sqrt(s² − Σ p_k²) · sqrt(s² − Σ t_k²))

    FLOAT-PARITY: every sum is an integer aggregate (unordered BIGINT
    addition is exact); kappa is ONE division of exact integers; MCC's
    denominator is two correctly-rounded sqrts of exact integers
    multiplied in pinned order — no transcendental, no ordered float
    sum. Degenerate denominators (single-class marginals) yield NULL.
    Overflow bound: s² < 2⁶³ → fine to 3·10⁹ pairs.

    Plan: one (pred, gold) pair agg (the confusion matrix), marginal
    rollups on that dim-sized intermediate, one final 1-row combine.
    Output: (n, n_correct, agree_num, kappa_den, kappa, mcc)."""
    pairs = preds.groupBy(
        F.col(pred_col).alias("p"), F.col(gold_col).alias("g")
    ).agg(F.count(F.lit(1)).alias("n"))
    from drugbankner_spark.caching import shared_persist

    pairs = shared_persist(pairs)
    totals = pairs.agg(
        F.sum("n").cast("long").alias("s"),
        F.coalesce(
            F.sum(F.when(F.col("p") == F.col("g"), F.col("n"))),
            F.lit(0),
        ).cast("long").alias("c"),
    )
    p_m = pairs.groupBy("p").agg(F.sum("n").cast("long").alias("pk"))
    t_m = pairs.groupBy("g").agg(F.sum("n").cast("long").alias("tk"))
    marg = (
        p_m.join(t_m, p_m["p"] == t_m["g"], "full")
        .select(
            F.coalesce("pk", F.lit(0)).alias("pk"),
            F.coalesce("tk", F.lit(0)).alias("tk"),
        )
        .agg(
            F.sum(F.col("pk") * F.col("tk")).cast("long").alias("spt"),
            F.sum(F.col("pk") * F.col("pk")).cast("long").alias("sp2"),
            F.sum(F.col("tk") * F.col("tk")).cast("long").alias("st2"),
        )
    )
    j = totals.crossJoin(F.broadcast(marg))
    num = F.col("c") * F.col("s") - F.col("spt")
    kden = F.col("s") * F.col("s") - F.col("spt")
    mden = (
        F.sqrt((F.col("s") * F.col("s") - F.col("sp2")).cast("double"))
        * F.sqrt((F.col("s") * F.col("s") - F.col("st2")).cast("double"))
    )
    return j.select(
        F.col("s").alias("n"),
        F.col("c").alias("n_correct"),
        num.alias("agree_num"),
        kden.alias("kappa_den"),
        F.when(kden != 0, num / kden).alias("kappa"),
        F.when(mden != 0.0, num.cast("double") / mden).alias("mcc"),
    )
