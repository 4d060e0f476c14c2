"""Trainable quality classifier (operators/mlquality.py): planted
separation, threshold filtering, and model persistence round-trip."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from drugbankner_spark.operators.mlquality import (
    filter_by_quality,
    score_quality,
    train_quality_classifier,
)

_CLEAN = [
    "the quick brown fox jumps over the lazy dog in the sunny field",
    "a study of the effects of aspirin on patients with heart disease",
    "the committee approved the annual budget after a long discussion",
    "researchers found that the new treatment improved survival rates",
    "the museum opened a new exhibition of renaissance paintings today",
    "students completed the course with a final project and an exam",
    "the recipe calls for two cups of flour and a pinch of salt",
    "engineers designed the bridge to withstand strong winter storms",
]
_GARBAGE = [
    "zxq9 vvvv kkkk 0x3f2a zzzz qqqq 9981 jjjj wwww pppp xxxx",
    "click here buy now cheap cheap cheap $$$ free free win win",
    "asdf asdf asdf asdf asdf asdf asdf asdf asdf asdf asdf",
    "0101010101 1010101010 0101010101 1010101010 0101010101",
    "lorem9 ipsum9 dolor9 sit9 amet9 consectetur9 adipiscing9",
    "xxxxxxxxxx yyyyyyyyyy zzzzzzzzzz wwwwwwwwww vvvvvvvvvv",
    "qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh jj kk",
    "111 222 333 444 555 666 777 888 999 000 111 222 333 444",
]


def _seed_set(spark):
    rows = [(t, 1.0) for t in _CLEAN] + [(t, 0.0) for t in _GARBAGE]
    return spark.createDataFrame(rows, "text string, label double")


def test_planted_separation_and_threshold_filter(spark):
    model = train_quality_classifier(_seed_set(spark))
    docs = spark.createDataFrame(
        [(1, "the doctor reviewed the patient chart before the surgery"),
         (2, "zz9 qq8 xx7 vv6 ww5 buy buy buy $$$ click click"),
         (3, "the garden was full of flowers in the early spring"),
         (4, "kkkk jjjj zzzz 0x00 0x01 asdf asdf 9999 8888")],
        "doc_id long, text string",
    )
    probs = {r["doc_id"]: r["quality_prob"]
             for r in score_quality(docs, model).collect()}
    # held-out clean docs score above held-out garbage — separation
    assert min(probs[1], probs[3]) > max(probs[2], probs[4])
    kept = {r["doc_id"]
            for r in filter_by_quality(docs, model, threshold=0.5).collect()}
    assert kept == {1, 3}
    # survivors keep their original columns
    out = filter_by_quality(docs, model, threshold=0.5)
    assert set(out.columns) == {"doc_id", "text"}


def test_model_save_load_roundtrip(spark):
    from pyspark.ml import PipelineModel

    model = train_quality_classifier(_seed_set(spark))
    docs = spark.createDataFrame(
        [(1, "the meeting was scheduled for early monday morning"),
         (2, "qqq www 999 $$$ zzz buy buy")],
        "doc_id long, text string",
    )
    want = sorted(map(tuple, score_quality(docs, model).collect()))
    d = tempfile.mkdtemp(prefix="mlq_")
    try:
        model.write().overwrite().save(d + "/m")
        back = PipelineModel.load(d + "/m")
        got = sorted(map(tuple, score_quality(docs, back).collect()))
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_scoring_plan_is_scan_only(spark):
    # the 100 TB contract: scoring is projections over one scan — no
    # exchange in the plan
    from drugbankner_spark.plans import explain as X

    model = train_quality_classifier(_seed_set(spark))
    docs = spark.createDataFrame(
        [(1, "some text here")], "doc_id long, text string"
    )
    plan = X.plan_string(score_quality(docs, model), "formatted")
    assert "Exchange" not in plan


def test_streaming_scoring_equals_batch(spark):
    # batch-stream unification extends to ML scoring: model.transform
    # is a stateless projection, so readStream → score → sink equals
    # the batch answer over the same input.
    import shutil
    import tempfile

    from drugbankner_spark.streaming.streams import run_to_memory

    model = train_quality_classifier(_seed_set(spark))
    docs = spark.createDataFrame(
        [(1, "the annual report was published early this year"),
         (2, "zzz 999 qqq buy buy $$$ click"),
         (3, "a calm morning walk along the river bank")],
        "doc_id long, text string",
    )
    d = tempfile.mkdtemp(prefix="mlq_stream_")
    try:
        docs.write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema("doc_id long, text string").parquet(d)
        got = sorted(map(tuple, run_to_memory(
            score_quality(stream, model), "mlq_scored", "append"
        ).collect()))
        want = sorted(map(tuple, score_quality(docs, model).collect()))
        assert got == want and len(got) == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dsir_ranks_target_like_docs_first(spark):
    # round 6: docs sharing the target's vocabulary must out-weigh
    # off-domain docs; selection keeps them with columns intact.
    from drugbankner_spark.operators.mlquality import (
        dsir_log_weights,
        dsir_select,
    )

    raw = spark.createDataFrame(
        [(1, "protein binding site affinity measured in the assay"),
         (2, "protein structure and binding affinity of the ligand"),
         (3, "buy cheap watches online best price deal now"),
         (4, "click here for free coupons and discount codes")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, "the binding affinity of the protein ligand complex"),
         (101, "assay results show strong protein binding site")],
        "doc_id long, text string",
    )
    w = {r["doc_id"]: r["dsir_log_weight"]
         for r in dsir_log_weights(raw, target, dim=128).collect()}
    assert min(w[1], w[2]) > max(w[3], w[4])

    kept = dsir_select(raw, target, k=2, dim=128)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2]
    assert set(kept.columns) == {"doc_id", "text", "dsir_log_weight"}


def test_dsir_single_token_and_kernel_parity(spark):
    # the xxhash64 production kernel must run on degenerate docs
    # (single-token: no bigrams) and produce one weight per non-empty doc.
    from drugbankner_spark.operators.mlquality import dsir_log_weights

    raw = spark.createDataFrame(
        [(1, "solo"), (2, "two words"), (3, "")],
        "doc_id long, text string",
    )
    for kernel in ("md5", "xxhash64"):
        rows = dsir_log_weights(
            raw, raw.filter("doc_id = 2"), dim=16, kernel=kernel
        ).collect()
        assert sorted(r["doc_id"] for r in rows) == [1, 2], kernel


def test_pretrain_prep_composition_equals_manual_chain(spark):
    # round 7: the composed flagship must equal running curate (with
    # text) and packing by hand over the survivors.
    from drugbankner_spark.operators.corpus import (
        curate_corpus,
        pack_sequence_assignments,
        pretrain_prep,
    )
    from drugbankner_spark.tables import load_table
    from pyspark.sql import functions as F

    from __spark_entry__ import _synth_pages

    # raw sf0.001 docs all fail the C4 line rules (no terminal
    # punctuation) — use the driver's synthesized pages, where the
    # chain keeps a nontrivial subset
    docs = _synth_pages(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    )
    got = sorted(map(tuple, pretrain_prep(docs, seq_len=128).collect()))
    cur = curate_corpus(docs, keep_text=True)
    kept = cur.filter(F.col("keep")).select(
        "doc_id", F.col("text_final").alias("text")
    )
    want = sorted(map(tuple, pack_sequence_assignments(
        kept, seq_len=128
    ).collect()))
    assert got == want and len(got) > 0
    # survivors only — no dropped doc appears
    dropped = {r["doc_id"] for r in cur.filter(~F.col("keep")).collect()}
    assert dropped.isdisjoint({t[0] for t in got})
