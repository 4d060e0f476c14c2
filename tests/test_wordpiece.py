"""WordPiece trainer/apply goldens (round 6 late) — the third trained
tokenizer family. Training is pinned on a hand-checkable toy corpus;
the serving path's cross-engine hash oracle lives in __spark_entry__
(e3_wordpiece_apply, frozen-vocab fixture + recursive-SQL greedy
matcher)."""

from __future__ import annotations

import pytest

from drugbankner_spark.operators.wordpiece import (
    MAX_WORD_CHARS,
    apply_wordpiece,
    greedy_wordpiece,
    load_wordpiece,
    merge_symbol,
    save_wordpiece,
    train_wordpiece,
)

TOY = [
    (1, "the cat sat on the mat"),
    (2, "the cats sat on mats"),
    (3, "that cat is the best cat"),
]


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(TOY, "doc_id long, text string")


def test_training_learns_lift_scored_merges(toy, spark):
    # likelihood lift cnt(ab)/(cnt(a)·cnt(b)) with a min-count floor:
    # 'cat'/'sat'/'mat'/'the' fuse whole; 'cats' must decompose as
    # cat + ##s; the initial alphabet survives every merge.
    v = train_wordpiece(toy, n_merges=12, min_pair_count=2)
    for piece in ["cat", "sat", "mat", "the", "on"]:
        assert piece in v, v
    for ch in ["##a", "##e", "##s", "##t", "b", "c", "i", "m", "o", "s", "t"]:
        assert ch in v, ch

    out = {r["doc_id"]: r["tokens"]
           for r in apply_wordpiece(toy, v).collect()}
    assert out[1] == ["the", "cat", "sat", "on", "the", "mat"]
    assert out[2] == ["the", "cat", "##s", "sat", "on", "mat", "##s"]
    assert out[3][:4] == ["th", "##a", "##t", "cat"]


def test_greedy_kernel_longest_match_and_unk():
    vocab = {"un", "##aff", "##able", "##ffa", "aff", "b"}
    # longest-first: 'unaffable' -> un ##aff ##able (not ##ffa greedy)
    assert greedy_wordpiece("unaffable", vocab, 8) == [
        "un", "##aff", "##able"
    ]
    # no piece at some position -> whole word UNK
    assert greedy_wordpiece("unZip", vocab, 8) == ["[UNK]"]
    # word over the char cap -> UNK without matching
    assert greedy_wordpiece("a" * (MAX_WORD_CHARS + 1),
                            {"a", "##a"}, 8) == ["[UNK]"]
    assert merge_symbol("un", "##aff") == "unaff"
    assert merge_symbol("a", "b") == "ab"


def test_min_pair_count_filters_before_argmax(toy, spark):
    # rare pairs carry the highest lift (1/(1·1)); the floor must drop
    # them as CANDIDATES, not stop training at the first noise pair —
    # with the floor at 3, pairs of count 2 never merge but training
    # still picks up the count>=3 merges.
    v = train_wordpiece(toy, n_merges=12, min_pair_count=3)
    assert "the" in v or "th" in v   # count >= 4 path survives
    assert "on" not in v             # count 2: below the floor


def test_save_load_roundtrip(toy, spark, tmp_path):
    v = train_wordpiece(toy, n_merges=8)
    p = str(tmp_path / "wp.json")
    save_wordpiece(spark, v, p)
    assert load_wordpiece(spark, p) == sorted(v)


def test_frozen_fixture_applies_clean_at_sf0001(spark, sf_dir):
    # the driver fixture must cover its own training corpus: no UNKs,
    # non-zero tokens, deterministic across partitionings.
    from drugbankner_spark.fixtures_wordpiece import (
        FROZEN_WORDPIECE_VOCAB,
        WORDPIECE_MAX_PIECE_LEN,
    )
    from drugbankner_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = apply_wordpiece(
        docs, FROZEN_WORDPIECE_VOCAB,
        max_piece_len=WORDPIECE_MAX_PIECE_LEN,
    )
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all("[UNK]" not in r["tokens"] for r in rows)
    again = apply_wordpiece(
        docs.repartition(7), FROZEN_WORDPIECE_VOCAB,
        max_piece_len=WORDPIECE_MAX_PIECE_LEN,
    ).collect()
    key = lambda rs: sorted((r["doc_id"], tuple(r["tokens"])) for r in rs)
    assert key(rows) == key(again)
