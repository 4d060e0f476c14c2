"""BPE training (operators/bpe.py) vs an independent pure-Python
reference implementation — merges and tokenizations must agree."""

from __future__ import annotations

from collections import Counter

from drugbankner_spark.operators.bpe import apply_bpe, train_bpe


def _ref_train(words_with_counts, n_merges, min_pair_count=2):
    """Plain-Python BPE with the same deterministic tie-break
    (count desc, pair asc)."""
    vocab = {tuple(w): c for w, c in words_with_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _ref_encode(word, merges):
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide wide wider",
    "low new wide slow slower",
]


def test_train_bpe_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    got = train_bpe(docs, n_merges=12)
    words = Counter(w for t in CORPUS for w in t.split())
    want = _ref_train(dict(words), 12)
    assert got == want and len(got) > 4


def test_apply_bpe_matches_reference_tokenization(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = train_bpe(docs, n_merges=10)
    out = {r["doc_id"]: list(r["tokens"])
           for r in apply_bpe(docs, merges).collect()}
    for i, t in enumerate(CORPUS):
        want = [tok for w in t.split() for tok in _ref_encode(w, merges)]
        assert out[i] == want, (i, out[i], want)


def test_greedy_merge_non_overlapping(spark):
    # "aaaa" under merge (a,a) must become [aa, aa], never [aa, a, a]
    # cascaded or [aaa, a]
    docs = spark.createDataFrame([(1, "aaaa aa a")], "doc_id long, text string")
    out = apply_bpe(docs, [("a", "a")]).collect()[0]
    assert list(out["tokens"]) == ["aa", "aa", "aa", "a"]
    assert out["n_tokens"] == 4


def test_pandas_encoder_matches_jvm_folds(spark):
    # the constant-depth Arrow encoder must tokenize identically to the
    # JVM merge-fold replay for the same learned table
    from drugbankner_spark.operators.bpe import apply_bpe_pandas

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = train_bpe(docs, n_merges=10)
    jvm = {r["doc_id"]: list(r["tokens"])
           for r in apply_bpe(docs, merges).collect()}
    arrow = {r["doc_id"]: list(r["tokens"])
             for r in apply_bpe_pandas(docs, merges).collect()}
    assert jvm == arrow
