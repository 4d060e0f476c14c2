"""Distributed WordPiece tokenizer (round 6 late) — the third trained
tokenizer family beside BPE (`operators/bpe.py`, count-scored merges)
and unigram-LM (`operators/unigram.py`, EM-pruned pieces). WordPiece
(Schuster & Nakajima 2012; the BERT tokenizer) merges like BPE but
scores candidates by LIKELIHOOD LIFT — count(ab) / (count(a)·count(b))
— preferring pairs that co-occur more than their parts predict, and
marks word-internal continuations with the ``##`` prefix.

Spark-first training shape (the bpe.py contract): the word vocabulary
aggregates once and localCheckpoints; each merge round is ONE pair-agg
plan plus ONE symbol-count agg joined broadcast-side, and exactly one
1-row collect (the argmax). Driver traffic is bounded by the merge
count, never corpus size. Apply is the standard greedy
longest-match-first algorithm as an Arrow kernel memoized per DISTINCT
word (the unigram apply pattern); the serving path is hash-oracled in
__spark_entry__ via a frozen vocab fixture + recursive-SQL greedy
matcher (the e3_unigram_apply precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: HF WordPiece's max_input_chars_per_word: longer words emit [UNK]
#: without matching (guards the greedy loop on pathological tokens).
MAX_WORD_CHARS = 64

UNK = "[UNK]"


def _wp_syms(word: Column) -> Column:
    """Initial WordPiece symbols: first char bare, the rest
    ##-prefixed. The index array is guarded — sequence(2, 1) DESCENDS
    in Spark (the DSIR lesson)."""
    return F.concat(
        F.array(F.substring(word, 1, 1)),
        F.transform(
            F.when(
                F.length(word) >= 2,
                F.sequence(F.lit(2), F.length(word)),
            ).otherwise(F.expr("array()").cast("array<int>")),
            lambda i: F.concat(F.lit("##"), F.substring(word, i, 1)),
        ),
    )


def _merge_fold(symbols: Column, a: str, b: str, merged: str) -> Column:
    """Greedy left-to-right non-overlapping fold of adjacent (a, b) →
    ``merged`` (bpe._merge_fold with the WordPiece concatenation rule:
    merged strips b's ## marker)."""
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def merge_symbol(a: str, b: str) -> str:
    return a + (b[2:] if b.startswith("##") else b)


def train_wordpiece(
    corpus: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[str]:
    """Learn a WordPiece vocabulary: returns the sorted final symbol
    inventory (initial characters ± ## plus one merged piece per
    round). Deterministic: the likelihood-lift score cnt(ab)/(cnt(a)·
    cnt(b)) breaks ties lexicographically on (a, b).

    Each round: pair counts and symbol counts are two
    map-side-combinable aggs over the CHECKPOINTED word vocab (bounded
    by distinct words, not corpus size); the symbol-count dim — at most
    charset + merges rows — joins broadcast; one 1-row collect takes
    the argmax."""
    vocab = (
        corpus.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("syms", _wp_syms(F.col("word")))
        # lazy: the alphabet collect below materializes it (round 15)
        .localCheckpoint(eager=False)
    )
    # the initial alphabet stays in the vocabulary even when every
    # occurrence of a character later merges (the HF trainer contract —
    # apply must never UNK a word over a char the corpus contained)
    alphabet = [
        r["s"]
        for r in vocab.select(F.explode("syms").alias("s"))
        .distinct()
        .collect()
    ]
    merged_pieces: list[str] = []
    for i in range(n_merges):
        sym_counts = (
            vocab.select("n", F.explode("syms").alias("s"))
            .groupBy("s")
            .agg(F.sum("n").alias("c"))
        )
        pairs = (
            vocab.select(
                "n",
                F.explode(
                    F.transform(
                        F.when(
                            F.size("syms") > 1,
                            F.sequence(F.lit(1), F.size("syms") - 1),
                        ).otherwise(F.expr("array()").cast("array<int>")),
                        lambda j: F.struct(
                            F.element_at("syms", j).alias("a"),
                            F.element_at("syms", j + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            # threshold BEFORE the argmax: rare pairs have the highest
            # likelihood lift (1/(1·1)), so breaking on the winner's
            # count would end training at the first noise pair
            .filter(F.col("cnt") >= min_pair_count)
        )
        best = (
            pairs.join(
                F.broadcast(sym_counts.withColumnRenamed("c", "_ca")),
                pairs["p.a"] == sym_counts["s"],
            )
            .drop("s")
            .join(
                F.broadcast(sym_counts.withColumnRenamed("c", "_cb")),
                F.col("p.b") == sym_counts["s"],
            )
            .select(
                "p", "cnt",
                (
                    F.col("cnt")
                    / (F.col("_ca").cast("double") * F.col("_cb"))
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["p"]["a"], best[0]["p"]["b"]
        merged_pieces.append(merge_symbol(a, b))
        vocab = vocab.withColumn(
            "syms", _merge_fold(F.col("syms"), a, b, merge_symbol(a, b))
        )
        if (i + 1) % checkpoint_every == 0:
            # lazy: the next round's pair-count collect materializes it
            vocab = vocab.localCheckpoint(eager=False)
    return sorted(set(alphabet) | set(merged_pieces))


def greedy_wordpiece(
    w: str, vocab: set, max_piece_len: int, unk: str = UNK
) -> list[str]:
    """Reference scalar kernel: longest-match-first; any position with
    no matching piece — or a word over MAX_WORD_CHARS — yields [unk]
    for the WHOLE word (the BERT convention)."""
    if len(w) > MAX_WORD_CHARS:
        return [unk]
    toks: list[str] = []
    pos = 0
    while pos < len(w):
        hit = None
        for e in range(min(len(w), pos + max_piece_len), pos, -1):
            cand = w[pos:e] if pos == 0 else "##" + w[pos:e]
            if cand in vocab:
                hit = (cand, e)
                break
        if hit is None:
            return [unk]
        toks.append(hit[0])
        pos = hit[1]
    return toks


def apply_wordpiece(
    df: DataFrame,
    vocab: list[str] | set,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 8,
) -> DataFrame:
    """Tokenize a corpus with a trained WordPiece vocab: (id, tokens).
    Arrow-batched mapInPandas, memoized per DISTINCT word per batch —
    repeated words cost a dict hit (the apply_unigram pattern)."""
    import pandas as pd

    vset = set(vocab)
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("tokens", T.ArrayType(T.StringType())),
    ])

    def run(batches):
        memo: dict[str, list[str]] = {}

        def seg(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                got = memo[w] = greedy_wordpiece(w, vset, max_piece_len)
            return got

        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for w in (text or "").split():
                    toks.extend(seg(w))
                rows.append((did, toks))
            yield pd.DataFrame(rows, columns=[id_col, "tokens"])

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def save_wordpiece(spark, vocab: list[str], path: str) -> None:
    """Persist through the Hadoop FileSystem API (the tokenizer
    persistence contract of save_bpe/save_unigram)."""
    import json

    from drugbankner_spark.operators.scale import write_text_file

    write_text_file(
        spark, path,
        json.dumps({"format": "wordpiece-v1", "vocab": sorted(vocab)}),
    )


def load_wordpiece(spark, path: str) -> list[str]:
    import json

    from drugbankner_spark.operators.scale import read_text_file

    doc = json.loads(read_text_file(spark, path))
    if doc.get("format") != "wordpiece-v1":
        raise ValueError(
            f"load_wordpiece: unrecognized format {doc.get('format')!r}"
        )
    return [str(v) for v in doc["vocab"]]
