"""Byte-pair-encoding training over a corpus (E3, round 5).

The engine's earlier BPE surface (textanalysis ``bpe_tokens``) counts
tokens with a FIXED regex; this module learns a real merge table from
the corpus — the step a tokenizer-training pipeline (HF tokenizers,
GPT-2 style) runs over raw text, expressed Spark-first:

- The classic BPE reduction applies: collapse the corpus to DISTINCT
  WORDS with counts first (one agg; the word vocabulary is ≪ corpus —
  this is why tokenizer training is feasible at 100 TB at all), then
  every merge iteration touches only the word-vocab DataFrame.
- Each iteration: one map-side-combinable pair-count agg → a 1-row
  argmax collect (count desc, pair asc — deterministic tie-break) →
  apply the merge with a per-row greedy left-to-right array fold.
  ``localCheckpoint`` every few iterations truncates the growing plan
  (the connected-components discipline).
- ``apply_bpe`` replays the learned merges in order on any corpus —
  pure array folds, JVM-side. Plan depth grows with merge count, so
  for production-size vocabularies (tens of thousands of merges) ship
  the merge table into an Arrow-batched mapInPandas encoder instead;
  the semantics here are the reference (tested against an independent
  pure-Python BPE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _chars(word: Column) -> Column:
    return F.split(word, "")


def _merge_fold(symbols: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b) →
    a+b in a symbol array ("aaaa" under (a,a) → [aa, aa])."""
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _word_vocab(corpus: DataFrame, text_col: str) -> DataFrame:
    return (
        corpus.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("syms", _chars(F.col("word")))
    )


def train_bpe(
    corpus: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list — the whole trained tokenizer state (vocabulary =
    initial characters + one entry per merge). Deterministic: ties on
    pair count break lexicographically."""
    # lazy: the first merge round's collect materializes it (round 15)
    vocab = _word_vocab(corpus, text_col).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        pairs = (
            vocab.select(
                "n",
                F.explode(
                    F.transform(
                        # sequence(1, 0) is DESCENDING in Spark — guard
                        # single-symbol words with an empty range
                        F.when(
                            F.size("syms") > 1,
                            F.sequence(F.lit(1), F.size("syms") - 1),
                        ).otherwise(F.array().cast("array<int>")),
                        lambda j: F.struct(
                            F.element_at("syms", j).alias("a"),
                            F.element_at("syms", j + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["cnt"] < min_pair_count:
            break
        a, b = pairs[0]["p"]["a"], pairs[0]["p"]["b"]
        merges.append((a, b))
        vocab = vocab.withColumn("syms", _merge_fold(F.col("syms"), a, b))
        if (i + 1) % checkpoint_every == 0:
            # lazy: the next round's pair-count collect materializes it
            vocab = vocab.localCheckpoint(eager=False)
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a learned merge table: whitespace words →
    characters → replay every merge in training order. Output: (id,
    tokens array<string>, n_tokens). JVM array folds — suited to
    reference-scale merge lists (plan depth = merge count); production
    vocabularies belong in a mapInPandas encoder carrying the same
    table."""
    word_syms = _chars(F.col("_w"))
    for a, b in merges:
        word_syms = _merge_fold(word_syms, a, b)
    exploded = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("_wp", "_w"),
    ).filter(F.col("_w") != "")
    toks = exploded.select(
        F.col(id_col), "_wp", word_syms.alias("_toks")
    )
    return (
        toks.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_wp", "_toks"))
                    ),
                    lambda s: s["_toks"],
                )
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens"))
    )


def apply_bpe_pandas(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Production-scale twin of :func:`apply_bpe`: the merge table ships
    to executors once (closure broadcast) and each Arrow batch encodes
    with a rank-dict greedy loop — plan depth constant regardless of
    vocabulary size, so this is the form for real (30k+ merge)
    tokenizers. Tokenizations are identical to the JVM-fold path
    (parity-tested)."""
    from pyspark.sql import types as T

    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = T.StructType([
        docs.schema[id_col],
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("n_tokens", T.IntegerType()),
    ])

    def encode_word(word: str) -> list[str]:
        syms = list(word)
        # repeatedly apply the best-ranked applicable merge — equivalent
        # to replaying merges in training order (each merge's pairs can
        # only be created by lower-ranked merges)
        while len(syms) > 1:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = (syms[i], syms[i + 1]), r
            if best is None:
                break
            a, b = best
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

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for w in (text or "").split() for t in
                        encode_word(w)]
                rows.append((did, toks, len(toks)))
            yield pd.DataFrame(rows, columns=[id_col, "tokens", "n_tokens"])

    return docs.select(id_col, text_col).mapInPandas(run, out_schema)


def save_bpe(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist a trained merge table as JSON via the Hadoop FileSystem
    API (file://, HDFS, S3A alike) — the artifact a trainer ships."""
    import json

    from drugbankner_spark.operators.scale import write_text_file

    write_text_file(
        spark, path,
        json.dumps({"format": "bpe-merges-v1",
                    "merges": [list(m) for m in merges]}),
    )


def load_bpe(spark, path: str) -> list[tuple[str, str]]:
    import json

    from drugbankner_spark.operators.scale import read_text_file

    doc = json.loads(read_text_file(spark, path))
    if doc.get("format") != "bpe-merges-v1":
        raise ValueError(f"load_bpe: unrecognized format {doc.get('format')!r}")
    return [tuple(m) for m in doc["merges"]]
