"""E1: deduplication at scale (SURVEY.md §2.12; BASELINE.json north star).

Exact, hash-canonical, MinHash-LSH, SimHash, and n-gram-Jaccard dedup
over a documents table — all pure column expressions / joins (zero
Python in the hot path), so every variant distributes and whole-stage-
codegens at 100 TB.

Design notes for scale:
- Exact dedup is a hash aggregation on the dedup key — map-side partial
  agg, one shuffle. Hash-canonical dedup (sha256 of the content) avoids
  shuffling long texts: the 64-hex digest is the shuffle key.
- MinHash: shingle → 32-bit content hash → k permutations
  ``(a_j*h+b_j) mod p`` → per-doc min per permutation. The signature is
  k small ints per doc (k·8 bytes), so the candidate-join shuffles
  signatures, never documents. Banding (b bands × r rows) turns
  near-dup detection into an equi join on band keys — the classic
  LSH trade: P(candidate) = 1-(1-s^r)^b.
- The content hash is the first 8 hex chars of md5 — deterministic,
  engine-independent (reproducible by the DuckDB oracle), and cheap.
- SimHash: per-bit majority vote over token hashes via a bit explode —
  32 rows per doc, grouped back; hamming-close pairs then join on
  rotated band keys.
- Exact n-gram Jaccard is the verification oracle for the approximate
  paths: shingle self-join + intersection counts. Quadratic in the
  worst case — use on candidates or small corpora only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from drugbankner_spark.caching import shared_persist
from drugbankner_spark.tables import fits_one_task

#: Modulus for MinHash permutations: smallest prime > 2^32.
MINHASH_PRIME = 4294967311


def content_hash32(col: Column, kernel: str = "md5") -> Column:
    """Deterministic 32-bit string hash.

    ``kernel="md5"``: first 8 hex chars of md5 — reproducible across
    engines (the DuckDB oracle recomputes it bit-for-bit); the ORACLE
    form. ``kernel="xxhash64"``: Spark's native xxhash64 folded to 32
    bits — ~an order of magnitude cheaper per call (no hex round-trip,
    no cryptographic rounds); the PRODUCTION form for 100 TB runs, where
    the hash dominates MinHash cost (VERDICT r01). Identical LSH
    candidate-recall behavior — both are uniform 32-bit hashes — proven
    on planted near-dup pairs in tests/test_dedup.py."""
    if kernel == "md5":
        return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
    if kernel == "xxhash64":
        return F.pmod(F.xxhash64(col), F.lit(4294967296)).cast("long")
    raise ValueError(f"unknown hash kernel: {kernel!r}")


def exact_dedup(
    df: DataFrame, key_cols: list[str], order_cols: list[str] | None = None
) -> DataFrame:
    """Exact dedup with a DETERMINISTIC survivor: per key, keep the row
    that is minimal under (order_cols, then the remaining non-key columns)
    — a total order, so the result is independent of partition layout
    (``dropDuplicates`` keeps an arbitrary first-seen row; round 1 shipped
    that despite documenting min-by — VERDICT r01 "What's wrong" #2).

    One hash aggregation (min over a struct): map-side partial agg, one
    shuffle of (key, packed-row) — same scale shape as any exact dedup.
    """
    others = [c for c in df.columns if c not in key_cols]
    order = list(order_cols) if order_cols is not None else others
    tail = [c for c in others if c not in order]
    packed = [*order, *tail]
    if not packed:  # full-row dedup: every column is a key
        return df.dropDuplicates(key_cols)
    survivor = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.min(F.struct(*[F.col(c) for c in packed])).alias("_row")
    )
    return survivor.select(
        *[
            F.col(c) if c in key_cols else F.col(f"_row.{c}").alias(c)
            for c in df.columns
        ]
    )


def hash_canonical_dedup(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Per distinct content (sha256), keep the smallest id — the shuffle
    carries (digest, id), never the text."""
    digests = df.select(
        F.sha2(F.col(text_col), 256).alias("content_sha"), F.col(id_col)
    )
    return digests.groupBy("content_sha").agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def incremental_exact_dedup(
    new_batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental-ingest dedup: admit only rows of ``new_batch`` whose
    content is (a) absent from the existing ``corpus`` and (b) the
    minimal-id representative within the batch itself.

    The continuous-pipeline counterpart of :func:`hash_canonical_dedup`
    — corpora are never rebuilt at 100 TB; each arriving batch is
    deduplicated against what is already stored. Both checks ride the
    sha256 digest, so the anti-join and the batch-internal min-by
    shuffle (digest, id) pairs — never document bodies. The corpus side
    only needs its digest column; at scale keep that as a bucketed
    digest index table so the anti-join is shuffle-free on ingest.
    """
    digest = F.sha2(F.col(text_col), 256).alias("content_sha")
    seen = corpus.select(digest).distinct()
    fresh = new_batch.withColumn("content_sha", digest).join(
        seen, "content_sha", "left_anti"
    )
    survivor = fresh.groupBy("content_sha").agg(
        F.min(id_col).alias("_keep_id")
    )
    return (
        fresh.join(survivor, "content_sha")
        .filter(F.col(id_col) == F.col("_keep_id"))
        .drop("content_sha", "_keep_id")
    )


def shingle_array_from_tokens(toks: Column, n: int = 3) -> Column:
    """n-token shingles of an ALREADY-SPLIT token-array column (per-row,
    no shuffle). Documents shorter than n tokens yield one truncated
    shingle (lower bound 1 — Spark's ``sequence(1,0)`` would count
    DOWN, not empty).

    ``toks`` must be a plain column REFERENCE (pre-projected), not an
    inline ``split(...)`` expression: Spark re-evaluates a lambda's
    captured child expressions PER ARRAY ELEMENT, so an inline split
    makes shingling O(tokens²) — measured 146 s vs 0.4 s on a 50k-token
    document (round 6)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )


def shingle_array(text_col: str, n: int = 3) -> Column:
    """n-token shingles of a text column as an array. WARNING: inline
    form — the split is re-evaluated per element (O(tokens²) per row).
    Fine for short rows / tests; hot paths pre-project the token array
    and use :func:`shingle_array_from_tokens`."""
    return shingle_array_from_tokens(F.split(F.col(text_col), " "), n)


def token_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct n-token shingles per document (relational form). The
    token array is projected ONCE, then shingled from the column
    reference — linear per document, not quadratic."""
    return (
        df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
        .select(
            F.col(id_col),
            F.explode(
                shingle_array_from_tokens(F.col("_toks"), n)
            ).alias("shingle"),
        )
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str, num_hashes: int = 16, kernel: str = "md5"
) -> DataFrame:
    """k-permutation MinHash over the 32-bit shingle hashes (relational
    form over an exploded shingle table). Output: (id, perm, minhash)."""
    h = content_hash32(F.col("shingle"), kernel)
    perms = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("perm")
    hashed = shingles.select(F.col(id_col), h.alias("_h")).select(
        F.col(id_col), "_h", perms
    )
    val = (
        (F.col("perm") * 2 + 1) * F.col("_h") + F.col("perm") * F.col("perm") + 7
    ) % F.lit(MINHASH_PRIME)
    return (
        hashed.select(F.col(id_col), "perm", val.alias("_v"))
        .groupBy(id_col, "perm")
        .agg(F.min("_v").alias("minhash"))
    )


def minhash_signature_array(
    df: DataFrame, text_col: str, id_col: str,
    num_hashes: int = 16, n: int = 3, kernel: str = "md5",
) -> DataFrame:
    """Shuffle-free MinHash: the whole signature is computed per row with
    array expressions (shingle → hash → k permutation minima), so the
    ONLY shuffle in a near-dup pipeline is the band join itself. Output:
    (id, sig: array<long>[k]). Identical values to minhash_signatures —
    min over the same shingle multiset. ``kernel="xxhash64"`` is the
    production hash (see content_hash32); md5 is kept for oracle runs."""
    pre = df.select("*", F.split(F.col(text_col), " ").alias("_toks"))
    hashes = F.transform(
        shingle_array_from_tokens(F.col("_toks"), n),
        lambda s: content_hash32(s, kernel),
    )
    # One traversal of the shingle hashes; the accumulator is the whole
    # k-wide signature (elementwise running min). Expressing it as a fold
    # evaluates the md5 per shingle ONCE — k separate array_min transforms
    # would re-evaluate the hash array k times (no CSE across lambdas).
    perm_idx = F.array(*[F.lit(j) for j in range(num_hashes)])
    init = F.array(*[F.lit(MINHASH_PRIME)] * num_hashes)
    sig = F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc, perm_idx,
            lambda a, j: F.least(
                a, ((j * 2 + 1) * h + j * j + 7) % F.lit(MINHASH_PRIME)
            ),
        ),
    )
    return pre.select(F.col(id_col), sig.alias("sig"))


def minhash_signatures_rowwise(
    df: DataFrame, text_col: str, id_col: str,
    num_hashes: int = 16, n: int = 3, kernel: str = "md5",
) -> DataFrame:
    """(id, perm, minhash) view of minhash_signature_array (parity shape
    with minhash_signatures, zero pre-explode shuffles)."""
    arr = minhash_signature_array(df, text_col, id_col, num_hashes, n, kernel)
    return arr.select(
        F.col(id_col), F.posexplode("sig").alias("perm", "minhash")
    )


def _banded_keys(
    df: DataFrame, text_col: str, id_col: str,
    num_hashes: int, n: int, bands: int, rows_per_band: int, kernel: str,
) -> DataFrame:
    """(id, band, band_key) from per-row signatures — the LSH key table
    every banding consumer (inline pairs, stored band table) shares."""
    arr = minhash_signature_array(df, text_col, id_col, num_hashes, n, kernel)
    return arr.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[
                F.array_join(
                    F.transform(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                    "-",
                )
                for b in range(bands)
            ])
        ).alias("band", "band_key"),
    )


def minhash_band_pairs_rowwise(
    df: DataFrame, text_col: str, id_col: str,
    num_hashes: int = 16, n: int = 3,
    bands: int = 4, rows_per_band: int = 4,
    parallelism: int | None = None, kernel: str = "md5",
) -> DataFrame:
    """Near-dup candidates with exactly ONE data shuffle (the band-key
    join): band keys are sliced out of the per-row signature array.

    ``parallelism``: repartition before the CPU-bound hashing — useful
    when the source collapses to few input splits (small files locally;
    at real scale the scan already yields enough partitions).
    ``kernel="xxhash64"`` swaps the shingle hash for the cheap production
    kernel (candidate sets differ only as any two hash families differ —
    same expected recall; planted-pair test pins identical recall on the
    fixture).

    The (id, band, band_key) table is PERSISTED (memory+disk, evictable,
    recomputable on executor loss) before the self-join: Catalyst plans
    the two join sides as independent subtrees (no ReusedExchange across
    the alias rename), so without it the corpus is scanned and
    shingle-hashed TWICE — at 100 TB that doubles the dominant cost to
    save materializing ~tens of bytes per document."""
    if parallelism:
        df = df.repartition(parallelism)
    banded = shared_persist(_banded_keys(
        df, text_col, id_col, num_hashes, n, bands, rows_per_band, kernel
    ))
    # Materialize the persist BEFORE the self-join fans out (round 15,
    # guide §2.3/§5): AQE submits the join sides' (and any union
    # branches') shuffle stages as CONCURRENT jobs, and parallel cold
    # tasks of the same persisted partition each compute it — measured
    # on pipeline_clean_corpus: the shingle-hash pass ran 4× (~10 s of
    # the query's ~15 s startup) because sym's two union branches ×
    # two join sides all hit the cold cache at once. One count() pays
    # the hashing exactly once; every fan-out branch then reads blocks.
    # GATED on input size (round 16, VERDICT r15 next #6): below one
    # scan task's worth the shingle pass is a single small task and
    # the warming job costs more than the duplicate compute it
    # prevents (driver r15: e1_minhash_near_dup −33%). At scale the
    # gate never skips.
    if not fits_one_task(df):
        banded.count()
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_band_pairs(
    signatures: DataFrame, id_col: str, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: docs sharing any band of their signature become
    candidate pairs (id_a < id_b, distinct). The join key is
    (band, concatenated band signature) — an equi join Catalyst can
    shuffle-hash; at scale the band table is ~b rows per doc."""
    banded = (
        signatures.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("perm", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
                "-",
            ).alias("band_key")
        )
    )
    banded = shared_persist(banded)  # both self-join sides
    # materialize before the self-join fans out — same concurrent-cold-
    # cache rationale (and the same one-task-input gate) as
    # minhash_band_pairs_rowwise above
    if not fits_one_task(signatures):
        banded.count()
    a = banded.select(
        F.col(id_col).alias("id_a"), "band", "band_key"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), "band", "band_key"
    )
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def build_minhash_band_table(
    df: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 16, n: int = 3, bands: int = 4, rows_per_band: int = 4,
    kernel: str = "md5",
) -> None:
    """Materialize the corpus' LSH band-key table (id, band, band_key) —
    the stored state that makes near-dup detection INCREMENTAL. Corpora
    are never re-hashed at 100 TB: each text is shingle-hashed once, at
    ingest, and every later batch probes/extends this table (~tens of
    bytes per document) instead of rescanning bodies. The near-dup twin
    of ``incremental_exact_dedup``'s digest index and
    ``append_to_lsh_index``'s layout."""
    (
        _banded_keys(df, text_col, id_col, num_hashes, n, bands,
                     rows_per_band, kernel)
        .repartition("band")
        .write.mode("overwrite").partitionBy("band").parquet(path)
    )


def append_to_minhash_band_table(
    new_docs: DataFrame, path: str, text_col: str = "text",
    id_col: str = "doc_id", num_hashes: int = 16, n: int = 3,
    bands: int = 4, rows_per_band: int = 4, kernel: str = "md5",
) -> None:
    """Add a batch's band keys to the stored table — O(batch), appends
    files only under the batch's band partitions."""
    (
        _banded_keys(new_docs, text_col, id_col, num_hashes, n, bands,
                     rows_per_band, kernel)
        .repartition("band")
        .write.mode("append").partitionBy("band").parquet(path)
    )


def incremental_near_dup_pairs(
    spark, new_docs: DataFrame, path: str, text_col: str = "text",
    id_col: str = "doc_id", num_hashes: int = 16, n: int = 3,
    bands: int = 4, rows_per_band: int = 4, kernel: str = "md5",
) -> DataFrame:
    """Candidate near-dup pairs INVOLVING a new batch: batch × stored
    corpus plus batch-internal, without re-hashing anything already in
    the band table. Probe BEFORE appending the batch (then call
    ``append_to_minhash_band_table``). Output: (id_a, id_b), id_a <
    id_b, distinct — together with the pairs found when earlier batches
    were ingested, this equals a full-corpus ``minhash_band_pairs_
    rowwise`` run (parity-tested).

    Scale: the join shuffles band KEYS (id + ~40-byte key), never
    documents; the 100 TB of text is only ever hashed once, at its own
    ingest. The stored-side key shuffle per ingest is the remaining
    cost — a bucketed-table layout on band_key removes it for serving
    deployments."""
    new_banded = shared_persist(_banded_keys(
        new_docs, text_col, id_col, num_hashes, n, bands, rows_per_band,
        kernel,
    ))
    stored = spark.read.parquet(path)
    vs_stored = (
        new_banded.select(F.col(id_col).alias("id_a"), "band", "band_key")
        .join(
            stored.select(F.col(id_col).alias("id_b"), "band", "band_key"),
            ["band", "band_key"],
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
    )
    a = new_banded.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = new_banded.select(F.col(id_col).alias("id_b"), "band", "band_key")
    in_batch = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return vs_stored.unionByName(in_batch).distinct()


def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """32-bit SimHash: per bit, majority vote of token hashes; bit set
    when strictly more tokens have it set than clear."""
    toks = F.array_distinct(F.split(F.col(text_col), " "))
    tokens = df.select(F.col(id_col), F.explode(toks).alias("tok"))
    hashed = tokens.select(
        F.col(id_col), content_hash32(F.col("tok")).alias("_h")
    ).select(
        F.col(id_col), "_h",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("bit"),
    )
    votes = hashed.select(
        F.col(id_col), "bit",
        # shiftright/shiftleft builtins take literal shift counts only;
        # the SQL forms accept column expressions.
        (F.expr("shiftright(_h, bit)").bitwiseAND(F.lit(1)) * 2 - 1)
        .alias("vote"),
    ).groupBy(id_col, "bit").agg(F.sum("vote").alias("tally"))
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("tally") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
            .otherwise(F.lit(0))
        ).alias("simhash")
    )


def ngram_jaccard_pairs(
    shingles: DataFrame, id_col: str, threshold: float = 0.2
) -> DataFrame:
    """Exact Jaccard over distinct shingle sets (the ground truth for the
    approximate paths): self-join on shingle → |A∩B| / (|A|+|B|-|A∩B|).
    Quadratic blow-up on hot shingles — at scale run it on LSH candidates
    (minhash_band_pairs), not the full corpus.

    The shingle table is persisted: it feeds BOTH self-join sides and
    the per-doc size agg, and Catalyst plans the three as independent
    subtrees — without persist the shingle explode (+ its source scan)
    runs three times."""
    shingles = shared_persist(shingles)
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    b = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def near_dup_candidate_recall(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.05,
    num_hashes: int = 16,
    n: int = 3,
    parallelism: int | None = None,
    kernel: str = "md5",
) -> DataFrame:
    """Candidate-generation quality for the banded-MinHash path (round
    6 — the dedup twin of similarity.ann_recall): exact n-gram Jaccard
    pairs at ``threshold`` are the ground truth; the banded pairs are
    the candidates; output is ONE row (n_true, n_candidates, n_hit,
    recall, precision). This is the tuning metric for
    bands/rows-per-band/num_hashes — at 100 TB you measure it on a
    sampled slice before committing a configuration to the full corpus.

    All three inputs are existing oracled operators; the metric adds
    two count-aggs and one pair equi-join — nothing beyond the pair
    lists ever shuffles."""
    truth = ngram_jaccard_pairs(
        token_shingles(docs, text_col, id_col, n), id_col, threshold
    ).select("id_a", "id_b")
    cand = minhash_band_pairs_rowwise(
        docs, text_col, id_col, num_hashes,
        parallelism=parallelism, kernel=kernel,
    )
    truth = shared_persist(truth)
    cand = shared_persist(cand)
    hit = truth.join(cand, ["id_a", "id_b"])
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_hit = hit.agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_true.crossJoin(n_cand).crossJoin(n_hit)
        .select(
            "n_true", "n_candidates", "n_hit",
            F.round(
                F.when(F.col("n_true") > 0,
                       F.col("n_hit") / F.col("n_true")).otherwise(1.0),
                6,
            ).alias("recall"),
            F.round(
                F.when(F.col("n_candidates") > 0,
                       F.col("n_hit") / F.col("n_candidates"))
                .otherwise(1.0),
                6,
            ).alias("precision"),
        )
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup candidate pairs with Hamming verification
    (round 6 — the text twin of the image hash dedup family): the
    32-bit simhash splits into ``bands`` equal bit-chunks; documents
    sharing ANY chunk become candidates (equi join on (band, chunk) —
    never all-pairs), then the exact Hamming distance filters to
    ``<= max_hamming``. Pigeonhole guarantee: with 4 bands of 8 bits,
    every pair within Hamming distance 3 shares at least one band —
    recall is exactly 1.0 for the advertised radius (tested). Output:
    (id_a, id_b, hamming).

    Scale shape: per doc, ``bands`` tiny band rows shuffle; the
    verification join moves only (id, simhash) pairs for candidates.
    """
    if 32 % bands:
        raise ValueError("simhash_near_dup_pairs: bands must divide 32")
    width = 32 // bands
    sigs = shared_persist(simhash_signatures(docs, text_col, id_col))
    banded = sigs.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1)).alias("chunk"),
            )
            for b in range(bands)
        ])).alias("_bc"),
    ).select(id_col, "_bc.band", "_bc.chunk")
    cand = (
        banded.alias("x").join(
            banded.alias("y"), ["band", "chunk"]
        )
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    sa = sigs.select(F.col(id_col).alias("id_a"),
                     F.col("simhash").alias("_ha"))
    sb = sigs.select(F.col(id_col).alias("id_b"),
                     F.col("simhash").alias("_hb"))
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "hamming",
            F.bit_count(F.expr("_ha").bitwiseXOR(F.expr("_hb"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )
