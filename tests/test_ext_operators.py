"""Property tests for the E1/E2/E4 approximate and UDF operators — the
oracle parity suite covers exact values; these cover the semantic
guarantees (recall, exactness of the vectorized kernel, stub plumbing)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from drugbankner_spark.operators import dedup as D  # noqa: E402
from drugbankner_spark.operators import multimodal as MM  # noqa: E402
from drugbankner_spark.operators import similarity as SIM  # noqa: E402
from drugbankner_spark.tables import load_table  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_minhash_finds_planted_near_dups(spark):
    # Plant three documents: A, a 1-token edit of A (near-dup), and an
    # unrelated doc. The banded MinHash must pair the near-dups and must
    # not pair the unrelated one.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    near = base.replace("theta", "thetaX", 1)
    other = "one two three four five six seven eight nine ten " * 5
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], ["doc_id", "text"]
    )
    sh = D.token_shingles(docs, "text", "doc_id", n=3)
    sigs = D.minhash_signatures(sh, "doc_id", 16)
    pairs = {(r["id_a"], r["id_b"]) for r in
             D.minhash_band_pairs(sigs, "doc_id").collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_xxhash_kernel_identical_recall_on_planted_pairs(spark):
    # The production (xxhash64) and oracle (md5) shingle hashes must
    # find the same planted near-dup pairs and reject the same
    # unrelated ones: both are uniform 32-bit families, only cost
    # differs (VERDICT r01 next-round item #5).
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    near = base.replace("theta", "thetaX", 1)
    other = "one two three four five six seven eight nine ten " * 5
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], ["doc_id", "text"]
    )
    out = {}
    for kernel in ("md5", "xxhash64"):
        out[kernel] = {
            (r["id_a"], r["id_b"])
            for r in D.minhash_band_pairs_rowwise(
                docs, "text", "doc_id", 16, kernel=kernel
            ).collect()
        }
    assert out["md5"] == out["xxhash64"] == {(1, 2)}


def test_exact_dedup_survivor_is_deterministic(spark):
    # Same duplicate groups presented in two different partition layouts
    # must yield the SAME survivor rows (round 1's dropDuplicates kept an
    # arbitrary first-seen row).
    rows = [
        ("k1", 5, "e"), ("k1", 2, "b"), ("k1", 2, "a"),
        ("k2", 9, "z"), ("k2", 1, "q"),
    ]
    a = spark.createDataFrame(rows, ["k", "rank", "val"])
    b = spark.createDataFrame(list(reversed(rows)), ["k", "rank", "val"]).repartition(7)
    pick = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    got_a = pick(D.exact_dedup(a, ["k"]))
    got_b = pick(D.exact_dedup(b, ["k"]))
    assert got_a == got_b == [("k1", 2, "a"), ("k2", 1, "q")]
    # explicit order_cols: survivor minimal by val, not rank
    got_c = pick(D.exact_dedup(a, ["k"], order_cols=["val"]))
    assert got_c == [("k1", 2, "a"), ("k2", 1, "q")]


def test_exact_jaccard_confirms_candidates(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    near = base.replace("theta", "thetaX", 1)
    docs = spark.createDataFrame([(1, base), (2, near)], ["doc_id", "text"])
    sh = D.token_shingles(docs, "text", "doc_id", n=3)
    rows = D.ngram_jaccard_pairs(sh, "doc_id", threshold=0.5).collect()
    assert len(rows) == 1 and rows[0]["jaccard"] > 0.5


def test_simhash_close_for_near_dups(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    near = base.replace("theta", "thetaX", 1)
    other = "one two three four five six seven eight nine ten " * 5
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], ["doc_id", "text"]
    )
    sig = {r["doc_id"]: r["simhash"] for r in
           D.simhash_signatures(docs, "text", "doc_id").collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sig[1], sig[2]) < ham(sig[1], sig[3])


def test_pandas_kernel_matches_codegen_topk(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(emb, queries, k=5).collect()
    kernel = SIM.cosine_topk_pandas(emb, queries.toPandas(), k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    a = {key(r): (r["neighbor_id"], r["cos_sim"]) for r in exact}
    b = {key(r): (r["neighbor_id"], r["cos_sim"]) for r in kernel}
    assert a == b


def test_pandas_topk_rounds_before_batch_cut(spark):
    # Three candidates whose unrounded sims differ by <5e-7 (so they TIE
    # after round(...,6)): the batch-stage cut must already use the
    # (rounded desc, id asc) order, else the smallest-id candidate —
    # the correct winner — is dropped before the final window sees it
    # (ADVICE r01, low).
    import math

    import pandas as pd

    def vec(s):  # unit vector with exact cosine s against [1, 0]
        return [s, math.sqrt(1.0 - s * s)]

    corpus = spark.createDataFrame(
        [(2, vec(0.89999991)), (7, vec(0.89999994)), (9, vec(0.89999997))],
        ["vec_id", "embedding"],
    ).repartition(1)
    queries = pd.DataFrame({"vec_id": [100], "embedding": [vec(1.0)]})
    got = SIM.cosine_topk_pandas(corpus, queries, k=1).collect()
    assert len(got) == 1
    assert got[0]["neighbor_id"] == 2 and got[0]["cos_sim"] == 0.9


def test_lsh_topk_is_subset_of_exact_scores(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact_all = SIM.cosine_topk(emb, queries, k=10_000).collect()
    truth = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact_all}
    lsh = SIM.lsh_topk(emb, queries, k=5, num_planes=8, dim=64).collect()
    assert lsh, "LSH returned no candidates"
    for r in lsh:
        assert truth[(r["query_id"], r["neighbor_id"])] == r["cos_sim"]


def test_banded_lsh_recall_beats_single_band(spark):
    # Band stacking: candidates from ANY of B bands. Recall vs exact
    # top-k must be >= the single-band recall on the same fixture (and
    # every returned score must be exact — re-ranked, not approximated).
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.cosine_topk(emb, queries, k=5).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.lsh_topk(emb, queries, k=5, num_planes=8, dim=64).collect()
    }
    banded = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.lsh_topk_banded(
            emb, queries, k=5, planes_per_band=8, bands=4, dim=64
        ).collect()
    }
    # fixture vectors are near-random (max pairwise cos ≈0.5), so absolute
    # recall is low for ANY LSH here; the stacking property still holds
    assert len(banded & exact) >= len(single & exact)
    # planted TRUE near-neighbors (cos ≈ 0.999): band-stacked LSH must
    # find them — this is the production regime (near-dup retrieval)
    import random

    rng = random.Random(11)
    base = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(5)]
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v))                                   # query
        rows.append((100 + i, [x + rng.gauss(0, 0.02) for x in v]))  # near
    for j in range(200, 260):                                 # distractors
        rows.append((j, [rng.gauss(0, 1) for _ in range(64)]))
    planted = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.lsh_topk_banded(
            planted, planted.filter(F.col("vec_id") < 5), k=1,
            planes_per_band=8, bands=4, dim=64,
        ).collect()
    }
    hits = sum((i, 100 + i) in got for i in range(5))
    assert hits >= 4, got


def test_ivf_kmeans_matches_fixed_centroid_contract(spark):
    # Learned-centroid IVF: same serving plan, deterministic under a
    # fixed seed, k rows per query, scores exact (subset of brute-force
    # scores).
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    got = SIM.ivf_topk_kmeans(
        emb, queries, k=5, n_centroids=8, n_probe=3, seed=7
    ).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(len(v) == 5 for v in per_q.values())
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in SIM.cosine_topk(emb, queries, k=len(emb.collect())).collect()
    }
    for r in got:
        assert exact[(r["query_id"], r["neighbor_id"])] == r["cos_sim"]


def test_embedding_near_dup_finds_planted_pair(spark):
    # Plant a true near-duplicate embedding (tiny perturbation): the LSH
    # bucket join + cosine threshold must recover exactly that pair.
    base = load_table(spark, SF, "embeddings").limit(20)
    dup = base.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * 1.000001).cast("float")
        ).alias("embedding"),
        "label",
    )
    corpus = base.unionByName(dup)
    pairs = SIM.embedding_near_dup_pairs(corpus, threshold=0.99).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 100000)}
    assert pairs[0]["cos_sim"] >= 0.999


def test_multimodal_stub_paths(spark):
    docs = load_table(spark, SF, "documents").limit(10)
    media = MM.documents_as_media(docs)
    feats = MM.decode_media(media, fake=True).collect()
    assert len(feats) == 10 and all(len(r["feature"]) == 8 for r in feats)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        MM.decode_media(media, fake=False).collect()


def test_multimodal_resize_shape(spark):
    docs = load_table(spark, SF, "documents").limit(10)
    media = MM.documents_as_media(docs)
    out = MM.resize_images(media, width=8, height=4, fake=True).collect()
    assert len(out) == 10
    assert all(len(bytes(r["payload"])) == 32 for r in out)
    assert all((r["width"], r["height"]) == (8, 4) for r in out)
    # deterministic: same input → same bytes
    again = MM.resize_images(media, width=8, height=4, fake=True).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in out} == \
           {r["media_id"]: bytes(r["payload"]) for r in again}
    with pytest.raises(Exception, match="NotImplementedError|resize"):
        MM.resize_images(media, fake=False).collect()


def test_multimodal_frame_fanout(spark):
    docs = load_table(spark, SF, "documents").limit(5)
    media = MM.documents_as_media(docs)
    frames = MM.sample_frames(media, n_frames=4, fake=True).collect()
    assert len(frames) == 20  # 1 -> N fan-out
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append((r["frame_idx"], r["frame_ts_ms"]))
    assert all(sorted(v) == [(0, 0), (1, 1000), (2, 2000), (3, 3000)]
               for v in per.values())
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg|frame"):
        MM.sample_frames(media, fake=False).collect()


def test_aho_corasick_fuzz_vs_brute_force():
    import random

    from drugbankner_spark.operators.textanalysis import _aho_corasick

    def match(text, terms):
        goto, fail, out = _aho_corasick(terms)
        s, res = 0, []
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            for t in out[s]:
                res.append((t, i - len(t) + 1))
        return sorted(res)

    def brute(text, terms):
        return sorted(
            (t, i)
            for t in terms
            for i in range(len(text) - len(t) + 1)
            if text[i:i + len(t)] == t
        )

    rng = random.Random(2)
    for _ in range(300):
        text = "".join(rng.choice("abc") for _ in range(rng.randrange(60)))
        terms = list({
            "".join(rng.choice("abc") for _ in range(rng.randrange(1, 5)))
            for _ in range(rng.randrange(1, 6))
        })
        assert match(text, terms) == brute(text, terms), (text, terms)


def test_dictionary_tagging_overlaps_and_offsets(spark):
    import pytest as _pytest

    from drugbankner_spark.operators.textanalysis import (
        tag_dictionary_terms,
    )

    docs = spark.createDataFrame(
        [(1, "sparkspark ark"), (2, "no hits here"), (3, "")],
        ["doc_id", "text"],
    )
    rows = sorted(
        (r["doc_id"], r["term"], r["start"])
        for r in tag_dictionary_terms(docs, ["spark", "ark"]).collect()
    )
    # 'ark' fires INSIDE both 'spark's (suffix via fail links) and standalone
    assert rows == [
        (1, "ark", 2), (1, "ark", 7), (1, "ark", 11),
        (1, "spark", 0), (1, "spark", 5),
    ]
    with _pytest.raises(ValueError, match="non-empty"):
        tag_dictionary_terms(docs, [])


def test_word_lm_backoff_ordering(spark):
    from drugbankner_spark.operators.textanalysis import (
        train_word_lm,
        word_lm_logprob,
    )

    train = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ran on the mat")],
        ["doc_id", "text"],
    )
    model = train_word_lm(train)
    probes = spark.createDataFrame(
        [
            (10, "the cat sat"),     # all bigrams seen
            (11, "cat the sat"),     # seen words, unseen bigrams
            (12, "zz qq ww"),        # unseen words: 0.5/N floor
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["mean_logprob"]
           for r in word_lm_logprob(probes, model).collect()}
    assert out[10] > out[11] > out[12]
    # deterministic bigram count: n_tokens - 1
    n = {r["doc_id"]: r["n_bigrams"]
         for r in word_lm_logprob(probes, model).collect()}
    assert n == {10: 2, 11: 2, 12: 2}


def test_cluster_embeddings_and_balanced_sample(spark):
    import random

    from drugbankner_spark.operators.sampling import cluster_balanced_sample
    from drugbankner_spark.operators.similarity import cluster_embeddings

    rng = random.Random(3)
    blobs = {0: [10.0, 0.0, 0.0], 1: [0.0, 10.0, 0.0], 2: [0.0, 0.0, 10.0]}
    rows = []
    sizes = {0: 40, 1: 25, 2: 6}  # deliberately imbalanced
    vid = 0
    for b, n in sizes.items():
        for _ in range(n):
            vec = [c + rng.uniform(-0.5, 0.5) for c in blobs[b]]
            rows.append((vid, b, vec))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, true_blob int, embedding array<double>"
    )
    assigned = cluster_embeddings(
        df, n_clusters=3, train_fraction=1.0
    ).join(df.select("vec_id", "true_blob"), "vec_id")
    # each learned cluster maps 1:1 onto one planted blob
    purity = assigned.groupBy("true_blob").agg(
        F.count_distinct("cluster").alias("k")
    ).collect()
    assert all(r["k"] == 1 for r in purity)
    assert assigned.select("cluster").distinct().count() == 3

    bal = cluster_balanced_sample(assigned, per_cluster=10)
    counts = {r["cluster"]: r["n"] for r in
              bal.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    # quota caps the big clusters at 10; the 6-member cluster keeps all 6
    assert sorted(counts.values()) == [6, 10, 10]
    # deterministic across partitionings
    again = cluster_balanced_sample(assigned.repartition(9), per_cluster=10)
    assert {r["vec_id"] for r in bal.collect()} == \
           {r["vec_id"] for r in again.collect()}


def test_normalize_unicode_goldens(spark):
    from drugbankner_spark.operators.textanalysis import normalize_unicode

    rows = [
        (1, "éclair"),          # decomposed é → composes to 6 chars
        (2, "café"),             # already NFC → unchanged
        (3, "a\x07b\x00c ok"),        # control chars scrubbed
        (4, None),                     # NULL passes through
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in normalize_unicode(df).collect()}
    assert out[1]["text_norm"] == "éclair"
    assert (out[1]["n_chars_before"], out[1]["n_chars_after"]) == (7, 6)
    assert out[2]["text_norm"] == "café"
    assert out[3]["text_norm"] == "abc ok"
    assert out[4]["text_norm"] is None
    # NFKC folds compatibility forms (ﬁ ligature → fi)
    nfkc = normalize_unicode(
        spark.createDataFrame([(1, "\ufb01n")], "doc_id long, text string"),
        form="NFKC",
    ).collect()[0]
    assert nfkc["text_norm"] == "fin"
    with pytest.raises(ValueError, match="unknown form"):
        normalize_unicode(df, form="NFX")


def test_ppl_buckets_split_and_gibberish_tail(spark):
    from drugbankner_spark.operators.textanalysis import (
        char_lm_logprob,
        ppl_buckets,
        train_char_lm,
    )

    docs = load_table(spark, SF, "documents").limit(60)
    gib = spark.createDataFrame(
        [(99901, "qxzj wvqk zzxq jjqx vvzz " * 6)], ["doc_id", "text"]
    )
    corpus = docs.select("doc_id", "text").unionByName(gib)
    model = train_char_lm(corpus)
    out = ppl_buckets(char_lm_logprob(corpus, model)).collect()
    buckets = {r["doc_id"]: r["bucket"] for r in out}
    assert buckets[99901] == "tail"  # gibberish scores out-of-domain
    shares = {b: sum(1 for v in buckets.values() if v == b)
              for b in ("head", "middle", "tail")}
    # threshold terciles: each bucket holds roughly a third (ties drift)
    assert all(61 // 5 <= n <= 61 * 3 // 5 for n in shares.values()), shares


def test_bm25_ranks_planted_relevance(spark):
    from drugbankner_spark.operators.textanalysis import bm25_topk

    filler = "lorem ipsum dolor sit amet " * 4
    docs = spark.createDataFrame(
        [
            (1, "needle needle needle " + filler),   # 3 hits
            (2, "needle " + filler),                 # 1 hit
            (3, "needle common common " + filler),   # 1 hit + common term
            (4, filler),                             # no hits
            (5, "common " + filler),                 # only the common term
            (6, "common " + filler),
            (7, "common " + filler),
        ],
        ["doc_id", "text"],
    )
    out = bm25_topk(docs, ["needle", "common"], k=5).collect()
    ids = [r["doc_id"] for r in out]
    assert 4 not in ids                     # no query term → no row
    # two-term match beats one term repeated: k1 saturates tf, so doc 3
    # (rare + common) outranks doc 1's tf=3 on the rare term alone
    assert ids[:2] == [3, 1]
    # rare 'needle' idf > common 'common' idf: doc 2 beats doc 5
    assert ids.index(2) < ids.index(5)
    hits = {r["doc_id"]: r["n_query_terms_hit"] for r in out}
    assert hits[3] == 2 and hits[1] == 1
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(docs, [])


def test_sample_frames_mp3_segments(spark):
    from drugbankner_spark.functions import mp3_codec as mp3

    payload = mp3.encode_mp3(n_frames=12, id3v1=True)
    media = spark.createDataFrame(
        [(1, bytearray(payload), "audio/mpeg", len(payload))],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    segs = MM.sample_frames(media, n_frames=3, fake=False).collect()
    assert len(segs) == 3
    # each emitted segment re-parses as a standalone MPEG stream and the
    # full frame count is conserved across segments
    per_seg = [mp3.mp3_info(bytes(r["frame_payload"])) for r in segs]
    assert all(s["valid"] for s in per_seg)
    assert sum(s["n_frames"] for s in per_seg) == 12


def test_container_metadata_all_formats(spark):
    # one payload per real container format + one unknown blob; the
    # probe must classify each and extract header-grade fields without
    # any decode errors (unknowns bin as 'unknown', never raise)
    from drugbankner_spark.functions import avi_codec as avi
    from drugbankner_spark.functions import jpeg_codec as jpeg
    from drugbankner_spark.functions import mp3_codec as mp3
    from drugbankner_spark.functions import mp4_codec as mp4
    from drugbankner_spark.functions import png_codec as png
    from drugbankner_spark.functions import wav_codec as wav

    jpg = jpeg.encode_jpeg(bytes(16 * 8 * 3), 16, 8, 3)
    payloads = [
        (1, png.encode_png(bytes(12 * 5 * 3), 12, 5, 3)),
        (2, jpg),
        (3, wav.encode_wav([0.0] * 8000, sample_rate=16000)),
        (4, avi.encode_avi([jpg, jpg, jpg], 16, 8, fps=10)),
        (5, mp3.encode_mp3(n_frames=10, id3v1=True)),
        (6, mp4.encode_mp4(duration_ms=2000, width=640, height=360)),
        (7, b"\x00\x01\x02not-a-container" * 10),
    ]
    media = spark.createDataFrame(
        [(i, bytearray(p), "application/octet-stream", len(p))
         for i, p in payloads],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    rows = {r["media_id"]: r for r in MM.container_metadata(media).collect()}
    assert rows[1]["format"] == "png"
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (12, 5, 3)
    assert rows[2]["format"] == "jpeg"
    assert (rows[2]["width"], rows[2]["height"], rows[2]["channels"]) == (16, 8, 3)
    assert rows[3]["format"] == "wav"
    assert rows[3]["sample_rate"] == 16000 and rows[3]["duration_ms"] == 500
    assert rows[4]["format"] == "avi"
    assert rows[4]["n_frames"] == 3 and rows[4]["duration_ms"] == 300
    assert rows[5]["format"] == "mp3"
    assert rows[5]["duration_ms"] == round(10 * 1152 / 44100 * 1000)
    assert rows[5]["bitrate_kbps"] == 128 and not rows[5]["vbr"]
    assert rows[6]["format"] == "mp4"
    assert rows[6]["duration_ms"] == 2000 and rows[6]["codec"] == "avc1"
    assert (rows[6]["width"], rows[6]["height"]) == (640, 360)
    assert rows[7]["format"] == "unknown" and rows[7]["duration_ms"] == 0


def test_container_metadata_bins_corrupt_files(spark):
    from drugbankner_spark.functions import gif_codec as gif

    # valid GIF magic, garbage body: the probe must bin it as
    # 'corrupt', not die (the crawl reality)
    corrupt_gif = b"GIF89a" + bytes(30)
    ok = gif.encode_gif([[0, 1, 2, 3]], 4, 1,
                        bytes([0, 0, 0, 255, 255, 255, 9, 9, 9, 1, 2, 3]))
    media = spark.createDataFrame(
        [(1, bytearray(corrupt_gif), "image/gif", len(corrupt_gif)),
         (2, bytearray(ok), "image/gif", len(ok))],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    rows = {r["media_id"]: r["format"]
            for r in MM.container_metadata(media).collect()}
    assert rows == {1: "corrupt", 2: "gif"}


def test_gopher_filter_flags(spark):
    from drugbankner_spark.operators.textanalysis import gopher_quality_filter

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a lazy dog near the bank "
                "and then runs off to the distant hills again today ok"),
            (2, "short text only"),                          # too few tokens
            (3, " ".join(["word"] * 30)),                    # repetitive, no stopword
            (4, " ".join(["the"] + ["12345"] * 29)),         # digit-heavy
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in
           gopher_quality_filter(docs, min_tokens=10).collect()}
    assert out[1]["keep"] is True
    assert out[2]["len_ok"] is False and out[2]["keep"] is False
    assert out[3]["repetition_ok"] is False
    assert out[3]["stopword_ok"] is False and out[3]["keep"] is False
    assert out[4]["digit_ratio_ok"] is False and out[4]["keep"] is False


def test_clean_corpus_dedups_then_filters(spark):
    from drugbankner_spark.operators.corpus import clean_corpus

    good = ("the quick brown fox jumps over a lazy dog near the river "
            "bank and then runs away to the distant green hills again")
    docs = spark.createDataFrame(
        [
            (10, good),                  # cluster canonical (kept)
            (11, good + " extra"),       # same cluster (pair below)
            (20, "tiny doc"),            # singleton, fails length rule
            (30, good + " another variant of the same passage here"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(10, 11), (11, 30)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r.asDict()
           for r in clean_corpus(docs, pairs, min_tokens=10).collect()}
    # one surviving canonical per cluster; the 3-doc cluster keeps id 10
    assert set(out) == {10}
    assert out[10]["cluster_size"] == 3


def test_hash_sample_deterministic_and_partition_invariant(spark):
    from drugbankner_spark.operators.sampling import hash_sample

    ev = load_table(spark, SF, "events")
    a = {r["event_id"] for r in hash_sample(ev, "event_id", 0.2).collect()}
    b = {r["event_id"] for r in
         hash_sample(ev.repartition(13), "event_id", 0.2).collect()}
    assert a == b and len(a) > 0
    # ~20% within loose tolerance (hash uniformity, n=1000)
    assert 0.1 < len(a) / ev.count() < 0.3
    # different seed -> different (roughly independent) sample
    c = {r["event_id"] for r in
         hash_sample(ev, "event_id", 0.2, seed="s2").collect()}
    assert c != a


def test_hash_split_disjoint_complete_and_stable(spark):
    import pytest as _pytest

    from drugbankner_spark.operators.sampling import hash_split

    docs = load_table(spark, SF, "documents")
    w = {"train": 0.8, "valid": 0.1, "test": 0.1}
    out = hash_split(docs, "doc_id", w)
    rows = out.select("doc_id", "split").collect()
    assert len(rows) == docs.count()              # complete, no dup rows
    assignment = {r["doc_id"]: r["split"] for r in rows}
    again = {r["doc_id"]: r["split"]
             for r in hash_split(docs.repartition(7), "doc_id", w)
             .select("doc_id", "split").collect()}
    assert assignment == again                    # stable under repartition
    assert set(assignment.values()) == {"train", "valid", "test"}
    with _pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", {"train": 0.5, "test": 0.1})


def test_stratified_sample_exact_fraction_and_determinism(spark):
    # ADVICE r03: the exact-fraction-per-stratum and determinism claims
    # were untested. Per stratum: EXACTLY ceil(n * fraction) survivors;
    # identical sample under repartition; a different seed moves it.
    import math

    from drugbankner_spark.operators.sampling import stratified_sample

    docs = load_table(spark, SF, "documents")
    frac = 0.2
    per_stratum = {r["lang"]: r["n"] for r in
                   docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    out = stratified_sample(docs, ["lang"], "doc_id", frac)
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {
        lang: math.ceil(n * frac) for lang, n in per_stratum.items()
    }
    a = {r["doc_id"] for r in out.select("doc_id").collect()}
    b = {r["doc_id"] for r in
         stratified_sample(docs.repartition(13), ["lang"], "doc_id", frac)
         .select("doc_id").collect()}
    assert a == b                                  # repartition-invariant
    c = {r["doc_id"] for r in
         stratified_sample(docs, ["lang"], "doc_id", frac, seed="s2")
         .select("doc_id").collect()}
    assert c != a and len(c) == len(a)             # seed moves, size holds


def test_redact_pii_planted_fixtures(spark):
    from drugbankner_spark.operators import textanalysis as TA

    docs = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@example.org or bob@sub.host.io now"),
            (2, "server 10.0.255.3 called 192.168.1.1 and phone 555-867-5309"),
            (3, "nothing sensitive here, just 1234 and a.b words"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in TA.redact_pii(docs).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (2, 0, 0)
    assert out[1]["redacted_text"] == "mail me at <EMAIL> or <EMAIL> now"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 2, 1)
    assert out[2]["redacted_text"] == (
        "server <IPV4> called <IPV4> and phone <PHONE>"
    )
    assert out[3]["redacted_text"] == docs.filter("doc_id = 3").first()["text"]


def test_repetition_stats_known_fractions(spark):
    from drugbankner_spark.operators import textanalysis as TA

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # bigrams: ab,ba,ab,ba,ab -> 5 total, 2 distinct
            (2, "w x y z"),       # all bigrams distinct
            (3, "solo"),          # no bigrams -> excluded
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in TA.repetition_stats(docs).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_bigrams"] == 5
    assert abs(out[1]["dup_bigram_frac"] - (1 - 2 / 5)) < 1e-9
    # trigrams of doc1: aba,bab,aba,bab -> 4 total, 2 distinct
    assert abs(out[1]["dup_trigram_frac"] - 0.5) < 1e-9
    assert out[2]["dup_bigram_frac"] == 0.0


def test_repetition_stats_no_shuffle(spark):
    """The scale contract: repetition metrics are pure per-row array
    expressions — the plan must contain NO exchange."""
    from drugbankner_spark.operators import textanalysis as TA
    from drugbankner_spark.plans import explain as X
    from drugbankner_spark.tables import load_table

    df = TA.repetition_stats(load_table(spark, "/root/testdata/sf0.001", "documents"))
    assert X.count_shuffles(df) == 0, X.plan_string(df, "simple")


def test_incremental_exact_dedup_both_paths(spark):
    """Anti-join drops content already in the corpus; within-batch dups
    collapse to the min-id survivor; genuinely new content passes."""
    from drugbankner_spark.operators import dedup as D

    corpus = spark.createDataFrame(
        [(1, "old news"), (2, "ancient text")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (10, "old news"),      # already in corpus -> dropped
            (11, "fresh stuff"),   # new, duplicated in-batch -> min id wins
            (12, "fresh stuff"),
            (13, "also new"),      # new, unique -> kept
        ],
        ["doc_id", "text"],
    )
    out = sorted(
        (r["doc_id"], r["text"])
        for r in D.incremental_exact_dedup(batch, corpus).collect()
    )
    assert out == [(11, "fresh stuff"), (13, "also new")]


def test_chunk_documents_windows_and_overlap(spark):
    from drugbankner_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
         (2, "solo"),
         (3, "")],
        ["doc_id", "text"],
    )
    rows = {
        (r["doc_id"], r["chunk_index"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(docs, chunk_tokens=4, overlap=2).collect()
    }
    # step = 2: windows at 0,2,4,6,8 — consecutive chunks share 2 tokens
    assert rows[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert rows[(1, 1)] == ("t2 t3 t4 t5", 4)
    assert rows[(1, 4)] == ("t8 t9", 2)       # short tail window
    assert rows[(2, 0)] == ("solo", 1)        # sub-window doc: one chunk
    assert rows[(3, 0)] == ("", 1)            # empty doc: one empty chunk
    assert len(rows) == 7
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_chunk_documents_is_shuffle_free(spark):
    from drugbankner_spark.operators.corpus import chunk_documents
    from drugbankner_spark.plans import explain as X

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    assert X.count_shuffles(chunk_documents(docs)) == 0


def test_decontaminate_flags_shared_ngrams(spark):
    from drugbankner_spark.operators.corpus import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            # contains the benchmark 8-gram verbatim -> contaminated
            (1, "prefix words the quick brown fox jumps over the lazy dog"),
            # shares tokens but never 8 in a row -> clean
            (2, "the quick brown cat sits under the lazy dog tonight"),
            (3, "entirely unrelated text with no overlap at all here"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["contaminated"], r["n_overlapping"])
           for r in decontaminate(train, bench, n=8).collect()}
    assert got[1][0] is True and got[1][1] > 0
    assert got[2] == (False, 0)
    assert got[3] == (False, 0)


def test_hll_sketches_merge_to_global_distinct(spark):
    # the incremental pattern: per-day sketches union to the global
    # distinct count WITHOUT rescanning events; estimates within HLL's
    # lgK=12 error envelope (±~1.6%, assert 5% for slack)
    from drugbankner_spark.operators.sketches import (
        hll_group_sketches,
        hll_rollup,
    )

    ev = load_table(spark, SF, "events").withColumn(
        "day", F.to_date("ts")
    )
    exact = ev.select("user_id").distinct().count()
    daily = hll_group_sketches(ev, ["day"], "user_id")
    est = hll_rollup(daily).collect()[0]["approx_distinct"]
    assert abs(est - exact) / exact < 0.05
    # rollup is associative: unioning day-sketches grouped by week first
    # gives the same global state
    weekly = hll_rollup(
        daily.withColumn("week", F.weekofyear("day")), ["week"]
    )
    # re-sketch the weekly ESTIMATES is wrong; instead union all daily
    # sketches directly at a coarser grouping and compare global answers
    est2 = hll_rollup(
        hll_group_sketches(ev, ["day", "event_type"], "user_id")
    ).collect()[0]["approx_distinct"]
    assert est2 == est  # register-wise max is grouping-invariant
    assert weekly.count() > 0


def test_kll_quantiles_close_to_exact(spark):
    from drugbankner_spark.operators.sketches import kll_quantile_profile

    ev = load_table(spark, SF, "events")
    exact = ev.selectExpr(
        "percentile(value, array(0.1, 0.5, 0.9)) AS p"
    ).collect()[0]["p"]
    row = kll_quantile_profile(ev, "value", [0.1, 0.5, 0.9]).collect()[0]
    spread = exact[2] - exact[0]
    for got, want in zip([row["q_10"], row["q_50"], row["q_90"]], exact):
        assert abs(got - want) <= 0.05 * spread + 1e-9
    # grouped form: one row per event_type
    per_type = kll_quantile_profile(
        ev, "value", [0.5], group_cols=["event_type"]
    )
    assert per_type.count() == ev.select("event_type").distinct().count()


def test_theta_distinct_close_to_exact(spark):
    from drugbankner_spark.operators.sketches import theta_distinct

    ev = load_table(spark, SF, "events")
    exact = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    got = {r["event_type"]: r["approx_distinct"] for r in
           theta_distinct(ev, ["event_type"], "user_id").collect()}
    for k, n in exact.items():
        assert abs(got[k] - n) / n < 0.05


def test_incremental_band_table_equals_full_run(spark, tmp_path):
    # ingest docs in two batches through the stored band table; the
    # union of (batch-1-internal pairs, batch-2 incremental pairs) must
    # equal a full-corpus banding — and batch 2 never re-hashes batch 1
    docs = load_table(spark, SF, "documents")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "bands")

    full = {(r["id_a"], r["id_b"]) for r in
            D.minhash_band_pairs_rowwise(docs, "text", "doc_id", 16).collect()}

    p1 = {(r["id_a"], r["id_b"]) for r in
          D.minhash_band_pairs_rowwise(b1, "text", "doc_id", 16).collect()}
    D.build_minhash_band_table(b1, path)
    p2 = {(r["id_a"], r["id_b"]) for r in
          D.incremental_near_dup_pairs(spark, b2, path).collect()}
    D.append_to_minhash_band_table(b2, path)

    assert p1 | p2 == full and len(full) > 0
    # a third, empty-overlap probe against the now-complete table finds
    # every stored pair for a re-presented doc (idempotent re-ingest)
    re_probe = {(r["id_a"], r["id_b"]) for r in
                D.incremental_near_dup_pairs(
                    spark, docs.filter(F.col("doc_id") < 3), path
                ).collect()}
    assert {p for p in full if p[0] < 3 or p[1] < 3} <= re_probe


def test_hashed_tf_vectors_power_similarity_stack(spark):
    # the model-free bridge: text → hashed tf vector → E2 near-dup.
    # A near-dup text pair must score high cosine; unrelated text low —
    # and embedding_near_dup_pairs over the vectors finds exactly the
    # planted pair.
    from drugbankner_spark.operators.textanalysis import hashed_tf_vectors

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    near = base.replace("theta", "thetaX", 1)
    other = "one two three four five six seven eight nine ten " * 5
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], ["doc_id", "text"]
    )
    vecs = hashed_tf_vectors(docs, dim=64).withColumnRenamed(
        "doc_id", "vec_id").withColumnRenamed("vector", "embedding")
    rows = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
    dot = lambda a, b: sum(x * y for x, y in zip(a, b))  # noqa: E731
    assert abs(dot(rows[1], rows[1]) - 1.0) < 1e-9      # L2-normalized
    assert dot(rows[1], rows[2]) > 0.95                  # near-dup
    assert dot(rows[1], rows[3]) < 0.5                   # unrelated

    pairs = {(r["id_a"], r["id_b"]) for r in
             SIM.embedding_near_dup_pairs(
                 vecs, threshold=0.9, num_planes=4
             ).collect()}
    assert pairs == {(1, 2)}


def test_pq_adc_finds_planted_neighbors(spark):
    # PQ compresses 64 floats to 8 codes; ADC ranking must still put a
    # planted near-identical vector first, for both deterministic and
    # LEARNED (sampled Lloyd) codebooks — and the learned fit must give
    # candidates at least as close in ADC distance on its train data.
    import random

    rng = random.Random(23)
    base = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(40)]
    rows = [(i, v) for i, v in enumerate(base)]
    # planted near-dups of vectors 0 and 1 (tiny perturbation)
    rows.append((100, [x + 0.01 for x in base[0]]))
    rows.append((101, [x - 0.01 for x in base[1]]))
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = corpus.filter(F.col("vec_id").isin(0, 1))

    for books in (
        SIM.pq_codebooks(dim=64, m=8, ksub=16),
        SIM.pq_train_codebooks(corpus, m=8, ksub=16, iterations=5),
    ):
        codes = SIM.pq_encode(corpus, books)
        top = {
            r["query_id"]: r["neighbor_id"]
            for r in SIM.pq_adc_topk(codes, queries, books, k=1).collect()
        }
        assert top == {0: 100, 1: 101}


def test_pq_train_codebooks_deterministic(spark):
    emb = load_table(spark, SF, "embeddings")
    a = SIM.pq_train_codebooks(emb, m=4, ksub=8, iterations=3)
    b = SIM.pq_train_codebooks(emb, m=4, ksub=8, iterations=3)
    assert a == b


def test_cluster_safe_split_never_separates_near_dups(spark):
    # round 5: the contamination-proof split — planted near-dup pairs
    # must land in the SAME split; plain hash_split on doc_id would
    # scatter them (the classic benchmark-leakage bug).
    from drugbankner_spark.operators.sampling import cluster_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # three planted cliques: {0,1,2}, {10,11}, {20,21,22,23}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    out = cluster_safe_split(
        docs, pairs, {"train": 0.6, "valid": 0.2, "test": 0.2}
    )
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(rows) == 40  # every doc labeled exactly once
    for clique in [{0, 1, 2}, {10, 11}, {20, 21, 22, 23}]:
        assert len({rows[d] for d in clique}) == 1, clique
    # deterministic across re-evaluation
    again = {r["doc_id"]: r["split"] for r in cluster_safe_split(
        docs, pairs, {"train": 0.6, "valid": 0.2, "test": 0.2}).collect()}
    assert again == rows


def test_mixture_sample_exact_targets_and_extension(spark):
    from drugbankner_spark.operators.sampling import mixture_sample

    docs = spark.createDataFrame(
        [(i, "web" if i < 60 else "code") for i in range(100)],
        "doc_id long, source string",
    )
    out = mixture_sample(docs, "source", "doc_id",
                         {"web": 10, "code": 25})
    counts = {r["source"]: r["cnt"] for r in
              out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {"web": 10, "code": 25}
    # raising a target EXTENDS the previous draw (prefix property)
    small = {r["doc_id"] for r in mixture_sample(
        docs, "source", "doc_id", {"web": 10, "code": 25}).collect()}
    big = {r["doc_id"] for r in mixture_sample(
        docs, "source", "doc_id", {"web": 20, "code": 25}).collect()}
    assert small <= big and len(big) == 45
    # over-target keeps the whole stratum; absent strata are dropped
    all_web = mixture_sample(docs, "source", "doc_id", {"web": 999})
    assert all_web.count() == 60
    assert {r["source"] for r in all_web.collect()} == {"web"}


def test_text_retrieval_index_end_to_end(spark, tmp_path):
    # round 5: the RAG-shape composition — chunk → hash-vectorize →
    # LSH index on disk → text-query probe → hydrated chunks. A query
    # equal to an indexed chunk must come back at rank 1, cos_sim 1.0.
    from drugbankner_spark.operators.retrieval import (
        build_text_index,
        retrieve,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 40),
         (2, "epsilon zeta eta theta " * 40),
         (3, "completely different words here entirely " * 30)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "tidx")
    build_text_index(docs, path, chunk_tokens=32, overlap=8)

    # probe with doc 2's exact opening chunk text
    probe_text = " ".join(("epsilon zeta eta theta " * 40).split()[:32])
    queries = spark.createDataFrame(
        [(100, probe_text)], "query_id long, query_text string"
    )
    out = retrieve(spark, path, queries, k=3).collect()
    assert out, "no hits"
    best = min(out, key=lambda r: r["rank"])
    assert best["doc_id"] == 2
    assert best["cos_sim"] == 1.0
    assert best["chunk_text"] == probe_text
    # every hit hydrates real chunk text and decomposes the chunk id
    for r in out:
        assert r["chunk_text"]
        assert r["doc_id"] in (1, 2, 3) and r["chunk_index"] >= 0


def test_char_lm_separates_gibberish(spark):
    # round 5: the CCNet-style perplexity signal — in-domain text must
    # score a much higher mean char logprob than gibberish under a
    # model trained on clean English.
    from drugbankner_spark.operators.textanalysis import (
        char_lm_logprob,
        train_char_lm,
    )

    corpus = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog and runs home")
         for i in range(5)],
        "doc_id long, text string",
    )
    model = train_char_lm(corpus)
    docs = spark.createDataFrame(
        [(1, "the lazy dog runs over the fox"),
         (2, "zzxqv kkjw qqptx vvbnm wwrty")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["mean_logprob"]
           for r in char_lm_logprob(docs, model).collect()}
    assert out[1] > out[2] + 1.0  # clear separation in log space
    # scoring never shuffles text: only (id, gram) pairs reach the agg
    from drugbankner_spark.plans import explain as X

    plan = X.plan_string(char_lm_logprob(docs, model), "formatted")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_topk_by_hash_core_equals_windowed_reference(spark):
    # round 5: the sort-free top-k core (quantile-grid cuts + boundary
    # band) must select EXACTLY the windowed reference's rows for any
    # fraction/target — including whole-stratum and tiny-strata edges.
    from drugbankner_spark.operators.sampling import (
        _topk_by_hash,
        _topk_by_hash_windowed,
    )
    from drugbankner_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for k_expr in [F.lit(3).cast("long"),
                   F.ceil(F.col("_n") * 0.37).cast("long"),
                   F.lit(10_000).cast("long")]:  # over-ask keeps all
        new = sorted(r["doc_id"] for r in _topk_by_hash(
            docs, ["lang"], "doc_id", k_expr, "", "md5").collect())
        ref = sorted(r["doc_id"] for r in _topk_by_hash_windowed(
            docs, ["lang"], "doc_id", k_expr, "", "md5").collect())
        assert new == ref and len(new) > 0


def test_topk_by_hash_sorts_only_the_boundary_band(spark):
    # the scale contract: no window over whole strata — the plan's only
    # row_number window consumes a FILTERED band, never the raw scan.
    from drugbankner_spark.operators.sampling import stratified_sample
    from drugbankner_spark.plans import explain as X
    from drugbankner_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = X.plan_string(
        stratified_sample(docs, ["lang"], "doc_id", 0.2), "formatted"
    )
    # the window exists (boundary top-up) but its input subtree carries
    # the band predicate on the hash cuts
    assert "row_number" in plan
    assert "_lo_cut" in plan and "_hi_cut" in plan


def test_intradoc_dedup_planted_repeats(spark):
    # round 5: within-doc repeated 8-grams — later spans drop, first
    # stays, overlap handled (a token survives only if NO duplicate
    # span covers it); unique docs pass through byte-identical.
    from drugbankner_spark.operators.corpus import dedup_repeated_ngrams

    docs = spark.createDataFrame([
        (1, "a b c d e f g h X a b c d e f g h Y"),
        (2, "unique words only in this document right here now"),
        (3, "p q r s t u v w p q r s t u v w p q r s t u v w"),
    ], "doc_id long, text string")
    rows = {r["doc_id"]: (r["text"], r["n_tokens_kept"],
                          r["n_tokens_dropped"])
            for r in dedup_repeated_ngrams(docs, n=8).collect()}
    assert rows[1] == ("a b c d e f g h X Y", 10, 8)
    assert rows[2] == ("unique words only in this document right here now",
                       9, 0)
    assert rows[3] == ("p q r s t u v w", 8, 16)  # 3 copies → 1


def test_intradoc_dedup_short_docs_pass_through(spark):
    # docs shorter than the n-gram window must pass through unchanged
    # (Spark's sequence(1, 0) is DESCENDING — the guarded empty range
    # keeps slice() from being called at index 0 and crashing)
    from drugbankner_spark.operators.corpus import dedup_repeated_ngrams

    docs = spark.createDataFrame(
        [(1, "just seven tokens in this short doc"),
         (2, "one"),
         (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: (r["text"], r["n_tokens_dropped"])
            for r in dedup_repeated_ngrams(docs, n=8).collect()}
    assert rows[1] == ("just seven tokens in this short doc", 0)
    assert rows[2] == ("one", 0)
    assert rows[3] == ("", 0)


def test_text_index_append_equals_fresh_build(spark, tmp_path):
    # incremental retrieval maintenance: build on half the docs, append
    # the rest — retrieval results equal a fresh full build.
    from drugbankner_spark.operators.retrieval import (
        append_to_text_index,
        build_text_index,
        retrieve,
    )

    docs = spark.createDataFrame(
        [(i, f"topic{i % 4} " + " ".join(
            f"w{i}_{j}" for j in range(40))) for i in range(8)],
        "doc_id long, text string",
    )
    half_a = docs.filter("doc_id % 2 = 0")
    half_b = docs.filter("doc_id % 2 = 1")
    queries = spark.createDataFrame(
        [(1, "topic1 " + " ".join(f"w1_{j}" for j in range(32)))],
        "query_id long, query_text string",
    )
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    build_text_index(half_a, inc, chunk_tokens=32, overlap=8)
    append_to_text_index(half_b, inc, chunk_tokens=32, overlap=8)
    build_text_index(docs, full, chunk_tokens=32, overlap=8)
    got = sorted(map(tuple, retrieve(spark, inc, queries, k=3).collect()))
    want = sorted(map(tuple, retrieve(spark, full, queries, k=3).collect()))
    assert got == want and len(got) > 0


def test_ann_recall_metric(spark):
    # recall@k of LSH vs exact cosine on the fixture corpus — the ANN
    # tuning metric; full-probe LSH over few planes must score well, a
    # deliberately-empty approx result scores 0.
    from drugbankner_spark.operators import similarity as SIM
    from drugbankner_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(emb, queries, k=5)
    approx = SIM.lsh_topk(emb, queries, k=5, num_planes=4)
    rec = SIM.ann_recall(approx, exact, k=5)
    rows = {r["query_id"]: r["recall"] for r in rec.collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    assert all(0.0 <= v <= 1.0 for v in rows.values())
    macro = rec.agg(F.avg("recall")).collect()[0][0]
    assert macro > 0.2  # 4 planes over 20 vecs: buckets are coarse
    # empty approx → recall 0 everywhere
    zero = SIM.ann_recall(approx.filter("query_id < 0"), exact, k=5)
    assert all(r["recall"] == 0.0 for r in zero.collect())


def test_materialize_packed_sequences_reconstructs_stream(spark):
    # flattening the packed sequences in seq order must reproduce the
    # exact concatenated token stream of docs in id order; every
    # sequence except the last is exactly seq_len tokens.
    from drugbankner_spark.operators.corpus import (
        materialize_packed_sequences,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(5 + i))) for i in range(9)],
        "doc_id long, text string",
    )
    out = sorted(
        (r["seq_id"], list(r["tokens"]), r["n_tokens"])
        for r in materialize_packed_sequences(docs, seq_len=16).collect()
    )
    want_stream = [t for i in range(9)
                   for t in [f"t{i}_{j}" for j in range(5 + i)]]
    got_stream = [t for _, toks, _ in out for t in toks]
    assert got_stream == want_stream
    assert [s for s, _, _ in out] == list(range(len(out)))  # dense ids
    for _, toks, n in out[:-1]:
        assert len(toks) == 16 and n == 16
    assert 0 < out[-1][2] <= 16


def test_packed_sequence_doc_boundaries(spark):
    from drugbankner_spark.operators.corpus import (
        materialize_packed_sequences,
    )

    # doc lengths 5..13 over seq_len=16: boundaries must mark exactly
    # where each doc starts locally, and docs continuing from the
    # previous sequence contribute no boundary
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(5 + i))) for i in range(9)],
        "doc_id long, text string",
    )
    out = {
        r["seq_id"]: r
        for r in materialize_packed_sequences(
            docs, seq_len=16, with_boundaries=True
        ).collect()
    }
    # default path keeps its schema (the e3_packed_sequences_rows
    # oracle depends on it)
    plain = materialize_packed_sequences(docs, seq_len=16)
    assert plain.columns == ["seq_id", "tokens", "n_tokens"]
    # reconstruct expected boundaries from the known global layout
    lengths = [5 + i for i in range(9)]
    starts, acc = [], 0
    for n in lengths:
        starts.append(acc)
        acc += n
    expected: dict[int, list[int]] = {}
    for s in starts:
        expected.setdefault(s // 16, []).append(s % 16)
    for seq_id, r in out.items():
        assert list(r["doc_starts"]) == expected.get(seq_id, []), seq_id
        # every boundary is a real token index inside this sequence
        assert all(0 <= b < len(r["tokens"]) for b in r["doc_starts"])
    # each doc's first token appears exactly at its flagged position
    for i, s in enumerate(starts):
        r = out[s // 16]
        assert r["tokens"][s % 16] == f"t{i}_0"


def test_full_training_pipeline_composition(spark):
    # the complete last-mile story in one flow: boilerplate melt →
    # learned BPE tokenization → fixed-length training sequences, with
    # token-count conservation at every boundary.
    from drugbankner_spark.operators.bpe import apply_bpe_pandas, train_bpe
    from drugbankner_spark.operators.corpus import (
        dedup_repeated_ngrams,
        materialize_packed_sequences,
    )

    docs = spark.createDataFrame(
        [(1, "the low lower lowest " * 8),      # internal repetition
         (2, "new newer newest words appear here once only today"),
         (3, "wide wider widest " * 6)],
        "doc_id long, text string",
    )
    cleaned = dedup_repeated_ngrams(docs, n=8)
    assert cleaned.agg(F.sum("n_tokens_dropped")).collect()[0][0] > 0
    merges = train_bpe(cleaned, n_merges=8)
    toks = apply_bpe_pandas(cleaned, merges)
    as_text = toks.select(
        "doc_id", F.array_join("tokens", " ").alias("text")
    )
    packed = materialize_packed_sequences(as_text, seq_len=32)
    total_doc_tokens = toks.agg(F.sum("n_tokens")).collect()[0][0]
    total_seq_tokens = packed.agg(F.sum("n_tokens")).collect()[0][0]
    assert total_doc_tokens == total_seq_tokens  # conservation
    full = [r for r in packed.collect() if r["n_tokens"] == 32]
    assert full, "at least one full training sequence"


def test_crossdoc_dedup_cuts_only_nonkeeper_docs(spark):
    # Doc 1 and doc 2 share an identical 10-token paragraph; doc 3 is
    # unrelated. The keeper (min id = 1) keeps its copy verbatim; doc 2
    # loses every token of the duplicated span; doc 3 is untouched.
    from drugbankner_spark.operators.corpus import crossdoc_span_dedup

    shared = "the quick brown fox jumps over the lazy dog tonight"
    d1 = shared + " and doc one continues with totally original words"
    d2 = "doc two opens differently before " + shared
    d3 = "completely unrelated content about spark catalyst plans here"
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in
           crossdoc_span_dedup(docs, n=8, kernel="md5").collect()}
    assert out[1]["text"] == d1 and out[1]["n_tokens_dropped"] == 0
    assert out[3]["text"] == d3 and out[3]["n_tokens_dropped"] == 0
    assert "quick brown fox" not in out[2]["text"]
    assert out[2]["text"].startswith("doc two opens")
    assert out[2]["n_tokens_dropped"] == 10


def test_crossdoc_dedup_kernel_parity(spark):
    # The xxhash64 production kernel must produce the same output as
    # the md5 oracle kernel — both are injective renamings of the gram.
    from drugbankner_spark.operators.corpus import crossdoc_span_dedup

    docs = load_table(spark, SF, "documents").limit(120)
    md5 = crossdoc_span_dedup(docs, n=8, kernel="md5").toPandas()
    xxh = crossdoc_span_dedup(docs, n=8, kernel="xxhash64").toPandas()
    a = md5.sort_values("doc_id").reset_index(drop=True)
    b = xxh.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_bloom_decontaminate_no_false_negatives(spark):
    # Bloom membership can only over-approximate: every doc the exact
    # join-based decontaminate flags MUST be flagged by the bitmap too.
    from drugbankner_spark.operators.corpus import (
        bloom_decontaminate, decontaminate,
    )

    docs = load_table(spark, SF, "documents")
    bench = docs.filter(F.col("doc_id") % 40 == 0)
    exact = {r["doc_id"] for r in
             decontaminate(docs, bench, n=8).collect() if r["contaminated"]}
    bloom = {r["doc_id"] for r in
             bloom_decontaminate(docs, bench, n=8).collect()
             if r["contaminated"]}
    assert exact <= bloom
    # and with 2^20 bits vs a tiny benchmark, false positives should be
    # essentially absent at this scale
    assert len(bloom - exact) <= len(exact) // 10 + 2


def test_countmin_never_underestimates_and_bounds_error(spark):
    from drugbankner_spark.operators.sketches import cm_build, cm_estimate

    docs = load_table(spark, SF, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    n_total = toks.count()
    true = {r["tok"]: r["n"] for r in
            toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()}
    width, depth = 2048, 4
    sketch = cm_build(toks, "tok", width=width, depth=depth)
    items = toks.distinct()
    est = {r["tok"]: r["cm_count"] for r in
           cm_estimate(sketch, items, "tok", width=width,
                       depth=depth).collect()}
    eps = 2.718281828 / width
    overs = 0
    for tok, t in true.items():
        assert est[tok] >= t, tok  # CM never under-counts
        if est[tok] > t + eps * n_total:
            overs += 1
    # P[over eps*N] <= 2^-depth per item; allow generous slack
    assert overs <= max(4, len(true) // 8)


def test_countmin_merge_equals_single_build(spark):
    # Mergeability: sketch(A) ++ sketch(B) == sketch(A union B), cell
    # by cell — the property that makes per-batch builds composable.
    from drugbankner_spark.operators.sketches import cm_build, cm_merge

    docs = load_table(spark, SF, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    a = toks.filter(F.col("doc_id") % 2 == 0)
    b = toks.filter(F.col("doc_id") % 2 == 1)
    merged = cm_merge(
        cm_build(a, "tok", width=512, depth=3),
        cm_build(b, "tok", width=512, depth=3),
    ).toPandas().sort_values(["row", "pos"]).reset_index(drop=True)
    single = cm_build(toks, "tok", width=512, depth=3).toPandas() \
        .sort_values(["row", "pos"]).reset_index(drop=True)
    assert merged.equals(single)


def test_compression_ratio_separates_repetitive_text(spark):
    # Redundant text must compress far better than high-entropy text;
    # ratios are deterministic for a fixed zlib level.
    from drugbankner_spark.operators.textanalysis import compression_ratio

    import random
    rng = random.Random(7)
    noisy = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                for _ in range(8))
        for _ in range(60)
    )
    docs = spark.createDataFrame(
        [(1, "copy paste boiler " * 80), (2, noisy)],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    assert out[1]["compression_ratio"] < 0.1
    assert out[2]["compression_ratio"] > 0.5
    assert out[1]["n_bytes"] == len("copy paste boiler " * 80)
    again = {r["doc_id"]: r["compression_ratio"]
             for r in compression_ratio(docs).collect()}
    assert again[1] == out[1]["compression_ratio"]


def test_semantic_dedup_prunes_planted_embedding_dups(spark):
    # Two vectors nearly parallel (semantic dups) + one orthogonal:
    # the dup pair must share a cluster with the min id surviving; the
    # orthogonal vector stays its own singleton cluster.
    from drugbankner_spark.operators.similarity import semantic_dedup

    base = [1.0] * 8 + [0.0] * 56
    near = [1.0] * 7 + [0.9, 0.1] + [0.0] * 55
    ortho = [0.0] * 56 + [1.0] * 8
    emb = spark.createDataFrame(
        [(10, base), (20, near), (30, ortho)],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in
           semantic_dedup(emb, threshold=0.9, num_planes=4).collect()}
    assert out[10]["cluster_id"] == 10 and out[10]["is_survivor"]
    assert out[20]["cluster_id"] == 10 and not out[20]["is_survivor"]
    assert out[20]["cluster_size"] == 2
    assert out[30]["cluster_id"] == 30 and out[30]["is_survivor"]
    assert out[30]["cluster_size"] == 1


def test_training_shuffle_replays_global_hash_order(spark):
    # The (shard, pos_in_shard) composite order must equal the single
    # global ORDER BY (hash, key) permutation — sharding is an
    # implementation detail, not a semantic change — and a different
    # seed must produce a different permutation.
    from drugbankner_spark.operators.dedup import content_hash32
    from drugbankner_spark.operators.sampling import training_shuffle_shards

    docs = load_table(spark, SF, "documents").select("doc_id")
    out = training_shuffle_shards(docs, "doc_id", n_shards=8, seed="s1")
    composed = [r["doc_id"] for r in
                out.orderBy("shard", "pos_in_shard").collect()]
    h = content_hash32(F.concat(F.col("doc_id").cast("string"), F.lit("s1")))
    global_order = [r["doc_id"] for r in
                    docs.withColumn("_h", h).orderBy("_h", "doc_id").collect()]
    assert composed == global_order
    other = [r["doc_id"] for r in
             training_shuffle_shards(docs, "doc_id", 8, seed="s2")
             .orderBy("shard", "pos_in_shard").collect()]
    assert other != composed and sorted(other) == sorted(composed)
    # positions are gapless per shard
    import collections
    per = collections.defaultdict(list)
    for r in out.collect():
        per[r["shard"]].append(r["pos_in_shard"])
    assert all(sorted(v) == list(range(len(v))) for v in per.values())


def test_temperature_weights_math_and_row_conservation(spark):
    # alpha=1 is the identity mixture (every weight 1 — natural
    # proportions); alpha=0 is uniform-over-domains; and at any alpha
    # the expected mixed-corpus size equals the input size.
    from drugbankner_spark.operators.sampling import temperature_weights

    sizes = {"web": 8000, "code": 1500, "books": 500}
    total = sum(sizes.values())
    w1 = temperature_weights(sizes, alpha=1.0)
    assert all(abs(w - 1.0) < 1e-12 for w in w1.values())
    w0 = temperature_weights(sizes, alpha=0.0)
    # uniform p_d = 1/3 -> each domain contributes total/3 rows
    for d, n in sizes.items():
        assert abs(n * w0[d] - total / 3) < 1e-6
    w7 = temperature_weights(sizes, alpha=0.7)
    assert abs(sum(sizes[d] * w7[d] for d in sizes) - total) < 1e-6
    # flattening: the small domain gains, the big one loses
    assert w7["books"] > 1.0 > w7["web"]


def test_weighted_upsample_copies_and_monotone_threshold(spark):
    from drugbankner_spark.operators.sampling import weighted_upsample

    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    out = weighted_upsample(
        docs, "lang", "doc_id", {"en": 2.3, "de": 0.5, "zh": 0.0}
    )
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["doc_id"], []).append(r["copy"])
    langs = {r["doc_id"]: r["lang"] for r in docs.collect()}
    n_en = sum(1 for d, l in langs.items() if l == "en")
    en_counts = [len(per.get(d, [])) for d, l in langs.items() if l == "en"]
    # every en doc 2 or 3 copies; ~30% get the third (hash-binomial)
    assert set(en_counts) <= {2, 3}
    frac3 = sum(1 for c in en_counts if c == 3) / n_en
    assert 0.1 < frac3 < 0.5, frac3
    # de: 0 or 1; zh dropped entirely; unlisted (es/fr) exactly 1
    assert all(len(per.get(d, [])) <= 1
               for d, l in langs.items() if l == "de")
    assert all(d not in per for d, l in langs.items() if l == "zh")
    assert all(len(per.get(d, [])) == 1
               for d, l in langs.items() if l in ("es", "fr"))
    # copy indices are gapless from 0
    assert all(sorted(v) == list(range(len(v))) for v in per.values())
    # monotonicity: raising en 2.3 -> 2.4 only ADDS third copies
    out2 = weighted_upsample(
        docs, "lang", "doc_id", {"en": 2.4, "de": 0.5, "zh": 0.0}
    )
    k1 = {(r["doc_id"], r["copy"]) for r in rows}
    k2 = {(r["doc_id"], r["copy"]) for r in out2.collect()}
    assert k1 <= k2
    # determinism across repartition
    k3 = {(r["doc_id"], r["copy"]) for r in weighted_upsample(
        docs.repartition(13), "lang", "doc_id",
        {"en": 2.3, "de": 0.5, "zh": 0.0}).collect()}
    assert k1 == k3


def test_length_buckets_pow2_edges(spark):
    from drugbankner_spark.operators.corpus import length_buckets

    docs = spark.createDataFrame(
        [(1, " ".join(["t"] * 8)), (2, " ".join(["t"] * 7)),
         (3, "t"), (4, " ".join(["t"] * 1023))],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["n_tokens"], r["bucket"],
                         r["bucket_lo"], r["bucket_hi"])
           for r in length_buckets(docs).collect()}
    assert got[1] == (8, 3, 8, 15)      # exact power: own bucket floor
    assert got[2] == (7, 2, 4, 7)
    assert got[3] == (1, 0, 1, 1)
    assert got[4] == (1023, 9, 512, 1023)
    # bounds invariant: lo <= n <= hi everywhere on real data
    real = length_buckets(load_table(spark, SF, "documents"))
    bad = real.filter(
        (F.col("n_tokens") < F.col("bucket_lo"))
        | (F.col("n_tokens") > F.col("bucket_hi"))
    ).count()
    assert bad == 0


def test_int8_quantize_roundtrip_and_recall(spark):
    # |x - dequant(x)| <= scale/2 per element (half-up rounding bound),
    # and int8 cosine top-k keeps high recall vs the float exact answer.
    from drugbankner_spark.operators.similarity import (
        ann_recall, cosine_topk, dequantize_int8, quantize_embeddings_int8,
    )

    emb = load_table(spark, SF, "embeddings")
    q = quantize_embeddings_int8(emb)
    deq = dequantize_int8(q)
    joined = emb.select("vec_id", F.col("embedding").alias("orig")).join(
        deq.select("vec_id", "embedding", "scale"), "vec_id"
    )
    worst = joined.select(
        F.array_max(F.zip_with(
            "orig", "embedding",
            lambda a, b: F.abs(a.cast("double") - b) / F.col("scale"),
        )).alias("err")
    ).agg(F.max("err")).first()[0]
    assert worst <= 0.5 + 1e-9, worst
    # codes stay in int8 range
    assert q.filter(
        F.exists("codes", lambda c: (c > 127) | (c < -127))
    ).count() == 0
    probe = emb.limit(20)
    exact = cosine_topk(emb, probe, k=5)
    approx = cosine_topk(
        deq.select("vec_id", "embedding"),
        dequantize_int8(quantize_embeddings_int8(probe))
        .select("vec_id", "embedding"),
        k=5,
    )
    rec = ann_recall(approx, exact, k=5).agg(F.avg("recall")).first()[0]
    assert rec >= 0.9, rec


def test_ngram_topk_surfaces_planted_boilerplate(spark):
    from drugbankner_spark.operators.textanalysis import ngram_topk

    banner = "accept all cookies"
    rows = [(i, "en", f"doc {i} body text varies here {banner}")
            for i in range(30)]
    rows += [(100 + i, "en", f"unique words only row{i} nothing shared x{i}")
             for i in range(5)]
    rows += [(200, "de", "kurz")]  # < 3 tokens: contributes no gram
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = ngram_topk(docs, "lang", "text", n=3, k=3).collect()
    en = [r for r in out if r["lang"] == "en"]
    assert en[0]["gram"] == banner and en[0]["n_occurrences"] == 30
    assert all(r["lang"] != "de" for r in out)


def test_eval_scores_goldens(spark):
    from drugbankner_spark.operators.evals import eval_scores

    pairs = spark.createDataFrame(
        [
            (1, "The  Cat sat", "the cat sat"),    # EM after normalize
            (2, "the cat sat", "the dog sat"),     # 2/3 overlap
            (3, "a a b", "a c"),                   # multiset: min counts
            (4, "", ""),                           # both empty → F1=1
            (5, "x", ""),                          # one empty → F1=0
            (6, "p q r s", "q r s t"),             # bigram recall 2/3
        ],
        ["doc_id", "prediction", "reference"],
    )
    out = {r["doc_id"]: r for r in eval_scores(pairs).collect()}
    assert out[1]["exact_match"] and out[1]["token_f1"] == 1.0
    assert not out[2]["exact_match"]
    assert out[2]["token_f1"] == round(2 * (2 / 3) * (2 / 3) / (4 / 3), 6)
    # multiset: overlap('a a b','a c') = min(2,1) = 1 → P=1/3, R=1/2
    assert out[3]["token_f1"] == round(2 * (1 / 3) * (1 / 2) / (5 / 6), 6)
    assert out[4]["token_f1"] == 1.0 and out[4]["exact_match"]
    assert out[5]["token_f1"] == 0.0
    # ref bigrams {qr, rs, st}; pred has {pq, qr, rs} → recall 2/3
    assert out[6]["rouge_2"] == round(2 / 3, 6)
    assert out[2]["rouge_2"] == 0.0  # no shared bigrams


def test_render_chat_spans_and_order(spark):
    from drugbankner_spark.operators.sft import render_chat

    turns = spark.createDataFrame(
        [(1, 1, 0, "user", "hello"), (1, 2, 1, "assistant", "hi there"),
         (1, 3, 2, "user", "bye"), (1, 4, 3, "assistant", "later"),
         (2, 1, 0, "system", "be nice"), (2, 2, 1, "user", "q")],
        "conversation_id long, ts long, event_id long, "
        "role string, content string",
    )
    out = {r["conversation_id"]: r
           for r in render_chat(turns, with_spans=True).collect()}
    r1 = out[1]
    assert r1["rendered"] == (
        "<|user|>\nhello<|end|>\n<|assistant|>\nhi there<|end|>\n"
        "<|user|>\nbye<|end|>\n<|assistant|>\nlater<|end|>\n"
    )
    # spans slice out EXACTLY the assistant contents (loss-mask input)
    assert [r1["rendered"][s["start"]:s["end"]]
            for s in r1["assistant_spans"]] == ["hi there", "later"]
    assert out[2]["rendered"].startswith("<|system|>\nbe nice<|end|>\n")
    assert out[2]["assistant_spans"] == []
    # ordering is total (ts, event_id) → partition-invariant
    again = {r["conversation_id"]: r["rendered"]
             for r in render_chat(turns.repartition(7)).collect()}
    assert again == {k: v["rendered"] for k, v in out.items()}


def test_rouge_l_goldens(spark):
    from drugbankner_spark.operators.evals import rouge_l_scores

    pairs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "the cat sat on the mat"),
            (2, "the cat the mat", "the cat sat on the mat"),  # LCS=4
            (3, "mat the on sat", "the cat sat on the mat"),   # order hurts
            (4, "", "anything"),
        ],
        ["doc_id", "prediction", "reference"],
    )
    out = {r["doc_id"]: r for r in rouge_l_scores(pairs).collect()}
    assert out[1]["lcs_len"] == 6 and out[1]["rouge_l_f"] == 1.0
    assert out[2]["lcs_len"] == 4
    assert out[2]["rouge_l_p"] == 1.0 and out[2]["rouge_l_r"] == round(4 / 6, 6)
    # 'mat the on sat' vs ref: LCS is 'the on' or 'sat ... '? subsequence
    # must preserve order in BOTH: best is ['the','on'] or ['sat','the']
    # → 2; the bag metrics would have scored 4/4 tokens present
    assert out[3]["lcs_len"] == 2
    assert out[4]["lcs_len"] == 0 and out[4]["rouge_l_f"] == 0.0


def test_inject_needles_depths(spark):
    import pytest as _pytest

    from drugbankner_spark.operators.evals import inject_needles

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x")], ["doc_id", "text"]
    )
    for frac, want1 in [(0.0, "N a b c d"), (0.5, "a b N c d"),
                        (1.0, "a b c d N")]:
        out = {r["doc_id"]: r
               for r in inject_needles(docs, "N", frac).collect()}
        assert out[1]["text"] == want1, frac
        assert out[1]["n_tokens"] == 5
        toks = out[1]["text"].split()
        assert toks[out[1]["needle_pos"]] == "N"  # pos points at needle
        assert out[2]["text"].split().count("N") == 1
    with _pytest.raises(ValueError, match="depth_frac"):
        inject_needles(docs, "N", 1.5)


def test_render_preference_pairs(spark):
    from drugbankner_spark.operators.sft import render_preference_pairs

    pairs = spark.createDataFrame(
        [(1, "what is 2+2?", "4", "5")],
        ["pair_id", "prompt", "chosen", "rejected"],
    )
    [r] = render_preference_pairs(pairs).collect()
    assert r["rendered_chosen"] == (
        "<|user|>\nwhat is 2+2?<|end|>\n<|assistant|>\n4<|end|>\n"
    )
    assert r["rendered_rejected"] == (
        "<|user|>\nwhat is 2+2?<|end|>\n<|assistant|>\n5<|end|>\n"
    )
    # both renderings share the prefix exactly up to shared_prefix_len,
    # and the response starts right after it
    n = r["shared_prefix_len"]
    assert r["rendered_chosen"][:n] == r["rendered_rejected"][:n]
    assert r["rendered_chosen"][n] == "4"
    assert r["rendered_rejected"][n] == "5"


def test_chat_render_feeds_sequence_packing(spark):
    # events → rendered conversations → packed training sequences:
    # token conservation across the whole SFT last mile
    from drugbankner_spark.operators.corpus import (
        materialize_packed_sequences,
    )
    from drugbankner_spark.operators.sft import render_chat
    from drugbankner_spark.tables import load_table

    ev = load_table(spark, SF, "events").limit(400)
    turns = ev.select(
        F.col("user_id").alias("conversation_id"), "ts", "event_id",
        F.when(F.col("event_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant")).alias("role"),
        F.col("event_type").alias("content"),
    )
    convs = render_chat(turns).select(
        F.col("conversation_id").alias("doc_id"),
        F.col("rendered").alias("text"),
    )
    packed = materialize_packed_sequences(convs, seq_len=64)
    total_in = convs.select(
        F.sum(F.size(F.split("text", " ")))
    ).collect()[0][0]
    total_out = packed.select(F.sum("n_tokens")).collect()[0][0]
    assert total_in == total_out  # nothing lost between the stages


def test_datacard_markdown_render(spark, tmp_path):
    from drugbankner_spark.operators.corpus import (
        corpus_datacard, datacard_markdown,
    )
    from drugbankner_spark.operators.scale import (
        read_text_file, write_text_file,
    )
    from drugbankner_spark.tables import load_table

    docs = load_table(spark, SF, "documents")
    md = datacard_markdown(corpus_datacard(docs), title="sf0.001 docs")
    assert md.startswith("# sf0.001 docs — data card")
    assert "- documents: 500" in md
    # every (source, lang) slice appears as a table row
    n_slices = docs.select("source", "lang").distinct().count()
    assert sum(1 for ln in md.splitlines()
               if ln.startswith("| src")) >= n_slices
    # publishes through the FS helper and reads back intact
    p = str(tmp_path / "DATACARD.md")
    write_text_file(spark, p, md)
    assert read_text_file(spark, p) == md


def test_span_dedup_adversarial_single_token_doc(spark):
    # VERDICT r05 watch item: one token repeated 50k times used to mean
    # ~50k overlapping spans × 50k tokens of per-row `exists` work
    # (~10^9 lambda evals). The gaps-and-islands interval merge folds
    # them into ONE [2, m+1) interval — the doc must now finish in
    # seconds with the exact Lee-et-al. answer (only the very first
    # token survives: every later position is covered by some repeated
    # 8-gram span).
    import time

    from drugbankner_spark.operators.corpus import dedup_repeated_ngrams

    m = 50_000
    docs = spark.createDataFrame(
        [(1, " ".join(["x"] * m)), (2, "a short unique doc")],
        "doc_id long, text string",
    )
    t0 = time.monotonic()
    rows = {r["doc_id"]: r for r in dedup_repeated_ngrams(docs, n=8).collect()}
    elapsed = time.monotonic() - t0
    assert rows[1]["text"] == "x"
    assert rows[1]["n_tokens_kept"] == 1
    assert rows[1]["n_tokens_dropped"] == m - 1
    assert rows[2]["n_tokens_dropped"] == 0
    assert elapsed < 60, f"adversarial doc took {elapsed:.1f}s"


def test_crossdoc_dedup_adversarial_repeated_token(spark):
    # same pathological shape through the CROSS-document path: a 20k
    # single-token doc duplicated across two docs — keeper (min id)
    # retains everything, the later doc melts to nothing covered by a
    # single merged interval.
    from drugbankner_spark.operators.corpus import crossdoc_span_dedup

    m = 20_000
    body = " ".join(["y"] * m)
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, "an unrelated document entirely")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in crossdoc_span_dedup(docs, n=8).collect()}
    assert rows[1]["n_tokens_dropped"] == 0  # keeper keeps all
    assert rows[2]["n_tokens_kept"] == 0 and rows[2]["text"] == ""
    assert rows[3]["n_tokens_dropped"] == 0


def test_word_lm_broadcast_guard_shuffle_fallback(spark):
    # VERDICT r05: an over-threshold model dim must SKIP the broadcast
    # hint (AQE picks the join) and still produce identical scores.
    from drugbankner_spark.operators.textanalysis import (
        train_word_lm,
        word_lm_logprob,
    )

    train = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ran off the mat")],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(10, "the cat sat"), (11, "a dog barked")],
        "doc_id long, text string",
    )
    model = train_word_lm(train)
    hinted = word_lm_logprob(probes, model)
    guarded = word_lm_logprob(probes, model, broadcast_max_rows=0)
    # the guarded plan carries no broadcast hint on the model dims
    # (only the 1-row total keeps its unconditional hint)
    h_plan = hinted._jdf.queryExecution().analyzed().toString()
    g_plan = guarded._jdf.queryExecution().analyzed().toString()
    assert h_plan.count("ResolvedHint") == 3
    assert g_plan.count("ResolvedHint") == 1  # just the total dim
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(hinted) == key(guarded)


def test_retrieval_metrics_recall_and_mrr(spark):
    # round 7 (ADVICE r06): recall_at_k is STANDARD recall
    # (hits / n_relevant); the min(n_relevant, k)-denominator variant
    # ships under its honest name capped_recall_at_k. A query with no
    # retrieved relevant scores rr=0; ranks beyond k ignored.
    from drugbankner_spark.operators.evals import retrieval_metrics

    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2),
         (3, 30, 1)],
        "query_id long, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, 11), (1, 12), (1, 99),     # 2 of 3 relevant retrieved
         (2, 77),                       # none retrieved
         (3, 30), (3, 31), (3, 32), (3, 33)],  # 1 of 4, k caps denom
        "query_id long, doc_id long",
    )
    rows = {r["query_id"]: r
            for r in retrieval_metrics(results, qrels, k=2).collect()}
    assert rows[1]["n_retrieved_relevant"] == 1    # only rank<=2 counts
    assert rows[1]["recall_at_k"] == round(1 / 3, 6)   # 1 of 3 relevant
    assert rows[1]["capped_recall_at_k"] == 0.5        # 1 / min(3, 2)
    assert rows[1]["reciprocal_rank"] == 0.5       # first hit at rank 2
    assert rows[2]["n_retrieved_relevant"] == 0
    assert rows[2]["recall_at_k"] == 0.0 and rows[2]["reciprocal_rank"] == 0.0
    assert rows[3]["recall_at_k"] == 0.25          # 1 of 4 relevant
    assert rows[3]["capped_recall_at_k"] == 0.5    # 1 / min(4, 2)
    assert rows[3]["reciprocal_rank"] == 1.0


def test_ndcg_at_k_goldens(spark):
    # round 7 (ADVICE r06): graded nDCG@k — DCG = Σ rel/log2(rank+1)
    # over retrieved, IDCG from qrels' descending grades; query with no
    # retrieved relevant scores 0; a query with only zero-grade qrels
    # (5) or absent from qrels entirely (4) now EMITS 0.0 instead of
    # silently dropping (which inflated downstream mean-nDCG).
    import math

    from drugbankner_spark.operators.evals import ndcg_at_k

    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1),
         (3, 30, 1),
         (4, 40, 1)],                          # no qrels at all
        "query_id long, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 3), (1, 99, 2),   # best doc retrieved 2nd
         (2, 77, 3),                           # nothing relevant found
         (3, 30, 2),                           # perfect single hit
         (5, 50, 0)],                          # only zero-grade qrels
        "query_id long, doc_id long, rel long",
    )
    rows = {r["query_id"]: r["ndcg_at_k"]
            for r in ndcg_at_k(results, qrels, k=2).collect()}
    dcg1 = 1 / math.log2(2) + 3 / math.log2(3)
    idcg1 = 3 / math.log2(2) + 2 / math.log2(3)
    assert rows[1] == round(dcg1 / idcg1, 6)
    assert rows[2] == 0.0
    assert rows[3] == 1.0
    assert rows[4] == 0.0 and rows[5] == 0.0
    assert set(rows) == {1, 2, 3, 4, 5}


def test_intradoc_dedup_xxhash_kernel_parity(spark):
    # round 6: the 8-byte production window key must reproduce the md5
    # oracle kernel's output exactly on planted repeats.
    from drugbankner_spark.operators.corpus import dedup_repeated_ngrams

    docs = spark.createDataFrame([
        (1, "a b c d e f g h X a b c d e f g h Y"),
        (2, "unique words only in this document right here now"),
        (3, "p q r s t u v w p q r s t u v w p q r s t u v w"),
    ], "doc_id long, text string")
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(dedup_repeated_ngrams(docs, n=8, kernel="md5")) == \
        key(dedup_repeated_ngrams(docs, n=8, kernel="xxhash64"))


def test_simhash_pairs_pigeonhole_recall(spark):
    # 4 bands x 8 bits over a 32-bit simhash: every pair with Hamming
    # distance <= 3 shares a band, so banding loses NOTHING at the
    # advertised radius — compare against the brute-force all-pairs
    # Hamming computation.
    from drugbankner_spark.operators.dedup import (
        simhash_near_dup_pairs,
        simhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(30)))
         for i in range(40)],
        "doc_id long, text string",
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_near_dup_pairs(docs).collect()}
    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash_signatures(docs, "text", "doc_id").collect()}
    want = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want


def test_temperature_mixture_targets_math(spark):
    from drugbankner_spark.operators.sampling import (
        temperature_mixture_targets,
    )

    rows = [("big", i) for i in range(900)] + [("small", i) for i in range(9)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    # alpha=1: natural proportions (900:9 → 100:1 of budget 101)
    t1 = temperature_mixture_targets(df, "source", 101, alpha=1.0)
    assert t1["big"] == 100 and t1["small"] == 1
    # alpha=0.5: isqrt weights 30:3 → small domain upweighted ~10x
    t5 = temperature_mixture_targets(df, "source", 110, alpha=0.5)
    assert t5 == {"big": 30 * 110 // 33, "small": 9}  # small capped at n
    # alpha→0 flattens: equal weights, capped at availability
    t0 = temperature_mixture_targets(df, "source", 40, alpha=0.0)
    assert t0 == {"big": 20, "small": 9}


def test_k_anonymity_report_and_suppression(spark):
    # round 6: classes below k flag; suppression keeps exactly the
    # rows of surviving classes; l-diversity counts distinct sensitive.
    from drugbankner_spark.operators.privacy import (
        k_anonymity_report,
        k_anonymity_summary,
        suppress_small_classes,
    )

    rows = [("us", "m", i, "flu") for i in range(5)] + \
           [("us", "f", 10, "flu"), ("us", "f", 11, "cold")] + \
           [("de", "m", 20, "flu")]
    df = spark.createDataFrame(
        rows, "country string, sex string, pid long, dx string"
    )
    rep = {(r["country"], r["sex"]): r for r in k_anonymity_report(
        df, ["country", "sex"], "dx", k=3
    ).collect()}
    assert rep[("us", "m")]["class_size"] == 5
    assert not rep[("us", "m")]["at_risk"]
    assert rep[("us", "m")]["l_diversity"] == 1      # homogeneity leak
    assert rep[("us", "f")]["at_risk"]
    assert rep[("us", "f")]["l_diversity"] == 2

    s = k_anonymity_summary(df, ["country", "sex"], "dx", k=3).collect()[0]
    assert s["n_classes"] == 3 and s["n_at_risk_classes"] == 2
    assert s["rows_at_risk"] == 3 and s["min_class_size"] == 1
    assert s["frac_rows_at_risk"] == 0.375

    kept = suppress_small_classes(df, ["country", "sex"], k=3)
    assert kept.count() == 5
    assert kept.select("country").distinct().collect()[0][0] == "us"
    assert kept.columns == df.columns

    # ADVICE r06: NULL quasi-id values are a countable class — a
    # NULL-keyed class of size >= k must SURVIVE suppression (the
    # report already counted it; the null-unsafe semi join dropped it).
    rows_n = rows + [(None, "x", 100 + i, "flu") for i in range(4)]
    df_n = spark.createDataFrame(
        rows_n, "country string, sex string, pid long, dx string"
    )
    rep_n = {(r["country"], r["sex"]): r for r in k_anonymity_report(
        df_n, ["country", "sex"], "dx", k=3
    ).collect()}
    assert rep_n[(None, "x")]["class_size"] == 4
    assert not rep_n[(None, "x")]["at_risk"]
    kept_n = suppress_small_classes(df_n, ["country", "sex"], k=3)
    assert kept_n.count() == 9                 # 5 (us,m) + 4 (NULL,x)
    assert kept_n.filter("country IS NULL").count() == 4


def test_strip_boilerplate_sentences(spark):
    # round 6: a footer sentence shared by 3 docs (> max_doc_count=2)
    # is removed everywhere; per-doc repeats of a non-boilerplate
    # sentence survive; order is preserved on reassembly.
    from drugbankner_spark.operators.corpus import (
        strip_boilerplate_sentences,
    )

    docs = spark.createDataFrame(
        [(1, "Alpha first. All rights reserved. Beta ends"),
         (2, "Gamma starts. All rights reserved. Delta."),
         (3, "All rights reserved. Unique thought. Unique thought"),
         (4, "Only original content here. Nothing shared")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in strip_boilerplate_sentences(
        docs, max_doc_count=2
    ).collect()}
    assert out[1]["text_clean"] == "Alpha first. Beta ends"
    assert out[1]["n_removed"] == 1
    assert out[2]["text_clean"] == "Gamma starts. Delta"
    assert out[3]["text_clean"] == "Unique thought. Unique thought"
    assert out[4]["text_clean"] == "Only original content here. Nothing shared"
    assert out[4]["n_removed"] == 0


def test_strip_boilerplate_all_flagged_doc_keeps_empty_row(spark):
    from drugbankner_spark.operators.corpus import (
        strip_boilerplate_sentences,
    )

    docs = spark.createDataFrame(
        [(i, "Subscribe to our newsletter") for i in range(1, 5)],
        "doc_id long, text string",
    )
    out = strip_boilerplate_sentences(docs, max_doc_count=2).collect()
    assert len(out) == 4
    assert all(r["text_clean"] == "" and r["n_removed"] == 1 for r in out)


def test_strip_boilerplate_kernel_parity(spark):
    from drugbankner_spark.operators.corpus import (
        strip_boilerplate_sentences,
    )

    docs = spark.createDataFrame(
        [(1, "Shared footer. Real content one"),
         (2, "Shared footer. Real content two"),
         (3, "Shared footer. Real content three")],
        "doc_id long, text string",
    )
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(strip_boilerplate_sentences(docs, max_doc_count=2,
                                           kernel="md5")) == \
        key(strip_boilerplate_sentences(docs, max_doc_count=2,
                                        kernel="xxhash64"))


def test_percentile_normalize_goldens(spark):
    # round 6: winsorize clips to the exact interpolated group
    # quantiles; percent_rank spans [0, 1]; NULL passes through.
    from drugbankner_spark.operators.relational import percentile_normalize

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 11)] + [("a", None)],
        "grp string, v double",
    )
    out = percentile_normalize(df, "v", ["grp"], lo=0.1, hi=0.9)
    rows = {r["v"]: r for r in out.collect()}
    # quantile_cont(0.1) of 1..10 = 1.9; (0.9) = 9.1
    assert rows[1.0]["winsorized"] == 1.9
    assert rows[10.0]["winsorized"] == 9.1
    assert rows[5.0]["winsorized"] == 5.0
    assert rows[1.0]["pct_rank"] == 0.0
    assert rows[None]["pct_rank"] is None and rows[None]["winsorized"] is None


def _kn_reference(train_texts, probe_tokens, discount=0.75):
    # independent interpolated-KN implementation (plain dicts, no
    # Spark) — the oracle for the Spark model on arbitrary corpora.
    import math
    from collections import Counter

    big = Counter()
    for t in train_texts:
        ws = [w for w in t.split(" ") if w]
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] += 1
    n1 = Counter()
    d_after = Counter()
    d_before = Counter()
    for (a, b), n in big.items():
        n1[a] += n
        d_after[a] += 1
        d_before[b] += 1
    n_types = float(len(big))
    lps = []
    for a, b in zip(probe_tokens, probe_tokens[1:]):
        pc = (d_before[b] if b in d_before else 0.5) / n_types
        if a in n1:
            p = (max(big.get((a, b), 0) - discount, 0.0) / n1[a]
                 + discount * d_after[a] / n1[a] * pc)
        else:
            p = pc
        lps.append(math.log(p))
    return sum(lps) / len(lps)


def test_kn_lm_matches_independent_reference(spark):
    # round 6 late: Spark interpolated Kneser-Ney == a dict-based
    # reference on a randomized corpus, every branch (seen bigram,
    # seen-context/unseen-bigram, unseen context, unseen continuation).
    import random

    from drugbankner_spark.operators.textanalysis import (
        kn_lm_logprob,
        train_kn_lm,
    )

    rng = random.Random(19)
    vocab = ["the", "cat", "sat", "mat", "dog", "ran", "on", "a"]
    train_texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 12)))
        for _ in range(30)
    ]
    probes = [
        (0, "the cat sat on the mat"),
        (1, "cat the sat zz"),            # unseen bigrams + unseen word
        (2, "zz qq ww"),                  # fully out-of-domain
        (3, " ".join(rng.choice(vocab + ["zz"]) for _ in range(9))),
    ]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], ["doc_id", "text"]
    )
    model = train_kn_lm(train)
    got = {r["doc_id"]: r for r in
           kn_lm_logprob(spark.createDataFrame(probes, ["doc_id", "text"]),
                         model).collect()}
    for pid, text in probes:
        toks = [w for w in text.split(" ") if w]
        want = _kn_reference(train_texts, toks)
        assert abs(got[pid]["mean_logprob"] - round(want, 6)) < 2e-6, pid
        assert got[pid]["n_bigrams"] == len(toks) - 1
        import math
        assert abs(got[pid]["ppl"] - round(math.exp(-want), 3)) < 2e-3


def test_kn_lm_in_domain_scores_higher(spark):
    from drugbankner_spark.operators.textanalysis import (
        kn_lm_logprob,
        train_kn_lm,
    )

    train = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ran on the mat")],
        ["doc_id", "text"],
    )
    model = train_kn_lm(train)
    probes = spark.createDataFrame(
        [(10, "the cat sat"), (11, "cat the sat"), (12, "zz qq ww")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in kn_lm_logprob(probes, model).collect()}
    assert (out[10]["mean_logprob"] > out[11]["mean_logprob"]
            > out[12]["mean_logprob"])
    # perplexity is the inverse face of the same ordering
    assert out[10]["ppl"] < out[11]["ppl"] < out[12]["ppl"]


def _gopher_rep_reference(text, top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10)):
    from collections import Counter

    out = {}
    lines = text.split("\n")
    lc = Counter(lines)
    out["n_lines"] = len(lines)
    out["dup_line_frac"] = round(
        (len(lines) - len(lc)) / len(lines), 6)
    tot_lc = sum(len(l) for l in lines)
    dup_lc = sum(c * len(l) for l, c in lc.items() if c >= 2)
    out["dup_line_char_frac"] = round(
        dup_lc / tot_lc, 6) if tot_lc else 0.0
    toks = text.split(" ")
    nc = len(text)
    for n in list(top_ns) + list(dup_ns):
        grams = Counter(
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))
        key = (f"top{n}gram_char_frac" if n in top_ns
               else f"dup{n}gram_char_frac")
        if not grams:
            out[key] = 0.0
        elif n in top_ns:
            out[key] = round(
                max(c * len(g) for g, c in grams.items()) / nc, 6)
        else:
            out[key] = round(
                sum(c * len(g) for g, c in grams.items() if c >= 2) / nc,
                6)
    return out


def test_gopher_repetition_signals_vs_reference(spark):
    # round 6 late: the Gopher §A1.1 repetition signal set — Spark ==
    # a Counter-based reference on hand-shaped and randomized docs.
    import random

    from drugbankner_spark.operators.textanalysis import (
        gopher_repetition_signals,
    )

    rng = random.Random(47)
    vocab = ["q", "w", "e", "r", "t", "yy"]
    docs = [
        (0, "a b a b c"),
        (1, "x\nx\ny y y y y y"),
        (2, "q w e r t q w e r t q w e r t"),   # dup 5-grams
        (3, "solo"),
    ] + [
        (10 + i,
         "\n".join(
             " ".join(rng.choice(vocab)
                      for _ in range(rng.randint(1, 14)))
             for _ in range(rng.randint(1, 4))))
        for i in range(12)
    ]
    got = {r["doc_id"]: r.asDict() for r in gopher_repetition_signals(
        spark.createDataFrame(docs, ["doc_id", "text"])).collect()}
    assert set(got) == {d for d, _ in docs}
    for did, text in docs:
        want = _gopher_rep_reference(text)
        for k, v in want.items():
            assert abs(got[did][k] - v) < 1e-9, (did, k, got[did][k], v)


def test_gopher_repetition_kernel_matches_hof_twin(spark):
    # round 15 (optimization): gopher_repetition_signals moved from the
    # interpreted JVM higher-order-function scan to a vectorized
    # mapInArrow kernel (~15x at sf0.1). The old form stays in-repo as
    # the reference twin; this pins BITWISE equality (floats included:
    # _spark_round6 replicates round(double, 6) HALF_UP exactly) on
    # adversarial fixtures — NULL text, empty tokens, unicode,
    # single-token docs, dup lines — plus identical DIVIDE_BY_ZERO
    # behavior on 0-denominator docs under the session's ANSI mode.
    import pytest as _pytest

    from drugbankner_spark.operators.textanalysis import (
        _gopher_repetition_signals_hof,
        gopher_repetition_signals,
    )

    rows = [
        (2, "x"), (3, "a a a a a a a a a a"),
        (4, "line\nline\nline"), (5, "a  b   c    d"),
        (6, "héllo wörld héllo wörld héllo wörld"),
        (7, None), (8, " leading and trailing "),
        (10, ("tok " * 50).strip()),
        (11, "ab cd ef ab cd ef ab cd ef gh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    old = _gopher_repetition_signals_hof(df).orderBy("doc_id").toPandas()
    new = gopher_repetition_signals(df).orderBy("doc_id").toPandas()
    assert list(old.columns) == list(new.columns)
    assert old.equals(new), "kernel != HOF twin (bitwise)"
    # 0-char text and all-empty-lines docs: the JVM twin raises
    # DIVIDE_BY_ZERO under ANSI — the kernel must do the same, not
    # silently emit NaN/0.0
    for bad in ["", "\n\n\n"]:
        bad_df = spark.createDataFrame([(1, bad)], "doc_id long, text string")
        with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
            _gopher_repetition_signals_hof(bad_df).collect()
        with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
            gopher_repetition_signals(bad_df).collect()


def test_c4_filter_goldens(spark):
    # round 6 late: C4 line rules (terminal punct, >=3 words, no
    # javascript) + page flags (brace, lorem ipsum, empty page).
    from drugbankner_spark.operators.corpus import c4_filter

    docs = spark.createDataFrame(
        [
            (0, 'good line here.\nshort.\nno punct at all\n'
                'uses JavaScript heavily.\nanother "fine" line!'),
            (1, "decent text here. { lorem\nmore words follow."),
            (2, "Lorem Ipsum dolor sit amet."),
            (3, "nothing survives here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in c4_filter(docs).collect()}
    assert out[0]["text"] == 'good line here.\nanother "fine" line!'
    assert out[0]["n_lines_kept"] == 2 and out[0]["n_lines_dropped"] == 3
    assert out[0]["keep"] is True
    assert out[1]["has_brace"] is True and out[1]["keep"] is False
    assert out[1]["n_lines_kept"] == 1  # second line fine, page flagged
    assert out[2]["has_lorem"] is True and out[2]["keep"] is False
    assert out[3]["n_lines_kept"] == 0 and out[3]["text"] == ""
    assert out[3]["keep"] is False


def test_pii_scrub_goldens(spark):
    # round 6 late: sequential email -> ipv4 -> ssn -> phone redaction
    # with per-kind counts; digits consumed by an earlier pattern can't
    # re-match later ones.
    from drugbankner_spark.operators.pii import pii_scrub

    docs = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@ex-corp.io now"),
            (1, "server at 10.0.3.7 port open"),
            (2, "ssn 123-45-6789 leaked"),
            (3, "call +1 (555) 123-4567 today"),
            (4, "clean text with no pii"),
            (5, "a@b.io and 1.2.3.4 and 999-88-7777"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert out[0]["text"] == "mail [EMAIL] now"
    assert out[0]["n_email"] == 1 and out[0]["has_pii"] is True
    assert out[1]["text"] == "server at [IP] port open"
    assert out[2]["text"] == "ssn [SSN] leaked"
    assert out[3]["text"] == "call [PHONE] today"
    assert out[3]["n_phone"] == 1
    assert out[4]["text"] == "clean text with no pii"
    assert out[4]["has_pii"] is False
    assert out[5]["text"] == "[EMAIL] and [IP] and [SSN]"
    assert (out[5]["n_email"], out[5]["n_ipv4"], out[5]["n_ssn"],
            out[5]["n_phone"]) == (1, 1, 1, 0)


def _span_corrupt_reference(doc_id, text, every_k=7, max_span=3):
    import hashlib

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    toks = text.split(" ")
    n = len(toks)
    raw = []
    for p in range(1, n + 1):
        if h32(f"{doc_id}:{p}") % every_k == 0:
            raw.append((p, min(p + h32(f"{doc_id}#{p}") % max_span, n)))
    raw.sort()
    merged = []
    for s, e in raw:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    inp, tgt, covered = [], [], set()
    for j, (s, e) in enumerate(merged):
        tgt.append(f"<extra_id_{j}> " + " ".join(toks[s - 1:e]))
        covered.update(range(s, e + 1))
    j = 0
    for p in range(1, n + 1):
        if p not in covered:
            inp.append(toks[p - 1])
        elif j < len(merged) and merged[j][0] == p:
            inp.append(f"<extra_id_{j}>")
            j += 1
    return (" ".join(inp), " ".join(tgt), len(merged), len(covered))


def test_span_corrupt_matches_reference(spark):
    # round 6 late: deterministic T5 span corruption == a plain-python
    # reference (same md5 hash convention) on randomized docs.
    import random

    from drugbankner_spark.operators.sft import span_corrupt

    rng = random.Random(53)
    docs = [
        (i, " ".join(f"w{rng.randrange(30)}"
                     for _ in range(rng.randint(1, 40))))
        for i in range(25)
    ]
    got = {r["doc_id"]: r for r in span_corrupt(
        spark.createDataFrame(docs, ["doc_id", "text"])).collect()}
    assert set(got) == {d for d, _ in docs}
    n_corrupted = 0
    for did, text in docs:
        inp, tgt, ns, nn = _span_corrupt_reference(did, text)
        r = got[did]
        assert (r["inputs"], r["targets"], r["n_spans"],
                r["n_noise_tokens"]) == (inp, tgt, ns, nn), did
        n_corrupted += ns > 0
    assert n_corrupted >= 5  # the hash actually fires


def test_span_corrupt_reconstruction_invariant(spark):
    # splicing each target span back over its sentinel reconstructs
    # the original text exactly.
    import re

    from drugbankner_spark.operators.sft import span_corrupt

    docs = [(i, " ".join(f"t{j % 11}" for j in range(i + 1)))
            for i in range(1, 30)]
    for r in span_corrupt(
            spark.createDataFrame(docs, ["doc_id", "text"])).collect():
        spans = {}
        for m in re.finditer(r"<extra_id_(\d+)>([^<]*)", r["targets"]):
            spans[int(m.group(1))] = m.group(2).strip()
        rebuilt = re.sub(
            r"<extra_id_(\d+)>",
            lambda m: spans[int(m.group(1))], r["inputs"])
        assert rebuilt == dict(docs)[r["doc_id"]]


def test_hard_negatives_excludes_positives_and_skips_top(spark):
    # round 6 late: per query, top-k by cosine excluding labeled
    # positives and self; skip_top drops the hardest rank. Verified
    # against a numpy brute-force reference.
    import math
    import random

    from drugbankner_spark.operators.similarity import hard_negatives

    rng = random.Random(61)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(30)]
    corpus = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    queries = corpus.filter("vec_id < 3")
    pos = [(q, q + 1) for q in range(3)] + [(q, q + 2) for q in range(3)]
    posdf = spark.createDataFrame(pos, ["query_id", "pos_id"])

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(d / (math.sqrt(sum(x * x for x in a))
                          * math.sqrt(sum(y * y for y in b))), 6)

    vd = dict(vecs)
    for skip in (0, 1):
        got = {}
        for r in hard_negatives(corpus, queries, posdf, k=4,
                                skip_top=skip).collect():
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["neighbor_id"], r["cos_sim"]))
        for q in range(3):
            banned = {q, q + 1, q + 2}
            ranked = sorted(
                ((cos(vd[q], vd[n]), n) for n in vd if n not in banned),
                key=lambda t: (-t[0], t[1]))
            want = [(i + 1, n, s) for i, (s, n)
                    in enumerate(ranked[skip:skip + 4])]
            assert sorted(got[q]) == want, (q, skip)


def test_lm_shard_merge_equals_union_training(spark):
    # round 6 late: merge(train(A), train(B)) == train(A ∪ B) for both
    # LM families — counts are sufficient statistics, compared through
    # the full scoring output (bitwise: integer-ratio math).
    import random

    from drugbankner_spark.operators.textanalysis import (
        kn_lm_logprob,
        merge_kn_models,
        merge_word_lm_models,
        train_kn_lm,
        train_word_lm,
        word_lm_logprob,
    )

    rng = random.Random(67)
    vocab = ["a", "b", "c", "d", "ee"]
    mk = lambda n, base: [(base + i, " ".join(
        rng.choice(vocab) for _ in range(rng.randint(2, 10))))
        for i in range(n)]
    A, B = mk(12, 0), mk(15, 100)
    dfA = spark.createDataFrame(A, ["doc_id", "text"])
    dfB = spark.createDataFrame(B, ["doc_id", "text"])
    dfU = dfA.unionByName(dfB)
    probes = spark.createDataFrame(
        mk(8, 500) + [(900, "zz qq")], ["doc_id", "text"])

    merged_kn = merge_kn_models(train_kn_lm(dfA), train_kn_lm(dfB))
    want = sorted(map(tuple,
                  kn_lm_logprob(probes, train_kn_lm(dfU)).collect()))
    got = sorted(map(tuple, kn_lm_logprob(probes, merged_kn).collect()))
    assert got == want

    merged_w = merge_word_lm_models(
        train_word_lm(dfA), train_word_lm(dfB))
    want_w = sorted(map(tuple,
                    word_lm_logprob(probes, train_word_lm(dfU)).collect()))
    got_w = sorted(map(tuple,
                   word_lm_logprob(probes, merged_w).collect()))
    assert got_w == want_w


def test_gopher_repetition_hash_key_parity(spark):
    # the production hash-key form (xxhash64 gram keys, text never
    # shuffles) emits identical signals to the oracle gram-text form.
    import random

    from drugbankner_spark.operators.textanalysis import (
        gopher_repetition_signals,
    )

    rng = random.Random(71)
    docs = spark.createDataFrame(
        [(i, "\n".join(
            " ".join(rng.choice(["q", "w", "e", "rr"])
                     for _ in range(rng.randint(1, 25)))
            for _ in range(rng.randint(1, 3))))
         for i in range(40)],
        ["doc_id", "text"],
    )
    a = sorted(map(tuple,
              gopher_repetition_signals(docs, key="gram").collect()))
    b = sorted(map(tuple,
              gopher_repetition_signals(docs, key="hash").collect()))
    assert a == b and len(a) == 40


def test_calibration_report_hand_golden(spark):
    # round 6 late: two bins, hand-computed gaps and weighted ECE;
    # confidence 1.0 lands in the LAST bin.
    from drugbankner_spark.operators.evals import calibration_report

    preds = spark.createDataFrame(
        [(0.1, 0), (0.15, 1), (0.9, 1), (0.95, 1), (1.0, 0)],
        ["confidence", "correct"],
    )
    out = {r["bin"]: r for r in
           calibration_report(preds, n_bins=10).collect()}
    assert set(out) == {1, 9}
    b1 = out[1]   # 0.1, 0.15 -> avg_conf 0.125, acc 0.5
    assert (b1["n"], b1["avg_confidence"], b1["accuracy"]) \
        == (2, 0.125, 0.5)
    assert b1["abs_gap"] == 0.375
    b9 = out[9]   # 0.9, 0.95, 1.0 -> avg 0.95, acc 2/3
    assert b9["n"] == 3 and b9["avg_confidence"] == 0.95
    # ece = (2*0.375 + 3*|0.95 - 0.666667|) / 5
    want_ece = round((2 * 0.375 + 3 * abs(0.95 - round(2 / 3, 6))) / 5, 6)
    assert all(r["ece"] == want_ece for r in out.values())


def test_kfold_assign_partition_invariant_and_complete(spark):
    from drugbankner_spark.operators.sampling import (
        kfold_assign,
        kfold_split,
    )

    df = spark.range(0, 500).withColumnRenamed("id", "key")
    a = {r["key"]: r["fold"]
         for r in kfold_assign(df, "key", k=5).collect()}
    b = {r["key"]: r["fold"]
         for r in kfold_assign(df.repartition(13), "key", k=5).collect()}
    assert a == b
    assert set(a.values()) == {0, 1, 2, 3, 4}
    # folds are roughly balanced (hash-uniform)
    from collections import Counter
    c = Counter(a.values())
    assert max(c.values()) < 2 * min(c.values())
    train, held = kfold_split(df, "key", fold=2, k=5)
    ht = {r["key"] for r in held.collect()}
    tt = {r["key"] for r in train.collect()}
    assert ht == {k for k, f in a.items() if f == 2}
    assert tt | ht == set(a) and not (tt & ht)


def test_group_ols_matches_numpy(spark):
    # round 6 late: closed-form per-group OLS vs numpy.polyfit on
    # randomized groups, plus the degenerate conventions.
    import random

    import numpy as np

    from drugbankner_spark.operators.relational import group_ols

    rng = random.Random(79)
    rows = []
    for g in ["a", "b", "c"]:
        base = rng.uniform(-2, 2)
        for i in range(40):
            x = float(i)
            rows.append((g, x, base * x + rng.uniform(-1, 1) + 3.0))
    rows += [("single", 1.0, 5.0)]          # n=1 -> NULLs
    rows += [("flat_x", 2.0, 1.0), ("flat_x", 2.0, 9.0)]  # var_x=0
    rows += [("flat_y", 1.0, 4.0), ("flat_y", 2.0, 4.0)]  # var_y=0
    rows += [("a", None, 1.0), ("a", 1.0, None)]          # excluded
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    out = {r["grp"]: r for r in group_ols(df, "x", "y", ["grp"]).collect()}
    for g in ["a", "b", "c"]:
        xs = np.array([x for gg, x, y in rows
                       if gg == g and x is not None and y is not None])
        ys = np.array([y for gg, x, y in rows
                       if gg == g and x is not None and y is not None])
        slope, intercept = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        assert out[g]["n"] == len(xs)
        assert abs(out[g]["slope"] - slope) < 1e-3, g
        assert abs(out[g]["intercept"] - intercept) < 1e-3, g
        assert abs(out[g]["r2"] - r * r) < 1e-3, g
    assert out["single"]["slope"] is None
    assert out["flat_x"]["slope"] is None and out["flat_x"]["r2"] is None
    assert out["flat_y"]["slope"] == 0.0 and out["flat_y"]["r2"] is None


def test_skipgram_counts_matches_reference(spark):
    # round 6 late: in-window pair counts == a Counter reference, no
    # self-pairs, symmetric window clipped at edges.
    import random
    from collections import Counter

    from drugbankner_spark.operators.textanalysis import skipgram_counts

    rng = random.Random(89)
    texts = [" ".join(rng.choice("abcd") for _ in range(rng.randint(1, 12)))
             for _ in range(20)] + ["x", "y z"]
    want = Counter()
    for t in texts:
        ws = t.split(" ")
        for i, c in enumerate(ws):
            for j in range(max(0, i - 2), min(len(ws), i + 3)):
                if j != i and c and ws[j]:
                    want[(c, ws[j])] += 1
    got = {(r["center"], r["context"]): r["n"] for r in skipgram_counts(
        spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                              ["doc_id", "text"]), window=2).collect()}
    assert got == dict(want)


def test_curate_corpus_stage_verdicts(spark):
    # round 6 late: the composed C4 -> PII -> Gopher -> dedup chain.
    from drugbankner_spark.operators.corpus import curate_corpus

    good = ("the cat and dog sat in a house of mats together "
            "with every other animal that he ever knew and liked "
            "during those years.")
    docs = spark.createDataFrame(
        [
            (1, good),                      # survives everything
            (2, good),                      # exact dup of 1 -> dropped
            (3, "no punct no structure"),   # fails c4
            (4, good.replace("mats", "mail a@b.io mats")),  # pii flag
            (5, "tiny line ok."),           # c4 ok, gopher len fails
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in curate_corpus(docs).collect()}
    assert out[1]["keep"] is True and out[1]["is_exact_dup"] is False
    assert out[2]["is_exact_dup"] is True and out[2]["keep"] is False
    assert out[3]["keep_c4"] is False and out[3]["keep"] is False
    assert out[4]["has_pii"] is True and out[4]["keep"] is True
    assert out[5]["keep_c4"] is True and out[5]["keep_quality"] is False
    assert out[5]["keep"] is False


def test_tokenize_columns_join_preserving_and_irreversible_shape(spark):
    # round 6 late: same (salt, value) -> same token across tables
    # (joins survive); different salt -> different token; NULL -> NULL.
    import hashlib

    from drugbankner_spark.operators.privacy import tokenize_columns

    a = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, None)], ["id", "user"])
    b = spark.createDataFrame(
        [("alice", 10), ("bob", 20)], ["user", "score"])
    ta = tokenize_columns(a, ["user"], salt="s1")
    tb = tokenize_columns(b, ["user"], salt="s1")
    joined = ta.join(tb, "user").select("id", "score")
    assert sorted(map(tuple, joined.collect())) == [(1, 10), (2, 20)]
    rows = {r["id"]: r["user"] for r in ta.collect()}
    want = hashlib.sha256(b"s1:alice").hexdigest()[:12]
    assert rows[1] == want and rows[3] is None
    t2 = {r["id"]: r["user"]
          for r in tokenize_columns(a, ["user"], salt="s2").collect()}
    assert t2[1] != rows[1]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-empty"):
        tokenize_columns(a, [], salt="s")


def test_mean_pool_embeddings_matches_numpy(spark):
    import random

    import numpy as np

    from drugbankner_spark.operators.similarity import (
        mean_pool_embeddings,
    )

    rng = random.Random(97)
    rows = [(i, i % 4, [rng.uniform(-1, 1) for _ in range(6)])
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "vec_id long, doc long, embedding array<double>")
    out = {r["doc"]: r for r in
           mean_pool_embeddings(df, "doc").collect()}
    for d in range(4):
        vecs = np.array([v for _, g, v in rows if g == d])
        want = [round(x, 6) for x in vecs.mean(axis=0)]
        assert out[d]["embedding"] == want
        assert out[d]["n_vecs"] == len(vecs)


def test_gopher_rep_hash_entry_equals_oracle_entry(spark):
    # the rows-only production registry entry == the hash-oracled one.
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, E.all_queries()["e3_gopher_rep"](
        spark, sf).collect()))
    b = sorted(map(tuple, E.all_queries()["e3_gopher_rep_hash"](
        spark, sf).collect()))
    assert a == b and len(a) > 0


def test_ner_span_metrics_goldens(spark):
    # round 6 late: CoNLL exact-match span scoring with micro rollup.
    from drugbankner_spark.operators.evals import ner_span_metrics

    cols = ["doc_id", "start", "length", "label"]
    gold = spark.createDataFrame(
        [(1, 0, 5, "DRUG"), (1, 10, 4, "DISEASE"), (2, 3, 6, "DRUG"),
         (2, 3, 6, "DRUG")],   # dup gold collapses
        cols,
    )
    pred = spark.createDataFrame(
        [(1, 0, 5, "DRUG"),       # exact TP
         (1, 10, 4, "DRUG"),      # right span, wrong label: FP (+FN)
         (1, 20, 3, "DISEASE"),   # spurious: FP
         (2, 3, 6, "DRUG")],      # TP
        cols,
    )
    out = {r["label"]: r for r in
           ner_span_metrics(pred, gold).collect()}
    drug = out["DRUG"]
    assert (drug["tp"], drug["fp"], drug["fn"]) == (2, 1, 0)
    assert drug["precision"] == round(2 / 3, 6) and drug["recall"] == 1.0
    dis = out["DISEASE"]
    assert (dis["tp"], dis["fp"], dis["fn"]) == (0, 1, 1)
    assert dis["precision"] == 0.0 and dis["f1"] == 0.0
    mic = out["__micro__"]
    assert (mic["tp"], mic["fp"], mic["fn"]) == (2, 2, 1)
    p, r = 2 / 4, 2 / 3
    assert mic["f1"] == round(2 * p * r / (p + r), 6)


def test_repair_text_goldens(spark):
    from drugbankner_spark.operators.corpus import repair_text

    docs = spark.createDataFrame(
        [(1, "over-\nfit models\x07 need   space"),
         (2, "call 911 now\t\tok"),
         (3, "clean")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repair_text(docs).collect()}
    assert out[1]["text"] == "overfit models need space"
    assert out[2]["text"] == "call 911 now ok"
    assert out[3]["text"] == "clean"
    assert out[1]["n_chars_before"] > out[1]["n_chars_after"]
    masked = {r["doc_id"]: r["text"] for r in
              repair_text(docs, mask_numbers=True).collect()}
    assert masked[2] == "call <NUM> now ok"


def _augment_reference(doc_id, text, dk=11, sk=7):
    import hashlib

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    toks = text.split(" ")
    kept = [t for p, t in enumerate(toks, 1)
            if h32(f"{doc_id}~{p}") % dk != 0]
    n_dropped = len(toks) - len(kept)
    out = list(kept)
    n_sw = 0
    for i in range(1, len(kept) // 2 + 1):
        if h32(f"{doc_id}^{i}") % sk == 0:
            n_sw += 1
            a, b = 2 * i - 2, 2 * i - 1
            out[a], out[b] = out[b], out[a]
    return " ".join(out), n_dropped, n_sw


def test_augment_text_matches_reference(spark):
    # round 6 late: hash-seeded EDA (delete + disjoint pair swaps) ==
    # a plain-python reference, and augmentation actually fires.
    import random

    from drugbankner_spark.operators.corpus import augment_text

    rng = random.Random(103)
    docs = [(i, " ".join(f"w{rng.randrange(40)}"
                         for _ in range(rng.randint(1, 30))))
            for i in range(30)]
    got = {r["doc_id"]: r for r in augment_text(
        spark.createDataFrame(docs, ["doc_id", "text"])).collect()}
    dropped = swapped = 0
    for did, text in docs:
        t, nd, ns = _augment_reference(did, text)
        r = got[did]
        assert (r["text"], r["n_dropped"], r["n_swapped_pairs"]) \
            == (t, nd, ns), did
        dropped += nd
        swapped += ns
    assert dropped > 5 and swapped > 3


def test_spans_to_iob_goldens(spark):
    # round 6 late: B/I/O rendering with the documented overlap
    # resolution (longer span wins; dropped spans don't revive).
    from drugbankner_spark.operators.sft import spans_to_iob

    docs = spark.createDataFrame(
        [(1, "take aspirin daily for fever")], ["doc_id", "text"])
    # offsets: take=0 aspirin=5 daily=13 for=19 fever=23
    spans = spark.createDataFrame(
        [(1, 5, 7, "DRUG"),        # 'aspirin'
         (1, 5, 3, "CHEM"),        # overlaps DRUG, shorter: dropped
         (1, 19, 9, "SYMPTOM")],   # 'for fever' (two tokens)
        ["doc_id", "start", "length", "label"],
    )
    out = {r["pos"]: (r["token"], r["tag"]) for r in
           spans_to_iob(docs, spans).collect()}
    assert out == {
        1: ("take", "O"),
        2: ("aspirin", "B-DRUG"),
        3: ("daily", "O"),
        4: ("for", "B-SYMPTOM"),
        5: ("fever", "I-SYMPTOM"),
    }


def test_classification_report_matches_sklearn_formulas(spark):
    from collections import Counter

    from drugbankner_spark.operators.evals import classification_report

    import random
    rng = random.Random(107)
    labels = ["a", "b", "c"]
    rows = [(i, rng.choice(labels), rng.choice(labels))
            for i in range(200)]
    out = {r["label"]: r for r in classification_report(
        spark.createDataFrame(rows, ["example_id", "predicted", "gold"])
    ).collect()}
    pred_n = Counter(p for _, p, _ in rows)
    gold_n = Counter(g for _, _, g in rows)
    tp = Counter(g for _, p, g in rows if p == g)
    for lab in labels:
        prec = tp[lab] / pred_n[lab] if pred_n[lab] else 0.0
        rec = tp[lab] / gold_n[lab] if gold_n[lab] else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        r = out[lab]
        assert r["support"] == gold_n[lab]
        assert abs(r["precision"] - prec) < 1e-6
        assert abs(r["f1"] - f1) < 1e-6
    acc = sum(tp.values()) / len(rows)
    assert abs(out["__accuracy__"]["precision"] - acc) < 1e-6
    assert out["__accuracy__"]["support"] == len(rows)


def test_char_entropy_goldens(spark):
    import math

    from drugbankner_spark.operators.textanalysis import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert out[1]["entropy"] == 0.0 and out[1]["n_distinct_chars"] == 1
    assert out[2]["entropy"] == round(math.log(2), 6)
    assert out[3]["entropy"] == round(math.log(4), 6)
    assert out[3]["n_chars"] == 4


def test_zipf_slope_recovers_planted_exponent(spark):
    # a synthetic corpus with freq(rank) = round(1000 * rank^-1) fits
    # slope ~ -1 with high r2; a uniform corpus fits slope ~ 0.
    from drugbankner_spark.operators.textanalysis import zipf_slope

    rows = []
    for r in range(1, 60):
        rows.extend(("zipf", f"t{r:03d}") for _ in range(
            max(1, round(1000 / r))))
    for r in range(1, 60):
        rows.extend(("flat", f"t{r:03d}") for _ in range(20))
    docs = spark.createDataFrame(
        [(g, " ".join(t for _ in range(1)))  # one token per row
         for g, t in rows], ["grp", "text"])
    out = {r["grp"]: r for r in
           zipf_slope(docs, group_col="grp").collect()}
    assert -1.1 < out["zipf"]["slope"] < -0.9
    assert out["zipf"]["r2"] > 0.98
    assert abs(out["flat"]["slope"]) < 0.05


def test_dp_noisy_histogram_properties(spark):
    # round 7: Laplace-mechanism release — deterministic per salt,
    # different across salts, noise independent of the count, clamped
    # at 0, noise scale tracks 1/epsilon.
    from drugbankner_spark.operators.privacy import dp_noisy_histogram

    rows = [("a", i) for i in range(1000)] + [("b", i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, x long")
    r1 = {r["g"]: r for r in dp_noisy_histogram(
        df, ["g"], epsilon=1.0, salt="s1"
    ).collect()}
    r1b = {r["g"]: r for r in dp_noisy_histogram(
        df, ["g"], epsilon=1.0, salt="s1"
    ).collect()}
    r2 = {r["g"]: r for r in dp_noisy_histogram(
        df, ["g"], epsilon=1.0, salt="s2"
    ).collect()}
    assert r1 == r1b                       # same salt -> same release
    assert any(r1[g]["noisy_count"] != r2[g]["noisy_count"]
               for g in r1)                # new salt -> fresh draw
    assert r1["a"]["true_count"] == 1000
    # eps=1 noise is small relative to 1000; never negative
    assert abs(r1["a"]["noisy_count"] - 1000) < 50
    assert all(r["noisy_count"] >= 0 for r in r1.values())
    # tiny epsilon -> much larger deviations somewhere across salts
    big_dev = max(
        abs(r["noisy_count"] - r["true_count"])
        for s in ("s1", "s2", "s3", "s4")
        for r in dp_noisy_histogram(
            df, ["g"], epsilon=0.01, salt=s
        ).collect()
    )
    assert big_dev > 50

    import pytest

    with pytest.raises(ValueError):
        dp_noisy_histogram(df, ["g"], epsilon=0.0)


def test_dp_noisy_histogram_user_level_clamp(spark):
    # round 8 (VERDICT r07 next #6): user-level adjacency — per-user
    # contributions clamped to max_contributions ACROSS the histogram,
    # budget spent deterministically in group-key order.
    from drugbankner_spark.operators.privacy import dp_noisy_histogram

    rows = (
        [("a", 1)] * 5 + [("b", 1)] * 4          # user 1: 9 rows
        + [("a", 2)] * 2                          # user 2: 2 rows
        + [("b", 3)] * 1                          # user 3: 1 row
    )
    df = spark.createDataFrame(rows, "g string, u long")
    out = {r["g"]: r for r in dp_noisy_histogram(
        df, ["g"], epsilon=1.0, salt="s",
        contributor_col="u", max_contributions=3,
    ).collect()}
    # user 1 spends its 3-row budget entirely on group 'a' (first in
    # key order); user 2 keeps both 'a' rows; user 3 keeps its 'b' row
    assert out["a"]["true_count"] == 3 + 2
    assert out["b"]["true_count"] == 0 + 1
    # removing ANY single user changes total released mass by <= 3
    # (the sensitivity the Laplace(3/eps) scale claims)
    base = sum(r["true_count"] for r in out.values())
    for drop_u in (1, 2, 3):
        sub = {r["g"]: r for r in dp_noisy_histogram(
            df.filter(F.col("u") != drop_u), ["g"], epsilon=1.0,
            salt="s", contributor_col="u", max_contributions=3,
        ).collect()}
        delta = sum(
            abs(out[g]["true_count"] - sub.get(
                g, {"true_count": 0}
            )["true_count"]) for g in out
        )
        assert delta <= 3, f"user {drop_u} moved L1 mass {delta}"
    assert base == 6
    # noise scale honors sensitivity: same salt+eps, bounded release
    # uses b=3/eps (bigger draws than the row-level b=1/eps somewhere)
    import pytest

    with pytest.raises(ValueError):
        dp_noisy_histogram(df, ["g"], contributor_col="u",
                           max_contributions=0)


def test_fim_transform_psm_and_spm(spark):
    # Round 8: deterministic FIM — parts partition the token stream,
    # counts reconcile, PSM/SPM reorder the same three segments, and
    # the draw is salt-stable.
    from drugbankner_spark.operators.sft import fim_transform

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "single"), (3, "")],
        ["doc_id", "text"],
    )
    psm = {r["doc_id"]: r for r in fim_transform(docs).collect()}
    for did, ntok in [(1, 8), (2, 1), (3, 1)]:
        r = psm[did]
        assert r["n_prefix"] + r["n_middle"] + r["n_suffix"] == ntok
        assert r["n_suffix"] >= 1
        assert r["text_fim"].startswith("<PRE>")
        assert "<SUF>" in r["text_fim"] and "<MID>" in r["text_fim"]
    # the rendered segments are the original tokens in order
    r = psm[1]
    import re
    m = re.match(r"<PRE>(.*)<SUF>(.*)<MID>(.*)", r["text_fim"])
    pre, suf, mid = m.groups()
    assert (pre + " " + mid + " " + suf).split() == list("abcdefgh")
    # SPM reorders the SAME segments
    spm = {r2["doc_id"]: r2 for r2 in
           fim_transform(docs, mode="spm").collect()}
    m2 = re.match(r"<SUF>(.*)<PRE>(.*)<MID>(.*)", spm[1]["text_fim"])
    assert m2.groups() == (suf, pre, mid)
    # same salt -> identical draw; new salt -> some doc moves
    again = {r2["doc_id"]: r2["text_fim"]
             for r2 in fim_transform(docs).collect()}
    assert again == {k: v["text_fim"] for k, v in psm.items()}

    import pytest
    with pytest.raises(ValueError):
        fim_transform(docs, mode="middle-out")


def test_semantic_decontaminate_flags_planted_paraphrase(spark):
    from drugbankner_spark.operators.similarity import (
        semantic_decontaminate,
    )

    bench = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    train = spark.createDataFrame(
        [(10, [0.99, 0.01, 0.0, 0.0]),    # ~bench 1 -> contaminated
         (11, [0.0, 0.0, 1.0, 0.0]),      # orthogonal -> clean
         (12, [0.0, -1.0, 0.0, 0.0])],    # anti-parallel -> clean
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: r for r in semantic_decontaminate(
        train, bench, threshold=0.9
    ).collect()}
    assert out[10]["contaminated"] and out[10]["max_benchmark_sim"] > 0.99
    assert not out[11]["contaminated"]
    assert not out[12]["contaminated"]
    # empty benchmark: nothing flagged, sim NULL
    empty = bench.filter("vec_id < 0")
    out2 = {r["vec_id"]: r for r in semantic_decontaminate(
        train, empty, threshold=0.9
    ).collect()}
    assert all(not r["contaminated"] for r in out2.values())
    assert all(r["max_benchmark_sim"] is None for r in out2.values())


def test_bleu_corpus_clipped_and_geomean(spark):
    # Round 9: the classic clipping example — pred "the the the the
    # the the the" vs ref "the cat is on the mat": clipped unigram
    # matches = 2 (ref holds two "the"), total 7; no bigram matches.
    from math import exp

    from drugbankner_spark.operators.evals import bleu_corpus

    df = spark.createDataFrame(
        [("the the the the the the the", "the cat is on the mat")],
        "prediction string, reference string",
    )
    r = bleu_corpus(df).collect()[0]
    assert (r["match_1"], r["total_1"]) == (2, 7)
    assert (r["match_2"], r["total_2"]) == (0, 6)
    assert r["p_1"] == 2 / 7 and r["p_2"] == 0.0
    assert r["bleu_no_bp"] == 0.0          # unsmoothed: any p_n=0 -> 0
    # pred longer than ref: no brevity penalty
    assert r["bp_log_ratio"] == 0.0

    # perfect match across a two-pair corpus: BLEU exactly 1
    df2 = spark.createDataFrame(
        [("a b c d e", "a b c d e"), ("x y z w q r", "x y z w q r")],
        "prediction string, reference string",
    )
    r2 = bleu_corpus(df2).collect()[0]
    assert r2["bleu_no_bp"] == 1.0 and r2["bp_log_ratio"] == 0.0
    assert all(r2[f"p_{n}"] == 1.0 for n in range(1, 5))

    # corpus pooling + brevity penalty: truncate one pair's pred.
    # stats pool BEFORE dividing (not a mean of sentence BLEUs).
    df3 = spark.createDataFrame(
        [("a b c d", "a b c d e f"), ("p q r s", "p q r s")],
        "prediction string, reference string",
    )
    r3 = bleu_corpus(df3).collect()[0]
    assert (r3["match_1"], r3["total_1"]) == (8, 8)
    assert (r3["match_4"], r3["total_4"]) == (2, 2)
    assert r3["pred_len"] == 8 and r3["ref_len"] == 10
    assert r3["bp_log_ratio"] == 1.0 - 10 / 8
    # the caller-side exp() completes the published definition
    bleu = r3["bleu_no_bp"] * exp(r3["bp_log_ratio"])
    assert abs(bleu - exp(1 - 10 / 8)) < 1e-12


def test_dp_quantiles_accuracy_and_postprocessing(spark):
    # Round 9: with a large epsilon (noise << counts) the noisy-CDF
    # quantiles land on the true ones; bins are monotone in q; and the
    # release covers the full PUBLIC grid (empty bins emit noise too,
    # so the total can exceed the row count).
    from drugbankner_spark.operators.privacy import dp_quantiles

    # 1000 values uniform over [0, 100): true quartiles at 25/50/75
    df = spark.createDataFrame(
        [(float(i % 100) + 0.5,) for i in range(1000)], "value double"
    )
    out = {r["q_permille"]: r for r in dp_quantiles(
        df, "value", lo=0.0, hi=100.0, n_bins=20,
        qs_permille=(250, 500, 750), epsilon=1000.0, salt="t",
    ).collect()}
    assert [out[q]["bin"] for q in (250, 500, 750)] == [4, 9, 14]
    assert out[500]["lower_edge"] == 45.0
    bins = [out[q]["bin"] for q in sorted(out)]
    assert bins == sorted(bins)
    # same release, tiny epsilon: totals differ (real noise) but the
    # output is still a valid monotone CDF readout over the same grid
    noisy = {r["q_permille"]: r for r in dp_quantiles(
        df, "value", lo=0.0, hi=100.0, n_bins=20,
        qs_permille=(250, 500, 750), epsilon=0.05, salt="t",
    ).collect()}
    nb = [noisy[q]["bin"] for q in sorted(noisy)]
    assert nb == sorted(nb)
    assert all(0 <= b <= 19 for b in nb)
    # determinism: same salt, same release
    again = {r["q_permille"]: r["bin"] for r in dp_quantiles(
        df, "value", lo=0.0, hi=100.0, n_bins=20,
        qs_permille=(250, 500, 750), epsilon=0.05, salt="t",
    ).collect()}
    assert again == {q: noisy[q]["bin"] for q in noisy}


def test_dp_quantiles_out_of_domain_clamps(spark):
    # values outside the public domain clamp into the edge bins —
    # they must not vanish (dropping them would leak their existence)
    from drugbankner_spark.operators.privacy import dp_quantiles

    df = spark.createDataFrame(
        [(-5.0,), (1.0,), (2.0,), (999.0,)], "value double"
    )
    out = dp_quantiles(
        df, "value", lo=0.0, hi=10.0, n_bins=10,
        qs_permille=(500,), epsilon=1000.0, salt="t",
    ).collect()[0]
    # 4 rows all inside the grid: total reflects every one of them
    assert out["noisy_total"] >= 4


def test_dp_quantiles_rejects_out_of_range_q(spark):
    # ADVICE r09: q > 1000 (or <= 0) can never satisfy the cum-count
    # readout predicate and used to vanish silently — now validated up
    # front like the epsilon/lo-hi guards.
    import pytest

    from drugbankner_spark.operators.privacy import dp_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(10)], ["v"])
    for bad in (0, -5, 1001):
        with pytest.raises(ValueError, match="qs_permille"):
            dp_quantiles(df, "v", lo=0.0, hi=10.0,
                         qs_permille=(500, bad))
    assert dp_quantiles(
        df, "v", lo=0.0, hi=10.0, qs_permille=(1000,)
    ).count() == 1


def test_hll_exact_accuracy_and_determinism(spark):
    # Round 10: the exact-oracle HLL's estimate lands within ~4 sigma
    # (sigma ~ 1.04/sqrt(256) ~ 6.5%) of the true distinct count, and
    # two independent builds produce IDENTICAL registers + estimate
    # (no randomness anywhere - the md5 kernel is the hash).
    from drugbankner_spark.operators.sketches import (
        hll_exact_distinct,
        hll_exact_registers,
    )

    n_true = 3000
    df = spark.range(n_true * 3).select(
        F.lit("g").alias("grp"), (F.col("id") % n_true).alias("v")
    )
    est = hll_exact_distinct(df, ["grp"], "v").collect()[0]
    assert abs(est["hll_estimate"] - n_true) / n_true < 0.26
    assert est["n_zero_regs"] == 0  # 3000 values >> 256 registers
    r1 = sorted(map(tuple, hll_exact_registers(df, ["grp"], "v").collect()))
    r2 = sorted(map(tuple, hll_exact_registers(df, ["grp"], "v").collect()))
    assert r1 == r2 and len(r1) == 256


def test_hll_exact_merge_equals_single_build(spark):
    # registers are max-mergeable: shard registers union+max to exactly
    # the full-corpus registers, and the merged estimate is identical -
    # the 100 TB incremental-ingest contract (same as cm_merge).
    from drugbankner_spark.operators.sketches import (
        hll_exact_estimate,
        hll_exact_merge,
        hll_exact_registers,
    )

    full = spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("grp"),
        (F.col("id") * 7919 % 997).alias("v"),
    )
    s1 = full.filter(F.col("id") < 700)
    s2 = full.filter((F.col("id") >= 700) & (F.col("id") < 1400))
    s3 = full.filter(F.col("id") >= 1400)
    merged = hll_exact_merge(*[
        hll_exact_registers(s, ["grp"], "v") for s in (s1, s2, s3)
    ])
    direct = hll_exact_registers(full, ["grp"], "v")
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))
    em = sorted(map(tuple,
                    hll_exact_estimate(merged, ["grp"]).collect()))
    ed = sorted(map(tuple,
                    hll_exact_estimate(direct, ["grp"]).collect()))
    assert em == ed


def test_hll_exact_merge_guards_schema_and_width(spark):
    # Round 12 (VERDICT r11 next #6): the merge RAISES on mismatched
    # group schema (plan time) and on registers wider than the declared
    # b_bits (execution time) — no silent wrong estimates.
    import pytest

    from drugbankner_spark.operators.sketches import (
        hll_exact_merge, hll_exact_registers,
    )

    base = spark.range(500).select(
        (F.col("id") % 2).cast("string").alias("grp"),
        F.col("id").alias("v"),
    )
    r8 = hll_exact_registers(base, ["grp"], "v", b_bits=8)
    other = hll_exact_registers(
        base.withColumnRenamed("grp", "lang"), ["lang"], "v", b_bits=8
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        hll_exact_merge(r8, other)
    with pytest.raises(ValueError, match="no register frames"):
        hll_exact_merge()
    with pytest.raises(ValueError, match="not a hll_exact_registers"):
        hll_exact_merge(base)
    # width guard: b_bits=10 registers (reg_idx up to 1023) merged
    # under a declared b_bits=8 raise at execution, not estimate wrong
    r10 = hll_exact_registers(base, ["grp"], "v", b_bits=10)
    with pytest.raises(Exception, match="larger b_bits"):
        hll_exact_merge(r10, b_bits=8).collect()
    # and the guard passes when the declaration matches the fit
    assert hll_exact_merge(r8, b_bits=8).count() > 0


def test_hll_exact_small_sets_and_nulls(spark):
    # tiny cardinalities: raw HLL overestimates are expected (no
    # linear-counting switch by design) but n_zero_regs exposes the
    # regime; nulls are ignored; singleton group has 255 zero regs.
    from drugbankner_spark.operators.sketches import hll_exact_distinct

    df = spark.createDataFrame(
        [("a", "u1"), ("a", "u1"), ("a", None), ("b", "u1"),
         ("b", "u2"), ("b", "u3")],
        "grp string, v string",
    )
    rows = {r["grp"]: r for r in
            hll_exact_distinct(df, ["grp"], "v").collect()}
    assert rows["a"]["n_zero_regs"] == 255
    assert rows["b"]["n_zero_regs"] == 253
    assert rows["a"]["hll_estimate"] > 0


def test_chi2_feature_selection_reference(spark):
    # Round 10: chi2 on a planted two-class corpus equals the textbook
    # 2x2-table statistic computed in Python; the class-marker tokens
    # rank first with the common token scoring 0-ish.
    from drugbankner_spark.operators.textanalysis import (
        chi2_feature_selection,
    )

    docs = []
    for i in range(40):
        lab = "en" if i < 20 else "de"
        marker = "hello" if lab == "en" else "hallo"
        # 'common' appears in every doc; marker in ~all of its class
        docs.append((i, f"common {marker} filler{i % 7}", lab))
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
    out = chi2_feature_selection(df, min_df=3, top_k=5)
    rows = [(r["label"], r["token"], r["chi2"], r["rank"])
            for r in out.collect()]
    top = {lab: tok for lab, tok, _, rk in rows if rk == 1}
    assert top == {"en": "hello", "de": "hallo"}

    def chi2_ref(a, df_t, n_c, n):
        b = df_t - a
        c = n_c - a
        d = n - df_t - n_c + a
        if n - df_t == 0 or n - n_c == 0:
            return 0.0
        return (n * (a * d - b * c) ** 2) / (
            (a + b) * (c + d) * (a + c) * (b + d)
        )

    want = chi2_ref(20, 20, 20, 40)  # 'hello' in every en doc only
    got = [x for lab, tok, x, _ in rows
           if lab == "en" and tok == "hello"][0]
    assert abs(got - want) < 1e-6
    # 'common' is in every doc -> degenerate marginal -> pinned 0
    common = [x for _, tok, x, _ in rows if tok == "common"]
    assert all(x == 0.0 for x in common)


def test_chi2_presence_not_frequency(spark):
    # repeating a token inside one document must not change chi2
    # (document-frequency semantics, sklearn's binarized convention)
    from drugbankner_spark.operators.textanalysis import (
        chi2_feature_selection,
    )

    base = [(i, "alpha beta", "x") for i in range(6)] + \
           [(i + 6, "gamma beta", "y") for i in range(6)]
    rep = [(i, t.replace("alpha", "alpha alpha alpha"), l)
           for i, t, l in base]
    a = chi2_feature_selection(
        spark.createDataFrame(base, ["doc_id", "text", "lang"]),
        min_df=1, top_k=10)
    b = chi2_feature_selection(
        spark.createDataFrame(rep, ["doc_id", "text", "lang"]),
        min_df=1, top_k=10)
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, b.collect()))
