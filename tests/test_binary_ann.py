"""1-bit quantization + Hamming top-k goldens (round 7).

Hand-checked packing and distances; the cross-engine hash oracle is
``e2_hamming_topk`` (round-8 pool) in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from drugbankner_spark.operators.similarity import (
    binary_quantize,
    hamming_topk,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_binary_quantize_packing(spark):
    # dims 0 and 33 positive -> bit 0 of word 0 and bit 1 of word 1.
    v = [0.0] * 64
    v[0] = 1.0
    v[33] = 0.5
    v[63] = 2.0                          # bit 31 of word 1
    rows = {r["vec_id"]: r["code"]
            for r in binary_quantize(_vecs(spark, [(1, v)])).collect()}
    assert rows[1] == [1, 2 + (1 << 31)]
    # zero/negative dims contribute nothing; all-negative packs to 0s
    rows0 = {r["vec_id"]: r["code"] for r in binary_quantize(
        _vecs(spark, [(2, [-1.0] * 64)])).collect()}
    assert rows0[2] == [0, 0]


def test_hamming_topk_distances_and_ties(spark):
    base = [1.0] * 64                     # all bits set
    flip3 = list(base); flip3[5] = flip3[9] = flip3[40] = -1.0
    flip1 = list(base); flip1[63] = -1.0
    flip1b = list(base); flip1b[0] = -1.0  # also distance 1 -> tie
    codes = binary_quantize(_vecs(spark, [
        (0, base), (1, flip1), (2, flip3), (3, flip1b),
    ]))
    got = [(r["neighbor_id"], r["hamming"], r["rank"])
           for r in hamming_topk(
               codes, codes.filter(F.col("vec_id") == 0), k=3
           ).orderBy("rank").collect()]
    # ties at distance 1 break by neighbor id ascending
    assert got == [(1, 1, 1), (3, 1, 2), (2, 3, 3)]


def test_hamming_matches_python_popcount(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.choice([-1.0, 1.0]) for _ in range(64)])
            for i in range(20)]
    codes = binary_quantize(_vecs(spark, rows))
    got = {(r["query_id"], r["neighbor_id"]): r["hamming"]
           for r in hamming_topk(
               codes, codes.filter(F.col("vec_id") < 3), k=19
           ).collect()}
    bits = {i: [1 if x > 0 else 0 for x in v] for i, v in rows}
    for (q, n), d in got.items():
        want = sum(a != b for a, b in zip(bits[q], bits[n]))
        assert d == want


def test_rerank_funnel_equals_exact_when_shortlist_covers_all(spark):
    # With shortlist_k >= corpus size the funnel must return exactly
    # cosine_topk's answer — the funnel only ever PRUNES.
    import random

    from drugbankner_spark.operators.similarity import (
        cosine_topk,
        rerank_topk,
    )

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)])
            for i in range(30)]
    emb = _vecs(spark, rows)
    q = emb.filter(F.col("vec_id") < 3)
    got = sorted(map(tuple, rerank_topk(
        emb, q, shortlist_k=29, k=5
    ).collect()))
    want = sorted(map(tuple, cosine_topk(emb, q, k=5).collect()))
    assert got == want


def test_hamming_band_pairs_recall_1_at_radius(spark):
    # Pigeonhole: 4 bands of 16 bits over 2-word codes -> every pair
    # within Hamming distance 3 shares a band; banded == brute force.
    import random

    from drugbankner_spark.operators.similarity import (
        binary_quantize,
        hamming_band_pairs,
    )

    rng = random.Random(23)
    rows = []
    for i in range(20):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((i, v))
        # plant a <=2-bit-flip clone of each vector
        w = list(v)
        for j in rng.sample(range(64), 2):
            w[j] = -w[j]
        rows.append((i + 1000, w))
    emb = _vecs(spark, rows)
    codes = binary_quantize(emb)
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in hamming_band_pairs(codes, max_hamming=3).collect()}
    bits = {i: [1 if x > 0 else 0 for x in v] for i, v in rows}
    want = {}
    ids = sorted(bits)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            d = sum(x != y for x, y in zip(bits[a], bits[b]))
            if d <= 3:
                want[(a, b)] = d
    assert got == want
    assert all((i, i + 1000) in got for i in range(20))


def test_hamming_band_pairs_rejects_uncovered_radius(spark):
    import pytest

    from drugbankner_spark.operators.similarity import (
        binary_quantize,
        hamming_band_pairs,
    )

    emb = _vecs(spark, [(1, [0.5] * 64), (2, [-0.5] * 64)])
    codes = binary_quantize(emb)
    with pytest.raises(ValueError):
        hamming_band_pairs(codes, max_hamming=4, band_bits=16)
    with pytest.raises(ValueError):
        hamming_band_pairs(codes, band_bits=24)


def test_hamming_band_pairs_empty_corpus(spark):
    from drugbankner_spark.operators.similarity import (
        binary_quantize,
        hamming_band_pairs,
    )

    emb = _vecs(spark, [(1, [0.5] * 64)]).filter("vec_id < 0")
    codes = binary_quantize(emb)
    out = hamming_band_pairs(codes, max_hamming=3)
    assert out.columns == ["id_a", "id_b", "hamming"]
    assert out.count() == 0


def test_srp_sketch_is_angle_lsh(spark):
    # Round 9: SRP bits estimate ANGLE — a noisy copy of v must land
    # at a smaller Hamming distance from v than a random vector does
    # (P[bit differs] = theta/pi, Charikar 2002). Deterministic
    # fixture: base vector, a 5%-perturbed copy, and an unrelated one.
    import math
    import random

    from drugbankner_spark.operators.similarity import (
        hamming_topk,
        srp_sketch,
        srp_sign_matrix,
    )

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    near = [x + rng.uniform(-0.05, 0.05) for x in base]
    far = [rng.uniform(-1, 1) for _ in range(64)]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)],
        "vec_id long, embedding array<float>",
    )
    codes = srp_sketch(df, n_bits=64, dim=64)
    rows = {r["vec_id"]: r["code"] for r in codes.collect()}
    assert all(len(c) == 2 for c in rows.values())
    assert all(0 <= w < (1 << 32) for c in rows.values() for w in c)

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    assert ham(rows[0], rows[1]) < ham(rows[0], rows[2])
    # the near pair flips ~theta/pi of 64 bits: a 5% perturbation is
    # well under 45 degrees, so fewer than half the bits differ
    assert ham(rows[0], rows[1]) < 16

    # codes drop straight into the integer Hamming machinery
    topk = hamming_topk(codes, codes.filter("vec_id = 0"), k=2).collect()
    assert [r["neighbor_id"] for r in sorted(topk, key=lambda r: r["rank"])] == [1, 2]

    # the sign matrix is deterministic and balanced-ish
    m = srp_sign_matrix(64, 64)
    assert m == srp_sign_matrix(64, 64)
    flat = [s for row in m for s in row]
    assert abs(sum(flat)) < len(flat) * 0.2


def test_srp_sketch_raises_on_short_vector(spark):
    # ADVICE r09: a vector shorter than `dim` used to NULL out the
    # projection sums and emit a degenerate all-zero code — now the
    # used expression path raises.
    import pytest

    from drugbankner_spark.operators.similarity import srp_sketch

    df = spark.createDataFrame(
        [(0, [0.5] * 8)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="srp_sketch"):
        srp_sketch(df, n_bits=32, dim=64).collect()


def test_rerank_k0_returns_empty_not_error(spark):
    # Round-13 review finding: routing the rerank tails through
    # sharded_topk (which validates k >= 1) changed the public k=0
    # contract from "empty result" to a ValueError naming an internal
    # function. The short-circuit restores it — schema intact.
    from pyspark.sql import functions as F

    from drugbankner_spark.operators.similarity import cosine_topk

    vecs = spark.createDataFrame(
        [(f"v{i}", [float(i), 1.0]) for i in range(6)],
        "vec_id string, embedding array<double>",
    )
    out = cosine_topk(vecs, vecs.limit(2), k=0)
    assert out.count() == 0
    assert out.columns[-1] == "rank"
