"""Hypothesis property tests (SURVEY.md §5.3): the column kernels match
their executable Python specs on randomized inputs, batched into one
Spark job per example set to keep runtime sane."""

from __future__ import annotations

import os
import re
import string
import sys

from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from drugbankner_spark.functions import normalize as N  # noqa: E402

ALPHABET = (
    string.ascii_letters + string.digits + string.punctuation
    + " \t\n" + "éüñ漢字"
)
texts = st.lists(
    st.text(alphabet=ALPHABET, max_size=60), min_size=1, max_size=25
)


def _spark():
    from drugbankner_spark.session import get_spark

    return get_spark(app_name="props", shuffle_partitions=4)


def _apply(rows, col_expr):
    spark = _spark()
    df = spark.createDataFrame([(i, s) for i, s in enumerate(rows)], ["i", "s"])
    out = df.select("i", col_expr(F.col("s")).alias("v")).collect()
    return [r["v"] for r in sorted(out, key=lambda r: r["i"])]


@settings(max_examples=5, deadline=None)
@given(texts)
def test_simplify_matches_spec(rows):
    got = _apply(rows, N.simplify_name)
    table = {ord(c): None for c in string.punctuation + string.whitespace}
    assert got == [s.lower().translate(table) for s in rows]


@settings(max_examples=5, deadline=None)
@given(texts)
def test_cap_prefix_matches_spec(rows):
    got = _apply(rows, N.capitalize_curie_prefix)

    def spec(s):
        ch = s.split(":")
        ch[0] = ch[0].upper()
        return ":".join(ch)

    assert got == [spec(s) for s in rows]


@settings(max_examples=5, deadline=None)
@given(texts)
def test_remove_brackets_matches_spec(rows):
    got = _apply(rows, N.remove_brackets)
    assert got == [re.sub(r"\[.*?\]", "", s) for s in rows]


@settings(max_examples=5, deadline=None)
@given(texts, st.integers(min_value=1, max_value=20))
def test_delete_long_tokens_matches_spec(rows, n):
    got = _apply(rows, lambda c: N.delete_long_tokens(c, n))
    assert got == [
        " ".join(t for t in s.split(" ") if len(t) < n) for s in rows
    ]


@settings(max_examples=5, deadline=None)
@given(texts)
def test_simplify_is_idempotent(rows):
    once = _apply(rows, N.simplify_name)
    twice = _apply(once, N.simplify_name)
    assert once == twice


@settings(max_examples=5, deadline=None)
@given(
    st.lists(  # left events: (key, ts-offset seconds)
        st.tuples(st.integers(0, 3), st.integers(0, 5000)),
        min_size=1, max_size=30,
    ),
    st.lists(  # right events: (key, ts-offset, payload)
        st.tuples(st.integers(0, 3), st.integers(0, 5000),
                  st.integers(-100, 100)),
        min_size=0, max_size=30,
    ),
)
def test_asof_matches_pandas_merge_asof(left_rows, right_rows):
    # executable spec: pandas merge_asof (backward, inclusive, by key)
    import datetime as dt

    import pandas as pd

    from drugbankner_spark.operators.temporal import asof_join

    base = dt.datetime(2024, 1, 1)
    spark = _spark()
    left = spark.createDataFrame(
        [(i, k, base + dt.timedelta(seconds=s))
         for i, (k, s) in enumerate(left_rows)],
        "event_id long, k long, ts timestamp",
    )
    # the as-of contract: right unique per (key, ts) — dedup like the
    # demo query does (max payload)
    rdedup = {}
    for k, s, p in right_rows:
        key = (k, s)
        rdedup[key] = max(p, rdedup.get(key, p))
    right = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=s), float(p))
         for (k, s), p in sorted(rdedup.items())],
        "k long, ts timestamp, payload double",
    )
    got = {
        r["event_id"]: (r["matched_ts"], r["payload"])
        for r in asof_join(left, right, on="k", left_ts="ts").collect()
    }

    lpdf = pd.DataFrame(
        [(i, k, base + dt.timedelta(seconds=s))
         for i, (k, s) in enumerate(left_rows)],
        columns=["event_id", "k", "ts"],
    ).sort_values(["ts", "event_id"])
    rpdf = pd.DataFrame(
        [(k, base + dt.timedelta(seconds=s), float(p))
         for (k, s), p in sorted(rdedup.items())]
        or None,
        columns=["k", "ts", "payload"],
    ).sort_values(["ts", "k"])
    if len(rpdf):
        spec = pd.merge_asof(
            lpdf, rpdf, on="ts", by="k", direction="backward",
            suffixes=("", "_r"),
        )
        # merge_asof keeps only the left ts, so the spec checks payload;
        # matched_ts itself is pinned by the golden tests.
        want = {
            int(r.event_id): None if pd.isnull(r.payload) else r.payload
            for r in spec.itertuples()
        }
        for eid, pay in want.items():
            assert got[eid][1] == pay, (eid, got[eid], pay)
    else:
        assert all(v == (None, None) for v in got.values())
    assert len(got) == len(left_rows)


# --- codec round-trip properties (no Spark needed: pure kernels) --------


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    ch=st.sampled_from([1, 3, 4]),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, ch, data):
    from drugbankner_spark.functions import png_codec as png

    pixels = bytes(
        data.draw(st.lists(
            st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
        ))
    )
    img = png.decode_png(png.encode_png(pixels, w, h, ch))
    assert (img["width"], img["height"], img["channels"]) == (w, h, ch)
    assert img["pixels"] == pixels


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 200),
    rate=st.sampled_from([8_000, 16_000, 44_100]),
    data=st.data(),
)
def test_wav_roundtrip_property(n, rate, data):
    import math

    from drugbankner_spark.functions import wav_codec as wav

    samples = data.draw(st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
        min_size=n, max_size=n,
    ))
    out = wav.decode_wav(wav.encode_wav(samples, rate, 1))
    assert out["n_frames"] == n and out["sample_rate"] == rate
    want_rms = math.sqrt(sum(s * s for s in samples) / n)
    assert abs(out["rms"] - want_rms) <= 1.0 / 32768 + 1e-9


@settings(max_examples=10, deadline=None)
@given(
    names=st.lists(
        st.text(alphabet=string.ascii_lowercase, min_size=3, max_size=10),
        min_size=1, max_size=8, unique=True,
    ),
    probes=st.lists(
        st.text(alphabet=string.ascii_lowercase, min_size=3, max_size=10),
        min_size=1, max_size=8, unique=True,
    ),
)
def test_fuzzy_join_property_vs_bruteforce(names, probes):
    # blocked fuzzy join == brute-force levenshtein filter RESTRICTED to
    # the block (same first char + |len diff| co-bucketed) — the
    # blocking contract, validated on random strings
    from drugbankner_spark.operators.relational import fuzzy_join

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    def blocked(p, n):
        if p[0] != n[0]:
            return False
        return abs(len(p) // 3 - len(n) // 3) <= 1

    want = {(p, n, lev(p, n)) for p in probes for n in names
            if blocked(p, n) and lev(p, n) <= 2}
    spark = _spark()
    got = {tuple(r) for r in fuzzy_join(
        spark.createDataFrame([(p,) for p in probes], ["probe"]),
        spark.createDataFrame([(n,) for n in names], ["name"]),
        "probe", "name",
    ).collect()}
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 3]),
    quality=st.sampled_from([50, 85, 95]),
    data=st.data(),
)
def test_jpeg_roundtrip_property(w, h, ch, quality, data):
    # JPEG is lossy: round-trips assert shape + determinism + a loose
    # error bound (worst case is uniform random noise, which DCT
    # compresses worst)
    import numpy as np

    from drugbankner_spark.functions import jpeg_codec as J

    pixels = bytes(
        data.draw(st.lists(
            st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
        ))
    )
    enc = J.encode_jpeg(pixels, w, h, ch, quality=quality)
    assert enc == J.encode_jpeg(pixels, w, h, ch, quality=quality)
    out = J.decode_jpeg(enc)
    assert (out["width"], out["height"], out["channels"]) == (w, h, ch)
    assert len(out["samples"]) == w * h * ch
    a = np.frombuffer(out["samples"], np.uint8).astype(float)
    b = np.frombuffer(pixels, np.uint8).astype(float)
    mse = ((a - b) ** 2).mean()
    psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-12))
    assert psnr > 12.0, psnr  # even q=50 RGB noise stays far above this


@settings(max_examples=15, deadline=None)
@given(
    n_frames=st.integers(1, 12),
    fps=st.sampled_from([10, 24, 30]),
    n_sample=st.integers(1, 15),
)
def test_avi_container_roundtrip_property(n_frames, fps, n_sample):
    from drugbankner_spark.functions import avi_codec as A
    from drugbankner_spark.functions import jpeg_codec as J

    frames = [
        J.encode_jpeg(bytes(((x + 7 * i) % 256) for x in range(64)), 8, 8, 1)
        for i in range(n_frames)
    ]
    data = A.encode_avi(frames, 8, 8, fps=fps)
    out = A.decode_avi_frames(data)
    # container round-trip is LOSSLESS: payloads byte-identical, indices
    # sequential, timestamps from the header clock
    assert [p for _, _, p in out] == frames
    assert [i for i, _, _ in out] == list(range(n_frames))
    assert all(
        t == (i * (1_000_000 // fps)) // 1000 for i, t, _ in out
    )
    picked = A.sample_avi_frames(data, n_sample)
    assert len(picked) == min(n_sample, n_frames)
    idxs = [i for i, _, _ in picked]
    assert idxs == sorted(set(idxs))  # strictly increasing, no dups


@given(
    st.lists(
        st.text(alphabet="abcde", min_size=0, max_size=10),
        min_size=2, max_size=2,
    )
)
@settings(max_examples=200, deadline=None)
def test_jaro_winkler_kernel_properties(pair):
    # symmetry, range, identity, and DuckDB-builtin agreement — the
    # cross-engine convention is a property, not a fixture.
    import duckdb

    from drugbankner_spark.functions.stringsim import jaro_winkler_py

    a, b = pair
    s = jaro_winkler_py(a, b)
    assert 0.0 <= s <= 1.0
    assert s == jaro_winkler_py(b, a)
    if a == b and a:
        assert s == 1.0
    with duckdb.connect() as con:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
    assert abs(s - want) < 1e-12


@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=8),
        min_size=1, max_size=12,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=50, deadline=None)
def test_greedy_wordpiece_reassembles_or_unks(words, max_len):
    # for any vocab containing the full alphabet, greedy segmentation
    # either reassembles the word exactly (## stripped) or yields [UNK]
    # only when the word exceeds the char cap.
    from drugbankner_spark.operators.wordpiece import (
        MAX_WORD_CHARS,
        greedy_wordpiece,
    )

    vocab = {"a", "b", "##a", "##b", "ab", "##ab", "##ba"}
    for w in words:
        toks = greedy_wordpiece(w, vocab, max_len)
        if len(w) > MAX_WORD_CHARS:
            assert toks == ["[UNK]"]
        else:
            rebuilt = toks[0] + "".join(t[2:] for t in toks[1:])
            assert rebuilt == w
            assert all(t.startswith("##") for t in toks[1:])
            assert not toks[0].startswith("##")


@given(st.lists(
    st.sampled_from([
        "word", "a@b.io", "10.0.3.7", "123-45-6789",
        "+1 555 123 4567", "x9", ".", "{",
    ]),
    min_size=1, max_size=12,
))
@settings(max_examples=20, deadline=None)
def test_pii_scrub_idempotent(parts):
    # scrubbing is idempotent: replacement tokens contain no digits or
    # @, so a second pass never fires. One shared session, one pass.
    from drugbankner_spark.operators.pii import pii_scrub

    spark = _spark()
    text = " ".join(parts)
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    once = pii_scrub(df).collect()[0]
    twice = pii_scrub(
        spark.createDataFrame([(0, once["text"])], ["doc_id", "text"])
    ).collect()[0]
    assert twice["text"] == once["text"]
    assert twice["has_pii"] is False or once["text"] == text
