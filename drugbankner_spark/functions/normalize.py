"""Normalization kernel (SURVEY.md §2.8 F1-F8/F10, §2.2 P3-P4).

Each function reproduces an exact reference behavior (cited) as a pure
Spark column expression — JVM-side, whole-stage-codegen'd, usable in any
operator without serialization cost. The quirks are deliberate and
semantics-bearing:

- ``simplify_name`` strips ALL Python ``string.punctuation`` +
  ``string.whitespace`` chars after lowercasing (node_synonymizer.py:26,
  425-429) — the synonymizer's name join key.
- ``capitalize_curie_prefix`` uppercases only the text before the FIRST
  colon, preserving later colons; a colon-free input is uppercased whole
  (node_synonymizer.py:387-390).
- ``split_sentences`` is a naive period split (perform_NER.py:22), NOT a
  sentence model — parity with the reference requires the naive split.
- ``delete_long_tokens`` splits on a single space and keeps tokens
  strictly shorter than the limit (utils.py:31-38).
- ``sentence_length_ok`` keeps 15 <= len <= 1000: the reference skips
  ``len > 1000 or len < 15`` (perform_NER.py:24-26).
"""

from __future__ import annotations

import string

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Python's string.punctuation + string.whitespace, the exact char set the
#: reference deletes when simplifying names (node_synonymizer.py:26).
UNNECESSARY_CHARS = string.punctuation + string.whitespace

#: Punctuation the NER stage strips from sentences (NER.py:99-100).
SENTENCE_MARKS = ".,;:?!"


def remove_brackets(col: Column) -> Column:
    """F1 (utils.py:47-53): drop ``[...]`` spans, non-greedy, all occurrences."""
    return F.regexp_replace(col, r"\[.*?\]", "")


def strip_sentence_marks(col: Column) -> Column:
    """F2 (NER.py:99-100): remove ``.,;:?!`` characters."""
    return F.translate(col, SENTENCE_MARKS, "")


def simplify_name(col: Column) -> Column:
    """F3 (node_synonymizer.py:26, 425-429): lowercase, then delete all
    punctuation and whitespace — the precomputed ``name_simplified`` join
    key. Normalizing the query side at plan time (a projection) keeps the
    join an exact equi join with zero runtime fuzziness."""
    return F.translate(F.lower(col), UNNECESSARY_CHARS, "")


def capitalize_curie_prefix(col: Column) -> Column:
    """F4 (node_synonymizer.py:387-390): uppercase the prefix before the
    first ``:``; later colons are preserved verbatim; colon-free input is
    uppercased whole (single-chunk split)."""
    head = F.substring_index(col, ":", 1)
    return F.when(
        ~col.contains(":"), F.upper(col)
    ).otherwise(
        F.concat(
            F.upper(head),
            F.lit(":"),
            # everything after the first colon, colons preserved:
            F.substring(col, F.length(head) + 2, F.length(col)),
        )
    )


def curie_prefix(col: Column) -> Column:
    """F10 (CONSTANTS.py:64-67): the provenance query that produced
    ALL_PREFIXES — text before the first colon."""
    return F.substring_index(col, ":", 1)


def with_prefix(prefix: str, col: Column) -> Column:
    """F8 (utils.py:208 et al.): ``'PFX:' + id`` concatenation. An empty
    prefix still yields ``':' + id`` (look_for_identifiers.py:30-31)."""
    return F.concat(F.lit(prefix), F.lit(":"), col)


def split_sentences(col: Column) -> Column:
    """F5 (perform_NER.py:22): naive ``text.split('.')`` → array."""
    return F.split(col, r"\.")


def delete_long_tokens(col: Column, max_length: int = 100) -> Column:
    """P4 (utils.py:31-38): drop space-delimited tokens with
    ``len(token) >= max_length``, rejoin with single spaces."""
    return F.array_join(
        F.filter(F.split(col, " "), lambda t: F.length(t) < max_length), " "
    )


def sentence_length_ok(col: Column, lo: int = 15, hi: int = 1000) -> Column:
    """P3 (perform_NER.py:24-26): keep ``lo <= len <= hi`` (the reference
    skips ``len > hi or len < lo``)."""
    return (F.length(col) >= lo) & (F.length(col) <= hi)


def concat_text_fields(cols: list[Column], sep: str = "\n ") -> Column:
    """X4 (perform_NER.py:127-131): concatenate truthy text fields, each
    followed by ``'\\n '`` (the reference appends the separator AFTER every
    field, including the last — ``text += field + '\\n '``). NULL and ''
    fields are skipped entirely."""
    arr = F.array(*[F.coalesce(c, F.lit("")) for c in cols])
    return F.array_join(
        F.transform(
            F.filter(arr, lambda c: c != F.lit("")),
            lambda c: F.concat(c, F.lit(sep)),
        ),
        "",
    )
