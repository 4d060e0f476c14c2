"""Identifier-pattern extraction (SURVEY.md §2.8 F7; EP2).

The reference scans identifier text with one regex per external database
(CONSTANTS.py:46-62) and — deliberately — builds the candidate CURIE from
the FULL input text, not the matched substring, because "the regex can get
partial matches" (look_for_identifiers.py:27-31). Each match occurrence
contributes one candidate, so a text with three ``HET``-shaped trigrams
yields three identical ``:text`` candidates. Databases with no CURIE
prefix (HET, DPD — CONSTANTS.py:37, 40) produce ``':' + text``.

Engine form: one ``explode(regexp_extract_all(...))`` branch per database,
unioned — a single scan feeding 15 codegen'd regex evaluations, no Python.
Ids already containing ``:`` are routed away before extraction
(look_for_identifiers.py:96; P6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (database, CURIE prefix, regex) — the identifier landscape the
#: reference targets (CONSTANTS.py:28-62). Order matters only for
#: deterministic output; the reference iterates dict insertion order.
IDENTIFIER_PATTERNS: list[tuple[str, str, str]] = [
    ("DrugBank", "DRUGBANK", r"DB\d+"),
    ("CAS", "CAS", r"\d{2,7}-\d{2}-\d"),
    ("KEGG Compound", "KEGG.COMPOUND", r"C\d{5}"),
    ("KEGG Drug", "KEGG.DRUG", r"D\d{5}"),
    ("PubChem Compound", "PUBCHEM.COMPOUND", r"\d{4,9}"),
    ("PubChem Substance", "PUBCHEM.SUBSTANCE", r"\d{4,9}"),
    ("ChEBI", "CHEBI", r"\d+"),
    ("PharmGKB", "PHARMGKB", r"PA\d+"),
    ("HET", "", r"\w{3}"),
    ("UniProt", "UNIPROTKB", r"[OPQ][0-9][A-Z0-9]{3}[0-9]"),
    ("GenBank", "GENBANK", r"\w{2}\d{6}"),
    ("DPD", "", r"\d+"),
    ("NDC", "NDC", r"\d{4}-\d{4}-\d{2}"),
    ("SMPDB", "SMPDB", r"SMP\d+"),
    ("PR", "PR", r"P:\d+"),
]


def is_curie(col: Column) -> Column:
    """P6 (look_for_identifiers.py:96): ids already containing ``:`` skip
    regex extraction and go straight to the CURIE lookup path."""
    return col.contains(":")


def extract_identifier_candidates(
    df: DataFrame, text_col: str, keep_cols: list[str] | None = None
) -> DataFrame:
    """Run all identifier regexes over ``text_col``; one output row per
    match occurrence with columns ``database`` and ``candidate_curie``
    (full-text CURIE — see module docstring).

    A union of per-database branches over the same scan: Catalyst merges
    the scans and each branch is a codegen'd regexp — this stays fully
    JVM-side at any scale.
    """
    keep = keep_cols if keep_cols is not None else [text_col]
    carry = list(dict.fromkeys([*keep, text_col]))  # text carried through explode
    branches = []
    for db, prefix, pattern in IDENTIFIER_PATTERNS:
        b = (
            df.select(
                *[F.col(c) for c in carry],
                F.explode(
                    # idx=0: whole-match extraction (patterns are group-free,
                    # matching Python findall semantics).
                    F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
                ).alias("_m"),
            )
            .select(
                *[F.col(c) for c in keep],
                F.lit(db).alias("database"),
                F.concat(F.lit(prefix), F.lit(":"), F.col(text_col)).alias(
                    "candidate_curie"
                ),
            )
        )
        branches.append(b)
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out
