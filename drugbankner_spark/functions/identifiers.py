"""Identifier-pattern extraction (SURVEY.md §2.8 F7; EP2).

The reference scans identifier text with one regex per external database
(CONSTANTS.py:46-62) and — deliberately — builds the candidate CURIE from
the FULL input text, not the matched substring, because "the regex can get
partial matches" (look_for_identifiers.py:27-31). Each match occurrence
contributes one candidate, so a text with three ``HET``-shaped trigrams
yields three identical ``:text`` candidates. Databases with no CURIE
prefix (HET, DPD — CONSTANTS.py:37, 40) produce ``':' + text``.

Engine form: ONE projection evaluates all 15 ``regexp_extract_all`` calls
over a single scan, the per-database match arrays are mapped to
``(database, prefix)`` structs via ``transform`` + ``flatten``, and a
single ``explode`` yields one row per match occurrence — no union, no
re-scan, fully codegen'd JVM-side at any scale. (Round 1 used a 15-branch
union that rescanned the source per database; Catalyst does not merge
those scans, making it 15× the I/O — VERDICT r01.)
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

    Single pass: every match occurrence only contributes its database's
    (database, prefix) pair — the candidate CURIE is built from the FULL
    text, not the matched substring — so each match array is mapped to a
    struct array of equal length, the 15 arrays are flattened, and one
    ``explode`` emits a row per occurrence. One scan, one explode, all
    regexes inside one whole-stage-codegen projection.
    """
    keep = keep_cols if keep_cols is not None else [text_col]
    carry = list(dict.fromkeys([*keep, text_col]))  # text carried through explode

    def hit_struct(db: str, prefix: str):
        # closure factory: F.transform introspects the lambda arity, so the
        # usual default-arg capture trick would read as a 3-arg lambda
        return lambda _m: F.struct(
            F.lit(db).alias("database"), F.lit(prefix).alias("prefix")
        )

    hits = F.flatten(
        F.array(
            *[
                F.transform(
                    # idx=0: whole-match extraction (patterns are group-free,
                    # matching Python findall semantics).
                    F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0)),
                    hit_struct(db, prefix),
                )
                for db, prefix, pattern in IDENTIFIER_PATTERNS
            ]
        )
    )
    from drugbankner_spark.tables import spread_input

    # 15 regex sweeps per row: spread a one-row-group input so the
    # scan stage uses every core (guide §2.5; no-op once inputs split)
    return (
        spread_input(df.select(*[F.col(c) for c in carry]))
        .select(*[F.col(c) for c in carry], F.explode(hits).alias("_hit"))
        .select(
            *[F.col(c) for c in keep],
            F.col("_hit.database").alias("database"),
            F.concat(F.col("_hit.prefix"), F.lit(":"), F.col(text_col)).alias(
                "candidate_curie"
            ),
        )
    )
