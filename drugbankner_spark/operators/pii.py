"""PII detection and redaction (round 6 late) — the scrubbing pass
every public training-data pipeline runs before release (C4 removed
"bad words" pages; The Pile, Dolma, and FineWeb all regex-scrub
emails/IPs/phones; the BigScience ROOTS pipeline made it a named
stage). An engine extension in the E1/E5 family (SURVEY.md §2.12);
the reference has no PII handling at all.

Everything is built-in ``regexp_*`` expressions — pure column code,
zero shuffle, scan-throughput on 100 TB like the C4/Gopher rule
filters. The patterns avoid lookarounds and backreferences on purpose:
they must mean the same thing in Java regex (Spark), RE2 (DuckDB's
regexp engine, which oracles the entries), and the copy a downstream
user pastes into another system.

Redaction is SEQUENTIAL (email → ipv4 → ssn → phone) and the counts
are taken on each intermediate text, so a phone pattern can never
re-match digits that were already inside an email or IP — the
convention is deterministic and documented rather than clever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: name → (pattern, replacement token), applied IN ORDER.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("ipv4",
     r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
     "[IP]"),
    ("ssn",
     r"\b\d{3}-\d{2}-\d{4}\b",
     "[SSN]"),
    ("phone",
     r"\+?\d[\d() -]{7,}\d",
     "[PHONE]"),
)


def pii_scrub(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Redact PII in place and report what was found. Output per doc:
    ``text`` (scrubbed), ``n_<kind>`` match counts per pattern (counted
    on the text as it stood when that pattern ran — the sequential
    convention above), and ``has_pii``. One projection, no shuffle."""
    t = F.col(text_col)
    out_cols = []
    for name, pat, repl in PII_PATTERNS:
        n = F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        out_cols.append(n.alias(f"n_{name}"))
        t = F.regexp_replace(t, pat, repl)
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else (total + c)
    return docs.select(
        F.col(id_col), t.alias("text"), *out_cols
    ).withColumn("has_pii", total > 0)
