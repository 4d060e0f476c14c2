"""Schwartz–Hearst abbreviation detection (X2) — executable in-engine.

The reference resolves abbreviations with scispaCy's
``AbbreviationDetector`` (NER.py:42-51, ``resolve_abbreviations=True``),
which implements the Schwartz & Hearst algorithm ("A Simple Algorithm
for Identifying Abbreviation Definitions in Biomedical Text", PSB 2003).
The algorithm itself needs no models or external libraries, so the
engine implements it directly: X2 becomes a REAL executable path, not
just a validated config (the scispaCy *linker* still needs the model
download and remains config-contract-checked only).

Algorithm, faithfully:

1. Candidate short forms: parenthesized spans whose text is 2-10 chars,
   at most 2 words, contains a letter, first char alphanumeric.
2. Candidate long form: up to ``min(|sf| + 5, |sf| * 2)`` words
   immediately before the '('.
3. Best long form: scan BOTH strings right-to-left; every alphanumeric
   short-form char must match (case-insensitive), and the short form's
   FIRST char must match at the start of a long-form word.

Spark-side wiring lives in operators/ner.py: ``abbreviation_pairs``
(per-document extraction over Arrow batches) and
``make_abbrev_resolving_factory`` (wraps any NER model so definitions
seen earlier in the document resolve later abbreviated mentions — the
``resolve_abbreviations=True`` semantics).
"""

from __future__ import annotations


def _valid_short_form(sf: str) -> bool:
    if not (2 <= len(sf) <= 10):
        return False
    if len(sf.split()) > 2:
        return False
    if not any(c.isalpha() for c in sf):
        return False
    return sf[0].isalnum()


def _best_long_form(sf: str, lf: str) -> str | None:
    """Right-to-left match per Schwartz-Hearst findBestLongForm."""
    s_i = len(sf) - 1
    l_i = len(lf) - 1
    while s_i >= 0:
        c = sf[s_i].lower()
        if not c.isalnum():
            s_i -= 1
            continue
        # the first short-form char must start a long-form word
        while l_i >= 0 and (
            lf[l_i].lower() != c
            or (s_i == 0 and l_i > 0 and lf[l_i - 1].isalnum())
        ):
            l_i -= 1
        if l_i < 0:
            return None
        l_i -= 1
        s_i -= 1
    start = lf.rfind(" ", 0, l_i + 1) + 1
    out = lf[start:].strip()
    return out or None


def extract_abbreviation_defs(text: str) -> list[tuple[str, str, int]]:
    """All (short_form, long_form, definition_end) triples in ``text``,
    in order of appearance; ``definition_end`` is the index just past the
    closing ')' of the definition site. Handles the dominant
    "long form (SF)" pattern; a long form must contain MORE characters
    than the short form and at most the Schwartz-Hearst word budget."""
    out: list[tuple[str, str, int]] = []
    pos = 0
    n = len(text)
    while True:
        open_p = text.find("(", pos)
        if open_p < 0 or open_p + 1 >= n:
            break
        close_p = text.find(")", open_p + 1)
        if close_p < 0:
            break
        pos = close_p + 1
        sf = text[open_p + 1:close_p].strip()
        if not _valid_short_form(sf):
            continue
        before = text[:open_p].rstrip()
        # sentence-bound the candidate window, then take the word budget
        cut = max(before.rfind("."), before.rfind(";"), before.rfind("!"))
        window = before[cut + 1:].strip()
        words = window.split()
        budget = min(len(sf) + 5, len(sf) * 2)
        candidate = " ".join(words[-budget:]) if words else ""
        if not candidate or len(candidate) <= len(sf):
            continue
        lf = _best_long_form(sf, candidate)
        if lf is not None and len(lf) > len(sf) and lf.lower() != sf.lower():
            out.append((sf, lf, close_p + 1))
    return out


def extract_abbreviation_pairs(text: str) -> list[tuple[str, str]]:
    """All (short_form, long_form) definition pairs in ``text``, in
    order of appearance (see :func:`extract_abbreviation_defs`)."""
    return [(sf, lf) for sf, lf, _ in extract_abbreviation_defs(text)]


def expand_abbreviations(text: str, pairs: list[tuple[str, str]] | None = None) -> str:
    """Replace each defined short form (whole-token occurrences AFTER its
    definition point, longest match wins at a position) with its long
    form — the text-level counterpart of resolve_abbreviations=True.

    Single left-to-right pass over the ORIGINAL text, so a short form
    that happens to appear inside another pair's substituted long form
    is never re-expanded. Definition sites keep the original
    "long form (SF)" text readable by skipping occurrences wrapped in
    parentheses. When ``pairs`` is supplied externally (no offsets
    known), every whole-token occurrence is eligible."""
    import re

    if pairs is None:
        defs = extract_abbreviation_defs(text)
    else:
        defs = [(sf, lf, 0) for sf, lf in pairs]
    if not defs:
        return text
    # first definition wins per short form (first-writer-wins, matching
    # scispaCy's per-doc abbreviation table); longest-first alternation
    # so the regex prefers the longest short form at a position.
    table: dict[str, tuple[str, int]] = {}
    for sf, lf, end in defs:
        table.setdefault(sf, (lf, end))
    alternation = "|".join(
        re.escape(sf) for sf in sorted(table, key=len, reverse=True)
    )
    pattern = re.compile(alternation)
    parts: list[str] = []
    i = 0
    for m in pattern.finditer(text):
        j, after = m.span()
        if j < i:
            continue
        lf, def_end = table[m.group(0)]
        before_ok = j == 0 or not text[j - 1].isalnum()
        after_ok = after >= len(text) or not text[after].isalnum()
        in_parens = j > 0 and text[j - 1] == "(" and (
            after < len(text) and text[after] == ")"
        )
        if j >= def_end and before_ok and after_ok and not in_parens:
            parts.append(text[i:j])
            parts.append(lf)
            i = after
    parts.append(text[i:])
    return "".join(parts)
