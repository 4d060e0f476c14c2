"""Schwartz–Hearst abbreviation detection (functions/abbrev.py) and its
NER wiring (X2 — operators/ner.py). Golden cases follow the examples in
Schwartz & Hearst (PSB 2003); the resolving factory mirrors scispaCy's
resolve_abbreviations=True semantics over the stub model."""

from __future__ import annotations

from drugbankner_spark.functions.abbrev import (
    expand_abbreviations,
    extract_abbreviation_pairs,
)


def test_classic_definition_pairs():
    assert extract_abbreviation_pairs(
        "Heparin-induced thrombocytopenia (HIT) is a complication."
    ) == [("HIT", "Heparin-induced thrombocytopenia")]
    assert extract_abbreviation_pairs(
        "annotated using the Gene Ontology (GO) terms"
    ) == [("GO", "Gene Ontology")]
    assert extract_abbreviation_pairs(
        "elevated alpha-fetoprotein (AFP) levels"
    ) == [("AFP", "alpha-fetoprotein")]


def test_inner_letter_matching_not_just_initials():
    # chars may match INSIDE long-form words (the algorithm's point):
    assert extract_abbreviation_pairs(
        "treated with polymerase chain reaction (PCR) assays"
    ) == [("PCR", "polymerase chain reaction")]
    assert extract_abbreviation_pairs(
        "the cytochrome P450 2C9 (CYP2C9) enzyme"
    ) == [("CYP2C9", "cytochrome P450 2C9")]


def test_rejections():
    # no letters / too long / no preceding long form / mismatch
    assert extract_abbreviation_pairs("published in (2003) by them") == []
    assert extract_abbreviation_pairs("(AFP) with nothing before it") == []
    assert extract_abbreviation_pairs(
        "a completely unrelated phrase (XYZQ) here"
    ) == []
    long_sf = "a parenthetical remark that is way too long to be a short form"
    assert extract_abbreviation_pairs(f"some text ({long_sf}) more") == []


def test_multiple_pairs_and_sentence_boundary():
    text = ("Gene Ontology (GO) curation. Polymerase chain reaction "
            "(PCR) followed.")
    assert extract_abbreviation_pairs(text) == [
        ("GO", "Gene Ontology"), ("PCR", "Polymerase chain reaction"),
    ]
    # the long-form window must not cross the sentence boundary
    assert extract_abbreviation_pairs(
        "We used Gene Ontology. We ran (GO) again."
    ) == []


def test_expand_abbreviations():
    text = ("Heparin-induced thrombocytopenia (HIT) was seen. "
            "HIT resolved after discontinuation.")
    out = expand_abbreviations(text)
    # definition site untouched; later bare mention expanded
    assert out.startswith("Heparin-induced thrombocytopenia (HIT)")
    assert "Heparin-induced thrombocytopenia resolved after" in out
    # substrings inside words are never replaced
    assert expand_abbreviations(
        "Gene Ontology (GO) and GOING strong; GO terms."
    ).count("GOING") == 1


def test_abbrev_resolving_factory_links_short_form():
    from drugbankner_spark.operators.ner import (
        make_abbrev_resolving_factory,
        make_stub_model_factory,
    )

    base = make_stub_model_factory(
        {"heparin-induced thrombocytopenia": ["MESH:D1"],
         "thrombocytopenia": ["MESH:D2"]}
    )
    model = make_abbrev_resolving_factory(base)()
    out = model("Heparin-induced thrombocytopenia (HIT) was observed")
    # base detections preserved; SF inherits the long form's links
    assert out["heparin-induced thrombocytopenia"] == {"MESH:D1"}
    assert out["HIT"] == {"MESH:D1", "MESH:D2"}
    # no definition in sentence → wrapper adds nothing
    assert "HIT" not in model("HIT was observed later on")


def test_abbreviation_pairs_operator(spark):
    from drugbankner_spark.operators.ner import abbreviation_pairs

    docs = spark.createDataFrame(
        [(1, "Gene Ontology (GO) curation with alpha-fetoprotein (AFP)."),
         (2, "no definitions here"),
         (3, None)],
        "doc_id long, text string",
    )
    rows = {(r["doc_id"], r["abbreviation"], r["long_form"])
            for r in abbreviation_pairs(docs, "text", ["doc_id"]).collect()}
    assert rows == {
        (1, "GO", "Gene Ontology"),
        (1, "AFP", "alpha-fetoprotein"),
    }


def test_detect_entities_with_abbrev_config_end_to_end(spark):
    # the wrapped factory runs through the real mapInPandas UDTF — the
    # full X1+X2 path with zero external dependencies
    from drugbankner_spark.operators.ner import (
        detect_entities,
        make_abbrev_resolving_factory,
        make_stub_model_factory,
    )

    sentences = spark.createDataFrame(
        [(1, "Heparin-induced thrombocytopenia (HIT) was observed"),
         (2, "later HIT recurred")],
        "sid long, sentence string",
    )
    factory = make_abbrev_resolving_factory(
        make_stub_model_factory(
            {"heparin-induced thrombocytopenia": ["MESH:D1"]}
        )
    )
    got = {(r["sid"], r["entity_text"], r["kb_id"])
           for r in detect_entities(
               sentences, "sentence", ["sid"], factory).collect()}
    assert (1, "HIT", "MESH:D1") in got
    assert (1, "heparin-induced thrombocytopenia", "MESH:D1") in got
    # sentence 2 has no in-sentence definition: nothing detected
    assert (2, None, None) in got


def test_expand_only_after_definition_point():
    # ADVICE r04: an SF occurrence BEFORE its definition site must stay
    # untouched — the table only applies from the definition onward.
    from drugbankner_spark.functions.abbrev import expand_abbreviations

    text = "HIT was suspected. Heparin-induced thrombocytopenia (HIT) confirmed; HIT persisted."
    out = expand_abbreviations(text)
    assert out.startswith("HIT was suspected")  # pre-definition untouched
    assert out.endswith("Heparin-induced thrombocytopenia persisted.")
    # definition site itself stays readable
    assert "(HIT)" in out


def test_expand_no_cascading_substitution():
    # ADVICE r04: a short form appearing inside another pair's
    # substituted long form must not be re-expanded (single pass over
    # the ORIGINAL text).
    from drugbankner_spark.functions.abbrev import expand_abbreviations

    # "GO" appears inside "GO term"; expanding AB -> "the GO term" must
    # not then expand that embedded GO.
    pairs = [("AB", "the GO term"), ("GO", "Gene Ontology")]
    out = expand_abbreviations("AB and GO here", pairs)
    assert out == "the GO term and Gene Ontology here"


def test_expand_external_pairs_keep_all_occurrences():
    # with caller-supplied pairs there are no offsets: every whole-token
    # occurrence is eligible (documented behavior).
    from drugbankner_spark.functions.abbrev import expand_abbreviations

    assert expand_abbreviations("GO before GO", [("GO", "Gene Ontology")]) == \
        "Gene Ontology before Gene Ontology"
