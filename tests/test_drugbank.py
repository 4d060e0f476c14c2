"""Golden test: mini DrugBank XML → normalized drugs → KG2-anchored
records, expected values hand-computed from the reference semantics
(utils.py:56-223). Covers FIXTURES.md B1: single vs repeated elements,
missing fields, polypeptide single/list/absent, duplicate pathway ids,
drugs dropped for missing id or synonymizer miss."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drugbankner_spark.fixtures import mini_synonymizer_frames  # noqa: E402
from drugbankner_spark.operators.drugbank import extract_drug_records  # noqa: E402
from drugbankner_spark.operators.synonymizer import Synonymizer  # noqa: E402
from drugbankner_spark.sources.xml_source import (  # noqa: E402
    normalize_drugs,
    read_drugbank_xml,
)

XML_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "mini_drugbank.xml")


@pytest.fixture(scope="module")
def records(spark):
    raw = read_drugbank_xml(spark, XML_PATH)
    drugs = normalize_drugs(raw)
    nodes, clusters, edges = mini_synonymizer_frames(spark)
    out = extract_drug_records(drugs, Synonymizer(nodes, clusters, edges))
    return {r["kg2_id"]: r for r in out.collect()}


def test_drop_semantics(records):
    # 4 drugs in, 2 survive: DB99999 misses the synonymizer (P2/J6 inner
    # join), the last drug has no drugbank-id at all (utils.py:85-88).
    assert set(records) == {"CHEBI:100", "DRUGBANK:42"}


def test_anchor_join_fields(records):
    r = records["CHEBI:100"]
    assert r["drug_bank_id"] == "200"        # primary = first element
    assert r["name"] == "Aspirin"            # cluster preferred name
    assert r["category"] == "biolink:Drug"   # biolink-prefixed
    a = records["DRUGBANK:42"]
    assert a["drug_bank_id"] == "42"
    assert a["name"] == "DB Answer"


def test_text_fields(records):
    r = records["CHEBI:100"]
    assert r["description"] == "A classic drug [see ref 1] with history."
    assert r["pharmacodynamics"] == "Short."
    a = records["DRUGBANK:42"]
    assert a["indication"] == ""              # empty element → empty string
    assert a["description"] is None           # absent element → NULL


def test_bioentity_crawl(records):
    r = records["CHEBI:100"]
    # names: entity names + polypeptide names + gene-names, deduped+sorted;
    # target without polypeptide contributes only its name.
    assert r["targets"]["names"] == sorted([
        "COX-1", "NF-kB", "head ache", "Prostaglandin G/H synthase 1",
        "Prostaglandin G/H synthase 2", "PTGS1", "PTGS2",
    ])
    assert r["targets"]["ids"] == sorted(
        ["BE0001", "BE0002", "BE0003", "P23219", "P35354"]
    )
    assert r["enzymes"]["names"] == sorted(
        ["CYP2C9", "Cytochrome P450 2C9"]
    )  # name == gene-name dedupes to one
    assert r["enzymes"]["ids"] == sorted(["BE0100", "P11712"])
    assert r["carriers"]["names"] == ["Ecotrin"]
    assert r["transporters"]["names"] == ["Answer transporter"]
    assert r["transporters"]["ids"] == ["42"]
    a = records["DRUGBANK:42"]
    assert a["carriers"]["names"] == sorted(["Albumin", "ALB", "Serum albumin"])


def test_pathway_crawl(records):
    r = records["CHEBI:100"]
    # duplicate SMPDB id deduped; enzymes NOT deduped (utils.py:200-203)
    assert r["pathway_ids"] == ["SMPDB:SMP00083"]
    assert r["pathway_enzyme_ids"] == [
        "UniProtKB:P23219", "UniProtKB:P35354", "UniProtKB:P23219"
    ]
    a = records["DRUGBANK:42"]
    assert a["pathway_ids"] == ["SMPDB:SMP00001"]
    assert a["pathway_enzyme_ids"] == []
