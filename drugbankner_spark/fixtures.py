"""Mini-synonymizer fixture (FIXTURES.md B2) — hand-built rows exercising
every reference quirk: CURIEs differing only in prefix case, names
differing only in punctuation/whitespace, a shared name across clusters
with unequal counts (mode vote) and equal counts (tie-break), a suffix
valid under two prefixes, multi-category clusters, and SRI-null nodes.

Used by golden tests AND by the driver-facing ``syn_*`` queries in
``__spark_entry__`` (whose DuckDB oracles embed the same rows as VALUES),
so the synonymizer semantics are hash-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from drugbankner_spark.schemas import CLUSTERS_SCHEMA, EDGES_SCHEMA, NODES_SCHEMA

# (id, id_simplified, name, name_simplified, category, cluster_id,
#  major_branch, name_sri, category_sri, name_kg2pre, category_kg2pre)
NODE_ROWS = [
    ("CHEBI:100", "CHEBI:100", "Aspirin", "aspirin", "Drug", "CHEBI:100",
     "ChemicalEntity", "Aspirin", "Drug", "Aspirin", "Drug"),
    ("drugbank:200", "DRUGBANK:200", "acetyl-salicylic acid!",
     "acetylsalicylicacid", "SmallMolecule", "CHEBI:100",
     "ChemicalEntity", None, None, "ASA kg2", "SmallMolecule"),
    ("MESH:300", "MESH:300", "A.S.P.I.R.I.N", "aspirin", "Drug", "CHEBI:100",
     "ChemicalEntity", None, None, None, None),
    ("CHEBI:101", "CHEBI:101", "Aspirin", "aspirin", "SmallMolecule",
     "CHEBI:101", "ChemicalEntity", "Aspirin", "SmallMolecule", None, None),
    ("RXNORM:400", "RXNORM:400", "Ecotrin", "ecotrin", "Drug", "CHEBI:101",
     "ChemicalEntity", "Ecotrin", "Drug", None, None),
    ("MONDO:500", "MONDO:500", "Headache", "headache", "Disease", "MONDO:500",
     "DiseaseOrPhenotypicFeature", "Headache", "Disease", "Headache",
     "Disease"),
    ("umls:600", "UMLS:600", "head ache", "headache", "PhenotypicFeature",
     "MONDO:500", "DiseaseOrPhenotypicFeature", None, None, "head ache",
     "PhenotypicFeature"),
    ("KEGG.DRUG:700", "KEGG.DRUG:700", "Tiebreak", "tiebreak", "Drug",
     "KEGG.DRUG:700", "ChemicalEntity", None, None, None, None),
    ("KEGG.DRUG:701", "KEGG.DRUG:701", "Tie-Break", "tiebreak", "Drug",
     "KEGG.DRUG:701", "ChemicalEntity", None, None, None, None),
    ("CHEBI:42", "CHEBI:42", "Answer", "answer", "Drug", "CHEBI:42",
     "ChemicalEntity", None, None, None, None),
    ("DRUGBANK:42", "DRUGBANK:42", "DB Answer", "dbanswer", "Drug",
     "DRUGBANK:42", "ChemicalEntity", None, None, None, None),
]

# (cluster_id, name, category, member_ids, intra_cluster_edge_ids)
CLUSTER_ROWS = [
    ("CHEBI:100", "Aspirin", "Drug",
     ["CHEBI:100", "drugbank:200", "MESH:300"], ["E1", "E2"]),
    ("CHEBI:101", "Aspirin(tm)", "SmallMolecule",
     ["CHEBI:101", "RXNORM:400"], ["E3"]),
    ("MONDO:500", "Headache", "Disease", ["MONDO:500", "umls:600"], []),
    ("KEGG.DRUG:700", "Tiebreak", "Drug", ["KEGG.DRUG:700"], []),
    ("KEGG.DRUG:701", "Tie-Break", "Drug", ["KEGG.DRUG:701"], []),
    ("CHEBI:42", "Answer", "Drug", ["CHEBI:42"], []),
    ("DRUGBANK:42", "DB Answer", "Drug", ["DRUGBANK:42"], []),
]

# (id, subject, predicate, object, upstream_resource_id, primary_knowledge_source)
EDGE_ROWS = [
    ("E1", "CHEBI:100", "same_as", "drugbank:200", "infores:a", "infores:x"),
    ("E2", "CHEBI:100", "same_as", "MESH:300", "infores:a", "infores:y"),
    ("E3", "CHEBI:101", "same_as", "RXNORM:400", "infores:b", "infores:x"),
]


def mini_synonymizer_frames(
    spark: SparkSession,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    nodes = spark.createDataFrame(NODE_ROWS, NODES_SCHEMA)
    clusters = spark.createDataFrame(CLUSTER_ROWS, CLUSTERS_SCHEMA)
    edges = spark.createDataFrame(EDGE_ROWS, EDGES_SCHEMA)
    return nodes, clusters, edges


def nodes_values_sql() -> str:
    """The NODE_ROWS as a DuckDB VALUES relation (for oracle parity)."""
    return _values_sql(NODE_ROWS, ["id", "id_simplified", "name",
                                   "name_simplified", "category", "cluster_id",
                                   "major_branch", "name_sri", "category_sri",
                                   "name_kg2pre", "category_kg2pre"])


def clusters_values_sql() -> str:
    rows = []
    for cid, name, cat, members, edge_ids in CLUSTER_ROWS:
        m = "[" + ", ".join(_q(x) for x in members) + "]"
        e = "[" + ", ".join(_q(x) for x in edge_ids) + "]"
        rows.append(f"({_q(cid)}, {_q(name)}, {_q(cat)}, {m}, {e})")
    cols = "cluster_id, name, category, member_ids, intra_cluster_edge_ids"
    return f"(SELECT * FROM (VALUES {', '.join(rows)}) AS t({cols}))"


def _q(v) -> str:
    if v is None:
        return "CAST(NULL AS VARCHAR)"
    return "'" + str(v).replace("'", "''") + "'"


def _values_sql(rows: list[tuple], cols: list[str]) -> str:
    body = ", ".join("(" + ", ".join(_q(v) for v in r) + ")" for r in rows)
    return f"(SELECT * FROM (VALUES {body}) AS t({', '.join(cols)}))"
