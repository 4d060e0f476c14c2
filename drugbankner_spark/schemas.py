"""Explicit StructTypes (SURVEY.md §1).

The reference is schemaless (duck-typed dicts, ``isinstance`` branching);
the engine declares every shape up front and fails fast. Repeated XML
elements are always arrays — this removes the xmltodict dict-or-list
polymorphism (utils.py:81-84, 142-168, 176-200) by construction.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


S = T.StringType()
A_S = T.ArrayType(T.StringType())

# --- synonymizer dims (FIXTURES.md B2; node_synonymizer.py SQL shapes) ----

NODES_SCHEMA = _s(
    _f("id", S), _f("id_simplified", S),
    _f("name", S), _f("name_simplified", S),
    _f("category", S), _f("cluster_id", S), _f("major_branch", S),
    _f("name_sri", S), _f("category_sri", S),
    _f("name_kg2pre", S), _f("category_kg2pre", S),
)

CLUSTERS_SCHEMA = _s(
    _f("cluster_id", S), _f("name", S), _f("category", S),
    _f("member_ids", A_S), _f("intra_cluster_edge_ids", A_S),
)

EDGES_SCHEMA = _s(
    _f("id", S), _f("subject", S), _f("predicate", S), _f("object", S),
    _f("upstream_resource_id", S), _f("primary_knowledge_source", S),
)

# --- DrugBank drug record (FIXTURES.md B1; utils.py:56-126) ---------------

POLYPEPTIDE = _s(_f("name", S), _f("gene_name", S), _f("id", S))

BIOENTITY = _s(
    _f("name", S), _f("id", S),
    _f("polypeptide", T.ArrayType(POLYPEPTIDE)),
)

PATHWAY = _s(_f("smpdb_id", S), _f("enzyme_uniprot_ids", A_S))

DRUG_SCHEMA = _s(
    _f("drugbank_ids", A_S),                    # primary = element 0
    _f("name", S),
    _f("description", S), _f("indication", S), _f("pharmacodynamics", S),
    _f("mechanism_of_action", S), _f("metabolism", S), _f("protein_binding", S),
    _f("targets", T.ArrayType(BIOENTITY)),
    _f("enzymes", T.ArrayType(BIOENTITY)),
    _f("carriers", T.ArrayType(BIOENTITY)),
    _f("transporters", T.ArrayType(BIOENTITY)),
    _f("pathways", T.ArrayType(PATHWAY)),
)

# --- extracted drug record (utils.py:112-121 + joins) ---------------------

NAMES_IDS = _s(_f("names", A_S), _f("ids", A_S))

KG2_DRUG_SCHEMA = _s(
    _f("kg2_id", S), _f("name", S), _f("category", S), _f("drug_bank_id", S),
    _f("description", S), _f("indication", S), _f("pharmacodynamics", S),
    _f("mechanism_of_action", S), _f("metabolism", S),
    _f("targets", NAMES_IDS), _f("enzymes", NAMES_IDS),
    _f("carriers", NAMES_IDS), _f("transporters", NAMES_IDS),
    _f("pathway_ids", A_S), _f("pathway_enzyme_ids", A_S),
)
