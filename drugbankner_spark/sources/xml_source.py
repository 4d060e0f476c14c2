"""DrugBank XML source (S1; utils.py:25-28).

The reference materializes the whole ~1.4 GB XML in RAM via
``xmltodict.parse`` and then branches on dict-vs-list shapes everywhere
(utils.py:81-84, 142-168, 176-200). The engine reads the same XML with
Spark's native XML source under an EXPLICIT schema in which every
repeatable element is an array — single and repeated children both land
as arrays, eliminating the polymorphism at ingest. The file is splittable
by rowTag, so a 100× larger dump parallelizes across executors instead of
one process's heap.

``normalize_drugs`` projects the raw XML shape onto the engine's
DRUG_SCHEMA (snake_case, attribute markers stripped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _s(*fields):
    return T.StructType(list(fields))


def _f(name, dtype):
    return T.StructField(name, dtype, True)


S = T.StringType()

_ID_ELEM = _s(_f("_VALUE", S), _f("_primary", S))

_POLYPEPTIDE = _s(_f("_id", S), _f("name", S), _f("gene-name", S))

_BIOENTITY = _s(
    _f("id", S), _f("name", S),
    _f("polypeptide", T.ArrayType(_POLYPEPTIDE)),
)

_PATHWAY = _s(
    _f("smpdb-id", S), _f("name", S),
    _f("enzymes", _s(_f("uniprot-id", T.ArrayType(S)))),
)


def _wrap(singular: str, elem: T.StructType) -> T.StructType:
    return _s(_f(singular, T.ArrayType(elem)))


#: Explicit ingest schema: only the fields the pipeline touches
#: (column pruning starts at the source — unread XML subtrees are skipped).
RAW_DRUG_XML_SCHEMA = _s(
    _f("drugbank-id", T.ArrayType(_ID_ELEM)),
    _f("name", S),
    _f("description", S),
    _f("indication", S),
    _f("pharmacodynamics", S),
    _f("mechanism-of-action", S),
    _f("metabolism", S),
    _f("protein-binding", S),
    _f("targets", _wrap("target", _BIOENTITY)),
    _f("enzymes", _wrap("enzyme", _BIOENTITY)),
    _f("carriers", _wrap("carrier", _BIOENTITY)),
    _f("transporters", _wrap("transporter", _BIOENTITY)),
    _f("pathways", _wrap("pathway", _PATHWAY)),
)


def read_drugbank_xml(spark: SparkSession, path: str) -> DataFrame:
    """Raw read: one row per ``<drug>`` element, explicit schema."""
    return (
        spark.read.format("xml")
        .option("rowTag", "drug")
        .schema(RAW_DRUG_XML_SCHEMA)
        .load(path)
    )


def _bioentity_norm(field: str) -> F.Column:
    singular = field[:-1]  # naive singularization, as the reference (utils.py:136)
    return F.transform(
        F.col(field)[singular],
        lambda e: F.struct(
            e["name"].alias("name"),
            e["id"].alias("id"),
            F.transform(
                F.coalesce(e["polypeptide"], F.array()),
                lambda p: F.struct(
                    p["name"].alias("name"),
                    p["gene-name"].alias("gene_name"),
                    p["_id"].alias("id"),
                ),
            ).alias("polypeptide"),
        ),
    )


def normalize_drugs(raw: DataFrame) -> DataFrame:
    """Raw XML shape → engine DRUG_SCHEMA (schemas.DRUG_SCHEMA)."""
    return raw.select(
        F.transform(F.col("drugbank-id"), lambda e: e["_VALUE"]).alias(
            "drugbank_ids"
        ),
        F.col("name"),
        F.col("description"),
        F.col("indication"),
        F.col("pharmacodynamics"),
        F.col("mechanism-of-action").alias("mechanism_of_action"),
        F.col("metabolism"),
        F.col("protein-binding").alias("protein_binding"),
        _bioentity_norm("targets").alias("targets"),
        _bioentity_norm("enzymes").alias("enzymes"),
        _bioentity_norm("carriers").alias("carriers"),
        _bioentity_norm("transporters").alias("transporters"),
        F.transform(
            F.col("pathways")["pathway"],
            lambda p: F.struct(
                p["smpdb-id"].alias("smpdb_id"),
                F.coalesce(p["enzymes"]["uniprot-id"], F.array()).alias(
                    "enzyme_uniprot_ids"
                ),
            ),
        ).alias("pathways"),
    )
