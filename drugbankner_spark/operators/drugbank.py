"""DrugBank record extraction (EP1 front half; utils.py:56-223).

The reference loops drugs one at a time, opening a NEW synonymizer SQLite
connection per drug (utils.py:209) — the N+1 anti-pattern called out in
SURVEY.md §4. Here the whole corpus is one DataFrame and the KG2 anchor
(J6) is a single broadcast join.

Semantics preserved:
- primary DrugBank id = first ``drugbank-id`` element (utils.py:81-84);
  drugs without one are dropped (:85-88).
- the anchor join is effectively inner: drugs whose ``DRUGBANK:<id>``
  CURIE misses the synonymizer are dropped (:89-91, P2).
- bioentity crawl (:129-169): per field, names = entity name + every
  polypeptide name + gene-name; ids = entity id + polypeptide @ids.
  Missing ``gene-name`` yields NULL in the names list (the reference
  would raise KeyError — known latent defect, NOT replicated; we keep
  the null, SURVEY.md §5).
- pathway crawl (:172-203): ids get ``SMPDB:`` prefix and are deduped;
  enzyme uniprot ids get ``UniProtKB:`` and are NOT deduped (faithful).
- dedup via list(set(...)) loses order in the reference (A5); we pin
  deterministic order with array_sort — documented divergence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from drugbankner_spark.operators.synonymizer import Synonymizer

DRUGBANK_CURIE_PREFIX = "DRUGBANK"  # CONSTANTS.py:1 (DB_PREFIX 'DRUGBANK:')

#: The five free-text fields carried into the record (utils.py:92-96).
RECORD_TEXT_FIELDS = (
    "description", "indication", "pharmacodynamics",
    "mechanism_of_action", "metabolism",
)

BIOENTITY_FIELDS = ("transporters", "enzymes", "targets", "carriers")


def _crawl_names(field: str) -> Column:
    """names = [entity.name] + flatten([p.name, p.gene_name] per polypeptide),
    deduped + sorted (deterministic stand-in for list(set(...)))."""
    ent = F.coalesce(F.col(field), F.array())
    flat = F.flatten(
        F.transform(
            ent,
            lambda e: F.concat(
                F.array(e["name"]),
                F.flatten(
                    F.transform(
                        e["polypeptide"],
                        lambda p: F.array(p["name"], p["gene_name"]),
                    )
                ),
            ),
        )
    )
    return F.array_sort(F.array_distinct(flat))


def _crawl_ids(field: str) -> Column:
    ent = F.coalesce(F.col(field), F.array())
    flat = F.flatten(
        F.transform(
            ent,
            lambda e: F.concat(
                F.array(e["id"]),
                F.transform(e["polypeptide"], lambda p: p["id"]),
            ),
        )
    )
    return F.array_sort(F.array_distinct(flat))


def extract_drug_records(drugs: DataFrame, syn: Synonymizer) -> DataFrame:
    """Normalized drugs (schemas.DRUG_SCHEMA) → KG2-anchored records
    (schemas.KG2_DRUG_SCHEMA). One broadcast join replaces the per-drug
    synonymizer round-trips."""
    with_id = drugs.withColumn(
        "drug_bank_id", F.col("drugbank_ids").getItem(0)
    ).filter(F.col("drug_bank_id").isNotNull())

    anchored = syn.canonical_from_curies(
        with_id.withColumn(
            "_anchor_curie",
            F.concat_ws(":", F.lit(DRUGBANK_CURIE_PREFIX), F.col("drug_bank_id")),
        ),
        "_anchor_curie",
    ).filter(F.col("preferred_curie").isNotNull())  # P2: drop non-matches

    pathways = F.coalesce(F.col("pathways"), F.array())
    return anchored.select(
        F.col("preferred_curie").alias("kg2_id"),
        F.col("preferred_name").alias("name"),
        F.col("preferred_category").alias("category"),
        F.col("drug_bank_id"),
        *[F.col(f) for f in RECORD_TEXT_FIELDS],
        *[
            F.struct(
                _crawl_names(f).alias("names"), _crawl_ids(f).alias("ids")
            ).alias(f)
            for f in BIOENTITY_FIELDS
        ],
        F.array_sort(
            F.array_distinct(
                F.transform(
                    pathways,
                    lambda p: F.concat(F.lit("SMPDB:"), p["smpdb_id"]),
                )
            )
        ).alias("pathway_ids"),
        # NOT deduped — faithful to utils.py:200-203
        F.flatten(
            F.transform(
                pathways,
                lambda p: F.transform(
                    p["enzyme_uniprot_ids"],
                    lambda u: F.concat(F.lit("UniProtKB:"), u),
                ),
            )
        ).alias("pathway_enzyme_ids"),
    )
