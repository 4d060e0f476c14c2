"""End-to-end pipelines (SURVEY.md §3): the reference's three entry
points composed from the engine's operators.

EP1 (perform_NER.py): XML → records → NER alignment of indications +
mechanistic texts. EP2 (look_for_identifiers.py): records → identifier
alignment merged first-writer-wins. EP3 is the Synonymizer API itself.

All stages are lazy DataFrames; ``checkpoint``/``restore`` replace the
reference's pickle restart files (S4) with Parquet. The nested
reference-shaped JSON (one object keyed by KG2 curie) is a sink-time
aggregation — the engine-native interchange format is flat Parquet/JSONL.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drugbankner_spark.functions.normalize import remove_brackets
from drugbankner_spark.operators import ner as NER
from drugbankner_spark.operators.alignment import (
    align_bare_ids,
    align_names,
    merge_mechanistic_nodes,
)
from drugbankner_spark.operators.drugbank import (
    RECORD_TEXT_FIELDS,
    extract_drug_records,
)
from drugbankner_spark.operators.synonymizer import Synonymizer
from drugbankner_spark.sources.xml_source import normalize_drugs, read_drugbank_xml


def mechanistic_text() -> F.Column:
    """The mechanistic-branch source text (perform_NER.py:127-131, X4):
    bracket-stripped text fields concatenated with '\\n ' appended after
    each truthy field.

    The reference intends MOSTLY_TEXT_FIELDS (6 fields, CONSTANTS.py:14-15)
    here, but looks them up with hyphenated keys against an
    underscore-keyed record (perform_NER.py:128 vs utils.py:112-116), so
    mechanism-of-action and protein-binding silently drop out. The engine
    uses the five fields the record actually stores — documented
    divergence (fixes the key-mismatch; protein_binding is not stored in
    the record, faithful to utils.py:112-116)."""
    return F.array_join(
        F.transform(
            F.filter(
                F.array(*[F.coalesce(remove_brackets(F.col(f)), F.lit(""))
                          for f in RECORD_TEXT_FIELDS]),
                lambda c: c != F.lit(""),
            ),
            lambda c: F.concat(c, F.lit("\n ")),
        ),
        "",
    )


def run_ep1(
    spark: SparkSession,
    xml_path: str,
    syn: Synonymizer,
    model_factory: Callable[[], Any],
) -> dict[str, DataFrame]:
    """EP1: returns {'records', 'indication_aligned', 'mechanistic_nodes'}.

    - indication_aligned (perform_NER.py:118-125): NER over
      remove_brackets(indication), disease categories only; drugs with
      falsy indication contribute nothing (empty dict in the reference).
    - mechanistic_nodes (perform_NER.py:127-134): NER over the six text
      fields concatenated with '\\n ' appended after each, mechanistic
      category filter.
    """
    records = extract_drug_records(
        normalize_drugs(read_drugbank_xml(spark, xml_path)), syn
    )

    indication_src = records.filter(
        F.col("indication").isNotNull() & (F.col("indication") != "")
    )
    indication_aligned = NER.text_to_kg2_nodes(
        indication_src,
        remove_brackets(F.col("indication")),
        ["kg2_id"], syn, model_factory,
        NER.DISEASE_CATEGORIES,
    )

    mechanistic_nodes = NER.text_to_kg2_nodes(
        records, mechanistic_text(), ["kg2_id"], syn, model_factory,
        NER.MECHANISTIC_CATEGORIES,
    )
    return {
        "records": records,
        "indication_aligned": indication_aligned,
        "mechanistic_nodes": mechanistic_nodes,
    }


def run_ep2(
    records: DataFrame, mechanistic_nodes: DataFrame, syn: Synonymizer
) -> DataFrame:
    """EP2: merge name hits (J8) and bare-id regex hits (F7→J1) into the
    mechanistic nodes, first-writer-wins (NER nodes outrank both)."""
    names = align_names(records, syn, "kg2_id")
    ids = align_bare_ids(records, syn, "kg2_id")
    return merge_mechanistic_nodes(mechanistic_nodes, names.unionByName(ids), "kg2_id")


def assemble_reference_json(
    records: DataFrame,
    indication_aligned: DataFrame,
    mechanistic_nodes: DataFrame,
) -> DataFrame:
    """Sink shape (S5): one row per drug with the two CURIE-keyed maps
    nested, matching kg2_drug_info.json / DrugBank_aligned_with_KG2.json
    (utils.py:112-121 + perform_NER.py:119-134). ``df.write.json`` emits
    JSONL (engine-native); a single keyed object is a trivial driver-side
    fold over it for small exports."""
    def as_map(df: DataFrame, out: str) -> DataFrame:
        return df.groupBy("kg2_id").agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("curie"),
                            F.struct(F.col("name"), F.col("category")),
                        )
                    )
                )
            ).alias(out)
        )

    ind = as_map(indication_aligned, "indication_NER_aligned")
    mech = as_map(mechanistic_nodes, "mechanistic_intermediate_nodes")
    return (
        records.join(ind, "kg2_id", "left")
        .join(mech, "kg2_id", "left")
        .withColumn(
            "indication_NER_aligned",
            F.coalesce("indication_NER_aligned", F.map_from_arrays(F.array(), F.array())),
        )
        .withColumn(
            "mechanistic_intermediate_nodes",
            F.coalesce("mechanistic_intermediate_nodes", F.map_from_arrays(F.array(), F.array())),
        )
    )


def checkpoint(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """S4: columnar checkpoint replacing the pickle restart files.
    ``fmt`` is any Spark-native columnar format — ``parquet`` (default)
    or ``orc`` (both ship in-core: predicate pushdown, column pruning,
    and min/max stats work identically; ORC matters when the
    surrounding lake is Hive/ORC-standardized)."""
    df.write.mode("overwrite").format(fmt).save(path)


def restore(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)
