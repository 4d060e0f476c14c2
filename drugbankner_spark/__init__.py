"""drugbankner_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of KoslickiLab/DrugBankNER, re-expressed
Spark-first (DataFrame/SQL/Catalyst), extended with LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
and designed for 100 TB scale.

Package layout
--------------
- ``session``    SparkSession builder (AQE, Arrow, UTC, tuned shuffle).
- ``tables``     loaders for the harness parquet tables.
- ``schemas``    explicit StructTypes (DrugBank record, synonymizer dims).
- ``functions``  pure column-expression kernels (normalization, identifiers,
                 text analysis) — all JVM-side, Catalyst-optimizable.
- ``operators``  composable DataFrame transformations: synonymizer join
                 family, DrugBank extraction, NER stage, dedup, similarity,
                 relational wrappers.
- ``sources``    XML / SQLite-snapshot / CSV / JSON ingest + sinks.
- ``streaming``  Structured Streaming surface over the batch kernels.
- ``plans``      plan-introspection helpers (pushdown/broadcast assertions).
"""

__version__ = "0.1.0"
