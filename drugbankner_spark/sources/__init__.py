"""Sources & sinks (SURVEY.md §2.1).

- ``sqlite_snapshot``  S2/S3: one-time SQLite → Parquet dim shred.
- ``xml_source``       S1: DrugBank XML → drugs DataFrame.
- ``sinks``            S4/S5: Parquet checkpoints + JSON record sink.
"""
