"""One-time SQLite → Parquet snapshot of the synonymizer dims (S2/S3).

The reference opens the multi-GB synonymizer SQLite per process (a fresh
connection per drug in the hot loop — utils.py:209) and batches point
lookups through 5,000-key ``IN`` lists (node_synonymizer.py:400-411).
The engine replaces all of that with a ONE-TIME shred of the three tables
to Parquet; afterwards every lookup is a join against columnar dims and
the statement-length workaround is obsolete.

Decodes the reference's storage quirks at snapshot time so they never
reach query plans:

- ``clusters.member_ids`` / ``intra_cluster_edge_ids`` are stringified
  Python lists (node_synonymizer.py:172, 315-318) → real list<string>;
  the ``'nan'`` sentinel (:316) → empty list.

Pure stdlib + pyarrow — no Spark needed for the bootstrap; Spark then
reads the Parquet (tables.load / spark.read.parquet) with full pushdown.
"""

from __future__ import annotations

import ast
import os
import sqlite3

import pyarrow as pa
import pyarrow.parquet as pq

NODE_COLS = [
    "id", "id_simplified", "name", "name_simplified", "category",
    "cluster_id", "major_branch", "name_sri", "category_sri",
    "name_kg2pre", "category_kg2pre",
]
CLUSTER_COLS = ["cluster_id", "name", "category", "member_ids",
                "intra_cluster_edge_ids"]
EDGE_COLS = ["id", "subject", "predicate", "object",
             "upstream_resource_id", "primary_knowledge_source"]

_BATCH = 100_000


def _decode_id_list(value) -> list[str]:
    """Stringified-list decode with the 'nan' sentinel → []."""
    if value is None or value == "nan":
        return []
    if isinstance(value, list):
        return value
    parsed = ast.literal_eval(value)
    return list(parsed) if parsed else []


def _stream_table(
    con: sqlite3.Connection, table: str, cols: list[str], out_path: str,
    list_cols: tuple[str, ...] = (),
) -> int:
    """Stream a table to Parquet in batches (bounded memory — the source
    DB is multi-GB; nothing is materialized whole)."""
    schema = pa.schema(
        [(c, pa.list_(pa.string()) if c in list_cols else pa.string())
         for c in cols]
    )
    cur = con.cursor()
    cur.execute(f"SELECT {', '.join(cols)} FROM {table}")  # noqa: S608 — table/cols are module constants
    total = 0
    with pq.ParquetWriter(out_path, schema) as writer:
        while True:
            rows = cur.fetchmany(_BATCH)
            if not rows:
                break
            arrays = []
            for i, c in enumerate(cols):
                vals = [r[i] for r in rows]
                if c in list_cols:
                    arrays.append(pa.array([_decode_id_list(v) for v in vals],
                                           type=pa.list_(pa.string())))
                else:
                    arrays.append(pa.array(
                        [None if v is None else str(v) for v in vals],
                        type=pa.string(),
                    ))
            writer.write_table(pa.Table.from_arrays(arrays, schema=schema))
            total += len(rows)
    cur.close()
    return total


def snapshot_synonymizer(sqlite_path: str, out_dir: str) -> dict[str, int]:
    """Shred nodes/clusters/edges to ``{out_dir}/{table}.parquet``.
    Returns per-table row counts."""
    os.makedirs(out_dir, exist_ok=True)
    con = sqlite3.connect(sqlite_path)
    try:
        counts = {
            "nodes": _stream_table(
                con, "nodes", NODE_COLS, os.path.join(out_dir, "nodes.parquet")
            ),
            "clusters": _stream_table(
                con, "clusters", CLUSTER_COLS,
                os.path.join(out_dir, "clusters.parquet"),
                list_cols=("member_ids", "intra_cluster_edge_ids"),
            ),
            "edges": _stream_table(
                con, "edges", EDGE_COLS, os.path.join(out_dir, "edges.parquet")
            ),
        }
    finally:
        con.close()
    return counts
