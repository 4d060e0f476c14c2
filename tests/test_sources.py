"""S-family source/sink tests: CSV source (S8), Parquet checkpoint (S4),
JSON sink (S5), SQLite snapshot (S2)."""

from __future__ import annotations

import os
import shutil
import sqlite3
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from drugbankner_spark import pipelines as P  # noqa: E402
from drugbankner_spark.sources.sqlite_snapshot import snapshot_synonymizer  # noqa: E402
from drugbankner_spark.tables import load_table  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dbner_src_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_source_roundtrip(spark, tmpdir):
    # S8: write nation as CSV (with a ';'-delimited multi-value column as
    # in the reference's bundled drugbank_targets.csv), read back with an
    # explicit schema + split, compare to source of truth.
    nation = load_table(spark, SF, "nation")
    csv_dir = os.path.join(tmpdir, "nation_csv")
    nation.withColumn(
        "tags", F.concat_ws("; ", F.lit("a"), F.lit("b"))
    ).write.option("header", True).csv(csv_dir)
    schema = T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
        T.StructField("tags", T.StringType()),
    ])
    back = (
        spark.read.option("header", True).schema(schema).csv(csv_dir)
        .withColumn("tags", F.split("tags", "; "))
    )
    rows = {r["n_nationkey"]: r for r in back.collect()}
    src = {r["n_nationkey"]: r for r in nation.collect()}
    assert set(rows) == set(src)
    assert all(rows[k]["n_name"] == src[k]["n_name"] for k in src)
    assert all(rows[k]["tags"] == ["a", "b"] for k in rows)


def test_parquet_checkpoint_roundtrip(spark, tmpdir):
    # S4: the pickle-restart replacement.
    orders = load_table(spark, SF, "orders").limit(100)
    path = os.path.join(tmpdir, "ckpt")
    P.checkpoint(orders, path)
    back = P.restore(spark, path)
    assert back.count() == 100
    assert set(back.columns) == set(orders.columns)


def test_json_sink_roundtrip(spark, tmpdir):
    # S5: JSONL sink of a nested record survives a read-back.
    df = spark.createDataFrame(
        [("CHEBI:1", {"MONDO:2": {"name": "x", "category": "c"}})],
        "kg2_id string, nodes map<string, struct<name:string, category:string>>",
    )
    path = os.path.join(tmpdir, "json")
    df.write.json(path)
    back = spark.read.json(path)
    row = back.collect()[0]
    assert row["kg2_id"] == "CHEBI:1"
    assert row["nodes"]["MONDO:2"]["name"] == "x"


def test_sqlite_snapshot(spark, tmpdir):
    # S2/S3: shred a small synonymizer-shaped SQLite, read via Spark.
    db = os.path.join(tmpdir, "syn.sqlite")
    con = sqlite3.connect(db)
    con.execute("""CREATE TABLE nodes (id TEXT, id_simplified TEXT, name TEXT,
        name_simplified TEXT, category TEXT, cluster_id TEXT,
        major_branch TEXT, name_sri TEXT, category_sri TEXT,
        name_kg2pre TEXT, category_kg2pre TEXT)""")
    con.execute("INSERT INTO nodes VALUES ('a:1','A:1','x','x','Drug','A:1',"
                "'b', NULL, NULL, 'n', 'c')")
    con.execute("""CREATE TABLE clusters (cluster_id TEXT, name TEXT,
        category TEXT, member_ids TEXT, intra_cluster_edge_ids TEXT)""")
    # stringified python list + 'nan' sentinel — the reference's storage quirks
    con.execute("INSERT INTO clusters VALUES ('A:1','x','Drug',"
                "\"['a:1', 'b:2']\", 'nan')")
    con.execute("""CREATE TABLE edges (id TEXT, subject TEXT, predicate TEXT,
        object TEXT, upstream_resource_id TEXT, primary_knowledge_source TEXT)""")
    con.commit(); con.close()

    out = os.path.join(tmpdir, "dims")
    counts = snapshot_synonymizer(db, out)
    assert counts == {"nodes": 1, "clusters": 1, "edges": 0}
    clusters = spark.read.parquet(os.path.join(out, "clusters.parquet"))
    row = clusters.collect()[0]
    assert row["member_ids"] == ["a:1", "b:2"]       # decoded list
    assert row["intra_cluster_edge_ids"] == []       # 'nan' sentinel → []


def test_jsonl_source_roundtrip(spark, tmpdir):
    # S-family widening: JSONL (one object per line — the interchange
    # format LLM corpora actually ship in) writes via df.write.json and
    # reads back with an explicit schema; values survive exactly.
    docs = load_table(spark, SF, "documents")
    path = os.path.join(tmpdir, "docs_jsonl")
    docs.write.json(path)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    back = spark.read.schema(schema).json(path)
    assert sorted(map(tuple, back.select(*docs.columns).collect())) == \
        sorted(map(tuple, docs.collect()))


def test_orc_source_roundtrip(spark, tmpdir):
    # S-family widening: ORC — the other columnar format a Spark-native
    # engine must read/write; schema and values round-trip exactly.
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = os.path.join(tmpdir, "events_orc")
    ev.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == ev.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))


def test_orc_source_roundtrip(spark, tmpdir):
    # S-family: ORC is the second columnar format Spark ships natively;
    # a checkpoint written as ORC must read back bit-identical.
    import os

    orders = load_table(spark, SF, "orders").limit(200)
    orc_dir = os.path.join(tmpdir, "orders_orc")
    orders.write.orc(orc_dir)
    back = spark.read.orc(orc_dir)
    assert back.schema == orders.schema
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_jsonl_documents_roundtrip(spark, tmpdir):
    # S-family: JSON-Lines is the lingua franca of LLM corpora; a
    # documents dump written as .jsonl reads back value-identical
    # under an explicit schema (schema-on-read, no inference drift).
    import os

    from pyspark.sql import types as T

    docs = load_table(spark, SF, "documents")
    path = os.path.join(tmpdir, "docs_jsonl")
    docs.write.json(path)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    back = spark.read.schema(schema).json(path).select(*docs.columns)
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_jsonl_gzip_transparent_read(spark, tmpdir):
    # .jsonl.gz reads transparently (Hadoop codec by extension) — the
    # compressed form LLM corpora actually ship in.
    import os

    docs = load_table(spark, SF, "documents").limit(50)
    path = os.path.join(tmpdir, "docs_gz")
    docs.write.option("compression", "gzip").json(path)
    import glob

    assert glob.glob(os.path.join(path, "*.json.gz"))  # really compressed
    back = spark.read.schema(docs.schema).json(path)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, docs.collect()))


def test_orc_checkpoint_roundtrip_and_pushdown(spark, tmpdir):
    # S4 variant (round 6 late): ORC is the second in-core columnar
    # checkpoint format — full value/schema round-trip including a
    # timestamp and an array column, and the read plan shows the
    # filter pushed to the ORC scan.
    import pyspark.sql.functions as F

    orders = (
        load_table(spark, SF, "orders").limit(50)
        .withColumn("tags", F.array(F.lit("a"), F.lit("b")))
    )
    path = os.path.join(tmpdir, "ckpt_orc")
    P.checkpoint(orders, path, fmt="orc")
    back = P.restore(spark, path, fmt="orc")
    want = sorted(map(tuple, orders.drop("tags").collect()))
    got = sorted(map(tuple, back.drop("tags").collect()))
    assert got == want
    # file sources re-read as nullable (containers too): compare
    # names + simpleString types only
    assert [(f.name, f.dataType.simpleString()) for f in back.schema] \
        == [(f.name, f.dataType.simpleString()) for f in orders.schema]
    plan = back.filter(F.col("o_orderkey") == 1)._jdf \
        .queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderkey" in plan

