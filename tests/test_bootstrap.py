"""S6/S7 bootstrap tests: hash-verify / skip / redownload logic against
local file:// fixtures (no network — the contract is the caching and
verification behavior, download_script.py:170-217)."""

from __future__ import annotations

import os
import sys
import zipfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drugbankner_spark import bootstrap as B  # noqa: E402


@pytest.fixture()
def remote(tmp_path):
    src = tmp_path / "remote" / "artifact.bin"
    src.parent.mkdir()
    src.write_bytes(b"payload-v1" * 100)
    return src


def test_download_and_verify(remote, tmp_path):
    dest = tmp_path / "cache" / "artifact.bin"
    digest = B.sha256_file(str(remote))
    got = B.ensure_downloaded(remote.as_uri(), str(dest), digest)
    assert got == digest
    assert dest.read_bytes() == remote.read_bytes()


def test_cache_hit_skips_download(remote, tmp_path):
    dest = tmp_path / "artifact.bin"
    digest = B.ensure_downloaded(remote.as_uri(), str(dest), None)
    # break the "remote": a cache hit must not re-read it
    remote.unlink()
    assert B.ensure_downloaded(remote.as_uri(), str(dest), digest) == digest


def test_mismatch_triggers_redownload(remote, tmp_path):
    dest = tmp_path / "artifact.bin"
    dest.write_bytes(b"stale local copy")
    digest = B.sha256_file(str(remote))
    B.ensure_downloaded(remote.as_uri(), str(dest), digest)
    assert dest.read_bytes() == remote.read_bytes()


def test_bad_remote_hash_raises_and_leaves_no_file(remote, tmp_path):
    dest = tmp_path / "artifact.bin"
    with pytest.raises(RuntimeError, match="hash verification failed"):
        B.ensure_downloaded(remote.as_uri(), str(dest), "0" * 64)
    assert not dest.exists()  # temp-then-rename: no torn file


def test_sftp_unsupported(tmp_path):
    with pytest.raises(NotImplementedError):
        B.ensure_downloaded("sftp://host/x", str(tmp_path / "x"), None)


def test_fetch_zip_member(tmp_path):
    bundle = tmp_path / "remote.zip"
    with zipfile.ZipFile(bundle, "w") as zf:
        zf.writestr("full_database.xml", "<drugbank/>")
    out = B.fetch_zip_member(
        bundle.as_uri(), str(tmp_path / "cache"),
        expected_sha256=B.sha256_file(str(bundle)),
    )
    assert out.endswith("full_database.xml")
    assert open(out).read() == "<drugbank/>"
    with pytest.raises(KeyError):
        B.fetch_zip_member(bundle.as_uri(), str(tmp_path / "cache"), member="nope")


def test_bootstrap_synonymizer_end_to_end(tmp_path):
    # mini sqlite in the reference's synonymizer layout → parquet dims
    import sqlite3

    db = tmp_path / "syn.sqlite"
    con = sqlite3.connect(db)
    con.execute("""CREATE TABLE nodes (id TEXT, id_simplified TEXT, name TEXT,
        name_simplified TEXT, category TEXT, cluster_id TEXT,
        major_branch TEXT, name_sri TEXT, category_sri TEXT,
        name_kg2pre TEXT, category_kg2pre TEXT)""")
    con.execute("INSERT INTO nodes VALUES ('CHEBI:1','CHEBI:1','x','x','Drug',"
                "'CHEBI:1','b', NULL, NULL, 'n', 'c')")
    con.execute("""CREATE TABLE clusters (cluster_id TEXT, name TEXT,
        category TEXT, member_ids TEXT, intra_cluster_edge_ids TEXT)""")
    con.execute("INSERT INTO clusters VALUES ('CHEBI:1','x','Drug',"
                "\"['CHEBI:1']\", 'nan')")
    con.execute("""CREATE TABLE edges (id TEXT, subject TEXT, predicate TEXT,
        object TEXT, upstream_resource_id TEXT, primary_knowledge_source TEXT)""")
    con.commit()
    con.close()
    counts = B.bootstrap_synonymizer(
        db.as_uri(), str(tmp_path / "cache"), str(tmp_path / "dims"),
        expected_sha256=B.sha256_file(str(db)),
    )
    assert counts["nodes"] == 1 and counts["clusters"] == 1
    assert os.path.exists(tmp_path / "dims" / "nodes.parquet")
