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


class _StubSftpClient:
    """In-memory SFTP client with the open/close surface paramiko's
    SFTPClient exposes — lets the verify-skip-redownload contract run
    over sftp:// URLs with no SSH endpoint."""

    files: dict[str, bytes] = {}
    fetches = 0
    connects: list[tuple] = []

    def __init__(self, host, port, username, password):
        type(self).connects.append((host, port, username, password))

    def open(self, path):
        import io

        type(self).fetches += 1
        return io.BytesIO(type(self).files[path])

    def close(self):
        pass


def test_sftp_verify_skip_redownload_contract(tmp_path):
    # S6 (download_script.py:170-217) over the injected stub transport:
    # fetch+verify, skip-if-match (no refetch), refetch-on-corruption,
    # and loud failure on a hash mismatch.
    import hashlib

    payload = b"synonymizer-bytes"
    good = hashlib.sha256(payload).hexdigest()
    _StubSftpClient.files = {"/data/syn.sqlite": payload}
    _StubSftpClient.fetches = 0
    _StubSftpClient.connects = []
    url = "sftp://rtx:pw@dbhost:2222/data/syn.sqlite"
    dest = tmp_path / "syn.sqlite"

    got = B.ensure_downloaded(url, str(dest), good,
                              sftp_client_factory=_StubSftpClient)
    assert got == good and dest.read_bytes() == payload
    assert _StubSftpClient.fetches == 1
    # URL credentials/port reached the transport factory
    assert _StubSftpClient.connects[0] == ("dbhost", 2222, "rtx", "pw")

    # cache hit: verified local file → NO second fetch
    B.ensure_downloaded(url, str(dest), good,
                        sftp_client_factory=_StubSftpClient)
    assert _StubSftpClient.fetches == 1

    # corruption → re-download
    dest.write_bytes(b"torn")
    B.ensure_downloaded(url, str(dest), good,
                        sftp_client_factory=_StubSftpClient)
    assert _StubSftpClient.fetches == 2 and dest.read_bytes() == payload

    # remote content not matching the pin → RuntimeError, no torn file
    dest.unlink()
    with pytest.raises(RuntimeError, match="hash verification failed"):
        B.ensure_downloaded(url, str(dest), "0" * 64,
                            sftp_client_factory=_StubSftpClient)
    assert not dest.exists()


def test_sftp_url_parsing_rejects_garbage():
    with pytest.raises(ValueError):
        B._parse_sftp_url("sftp://")


def test_transport_closing_client_closes_both():
    # ADVICE r03: SFTPClient.close() alone leaves the paramiko Transport
    # thread + SSH socket alive. The wrapper must close BOTH — and close
    # the transport even when the channel close raises.
    closed = []

    class _C:
        def close(self):
            closed.append("client")

    class _T:
        def close(self):
            closed.append("transport")

    B._TransportClosingClient(_C(), _T()).close()
    assert closed == ["client", "transport"]

    class _Boom:
        def close(self):
            closed.append("boom")
            raise RuntimeError("channel already dead")

    closed.clear()
    with pytest.raises(RuntimeError):
        B._TransportClosingClient(_Boom(), _T()).close()
    assert closed == ["boom", "transport"]


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
