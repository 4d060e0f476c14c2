"""S6/S7 bootstrap: fetch the raw source artifacts with hash-verified
caching (reference ``download_script.py:170-217`` SFTP+SHA-256 flow and
``download_data.sh:14-20`` HTTP zip fetch), then hand off to the engine's
snapshot sources.

Engine stance (SURVEY §2.1): fetching bytes is not a Spark job — it runs
once on the driver (or a plain cron box), never on executors. What IS
engine work starts at ``sqlite_snapshot.snapshot_synonymizer`` /
``xml_source``; this module only closes the gap from "a URL and a hash"
to "local verified files", so a reference user can go end-to-end.

stdlib-only for https:// and file:// (urllib + hashlib + zipfile).
sftp:// — the reference's primary distribution channel
(download_script.py:66-128) — goes through paramiko behind an optional
import; the client is injectable (``sftp_client_factory``) so the
verify-skip-redownload contract is testable without a real SSH endpoint,
and a missing paramiko fails with an actionable ImportError only when an
sftp URL is actually used.
"""

from __future__ import annotations

import hashlib
import logging
import os
import shutil
import tempfile
import urllib.request
import zipfile

log = logging.getLogger(__name__)

_CHUNK = 1 << 20


def sha256_file(path: str) -> str:
    """Chunked SHA-256 (download_script.py:118-126 — never whole-file)."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(_CHUNK):
            h.update(chunk)
    return h.hexdigest()


def _parse_sftp_url(url: str) -> tuple[str, int, str | None, str | None, str]:
    """(host, port, username, password, remote_path) from an sftp:// URL.
    Credentials ride the URL for parity with the reference's CLI args
    (download_script.py:28-37); key-based auth comes via a custom
    ``sftp_client_factory``."""
    from urllib.parse import unquote, urlparse

    u = urlparse(url)
    if u.scheme != "sftp" or not u.hostname or not u.path:
        raise ValueError(f"not a usable sftp URL: {url!r}")
    return (
        u.hostname,
        u.port or 22,
        unquote(u.username) if u.username else None,
        unquote(u.password) if u.password else None,
        u.path,
    )


def paramiko_sftp_client(
    host: str, port: int, username: str | None, password: str | None
):
    """Default SFTP client factory (reference download_script.py:66-75).
    paramiko is an OPTIONAL dependency: importing here means an engine
    that never touches sftp:// never needs it installed. The returned
    client exposes ``open(path)`` / ``close()`` — the same two calls the
    injected test stub implements."""
    try:
        import paramiko
    except ImportError as e:  # pragma: no cover — env without paramiko
        raise ImportError(
            "sftp:// bootstrap needs paramiko (pip install paramiko), or "
            "pass sftp_client_factory="
        ) from e

    transport = paramiko.Transport((host, port))
    transport.connect(username=username, password=password)
    client = paramiko.SFTPClient.from_transport(transport)
    # SFTPClient.close() only closes the SFTP channel — the Transport
    # thread and SSH socket stay alive, leaking one connection per
    # download in a long-lived driver. Wrap close() so the cleanup path
    # in ensure_downloaded tears down BOTH.
    return _TransportClosingClient(client, transport)


class _TransportClosingClient:
    """Thin SFTP-client wrapper whose ``close()`` also closes the
    underlying paramiko Transport (channel close alone leaks the SSH
    socket + reader thread). Exposes the same two-call surface the
    injected test stubs implement: ``open(path)`` / ``close()``."""

    def __init__(self, client, transport):
        self._client = client
        self._transport = transport

    def open(self, path):
        return self._client.open(path)

    def close(self):
        try:
            self._client.close()
        finally:
            self._transport.close()


def ensure_downloaded(
    url: str,
    local_path: str,
    expected_sha256: str | None = None,
    sftp_client_factory=None,
) -> str:
    """Idempotent fetch with the reference's verify-skip-redownload
    contract (download_script.py:170-217):

    - local file exists and matches ``expected_sha256`` → skip (cache hit)
    - exists but mismatches → re-download
    - after any download, verify or raise ``RuntimeError``
    - no expected hash → download only if missing (and return the hash
      so callers can pin it forward)

    ``sftp_client_factory(host, port, username, password)`` overrides the
    paramiko default for sftp:// URLs (tests inject a stub transport).
    Returns the local file's SHA-256 hex digest.
    """
    if os.path.exists(local_path):
        got = sha256_file(local_path)
        if expected_sha256 is None:
            log.info("cache hit (no expected hash): %s", local_path)
            return got
        if got.lower() == expected_sha256.lower():
            log.info("cache hit (hash verified): %s", local_path)
            return got
        log.warning("hash mismatch for %s — re-downloading", local_path)

    os.makedirs(os.path.dirname(os.path.abspath(local_path)), exist_ok=True)
    # temp-then-rename: a killed download never leaves a torn file that a
    # later run would "verify"
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(local_path)))
    try:
        with os.fdopen(fd, "wb") as out:
            if url.startswith("sftp://"):
                host, port, user, pw, remote = _parse_sftp_url(url)
                factory = sftp_client_factory or paramiko_sftp_client
                client = factory(host, port, user, pw)
                try:
                    with client.open(remote) as resp:
                        shutil.copyfileobj(resp, out, _CHUNK)
                finally:
                    client.close()
            else:
                with urllib.request.urlopen(url) as resp:  # noqa: S310 — caller-supplied source URL is the point
                    shutil.copyfileobj(resp, out, _CHUNK)
        got = sha256_file(tmp)
        if expected_sha256 is not None and got.lower() != expected_sha256.lower():
            raise RuntimeError(
                f"hash verification failed after download of {url}:\n"
                f"local:    {got}\nexpected: {expected_sha256}"
            )
        os.replace(tmp, local_path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    log.info("downloaded and verified: %s", local_path)
    return got


def fetch_zip_member(
    url: str,
    cache_dir: str,
    member: str | None = None,
    expected_sha256: str | None = None,
) -> str:
    """S7 (download_data.sh:14-20): fetch a zip, extract one member
    (default: the single/first member — the DrugBank bundle holds one
    XML), return the extracted path. The zip itself is the cached,
    hash-verified artifact; extraction is idempotent."""
    local_zip = os.path.join(cache_dir, os.path.basename(url) or "bundle.zip")
    ensure_downloaded(url, local_zip, expected_sha256)
    with zipfile.ZipFile(local_zip) as zf:
        names = zf.namelist()
        pick = member if member is not None else names[0]
        if pick not in names:
            raise KeyError(f"{pick!r} not in archive ({names})")
        out_path = os.path.join(cache_dir, pick)
        if not os.path.exists(out_path):
            zf.extract(pick, cache_dir)
    return out_path


def bootstrap_synonymizer(
    url: str,
    cache_dir: str,
    out_dir: str,
    expected_sha256: str | None = None,
) -> dict[str, int]:
    """End-to-end S6→S2: verified-fetch the synonymizer SQLite, then
    snapshot it to the engine's Parquet dims (sources/sqlite_snapshot).
    Returns the per-table row counts from the snapshot."""
    from drugbankner_spark.sources.sqlite_snapshot import snapshot_synonymizer

    local = os.path.join(cache_dir, os.path.basename(url) or "synonymizer.sqlite")
    ensure_downloaded(url, local, expected_sha256)
    return snapshot_synonymizer(local, out_dir)
