"""Persistent test-fixture paths: content-fingerprinted keys + atomic,
peer-tolerant publishing.

Round-2 fixtures were keyed by ``md5(sf_dir)`` alone and guarded by
``if not exists: build`` — two defects (ADVICE r2):

1. **Stale reads after a data regen**: regenerating the parquet tables
   in place (same path, new bytes) left every derived fixture (CSV/
   JSONL/ORC exports, sqlite/Derby registries, bloom manifests, cached
   BPE merges) serving values computed from the OLD data while the
   DuckDB oracle read the NEW data — spurious mismatches at best,
   silently wrong file-skipping at worst.  Fix: ``fixture_key`` folds a
   content fingerprint (name, size, mtime_ns of every source parquet)
   into the key, so a regen simply keys a fresh fixture.
2. **Publish races**: two same-sf runs could both pass the exists
   check and the loser's ``os.replace(staging, final)`` onto the
   winner's non-empty directory raised ``OSError``.  Fix:
   ``publish_dir`` treats a failed rename with an existing destination
   as *published-by-peer* (the peer's artifact is byte-equivalent by
   construction — same deterministic recipe over the same
   fingerprinted inputs) and discards the staging copy.

Scale note: this is test-fixture machinery, not a data path — the
fingerprint stats ~10 files on the driver; nothing here touches
executors.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile


def fixture_key(sf_dir: str) -> str:
    """12-hex key over the sf_dir path AND the identity of every
    source parquet file (name, size, mtime_ns): any regen of the test
    data — even in place — yields a new key, so no fixture built from
    the old bytes can ever be read against the new ones."""
    h = hashlib.md5(sf_dir.encode())
    try:
        entries = sorted(os.scandir(sf_dir), key=lambda e: e.name)
    except FileNotFoundError:
        entries = []
    for e in entries:
        if e.name.endswith(".parquet") and e.is_file():
            st = e.stat()
            h.update(f"|{e.name}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:12]


def fixture_path(sf_dir: str, kind: str, suffix: str = "") -> str:
    """Tempdir path for a derived fixture, fingerprint-keyed."""
    return os.path.join(
        tempfile.gettempdir(), f"pserv_{kind}_{fixture_key(sf_dir)}{suffix}"
    )


def staging_path(final: str) -> str:
    """Per-process staging sibling for atomic publication."""
    return f"{final}.tmp.{os.getpid()}"


def publish_dir(staging: str, final: str, sentinel: str | None = None) -> None:
    """Atomically publish a staged directory.

    A rename that fails because ``final`` already exists normally
    means a concurrent peer published the (deterministically
    identical) artifact first — drop ours.  When the caller's
    completeness marker ``sentinel`` (a file name inside the fixture)
    is given and is MISSING from the existing ``final``, the
    destination is pre-scheme debris, not a peer's artifact: clear it
    and publish ours."""
    try:
        os.replace(staging, final)
    except OSError:
        if not os.path.isdir(final):
            raise
        if sentinel is not None and not os.path.exists(
            os.path.join(final, sentinel)
        ):
            shutil.rmtree(final, ignore_errors=True)
            os.replace(staging, final)
        else:
            shutil.rmtree(staging, ignore_errors=True)


def publish_file(staging: str, final: str) -> None:
    """Atomic single-file publish (``os.replace`` overwrites files
    atomically on POSIX, so no peer tolerance is needed)."""
    os.replace(staging, final)
