"""Pluggable metadata store: the KV/CAS layer under the repository.

The reference splits persistence into (a) a partitioned KV store whose
``SetIf`` is the single coordination primitive — conditional PUT with a
version predicate, drivers for postgres/dynamodb/badger/mem
(pkg/kv/store.go:88-111) — and (b) a block adapter for immutable blobs
(pkg/block/adapter.go:187-226). This module is the same split for the
Spark engine:

- **Documents** — small JSON control records (branch pointers, tags,
  commits, pull requests, protection rules, the repo descriptor) read
  as ``(doc, version_token)`` and written with
  :meth:`Store.put_doc_if`, which succeeds only while the stored
  version still matches. That is the semantics of kv ``SetIf``, S3
  conditional writes (``If-Match``/``If-None-Match``) and DynamoDB
  condition expressions — so a driver for any of those backends slots
  in under the whole commit protocol unchanged.
- **Blobs** — immutable content-addressed files (ranges, manifests)
  that Spark reads directly by path/URL. Publication is idempotent
  put-if-absent; an existing address always wins (same content by
  construction). Blob bytes never ride through the document API.

Two implementations ship:

- :class:`LocalStore` keeps the current on-disk layout byte-compatible
  (one JSON file per doc under the repo root). Version tokens are the
  sha256 of the serialized bytes; a per-key flock makes the
  read-compare-write atomic *on one host* — the badger/"local" tier of
  the reference's driver matrix. Multi-host deployments need a
  conditional-PUT backend, which is exactly what the interface admits.
- :class:`MemStore` is the in-process conditional-PUT fake: a dict
  guarded by one mutex, monotonic integer versions. It proves the
  protocol (exactly one winner per CAS round, no POSIX locking
  anywhere above the interface) and doubles as the contract-test
  harness shape for future real drivers (pkg/kv/kvtest's role).
"""

from __future__ import annotations

import fcntl
import hashlib
import json
import os
import threading
from contextlib import contextmanager


class CASConflictError(Exception):
    """Conditional PUT predicate failed: the stored version no longer
    matches (kv.ErrPredicateFailed; pkg/kv/store.go:96-111 SetIf)."""


class Store:
    """Abstract metadata store. Subclasses implement the document API;
    blob helpers are concrete over ``data_root`` (a filesystem/URL
    prefix Spark can read) and may be overridden by remote drivers."""

    data_root: str

    # -- documents (versioned JSON, conditional PUT) ----------------------

    def get_doc(self, key: str) -> tuple[dict, str] | None:
        """Return ``(doc, version_token)`` or None if absent."""
        raise NotImplementedError

    def put_doc_if(self, key: str, doc: dict, expected_version: str | None) -> str:
        """Conditional PUT: write ``doc`` iff the stored version still
        equals ``expected_version`` (``None`` = must be absent).
        Returns the new version token; raises :class:`CASConflictError`
        when the predicate fails."""
        raise NotImplementedError

    def put_doc(self, key: str, doc: dict) -> str:
        """Unconditional last-writer-wins PUT. Returns the new version."""
        raise NotImplementedError

    def delete_doc(self, key: str) -> None:
        """Delete; raises FileNotFoundError if absent."""
        raise NotImplementedError

    def doc_exists(self, key: str) -> bool:
        return self.get_doc(key) is not None

    def list_docs(self, prefix: str) -> list[str]:
        """All doc keys under ``prefix``, sorted."""
        raise NotImplementedError

    # -- append-only line logs (hook run results) --------------------------

    def append_line(self, key: str, line: str) -> None:
        raise NotImplementedError

    def read_lines(self, key: str) -> list[str]:
        raise NotImplementedError

    def replace_lines(self, key: str, lines: list[str]) -> None:
        """Atomic whole-log rewrite (TTL expiry compaction)."""
        raise NotImplementedError

    # -- blobs (immutable content-addressed files under data_root) ---------

    def blob_path(self, rel: str) -> str:
        return os.path.join(self.data_root, rel)

    def blob_exists(self, rel: str) -> bool:
        return os.path.exists(self.blob_path(rel))

    def publish_blob(self, local_src: str, rel: str) -> None:
        """Put-if-absent move of a finished local file to its
        content-addressed location. An existing destination wins (same
        bytes by construction) and the source is discarded — the
        structural-sharing hit of the reference's content-derived
        SSTable IDs (pkg/graveler/sstable/writer.go:129-166)."""
        dest = self.blob_path(rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        if os.path.exists(dest):
            os.remove(local_src)
        else:
            os.replace(local_src, dest)

    def read_blob(self, rel: str) -> bytes:
        """Whole-blob bytes. Drivers whose ``blob_path`` is not a local
        filesystem path (pure-S3 mode) override this with a real GET."""
        with open(self.blob_path(rel), "rb") as f:
            return f.read()

    def list_blobs(self, rel_prefix: str) -> list[str]:
        d = self.blob_path(rel_prefix)
        if not os.path.isdir(d):
            return []
        return sorted(os.listdir(d))

    def delete_blob(self, rel: str) -> None:
        os.remove(self.blob_path(rel))


def as_store(root_or_store) -> Store:
    """Coerce a repo-root string to a :class:`LocalStore`; pass a
    :class:`Store` through. Lets path-based callers keep working."""
    if isinstance(root_or_store, Store):
        return root_or_store
    return LocalStore(root_or_store)


def data_root_of(root_or_store) -> str:
    if isinstance(root_or_store, Store):
        return root_or_store.data_root
    return root_or_store


class LocalStore(Store):
    """Single-host driver over the local filesystem.

    Layout is unchanged from the pre-interface engine: doc key
    ``refs/branches/main`` -> ``<root>/refs/branches/main.json``, the
    log key ``runs`` -> ``<root>/runs.jsonl``. Version token = sha256
    of the file bytes (content-addressed docs make ABA benign: the
    only mutable fields — head, staging_seq — are forward-only).
    Atomicity of read-compare-write comes from a per-key flock, which
    is correct within one host; this driver plays the role of the
    reference's badger/local KV tier."""

    def __init__(self, root: str):
        self.data_root = root

    def _doc_path(self, key: str) -> str:
        return os.path.join(self.data_root, key + ".json")

    @staticmethod
    def _version_of(raw: bytes) -> str:
        return hashlib.sha256(raw).hexdigest()

    @contextmanager
    def _key_lock(self, key: str):
        lock_path = self._doc_path(key) + ".lock"
        os.makedirs(os.path.dirname(lock_path), exist_ok=True)
        with open(lock_path, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

    def _read_raw(self, key: str) -> bytes | None:
        try:
            with open(self._doc_path(key), "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def _write_raw(self, key: str, raw: bytes) -> None:
        path = self._doc_path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "wb") as f:
            f.write(raw)
        os.replace(tmp, path)  # atomic swap for readers

    def get_doc(self, key: str) -> tuple[dict, str] | None:
        raw = self._read_raw(key)
        if raw is None:
            return None
        return json.loads(raw), self._version_of(raw)

    def put_doc_if(self, key: str, doc: dict, expected_version: str | None) -> str:
        raw = json.dumps(doc).encode()
        with self._key_lock(key):
            cur = self._read_raw(key)
            cur_ver = None if cur is None else self._version_of(cur)
            if cur_ver != expected_version:
                raise CASConflictError(
                    f"doc {key!r}: version is {cur_ver!r}, expected {expected_version!r}"
                )
            self._write_raw(key, raw)
        return self._version_of(raw)

    def put_doc(self, key: str, doc: dict) -> str:
        raw = json.dumps(doc).encode()
        self._write_raw(key, raw)
        return self._version_of(raw)

    def delete_doc(self, key: str) -> None:
        os.remove(self._doc_path(key))

    def doc_exists(self, key: str) -> bool:
        return os.path.exists(self._doc_path(key))

    def list_docs(self, prefix: str) -> list[str]:
        # Walk recursively from the deepest directory containing the
        # prefix: the Store contract is MemStore's plain string-prefix
        # match over keys, so a doc written at a nested key (one whose
        # name contains '/') must still be listed. A one-level
        # os.listdir here silently hid such docs from branches()/tags()
        # — and GC reachability roots with them.
        base = os.path.join(self.data_root, os.path.dirname(prefix))
        if not os.path.isdir(base):
            return []
        out = []
        for dirpath, dirs, files in os.walk(base):
            rel = os.path.relpath(dirpath, self.data_root)
            rel = "" if rel == "." else rel.replace(os.sep, "/") + "/"
            # prune subtrees that cannot contain matching keys — without
            # this, a slash-free prefix would walk the ENTIRE data root,
            # including the ranges/staging parquet trees
            dirs[:] = [
                d for d in dirs
                if (rel + d + "/").startswith(prefix)  # subtree inside prefix
                or prefix.startswith(rel + d + "/")  # prefix reaches deeper
            ]
            for p in files:
                if not p.endswith(".json"):
                    continue  # .lock / .tmp.* / .jsonl live alongside docs
                key = rel + p[: -len(".json")]
                if key.startswith(prefix):
                    out.append(key)
        return sorted(out)

    def _log_path(self, key: str) -> str:
        return os.path.join(self.data_root, key + ".jsonl")

    def append_line(self, key: str, line: str) -> None:
        path = self._log_path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "a") as f:
            f.write(line + "\n")

    def read_lines(self, key: str) -> list[str]:
        try:
            with open(self._log_path(key)) as f:
                return [ln.rstrip("\n") for ln in f if ln.strip()]
        except FileNotFoundError:
            return []

    def replace_lines(self, key: str, lines: list[str]) -> None:
        path = self._log_path(key)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            for ln in lines:
                f.write(ln + "\n")
        os.replace(tmp, path)


class MemStore(Store):
    """In-memory conditional-PUT store: the protocol fake.

    One mutex guards a ``key -> (json, version:int)`` map; a put_doc_if
    compares the integer version inside the critical section, so across
    any number of Repository instances sharing this store exactly one
    writer wins each CAS round — no flock, no filesystem semantics.
    This mirrors the reference's ``mem`` KV driver
    (pkg/kv/mem/store.go) and is the contract a DynamoDB/S3 driver
    must meet. Blobs still live on the local filesystem under
    ``data_root`` so Spark can scan them (the reference likewise keeps
    blobs on the block adapter while only metadata rides the KV)."""

    def __init__(self, data_root: str):
        self.data_root = data_root
        self._mu = threading.Lock()
        self._docs: dict[str, tuple[str, int]] = {}
        self._logs: dict[str, list[str]] = {}
        self._next_version = 0

    def get_doc(self, key: str) -> tuple[dict, str] | None:
        with self._mu:
            got = self._docs.get(key)
            if got is None:
                return None
            raw, ver = got
        return json.loads(raw), str(ver)

    def put_doc_if(self, key: str, doc: dict, expected_version: str | None) -> str:
        raw = json.dumps(doc)
        with self._mu:
            got = self._docs.get(key)
            cur_ver = None if got is None else str(got[1])
            if cur_ver != expected_version:
                raise CASConflictError(
                    f"doc {key!r}: version is {cur_ver!r}, expected {expected_version!r}"
                )
            self._next_version += 1
            self._docs[key] = (raw, self._next_version)
            return str(self._next_version)

    def put_doc(self, key: str, doc: dict) -> str:
        raw = json.dumps(doc)
        with self._mu:
            self._next_version += 1
            self._docs[key] = (raw, self._next_version)
            return str(self._next_version)

    def delete_doc(self, key: str) -> None:
        with self._mu:
            if key not in self._docs:
                raise FileNotFoundError(key)
            del self._docs[key]

    def doc_exists(self, key: str) -> bool:
        with self._mu:
            return key in self._docs

    def list_docs(self, prefix: str) -> list[str]:
        with self._mu:
            return sorted(k for k in self._docs if k.startswith(prefix))

    def append_line(self, key: str, line: str) -> None:
        with self._mu:
            self._logs.setdefault(key, []).append(line)

    def read_lines(self, key: str) -> list[str]:
        with self._mu:
            return list(self._logs.get(key, []))

    def replace_lines(self, key: str, lines: list[str]) -> None:
        with self._mu:
            self._logs[key] = list(lines)
