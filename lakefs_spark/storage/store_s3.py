"""S3-API conditional-PUT metadata store driver + loopback fake server.

The commit protocol above :class:`~lakefs_spark.storage.store.Store`
needs exactly one primitive from its backend: conditional PUT with a
version predicate (the reference's kv ``SetIf``,
pkg/kv/store.go:96-111). Amazon S3 — and every serious S3-compatible
store (MinIO, GCS XML API, R2) — exposes exactly that primitive on the
public HTTP surface:

- ``PUT`` with ``If-None-Match: *`` — write only if the key does not
  exist (put-if-absent; AWS GA August 2024).
- ``PUT`` with ``If-Match: <etag>`` — write only while the stored
  object's ETag still matches (compare-and-swap; AWS GA November 2024).
- ``412 Precondition Failed`` / ``409 ConditionalRequestConflict`` when
  the predicate loses — mapped to :class:`CASConflictError`, which the
  repository's bounded retry loop already handles.

So this driver makes the engine multi-host deployable: branch pointers,
commits, tags, settings and run logs ride an S3 bucket; the version
token IS the object ETag. Blobs (ranges/manifests) have two modes:

- ``local_blob_root=...`` — blobs live on a namespace Spark reads
  natively (shared filesystem here; ``s3a://bucket/...`` on a real
  cluster, where Spark's Hadoop S3 connector reads the same bucket the
  docs ride). This is the topology that backs a full
  :class:`~lakefs_spark.storage.repo.Repository` — the reference's
  split of KV metadata + block-adapter data
  (pkg/block/adapter.go:187-226) — and the mode the repo-lifecycle
  test drives end-to-end.
- no ``local_blob_root`` — the blob API itself (publish/exists/list/
  delete) speaks pure HTTP against the bucket. That satisfies the
  Store *contract* (control blobs, GC sweep targets, the contract
  suite) but canNOT back Repository range I/O in this sandbox:
  ``blob_path`` returns ``http://`` URLs and vanilla Spark has no
  http Hadoop filesystem. Deployments wanting one bucket for
  everything point ``local_blob_root`` at the ``s3a://`` form of the
  same bucket instead.

Blob publication is put-if-absent: an existing content address always
wins, same bytes by construction.

Design notes for 100 TB / 1000 executors:

- Only *control-plane* records ride this driver: branch pointers, one
  JSON doc per commit, settings. Data never does — Spark reads range
  Parquet straight from the object store/namespace, so doc traffic is
  O(commits), not O(rows).
- ``append_line`` writes one If-None-Match-claimed SEGMENT object per
  line (S3 has no append): O(1) bytes per append at any log length,
  exactly the reference's one-KV-row-per-run shape
  (pkg/actions/kv_run_results_iterator.go). Legacy single-object logs
  keep reading; replace_lines (TTL cleanup) collapses segments back.
- Listing paginates with ``list-type=2`` continuation tokens, so a
  10⁶-commit repo never materializes one giant response.

ETag-as-version caveat (shared with LocalStore's sha256 tokens):
content-derived tokens make ABA theoretically possible, but every
mutable doc field (head, staging_seq) is forward-only, so a recurrence
of identical bytes is a semantic no-op.

:class:`FakeS3Server` is the in-process integration target: a loopback
``ThreadingHTTPServer`` implementing the exact subset above with one
mutex around every mutation (conditional evaluation + write are
atomic, as S3 guarantees for conditional requests). It exists because
this sandbox has no real S3 endpoint; the driver itself speaks plain
S3 REST and needs no code change to point at one.
"""

from __future__ import annotations

import hashlib
import http.client
import json
import os
import threading
import time
import xml.etree.ElementTree as ET
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, quote, unquote, urlsplit
from xml.sax.saxutils import escape

from lakefs_spark.storage.store import CASConflictError, Store


class S3StoreError(Exception):
    """Unexpected HTTP status from the S3 endpoint."""


def _unquote_etag(etag: str | None) -> str | None:
    if etag is None:
        return None
    return etag.strip().strip('"')


class S3ConditionalStore(Store):
    """Store driver speaking S3 REST conditional writes.

    Layout under ``s3://<bucket>/<key_prefix>``::

        docs/<doc_key>.json    versioned control records (ETag = token)
        logs/<log_key>.jsonl   append-only line logs (CAS-rewritten)
        data/<rel>             immutable content-addressed blobs

    ``local_blob_root`` keeps blobs on a Spark-readable filesystem
    while docs ride the remote CAS — the reference's KV+block split.
    """

    def __init__(
        self,
        endpoint: str,
        bucket: str,
        *,
        key_prefix: str = "",
        local_blob_root: str | None = None,
        timeout: float = 10.0,
        cas_retries: int = 64,
        list_page_size: int = 1000,
    ):
        self.endpoint = endpoint.rstrip("/")
        parts = urlsplit(self.endpoint)
        if parts.scheme != "http":
            raise ValueError(
                "only http:// endpoints are wired here (the sandbox has "
                "no TLS target); an https endpoint needs HTTPSConnection"
            )
        self._host = parts.hostname
        self._port = parts.port or 80
        self.bucket = bucket
        kp = key_prefix.strip("/")
        self.key_prefix = kp + "/" if kp else ""
        self.timeout = timeout
        self.cas_retries = cas_retries
        self.list_page_size = list_page_size
        self._local_blob_root = local_blob_root
        self.data_root = (
            local_blob_root
            if local_blob_root is not None
            else f"{self.endpoint}/{bucket}/{self.key_prefix}data"
        )
        #: fault injection (tests): while > 0, each conditional PUT
        #: carries X-Inject-409, asking a cooperating FakeS3Server to
        #: answer ConditionalRequestConflict once (deterministic
        #: per-CLIENT, unlike the server-side burst counter whose
        #: consumption depends on request interleaving)
        self.inject_conflicts = 0
        #: running count of 409 responses this client actually weathered
        self.conflict_409_seen = 0
        #: next-segment hints for the chunked line logs (advisory; a
        #: stale hint just costs one lost If-None-Match round)
        self._log_seq_hint: dict[str, int] = {}

    # -- HTTP plumbing ------------------------------------------------------

    def _request(
        self,
        method: str,
        key: str | None,
        *,
        body: bytes | None = None,
        headers: dict | None = None,
        query: str = "",
    ) -> tuple[int, dict, bytes]:
        path = f"/{self.bucket}"
        if key is not None:
            path += "/" + quote(key)
        if query:
            path += "?" + query
        # Idempotent requests retry transient failures (connection
        # resets, timeouts, 5xx) with bounded backoff: GET/HEAD/DELETE
        # always, PUT only when UNconditional (same-body replay is
        # idempotent). A CONDITIONAL PUT never blind-retries — replaying
        # an If-Match PUT whose first attempt actually landed would see
        # its own new ETag and report a false lost round; the CAS retry
        # loop above the Store is the correct recovery path there.
        conditional = bool(headers) and any(
            h in headers for h in ("If-Match", "If-None-Match")
        )
        tries = 1 if (method == "PUT" and conditional) or method == "POST" else 3
        for attempt in range(tries):
            conn = http.client.HTTPConnection(
                self._host, self._port, timeout=self.timeout
            )
            try:
                conn.request(method, path, body=body, headers=headers or {})
                resp = conn.getresponse()
                data = resp.read()
                status = resp.status
                hdrs = {k.lower(): v for k, v in resp.getheaders()}
            except (OSError, http.client.HTTPException) as e:
                if attempt + 1 < tries:
                    time.sleep(0.05 * (2**attempt))
                    continue
                raise S3StoreError(f"{method} {path}: {e}") from e
            finally:
                conn.close()
            if status >= 500 and attempt + 1 < tries:
                time.sleep(0.05 * (2**attempt))
                continue
            # the final attempt's response (even a 5xx) returns to the
            # caller, whose status check raises with context; every
            # iteration either returns or raises, so the loop never
            # falls through
            return status, hdrs, data

    def _list_keys(self, prefix: str) -> list[tuple[str, int]]:
        """All (key, size) under ``prefix``, paginating continuation
        tokens so no single response bounds the result."""
        out: list[tuple[str, int]] = []
        token = None
        while True:
            query = (
                f"list-type=2&prefix={quote(prefix, safe='')}"
                f"&max-keys={self.list_page_size}"
            )
            if token:
                query += f"&continuation-token={quote(token, safe='')}"
            status, _hdrs, data = self._request("GET", None, query=query)
            if status != 200:
                raise S3StoreError(f"list {prefix!r}: HTTP {status}")
            root = ET.fromstring(data)
            ns = ""
            if root.tag.startswith("{"):
                ns = root.tag[: root.tag.index("}") + 1]
            for c in root.findall(f"{ns}Contents"):
                out.append(
                    (c.findtext(f"{ns}Key"), int(c.findtext(f"{ns}Size") or 0))
                )
            if root.findtext(f"{ns}IsTruncated") != "true":
                return out
            token = root.findtext(f"{ns}NextContinuationToken")
            if not token:
                return out

    # -- documents ------------------------------------------------------------

    def _doc_key(self, key: str) -> str:
        return f"{self.key_prefix}docs/{key}.json"

    def get_doc(self, key: str) -> tuple[dict, str] | None:
        status, hdrs, data = self._request("GET", self._doc_key(key))
        if status == 404:
            return None
        if status != 200:
            raise S3StoreError(f"GET doc {key!r}: HTTP {status}")
        return json.loads(data), _unquote_etag(hdrs.get("etag"))

    def _conditional_put(self, s3_key: str, raw: bytes, expected_version: str | None) -> str:
        if expected_version is None:
            headers = {"If-None-Match": "*"}
        else:
            headers = {"If-Match": f'"{expected_version}"'}
        for _attempt in range(self.cas_retries):
            if self.inject_conflicts > 0:
                self.inject_conflicts -= 1
                headers["X-Inject-409"] = "1"
            else:
                headers.pop("X-Inject-409", None)
            status, hdrs, _ = self._request(
                "PUT", s3_key, body=raw, headers=headers
            )
            if status == 200:
                return _unquote_etag(hdrs.get("etag"))
            # 412 = predicate DEFINITELY failed; 404 = If-Match on a
            # now-deleted key — both are definite lost CAS rounds.
            if status in (404, 412):
                raise CASConflictError(
                    f"doc {s3_key!r}: conditional PUT lost (HTTP {status}, "
                    f"expected {expected_version!r})"
                )
            if status != 409:
                raise S3StoreError(f"PUT doc {s3_key!r}: HTTP {status}")
            # 409 (AWS ConditionalRequestConflict): a concurrent
            # conditional write was in flight and THIS request's outcome
            # is UNKNOWN — unlike 412 it must not be reported as a lost
            # round without a re-read (a create_branch that did land
            # would otherwise be misreported as "branch exists"). Read
            # back and resolve:
            #   bytes == ours        -> our write landed: success
            #   predicate still true -> nothing landed: retry the PUT
            #   else                 -> a real concurrent writer won
            self.conflict_409_seen += 1
            g_status, g_hdrs, g_data = self._request("GET", s3_key)
            if g_status not in (200, 404):
                # The re-read itself failed (500/503/...): the PUT's
                # outcome is STILL unknown — surfacing CASConflictError
                # here would misreport a server hiccup as a definite
                # lost round (create_branch would say "branch exists").
                raise S3StoreError(
                    f"GET {s3_key!r} while resolving a 409 conditional "
                    f"PUT: HTTP {g_status} — outcome unknown, not a "
                    f"CAS conflict"
                )
            if g_status == 200 and g_data == raw:
                return _unquote_etag(g_hdrs.get("etag"))
            if expected_version is None:
                if g_status == 404:
                    continue  # still absent: the phantom writer aborted
            else:
                if (
                    g_status == 200
                    and _unquote_etag(g_hdrs.get("etag")) == expected_version
                ):
                    continue  # predicate still holds: retry
            raise CASConflictError(
                f"doc {s3_key!r}: conditional PUT lost to a concurrent "
                f"writer (HTTP 409 resolved by re-read, expected "
                f"{expected_version!r})"
            )
        raise S3StoreError(
            f"PUT doc {s3_key!r}: still HTTP 409 after "
            f"{self.cas_retries} attempts"
        )

    def put_doc_if(self, key: str, doc: dict, expected_version: str | None) -> str:
        return self._conditional_put(
            self._doc_key(key), json.dumps(doc).encode(), expected_version
        )

    def put_doc(self, key: str, doc: dict) -> str:
        raw = json.dumps(doc).encode()
        status, hdrs, _ = self._request("PUT", self._doc_key(key), body=raw)
        if status != 200:
            raise S3StoreError(f"PUT doc {key!r}: HTTP {status}")
        return _unquote_etag(hdrs.get("etag"))

    def delete_doc(self, key: str) -> None:
        # S3 DELETE is idempotent (204 even when absent), but the Store
        # contract distinguishes missing docs; probe first. The HEAD →
        # DELETE window is benign for every caller (deletes are
        # owner-driven: branch/tag/legacy-doc removal).
        status, _hdrs, _ = self._request("HEAD", self._doc_key(key))
        if status == 404:
            raise FileNotFoundError(key)
        status, _hdrs, _ = self._request("DELETE", self._doc_key(key))
        if status not in (200, 204):
            raise S3StoreError(f"DELETE doc {key!r}: HTTP {status}")

    def doc_exists(self, key: str) -> bool:
        status, _hdrs, _ = self._request("HEAD", self._doc_key(key))
        return status == 200

    def list_docs(self, prefix: str) -> list[str]:
        base = f"{self.key_prefix}docs/"
        out = []
        for k, _size in self._list_keys(base + prefix):
            if k.endswith(".json"):
                out.append(k[len(base) : -len(".json")])
        return sorted(out)

    # -- line logs (chunked segments; no append primitive on S3) --------------

    def _log_key(self, key: str) -> str:
        return f"{self.key_prefix}logs/{key}.jsonl"

    def _log_seg_prefix(self, key: str) -> str:
        return f"{self.key_prefix}logs/{key}/"

    def append_line(self, key: str, line: str) -> None:
        """O(1) bytes per append: each line is its own zero-padded
        segment object claimed with If-None-Match, so concurrent
        appenders serialize on segment numbers instead of re-writing
        the whole log (the old read-modify-CAS was O(n²) bytes over a
        log's lifetime — r6/r7 disclosed item, now closed). Ordering =
        lexical segment order; a lost INM race just moves to the next
        number. Reads are one GET per line — control-plane logs are
        TTL-cleaned (run_ttl_expiry), so n stays bounded."""
        prefix = self._log_seg_prefix(key)

        def _relist() -> int:
            existing = [k for k, _ in self._list_keys(prefix)]
            return (
                max(
                    (int(os.path.basename(k).split(".")[0]) for k in existing),
                    default=-1,
                )
                + 1
            )

        seq = self._log_seq_hint.get(key)
        hinted = seq is not None
        if seq is None:
            seq = _relist()
        body = line.encode() + b"\n"
        for _attempt in range(self.cas_retries):
            try:
                self._conditional_put(f"{prefix}{seq:020d}.jsonl", body, None)
                self._log_seq_hint[key] = seq + 1
                return
            except CASConflictError:
                if hinted:
                    # the hint can be arbitrarily stale (another client
                    # appended many segments): jump straight to the
                    # listed tail instead of walking one-by-one — a
                    # stale hint must cost one listing, never permanent
                    # append failure
                    hinted = False
                    seq = max(seq + 1, _relist())
                else:
                    seq += 1  # a concurrent appender claimed this number
        self._log_seq_hint.pop(key, None)  # never replay a dead range
        raise CASConflictError(f"log {key!r}: append kept losing segments")

    def read_lines(self, key: str) -> list[str]:
        out: list[str] = []
        # legacy single-object logs (pre-chunking) read first, in place
        status, _hdrs, data = self._request("GET", self._log_key(key))
        if status == 200:
            out.extend(ln for ln in data.decode().split("\n") if ln.strip())
        elif status != 404:
            raise S3StoreError(f"GET log {key!r}: HTTP {status}")
        prefix = self._log_seg_prefix(key)
        for seg, _size in sorted(self._list_keys(prefix)):
            s, _h, d = self._request("GET", seg)
            if s != 200:
                continue  # deleted between list and get (TTL cleanup)
            out.extend(ln for ln in d.decode().split("\n") if ln.strip())
        return out

    def replace_lines(self, key: str, lines: list[str]) -> None:
        # owner-driven rewrite (TTL cleanup): collapse into the head
        # object, then drop ONLY the segments that existed when the
        # rewrite started — a segment appended after this listing
        # SURVIVES (same scan-vs-insert semantics as the reference's KV
        # TTL delete-by-key). The residual window is the caller's own
        # read→rewrite gap; the TTL callers are single-owner by
        # contract. Readers racing the window may see a line twice,
        # never lose one the rewrite intended to keep.
        doomed = [seg for seg, _size in self._list_keys(self._log_seg_prefix(key))]
        raw = ("".join(ln + "\n" for ln in lines)).encode()
        status, _hdrs, _ = self._request("PUT", self._log_key(key), body=raw)
        if status != 200:
            raise S3StoreError(f"PUT log {key!r}: HTTP {status}")
        for seg in doomed:
            self._request("DELETE", seg)
        self._log_seq_hint.pop(key, None)

    # -- blobs ------------------------------------------------------------------

    def _blob_key(self, rel: str) -> str:
        return f"{self.key_prefix}data/{rel}"

    def blob_path(self, rel: str) -> str:
        if self._local_blob_root is not None:
            return os.path.join(self._local_blob_root, rel)
        return f"{self.endpoint}/{self.bucket}/{self._blob_key(rel)}"

    def blob_exists(self, rel: str) -> bool:
        if self._local_blob_root is not None:
            return os.path.exists(self.blob_path(rel))
        status, _hdrs, _ = self._request("HEAD", self._blob_key(rel))
        return status == 200

    def publish_blob(self, local_src: str, rel: str) -> None:
        if self._local_blob_root is not None:
            return super().publish_blob(local_src, rel)
        with open(local_src, "rb") as f:
            raw = f.read()
        key = self._blob_key(rel)
        # 200 = we won; 412 = the address already exists — same content
        # by construction, the existing object wins (structural
        # sharing). 409 (ConditionalRequestConflict) means a CONCURRENT
        # conditional write was in flight and THIS request's outcome is
        # unknown: if the concurrent winner aborted, nothing exists and
        # deleting local_src would silently lose the blob. Resolve by
        # HEAD-then-retry until the object provably exists (200/412).
        for _attempt in range(self.cas_retries):
            status, _hdrs, _ = self._request(
                "PUT", key, body=raw, headers={"If-None-Match": "*"}
            )
            if status in (200, 412):
                os.remove(local_src)
                return
            if status != 409:
                raise S3StoreError(f"PUT blob {rel!r}: HTTP {status}")
            head, _h, _ = self._request("HEAD", key)
            if head == 200:  # the concurrent writer landed — done
                os.remove(local_src)
                return
        raise S3StoreError(
            f"PUT blob {rel!r}: still HTTP 409 after {self.cas_retries} "
            "attempts; local copy retained"
        )

    def read_blob(self, rel: str) -> bytes:
        if self._local_blob_root is not None:
            return super().read_blob(rel)
        status, _hdrs, data = self._request("GET", self._blob_key(rel))
        if status != 200:
            raise S3StoreError(f"GET blob {rel!r}: HTTP {status}")
        return data

    def list_blobs(self, rel_prefix: str) -> list[str]:
        if self._local_blob_root is not None:
            return super().list_blobs(rel_prefix)
        base = self._blob_key(rel_prefix.rstrip("/") + "/")
        return sorted(k[len(base):] for k, _ in self._list_keys(base))

    def delete_blob(self, rel: str) -> None:
        if self._local_blob_root is not None:
            return super().delete_blob(rel)
        status, _hdrs, _ = self._request("DELETE", self._blob_key(rel))
        if status not in (200, 204):
            raise S3StoreError(f"DELETE blob {rel!r}: HTTP {status}")


# -- loopback fake S3 (the sandbox's integration target) ----------------------


class _FakeS3Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    # every mutation evaluates its precondition and writes under the
    # server-wide mutex — the atomicity S3 documents for conditional
    # requests, and the property the exactly-one-winner tests verify
    def _split(self) -> tuple[str, str, dict]:
        path, _, query = self.path.partition("?")
        parts = unquote(path).lstrip("/").split("/", 1)
        bucket = parts[0]
        key = parts[1] if len(parts) > 1 else ""
        return bucket, key, parse_qs(query)

    def _send(self, status: int, body: bytes = b"", etag: str | None = None,
              content_type: str = "application/octet-stream") -> None:
        self.send_response(status)
        if etag is not None:
            self.send_header("ETag", f'"{etag}"')
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(body)

    def _obj(self):
        return self.server.objects  # {(bucket, key): bytes}

    @staticmethod
    def _etag(raw: bytes) -> str:
        return hashlib.md5(raw).hexdigest()

    def do_GET(self):
        bucket, key, q = self._split()
        with self.server.mu:  # fault injection for driver retry tests
            if self.server.inject_500 > 0:
                self.server.inject_500 -= 1
                return self._send(500, b"<Error><Code>InternalError</Code></Error>")
        if not key and q.get("list-type") == ["2"]:
            return self._do_list(bucket, q)
        with self.server.mu:
            raw = self._obj().get((bucket, key))
        if raw is None:
            return self._send(404, b"<Error><Code>NoSuchKey</Code></Error>")
        self._send(200, raw, etag=self._etag(raw))

    do_HEAD = do_GET

    def _do_list(self, bucket: str, q: dict) -> None:
        prefix = (q.get("prefix") or [""])[0]
        token = (q.get("continuation-token") or [""])[0]
        max_keys = int((q.get("max-keys") or ["1000"])[0])
        with self.server.mu:
            keys = sorted(
                k for (b, k) in self._obj() if b == bucket and k.startswith(prefix)
            )
            if token:
                keys = [k for k in keys if k > token]
            page, rest = keys[:max_keys], keys[max_keys:]
            # size/etag only for the page being returned — a paginated
            # listing must not hash every matching object every page
            meta = {
                k: (len(self._obj()[(bucket, k)]), self._etag(self._obj()[(bucket, k)]))
                for k in page
            }
        items = "".join(
            f"<Contents><Key>{escape(k)}</Key>"
            f"<ETag>&quot;{meta[k][1]}&quot;</ETag>"
            f"<Size>{meta[k][0]}</Size></Contents>"
            for k in page
        )
        trunc = "true" if rest else "false"
        nxt = (
            f"<NextContinuationToken>{escape(page[-1])}</NextContinuationToken>"
            if rest
            else ""
        )
        body = (
            f'<?xml version="1.0"?><ListBucketResult>'
            f"<IsTruncated>{trunc}</IsTruncated>{nxt}{items}</ListBucketResult>"
        ).encode()
        self._send(200, body, content_type="application/xml")

    def do_PUT(self):
        bucket, key, _q = self._split()
        n = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(n)
        if_match = _unquote_etag(self.headers.get("If-Match"))
        if_none_match = self.headers.get("If-None-Match")
        with self.server.mu:
            # AWS ConditionalRequestConflict: a concurrent conditional
            # write was in flight; THIS request's outcome is unknown.
            # inject_409_win controls whether the phantom concurrent
            # writer "landed" (object materializes) or aborted.
            # X-Inject-409 is the client-armed variant: deterministic
            # per client (the cross-process race test guarantees every
            # child weathers >=1 conflict regardless of interleaving).
            client_armed = self.headers.get("X-Inject-409") is not None
            if (self.server.inject_409 > 0 or client_armed) and (
                if_match or if_none_match
            ):
                if not client_armed:
                    self.server.inject_409 -= 1
                if self.server.inject_409_win:
                    self._obj().setdefault((bucket, key), raw)
                return self._send(
                    409, b"<Error><Code>ConditionalRequestConflict</Code></Error>"
                )
            cur = self._obj().get((bucket, key))
            if if_none_match == "*" and cur is not None:
                return self._send(412, b"<Error><Code>PreconditionFailed</Code></Error>")
            if if_match is not None:
                if cur is None:
                    return self._send(404, b"<Error><Code>NoSuchKey</Code></Error>")
                if self._etag(cur) != if_match:
                    return self._send(
                        412, b"<Error><Code>PreconditionFailed</Code></Error>"
                    )
            self._obj()[(bucket, key)] = raw
        self._send(200, b"", etag=self._etag(raw))

    def do_DELETE(self):
        bucket, key, _q = self._split()
        with self.server.mu:
            self._obj().pop((bucket, key), None)
        self._send(204)  # idempotent, like real S3

    def log_message(self, *args):  # keep test output clean
        pass


class FakeS3Server:
    """In-process loopback S3 endpoint with conditional-write support.

    Usage::

        with FakeS3Server() as srv:
            store = S3ConditionalStore(srv.endpoint, "bucket")
    """

    def __init__(self):
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), _FakeS3Handler)
        self._httpd.objects = {}
        self._httpd.mu = threading.Lock()
        self._httpd.inject_500 = 0
        self._httpd.inject_409 = 0
        self._httpd.inject_409_win = False
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    def inject_500(self, n: int) -> None:
        """Fail the next ``n`` GET/HEAD requests with HTTP 500 — lets
        tests prove the driver's transient-error retry."""
        with self._httpd.mu:
            self._httpd.inject_500 = n

    def inject_409(self, n: int, concurrent_writer_wins: bool = False) -> None:
        """Answer the next ``n`` CONDITIONAL PUTs with HTTP 409
        (ConditionalRequestConflict) — outcome unknown, exactly the AWS
        ambiguity. With ``concurrent_writer_wins`` the phantom
        concurrent writer's object materializes; otherwise it aborted
        and nothing exists, so a client that treats 409 as "already
        there" would silently lose the blob."""
        with self._httpd.mu:
            self._httpd.inject_409 = n
            self._httpd.inject_409_win = concurrent_writer_wins

    @property
    def endpoint(self) -> str:
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def start(self) -> "FakeS3Server":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self) -> "FakeS3Server":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
