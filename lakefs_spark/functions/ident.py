"""Content-addressing helpers.

The reference derives every identity/ID from a SHA-256 over a
length- and type-tagged serialization (`pkg/ident/` in the reference,
143 LoC: MarshalString writes ``len|bytes``, maps are written with keys
sorted). We reproduce the same *framing idea* — unambiguous typed
concatenation — but define our own canonical framing, since our engine
only needs internal self-consistency (IDs are stable across our own
commits), not byte-parity with the Go server:

    frame(parts) = sha256( join( f"{len(p)}:{p}" for p in parts ) )

Entry identity (reference: pkg/catalog/entry.go:21-38) hashes
``(size, etag, metadata(sorted), content_type)`` and deliberately
EXCLUDES physical address and mtime — two objects with the same content
are "identical" for diff/merge even if stored at different addresses.
We keep exactly that exclusion.

``fnv64a`` reproduces the chunk-boundary hash of the reference's range
writer (pkg/graveler/sstable/writer.go:178-182) — used by
plans/chunker.py to make range boundaries content-defined and therefore
stable across commits.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

FNV64_OFFSET = 0xCBF29CE484222325
FNV64_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fnv64a(data: bytes) -> int:
    """Pure-python fnv-1a 64-bit (driver-side; see fnv64a_np for batches)."""
    h = FNV64_OFFSET
    for b in data:
        h ^= b
        h = (h * FNV64_PRIME) & _MASK64
    return h


def fnv64a_np(keys) -> "object":
    """Vectorized fnv-1a 64 over an iterable of str/bytes → uint64 array.

    Matches :func:`fnv64a` bit-for-bit (strings hashed as UTF-8, the
    reference hashes the raw key bytes, writer.go:178-182). The fold
    runs column-wise over a length-padded uint8 matrix: O(max_len)
    vectorized passes per batch instead of O(total_bytes) Python-level
    ops — the batch shape Arrow hands a pandas_udf.
    """
    import numpy as np

    encoded = [
        k.encode("utf-8") if isinstance(k, str) else bytes(k) for k in keys
    ]
    n = len(encoded)
    out = np.full(n, FNV64_OFFSET, dtype=np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    max_len = int(lens.max())
    if max_len == 0:
        return out
    buf = np.zeros((n, max_len), dtype=np.uint8)
    for i, b in enumerate(encoded):
        if b:
            buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    prime = np.uint64(FNV64_PRIME)
    for j in range(max_len):
        live = lens > j
        out[live] = (out[live] ^ buf[live, j].astype(np.uint64)) * prime
    return out


def _frame(parts: list[str]) -> str:
    return "".join(f"{len(p)}:{p}" for p in parts)


def typed_hash_hex(parts: list[str]) -> str:
    """Driver-side typed hash: sha256 over length-tagged parts, hex."""
    return hashlib.sha256(_frame(parts).encode("utf-8")).hexdigest()


def typed_hash_col(*cols: Column) -> Column:
    """Column-side equivalent of :func:`typed_hash_hex`.

    Each input column is cast to string and length-tagged, so
    ``("ab","c")`` never collides with ``("a","bc")``.
    """
    tagged = [F.concat(F.length(c.cast("string")).cast("string"), F.lit(":"), c.cast("string")) for c in cols]
    return F.sha2(F.concat(*tagged), 256)


def identity_hex(size: Column, etag: Column, content_type: Column, metadata_json: Column | None = None) -> Column:
    """Entry identity column: sha256 over (size, etag, [metadata], content_type).

    Mirrors the field set of the reference's EntryCatalogger identity
    (pkg/catalog/entry.go:28-33): address and last_modified excluded.
    ``metadata_json`` must be a canonical (sorted-keys) JSON string if
    provided.
    """
    cols = [size, etag]
    if metadata_json is not None:
        cols.append(metadata_json)
    cols.append(content_type)
    return typed_hash_col(*cols)
