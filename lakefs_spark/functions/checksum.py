"""Upload checksums: single-part md5 ETags and S3 multipart ETags.

Reference: uploads carry an md5 ETag computed by a hashing reader
(pkg/block/hashing_reader.go); multipart completion produces the
S3-convention composite ETag — md5 over the *binary* concatenation of
the parts' md5 digests, suffixed ``-<part count>`` (gateway multipart
path, pkg/gateway/operations/putobject.go + CompleteMultipartUpload).

Spark shape: a codegen'd fold over ``array<string>`` of part etags —
``aggregate(unhex(...))`` keeps the byte-concat JVM-side; no Python in
the hot path. (No DuckDB oracle: md5-over-BLOB is inexpressible there,
so the gate entry is rows-only and the byte-level semantics are pinned
by hashlib ground truth in tests/test_checksum.py.)
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def multipart_etag(part_etags: list[str]) -> str:
    """Driver-side S3 composite ETag from hex part md5s (in part order)."""
    digest = hashlib.md5(b"".join(bytes.fromhex(e) for e in part_etags)).hexdigest()
    return f"{digest}-{len(part_etags)}"


def multipart_etag_col(part_etags: Column) -> Column:
    """Column-side composite ETag; ``part_etags`` is array<string> of
    hex part md5s already in part order."""
    bincat = F.aggregate(
        part_etags,
        F.lit(b""),
        lambda acc, e: F.concat(acc, F.unhex(e)),
    )
    return F.concat(F.md5(bincat), F.lit("-"), F.size(part_etags).cast("string"))
