"""Byte-level ground truth for the multipart ETag (hashlib oracle)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from lakefs_spark.functions.checksum import multipart_etag, multipart_etag_col


def test_multipart_etag_matches_hashlib(spark):
    parts = [
        hashlib.md5(f"part-{i}".encode()).hexdigest() for i in range(5)
    ]
    expected = (
        hashlib.md5(b"".join(bytes.fromhex(p) for p in parts)).hexdigest() + "-5"
    )
    assert multipart_etag(parts) == expected

    df = spark.createDataFrame([(parts,)], "parts array<string>")
    got = df.select(multipart_etag_col(F.col("parts")).alias("etag")).first()["etag"]
    assert got == expected


def test_multipart_etag_single_part(spark):
    p = hashlib.md5(b"only").hexdigest()
    got = (
        spark.createDataFrame([([p],)], "parts array<string>")
        .select(multipart_etag_col(F.col("parts")).alias("etag"))
        .first()["etag"]
    )
    assert got == multipart_etag([p]) and got.endswith("-1")
    # composite etag differs from the plain part md5 (S3 semantics)
    assert got.split("-")[0] != p
