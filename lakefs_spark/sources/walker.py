"""Object-store walker: list files under a URI into entry rows.

Reference: block-adapter walkers enumerate a bucket/prefix in lexical
order to feed import (pkg/block/walker.go, pkg/block/adapter.go:228-247);
the Spark client's GC lister plans one task per directory and deep-lists
on executors (clients/spark/.../gc/DataLister.scala:34-50).

Spark-native: ``spark.read.format("binaryFile")`` performs distributed
file listing + metadata extraction (path, length, modificationTime) —
executors parallelize the deep listing, exactly the DataLister pattern.
We read metadata only (drop the content column immediately, so no bytes
are fetched into rows). Out-of-order listings (the reference flags
Azure ADLS) are irrelevant here: the range writer re-sorts by key.

Works against any Hadoop-FS-backed scheme (file://, s3a://, gs://,
abfs://) with no code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakefs_spark.functions.ident import identity_hex


def walk_files(
    spark: SparkSession,
    url: str,
    glob: str = "*",
    recursive: bool = True,
) -> DataFrame:
    """List files under ``url`` as ``(path, size, last_modified)``."""
    reader = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true" if recursive else "false")
    )
    df = reader.load(url)
    return df.select(
        F.col("path"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("last_modified"),
    )


def entries_from_walk(
    walked: DataFrame,
    base_url: str,
    key_prefix: str = "",
    content_type: str = "application/octet-stream",
) -> DataFrame:
    """Walker rows -> entry schema, keyed by path relative to ``base_url``.

    The physical address is the original full path (address_type FULL —
    imported objects are referenced in place, never copied; the
    reference's zero-copy import). Identity hashes (size, etag,
    content_type) like pkg/catalog/entry.go:28-33 — address excluded.
    """
    import re

    # normalize scheme spelling on both sides (file:///x vs file:/x)
    # before the literal (non-regex) strip of the base prefix
    norm_base = re.sub(r"^[a-zA-Z0-9]+:/+", "/", base_url).rstrip("/") + "/"
    path_no_scheme = F.regexp_replace(F.col("path"), r"^[a-zA-Z0-9]+:/+", "/")
    # anchored strip: every walked path starts with norm_base, so drop
    # exactly that many leading chars (an unanchored replace would also
    # corrupt keys that repeat the base substring mid-path, e.g. base
    # /data with file /data/x/data/y)
    rel = F.substring(path_no_scheme, len(norm_base) + 1, 1_000_000)
    # etag stand-in: hash of (path, size, mtime) — object stores provide
    # a real etag; binaryFile gives us listing metadata only
    etag = F.md5(
        F.concat_ws("|", F.col("path"), F.col("size"), F.col("last_modified").cast("string"))
    )
    return walked.select(
        F.concat(F.lit(key_prefix), rel).alias("key"),
        identity_hex(F.col("size"), etag, F.lit(content_type)).alias("identity"),
        F.col("path").alias("address"),
        F.lit("FULL").alias("address_type"),
        F.col("size").cast("long").alias("size"),
        etag.alias("etag"),
        F.col("last_modified").cast("timestamp").alias("last_modified"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.lit(content_type).alias("content_type"),
    )


def import_url(
    repo,
    branch: str,
    url: str,
    key_prefix: str,
    glob: str = "*",
    message: str | None = None,
):
    """Walk ``url`` and import its files under ``key_prefix`` on a
    branch, replacing that subtree (the reference's import flow:
    walker -> sorted range writer -> prefix-replacing merge)."""
    walked = walk_files(repo.spark, url, glob=glob)
    entries = entries_from_walk(walked, url, key_prefix=key_prefix)
    return repo.import_entries(
        branch,
        entries,
        replace_prefixes=[key_prefix],
        message=message or f"import {url} -> {key_prefix}",
    )
