"""Content-addressed range files + metarange manifests over Parquet.

Mirrors the reference's committed store (SURVEY.md §1.2/§1.3):
- Range  = immutable sorted run of entries. Reference: Pebble SSTable
  with content-derived ID (pkg/graveler/sstable/writer.go:101-135).
  Ours: one sorted Parquet file, named by the sha256 of its
  (key, identity) stream — same content => same file => structural
  sharing across commits, dedup for free.
- MetaRange = the snapshot manifest: one row per range with
  (range_id, min_key, max_key, count, estimated_size). Reference:
  pkg/graveler/committed/meta_range_writer.go:149-182. Ours: one
  small Parquet file named by the sha256 of its ordered range_ids.

Physical write path: entries are chunk-assigned (plans/chunker.py —
boundary rule is a pure key hash so chunking is deterministic and
distributed), then each chunk is written by an executor via
``applyInPandas`` — the Spark-native analog of the reference's
parallel range uploaders (MaxUploaders,
pkg/graveler/committed/batch_write_closer.go). A chunk whose file
already exists is skipped (content-address hit).

Scale: chunks are ~raggedness entries (50k default) — well under
executor memory; the groupBy(chunk_idx) shuffle is one pass and
chunk_idx is monotone in key, so the write preserves global order.
Reads of N ranges are a plain multi-file Parquet scan — split
planning, column pruning and min/max row-group pruning all apply.
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakefs_spark.plans.chunker import DEFAULT_RAGGEDNESS, assign_chunks
from lakefs_spark.schema import ENTRY_COLS

# Parquet-side schema: metadata map stored as canonical JSON text
# (cross-tool safe); decoded back to map<string,string> on read.
_PA_SCHEMA = pa.schema(
    [
        ("key", pa.string()),
        ("identity", pa.string()),
        ("address", pa.string()),
        ("address_type", pa.string()),
        ("size", pa.int64()),
        ("etag", pa.string()),
        ("last_modified", pa.timestamp("us")),
        ("metadata_json", pa.string()),
        ("content_type", pa.string()),
    ]
)

MANIFEST_COLS = ["range_id", "min_key", "max_key", "count", "estimated_size"]


def ranges_dir(root: str) -> str:
    return os.path.join(root, "ranges")


def manifests_dir(root: str) -> str:
    return os.path.join(root, "manifests")


def _to_parquet_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[ENTRY_COLS].copy()
    out["metadata_json"] = [
        None if m is None else json.dumps(dict(sorted(m.items())), separators=(",", ":"))
        for m in out.pop("metadata")
    ]
    return out[[f.name for f in _PA_SCHEMA]]


def write_ranges(
    entries: DataFrame,
    root: str,
    raggedness: int = DEFAULT_RAGGEDNESS,
) -> pd.DataFrame:
    """Write a full snapshot's entries as content-addressed range files.

    Returns the manifest as a pandas DataFrame (MANIFEST_COLS), sorted
    by min_key. Entries must have unique keys (caller overlays first).
    """
    # persist: the entry stream (often an expensive upstream plan) is
    # evaluated twice — boundary-key collect, then the grouped write
    entries = entries.select(*ENTRY_COLS).persist()
    try:
        chunked = assign_chunks(entries, "key", raggedness)
        return write_ranges_prechunked(chunked, root)
    finally:
        entries.unpersist()


def write_ranges_prechunked(chunked: DataFrame, root: str) -> pd.DataFrame:
    """Write ranges for rows already carrying a ``chunk_idx`` column."""
    rdir = ranges_dir(root)
    os.makedirs(rdir, exist_ok=True)

    def _write_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("key", kind="mergesort")
        # vectorized length-tagged framing (a per-row python loop here
        # costs ~10x at 50k rows per chunk)
        ks, ids = pdf["key"], pdf["identity"]
        framed = (
            ks.str.len().astype(str).str.cat(ks, sep=":")
            .str.cat(ids.str.len().astype(str), sep="")
            .str.cat(ids, sep=":")
        )
        range_id = hashlib.sha256("".join(framed.tolist()).encode()).hexdigest()
        path = os.path.join(rdir, f"{range_id}.parquet")
        if not os.path.exists(path):  # content-address hit => free
            out = _to_parquet_pdf(pdf)
            tmp = f"{path}.tmp.{os.getpid()}"
            pq.write_table(
                pa.Table.from_pandas(out, schema=_PA_SCHEMA, preserve_index=False),
                tmp,
                compression="snappy",
            )
            os.replace(tmp, path)
        return pd.DataFrame(
            {
                "range_id": [range_id],
                "min_key": [pdf["key"].iloc[0]],
                "max_key": [pdf["key"].iloc[-1]],
                "count": [len(pdf)],
                "estimated_size": [int(pdf["size"].fillna(0).sum())],
            }
        )

    manifest = (
        chunked.groupBy("chunk_idx")
        .applyInPandas(
            _write_chunk,
            schema="range_id string, min_key string, max_key string, count long, estimated_size long",
        )
        .toPandas()
    )
    return manifest.sort_values("min_key").reset_index(drop=True)


def metarange_id_of(manifest: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for rid in manifest.sort_values("min_key")["range_id"]:
        h.update(f"{len(rid)}:{rid}".encode())
    return h.hexdigest()


def write_manifest(manifest: pd.DataFrame, root: str) -> str:
    """Persist the manifest; returns the content-addressed metarange id."""
    mid = metarange_id_of(manifest)
    mdir = manifests_dir(root)
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, f"{mid}.parquet")
    if not os.path.exists(path):
        tmp = f"{path}.tmp.{os.getpid()}"
        manifest[MANIFEST_COLS].to_parquet(tmp, index=False)
        os.replace(tmp, path)
    return mid


def read_manifest(root: str, metarange_id: str) -> pd.DataFrame:
    path = os.path.join(manifests_dir(root), f"{metarange_id}.parquet")
    return pd.read_parquet(path).sort_values("min_key").reset_index(drop=True)


EMPTY_METARANGE = "empty"


def write_empty_manifest(root: str) -> str:
    return EMPTY_METARANGE


def _range_paths(root: str, range_ids) -> list[str]:
    return [os.path.join(ranges_dir(root), f"{rid}.parquet") for rid in range_ids]


def read_ranges(spark: SparkSession, root: str, range_ids) -> DataFrame:
    """Entries of the given ranges as a DataFrame (metadata decoded)."""
    paths = _range_paths(root, range_ids)
    if not paths:
        return empty_entries(spark)
    df = spark.read.parquet(*paths)
    return df.withColumn(
        "metadata", F.from_json(F.col("metadata_json"), "map<string,string>")
    ).select(*ENTRY_COLS)


def read_snapshot(
    spark: SparkSession,
    root: str,
    metarange_id: str,
    key_lower: str | None = None,
    key_upper: str | None = None,
) -> DataFrame:
    """Full snapshot scan with manifest-level range pruning.

    ``key_lower``/``key_upper`` prune at the *file* level via the
    manifest's min/max before Spark ever plans the scan — the
    partition-pruning analog of the reference's SeekGE
    (pkg/graveler/committed/manager.go:49).
    """
    if metarange_id == EMPTY_METARANGE:
        return empty_entries(spark)
    manifest = read_manifest(root, metarange_id)
    if key_lower is not None:
        manifest = manifest[manifest["max_key"] >= key_lower]
    if key_upper is not None:
        manifest = manifest[manifest["min_key"] < key_upper]
    if manifest.empty:
        return empty_entries(spark)
    df = read_ranges(spark, root, manifest["range_id"].tolist())
    if key_lower is not None:
        df = df.where(F.col("key") >= F.lit(key_lower))
    if key_upper is not None:
        df = df.where(F.col("key") < F.lit(key_upper))
    return df


def empty_entries(spark: SparkSession) -> DataFrame:
    from lakefs_spark.schema import ENTRY_SCHEMA

    return spark.createDataFrame([], ENTRY_SCHEMA)
