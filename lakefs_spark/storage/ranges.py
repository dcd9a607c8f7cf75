"""Content-addressed range files + metarange manifests over Parquet.

Mirrors the reference's committed store (SURVEY.md §1.2/§1.3):
- Range  = immutable sorted run of entries. Reference: Pebble SSTable
  with content-derived ID (pkg/graveler/sstable/writer.go:101-135).
  Ours: one sorted Parquet file, named by the sha256 of an
  order-independent multiset hash over its FULL rows (every persisted
  column) — same content => same file => structural sharing across
  commits, dedup for free; content differing only in, say, a physical
  address never collapses.
- MetaRange = the snapshot manifest: one row per range with
  (range_id, min_key, max_key, count, estimated_size). Reference:
  pkg/graveler/committed/meta_range_writer.go:149-182. Ours: one
  small Parquet file named by the sha256 of its ordered range_ids.

Physical write path: entries are chunk-assigned (plans/chunker.py —
boundary rule is a pure key hash so chunking is deterministic and
distributed), then written by Spark's native parquet writer with
``partitionBy(chunk_idx)`` — one shuffle, zero Python in the data
path — while a JVM aggregation derives each chunk's content address;
the driver renames chunk files into place (O(#ranges) metadata ops).
The executor-parallel write is the Spark-native analog of the
reference's parallel range uploaders (MaxUploaders,
pkg/graveler/committed/batch_write_closer.go). A chunk whose file
already exists is kept (content-address hit).

Scale: chunks are ~raggedness entries (50k default) — well under
executor memory; the groupBy(chunk_idx) shuffle is one pass and
chunk_idx is monotone in key, so the write preserves global order.
Reads of N ranges are a plain multi-file Parquet scan — split
planning, column pruning and min/max row-group pruning all apply.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakefs_spark.plans.chunker import DEFAULT_RAGGEDNESS, assign_chunks, boundary_flag
from lakefs_spark.schema import ENTRY_COLS
from lakefs_spark.storage.store import as_store, data_root_of

# Parquet-side row layout (what write_ranges_prechunked persists):
#   key, identity, address, address_type, size int64, etag,
#   last_modified timestamp[us], metadata_json (the metadata map as
#   canonical sorted-keys JSON — cross-tool safe, decoded back to
#   map<string,string> on read), content_type.
MANIFEST_COLS = ["range_id", "min_key", "max_key", "count", "estimated_size"]

# The fixed on-disk schema, passed explicitly to every range read:
# schema inference over N parquet files is a footer-reading Spark JOB
# per read — pure overhead on metadata-driven loops (diff per log
# step), and it grows with file count at scale.
RANGE_FILE_SCHEMA = (
    "key string, identity string, address string, address_type string, "
    "size long, etag string, last_modified timestamp, "
    "metadata_json string, content_type string"
)


def ranges_dir(root) -> str:
    return os.path.join(data_root_of(root), "ranges")


def manifests_dir(root) -> str:
    return os.path.join(data_root_of(root), "manifests")


def write_ranges(
    entries: DataFrame,
    root: str,
    raggedness: int = DEFAULT_RAGGEDNESS,
    dedup: bool = False,
) -> pd.DataFrame:
    """Write a full snapshot's entries as content-addressed range files.

    Returns the manifest as a pandas DataFrame (MANIFEST_COLS), sorted
    by min_key. Entries must have unique keys (caller overlays first),
    unless ``dedup=True``: then duplicate keys are resolved INSIDE the
    chunk shuffle (same deterministic winner as
    operators.overlay.dedup_entries) — one full-payload exchange
    instead of a dedup-window exchange followed by the chunk exchange
    (guide §2.4: two operations keyed compatibly share one shuffle;
    chunk_idx is a pure function of key, so all rows of a key land in
    one chunk partition and the per-chunk sort the write needs anyway
    also serves the dedup).
    """
    # NO persist: the entry stream is evaluated twice (boundary-key
    # collect, then the grouped write), but the boundary pass prunes to
    # the single key column with a 1-in-raggedness filter — a cheap
    # pruned re-scan. Caching instead would spill the full-width
    # snapshot (~data size) to disk: at 300x bench scale that plus the
    # write shuffle exhausted a single box, and on a cluster it is the
    # same pure waste spread over more disks. Callers whose upstream is
    # a genuinely expensive non-scan plan (commit-apply) persist their
    # own bounded change stream and call write_ranges_prechunked.
    entries = entries.select(*ENTRY_COLS)
    # set-dedup: with dedup=True the raw stream may repeat a boundary
    # key; the boundary rule is a pure per-key hash so duplicates
    # collapse to the same flag and the boundary SET is unchanged
    bks = sorted(
        {
            r[0]
            for r in entries.where(boundary_flag(F.col("key"), raggedness))
            .select("key")
            .collect()
        }
    )
    chunked = assign_chunks(entries, "key", raggedness, boundaries=bks)
    return write_ranges_prechunked(chunked, root, n_chunks=len(bks) + 1, dedup=dedup)


def write_ranges_prechunked(
    chunked: DataFrame, root: str, n_chunks: int | None = None, dedup: bool = False
) -> pd.DataFrame:
    """Write ranges for rows already carrying a ``chunk_idx`` column.

    ``n_chunks`` (when the caller knows the boundary count) sizes the
    shuffle so each task holds ~one chunk: per-task sort memory is then
    O(chunk size) — constant at any corpus scale — instead of
    O(data / fixed-partition-count), which grew linearly with scale
    under the default partition count and tipped the external sort
    into disk spill past ~30x bench scale (the measured superlinear
    bend in import/commit). Parallelism equals chunk count, which is
    also the write's natural maximum (one file per chunk).

    Fully JVM-side — the earlier applyInPandas writer shuffled every
    entry through Arrow into Python (the whole payload, each commit);
    this path never leaves the JVM:
      1. one hash shuffle on chunk_idx + native parquet write with
         ``partitionBy(chunk_idx)`` (rows pre-sorted per chunk, one
         file per chunk because the shuffle co-locates each chunk);
      2. one aggregation job over the files just written (map-side
         partial agg) computing, per chunk, the manifest row and the
         content address — sha256 over an order-independent multiset
         hash of the length-tagged FULL rows, every persisted column
         (the reference's content-derived SSTable ID idea,
         sstable/writer.go:101-135, with O(1) aggregation state: see
         the inline note below);
      3. driver publishes chunk files to ``ranges/<range_id>.parquet``
         through the store's put-if-absent blob publication —
         O(#ranges) metadata ops, no data movement. A pre-existing
         content address wins (structural-sharing hit, file replaced
         by an identical one is a no-op semantically).

    No persist anywhere: caching the full-width post-shuffle rows
    would spill ~data size to disk a second time per commit.
    """
    import shutil
    import tempfile

    store = as_store(root)
    root = store.data_root
    os.makedirs(ranges_dir(root), exist_ok=True)

    meta = F.col("metadata")
    staged = chunked.select(
        F.col("chunk_idx"),
        "key",
        "identity",
        "address",
        "address_type",
        "size",
        "etag",
        "last_modified",
        # canonical (sorted-keys, compact) JSON — byte-parity with
        # json.dumps(sorted, separators=(",",":")) used on the read side
        F.when(
            meta.isNotNull(),
            F.to_json(F.map_from_entries(F.array_sort(F.map_entries(meta)))),
        ).alias("metadata_json"),
        "content_type",
    )
    # ONE shuffle: co-locate + sort each chunk, write immediately. No
    # persist — caching the full-width post-shuffle rows spilled ~data
    # size to disk a second time, which is what broke 300x runs on one
    # box (a cluster spreads it, but it is pure waste there too): the
    # manifest aggregation instead re-reads the files just written
    # (full rows — every column is hashed into the content address),
    # with map-side partial aggregation per chunk file.
    if n_chunks is not None and n_chunks > 0:
        staged = staged.repartition(int(n_chunks), "chunk_idx")
    else:
        staged = staged.repartition("chunk_idx")
    if dedup:
        # duplicate-key resolution folded into this exchange: the
        # window clusters by chunk_idx (satisfied by the repartition
        # above — no extra Exchange) and sorts by (key, tiebreak);
        # keeping each key's FIRST row picks exactly the row
        # operators.overlay.dedup_entries's row_number()==1 picks.
        # The window's sort is (chunk_idx, key, tiebreak...), a
        # superset of the write order below, so EliminateSorts drops
        # the second Sort — net plan cost of dedup here is the lag()
        # pass alone.
        from pyspark.sql import Window

        from lakefs_spark.operators.overlay import _tiebreak

        w = Window.partitionBy("chunk_idx").orderBy(F.col("key").asc(), *_tiebreak())
        staged = (
            staged.withColumn("__prev_key", F.lag("key").over(w))
            .where(F.col("__prev_key").isNull() | (F.col("__prev_key") != F.col("key")))
            .drop("__prev_key")
        )
    staged = staged.sortWithinPartitions("chunk_idx", "key")
    # temp dirs live under root/tmp (never read as a table; a dot/
    # underscore prefix instead would make Spark's overwrite-mode path
    # resolution warn "All paths were ignored" on every commit).
    # Best-effort sweep of dirs leaked by crashed writers. The age gate
    # is 24h, not 1h: the dir's top-level mtime is set at job START
    # (Spark writes under _temporary and renames at commit), so the
    # gate bounds the longest single range-write job we may sweep out
    # from under a live concurrent writer — measured writes reach ~7
    # minutes at 180M entries, leaving >100x headroom.
    import time as _time

    _SWEEP_AGE_S = 24 * 3600
    tmp_root = os.path.join(root, "tmp")
    os.makedirs(tmp_root, exist_ok=True)
    stale = [os.path.join(tmp_root, d) for d in os.listdir(tmp_root)]
    # legacy location: pre-root/tmp writers leaked dot-prefixed dirs
    # directly in root
    stale += [
        os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith(".write_ranges.")
    ]
    for p in stale:
        try:
            if _time.time() - os.path.getmtime(p) > _SWEEP_AGE_S:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    tmp_dir = tempfile.mkdtemp(prefix="write_ranges_", dir=tmp_root)
    try:
        # Bounded parquet row groups (default 128 MB = ONE row group per
        # range file): a single-row-group file is unsplittable, so every
        # downstream multi-range scan (diff sides, GC address walks, the
        # content-address aggregation below) parallelizes only by FILE
        # count. Range files are ≤ a few tens of MB by construction
        # (~raggedness entries; the reference caps ranges at 20 MiB,
        # defaults.go:97), so 4 MiB row groups keep statistics/pushdown
        # intact while letting scans split within a file whenever file
        # count < cores. Content addresses hash the ROW multiset, not
        # file bytes — row-group layout does not change range ids.
        # Env-overridable for A/B and for tuning on real clusters.
        _rg_bytes = int(os.environ.get("SPARK_GRAFT_RANGE_ROWGROUP_BYTES", 4 * 1024 * 1024))
        (
            staged.write.option("parquet.block.size", _rg_bytes)
            .partitionBy("chunk_idx")
            .mode("overwrite")
            .parquet(tmp_dir)
        )
        if not any(d.startswith("chunk_idx=") for d in os.listdir(tmp_dir)):
            return pd.DataFrame(columns=MANIFEST_COLS)
        # content address = sha256 over an ORDER-INDEPENDENT multiset
        # hash of the chunk's length-tagged (key, identity) rows: each
        # row contributes four 60-bit lanes sliced from ONE sha2-256 of
        # the framed row, and the lanes are SUMMED mod 2^64 (AdHash-
        # style additive multiset hash over cryptographic digests —
        # forging a collision needs a modular subset-sum over sha256
        # outputs, unlike the previous bit_xor(xxhash64) fold, which
        # was GF(2)-linear and forgeable by Gaussian elimination with
        # attacker-chosen keys/identities). O(1) aggregation state per
        # chunk — the earlier sorted collect_list+sha held every row of
        # every chunk in the aggregation hash map, so per-task memory
        # grew with chunks-per-partition and OOMed at ~2e8 entries
        # (found by tools/scale_smoke.py 300). Sums run as decimal(38)
        # so they cannot overflow under ANSI mode (2^60 per row x 2^60
        # rows < 10^38); same content => same address (structural
        # sharing) is preserved with 240 bits of collision margin.
        # EVERY persisted column enters the frame: the reference's
        # SSTable id hashes the file's actual bytes (sstable/writer.go),
        # so two ranges that differ only in, say, an entry's physical
        # address must NOT collapse to one content address — identity
        # deliberately excludes the address (entry.go:28-33), and a
        # re-link of identical content at a new address is exactly the
        # case where a (key, identity)-only hash would silently keep
        # the old file. Nulls get a length-unambiguous sentinel.
        def _tagged(name: str):
            v = F.coalesce(F.col(name).cast("string"), F.lit("\x00null"))
            return F.concat(F.length(v).cast("string"), F.lit(":"), v)

        frame = F.concat(
            *[
                _tagged(n)
                for n in (
                    "key", "identity", "address", "address_type", "size",
                    "etag", "last_modified", "metadata_json", "content_type",
                )
            ]
        )
        digest = F.sha2(frame, 256)
        _MOD64 = F.lit("18446744073709551616").cast("decimal(38,0)")  # 2^64

        def _lane_sum(i: int):
            lane = F.conv(F.substring(digest, 1 + i * 16, 15), 16, 10).cast(
                "decimal(38,0)"
            )
            return F.pmod(F.sum(lane), _MOD64).cast("decimal(20,0)").alias(f"x{i}")

        # explicit schema (+ the chunk_idx partition column — LONG:
        # the import path bit-packs segment indexes above 2^32): the
        # read-back otherwise runs a schema-inference job that opens
        # EVERY chunk's footer on EVERY range write
        written = chunked.sparkSession.read.schema(
            RANGE_FILE_SCHEMA + ", chunk_idx long"
        ).parquet(tmp_dir)
        mf_rows = (
            written.groupBy("chunk_idx")
            .agg(
                *[_lane_sum(i) for i in range(4)],
                F.min("key").alias("min_key"),
                F.max("key").alias("max_key"),
                F.count(F.lit(1)).alias("count"),
                F.sum(F.coalesce(F.col("size"), F.lit(0))).cast("long").alias("estimated_size"),
            )
            .select(
                "chunk_idx",
                F.sha2(
                    F.concat_ws(":", "count", "x0", "x1", "x2", "x3", "min_key", "max_key"),
                    256,
                ).alias("range_id"),
                "min_key",
                "max_key",
                "count",
                "estimated_size",
            )
            .collect()
        )
        for r in mf_rows:
            cdir = os.path.join(tmp_dir, f"chunk_idx={r['chunk_idx']}")
            parts = [p for p in os.listdir(cdir) if p.endswith(".parquet")]
            if len(parts) != 1:  # integrity check — must survive python -O
                raise RuntimeError(f"expected one file per chunk, got {parts}")
            # put-if-absent publication: a content-address hit keeps the
            # existing blob (same bytes by construction)
            store.publish_blob(
                os.path.join(cdir, parts[0]),
                os.path.join("ranges", f"{r['range_id']}.parquet"),
            )
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    manifest = pd.DataFrame(
        [
            {
                "range_id": r["range_id"],
                "min_key": r["min_key"],
                "max_key": r["max_key"],
                "count": int(r["count"]),
                "estimated_size": int(r["estimated_size"]),
            }
            for r in mf_rows
        ]
    )
    return manifest.sort_values("min_key").reset_index(drop=True)


def metarange_id_of(manifest: pd.DataFrame) -> str:
    # Vectorized: the hash stream is the concatenation of "len:rid"
    # tokens, and sha256.update over a joined blob is byte-identical to
    # per-token updates. A per-row Python loop took seconds at the 5M
    # ranges a 100 TB repo carries; this is one str-op pass + one
    # update per 1M-row slab (slabbed so the transient join buffer
    # stays bounded).
    h = hashlib.sha256()
    rids = manifest.sort_values("min_key")["range_id"]
    for start in range(0, len(rids), 1_000_000):
        slab = rids.iloc[start : start + 1_000_000].astype(str)
        h.update("".join((slab.str.len().astype(str) + ":" + slab).tolist()).encode())
    return h.hexdigest()


def write_manifest(manifest: pd.DataFrame, root) -> str:
    """Persist the manifest; returns the content-addressed metarange id.
    Publication is the store's put-if-absent blob path."""
    store = as_store(root)
    mid = metarange_id_of(manifest)
    rel = os.path.join("manifests", f"{mid}.parquet")
    if not store.blob_exists(rel):
        mdir = manifests_dir(store.data_root)
        os.makedirs(mdir, exist_ok=True)
        tmp = os.path.join(mdir, f".{mid}.tmp.{os.getpid()}")
        manifest[MANIFEST_COLS].to_parquet(tmp, index=False)
        store.publish_blob(tmp, rel)
    return mid


#: LRU over loaded manifests, keyed by (data_root, metarange_id).
#: Manifests are content-addressed and immutable, so entries never go
#: stale; the reference keeps the same cache as an LRU over commit
#: manifests for the path-filtered log (pkg/catalog/catalog.go:1734-1828
#: uses it around GetRangeIDByKey). Budgeted by BYTES, not entries: at
#: the reference's design point a manifest is ~20k rows (MBs), but a
#: 100 TB repo at 20 MiB ranges carries ~5M rows ⇒ hundreds of MB per
#: frame — 128 entry-capped frames of that size would OOM the driver.
#: The MRU entry is always retained even when it alone exceeds the
#: budget (evicting it would thrash every repeated read).
_MANIFEST_CACHE: "dict[tuple[str, str], pd.DataFrame]" = {}
_MANIFEST_CACHE_MAX = 128
_MANIFEST_CACHE_MAX_BYTES = int(
    os.environ.get("LAKEFS_SPARK_MANIFEST_CACHE_BYTES", 1 << 30)
)
_MANIFEST_CACHE_BYTES = 0  # current estimated total


def manifest_nbytes(manifest: pd.DataFrame) -> int:
    """Estimated resident bytes of a manifest frame (deep: counts the
    Python string payloads, the dominant term)."""
    return int(manifest.memory_usage(deep=True).sum())


def _read_manifest_uncached(root, metarange_id: str) -> pd.DataFrame:
    path = os.path.join(manifests_dir(root), f"{metarange_id}.parquet")
    return pd.read_parquet(path).sort_values("min_key").reset_index(drop=True)


def read_manifest(root, metarange_id: str) -> pd.DataFrame:
    """Manifest rows, LRU-cached (immutable => cache-forever; callers
    must not mutate the returned frame in place — all engine callers
    filter/concat, which copy)."""
    global _MANIFEST_CACHE_BYTES
    key = (data_root_of(root), metarange_id)
    hit = _MANIFEST_CACHE.pop(key, None)
    if hit is None:
        hit = _read_manifest_uncached(root, metarange_id)
    else:
        _MANIFEST_CACHE_BYTES -= getattr(hit, "_lks_nbytes", 0)
    nb = getattr(hit, "_lks_nbytes", None)
    if nb is None:
        nb = manifest_nbytes(hit)
        try:  # stash the estimate so eviction never re-walks the frame
            hit._lks_nbytes = nb
        except Exception:  # noqa: BLE001 — pandas may block attrs someday
            pass
    _MANIFEST_CACHE[key] = hit  # re-insert = move to MRU end (dicts are ordered)
    _MANIFEST_CACHE_BYTES += nb
    while len(_MANIFEST_CACHE) > 1 and (
        len(_MANIFEST_CACHE) > _MANIFEST_CACHE_MAX
        or _MANIFEST_CACHE_BYTES > _MANIFEST_CACHE_MAX_BYTES
    ):
        evicted = _MANIFEST_CACHE.pop(next(iter(_MANIFEST_CACHE)))
        _MANIFEST_CACHE_BYTES -= getattr(evicted, "_lks_nbytes", 0)
    return hit


def manifest_cache_clear() -> None:
    global _MANIFEST_CACHE_BYTES
    _MANIFEST_CACHE.clear()
    _MANIFEST_CACHE_BYTES = 0


def manifest_cache_stats() -> tuple[int, int]:
    """(entries, estimated_bytes) — for tests and the profile tool."""
    return len(_MANIFEST_CACHE), _MANIFEST_CACHE_BYTES


EMPTY_METARANGE = "empty"


def _range_paths(root: str, range_ids) -> list[str]:
    return [os.path.join(ranges_dir(root), f"{rid}.parquet") for rid in range_ids]


def read_ranges(spark: SparkSession, root: str, range_ids) -> DataFrame:
    """Entries of the given ranges as a DataFrame (metadata decoded)."""
    paths = _range_paths(root, range_ids)
    if not paths:
        return empty_entries(spark)
    df = spark.read.schema(RANGE_FILE_SCHEMA).parquet(*paths)
    return df.withColumn(
        "metadata", F.from_json(F.col("metadata_json"), "map<string,string>")
    ).select(*ENTRY_COLS)


def read_snapshot(
    spark: SparkSession,
    root: str,
    metarange_id: str,
    key_lower: str | None = None,
    key_upper: str | None = None,
    min_rows: int | None = None,
) -> DataFrame:
    """Full snapshot scan with manifest-level range pruning.

    ``key_lower``/``key_upper`` prune at the *file* level via the
    manifest's min/max before Spark ever plans the scan — the
    partition-pruning analog of the reference's SeekGE
    (pkg/graveler/committed/manager.go:49).

    ``min_rows`` is the listing-page window prune: a caller that will
    consume at most ``min_rows`` rows in ascending key order (the
    ``amount+1`` page probe) only needs the shortest key-ordered prefix
    of the surviving ranges guaranteed to hold ``min_rows`` in-bounds
    rows — every later range holds strictly greater keys (global key
    order invariant), so page k stops scanning the whole remaining tail.
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
    if min_rows is not None and len(manifest) > 1:
        # A range straddling a bound has an unknown in-bounds count —
        # score it 0, which only ever keeps MORE ranges than needed.
        m = manifest.sort_values("min_key")
        guaranteed = m["count"].astype("int64").copy()
        if key_lower is not None:
            guaranteed[m["min_key"] < key_lower] = 0
        if key_upper is not None:
            guaranteed[m["max_key"] >= key_upper] = 0
        covered = guaranteed.cumsum() >= int(min_rows)
        if covered.any():
            manifest = m.iloc[: int(covered.to_numpy().argmax()) + 1]
    df = read_ranges(spark, root, manifest["range_id"].tolist())
    if key_lower is not None:
        df = df.where(F.col("key") >= F.lit(key_lower))
    if key_upper is not None:
        df = df.where(F.col("key") < F.lit(key_upper))
    return df


def empty_entries(spark: SparkSession) -> DataFrame:
    from lakefs_spark.schema import ENTRY_SCHEMA

    return spark.createDataFrame([], ENTRY_SCHEMA)
