"""Driver-side small-op COW apply — the size-gated fast path.

The reference applies a commit by merging sorted iterators on ONE node
(pkg/graveler/committed/commit.go): commits are metadata operations
whose cost is the changed ranges, not the repo, and lakeFS never spins
up a cluster job to land a two-key commit. Our distributed apply
(commit_apply._apply_cow) is the 100 TB path; BELOW a size threshold
the Spark job COUNT, not the data, dominates wall time (measured
~3.2 s for a 1-key commit on a 35-range base — ~5 sequential jobs at
0.2-0.4 s scheduling/planning each, guide §1.2). This module
reproduces the apply BIT-EXACTLY on the driver for small change sets:
same touched-range rule, same boundary-key algebra, same chunk
assignment, same content addresses, digit for digit — so the manifest
(and therefore every commit id, diff, and listing) is byte-identical
to what the distributed path produces. Pinned by
tests/test_localapply.py against the distributed path and by the
oracle gates (every repo_* gate hashes snapshots whose range ids
embed these content addresses).

Exact-parity kernels (each pinned against Spark in the tests):
- ``xxh64``       == F.xxhash64 (seed 42) over the key's UTF-8 bytes;
- ``ts_to_str``   == CAST(timestamp AS string) under the engine's UTC
                     session (micros, trailing zeros trimmed);
- ``meta_json``   == to_json(map_from_entries(array_sort(map_entries)))
                     (Jackson string escaping == json.dumps with
                     ensure_ascii=False for string->string maps);
- ``_range_manifest_row`` == the sha2 lane-sum content address of
                     ranges.write_ranges_prechunked.

Scale safety: the gate is ``LAKEFS_SPARK_LOCAL_APPLY_ROWS`` (default
100k) on REBUILD rows = deduped changes + Σ manifest counts of the
touched ranges — both known before any row is read — so a big commit,
a big merge, or a small change touching fat ranges all fall through
to the distributed path untouched. Set to 0 to disable entirely.
"""

from __future__ import annotations

import io
import json
import os
import tempfile
from datetime import timezone
from functools import cmp_to_key

import numpy as np
import pandas as pd

from lakefs_spark.schema import ENTRY_COLS

#: Max rebuild rows (deduped changes + Σ touched range counts) the
#: driver path accepts; above it the distributed apply runs. 0 = off.
LOCAL_APPLY_ROWS = int(os.environ.get("LAKEFS_SPARK_LOCAL_APPLY_ROWS", "100000"))

_ENTRY_FILE_COLS = [
    "key", "identity", "address", "address_type", "size",
    "etag", "last_modified", "metadata_json", "content_type",
]

# -- Spark-parity kernels ----------------------------------------------------

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 (unsigned), bit-equal to Spark's xxhash64 for the same
    bytes (Spark hashes a string column's UTF-8 bytes, seed 42)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little")); i += 8
            v2 = _round(v2, int.from_bytes(data[i:i + 8], "little")); i += 8
            v3 = _round(v3, int.from_bytes(data[i:i + 8], "little")); i += 8
            v4 = _round(v4, int.from_bytes(data[i:i + 8], "little")); i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def boundary_flag_local(key: str, raggedness: int) -> bool:
    """== pmod(xxhash64(key), raggedness) == 0 (chunker.boundary_flag).
    Python's % on ints is already pmod (non-negative for positive
    modulus), and signed-vs-unsigned 2^64 views agree mod raggedness
    only via the signed value — so reconstruct Spark's signed long."""
    h = xxh64(key.encode("utf-8"))
    if h >= 1 << 63:
        h -= 1 << 64
    return h % raggedness == 0


def ts_to_str(ts) -> str:
    """== CAST(timestamp AS string) under the UTC session: seconds, then
    micros with trailing zeros trimmed, no trailing dot."""
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    s = (
        f"{ts.year:04d}-{ts.month:02d}-{ts.day:02d} "
        f"{ts.hour:02d}:{ts.minute:02d}:{ts.second:02d}"
    )
    if ts.microsecond:
        s += ("." + f"{ts.microsecond:06d}").rstrip("0")
    return s


def meta_json(m) -> str | None:
    """== to_json(map_from_entries(array_sort(map_entries(metadata)))):
    canonical sorted-keys compact JSON; Jackson's escaping of a
    string->string map equals json.dumps(ensure_ascii=False)."""
    if m is None:
        return None
    items = sorted(m.items() if isinstance(m, dict) else m)
    return json.dumps(dict(items), separators=(",", ":"), ensure_ascii=False)


def _cast_str(v) -> str | None:
    """Spark CAST(col AS string) of the persisted range columns."""
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, bool):  # not persisted, defensive
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    return ts_to_str(v)  # datetime/pd.Timestamp


def _range_manifest_row(rows: list[dict]) -> dict:
    """The manifest row (content address et al.) of one sorted chunk —
    digit-for-digit the sha2 lane-sum aggregation in
    ranges.write_ranges_prechunked."""
    import hashlib

    lanes = [0, 0, 0, 0]
    est = 0
    for r in rows:
        parts = []
        for c in _ENTRY_FILE_COLS:
            v = _cast_str(r.get(c))
            if v is None:
                v = "\x00null"
            parts.append(f"{len(v)}:{v}")
        digest = hashlib.sha256("".join(parts).encode("utf-8")).hexdigest()
        for i in range(4):
            lanes[i] = (lanes[i] + int(digest[i * 16: i * 16 + 15], 16)) % (1 << 64)
        est += int(r["size"] or 0)
    count = len(rows)
    min_key, max_key = rows[0]["key"], rows[-1]["key"]
    rid = hashlib.sha256(
        ":".join(
            [str(count), str(lanes[0]), str(lanes[1]), str(lanes[2]), str(lanes[3]),
             min_key, max_key]
        ).encode("utf-8")
    ).hexdigest()
    return {
        "range_id": rid,
        "min_key": min_key,
        "max_key": max_key,
        "count": count,
        "estimated_size": est,
    }


# -- range-file I/O through the store ---------------------------------------


def _pa_schema():
    import pyarrow as pa

    # matches what Spark's parquet writer persists for a range file
    # (ranges.RANGE_FILE_SCHEMA): INT64 micros timestamps adjusted to
    # UTC (the engine's session timezone is pinned to UTC)
    return pa.schema(
        [
            ("key", pa.string()),
            ("identity", pa.string()),
            ("address", pa.string()),
            ("address_type", pa.string()),
            ("size", pa.int64()),
            ("etag", pa.string()),
            ("last_modified", pa.timestamp("us", tz="UTC")),
            ("metadata_json", pa.string()),
            ("content_type", pa.string()),
        ]
    )


#: Decoded-range LRU: parsed Arrow tables keyed by CONTENT ADDRESS
#: (range files are immutable — the same never-stale justification as
#: the manifest LRU in storage/ranges.py; the reference keeps the
#: analogous tier cache around its range readers). Bytes-budgeted.
#: Holds decoded INPUT files, never query results — every run still
#: computes from the parquet it reads.
_RANGE_CACHE: "dict[tuple[str, str], tuple]" = {}  # key -> (tbl, keys, nbytes)
_RANGE_CACHE_BYTES = 0
_RANGE_CACHE_MAX_BYTES = int(
    os.environ.get("LAKEFS_SPARK_LOCAL_RANGE_CACHE_BYTES", 256 << 20)
)


def range_table(store, range_id: str):
    """(arrow_table, key_list) of one range file, LRU-cached."""
    global _RANGE_CACHE_BYTES
    import pyarrow.parquet as pq

    from lakefs_spark.storage.store import data_root_of

    ck = (data_root_of(store), range_id)
    hit = _RANGE_CACHE.pop(ck, None)
    if hit is None:
        import pyarrow as pa

        raw = store.read_blob(os.path.join("ranges", f"{range_id}.parquet"))
        tbl = pq.read_table(io.BytesIO(raw), columns=_ENTRY_FILE_COLS)
        # normalize last_modified to NAIVE UTC once, vectorized: the
        # persisted column is timestamp[us, UTC] and every consumer
        # (page rows, apply rows) wants the session's naive-UTC form —
        # one Arrow cast here replaces a per-row astimezone in each of
        # them (the epoch micros are unchanged; dropping the tz reads
        # them as UTC wall time, exactly astimezone(utc).replace(None)).
        idx = tbl.schema.get_field_index("last_modified")
        if getattr(tbl.schema.field(idx).type, "tz", None) is not None:
            tbl = tbl.set_column(
                idx,
                pa.field("last_modified", pa.timestamp("us")),
                tbl.column(idx).cast(pa.timestamp("us")),
            )
        hit = (tbl, tbl.column("key").to_pylist(), int(tbl.nbytes))
    else:
        _RANGE_CACHE_BYTES -= hit[2]
    _RANGE_CACHE[ck] = hit  # (re-)insert = MRU
    _RANGE_CACHE_BYTES += hit[2]
    while len(_RANGE_CACHE) > 1 and _RANGE_CACHE_BYTES > _RANGE_CACHE_MAX_BYTES:
        evicted = _RANGE_CACHE.pop(next(iter(_RANGE_CACHE)))
        _RANGE_CACHE_BYTES -= evicted[2]
    return hit[0], hit[1]


def range_cache_clear() -> None:
    global _RANGE_CACHE_BYTES
    _RANGE_CACHE.clear()
    _RANGE_CACHE_BYTES = 0


def read_range_rows(store, range_id: str) -> list[dict]:
    """Rows of one range file (metadata_json form), key-sorted as
    persisted; last_modified is naive UTC (cast once at decode in
    range_table)."""
    tbl, _ = range_table(store, range_id)
    return tbl.to_pylist()


def _publish_chunk(store, rows: list[dict], range_id: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = _pa_schema()
    cols = {c: [r.get(c) for r in rows] for c in _ENTRY_FILE_COLS}
    tbl = pa.Table.from_pydict(cols, schema=schema)
    fd, tmp = tempfile.mkstemp(suffix=".parquet")
    os.close(fd)
    try:
        pq.write_table(tbl, tmp, compression="snappy")
        store.publish_blob(tmp, os.path.join("ranges", f"{range_id}.parquet"))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


# -- the apply ---------------------------------------------------------------


def _entry_of(c: dict) -> dict:
    return {k: c.get(k) for k in _ENTRY_FILE_COLS}


def _write_sorted_entries(store, merged: list[dict], bks: list[str]) -> list[dict]:
    """Chunk a KEY-SORTED entry list at the boundary keys (chunk i
    covers (b[i-1], b[i]], assign_chunks side='left') and publish each
    non-empty chunk; returns the new manifest rows."""
    out: list[dict] = []
    if not merged:
        return out
    arr = np.array([r["key"] for r in merged], dtype=object)
    if bks:
        idx = np.searchsorted(arr, np.array(bks, dtype=object), side="left")
        # a boundary key PRESENT in the data ends its chunk: side='left'
        # assignment puts key == boundary INTO that chunk, so the split
        # point is one past it
        for j, b in enumerate(bks):
            if idx[j] < len(arr) and arr[idx[j]] == b:
                idx[j] += 1
        splits = [0, *[int(x) for x in idx], len(arr)]
    else:
        splits = [0, len(arr)]
    for lo, hi in zip(splits, splits[1:]):
        if hi > lo:
            row = _range_manifest_row(merged[lo:hi])
            _publish_chunk(store, merged[lo:hi], row["range_id"])
            out.append(row)
    return out


def write_snapshot_local(store, entries: list[dict], raggedness: int) -> pd.DataFrame:
    """Empty-base apply (first commit / small import): == write_ranges."""
    entries = sorted((_entry_of(e) for e in entries), key=lambda r: r["key"])
    bks = sorted({r["key"] for r in entries if boundary_flag_local(r["key"], raggedness)})
    rows = _write_sorted_entries(store, entries, bks)
    return _manifest_frame(rows)


def _manifest_frame(rows: list[dict]) -> pd.DataFrame:
    from lakefs_spark.storage.ranges import MANIFEST_COLS

    if not rows:
        return pd.DataFrame(columns=MANIFEST_COLS)
    mf = pd.DataFrame(rows, columns=MANIFEST_COLS)
    mf["count"] = mf["count"].astype("int64")
    mf["estimated_size"] = mf["estimated_size"].astype("int64")
    return mf.sort_values("min_key").reset_index(drop=True)


def apply_changes_local(
    store, base_manifest: pd.DataFrame | None, changes: list[dict], raggedness: int
) -> pd.DataFrame:
    """Driver-side replica of commit_apply._apply_cow for a deduped
    change list (dicts with is_tombstone + entry cols, metadata already
    canonical metadata_json). Same touched rule (incl. the
    tombstone-on-max-key p+1 boundary dissolution), same edge-key
    injection, same boundary algebra, same chunking, same content
    addresses."""
    from lakefs_spark.storage.commit_apply import _assert_sorted_disjoint
    from lakefs_spark.storage.ranges import MANIFEST_COLS

    if base_manifest is None or base_manifest.empty:
        return write_snapshot_local(
            store, [c for c in changes if not c["is_tombstone"]], raggedness
        )
    mf = base_manifest.sort_values("min_key").reset_index(drop=True)
    max_keys = mf["max_key"].tolist()
    n = len(max_keys)

    ckeys = np.array([c["key"] for c in changes], dtype=object)
    pos = np.minimum(
        np.searchsorted(np.array(max_keys, dtype=object), ckeys, side="left"), n - 1
    )
    touched: set[int] = set()
    for c, p in zip(changes, pos):
        p = int(p)
        touched.add(p)
        if c["is_tombstone"] and p + 1 < n and c["key"] == max_keys[p]:
            touched.add(p + 1)
    touched_sorted = sorted(touched)

    base_rows: list[dict] = []
    for rid in mf.iloc[touched_sorted]["range_id"]:
        base_rows.extend(read_range_rows(store, rid))

    change_keys = {c["key"] for c in changes}
    merged = [r for r in base_rows if r["key"] not in change_keys]
    merged.extend(_entry_of(c) for c in changes if not c["is_tombstone"])
    merged.sort(key=lambda r: r["key"])

    last = n - 1
    edge_keys = {
        max_keys[p]
        for i, p in enumerate(touched_sorted)
        if p != last
        and (i + 1 == len(touched_sorted) or touched_sorted[i + 1] != p + 1)
    }
    bks = sorted(
        {r["key"] for r in merged if boundary_flag_local(r["key"], raggedness)}
        | edge_keys
    )
    new_rows = _write_sorted_entries(store, merged, bks)

    untouched = mf[~mf.index.isin(touched)]
    out = pd.concat(
        [untouched[MANIFEST_COLS], _manifest_frame(new_rows)], ignore_index=True
    )
    out = out.sort_values("min_key").reset_index(drop=True)
    _assert_sorted_disjoint(out)
    return out


# -- staged-layer loading (the commit/compact entry point) -------------------


def _overlay_cmp(a: dict, b: dict) -> int:
    """overlay_raw's winner order: seq ASC then identity/etag/address
    DESC NULLS LAST (operators/overlay._tiebreak)."""
    if a["seq"] != b["seq"]:
        return -1 if a["seq"] < b["seq"] else 1
    for c in ("identity", "etag", "address"):
        x, y = a.get(c), b.get(c)
        if x == y:
            continue
        if x is None:
            return 1
        if y is None:
            return -1
        return -1 if x > y else 1
    return 0


def load_staged_small(staging_dir: str, limit: int) -> list[dict] | None:
    """The branch's staged layer as a deduped change list (one row per
    key, overlay_raw's exact winner), IF its raw row count (from the
    parquet footers — no data read) is <= ``limit``; else None.

    Replicates _staged_raw + overlay_raw: seq dirs negated so the
    newest batch wins, per-key tiebreak identical."""
    import pyarrow.parquet as pq

    if not os.path.isdir(staging_dir):
        return None
    parts: list[tuple[int, str]] = []
    for d in os.listdir(staging_dir):
        if not d.startswith("seq="):
            continue
        sd = os.path.join(staging_dir, d)
        seq = -int(d.split("=", 1)[1])  # _staged_raw negates: newest first
        for f in os.listdir(sd):
            if f.endswith(".parquet"):
                parts.append((seq, os.path.join(sd, f)))
    if not parts:
        return None
    total = 0
    for _, p in parts:
        total += pq.ParquetFile(p).metadata.num_rows
        if total > limit:
            return None
    rows: list[dict] = []
    for seq, p in parts:
        for r in pq.read_table(p).to_pylist():
            r["seq"] = seq
            ts = r.get("last_modified")
            if ts is not None and ts.tzinfo is not None:
                r["last_modified"] = ts.astimezone(timezone.utc).replace(tzinfo=None)
            r["metadata_json"] = meta_json(r.pop("metadata", None))
            rows.append(r)
    rows.sort(key=cmp_to_key(_overlay_cmp))
    seen: set[str] = set()
    out: list[dict] = []
    for r in rows:
        if r["key"] not in seen:
            seen.add(r["key"])
            out.append(r)
    out.sort(key=lambda r: r["key"])
    return out


def rebuild_rows_estimate(base_manifest: pd.DataFrame | None, changes: list[dict]) -> int:
    """Deduped changes + Σ manifest counts of the ranges they touch —
    the rebuild size the local path would process, from metadata only."""
    if base_manifest is None or base_manifest.empty:
        return len(changes)
    mf = base_manifest.sort_values("min_key").reset_index(drop=True)
    max_keys = np.array(mf["max_key"].tolist(), dtype=object)
    n = len(max_keys)
    ckeys = np.array([c["key"] for c in changes], dtype=object)
    pos = np.minimum(np.searchsorted(max_keys, ckeys, side="left"), n - 1)
    touched = set(int(p) for p in pos)
    for c, p in zip(changes, pos):
        p = int(p)
        if c["is_tombstone"] and p + 1 < n and c["key"] == max_keys[p]:
            touched.add(p + 1)
    counts = mf["count"].astype("int64")
    return len(changes) + int(counts.iloc[sorted(touched)].sum())


# -- driver-side merge ladder (Phase D) --------------------------------------


def merge_actions_local(sb_rows, ss_rows, db_rows, ds_rows, strategy: str) -> list[dict]:
    """== merge_changes_from_sides over the same pruned row sets, for
    the three stock strategies (a user resolver chain is Spark Column
    expressions and routes to the distributed ladder). Rows are range-
    file-form dicts (metadata_json); the output is the action list
    sorted by key, payload from the source side (delete rows all-null)
    — exactly the distributed stream's rows. Pinned against
    merge_changes_from_sides in tests/test_localapply.py."""

    def qual(b_rows, s_rows):
        b = {r["key"]: r["identity"] for r in b_rows}
        s = {r["key"]: r for r in s_rows}
        out = {}
        for k in b.keys() | s.keys():
            b_id = b.get(k, None)
            sr = s.get(k)
            s_id = sr["identity"] if sr is not None else None
            # _qualified_side's `changed`: absent either side or != —
            # note a key ABSENT from the base dict and the side dict
            # cannot occur (k ranges over the union)
            if (k not in b) or (b_id is None) or (s_id is None) or (b_id != s_id):
                out[k] = (s_id, sr)
        return out

    sq = qual(sb_rows, ss_rows)
    dq = qual(db_rows, ds_rows)
    actions: list[dict] = []
    for k, (s_id, sr) in sq.items():
        s_act = "delete" if s_id is None else "set"
        if k in dq:
            d_id = dq[k][0]
            if s_id == d_id:  # eqNullSafe: both-deleted == both-same
                continue
            if strategy == "src":
                act = s_act
            elif strategy == "dest":
                continue  # keep dest == no action
            else:
                act = "conflict"
        else:
            act = s_act
        row = {"key": k, "action": act}
        src = sr if sr is not None else {}
        for c in _ENTRY_FILE_COLS:
            if c != "key":
                row[c] = src.get(c)
        actions.append(row)
    actions.sort(key=lambda r: r["key"])
    return actions


def merge_actions_small(
    store,
    base_mf: pd.DataFrame,
    src_mf: pd.DataFrame,
    dest_mf: pd.DataFrame,
    strategy: str,
    limit: int,
) -> list[dict] | None:
    """The merge action stream computed driver-side, IF the pruned diff
    inputs (ranges whose ids differ between base and each side — the
    exact sets _pruned_sides reads) total <= ``limit`` rows by manifest
    counts; else None. Metadata-only gate: no row is read before the
    decision."""

    def side_ids(lm, rm):
        lids = set(lm["range_id"]) if len(lm) else set()
        rids = set(rm["range_id"]) if len(rm) else set()
        return sorted(lids - rids), sorted(rids - lids)

    sb_ids, ss_ids = side_ids(base_mf, src_mf)
    db_ids, ds_ids = side_ids(base_mf, dest_mf)
    count_of: dict[str, int] = {}
    for mf in (base_mf, src_mf, dest_mf):
        if len(mf):
            count_of.update(zip(mf["range_id"], mf["count"].astype("int64")))
    total = sum(count_of[r] for ids in (sb_ids, ss_ids, db_ids, ds_ids) for r in ids)
    if total > limit:
        return None

    def rows(ids):
        out: list[dict] = []
        for rid in ids:
            out.extend(read_range_rows(store, rid))
        return out

    return merge_actions_local(
        rows(sb_ids), rows(ss_ids), rows(db_ids), rows(ds_ids), strategy
    )


def changes_of_actions(actions: list[dict]) -> list[dict]:
    """Non-conflict action dicts -> the is_tombstone change list
    (already metadata_json form, key-sorted)."""
    out = []
    for a in actions:
        if a["action"] == "conflict":
            continue
        d = dict(a)
        d["is_tombstone"] = d.pop("action") == "delete"
        out.append(d)
    return out


_ACTIONS_DDL = (
    "key string, action string, identity string, address string, "
    "address_type string, size long, etag string, last_modified timestamp, "
    "metadata map<string,string>, content_type string"
)


def _action_tuple(a: dict):
    return (
        a["key"], a["action"], a.get("identity"), a.get("address"),
        a.get("address_type"),
        None if a.get("size") is None else int(a["size"]),
        a.get("etag"), a.get("last_modified"),
        None if a.get("metadata_json") is None else json.loads(a["metadata_json"]),
        a.get("content_type"),
    )


def conflicts_df(spark, actions: list[dict]):
    """The conflict rows as a DataFrame in the distributed action
    stream's schema (callers count/list/resolve it)."""
    rows = [_action_tuple(a) for a in actions if a["action"] == "conflict"]
    return spark.createDataFrame(rows, _ACTIONS_DDL)


def changes_df(spark, changes: list[dict]):
    """Change list -> the DataFrame shape apply_changes consumes
    (fallback when a locally-computed action stream touches ranges too
    fat for the local apply)."""
    rows = []
    for c in changes:
        t = _action_tuple({**c, "action": "delete" if c["is_tombstone"] else "set"})
        rows.append((c["is_tombstone"], *t[:1], *t[2:]))
    ddl = (
        "is_tombstone boolean, key string, identity string, address string, "
        "address_type string, size long, etag string, last_modified timestamp, "
        "metadata map<string,string>, content_type string"
    )
    return spark.createDataFrame(rows, ddl)


def rows_to_changes(rows) -> list[dict]:
    """Collected change Rows (is_tombstone or action form, metadata as
    a map) -> the deduped change list apply_changes_local consumes
    (metadata -> canonical JSON)."""
    out = []
    for r in rows:
        d = r.asDict(recursive=False) if hasattr(r, "asDict") else dict(r)
        ts = d.get("last_modified")
        if ts is not None and ts.tzinfo is not None:
            d["last_modified"] = ts.astimezone(timezone.utc).replace(tzinfo=None)
        d["metadata_json"] = meta_json(d.pop("metadata", None))
        if "action" in d:
            d["is_tombstone"] = d.pop("action") == "delete"
        out.append(d)
    out.sort(key=lambda r: r["key"])
    return out


def staged_to_changes(staged: list[dict]) -> list[dict]:
    """load_staged_small output (already deduped, metadata_json form)
    as the change list (drops seq)."""
    return [{k: v for k, v in r.items() if k != "seq"} for r in staged]
