"""Driver-side listing pages and point lookups — the size-gated fast
path for committed refs.

A listing PAGE materializes at most ``amount+1`` rows, and a point
lookup exactly one, yet the DataFrame path pays a full Spark job
(plan + schedule + collect, ~0.15-0.4 s) per page — the dominant cost
of every paged flow (the reference serves these from one iterator on
one node, pkg/catalog/entry_listing_iterator.go). This module computes
the SAME rows on the driver when the pruned key interval is provably
small by manifest counts:

- manifest pruning and the flat-page guaranteed-count window prune are
  the same rules ``ranges.read_snapshot`` applies;
- the delimiter fold replicates ``operators.listing.list_entries``
  (first-delimiter-after-prefix truncation, post-fold ``after``
  re-filter) — item order is provably the DataFrame path's global key
  order because a fold item is a prefix of its member keys and group
  members are contiguous;
- only the KEY column of the pruned ranges is decoded for the fold;
  full rows are fetched per containing range for just the <= amount+1
  emitted leaves.

Staging overlays disable the path (tombstones/upserts change
visibility; the overlay path stays distributed), exactly like the
listing window prune. Gate: ``LAKEFS_SPARK_LOCAL_LIST_ROWS`` (default
200k; 0 disables). Equality with the DataFrame path is pinned in
tests/test_locallist.py.
"""

from __future__ import annotations

import io
import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import Row

from lakefs_spark.functions.prefix import upper_bound_for_prefix
from lakefs_spark.schema import ENTRY_COLS
from lakefs_spark.storage.localapply import read_range_rows

#: Max raw rows (by manifest counts) a local page may scan; above it
#: the DataFrame path runs. 0 = off.
LOCAL_LIST_ROWS = int(os.environ.get("LAKEFS_SPARK_LOCAL_LIST_ROWS", "200000"))

_LIST_FIELDS = ["key", "is_common_prefix", *[c for c in ENTRY_COLS if c != "key"]]
_ListRow = Row(*_LIST_FIELDS)
_EntryRow = Row(*ENTRY_COLS)


def _read_keys(store, range_id: str) -> list[str]:
    import pyarrow.parquet as pq

    raw = store.read_blob(os.path.join("ranges", f"{range_id}.parquet"))
    return pq.read_table(io.BytesIO(raw), columns=["key"]).column("key").to_pylist()


def _pruned(manifest: pd.DataFrame, lower: str | None, upper: str | None) -> pd.DataFrame:
    mf = manifest.sort_values("min_key").reset_index(drop=True)
    if lower is not None:
        mf = mf[mf["max_key"] >= lower]
    if upper is not None:
        mf = mf[mf["min_key"] < upper]
    return mf.reset_index(drop=True)


def _entry_row(src: dict) -> tuple:
    meta = src.get("metadata_json")
    return (
        src["identity"], src["address"], src["address_type"], src["size"],
        src["etag"], src["last_modified"],
        None if meta is None else json.loads(meta), src["content_type"],
    )


def page_local(
    store,
    manifest: pd.DataFrame,
    prefix: str,
    after: str,
    delimiter: str,
    amount: int,
) -> list | None:
    """Up to ``amount+1`` listing rows (the has-more probe's worth), or
    None when the pruned interval is too big for the driver."""
    limit = amount + 1
    lower = prefix or None
    if after and (lower is None or after >= lower):
        lower = after + "\x00"
    upper = upper_bound_for_prefix(prefix) if prefix else None
    mf = _pruned(manifest, lower, upper)
    if not len(mf):
        return []
    counts = mf["count"].astype("int64")
    if not delimiter and len(mf) > 1:
        # flat-page window prune: shortest prefix of ranges GUARANTEED
        # to hold `limit` in-bounds rows (read_snapshot's exact rule)
        guaranteed = counts.copy()
        if lower is not None:
            guaranteed[mf["min_key"] < lower] = 0
        if upper is not None:
            guaranteed[mf["max_key"] >= upper] = 0
        covered = guaranteed.cumsum() >= limit
        if covered.any():
            mf = mf.iloc[: int(covered.to_numpy().argmax()) + 1].reset_index(drop=True)
            counts = mf["count"].astype("int64")
    if int(counts.sum()) > LOCAL_LIST_ROWS:
        return None

    keys: list[str] = []
    for rid in mf["range_id"]:
        keys.extend(_read_keys(store, rid))  # per-file sorted, files disjoint+ordered

    # raw filters (scan-prune analog): prefix + exclusive-start marker
    plen = len(prefix)
    items: list[tuple[str, str | None]] = []  # (item key, leaf raw key | None)
    for k in keys:
        if prefix and not k.startswith(prefix):
            continue
        if after and not k > after:
            continue
        if delimiter:
            pos = k.find(delimiter, plen)
            if pos >= 0:
                g = k[: pos + len(delimiter)]
                # members of a group are contiguous in key order
                if items and items[-1][0] == g and items[-1][1] is None:
                    continue
                # post-fold marker re-filter (the previous page may have
                # ended ON this group)
                if after and not g > after:
                    continue
                items.append((g, None))
                if len(items) >= limit:
                    # the item stream is non-decreasing and later keys
                    # can only repeat the group just emitted — safe stop
                    break
                continue
        items.append((k, k))
        if len(items) >= limit:
            break
    items = items[:limit]

    # fetch full rows for the emitted leaves, one read per owning range
    leaf_keys = [raw for _, raw in items if raw is not None]
    rows_by_key: dict[str, dict] = {}
    if leaf_keys:
        mk = mf["max_key"].to_numpy(dtype=object)
        pos = np.minimum(
            np.searchsorted(mk, np.array(leaf_keys, dtype=object), side="left"),
            len(mk) - 1,
        )
        for p in sorted({int(x) for x in pos}):
            for r in read_range_rows(store, mf.iloc[p]["range_id"]):
                rows_by_key[r["key"]] = r

    out = []
    nulls = (None,) * (len(ENTRY_COLS) - 1)
    for item, raw in items:
        if raw is None:
            out.append(_ListRow(item, True, *nulls))
        else:
            out.append(_ListRow(item, False, *_entry_row(rows_by_key[raw])))
    return out


def get_local(store, manifest: pd.DataFrame, key: str) -> tuple[bool, object]:
    """(handled, row_or_None): a committed point lookup served from the
    single range whose interval can contain the key."""
    if LOCAL_LIST_ROWS <= 0:
        return False, None
    mf = _pruned(manifest, key, key + "\x00")
    if not len(mf):
        return True, None
    for r in read_range_rows(store, mf.iloc[0]["range_id"]):
        if r["key"] == key:
            meta = r.get("metadata_json")
            return True, _EntryRow(
                r["key"], r["identity"], r["address"], r["address_type"],
                r["size"], r["etag"], r["last_modified"],
                None if meta is None else json.loads(meta), r["content_type"],
            )
    return True, None
