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
- row materialization is O(page), not O(range): the fold walks the
  Arrow key column, and only the <= amount+1 emitted leaves are
  converted to Python rows (``Table.take``), never a whole range.

Range files are immutable and content-addressed, so parsed Arrow
tables ride a bytes-budgeted LRU (the same design as the manifest LRU
in storage/ranges.py — the reference keeps the analogous pyramid/LRU
caches around its range readers): a 40-page walk decodes each range
once, not once per page. The cache holds decoded INPUT files keyed by
content address — never query results — so every run still computes
from the parquet inputs it reads.

Staging overlays disable the path (tombstones/upserts change
visibility; the overlay path stays distributed), exactly like the
listing window prune. Gate: ``LAKEFS_SPARK_LOCAL_LIST_ROWS`` (default
200k; 0 disables). Equality with the DataFrame path is pinned in
tests/test_locallist.py.
"""

from __future__ import annotations

import bisect
import io
import json
import os

import pandas as pd
from pyspark.sql import Row

from lakefs_spark.functions.prefix import upper_bound_for_prefix
from lakefs_spark.schema import ENTRY_COLS
from lakefs_spark.storage.store import data_root_of

#: Max raw rows (by manifest counts) a local page may scan; above it
#: the DataFrame path runs. 0 = off.
LOCAL_LIST_ROWS = int(os.environ.get("LAKEFS_SPARK_LOCAL_LIST_ROWS", "200000"))

_LIST_FIELDS = ["key", "is_common_prefix", *[c for c in ENTRY_COLS if c != "key"]]
_ListRow = Row(*_LIST_FIELDS)
_EntryRow = Row(*ENTRY_COLS)

_FILE_COLS = [
    "key", "identity", "address", "address_type", "size",
    "etag", "last_modified", "metadata_json", "content_type",
]

from lakefs_spark.storage.localapply import range_table as _range_table  # noqa: E402
from lakefs_spark.storage.localapply import range_cache_clear  # noqa: F401,E402


def _rows_at(tbl, indices: list[int]) -> list[dict]:
    # last_modified is already naive UTC: range_table casts the column
    # at decode time (one vectorized Arrow cast per cached file instead
    # of a per-row astimezone on every page).
    return tbl.take(indices).to_pylist()


def _pruned(manifest: pd.DataFrame, lower: str | None, upper: str | None) -> pd.DataFrame:
    mf = manifest.sort_values("min_key").reset_index(drop=True)
    if lower is not None:
        mf = mf[mf["max_key"] >= lower]
    if upper is not None:
        mf = mf[mf["min_key"] < upper]
    return mf.reset_index(drop=True)


def _entry_tail(src: dict) -> tuple:
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

    rids = mf["range_id"].tolist()
    plen = len(prefix)
    # items: (item_key, owning_range_pos | None, row_index | None)
    items: list[tuple[str, int | None, int | None]] = []
    done = False
    for rpos, rid in enumerate(rids):
        if done:
            break
        _, keys = _range_table(store, rid)
        # jump straight to the first in-bounds key (files are sorted)
        start = 0
        if lower is not None:
            start = bisect.bisect_left(keys, lower)
        if not delimiter and (upper is not None or not prefix):
            # flat fast path: every key in [lower, upper) starts with
            # ``prefix`` (that is exactly what upper_bound_for_prefix
            # bounds) and exceeds ``after`` (lower >= after+'\x00'), so
            # the page is a SLICE — no per-key checks. The pathological
            # prefix with no upper bound (all chars at the max code
            # point) keeps the scanning loop below.
            end = (
                bisect.bisect_left(keys, upper, start)
                if upper is not None
                else len(keys)
            )
            take = min(end - start, limit - len(items))
            items.extend(zip(keys[start : start + take], (rpos,) * take, range(start, start + take)))
            if len(items) >= limit or end < len(keys):
                done = True
            continue
        i = start
        n_keys = len(keys)
        while i < n_keys:
            k = keys[i]
            if prefix and not k.startswith(prefix):
                if upper is not None and k >= upper:
                    done = True
                    break
                i += 1
                continue
            if after and not k > after:
                i += 1
                continue
            if delimiter:
                pos = k.find(delimiter, plen)
                if pos >= 0:
                    g = k[: pos + len(delimiter)]
                    # group members are contiguous in key order; emit
                    # the marker once (post-fold ``after`` re-filter:
                    # the previous page may have ended ON this group)
                    if not (items and items[-1][0] == g and items[-1][1] is None) and (
                        not after or g > after
                    ):
                        items.append((g, None, None))
                        if len(items) >= limit:
                            # item stream is non-decreasing; later keys
                            # can only repeat this group — safe stop
                            done = True
                            break
                    # bisect-jump past the group's remaining members
                    # (every key in [k, upper_bound_for_prefix(g))
                    # starts with g and folds to the same marker)
                    gu = upper_bound_for_prefix(g)
                    if gu is None:
                        i += 1
                        continue
                    i = bisect.bisect_left(keys, gu, i + 1)
                    continue
            items.append((k, rpos, i))
            if len(items) >= limit:
                done = True
                break
            i += 1
    items = items[:limit]

    # materialize ONLY the emitted leaves (O(page), never O(range))
    picks: dict[int, list[int]] = {}
    for item, rpos, i in items:
        if rpos is not None:
            picks.setdefault(rpos, []).append(i)
    leaf_rows: dict[tuple[int, int], dict] = {}
    for rpos, idxs in picks.items():
        tbl, _ = _range_table(store, rids[rpos])
        for i, r in zip(idxs, _rows_at(tbl, idxs)):
            leaf_rows[(rpos, i)] = r

    out = []
    nulls = (None,) * (len(ENTRY_COLS) - 1)
    for item, rpos, i in items:
        if rpos is None:
            out.append(_ListRow(item, True, *nulls))
        else:
            out.append(_ListRow(item, False, *_entry_tail(leaf_rows[(rpos, i)])))
    return out


def get_local(store, manifest: pd.DataFrame, key: str) -> tuple[bool, object]:
    """(handled, row_or_None): a committed point lookup served by a
    binary search over the single range whose interval can contain the
    key."""
    if LOCAL_LIST_ROWS <= 0:
        return False, None
    mf = _pruned(manifest, key, key + "\x00")
    if not len(mf):
        return True, None
    tbl, keys = _range_table(store, mf.iloc[0]["range_id"])
    i = bisect.bisect_left(keys, key)
    if i >= len(keys) or keys[i] != key:
        return True, None
    r = _rows_at(tbl, [i])[0]
    return True, _EntryRow(r["key"], *_entry_tail(r))
