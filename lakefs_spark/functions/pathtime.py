"""Time-partitioned physical-address minting + path-time GC pruning.

The reference mints uploaded-object addresses as
``data/<partition>/<xid>`` where the partition encodes REVERSE time —
``unixYear4000 - now`` — and rotates hourly or every 50k ids
(pkg/upload/path_provider.go:20-47, DefaultDataPartitionSize/
DefaultDataInterval, unixYear4000 = 64060588800). Two properties fall
out, both load-bearing for uncommitted GC at 100 TB:

1. Newer partitions sort lexicographically FIRST, so a newest-first
   object-store listing reaches in-flight uploads immediately.
2. An address's age is recoverable from its PATH
   (``ResolvePathTime``), so "exclude objects newer than the cutoff"
   is a pure STRING RANGE predicate — no per-object stat calls, and
   in this engine the predicate pushes down to Parquet min/max stats
   on the address column.

This module is the Spark-side analog, with two disclosed deviations:
the partition is the zero-padded hex of
``unixYear4000 - rotation_hour(ts)`` (hex instead of the reference's
base32 xid prefix; the ordering property is identical because the
width is fixed, and the age resolves from the partition rather than
an embedded xid), and rotation is TIME-ONLY — the reference also
rotates after 50k ids (DefaultDataPartitionSize) to spread hot-hour
writes across object-store prefixes. Here all of an hour's mints
share one ``data/t<hex>/`` prefix with a random token tail; S3-class
stores auto-split hot prefixes on the tail, so the id-count rotation
is omitted rather than half-implemented statefully.
Addresses minted elsewhere (no ``data/t`` prefix) never match the
"newer" predicate, so they conservatively stay subject to the
engine's existing mtime-based min-age handling.
"""

from __future__ import annotations

import time as _time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: epoch of Jan 1 4000 — the reverse-time anchor
#: (pkg/upload/path_provider.go:38 unixYear4000; changing it is a
#: breaking change there and here)
UNIX_YEAR_4000 = 64060588800

#: partition rotation interval (DefaultDataInterval = 1h)
PART_SECONDS = 3600

#: address prefix for time-partitioned data (DefaultDataPrefix "data",
#: with a 't' marker so legacy random-sharded addresses stay distinct)
PREFIX = "data/t"


def partition_hex(ts: float) -> str:
    """Reverse-time partition for ``ts``: newer => smaller hex."""
    rotation = int(ts) // PART_SECONDS * PART_SECONDS
    return format(UNIX_YEAR_4000 - rotation, "012x")


def new_physical_path(token: str, ts: float | None = None) -> str:
    """Mint ``data/t<partition>/<token>`` (NewPath analog)."""
    return f"{PREFIX}{partition_hex(ts if ts is not None else _time.time())}/{token}"


def resolve_path_time(address: str) -> float | None:
    """Rotation-hour timestamp encoded in the address, or None for
    non-time-partitioned addresses (ResolvePathTime analog — ours
    reads the partition, the reference reads the embedded xid)."""
    if not address.startswith(PREFIX):
        return None
    part = address[len(PREFIX):].split("/", 1)[0]
    if len(part) != 12:
        return None
    try:
        return float(UNIX_YEAR_4000 - int(part, 16))
    except ValueError:
        return None


def path_newer_than(addr: Column, cutoff_ts: float) -> Column:
    """TRUE for time-partitioned addresses minted at-or-after the
    cutoff's rotation hour — ONE string range predicate
    (``'data/t' <= addr < 'data/t' + hex(cutoff_hour - 1h)``),
    pushdown-friendly. The bound is widened ONE rotation so the
    cutoff's own hour counts as new: the partition only resolves mint
    time to the hour, and an upload minted minutes after the cutoff
    instant lands in that same bucket — it must be protected even when
    the listing's mtimes are unreliable (the reference has no such
    hole because its xids resolve to the second; the widening errs
    exactly one hour conservative). Non-time-partitioned addresses are
    never "newer" (they fall back to mtime-based min-age handling)."""
    bound = PREFIX + partition_hex(cutoff_ts - PART_SECONDS)
    return (addr >= F.lit(PREFIX)) & (addr < F.lit(bound))


def prune_new_addresses(listing: DataFrame, cutoff_ts: float,
                        addr_col: str = "address") -> DataFrame:
    """Drop listing rows newer than the cutoff BEFORE GC candidacy —
    the in-flight-upload guard of the reference's uncommitted GC
    (pkg/catalog/gc_write_uncommitted.go skips new partitions at
    listing time; here the same cut is a pushed-down range filter)."""
    return listing.where(~path_newer_than(F.col(addr_col), cutoff_ts))
