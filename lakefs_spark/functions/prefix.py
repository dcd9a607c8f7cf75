"""Prefix -> closed-range predicate rewrite.

The reference bounds prefix scans with an exclusive upper bound computed
by incrementing the last non-0xFF byte of the prefix
(pkg/graveler/prefix.go:9-21, ``UpperBoundForPrefix``). Rewriting
``startswith(p)`` as ``key >= p AND key < upper(p)`` lets the predicate
push down to Parquet min/max stats and to manifest-level range pruning,
where a generic ``startswith`` may not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def upper_bound_for_prefix(prefix: str) -> str | None:
    """Smallest string greater than every string with this prefix.

    Returns None when no upper bound exists (prefix is all 0xff/empty).
    """
    if not prefix:
        return None
    buf = bytearray(prefix.encode("utf-8"))
    for i in range(len(buf) - 1, -1, -1):
        if buf[i] != 0xFF:
            buf[i] += 1
            return buf[: i + 1].decode("utf-8", errors="surrogateescape")
    return None


def prefix_predicate(key: Column, prefix: str) -> Column:
    """Range-form predicate equivalent to ``key.startswith(prefix)``."""
    if not prefix:
        return F.lit(True)
    upper = upper_bound_for_prefix(prefix)
    pred = key >= F.lit(prefix)
    if upper is not None:
        pred = pred & (key < F.lit(upper))
    return pred
