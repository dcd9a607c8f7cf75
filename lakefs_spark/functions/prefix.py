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

    The reference increments the last non-0xFF *byte*
    (pkg/graveler/prefix.go:9-21), which can yield invalid UTF-8. We
    increment the last incrementable *codepoint* instead (skipping the
    surrogate range): the bound stays valid Unicode, and because UTF-8
    byte order equals codepoint order for valid strings, the predicate
    is correct under BOTH comparators in play — Spark/Parquet/DuckDB
    binary comparison and driver-side (pandas manifest pruning) Python
    string comparison.

    Returns None when no upper bound exists (all chars are U+10FFFF,
    or the prefix is empty).
    """
    if not prefix:
        return None
    for i in range(len(prefix) - 1, -1, -1):
        cp = ord(prefix[i])
        if cp < 0x10FFFF:
            ncp = cp + 1
            if 0xD800 <= ncp <= 0xDFFF:  # never emit lone surrogates
                ncp = 0xE000
            return prefix[:i] + chr(ncp)
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
