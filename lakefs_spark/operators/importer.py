"""Import operators: prefix-replacing union (SkipPrefix semantics).

Reference: importing a source tree into a destination snapshot first
*drops* every destination key under the imported prefixes
(pkg/graveler/committed/skip_prefix_iterator.go:1-153) and then merges
the source stream in with an empty base
(pkg/graveler/committed/manager.go:215-236 Import).

Spark shape: the skip is a negated-prefix filter — each prefix becomes
a closed key range (functions/prefix.py upper-bound trick) so the
predicate pushes down to the Parquet scan and prunes whole range files
via the manifest min/max before any row is read. The union is a plain
``unionByName`` (no shuffle; the downstream range write re-chunks).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakefs_spark.functions.prefix import prefix_predicate


def skip_prefix_predicate(key: Column, prefixes: list[str]) -> Column:
    """True for keys NOT under any of the given prefixes."""
    if not prefixes:
        return F.lit(True)
    return ~reduce(lambda a, b: a | b, [prefix_predicate(key, p) for p in prefixes])


def skip_prefixes(df: DataFrame, prefixes: list[str]) -> DataFrame:
    """Drop every row whose key falls under one of ``prefixes``."""
    return df.where(skip_prefix_predicate(F.col("key"), prefixes))


def prefix_replace(dest: DataFrame, source: DataFrame, prefixes: list[str]) -> DataFrame:
    """Import ``source`` into ``dest``, replacing the given subtrees.

    Destination keys under any prefix are dropped wholesale; the source
    stream (whose keys live under those prefixes) takes their place.
    """
    return skip_prefixes(dest, prefixes).unionByName(source)
