"""Content-defined chunking of a sorted key stream into ranges.

The reference breaks a range after key ``k`` when accumulated size >= min
and (size >= max or ``fnv64a(k) % raggedness == 0``)
(pkg/graveler/sstable/writer.go:168-183; defaults min=0, max=20MiB,
raggedness=50_000 — pkg/config/defaults.go:95-98). The point of the
hash rule is that range boundaries are a pure function of the keys, so
an edit only rewrites the range(s) containing the edited keys and every
other range keeps its content-address — structural sharing across
commits.

Our distributed variant strengthens that property: a key is a boundary
iff ``hash(key) % raggedness == 0``, full stop — no size accumulator.
The reference's accumulator makes boundaries depend on the *preceding*
stream content, which is fine for its single sequential writer but
non-deterministic under distributed re-chunking (a partition cut changes
the accumulation). The pure per-key rule gives bit-stable boundaries
regardless of partitioning AND strictly better reuse locality: an
insert/delete can only merge/split the chunk it falls in.

Hash choice is per-caller (``algo=``): the engine's INTERNAL parquet
ranges use Spark's built-in ``xxhash64`` (JVM-side, codegen — boundary
placement there only needs a deterministic key hash, and xxhash64 keeps
the whole chunk-assignment plan inside WholeStageCodegen). The lakeFS
EXPORT path uses ``algo="fnv64a"`` — the reference's exact per-key hash
(writer.go:178-182) — because with the default min_range_size_bytes=0
(defaults.go:96) the reference's break rule IS this pure per-key rule
until the 20 MiB accumulator fires, so fnv64a boundaries make exported
range record-sets (and therefore their content-address range ids)
identical to what a live lakeFS writes for the same keys. fnv64a runs
as an Arrow-batched pandas_udf over a numpy column-wise fold
(functions/ident.fnv64a_np) — export-path only, never in the hot
internal commit path.

Scale note (100 TB): boundaries are 1/raggedness of keys (2e4 boundaries
per 1e9 keys at the default 50k), so collecting them to the driver and
broadcasting is cheap even at 1000x the test scale. Chunk assignment is
then a broadcast binary-search (``searchsorted``) — no shuffle, no skew.
"""

from __future__ import annotations

import bisect

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_RAGGEDNESS = 50_000


def boundary_flag(
    key: Column, raggedness: int = DEFAULT_RAGGEDNESS, algo: str = "xxhash64"
) -> Column:
    """True iff this key ends a chunk. Pure function of the key.

    ``algo="xxhash64"``: JVM-side, whole-stage-codegen (internal ranges).
    ``algo="fnv64a"``: the reference's hash (writer.go:178-182) via an
    Arrow-batched pandas_udf — use for lakeFS export parity.
    """
    if algo == "xxhash64":
        return F.pmod(F.xxhash64(key), F.lit(raggedness)) == 0
    if algo == "fnv64a":
        import pandas as pd

        from lakefs_spark.functions.ident import fnv64a_np

        rag = np.uint64(raggedness)

        @F.pandas_udf("boolean")
        def _fnv_boundary(keys: pd.Series) -> pd.Series:
            h = fnv64a_np(keys.tolist())
            return pd.Series(h % rag == 0)

        return _fnv_boundary(key)
    raise ValueError(f"unknown boundary hash algo: {algo!r}")


def boundary_flags_local(keys, raggedness: int = DEFAULT_RAGGEDNESS) -> list[bool]:
    """Driver-side fnv64a boundary flags for a small key list (matches
    ``boundary_flag(..., algo='fnv64a')`` bit-for-bit — same fnv64a_np)."""
    from lakefs_spark.functions.ident import fnv64a_np

    h = fnv64a_np(list(keys))
    return [bool(x) for x in (h % np.uint64(raggedness) == 0)]


def boundary_keys(
    df: DataFrame,
    key_col: str = "key",
    raggedness: int = DEFAULT_RAGGEDNESS,
    algo: str = "xxhash64",
) -> list[str]:
    """Sorted boundary keys of a key set (driver-side list, small)."""
    rows = (
        df.select(key_col)
        .where(boundary_flag(F.col(key_col), raggedness, algo))
        .orderBy(key_col)
        .collect()
    )
    return [r[0] for r in rows]


def assign_chunks(
    df: DataFrame,
    key_col: str = "key",
    raggedness: int = DEFAULT_RAGGEDNESS,
    boundaries: list[str] | None = None,
    algo: str = "xxhash64",
) -> DataFrame:
    """Add a ``chunk_idx`` column: which range each row belongs to.

    Chunk ``i`` covers keys in ``(boundary[i-1], boundary[i]]``; keys
    beyond the last boundary form the tail chunk. Assignment is a
    broadcast ``searchsorted`` over the (tiny) boundary list — fully
    deterministic and shuffle-free; the subsequent range write groups by
    ``chunk_idx`` which range-partitions cleanly because chunk_idx is
    monotone in key.
    """
    if boundaries is None:
        boundaries = boundary_keys(df, key_col, raggedness, algo)
    if not boundaries:
        return df.withColumn("chunk_idx", F.lit(0))
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.array(boundaries, dtype=object))

    @F.pandas_udf("int")
    def _chunk_of(keys: pd.Series) -> pd.Series:
        arr = bc.value
        return pd.Series(np.searchsorted(arr, keys.to_numpy(dtype=object), side="left").astype("int32"))

    return df.withColumn("chunk_idx", _chunk_of(F.col(key_col)))


def chunk_of_key(key: str, boundaries: list[str]) -> int:
    """Driver-side single-key chunk lookup (mirrors assign_chunks)."""
    return bisect.bisect_left(boundaries, key)
