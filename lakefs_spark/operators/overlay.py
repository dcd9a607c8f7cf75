"""Overlay (combined-iterator) semantics: staging over committed.

The reference merges k ordered iterators where the leftmost layer wins
on duplicate keys — active staging > sealed tokens (newest first) >
committed snapshot — then drops tombstones
(pkg/graveler/combined_iterator.go:17-167).

Spark-native: union the layers with a ``seq`` priority column, keep the
minimum-seq row per key via a window, then filter tombstones. The
window partitions by ``key`` — at scale this is a single hash shuffle
on the same key the snapshot is already range-organized by, and
typically tiny because staging layers are small relative to the
snapshot; AQE coalesces the mostly-empty partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakefs_spark.schema import ENTRY_COLS


def with_layer(df: DataFrame, seq: int, is_tombstone_col: str | None = None) -> DataFrame:
    """Normalize a layer to the staged schema with a fixed priority."""
    out = df
    if "seq" in out.columns:
        out = out.drop("seq")
    out = out.withColumn("seq", F.lit(seq).cast("long"))
    if is_tombstone_col is None and "is_tombstone" not in out.columns:
        out = out.withColumn("is_tombstone", F.lit(False))
    return out.select("seq", "is_tombstone", *ENTRY_COLS)


def _tiebreak():
    # built lazily: Column construction needs an active SparkContext
    return [
        F.desc_nulls_last("identity"),
        F.desc_nulls_last("etag"),
        F.desc_nulls_last("address"),
    ]


def overlay_raw(layers: list[DataFrame]) -> DataFrame:
    """Highest-priority row per key, tombstones retained.

    ``layers[0]`` wins over ``layers[1]`` etc. Layers must already carry
    ``seq`` + ``is_tombstone`` (use :func:`with_layer`). Duplicate keys
    *within* a layer are resolved by a deterministic tiebreak so the
    pick is stable across plan re-evaluations.
    """
    unioned = layers[0]
    for layer in layers[1:]:
        unioned = unioned.unionByName(layer)
    w = Window.partitionBy("key").orderBy(F.col("seq").asc(), *_tiebreak())
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_entries(entries: DataFrame) -> DataFrame:
    """One row per key, deterministic winner (no priority semantics —
    for bulk inputs that may carry duplicate keys)."""
    w = Window.partitionBy("key").orderBy(*_tiebreak())
    return (
        entries.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def overlay(layers: list[DataFrame]) -> DataFrame:
    """Effective visible state of a branch: overlay + tombstone filter."""
    return overlay_raw(layers).where(~F.col("is_tombstone")).select(*ENTRY_COLS)
