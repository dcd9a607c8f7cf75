"""Catalog exporters: symlink (Athena-style) manifests.

Reference: the Lua catalog exporters
(pkg/actions/lua/lakefs/catalogexport/symlink_exporter.lua) group a
table prefix's objects by directory and write one ``symlink.txt`` per
directory listing the physical addresses — the layout Athena/Hive
SymlinkTextInputFormat consumes.

Spark shape: one ``groupBy(dir)`` with a sorted ``collect_list`` —
map-side partial aggregation keeps the shuffle to one row per
directory; file writes fan out per-partition on executors (the analog
of the reference's per-directory PUTs).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symlink_manifest(entries: DataFrame) -> DataFrame:
    """Per-directory symlink manifest rows.

    Returns ``(dir, n_objects, content)`` where ``content`` is the
    newline-joined sorted physical addresses — exactly the bytes of
    that directory's ``symlink.txt``.
    """
    return (
        entries.select(
            F.regexp_replace(F.col("key"), "/[^/]*$", "").alias("dir"),
            "address",
        )
        .groupBy("dir")
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            F.array_join(F.sort_array(F.collect_list("address")), "\n").alias("content"),
        )
    )


def write_symlinks(entries: DataFrame, out_dir: str) -> int:
    """Write one ``<dir>/symlink.txt`` per directory under ``out_dir``.

    Executor-parallel via foreachPartition; returns directory count.
    """
    manifest = symlink_manifest(entries).persist()

    def _write(rows) -> None:
        for row in rows:
            d = os.path.join(out_dir, row["dir"])
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "symlink.txt"), "w") as f:
                f.write(row["content"] + "\n")

    try:
        manifest.foreachPartition(_write)
        return manifest.count()
    finally:
        manifest.unpersist()
