"""Garbage collection: mark (set algebra) + sweep plumbing.

Reference (its own Spark client — the design this whole engine
generalizes): mark = ``listed_objects EXCEPT committed EXCEPT
uncommitted`` (clients/spark/.../gc/GarbageCollection.scala:205-210),
with objects newer than an uncommitted-min-age cutoff never collected
(GarbageCollection.scala:133-140); committed addresses are the distinct
addresses of all ranges reachable from active commits
(CommittedAddressLister.scala:15-57).

Spark shape: LEFT ANTI joins (what ``except`` plans to) on ``address``.
At 100 TB the listing side is the big table; the anti-join shuffles
both sides by address hash — AQE handles skew, and committed addresses
are distinct'ed *before* the join (partial aggregation map-side) so the
join's build side is minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def committed_addresses(entries: DataFrame) -> DataFrame:
    """Distinct physical addresses referenced by (active) snapshots."""
    return entries.select("address").where(F.col("address").isNotNull()).distinct()


def gc_mark(
    listing: DataFrame,
    committed: DataFrame,
    uncommitted: DataFrame | None = None,
    cutoff=None,
) -> DataFrame:
    """Addresses present in storage but unreachable -> candidates to delete.

    ``listing`` rows: (address, last_modified, size). ``cutoff``: objects
    with last_modified >= cutoff are kept regardless (in-flight writes).
    """
    df = listing
    if cutoff is not None:
        df = df.where(F.col("last_modified") < F.lit(cutoff))
    df = df.join(committed.select("address"), on="address", how="left_anti")
    if uncommitted is not None:
        df = df.join(uncommitted.select("address"), on="address", how="left_anti")
    return df.select("address")


def gc_summary(marked: DataFrame) -> DataFrame:
    return marked.agg(F.count(F.lit(1)).alias("num_deleted_objects"))


def gc_sweep(marked: DataFrame, delete_fn=None, bulk_size: int = 1000) -> int:
    """Delete marked addresses in executor-parallel chunks.

    Mirrors the reference's sweep (GarbageCollection.scala:253-276 +
    BulkRemoverFactory.scala): each partition batches addresses into
    ``bulk_size`` chunks and calls ``delete_fn(chunk)`` — the stand-in
    for the store's bulk-delete API (S3 DeleteObjects caps at 1000).
    Default ``delete_fn`` unlinks local paths. Returns count deleted.
    """
    if delete_fn is None:

        def delete_fn(chunk: list[str]) -> None:
            import os as _os

            for p in chunk:
                try:
                    _os.remove(p)
                except FileNotFoundError:
                    pass

    def _sweep(rows) -> None:
        chunk: list[str] = []
        for row in rows:
            chunk.append(row["address"])
            if len(chunk) >= bulk_size:
                delete_fn(chunk)
                chunk = []
        if chunk:
            delete_fn(chunk)

    marked = marked.persist()
    try:
        n = marked.count()
        marked.foreachPartition(_sweep)
        return n
    finally:
        marked.unpersist()
