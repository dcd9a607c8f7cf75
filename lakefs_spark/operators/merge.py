"""3-way merge: base/source/dest -> merged snapshot + conflicts.

Reference semantics (pkg/graveler/committed/merge.go:329-371 key cases;
strategies 101-157; enum pkg/graveler/graveler.go:139-146):

Per key, with b/s/d the identities in base/source/dest (null = absent):
- source changed, dest unchanged (d == b)        -> take source
- dest changed, source unchanged (s == b)        -> keep dest
- both changed to the same identity (s == d)     -> either (no conflict)
- both changed, s != d (incl. delete-vs-change)  -> CONFLICT, unless
  strategy 'src' (take source) or 'dest' (keep dest) resolves it.

The merge result is the *dest snapshot with the source-side change
stream applied* — exactly a commit-apply of the resolved change stream
onto dest. Conflicts with strategy 'none' abort the merge in the
engine; here the operator returns them as rows so callers (and the
DuckDB oracle) can assert the exact conflict set.

Spark shape: two base-anchored diffs full-outer-joined on key, a CASE
ladder deciding the action, then an anti-join + union against dest.
All joins are equi-joins on ``key``; manifest-level pruning in
storage/repo.py keeps the inputs O(changed ranges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakefs_spark.schema import ENTRY_COLS

_PAYLOAD = [c for c in ENTRY_COLS if c not in ("key", "identity")]

STRATEGIES = ("none", "src", "dest")


def merge_actions(base: DataFrame, source: DataFrame, dest: DataFrame, strategy: str = "none") -> DataFrame:
    """Per-key merge decision stream.

    Returns ``(key, action, identity, <payload>)`` with action in
    {'set', 'delete', 'conflict'}: 'set'/'delete' are the changes to
    apply onto dest; keys where dest already has the right value are
    omitted. With strategy 'src'/'dest' conflicts are resolved and
    come back as set/delete/omitted accordingly.
    """
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown merge strategy {strategy!r}")

    b = base.select(F.col("key"), F.col("identity").alias("b_identity"))
    s = source.select(
        F.col("key"),
        F.col("identity").alias("s_identity"),
        *[F.col(c).alias(f"s_{c}") for c in _PAYLOAD],
    )
    d = dest.select(F.col("key"), F.col("identity").alias("d_identity"))

    j = s.join(d, on="key", how="full_outer").join(b, on="key", how="left")

    s_id, d_id, b_id = F.col("s_identity"), F.col("d_identity"), F.col("b_identity")
    eq = lambda a, c: (a.isNull() & c.isNull()) | (a.eqNullSafe(c) & a.isNotNull())  # noqa: E731
    s_changed = ~eq(s_id, b_id)
    d_changed = ~eq(d_id, b_id)
    same = eq(s_id, d_id)

    action = (
        F.when(~s_changed, F.lit(None))  # source didn't touch it -> keep dest, no action
        .when(same, F.lit(None))  # dest already matches source's result
        .when(~d_changed, F.when(s_id.isNull(), F.lit("delete")).otherwise(F.lit("set")))
        # both changed, different results:
        .when(F.lit(strategy == "src"), F.when(s_id.isNull(), F.lit("delete")).otherwise(F.lit("set")))
        .when(F.lit(strategy == "dest"), F.lit(None))
        .otherwise(F.lit("conflict"))
    )

    return (
        j.withColumn("action", action)
        .where(F.col("action").isNotNull())
        .select(
            F.col("key"),
            F.col("action"),
            F.col("s_identity").alias("identity"),
            *[F.col(f"s_{c}").alias(c) for c in _PAYLOAD],
        )
    )


def merge_changes_from_diffs(
    sdiff: DataFrame, ddiff: DataFrame, strategy: str = "none"
) -> DataFrame:
    """Merge decision stream from two base-anchored diffs.

    Inputs are ``operators.diff.diff(base, side)`` outputs — this is
    the storage engine's path: the diffs are computed over
    manifest-pruned ranges only, so merge cost is O(changed ranges)
    (the relational core of pkg/graveler/committed/merge.go:432-521).

    Returns ``(key, action, identity, <payload>)``, action in
    {'set','delete','conflict'}; identity is null for deletes.
    """
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown merge strategy {strategy!r}")
    qual = lambda df, p: df.select(  # noqa: E731
        F.col("key"),
        F.when(F.col("diff_type") == "removed", F.lit(None))
        .otherwise(F.col("identity"))
        .alias(f"{p}_identity"),
        F.lit(True).alias(f"{p}_present"),
        *([F.col(c).alias(f"{p}_{c}") for c in _PAYLOAD] if p == "s" else []),
    )
    j = qual(sdiff, "s").join(qual(ddiff, "d"), on="key", how="full_outer")
    s_id, d_id = F.col("s_identity"), F.col("d_identity")
    s_act = F.when(s_id.isNull(), F.lit("delete")).otherwise(F.lit("set"))
    action = (
        F.when(F.col("s_present").isNull(), F.lit(None))  # dest-only change
        .when(F.col("d_present").isNull(), s_act)  # source-only change
        .when(s_id.eqNullSafe(d_id), F.lit(None))  # same result
        .when(F.lit(strategy == "src"), s_act)
        .when(F.lit(strategy == "dest"), F.lit(None))
        .otherwise(F.lit("conflict"))
    )
    return (
        j.withColumn("action", action)
        .where(F.col("action").isNotNull())
        .select(
            F.col("key"),
            F.col("action"),
            F.col("s_identity").alias("identity"),
            *[F.col(f"s_{c}").alias(c) for c in _PAYLOAD],
        )
    )


def merge(
    base: DataFrame, source: DataFrame, dest: DataFrame, strategy: str = "none"
) -> tuple[DataFrame, DataFrame]:
    """Merged snapshot + conflict rows.

    ``merged`` = dest with the resolved change stream applied; when
    conflicts exist under strategy 'none' the engine refuses the merge
    (ErrConflictFound) — callers check ``conflicts`` first.
    """
    actions = merge_actions(base, source, dest, strategy)
    conflicts = actions.where(F.col("action") == "conflict").select("key", "identity", *_PAYLOAD)
    changes = actions.where(F.col("action") != "conflict")
    touched = changes.select("key")
    merged = (
        dest.join(touched, on="key", how="left_anti")
        .unionByName(
            changes.where(F.col("action") == "set").select(
                "key", "identity", *_PAYLOAD
            ).select(*ENTRY_COLS)
        )
    )
    return merged, conflicts
