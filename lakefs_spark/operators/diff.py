"""Diff operators: 2-way diff, uncommitted diff, 3-way compare.

Reference semantics:
- 2-way diff: full-outer sort-merge of two snapshots on key; emits
  Added (left missing), Removed (right missing), Changed (identity
  differs) (pkg/graveler/committed/diff.go:145-277).
- uncommitted diff: staged changes probed against the committed
  snapshot; tombstone of an absent key is skipped, equal identity is
  skipped (pkg/graveler/uncommitted_diff_iterator.go:17-113).
- 3-way compare: source-vs-dest diff requalified against the merge
  base — when both sides changed the same key (relative to base) in
  different ways the row becomes a Conflict
  (pkg/graveler/committed/compare_iterator.go:23-272).

Spark shape: plain FULL OUTER / LEFT joins on ``key`` + a CASE ladder
on identities. Catalyst plans these as sort-merge joins over the
key-sorted range files; the manifest-level pruning that makes diff
O(changed-ranges) instead of O(repo) lives in storage/repo.py (only
ranges whose range_id differs between the two manifests are scanned —
SURVEY.md §4 row 1), keeping this module purely relational.

diff_type values: 'added' | 'removed' | 'changed' | 'conflict'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakefs_spark.schema import ENTRY_COLS

_PAYLOAD = [c for c in ENTRY_COLS if c not in ("key", "identity")]


def diff(left: DataFrame, right: DataFrame) -> DataFrame:
    """2-way diff left->right.

    Returns ``(key, diff_type, left_identity, identity, <entry cols>)``
    where the entry payload comes from the *right* side for
    added/changed and from the *left* side for removed (matching the
    reference's Diff carrying the new value, LeftIdentity the old —
    pkg/graveler/graveler.go:69-76).
    """
    l = left.select(
        F.col("key"),
        F.col("identity").alias("l_identity"),
        *[F.col(c).alias(f"l_{c}") for c in _PAYLOAD],
    )
    r = right.select(
        F.col("key"),
        F.col("identity").alias("r_identity"),
        *[F.col(c).alias(f"r_{c}") for c in _PAYLOAD],
    )
    j = l.join(r, on="key", how="full_outer")
    side = F.when(F.col("r_identity").isNull(), F.lit("l")).otherwise(F.lit("r"))
    return (
        j.where(
            F.col("l_identity").isNull()
            | F.col("r_identity").isNull()
            | (F.col("l_identity") != F.col("r_identity"))
        )
        .select(
            F.col("key"),
            F.when(F.col("l_identity").isNull(), F.lit("added"))
            .when(F.col("r_identity").isNull(), F.lit("removed"))
            .otherwise(F.lit("changed"))
            .alias("diff_type"),
            F.col("l_identity").alias("left_identity"),
            F.coalesce(F.col("r_identity"), F.col("l_identity")).alias("identity"),
            *[
                F.when(side == "l", F.col(f"l_{c}")).otherwise(F.col(f"r_{c}")).alias(c)
                for c in _PAYLOAD
            ],
        )
    )


def diff_summary(diff_df: DataFrame) -> DataFrame:
    """Count of diffs per type (pkg/graveler/committed/commit.go:99-114)."""
    return diff_df.groupBy("diff_type").agg(F.count(F.lit(1)).alias("n")).orderBy("diff_type")


def uncommitted_diff(staged: DataFrame, committed: DataFrame) -> DataFrame:
    """Diff of a branch's staged layer against its committed snapshot.

    ``staged`` must carry ``is_tombstone`` (overlay_raw output of the
    staging layers). Skip rules per the reference: tombstone for an
    absent key, and staged identity equal to committed identity.
    """
    s = staged.select(
        F.col("key"),
        F.col("is_tombstone"),
        F.col("identity").alias("s_identity"),
        *[F.col(c).alias(f"s_{c}") for c in _PAYLOAD],
    )
    c = committed.select(F.col("key"), F.col("identity").alias("c_identity"))
    j = s.join(c, on="key", how="left")
    return (
        j.where(
            # null-safe: an add (absent committed identity) must not be
            # swallowed by the equal-identity skip rule
            ~(
                (F.col("is_tombstone") & F.col("c_identity").isNull())
                | (~F.col("is_tombstone") & F.col("s_identity").eqNullSafe(F.col("c_identity")))
            )
        )
        .select(
            F.col("key"),
            F.when(F.col("is_tombstone"), F.lit("removed"))
            .when(F.col("c_identity").isNull(), F.lit("added"))
            .otherwise(F.lit("changed"))
            .alias("diff_type"),
            F.col("c_identity").alias("left_identity"),
            F.coalesce(F.col("s_identity"), F.col("c_identity")).alias("identity"),
            *[F.col(f"s_{c}").alias(c) for c in _PAYLOAD],
        )
    )


def compare(base: DataFrame, source: DataFrame, dest: DataFrame) -> DataFrame:
    """3-way compare: source changes vs dest, conflict-aware.

    Emits the changes that merging ``source`` into ``dest`` would
    apply: source-side diffs (vs base), minus those dest already has,
    with ``diff_type='conflict'`` where both sides changed the same key
    to different results.
    """
    sdiff = diff(base, source).select(
        "key",
        F.col("diff_type").alias("s_type"),
        F.when(F.col("diff_type") == "removed", F.lit(None)).otherwise(F.col("identity")).alias("s_identity"),
        *[F.col(c).alias(f"s_{c}") for c in _PAYLOAD],
    )
    ddiff = diff(base, dest).select(
        "key",
        F.col("diff_type").alias("d_type"),
        F.when(F.col("diff_type") == "removed", F.lit(None)).otherwise(F.col("identity")).alias("d_identity"),
    )
    j = sdiff.join(ddiff, on="key", how="left")
    # null-safe: delete-vs-change must compare null vs value as "different"
    same_result = F.col("s_identity").eqNullSafe(F.col("d_identity"))
    return (
        j.where(F.col("d_type").isNull() | ~same_result)
        .select(
            F.col("key"),
            F.when(F.col("d_type").isNotNull(), F.lit("conflict"))
            .otherwise(F.col("s_type"))
            .alias("diff_type"),
            F.col("s_identity").alias("identity"),
            *[F.col(f"s_{c}").alias(c) for c in _PAYLOAD],
        )
    )
