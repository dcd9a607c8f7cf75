"""S3-style listing: prefix, delimiter (CommonPrefixes), pagination.

Reference semantics:
- prefix scan bounded by incremented-prefix upper bound
  (pkg/catalog/prefix_iterator.go:1-59, pkg/graveler/prefix.go:9-21)
- delimiter fold: everything after the prefix up to and including the
  first delimiter occurrence becomes one CommonPrefix group, emitted
  once; keys without a delimiter are leaf entries
  (pkg/catalog/entry_listing_iterator.go:67-92)
- pagination: ``after`` exclusive start marker + ``amount`` limit with
  limit+1 hasMore probe (pkg/catalog/catalog.go:1270-1325)

Spark shape: the prefix/after predicates are closed ranges on ``key``
(push down to Parquet min/max and to manifest pruning); the delimiter
fold is a projection + distinct on the common-prefix groups only —
leaves pass through without any shuffle. The reference's SeekGE "skip
the rest of the group" trick is unnecessary here: Catalyst prunes
columns and the distinct on group names shuffles only one row per
group after partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakefs_spark.functions.prefix import prefix_predicate
from lakefs_spark.schema import ENTRY_COLS


def list_entries(
    snapshot: DataFrame,
    prefix: str = "",
    after: str = "",
    delimiter: str = "",
    limit: int | None = None,
) -> DataFrame:
    """List a snapshot like S3 ListObjects.

    Returns rows ``(key, is_common_prefix, <entry cols>)`` ordered by
    ``key``; for common-prefix rows the entry columns are null and
    ``key`` is the group prefix (ending with the delimiter).
    """
    df = snapshot.where(prefix_predicate(F.col("key"), prefix))
    if after:
        df = df.where(F.col("key") > F.lit(after))

    if not delimiter:
        out = df.select(
            F.col("key"),
            F.lit(False).alias("is_common_prefix"),
            *[F.col(c) for c in ENTRY_COLS if c != "key"],
        )
    else:
        # position of the first delimiter after the prefix (0 = none)
        suffix = F.substring(F.col("key"), len(prefix) + 1, 1_000_000)
        pos = F.instr(suffix, delimiter)
        leaves = df.where(pos == 0).select(
            F.col("key"),
            F.lit(False).alias("is_common_prefix"),
            *[F.col(c) for c in ENTRY_COLS if c != "key"],
        )
        # group key = prefix + suffix up to and incl. first delimiter
        groups = (
            df.where(pos > 0)
            .select(
                F.concat(F.lit(prefix), suffix.substr(F.lit(1), pos + len(delimiter) - 1)).alias("key")
            )
            .distinct()
            .select(
                F.col("key"),
                F.lit(True).alias("is_common_prefix"),
                *[F.lit(None).cast(dict(snapshot.dtypes)[c]).alias(c) for c in ENTRY_COLS if c != "key"],
            )
        )
        out = leaves.unionByName(groups)
        # The raw key filter above is a scan-pruning optimization only:
        # a group whose derived prefix sorts <= ``after`` (i.e. the
        # common-prefix the previous page ended on) is re-derived from
        # its remaining keys, so the exclusive-start marker must also be
        # applied to the folded output (pkg/catalog/catalog.go:1305,
        # pkg/catalog/entry_listing_iterator.go:70-74 skip past the
        # group after the fold).
        if after:
            out = out.where(F.col("key") > F.lit(after))

    out = out.orderBy("key")
    if limit is not None:
        out = out.limit(limit)
    return out


def fold_diff(
    diff: DataFrame,
    prefix: str = "",
    after: str = "",
    delimiter: str = "",
) -> DataFrame:
    """listDiffHelper's filter + common-prefix fold
    (pkg/catalog/catalog.go:1994-2060) as one DataFrame transform,
    shared by the catalog's paged diff and the Lua client shim.

    - prefix filter in closed-range form (pushes down);
    - cursor seek: ``key > after``, or in delimiter mode
      ``key >= UpperBoundForPrefix(after)`` (GetStartPos,
      catalog.go:1983-1991 — the previous page's last item may be a
      common prefix whose whole group must be skipped; this also
      reproduces the reference's skipping of leaves that extend a
      LEAF cursor, deliberate parity, not a bug fix);
    - delimiter fold: a diff row whose key continues past the first
      delimiter after ``prefix`` collapses into ONE common-prefix row,
      ALWAYS typed ``prefix_changed`` (the reference never inspects
      group members — "seeing if a common prefix is e.g. deleted is
      O(N)", catalog.go:2026).

    Returns ``(key, diff_type, is_common)`` ordered by key; the
    limit+1 hasMore probe is the caller's job.
    """
    df = diff.where(prefix_predicate(F.col("key"), prefix))
    if after:
        if delimiter:
            from lakefs_spark.functions.prefix import upper_bound_for_prefix

            ub = upper_bound_for_prefix(after)
            if ub is not None:
                df = df.where(F.col("key") >= F.lit(ub))
        else:
            df = df.where(F.col("key") > F.lit(after))
    if not delimiter:
        return df.select(
            "key", "diff_type", F.lit(False).alias("is_common")
        ).orderBy("key")
    suffix = F.substring(F.col("key"), len(prefix) + 1, 1_000_000)
    pos = F.instr(suffix, delimiter)
    leaves = df.where(pos == 0).select(
        "key", "diff_type", F.lit(False).alias("is_common")
    )
    groups = (
        df.where(pos > 0)
        .select(
            F.concat(
                F.lit(prefix),
                suffix.substr(F.lit(1), pos + len(delimiter) - 1),
            ).alias("key")
        )
        .distinct()
        .select(
            "key",
            F.lit("prefix_changed").alias("diff_type"),
            F.lit(True).alias("is_common"),
        )
    )
    return leaves.unionByName(groups).orderBy("key")
