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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakefs_spark.schema import ENTRY_COLS

_PAYLOAD = [c for c in ENTRY_COLS if c not in ("key", "identity")]

STRATEGIES = ("none", "src", "dest")


# -- conflict resolvers -----------------------------------------------------
#
# The reference's extension point (pkg/graveler/committed/merge.go:304-331
# handleConflict + 523-534 StrategyConflictResolver): a chain of
# resolvers is consulted in order for each conflicting key; the first
# that picks a side wins, and only an unresolved key becomes
# ErrConflictFound. The stock strategy behavior IS a resolver at the
# end of the chain.
#
# Spark-native shape: a resolver is a callable ``(strategy) -> Column``
# evaluated over the joined conflict row (columns: key, s_identity,
# d_identity, s_<payload>, d_<payload>) returning 'src', 'dest', or
# NULL (= pass to the next resolver). Declarative columns keep
# resolution fully distributed — a Python callback per conflicting key
# would pull an unbounded conflict stream through the driver.


def strategy_resolver(strategy: str) -> Column:
    """The reference's StrategyConflictResolver (merge.go:523-534):
    picks per the merge strategy, passes under 'none'."""
    if strategy == "src":
        return F.lit("src")
    if strategy == "dest":
        return F.lit("dest")
    return F.lit(None).cast("string")


def key_pattern_resolver(pattern: str, choice: str):
    """Resolve conflicts on keys matching ``pattern`` (rlike) to
    ``choice`` ('src' or 'dest'); pass otherwise."""
    if choice not in ("src", "dest"):
        raise ValueError(f"choice must be 'src' or 'dest', got {choice!r}")

    def r(strategy: str) -> Column:
        return F.when(F.col("key").rlike(pattern), F.lit(choice))

    return r


def prefer_newer_resolver():
    """Payload-based resolution: pick the side whose entry was modified
    later; pass when either timestamp is absent (e.g. delete-vs-change
    conflicts stay conflicts)."""

    def r(strategy: str) -> Column:
        s_ts, d_ts = F.col("s_last_modified"), F.col("d_last_modified")
        return (
            F.when(s_ts.isNull() | d_ts.isNull(), F.lit(None).cast("string"))
            .when(s_ts >= d_ts, F.lit("src"))
            .otherwise(F.lit("dest"))
        )

    return r


def _conflict_outcome(strategy: str, resolvers, s_act: Column) -> Column:
    """Action for a both-changed-differently key after running the
    resolver chain (user resolvers first, strategy resolver last —
    merge_test.go:1850 'first resolver decides' ordering)."""
    chain = [*(resolvers or []), strategy_resolver]
    choice = F.coalesce(*(r(strategy) for r in chain), F.lit("conflict"))
    return (
        F.when(choice == "src", s_act)
        .when(choice == "dest", F.lit(None))  # keep dest == no action
        .otherwise(F.lit("conflict"))
    )


def merge_actions(
    base: DataFrame,
    source: DataFrame,
    dest: DataFrame,
    strategy: str = "none",
    resolvers=None,
) -> DataFrame:
    """Per-key merge decision stream.

    Returns ``(key, action, identity, <payload>)`` with action in
    {'set', 'delete', 'conflict'}: 'set'/'delete' are the changes to
    apply onto dest; keys where dest already has the right value are
    omitted. Conflicting keys run the ``resolvers`` chain (user
    resolvers first, then the strategy resolver) and come back as
    set/delete/omitted when resolved.
    """
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown merge strategy {strategy!r}")

    b = base.select(F.col("key"), F.col("identity").alias("b_identity"))
    s = source.select(
        F.col("key"),
        F.col("identity").alias("s_identity"),
        *[F.col(c).alias(f"s_{c}") for c in _PAYLOAD],
    )
    d = dest.select(
        F.col("key"),
        F.col("identity").alias("d_identity"),
        *[F.col(c).alias(f"d_{c}") for c in _PAYLOAD],
    )

    j = s.join(d, on="key", how="full_outer").join(b, on="key", how="left")

    s_id, d_id, b_id = F.col("s_identity"), F.col("d_identity"), F.col("b_identity")
    eq = lambda a, c: (a.isNull() & c.isNull()) | (a.eqNullSafe(c) & a.isNotNull())  # noqa: E731
    s_changed = ~eq(s_id, b_id)
    d_changed = ~eq(d_id, b_id)
    same = eq(s_id, d_id)

    s_act = F.when(s_id.isNull(), F.lit("delete")).otherwise(F.lit("set"))
    action = (
        F.when(~s_changed, F.lit(None))  # source didn't touch it -> keep dest, no action
        .when(same, F.lit(None))  # dest already matches source's result
        .when(~d_changed, s_act)
        # both changed, different results -> resolver chain
        .otherwise(_conflict_outcome(strategy, resolvers, s_act))
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


def _qualified_side(rows_base: DataFrame, rows_side: DataFrame, p: str, with_payload: bool) -> DataFrame:
    """Base-anchored diff pre-qualified for the merge join — exactly
    ``qual(diff(base, side))`` from :func:`merge_changes_from_diffs`,
    built without shipping the base side's payload through the join
    (guide §2.3 "project before the exchange"): a removed row's
    payload/identity are nulled by the merge semantics anyway, and
    every added/changed row's payload comes from the side, never the
    base — so the base contributes only (key, identity) and the CASE
    ladder disappears (an absent side row is already all-null).
    ``with_payload=False`` additionally drops the side's payload (the
    dest diff needs it only when a resolver inspects ``d_*`` columns).
    """
    b = rows_base.select(F.col("key"), F.col("identity").alias("b_identity"))
    s = rows_side.select(
        F.col("key"),
        F.col("identity").alias(f"{p}_identity"),
        *([F.col(c).alias(f"{p}_{c}") for c in _PAYLOAD] if with_payload else []),
    )
    j = b.join(s, on="key", how="full_outer")
    side_id = F.col(f"{p}_identity")
    changed = (
        F.col("b_identity").isNull() | side_id.isNull() | (F.col("b_identity") != side_id)
    )
    return j.where(changed).select(
        F.col("key"),
        side_id,
        F.lit(True).alias(f"{p}_present"),
        *([F.col(f"{p}_{c}") for c in _PAYLOAD] if with_payload else []),
    )


def merge_changes_from_sides(
    sdiff_base: DataFrame,
    sdiff_side: DataFrame,
    ddiff_base: DataFrame,
    ddiff_side: DataFrame,
    strategy: str = "none",
    resolvers=None,
) -> DataFrame:
    """Merge decision stream straight from the four pruned range-row
    streams (the storage engine's path) — semantically identical to
    ``merge_changes_from_diffs(diff(sb, ss), diff(db, ds), ...)`` but
    with both base sides slimmed to (key, identity) before their
    exchanges, and the dest side's payload shipped only when a
    resolver can read it (``d_*`` columns). The plan drops from two
    9-column base exchanges to two 2-column ones."""
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown merge strategy {strategy!r}")
    sq = _qualified_side(sdiff_base, sdiff_side, "s", with_payload=True)
    dq = _qualified_side(ddiff_base, ddiff_side, "d", with_payload=bool(resolvers))
    return actions_from_joined(qualified_join(sq, dq), strategy, resolvers)


def qualified_join(sq: DataFrame, dq: DataFrame) -> DataFrame:
    """The strategy-INDEPENDENT core of a 3-way merge: the full-outer
    join of the two qualified diff streams. Everything downstream
    (the CASE ladder, resolvers) is a cheap projection over these rows,
    so a caller that runs several merge decisions for the same commit
    triple (conflict detect, then strategy=src — the b5 shape) can
    materialize THIS frame once and re-ladder it per strategy
    (storage/repo.py's metarange-keyed merge memo)."""
    return sq.join(dq, on="key", how="full_outer")


def actions_from_joined(j: DataFrame, strategy: str, resolvers) -> DataFrame:
    """CASE ladder over a :func:`qualified_join` frame (shared by
    merge_changes_from_diffs / merge_changes_from_sides)."""
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown merge strategy {strategy!r}")
    s_id, d_id = F.col("s_identity"), F.col("d_identity")
    s_act = F.when(s_id.isNull(), F.lit("delete")).otherwise(F.lit("set"))
    action = (
        F.when(F.col("s_present").isNull(), F.lit(None))  # dest-only change
        .when(F.col("d_present").isNull(), s_act)  # source-only change
        .when(s_id.eqNullSafe(d_id), F.lit(None))  # same result
        .otherwise(_conflict_outcome(strategy, resolvers, s_act))
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
    sdiff: DataFrame, ddiff: DataFrame, strategy: str = "none", resolvers=None
) -> DataFrame:
    """Merge decision stream from two base-anchored diffs.

    Inputs are ``operators.diff.diff(base, side)`` outputs — this is
    the storage engine's path: the diffs are computed over
    manifest-pruned ranges only, so merge cost is O(changed ranges)
    (the relational core of pkg/graveler/committed/merge.go:432-521).

    Returns ``(key, action, identity, <payload>)``, action in
    {'set','delete','conflict'}; identity is null for deletes.
    Conflicting keys run the ``resolvers`` chain (see module note).
    """
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown merge strategy {strategy!r}")
    # removed rows null the identity AND the payload: diff() fills a
    # removed row's payload from the base side, and a resolver must not
    # see that stale payload (e.g. prefer_newer comparing the deleted
    # entry's old timestamp would silently resolve a delete-vs-change
    # conflict its contract says stays a conflict)
    removed = F.col("diff_type") == "removed"
    qual = lambda df, p: df.select(  # noqa: E731
        F.col("key"),
        F.when(removed, F.lit(None)).otherwise(F.col("identity")).alias(f"{p}_identity"),
        F.lit(True).alias(f"{p}_present"),
        *[
            F.when(removed, F.lit(None)).otherwise(F.col(c)).alias(f"{p}_{c}")
            for c in _PAYLOAD
        ],
    )
    return actions_from_joined(
        qualified_join(qual(sdiff, "s"), qual(ddiff, "d")), strategy, resolvers
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
