"""Commit-apply: base metarange + change stream -> new metarange (COW).

Reference: pkg/graveler/committed/commit.go:116-239 — a sorted merge of
the base snapshot with the (deduped) change stream, where base ranges
untouched by any change are copied into the new metarange *without
being opened* (applyBaseRange), tombstones drop records, and the whole
thing is O(changed ranges), not O(repo).

Spark-native COW equivalent:
1. Assign every change key to a base range by binary search on the
   manifest's max_key list (driver-side; manifests are tiny even at
   100 TB — 1e9 objects / 50k per range = 20k rows).
2. Expand the touched set: deleting a range's max_key removes a chunk
   boundary (chunker.py's rule is pure key-hash), so the *following*
   range merges in and must be rewritten too.
3. Rows = touched base ranges (file-pruned read) + all changes;
   overlay (changes win), drop tombstones; re-chunk with the global
   boundary rule plus one injected boundary per contiguous touched
   run (its interval edge), so rebuilt ranges never span an untouched
   range's interval.
4. New manifest = untouched rows + rebuilt rows. Ranges whose content
   is unchanged re-derive the same content address -> same file.

Boundary drift note: a rebuilt group's tail (keys after its last
in-group boundary) stays its own range instead of merging into the
following untouched range — the same drift the reference accepts when
it wholesale-copies base ranges (commit.go:116-137). Equal content can
therefore yield different manifests across edit histories; diff
correctness is unaffected (row-diff of the drifted ranges is empty),
only some pruning sharpness is lost.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakefs_spark.plans.chunker import (
    DEFAULT_RAGGEDNESS,
    assign_chunks,
    boundary_flag,
)
from lakefs_spark.schema import ENTRY_COLS
from lakefs_spark.storage import ranges as R


class NoChangesError(Exception):
    pass


def _assign_positions(keys: pd.Series | np.ndarray, max_keys: list[str]) -> np.ndarray:
    """Base-range index for each key; keys past the last max_key extend
    the last range (side='left': key == max_key stays in that range)."""
    pos = np.searchsorted(np.array(max_keys, dtype=object), keys, side="left")
    return np.minimum(pos, len(max_keys) - 1)


#: Manifests up to this many rows ship to executors as a whole-list
#: broadcast (lowest latency — 2 Spark jobs); above it the bucketed
#: √n path below takes over. At the reference's design point (20 MiB
#: ranges) 200k rows ≈ a 4 TB repo; the broadcast there is ~25 MB.
LARGE_MANIFEST_ROWS = int(os.environ.get("LAKEFS_SPARK_BCAST_MANIFEST_ROWS", "200000"))


def _bucketed_positions(
    spark: SparkSession,
    mfs: pd.DataFrame,
    keys_df: DataFrame,
    key_col: str,
    tomb_col: str | None,
    containment: bool,
) -> list[int]:
    """Distinct manifest positions matched by an unbounded key stream,
    WITHOUT broadcasting the manifest.

    At 100 TB a manifest is ~5M rows; broadcasting its min/max lists is
    ~0.8 GB pickled and every Python worker pays the unpickle (measured
    374 s for a 100k-key probe at 5M ranges — tools/profile_manifest.py).
    Instead: a √n *coarse* boundary sample (≈2.2k strings at 5M) is the
    only broadcast; both sides shuffle once on the coarse bucket id and
    a cogrouped applyInPandas runs the exact searchsorted per bucket
    (~√n manifest rows each). Same two-sided merge-scan idea as the
    reference's range-granular diff (pkg/graveler/committed/diff.go:151)
    — cost O(|keys| + n) with no O(n) per-worker state.

    Semantics (identical to the broadcast kernel):
    - containment=True: emit pos iff min_key[pos] <= key <= max_key[pos]
      (ranges_containing_keys).
    - containment=False: emit the clamped assignment position
      (searchsorted side='left', clamp to n-1); a tombstone exactly on
      a range's max_key also emits pos+1 (the following range merges in
      once the chunk boundary dissolves — _apply_cow's rule).
    """
    n = len(mfs)
    width = max(1, int(math.isqrt(n)))
    max_np = mfs["max_key"].to_numpy(dtype=object)
    coarse = max_np[width - 1 :: width].tolist()
    last_bucket = (n - 1) // width
    bc_coarse = spark.sparkContext.broadcast(coarse)

    @F.pandas_udf("long")
    def _bucket_of(keys: pd.Series) -> pd.Series:
        arr = np.array(bc_coarse.value, dtype=object)
        b = np.searchsorted(arr, keys.to_numpy(dtype=object), side="left")
        return pd.Series(np.minimum(b, last_bucket).astype("int64"))

    tomb_expr = (
        F.col(tomb_col).cast("boolean") if tomb_col is not None else F.lit(False)
    )
    keys_b = keys_df.select(
        _bucket_of(F.col(key_col)).alias("b"),
        F.col(key_col).alias("k"),
        tomb_expr.alias("t"),
    )
    mf_sdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "b": (np.arange(n, dtype=np.int64) // width),
                "pos": np.arange(n, dtype=np.int64),
                "mn": mfs["min_key"].to_numpy(dtype=object),
                "mx": max_np,
            }
        ),
        schema="b long, pos long, mn string, mx string",
    )

    def _merge(keys_pdf: pd.DataFrame, mf_pdf: pd.DataFrame) -> pd.DataFrame:
        if keys_pdf.empty or mf_pdf.empty:
            return pd.DataFrame({"pos": pd.Series([], dtype="int64")})
        mf_local = mf_pdf.sort_values("pos")
        mx = mf_local["mx"].to_numpy(dtype=object)
        mn = mf_local["mn"].to_numpy(dtype=object)
        gpos = mf_local["pos"].to_numpy()
        ks = keys_pdf["k"].to_numpy(dtype=object)
        p = np.searchsorted(mx, ks, side="left")
        out: set[int] = set()
        if containment:
            for k, pl in zip(ks, p):
                pl = int(pl)
                if pl < len(mx) and mn[pl] <= k:
                    out.add(int(gpos[pl]))
        else:
            ts = keys_pdf["t"].to_numpy()
            for k, t, pl in zip(ks, ts, p):
                pl = min(int(pl), len(mx) - 1)
                gp = int(gpos[pl])
                out.add(gp)
                if t and k == mx[pl] and gp + 1 < n:
                    out.add(gp + 1)
        return pd.DataFrame({"pos": pd.Series(sorted(out), dtype="int64")})

    hits = (
        keys_b.groupBy("b")
        .cogroup(mf_sdf.groupBy("b"))
        .applyInPandas(_merge, "pos long")
        .distinct()
        .collect()
    )
    return [int(r["pos"]) for r in hits]


def probe_stream(
    spark: SparkSession,
    max_keys: list[str],
    stream: DataFrame,
    raggedness: int,
    tomb_col: str | None = None,
    action_col: str | None = None,
    include_counts: bool = True,
) -> tuple[dict, set, set, set]:
    """ONE Spark job over a (persisted) change/action stream computing
    everything the COW apply needs from it: per-action counts (when
    ``action_col`` is given and ``include_counts`` — the merge path's
    conflict/no-op gate), the DISTINCT touched base positions, and the
    stream's boundary-flagged keys split by tombstone-ness.

    Cache-fill caveat: the probe's union branches scan the stream's
    cache CONCURRENTLY within one job, so an expensive
    not-yet-materialized upstream (the merge double-diff) would be
    evaluated once per racing branch. Callers with such an upstream
    materialize the cache first (one cheap aggregation job) and pass
    ``include_counts=False``; callers whose upstream is a cheap scan
    (staged changes) take the fully fused form.

    Previously these were two to three sequential jobs (action counts,
    touched positions, then a boundary scan over the merged overlay);
    at small-op sizes the job COUNT, not the per-job work, dominates a
    storage op (guide §1.2 — each job is a scheduling + driver
    round-trip), so the three probes ride one collect as a tagged
    union. The merged overlay's boundary-key set is recovered from
    this probe plus a base-rows-only scan via set algebra — see
    _apply_cow (the boundary rule is a pure per-key predicate, so it
    commutes with the per-key overlay decision).

    Returns ``(counts, touched, bk_all, bk_nontomb)`` where ``bk_all``
    is every boundary-flagged change key and ``bk_nontomb`` the
    non-tombstone subset.
    """
    bc_max = spark.sparkContext.broadcast(max_keys)
    n_ranges = len(max_keys)

    @F.pandas_udf("array<int>")
    def _positions(keys: pd.Series, tombs: pd.Series) -> pd.Series:
        mk = bc_max.value
        pos = _assign_positions(keys.to_numpy(dtype=object), mk)
        out = []
        for k, t, p in zip(keys.to_numpy(dtype=object), tombs.to_numpy(), pos):
            p = int(p)
            if t and p + 1 < n_ranges and k == mk[p]:
                out.append([p, p + 1])
            else:
                out.append([p])
        return pd.Series(out)

    def _tomb():
        # fresh Column per use site (resolved per-branch of the union)
        if tomb_col is not None:
            return F.col(tomb_col).cast("boolean")
        return (F.col(action_col) == "delete").cast("boolean")

    parts = []
    body = stream
    if action_col is not None:
        if include_counts:
            parts.append(
                stream.groupBy(action_col)
                .agg(F.count(F.lit(1)).alias("n"))
                .select(
                    F.lit("cnt").alias("t"),
                    F.col(action_col).alias("v"),
                    F.lit(None).cast("boolean").alias("tomb"),
                    F.col("n").alias("n"),
                )
            )
        body = stream.where(F.col(action_col) != "conflict")
    parts.append(
        body.select(F.explode(_positions(F.col("key"), _tomb())).alias("p"))
        .distinct()
        .select(
            F.lit("pos").alias("t"),
            F.col("p").cast("string").alias("v"),
            F.lit(None).cast("boolean").alias("tomb"),
            F.lit(None).cast("long").alias("n"),
        )
    )
    parts.append(
        body.where(boundary_flag(F.col("key"), raggedness)).select(
            F.lit("bk").alias("t"),
            F.col("key").alias("v"),
            _tomb().alias("tomb"),
            F.lit(None).cast("long").alias("n"),
        )
    )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    counts: dict = {}
    touched: set[int] = set()
    bk_all: set[str] = set()
    bk_nontomb: set[str] = set()
    for r in df.collect():
        if r["t"] == "cnt":
            counts[r["v"]] = r["n"]
        elif r["t"] == "pos":
            touched.add(int(r["v"]))
        else:
            bk_all.add(r["v"])
            if not r["tomb"]:
                bk_nontomb.add(r["v"])
    return counts, touched, bk_all, bk_nontomb


def ranges_containing_keys(
    spark: SparkSession, manifest: pd.DataFrame, keys_df: DataFrame, key_col: str = "key"
) -> set[str]:
    """range_ids whose [min_key, max_key] interval contains any key of
    ``keys_df`` — computed on executors (searchsorted over the
    manifest), with only DISTINCT matched positions collected. The
    driver never sees the key stream, so the key count is unbounded.
    Small manifests broadcast whole; large ones take the √n-bucketed
    path (no O(n) broadcast — see _bucketed_positions)."""
    if manifest.empty:
        return set()
    mfs = manifest.sort_values("min_key").reset_index(drop=True)
    if len(mfs) > LARGE_MANIFEST_ROWS:
        hit_pos = _bucketed_positions(
            spark, mfs, keys_df, key_col, tomb_col=None, containment=True
        )
        return set(mfs.iloc[hit_pos]["range_id"])
    bc_min = spark.sparkContext.broadcast(mfs["min_key"].tolist())
    bc_max = spark.sparkContext.broadcast(mfs["max_key"].tolist())

    @F.pandas_udf("int")
    def _hit(keys: pd.Series) -> pd.Series:
        mn, mx = bc_min.value, bc_max.value
        arr = np.array(mx, dtype=object)
        pos = np.searchsorted(arr, keys.to_numpy(dtype=object), side="left")
        out = []
        for k, p in zip(keys.to_numpy(dtype=object), pos):
            p = int(p)
            out.append(p if p < len(mx) and mn[p] <= k else -1)
        return pd.Series(out, dtype="int32")

    hit_pos = [
        int(r["p"])
        for r in keys_df.select(_hit(key_col).alias("p")).where("p >= 0").distinct().collect()
    ]
    return set(mfs.iloc[hit_pos]["range_id"])


def cow_overlay(base_rows: DataFrame, changes: DataFrame) -> DataFrame:
    """Overlay a deduped change stream onto touched base rows.

    The change stream carries one row per key (apply_changes' contract;
    every caller guarantees it), so "leftmost layer wins" degenerates
    to an anti-join: base rows whose key is changed or deleted drop
    out, surviving (non-tombstone) change rows union in. This replaces
    the window-over-union overlay used before, whose partitionBy(key)
    shuffled AND sorted the full payload — here the big side flows
    map-side through a hash anti-join (Catalyst/AQE broadcasts the
    change-key side at typical churn; a huge change stream degrades
    gracefully to a shuffled join, never worse than the window was).
    The reference's sorted-merge applyAll
    (pkg/graveler/committed/commit.go:116-239) makes the same
    single-winner assumption of its change iterator.
    """
    return base_rows.join(changes.select("key"), "key", "left_anti").unionByName(
        changes.where(~F.col("is_tombstone")).select(*ENTRY_COLS)
    )


def apply_changes(
    spark: SparkSession,
    root: str,
    base_manifest: pd.DataFrame | None,
    changes: DataFrame,
    raggedness: int = DEFAULT_RAGGEDNESS,
    probe: tuple[set, set, set] | None = None,
) -> pd.DataFrame:
    """Apply a deduped change stream (is_tombstone + entry cols, one row
    per key) onto a base snapshot. Returns the new manifest.

    ``probe`` is an optional precomputed ``(touched, bk_all,
    bk_nontomb)`` from :func:`probe_stream` — callers that already ran
    a probe job over the (same) change stream (the merge path's
    conflict/no-op gate) pass it through so the apply does not rerun
    it."""
    if base_manifest is None or base_manifest.empty:
        # DELIBERATELY un-persisted: an empty base means the change
        # stream IS the whole snapshot (first commit / import), exactly
        # the case where caching would spill ~data size to disk. The
        # cost is one extra evaluation of the upstream for the
        # boundary-key pass, which Catalyst prunes to the key column
        # (plus the columns its own window/dedup needs) — the cheap
        # side of the trade at scale.
        entries = changes.where(~F.col("is_tombstone")).select(*ENTRY_COLS)
        return R.write_ranges(entries, root, raggedness)

    # the change stream is read several times (touched-position scan,
    # anti-join build side, boundary pass, union); cache it so an
    # expensive upstream plan (e.g. merge diffs) runs once
    changes = changes.persist()
    try:
        return _apply_cow(spark, root, base_manifest, changes, raggedness, probe)
    finally:
        changes.unpersist()


def _apply_cow(
    spark: SparkSession,
    root: str,
    base_manifest: pd.DataFrame,
    changes: DataFrame,
    raggedness: int,
    probe: tuple[set, set, set] | None = None,
) -> pd.DataFrame:
    mf = base_manifest.sort_values("min_key").reset_index(drop=True)
    max_keys = mf["max_key"].tolist()

    # 1+2. which base ranges does the change stream touch? Computed
    # distributively: executors broadcast-searchsort each change key
    # into the manifest (tiny even at 100 TB — 1e9 objects / 50k per
    # range = 20k rows) and the driver receives only the DISTINCT
    # touched positions (<= manifest size), never the change keys —
    # a 10^8-key merge stays off the driver
    # (pkg/graveler/committed/commit.go:116-137 likewise plans by
    # range, not by record). A tombstone on range i's max_key
    # dissolves a chunk boundary (chunker's rule is pure key-hash),
    # so position i+1 is emitted too: the following range merges in
    # and must be rewritten.
    probe_bks: tuple[set, set] | None = None
    if probe is not None:
        touched, bk_all, bk_nontomb = probe
        probe_bks = (bk_all, bk_nontomb)
    elif len(mf) > LARGE_MANIFEST_ROWS:
        # 100 TB-scale manifest: √n-bucketed assignment — no O(n)
        # broadcast (see _bucketed_positions); boundary keys then come
        # from the merged-overlay scan below (the probe's set-algebra
        # shortcut needs the small-manifest broadcast probe)
        touched = set(
            _bucketed_positions(
                spark, mf, changes, "key", tomb_col="is_tombstone", containment=False
            )
        )
    else:
        _, touched, bk_all, bk_nontomb = probe_stream(
            spark, max_keys, changes, raggedness, tomb_col="is_tombstone"
        )
        probe_bks = (bk_all, bk_nontomb)

    touched_sorted = sorted(touched)
    touched_ids = mf.iloc[touched_sorted]["range_id"].tolist()
    base_rows = R.read_ranges(spark, root, touched_ids)

    merged = cow_overlay(base_rows, changes)

    # a rebuilt chunk must never span an untouched range's interval,
    # so each contiguous touched run's interval edge (its last
    # range's max_key) is injected as an extra chunk boundary.
    # Chunk i covers (b[i-1], b[i]] (assign_chunks side='left'), and
    # every row of the run satisfies key <= that max_key, so the
    # split lands exactly at run membership — the same partition of
    # rows the previous per-row group tagging produced, without a
    # second pandas-UDF pass over the full payload.
    last = len(max_keys) - 1
    edge_keys = {
        max_keys[p]
        for i, p in enumerate(touched_sorted)
        if p != last
        and (i + 1 == len(touched_sorted) or touched_sorted[i + 1] != p + 1)
    }
    # Boundary keys: the chunker's rule is a pure per-key predicate, so
    # it commutes with the per-key overlay decision. With a probe in
    # hand the merged overlay's boundary set is pure set algebra over
    # a base-rows-only scan: merged = (base \ change_keys) ∪ surviving
    # changes, and bflag distributes over both sides, so
    #   bflag(merged) = (bflag(base) \ bflag(change_keys_all))
    #                   ∪ bflag(changes_nontombstone)
    # — one key-column scan of the touched range files with NO
    # anti-join and no change-stream rescan (the probe already
    # delivered the change side). Without a probe (bucketed manifest
    # path) fall back to the merged-overlay scan.
    bflag = boundary_flag(F.col("key"), raggedness)
    if probe_bks is not None:
        bk_all, bk_nontomb = probe_bks
        base_bks = {
            r[0] for r in base_rows.where(bflag).select("key").collect()
        }
        bks = sorted(((base_bks - bk_all) | bk_nontomb) | edge_keys)
    else:
        bks = sorted(
            {r[0] for r in merged.where(bflag).select("key").collect()} | edge_keys
        )
    chunked = assign_chunks(merged, "key", raggedness, boundaries=bks)
    new_rows = R.write_ranges_prechunked(chunked, root, n_chunks=len(bks) + 1)

    untouched = mf[~mf.index.isin(touched)]
    out = pd.concat([untouched[R.MANIFEST_COLS], new_rows], ignore_index=True)
    out = out.sort_values("min_key").reset_index(drop=True)
    _assert_sorted_disjoint(out)
    return out


def import_apply(
    spark: SparkSession,
    root: str,
    base_manifest: pd.DataFrame | None,
    source: DataFrame,
    replace_prefixes: list[str],
    raggedness: int = DEFAULT_RAGGEDNESS,
) -> pd.DataFrame:
    """Prefix-replacing import as range-granular COW.

    The reference's Import merges the source tree into dest where the
    dest iterator skips the imported prefixes — and, like all committed
    operators, moves *whole ranges* without opening them
    (pkg/graveler/committed/manager.go:215-236, skip_prefix_iterator.go).
    Same here, manifest-side:

    - dest ranges fully inside a replaced interval: dropped (no read)
    - dest ranges disjoint from every interval: kept (no read)
    - boundary-straddling ranges (≤2 per prefix): read, filtered,
      rewritten
    - source rows and boundary remainders are chunked per keyspace
      segment so no rebuilt range spans a kept range's interval

    Cost is O(import size + boundary ranges), independent of repo size.
    """
    from lakefs_spark.functions.prefix import upper_bound_for_prefix
    from lakefs_spark.operators.importer import skip_prefix_predicate

    source = source.select(*ENTRY_COLS)
    if base_manifest is None or base_manifest.empty:
        return R.write_ranges(source, root, raggedness)

    intervals: list[tuple[str, str | None]] = []
    for p in sorted(replace_prefixes):
        ub = upper_bound_for_prefix(p)
        if intervals and (intervals[-1][1] is None or p <= intervals[-1][1]):
            lo, hi = intervals[-1]
            intervals[-1] = (lo, None if (hi is None or ub is None) else max(hi, ub))
        else:
            intervals.append((p, ub))

    mf = base_manifest.sort_values("min_key").reset_index(drop=True)
    keep_rows, boundary_ids = [], []
    for _, row in mf.iterrows():
        mn, mx = row["min_key"], row["max_key"]
        if any(p <= mn and (ub is None or mx < ub) for p, ub in intervals):
            continue  # fully replaced — dropped without reading
        if all(mx < p or (ub is not None and mn >= ub) for p, ub in intervals):
            keep_rows.append(row)  # untouched — kept without reading
        else:
            boundary_ids.append(row["range_id"])

    pieces = [
        pd.DataFrame(keep_rows)[R.MANIFEST_COLS]
        if keep_rows
        else pd.DataFrame(columns=R.MANIFEST_COLS)
    ]
    skip_pred = skip_prefix_predicate(F.col("key"), list(replace_prefixes))
    if boundary_ids:
        brows = R.read_ranges(spark, root, sorted(boundary_ids)).where(skip_pred)
        # Survivor blocks from two different boundary ranges share a
        # keyspace segment with KEPT ranges between them (e.g. replace
        # a/ and c/ with kept b-ranges in the middle). Normally the
        # chunker's own invariant forces the split — every non-tail
        # range ENDS at a hash-boundary key, and when a range straddles
        # an interval end that key is itself a survivor — but that
        # invariant silently breaks if ``raggedness`` ever differs from
        # the one the base was written with (old max_keys stop being
        # boundaries), and one rebuilt chunk would then span a kept
        # range's interval and corrupt manifest ordering. Injecting the
        # boundary ranges' max_keys as explicit chunk boundaries makes
        # the no-span guarantee unconditional — the same edge-injection
        # _apply_cow uses for touched runs.
        edge_keys = set(
            mf[mf["range_id"].isin(boundary_ids)]["max_key"].tolist()
        )
        pieces.append(
            _write_segmented(
                brows, intervals, root, raggedness, extra_boundaries=edge_keys
            )
        )
    pieces.append(_write_segmented(source.where(~skip_pred), intervals, root, raggedness))

    out = pd.concat(pieces, ignore_index=True).sort_values("min_key").reset_index(drop=True)
    # source rows outside every replaced prefix (rare): plain COW upsert
    extra = source.where(skip_pred)
    if not extra.isEmpty():
        changes = extra.select(F.lit(False).alias("is_tombstone"), *ENTRY_COLS)
        out = apply_changes(spark, root, out, changes, raggedness)
    _assert_sorted_disjoint(out)
    return out


def _write_segmented(
    rows: DataFrame,
    intervals: list[tuple[str, str | None]],
    root: str,
    raggedness: int,
    extra_boundaries: set[str] | None = None,
) -> pd.DataFrame:
    """Chunk + write rows, grouped by keyspace segment so a chunk never
    crosses an interval boundary (and hence never overlaps a kept
    range's interval)."""
    flat: list[str] = []
    for p, ub in intervals:
        flat.append(p)
        if ub is not None:
            flat.append(ub)
    bc = rows.sparkSession.sparkContext.broadcast(np.array(flat, dtype=object))

    @F.pandas_udf("int")
    def _segment(keys: pd.Series) -> pd.Series:
        return pd.Series(
            np.searchsorted(bc.value, keys.to_numpy(dtype=object), side="right").astype("int32")
        )

    rows = rows.withColumn("grp", _segment(F.col("key")))
    # boundary keys from the hash-filtered 1/raggedness slice, not a
    # data-sized persist: the import payload was previously cached in
    # full only so the boundary pass and the write pass would share one
    # evaluation. The chunker's rule is a pure key predicate, so this
    # pass prunes to a key-only scan of the source (the unused segment
    # UDF column is projected away by Catalyst) — the write pass is the
    # single full evaluation.
    bks = sorted(
        {
            r[0]
            for r in rows.where(boundary_flag(F.col("key"), raggedness))
            .select("key")
            .collect()
        }
        | (extra_boundaries or set())
    )
    return _write_grouped_ranges(
        rows, root, raggedness, boundaries=bks, n_groups=len(flat) + 1
    )


def _write_grouped_ranges(
    merged: DataFrame,
    root: str,
    raggedness: int,
    boundaries: list[str] | None = None,
    n_groups: int = 1,
) -> pd.DataFrame:
    """Chunk rows by (group, global-boundary bucket) and write ranges."""
    chunked = assign_chunks(merged, "key", raggedness, boundaries=boundaries)
    big = 1 << 32
    chunked = chunked.withColumn(
        "chunk_idx", (F.col("grp").cast("long") * big + F.col("chunk_idx")).cast("long")
    ).drop("grp")
    # composite (grp, idx) count: every global boundary starts a chunk
    # and each group adds at most one partial chunk — a small overshoot
    # only costs empty shuffle partitions
    n_chunks = (len(boundaries) + 1 if boundaries is not None else 1) + n_groups
    return R.write_ranges_prechunked(chunked, root, n_chunks=n_chunks)


def _assert_sorted_disjoint(mf: pd.DataFrame) -> None:
    # manifest integrity gate — explicit raises, NOT bare asserts:
    # python -O strips asserts and a violation here must fail the
    # commit, never silently persist a corrupt (overlapping) manifest
    prev_max = None
    for _, row in mf.iterrows():
        if not row["min_key"] <= row["max_key"]:
            raise RuntimeError(f"range min>max: {row['range_id']}")
        if prev_max is not None and not row["min_key"] > prev_max:
            raise RuntimeError(
                f"overlapping manifest ranges at {row['min_key']!r} (prev max {prev_max!r})"
            )
        prev_max = row["max_key"]
