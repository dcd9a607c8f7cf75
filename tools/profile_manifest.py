#!/usr/bin/env python
"""Prove the driver-side manifest plane at 100 TB scale (VERDICT r6
'What's wrong #1' / 'Next round #1').

A 100 TB repo at the reference's 20 MiB range design point
(pkg/graveler/committed/params.go, defaults.go:97) carries ~5M ranges,
so every manifest is a ~5M-row frame. This tool synthesizes such a
manifest (ranges need not contain real rows — the manifest plane never
opens them) and drives every driver-side bookkeeping operation the
engine performs on manifests, measuring wall time and peak driver RSS:

  1. write_manifest + read_manifest (parquet round-trip, LRU insert)
  2. metarange_id_of (content address of the manifest itself)
  3. commit bookkeeping: assign a change stream to base ranges
     (executor-side broadcast searchsorted — ranges_containing_keys),
     the touched-set + untouched-concat COW split of _apply_cow
  4. manifest-level 2-way diff pruning (_pruned_sides set algebra)
  5. byte-budgeted LRU behavior under several distinct manifests

Pass criterion (VERDICT r6): driver RSS < 8 GB at 5M ranges with all
operations completing. Usage:

    python tools/profile_manifest.py [N_RANGES] [N_CHANGES]

Defaults: 5_000_000 ranges, 100_000 changed keys.
"""

from __future__ import annotations

import os
import resource
import sys
import tempfile
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6  # kB -> GB


def synth_manifest(n: int) -> pd.DataFrame:
    """A sorted, disjoint n-range manifest with realistic key widths.

    Keys look like real object paths (~48 chars); range_ids are 64-hex
    like the production sha256 addresses.
    """
    idx = np.arange(n, dtype=np.int64)
    # zero-padded decimal keeps lexicographic == numeric order
    mins = pd.Series(idx).map("tables/events/part-{:012d}/data-0000.parquet".format)
    maxs = pd.Series(idx).map("tables/events/part-{:012d}/data-9999.parquet".format)
    rids = pd.util.hash_pandas_object(mins, index=False).map("{:016x}".format)
    rids = rids + rids + rids + rids  # 64 hex chars, deterministic, unique-ish
    return pd.DataFrame(
        {
            "range_id": rids.to_numpy(dtype=object),
            "min_key": mins.to_numpy(dtype=object),
            "max_key": maxs.to_numpy(dtype=object),
            "count": np.full(n, 50_000, dtype=np.int64),
            "estimated_size": np.full(n, 20 << 20, dtype=np.int64),
        }
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_changes = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from lakefs_spark.session import get_spark
    from lakefs_spark.storage import commit_apply
    from lakefs_spark.storage import ranges as R

    spark = get_spark("profile_manifest")
    root = tempfile.mkdtemp(prefix="manifest_prof_")
    for sub in ("ranges", "manifests", "staging"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    def step(tag: str, fn):
        t0 = time.time()
        out = fn()
        print(
            f"{tag}: {time.time() - t0:.2f}s rss={rss_gb():.2f}GB", flush=True
        )
        return out

    print(f"n_ranges={n} n_changes={n_changes}", flush=True)
    mf = step("synth_manifest", lambda: synth_manifest(n))
    print(
        f"  manifest frame: {R.manifest_nbytes(mf) / 1e9:.2f} GB estimated",
        flush=True,
    )

    # 1. content address + parquet round-trip
    mid = step("metarange_id_of", lambda: R.metarange_id_of(mf))
    step("write_manifest", lambda: R.write_manifest(mf, root))
    R.manifest_cache_clear()
    mf2 = step("read_manifest(cold)", lambda: R.read_manifest(root, mid))
    step("read_manifest(cached)", lambda: R.read_manifest(root, mid))
    ents, nbytes = R.manifest_cache_stats()
    print(f"  cache: {ents} entries, {nbytes / 1e9:.2f} GB", flush=True)

    # 2. commit bookkeeping: change stream -> touched base ranges.
    # Change keys hit a contiguous 1% slice of the keyspace plus a
    # random sprinkle — the worst realistic mix (hot prefix + scatter).
    lo = n // 2
    hi = lo + max(n // 100, 1)
    from pyspark.sql import functions as F

    changes = (
        spark.range(0, n_changes, 1, 32)
        .select(
            F.concat(
                F.lit("tables/events/part-"),
                F.lpad(
                    ((F.col("id") % (hi - lo)) + lo).cast("string"), 12, "0"
                ),
                F.lit("/data-5555.parquet"),
            ).alias("key")
        )
    )
    touched = step(
        "ranges_containing_keys (executor searchsorted)",
        lambda: commit_apply.ranges_containing_keys(spark, mf2, changes),
    )
    print(f"  touched ranges: {len(touched)}", flush=True)

    # the COW split: positions of touched ranges, untouched concat
    def cow_split():
        msort = mf2  # read_manifest already sorted
        tpos = msort.index[msort["range_id"].isin(touched)]
        untouched = msort[~msort.index.isin(set(tpos))]
        fake_new = msort.iloc[: len(tpos)][R.MANIFEST_COLS]
        out = pd.concat([untouched[R.MANIFEST_COLS], fake_new], ignore_index=True)
        return out.sort_values("min_key").reset_index(drop=True)

    step("cow_manifest_split+concat", cow_split)

    # 3. manifest-level diff pruning: two manifests differing in k rows
    def diff_prune():
        other = mf2.copy()
        k = max(n // 1000, 1)
        col = other["range_id"].to_numpy(dtype=object).copy()
        col[:k] = [f"{'0' * 48}{i:016x}" for i in range(k)]
        other["range_id"] = col
        lids = set(mf2["range_id"])
        rids = set(other["range_id"])
        return len(lids - rids), len(rids - lids)

    print("  diff sets:", step("pruned_sides_set_algebra", diff_prune), flush=True)

    # 4. byte-budgeted LRU under several large manifests
    def lru_abuse():
        R.manifest_cache_clear()
        for i in range(4):
            sub = mf2.iloc[: n // 2].copy()
            sub.iloc[0, 0] = f"variant-{i}"
            vid = f"variant-{i}-mid"
            path = os.path.join(R.manifests_dir(root), f"{vid}.parquet")
            sub[R.MANIFEST_COLS].to_parquet(path, index=False)
            R.read_manifest(root, vid)
        return R.manifest_cache_stats()

    ents, nbytes = step("lru_byte_budget (4 half-size manifests)", lru_abuse)
    budget = R._MANIFEST_CACHE_MAX_BYTES
    print(
        f"  cache after abuse: {ents} entries, {nbytes / 1e9:.2f} GB "
        f"(budget {budget / 1e9:.2f} GB) -> "
        f"{'OK' if nbytes <= max(budget, R.manifest_nbytes(mf2)) else 'OVER BUDGET'}",
        flush=True,
    )

    print(f"FINAL peak driver RSS: {rss_gb():.2f} GB", flush=True)
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
