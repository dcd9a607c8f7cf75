#!/usr/bin/env python
"""Commit-graph operations at depth (VERDICT r6 'Next round #5').

log / merge-base / active-commits are driver-side graph walks
(storage/refs.py) — correct per SURVEY (DAG ≤ 1e6) but previously
unmeasured past a few hundred commits. This tool synthesizes a DEEP
history (default 100k commits: a first-parent chain with a 2-parent
merge every 100 commits and a long-lived side branch for merge-base),
points a branch at the tip, and times:

  - log() full walk (newest-first heap iterator)
  - log(limit=100) first page (must early-exit, not walk the chain)
  - log(after=<mid>, limit=100) deep page (walk-to-cursor cost)
  - log(first_parent=True) full
  - merge_base(tip, old side branch) (generation-ordered walk)
  - active_commit_set with a mid-history cutoff
  - annotate + log_with_paths over the deep chain (batched probes,
    2 real alternating metaranges so the manifest compare actually
    runs per step)

Usage: python tools/profile_commit_graph.py [N_COMMITS]
"""

from __future__ import annotations

import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from pyspark.sql import functions as F

    from lakefs_spark.session import get_spark
    from lakefs_spark.storage.refs import active_commit_set, merge_base
    from lakefs_spark.storage.repo import Repository

    spark = get_spark("profile_commit_graph")
    root = tempfile.mkdtemp(prefix="cg_prof_")
    repo = Repository.create(spark, root)

    def step(tag, fn):
        t0 = time.time()
        out = fn()
        print(f"{tag}: {time.time() - t0:.2f}s rss={rss_gb():.2f}GB", flush=True)
        return out

    # two REAL commits -> two real metaranges the synthetic chain can
    # alternate between (manifest compares then do real work per step)
    ents = spark.range(0, 2000).select(
        F.concat(F.lit("tables/t/"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("key"),
        F.md5(F.col("id").cast("string")).alias("identity"),
        F.concat(F.lit("data/"), F.md5(F.col("id").cast("string"))).alias("address"),
        F.lit("RELATIVE").alias("address_type"),
        F.lit(1).cast("long").alias("size"),
        F.lit("e").alias("etag"),
        F.lit(None).cast("timestamp").alias("last_modified"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.lit("text/plain").alias("content_type"),
    )
    repo.stage_entries("main", ents)
    c1 = repo.commit("main", "base A", date=1000.0)
    repo.stage_entries(
        "main",
        ents.limit(3).withColumn("identity", F.concat("identity", F.lit("x"))),
    )
    c2 = repo.commit("main", "base B", date=1001.0)
    mid_a = repo.commits.get(c1.commit_id).metarange_id
    mid_b = repo.commits.get(c2.commit_id).metarange_id

    # synthesize the deep chain on the driver (commit docs only — the
    # graph plane never touches data, which is the point)
    def build_chain():
        cs = repo.commits
        tip = c2.commit_id
        side = None
        t0 = 2000.0
        for i in range(n):
            parents = [tip]
            if i % 100 == 99 and side is not None:
                parents.append(side)  # merge commit
            c = cs.create(
                parents,
                mid_a if i % 2 == 0 else mid_b,
                f"synthetic {i}",
                creation_date=t0 + i,
            )
            if i == n // 4:
                side = c.commit_id  # long-lived branch point
            tip = c.commit_id
        return tip, side

    tip, side = step(f"build_chain ({n} commits, LocalStore doc/commit)", build_chain)
    repo.store.put_doc("refs/branches/deep", {"head": tip, "staging_seq": 0})
    repo.store.put_doc("refs/branches/old-side", {"head": side, "staging_seq": 0})

    full = step("log_full", lambda: repo.log("deep"))
    print(f"  commits in log: {len(full)}", flush=True)
    step("log_first_page_100", lambda: repo.log("deep", limit=100))
    mid_commit = full[len(full) // 2].commit_id
    step("log_deep_page_100 (after=mid)", lambda: repo.log("deep", after=mid_commit, limit=100))
    step("log_first_parent_full", lambda: repo.log("deep", first_parent=True))
    step("merge_base(tip, old-side)", lambda: merge_base(repo.commits, tip, side))
    cutoff = 2000.0 + n / 2
    step(
        "active_commit_set (cutoff=mid)",
        lambda: active_commit_set(repo.commits, {tip: cutoff}),
    )
    # log_with_paths over the full-churn chain (EVERY commit differs —
    # the candidate prune can drop nothing, the worst case): limit=10
    # early-exits after the first probe batch, the realistic usage
    step(
        "log_with_paths (10 paths, limit=10, full-churn history)",
        lambda: repo.log_with_paths(
            "deep", [f"tables/t/{i:08d}" for i in range(10)], limit=10
        ),
    )
    # annotate at a realistic blame depth (1k commits): the fixture is
    # the worst case — every commit's manifest differs AND 7 of the 10
    # probed keys were only ever touched by the base import, so the
    # walk cannot early-exit before the bottom. Cost is rounds x
    # per-round job overhead; the batch knob trades job count for job
    # size.
    depth1k = full[-1001].commit_id if len(full) > 1001 else tip
    repo.store.put_doc("refs/branches/deep1k", {"head": depth1k, "staging_seq": 0})
    for b in (16, 64):
        t0 = time.time()
        cnt = repo.annotate("deep1k", "tables/t/000000", batch=b).count()
        dt = time.time() - t0
        rounds = max(1, (1002 + b - 1) // b)
        print(
            f"annotate depth=1k batch={b}: {dt:.1f}s total, "
            f"{dt / rounds:.2f}s/round ({rounds} rounds, {cnt} keys)",
            flush=True,
        )
    # COLD walks: a fresh Repository (empty CommitStore cache) pays one
    # store get_doc per commit — the deployment-relevant first-call cost
    cold = Repository.open(spark, root)
    step("log_full COLD (fresh commit cache)", lambda: cold.log("deep"))
    step("merge_base COLD", lambda: merge_base(cold.commits, tip, side))
    print(f"FINAL peak driver RSS: {rss_gb():.2f} GB", flush=True)

    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
