#!/usr/bin/env python
"""Scale smoke: run the B1/B3/B4/B7 shapes at REPLICAS x the bench
scale point (default 10x = ~6M entries) and print per-op seconds next
to the 1x numbers, to measure how the engine's costs actually grow.

What linearity demonstrates (and what the design predicts):
- import+commit: range writes are one shuffle + native parquet; cost
  ~O(entries).
- diff 1%: manifest pruning keeps the scan to changed ranges; the
  changed-range count grows with the change set, not the repo.
- merge 1%: COW apply rewrites only touched ranges; with uniformly
  random keys every range is touched, so this is the worst case.
- gc mark: two anti-joins over the address set, ~O(addresses).

Usage: python tools/scale_smoke.py [REPLICAS ...]

Multiple replica points run in ONE process/JVM (e.g. `10 30 100`), so
the printed slopes are within-run — the only comparison the README
methodology admits on this box (cross-run I/O throughput swings 2-5x).
One JSON line prints per point, then a final {"slopes": ...} line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_point(spark, replicas: int) -> dict:
    from pyspark.sql import functions as F

    from lakefs_spark.storage.repo import Repository
    # sf0.1 lineitem arrives as ~3 splits; spread the derivation
    # (60M md5s at 100x) across the box instead of 3 tasks — at real
    # scale the input would already have thousands of splits
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").repartition(64)
    li.createOrReplaceTempView("li")
    # replicate the bench entry derivation across REPLICAS key prefixes
    ents = spark.sql(
        f"""
        select 'tables/r' || r.id || '/b' || (l_orderkey % 8) || '/'
               || lpad(cast(l_orderkey as string), 12, '0') || '-'
               || cast(l_linenumber as string) as key,
               md5('li|' || r.id || '|' || l_orderkey || '|' || l_linenumber) as identity,
               'data/g1/' || md5('a|' || r.id || '|' || l_orderkey || '-' || l_linenumber) as address,
               'RELATIVE' as address_type,
               (l_orderkey % 997) * 100 + l_linenumber as size,
               md5('e|' || r.id || '|' || l_orderkey || '-' || l_linenumber) as etag,
               cast(null as timestamp) as last_modified,
               cast(null as map<string,string>) as metadata,
               'application/octet-stream' as content_type
        from li cross join range(0, {replicas}) r
        """
    )
    n = ents.count()
    timings: dict[str, float] = {"replicas": replicas, "entries": n}

    def note(k):
        print(f"## {k}: {timings[k]}", flush=True)

    def drop_dead_shuffles():
        # local[N] has ONE disk for what a cluster spreads over
        # thousands: finished ops leave tens of GB of shuffle files
        # that ContextCleaner only frees on driver JVM GC, which a
        # batch driver may never trigger — at 300x the dead files
        # exceed the box's scratch space. Nudge both GCs between ops.
        import gc as _gc

        _gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(3)  # let ContextCleaner process the queue

    root = tempfile.mkdtemp(prefix="lakescale_")
    try:
        repo = Repository.create(spark, root)
        t0 = time.time()
        repo.import_entries("main", ents, message="scale import")
        timings["import_commit_s"] = round(time.time() - t0, 1)
        note("import_commit_s")
        drop_dead_shuffles()

        key_mod = F.abs(F.xxhash64("key")) % 100
        repo.create_branch("left", "main")
        repo.stage_entries(
            "left",
            ents.where(key_mod == 1).withColumn(
                "identity", F.md5(F.concat(F.col("identity"), F.lit("L")))
            ),
        )
        t0 = time.time()
        repo.commit("left", "left 1%")
        timings["commit_1pct_s"] = round(time.time() - t0, 1)
        note("commit_1pct_s")
        drop_dead_shuffles()

        t0 = time.time()
        n_diff = repo.diff("main", "left").count()
        timings["diff_1pct_s"] = round(time.time() - t0, 1)
        note("diff_1pct_s")
        assert n_diff > 0
        drop_dead_shuffles()

        repo.create_branch("right", "main")
        repo.stage_entries(
            "right",
            ents.where(key_mod == 2).withColumn(
                "identity", F.md5(F.concat(F.col("identity"), F.lit("R")))
            ),
        )
        repo.commit("right", "right 1%")
        t0 = time.time()
        repo.merge("left", "right")
        timings["merge_1pct_s"] = round(time.time() - t0, 1)
        note("merge_1pct_s")
        drop_dead_shuffles()

        # B2 shape: one 1000-entry page, prefix + deep after-cursor.
        # Manifest range selection + cursor pushdown should keep page
        # latency ~O(page), not O(repo) — the flattest line in the
        # curve if the pruning works.
        t0 = time.time()
        page = repo.list_entries(
            "main",
            prefix="tables/r0/",
            after="tables/r0/b4/",
            limit=1000,
        ).collect()
        timings["list_page_s"] = round(time.time() - t0, 1)
        note("list_page_s")
        assert len(page) == 1000, len(page)

        reachable = repo.reachable_addresses(repo.active_commits(7.0))
        # a real object-store listing has exactly one row per address
        orphans = (
            ents.where(key_mod < 10)
            .select(F.concat(F.lit("data/orphan/"), F.md5("key")).alias("address"))
            .distinct()
        )
        listing = reachable.unionByName(orphans)
        t0 = time.time()
        n_marked = repo.gc_mark(listing, 7.0).count()
        timings["gc_mark_s"] = round(time.time() - t0, 1)
        note("gc_mark_s")
        assert n_marked == orphans.count()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(timings), flush=True)
    return timings


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from lakefs_spark.session import get_spark

    points = [int(a) for a in sys.argv[1:]] or [10]
    spark = get_spark("scale_smoke")
    results = [run_point(spark, r) for r in points]
    if len(results) > 1:
        base = results[0]
        slopes = {
            k: [round(r[k] / max(base[k], 0.1), 2) for r in results]
            for k in ("entries", "import_commit_s", "commit_1pct_s",
                      "diff_1pct_s", "merge_1pct_s", "list_page_s", "gc_mark_s")
        }
        print(json.dumps({"slopes_vs_first_point": slopes}), flush=True)


if __name__ == "__main__":
    main()
