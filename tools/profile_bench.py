#!/usr/bin/env python
"""Per-phase breakdown of the B1-B7 bench ops (round-10 measurement).

Runs the same scenario as bench.py but times the internal phases of
the expensive ops (import, merge, conflict merge) by calling the same
engine functions the Repository methods call, in the same order, so
the phase sum reproduces the op total. Read-only instrumentation: the
bench itself is untouched.

Usage: python tools/profile_bench.py [repeats]
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


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from bench import derived_entries
    from lakefs_spark.session import get_spark
    from lakefs_spark.storage import ranges as R
    from lakefs_spark.storage.repo import ConflictError, Repository

    spark = get_spark("profile_bench")
    sc = spark.sparkContext
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 1

    for rep in range(repeats):
        root = tempfile.mkdtemp(prefix="lakeprof_")
        t: dict[str, float] = {}

        def timed(name):
            class _T:
                def __enter__(self):
                    sc.setJobDescription(name)
                    self.t0 = time.time()

                def __exit__(self, *a):
                    t[name] = round(time.time() - self.t0, 3)
                    sc.setJobDescription(None)

            return _T()

        try:
            ents = derived_entries(spark)
            repo = Repository.create(spark, root)

            # ---- B1 phases -------------------------------------------------
            from lakefs_spark.operators.overlay import dedup_entries
            from lakefs_spark.schema import ENTRY_COLS

            with timed("b1.dedup_plan+select"):
                ents_d = dedup_entries(ents.select(*ENTRY_COLS))
            with timed("b1.boundary_collect"):
                from lakefs_spark.plans.chunker import boundary_flag

                ragged = repo.raggedness
                bks = sorted(
                    r[0]
                    for r in ents_d.where(boundary_flag(F.col("key"), ragged))
                    .select("key")
                    .collect()
                )
            with timed("b1.chunk+shuffle+write+agg"):
                from lakefs_spark.plans.chunker import assign_chunks

                chunked = assign_chunks(ents_d, "key", ragged, boundaries=bks)
                manifest = R.write_ranges_prechunked(chunked, root, n_chunks=len(bks) + 1)
            with timed("b1.write_manifest+commit"):
                mid = R.write_manifest(manifest, repo.store)
                commit = repo.commits.create(parents=[], metarange_id=mid, message="bench import")
                repo._cas_update("main", None, {"head": commit.commit_id})

            # ---- setup (same as bench) ------------------------------------
            def salted(cond, salt):
                return (
                    ents.where(cond)
                    .withColumn("identity", F.md5(F.concat(F.col("identity"), F.lit(salt))))
                )

            key_mod = F.abs(F.xxhash64("key")) % 100
            with timed("setup.branches"):
                repo.create_branch("left", "main")
                repo.stage_entries("left", salted(key_mod == 1, "L"))
                repo.commit("left", "left 1%")
                repo.create_branch("right", "main")
                repo.stage_entries("right", salted(key_mod == 2, "R"))
                repo.commit("right", "right 1%")

            with timed("b2_list"):
                repo.list_entries("main", prefix="tables/lineitem/", delimiter="/").count()
                repo.list_entries("main", prefix="tables/lineitem/b3/", limit=1000).count()

            with timed("b3_diff"):
                repo.diff("main", "left").count()

            # ---- B4 phases -------------------------------------------------
            from lakefs_spark.operators import diff as diff_ops
            from lakefs_spark.operators import merge as merge_ops
            from lakefs_spark.storage.commit_apply import apply_changes
            from lakefs_spark.storage.refs import merge_base

            src_cid = repo.resolve("left").commit_id
            dest_cid = repo.resolve("right").commit_id
            with timed("b4.merge_base"):
                base_cid = merge_base(repo.commits, src_cid, dest_cid)
            with timed("b4.pruned_sides"):
                base_mid = repo._metarange_of(base_cid)
                sdl, sdr = repo._pruned_sides(base_mid, repo._metarange_of(src_cid))
                ddl, ddr = repo._pruned_sides(base_mid, repo._metarange_of(dest_cid))
            with timed("b4.actions_count"):
                sdiff = diff_ops.diff(sdl, sdr)
                ddiff = diff_ops.diff(ddl, ddr)
                actions = merge_ops.merge_changes_from_diffs(sdiff, ddiff, "none", None)
                actions = actions.persist()
                counts = {
                    r["action"]: r["n"]
                    for r in actions.groupBy("action").agg(F.count(F.lit(1)).alias("n")).collect()
                }
            with timed("b4.apply_cow"):
                changes = actions.where(F.col("action") != "conflict").select(
                    (F.col("action") == "delete").alias("is_tombstone"),
                    F.col("key"),
                    F.col("identity"),
                    *[F.col(c) for c in ENTRY_COLS if c not in ("key", "identity")],
                )
                dest_mid = repo._metarange_of(dest_cid)
                base_manifest = R.read_manifest(repo.store, dest_mid)
                new_manifest = apply_changes(spark, repo.root, base_manifest, changes, repo.raggedness)
                actions.unpersist()
            with timed("b4.manifest+commit"):
                new_mid = R.write_manifest(new_manifest, repo.store)
                c = repo.commits.create(
                    parents=[dest_cid, src_cid], metarange_id=new_mid, message="merge"
                )
                repo._cas_update("right", dest_cid, {"head": c.commit_id})

            # ---- B5 phases -------------------------------------------------
            with timed("b5.setup"):
                repo.create_branch("cleft", "main")
                repo.stage_entries("cleft", salted(key_mod == 5, "CL"))
                repo.commit("cleft", "conflict left")
                repo.create_branch("cright", "main")
                repo.stage_entries("cright", salted(key_mod == 5, "CR"))
                repo.commit("cright", "conflict right")
            with timed("b5.conflict_detect"):
                try:
                    repo.merge("cleft", "cright")
                    raise AssertionError("expected conflicts")
                except ConflictError as e:
                    n_conf = e.conflicts.count()
            with timed("b5.src_merge"):
                repo.merge("cleft", "cright", strategy="src")
            assert n_conf > 0

            # ---- B6/B7 ----------------------------------------------------
            paths = [r["key"] for r in ents.orderBy("key").limit(10).collect()]
            with timed("b6.setup_12_commits"):
                for i in range(12):
                    repo.stage_entries(
                        "main",
                        ents.where(F.col("key") == paths[i % 10]).withColumn(
                            "identity", F.md5(F.concat(F.col("identity"), F.lit(f"h{i}")))
                        ),
                    )
                    repo.commit("main", f"history {i}")
            with timed("b6_log_path"):
                repo.log_with_paths("main", paths[:10])
            with timed("b7.reachable"):
                reachable = repo.reachable_addresses(repo.active_commits(7.0))
            orphans = (
                ents.where(key_mod < 10)
                .select(F.concat(F.lit("data/orphan/"), F.md5("key")).alias("address"))
                .distinct()
            )
            listing = reachable.unionByName(orphans)
            with timed("b7_gc_mark"):
                repo.gc_mark(listing, 7.0).count()
        finally:
            shutil.rmtree(root, ignore_errors=True)
        print(json.dumps({"rep": rep, "phases": t}), flush=True)


if __name__ == "__main__":
    main()
