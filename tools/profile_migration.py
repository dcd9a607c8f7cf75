#!/usr/bin/env python
"""Scale profile of the bidirectional lakeFS SSTable migration path.

For each N: synthesize N entries → commit in repo A →
``export_to_lakefs`` (one range-partitioned shuffle, ranges built
executor-side, Snappy blocks) → ``migrate_from_lakefs`` into repo B
(distributed names-sharded RangeFS parse — NOT binaryFile, whose
small-file partition packing collapses parallelism) → verify the two
snapshots are row-identical with an exceptAll. Prints one JSON line
per point.

Usage:
  python tools/profile_migration.py [N ...]       (default 600000 6000000)
  python tools/profile_migration.py history N K   (N-entry repo, K commits
      of ~1% churn each: exports the chain incrementally, replays it with
      the range-pruned migrate_history, and prints per-step parse/rebuild
      counts + times — the proof that replay cost tracks DELTA size, not
      snapshot size)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_entries(spark, n: int):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.concat(
                F.lit("corpus/shard="),
                F.lpad((F.col("id") % 64).cast("string"), 2, "0"),
                F.lit("/doc-"),
                F.lpad(F.col("id").cast("string"), 10, "0"),
            ).alias("key"),
            F.sha2(F.col("id").cast("string"), 256).alias("identity"),
            F.concat(F.lit("data/"), F.md5(F.col("id").cast("string"))).alias("address"),
            F.lit("RELATIVE").alias("address_type"),
            (F.col("id") % 100000 + 1).alias("size"),
            F.md5(F.concat(F.lit("e"), F.col("id").cast("string"))).alias("etag"),
            F.lit(None).cast("timestamp").alias("last_modified"),
            F.lit(None).cast("map<string,string>").alias("metadata"),
            F.lit("text/plain").alias("content_type"),
        )
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from lakefs_spark.session import get_spark
    from lakefs_spark.sources import sstable as S
    from lakefs_spark.storage.repo import Repository

    points = [int(a) for a in sys.argv[1:]] or [600_000, 6_000_000]
    spark = get_spark("profile-migration")
    for n in points:
        root = tempfile.mkdtemp(prefix="lakemig_")
        try:
            repo_a = Repository.create(spark, os.path.join(root, "a"))
            repo_a.import_entries("main", synth_entries(spark, n), message="src")
            head = repo_a.resolve("main").commit_id

            out = os.path.join(root, "export")
            t0 = time.time()
            mid, n_ranges, n_exported = S.export_to_lakefs(
                repo_a, head, out
            )
            t_export = round(time.time() - t0, 2)

            repo_b = Repository.create(spark, os.path.join(root, "b"))
            t0 = time.time()
            commit_b, nr, ne = S.migrate_from_lakefs(
                repo_b, os.path.join(out, mid), out
            )
            t_import = round(time.time() - t0, 2)

            t0 = time.time()
            a = repo_a.snapshot(head).select(
                "key", "identity", "address", "size", "etag"
            )
            b = repo_b.snapshot(commit_b.commit_id).select(
                "key", "identity", "address", "size", "etag"
            )
            missing = a.exceptAll(b).count() + b.exceptAll(a).count()
            t_verify = round(time.time() - t0, 2)

            print(
                json.dumps(
                    {
                        "n_entries": n,
                        "n_ranges": n_ranges,
                        "export_sec": t_export,
                        "import_sec": t_import,
                        "verify_sec": t_verify,
                        "row_diffs": missing,
                        "exported_mb": round(
                            sum(
                                os.path.getsize(os.path.join(out, f))
                                for f in os.listdir(out)
                            )
                            / 1e6,
                            1,
                        ),
                    }
                ),
                flush=True,
            )
            assert missing == 0 and ne == n
        finally:
            shutil.rmtree(root, ignore_errors=True)


def main_history(n: int, k: int) -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from lakefs_spark.session import get_spark
    from lakefs_spark.sources import sstable as S
    from lakefs_spark.storage.repo import Repository

    spark = get_spark("profile-migration-history")
    root = tempfile.mkdtemp(prefix="lakemighist_")
    try:
        src = Repository.create(spark, os.path.join(root, "src"))
        src.stage_entries("main", synth_entries(spark, n))
        commits = [src.commit("main", "base")]
        for step in range(1, k):
            # ~1% churn per commit: one contiguous key region rewritten
            # rewrite one shard (~1/64 of keys, a contiguous key region)
            shard = step % 64
            upd = (
                synth_entries(spark, n)
                .where(F.col("key").startswith(f"corpus/shard={shard:02d}/"))
                .withColumn("etag", F.concat(F.col("etag"), F.lit(f"-v{step}")))
            )
            src.stage_entries("main", upd)
            commits.append(src.commit("main", f"churn {step}"))

        out = os.path.join(root, "export")
        exp_steps: list = []
        t0 = time.time()
        chain = S.export_history(
            src, [c.commit_id for c in commits], out,
            on_step=exp_steps.append,
        )
        t_export = round(time.time() - t0, 2)

        dst = Repository.create(spark, os.path.join(root, "dst"))
        mig_steps: list = []
        t0 = time.time()
        S.migrate_history(
            dst,
            [(os.path.join(out, mid), f"replay {i}")
             for i, (_cid, mid) in enumerate(chain)],
            out,
            on_step=mig_steps.append,
        )
        t_migrate = round(time.time() - t0, 2)

        print(
            json.dumps(
                {
                    "mode": "history",
                    "n_entries": n,
                    "n_commits": k,
                    "export_sec": t_export,
                    "migrate_sec": t_migrate,
                    "export_steps": [
                        {"rebuilt": s_["ranges_rebuilt"],
                         "reused": s_["ranges_reused"],
                         "total": s_["ranges_total"]}
                        for s_ in exp_steps
                    ],
                    "migrate_steps": [
                        {"parsed": s_["ranges_parsed"],
                         "total": s_["ranges_total"]}
                        for s_ in mig_steps
                    ],
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "history":
        main_history(int(sys.argv[2]) if len(sys.argv) > 2 else 600_000,
                     int(sys.argv[3]) if len(sys.argv) > 3 else 5)
    else:
        main()
