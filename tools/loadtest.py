#!/usr/bin/env python
"""Load harness: the reference's loadtest scenario mix + abuse modes.

Modes (``--mode``):
- ``scenario`` (default): per iteration, the vegeta scenario mix of
  pkg/loadtest/scenario.go:19-50 — 20 uploads + commit + branch + 20
  uploads + commit + merge + list(100) + list(1000) + diff.
- ``random-read``: ``--amount`` random stat-object point lookups over
  the seeded keys with ``--parallelism`` worker threads
  (cmd/lakectl/cmd/abuse_random_read.go:18-50).
- ``link-same-object``: ``--amount`` parallel
  getPhysicalAddress + linkPhysicalAddress rounds on ONE key — the
  server-side write path without any byte upload
  (cmd/lakectl/cmd/abuse_link_same_object.go).
- ``create-branches``: delete then create ``--amount`` branches from
  main in parallel (cmd/lakectl/cmd/abuse_create_branches.go).

Seeded from $SPARK_GRAFT_SF_DIR lineitem keys. Reports per-op
latencies + results/sec, the `lakectl abuse` output shape.

Usage: python tools/loadtest.py [--mode M] [--iterations N]
       [--files-per-commit N] [--amount N] [--parallelism N]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import tempfile
import shutil
import time
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _run_parallel(op_name, lat, inputs, fn, parallelism):
    """stress.Generator analog: feed ``inputs`` to ``parallelism``
    worker threads, recording per-op latency (driver ops are
    thread-safe; Spark schedules concurrent jobs fairly)."""
    def one(x):
        t0 = time.time()
        try:
            fn(x)
            err = None
        except Exception as e:  # noqa: BLE001 — abuse harness records failures
            err = repr(e)
        lat[op_name].append(time.time() - t0)
        return err
    with ThreadPoolExecutor(max_workers=parallelism) as ex:
        errs = [e for e in ex.map(one, inputs) if e]
    return errs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode",
        choices=["scenario", "random-read", "link-same-object",
                 "create-branches", "gc-sweep"],
        default="scenario",
    )
    ap.add_argument("--iterations", type=int, default=5)
    ap.add_argument("--files-per-commit", type=int, default=20)
    ap.add_argument("--amount", type=int, default=100)
    ap.add_argument("--parallelism", type=int, default=8)
    ap.add_argument("--key", default="load/00000000000011")
    ap.add_argument("--branch-prefix", default="abuse-")
    ap.add_argument(
        "--store", choices=["local", "s3"], default="local",
        help="metadata store driver: local flock CAS or the S3 "
             "conditional-PUT driver against a loopback fake endpoint "
             "(blobs stay on a Spark-readable local root)",
    )
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from lakefs_spark.session import get_spark
    from lakefs_spark.storage.repo import Repository

    spark = get_spark("loadtest")
    root = tempfile.mkdtemp(prefix="lakeload_")
    lat: dict[str, list[float]] = defaultdict(list)

    def timed(op, fn):
        t0 = time.time()
        out = fn()
        lat[op].append(time.time() - t0)
        return out

    srv = None
    try:
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        base = li.select(
            F.concat(
                F.lit("load/"),
                F.lpad((F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string"), 14, "0"),
            ).alias("key"),
            F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber")).alias("identity"),
            F.concat(F.lit("data/"), F.md5(F.concat_ws("-", "l_orderkey", "l_linenumber"))).alias("address"),
            F.lit("RELATIVE").alias("address_type"),
            (F.col("l_orderkey") % 1000).cast("long").alias("size"),
            F.md5(F.concat_ws("+", "l_orderkey", "l_linenumber")).alias("etag"),
            F.lit(None).cast("timestamp").alias("last_modified"),
            F.lit(None).cast("map<string,string>").alias("metadata"),
            F.lit("application/octet-stream").alias("content_type"),
        ).limit(5000)
        if args.store == "s3":
            from lakefs_spark.storage.store_s3 import FakeS3Server, S3ConditionalStore

            srv = FakeS3Server().start()
            store = S3ConditionalStore(srv.endpoint, "loadtest", local_blob_root=root)
            repo = Repository.create(spark, root, store=store)
        else:
            repo = Repository.create(spark, root)

        if args.mode == "gc-sweep":
            # sweep-path stress: --amount fake content addresses are
            # materialized as real empty files executor-parallel, then
            # deleted through gc_sweep's foreachPartition bulk chunks
            # (the BulkRemoverFactory.scala shape, 1000 per call like
            # S3 DeleteObjects) — measures end-to-end delete throughput
            from lakefs_spark.operators.gc import gc_sweep

            scratch = os.path.join(root, "sweep_scratch")
            addrs = (
                spark.range(args.amount)
                .select(
                    F.concat(
                        F.lit(scratch + "/"),
                        F.lpad((F.col("id") % 4096).cast("string"), 4, "0"),
                        F.lit("/"),
                        F.md5(F.col("id").cast("string")),
                    ).alias("address")
                )
                .repartition(32)
                .persist()
            )

            def touch(rows):
                import os as _os

                seen_dirs = set()
                for row in rows:
                    p = row["address"]
                    d = p[: p.rfind("/")]
                    if d not in seen_dirs:
                        _os.makedirs(d, exist_ok=True)
                        seen_dirs.add(d)
                    open(p, "w").close()

            t0 = time.time()
            addrs.foreachPartition(touch)
            t_create = time.time() - t0
            t0 = time.time()
            deleted = gc_sweep(addrs, bulk_size=1000)
            t_sweep = time.time() - t0
            addrs.unpersist()
            leftovers = sum(len(fs) for _, _, fs in os.walk(scratch))
            print(json.dumps({
                "mode": args.mode,
                "amount": args.amount,
                "deleted": deleted,
                "leftover_files": leftovers,
                "create_sec": round(t_create, 2),
                "sweep_sec": round(t_sweep, 2),
                "creates_per_sec": round(args.amount / t_create, 1),
                "deletes_per_sec": round(deleted / t_sweep, 1),
                "sf": SF_DIR,
            }))
            return

        # seeded repo contents feed every remaining mode (gc-sweep above
        # never touches them, so it skips the import entirely)
        repo.import_entries("main", base, message="seed")

        if args.mode != "scenario":
            errors = []
            t_start = time.time()
            if args.mode == "random-read":
                keys = [r["key"] for r in base.select("key").collect()]
                rng = random.Random(42)
                picks = [keys[rng.randrange(len(keys))] for _ in range(args.amount)]
                errors = _run_parallel(
                    "stat_object", lat, picks,
                    lambda k: repo.get("main", k), args.parallelism,
                )
            elif args.mode == "link-same-object":
                from lakefs_spark.catalog import Catalog

                cat = Catalog(repo)

                def get_and_link(_i):
                    loc = cat.get_physical_address("main", args.key)
                    cat.link_physical_address(
                        "main", args.key, loc["physical_address"],
                        size=1, checksum="abuse", content_type="application/octet-stream",
                    )

                errors = _run_parallel(
                    "get_and_link", lat, range(args.amount),
                    get_and_link, args.parallelism,
                )
            else:  # create-branches: clean pass, then parallel creates
                stale = [b for b in repo.branches() if b.startswith(args.branch_prefix)]
                _run_parallel(
                    "delete_branch", lat, stale, repo.delete_branch, args.parallelism
                )
                errors = _run_parallel(
                    "create_branch", lat,
                    [f"{args.branch_prefix}{i:06d}" for i in range(args.amount)],
                    lambda b: repo.create_branch(b, "main"), args.parallelism,
                )
            wall = time.time() - t_start
            n_ops = sum(len(v) for v in lat.values())
            print(json.dumps({
                "mode": args.mode,
                "amount": args.amount,
                "parallelism": args.parallelism,
                "wall_sec": round(wall, 2),
                "results_per_sec": round(n_ops / wall, 2),
                "errors": len(errors),
                "ops": {
                    op: {
                        "n": len(v),
                        "mean_ms": round(1000 * sum(v) / len(v), 1),
                        "max_ms": round(1000 * max(v), 1),
                    }
                    for op, v in sorted(lat.items())
                },
                "sf": SF_DIR,
            }))
            return

        t_start = time.time()
        for it in range(args.iterations):
            n = args.files_per_commit
            batch1 = base.limit(n).withColumn("identity", F.md5(F.concat("identity", F.lit(f"i{it}a"))))
            timed("upload_batch", lambda: repo.stage_entries("main", batch1))
            timed("commit", lambda: repo.commit("main", f"iter {it} main"))
            br = f"iter-{it}"
            timed("create_branch", lambda: repo.create_branch(br, "main"))
            batch2 = (
                base.orderBy(F.desc("key")).limit(n)
                .withColumn("identity", F.md5(F.concat("identity", F.lit(f"i{it}b"))))
            )
            timed("upload_batch", lambda: repo.stage_entries(br, batch2))
            timed("commit", lambda: repo.commit(br, f"iter {it} branch"))
            timed("merge", lambda: repo.merge(br, "main"))
            timed("list_100", lambda: repo.list_page("main", prefix="load/", amount=100))
            timed("list_1000", lambda: repo.list_page("main", prefix="load/", amount=1000))
            timed("diff", lambda: repo.diff("main", br).count())
        wall = time.time() - t_start

        n_ops = sum(len(v) for v in lat.values())
        report = {
            "mode": args.mode,
            "store": args.store,
            "iterations": args.iterations,
            "files_per_commit": args.files_per_commit,
            "wall_sec": round(wall, 2),
            "results_per_sec": round(n_ops / wall, 2),
            "ops": {
                op: {
                    "n": len(v),
                    "mean_ms": round(1000 * sum(v) / len(v), 1),
                    "max_ms": round(1000 * max(v), 1),
                }
                for op, v in sorted(lat.items())
            },
            "sf": SF_DIR,
        }
        print(json.dumps(report))
    finally:
        if srv is not None:
            srv.stop()
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
