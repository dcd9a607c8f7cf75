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
                 "create-branches", "gc-sweep", "staging-scale",
                 "merge-contention"],
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

        if args.mode == "merge-contention":
            # VERDICT r6 #7: the MostlyCorrectOwner payoff, measured.
            # --parallelism mergers x --iterations rounds race merges
            # into main, WITH the advisory lease and WITHOUT; report
            # applies-per-landed-merge (the waste metric: lost-CAS
            # recomputes) and wall time for each arm.
            import threading

            import lakefs_spark.storage.repo as repo_mod
            from lakefs_spark.storage.ownership import MostlyCorrectOwner

            applies = []
            real_apply = repo_mod.apply_changes

            def counting_apply(*a, **kw):
                applies.append(1)
                return real_apply(*a, **kw)

            repo_mod.apply_changes = counting_apply
            try:
                results = {}
                n_workers = args.parallelism
                for arm in ("without_owner", "with_owner"):
                    # FRESH repo per arm: both arms start from the same
                    # seed-only history, so neither is measured against a
                    # main fattened by the other's merges
                    arm_root = os.path.join(root, f"repo-{arm}")
                    arm_repo = Repository.create(spark, arm_root)
                    arm_repo.import_entries("main", base.limit(2000), message="seed")
                    mergers = []
                    for i in range(n_workers):
                        r = Repository.open(spark, arm_root, store=arm_repo.store)
                        if arm == "with_owner":
                            r.owner = MostlyCorrectOwner(
                                arm_repo.store, refresh_interval=10.0, acquire_interval=0.05
                            )
                        b = f"{arm}-{i}"
                        r.create_branch(b, "main")
                        mergers.append((r, b))
                    total_merges = 0
                    merge_applies = 0
                    t_arm = time.time()
                    for rnd in range(args.iterations):
                        for i, (r, b) in enumerate(mergers):
                            r.stage_entries(
                                b,
                                base.limit(200).withColumn(
                                    "key",
                                    F.concat(F.lit(f"{arm}/{i}/{rnd}/"), F.col("key")),
                                ),
                            )
                            r.commit(b, f"{arm} {i} round {rnd}")
                        a0 = len(applies)  # count MERGE applies only
                        barrier = threading.Barrier(n_workers)
                        errs = []

                        def merge_one(pair):
                            r, b = pair
                            barrier.wait()
                            try:
                                r.merge(b, "main")
                            except Exception as e:  # noqa: BLE001
                                errs.append(repr(e))

                        threads = [
                            threading.Thread(target=merge_one, args=(p,))
                            for p in mergers
                        ]
                        for t in threads:
                            t.start()
                        for t in threads:
                            t.join()
                        total_merges += n_workers - len(errs)
                        merge_applies += len(applies) - a0
                        if errs:
                            print(f"  {arm} round {rnd} errors: {errs}", file=sys.stderr)
                    results[arm] = {
                        "merges_landed": total_merges,
                        "applies": merge_applies,
                        "applies_per_merge": round(merge_applies / max(total_merges, 1), 2),
                        "wall_sec": round(time.time() - t_arm, 2),
                    }
            finally:
                repo_mod.apply_changes = real_apply
            print(json.dumps({
                "mode": args.mode,
                "parallel_mergers": n_workers,
                "rounds": args.iterations,
                **results,
                "sf": SF_DIR,
            }))
            return

        if args.mode == "staging-scale":
            # VERDICT r6 #6: staging-dir scale guard. Stage --amount
            # rows (default run: 1e5 / 1e6 / 1e7 via three invocations)
            # on top of a committed base, then time the operations that
            # materialize or rewrite the staging layer:
            #   uncommitted()    overlay diff vs committed head
            #   list_page        overlay listing first page
            #   reset_prefix     staging rewrite minus one key prefix
            #   commit           seal -> COW apply -> pointer CAS
            # The uncommitted/list numbers justify the delete-sensor
            # auto-compaction default (streaming/sensors.py).
            repo.import_entries("main", base, message="seed")
            n = args.amount
            staged = (
                spark.range(n)
                .select(
                    F.concat(
                        F.lit("staged/p"),
                        (F.col("id") % 16).cast("string"),
                        F.lit("/"),
                        F.lpad(F.col("id").cast("string"), 12, "0"),
                    ).alias("key"),
                    F.md5(F.col("id").cast("string")).alias("identity"),
                    F.concat(F.lit("data/s/"), F.md5(F.col("id").cast("string"))).alias("address"),
                    F.lit("RELATIVE").alias("address_type"),
                    F.lit(1).cast("long").alias("size"),
                    F.lit("e").alias("etag"),
                    F.lit(None).cast("timestamp").alias("last_modified"),
                    F.lit(None).cast("map<string,string>").alias("metadata"),
                    F.lit("text/plain").alias("content_type"),
                )
            )
            t0 = time.time()
            repo.stage_entries("main", staged)
            t_stage = time.time() - t0
            t0 = time.time()
            n_unc = repo.uncommitted("main").count()
            t_unc = time.time() - t0
            t0 = time.time()
            page, _more = repo.list_page("main", prefix="staged/", amount=1000)
            t_list = time.time() - t0
            t0 = time.time()
            repo.reset_branch("main", prefix="staged/p3/")
            t_reset = time.time() - t0
            t0 = time.time()
            repo.commit("main", f"staging-scale {n}")
            t_commit = time.time() - t0
            print(json.dumps({
                "mode": args.mode,
                "amount": n,
                "uncommitted_rows": n_unc,
                "stage_sec": round(t_stage, 2),
                "uncommitted_sec": round(t_unc, 2),
                "list_page_sec": round(t_list, 2),
                "reset_prefix_sec": round(t_reset, 2),
                "commit_sec": round(t_commit, 2),
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
