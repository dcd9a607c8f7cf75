#!/usr/bin/env python
"""Load harness: the reference's loadtest scenario mix on this engine.

Per iteration (pkg/loadtest/scenario.go:19-50 — 20 uploads + commit +
branch + 20 uploads + commit + merge + list(100) + list(1000) + diff),
against a repo seeded from $SPARK_GRAFT_SF_DIR lineitem keys. Reports
per-op latencies and results/sec like `lakectl abuse`
(cmd/lakectl/cmd/abuse_*.go).

Usage: python tools/loadtest.py [--iterations N] [--files-per-commit N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import shutil
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=5)
    ap.add_argument("--files-per-commit", type=int, default=20)
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
        repo = Repository.create(spark, root)
        repo.import_entries("main", base, message="seed")

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
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
