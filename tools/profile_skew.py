#!/usr/bin/env python
"""Skew hardening proof for the diff/merge join (VERDICT r6 #4).

Worry: B3/B4 join on ``key`` and real repos have hot prefixes
(``tables/orders/...``); at 100x a skewed prefix could burst one task.

Why it can't, by construction: object keys are UNIQUE, and Spark's
sort-merge/hash joins partition by hash(key) — a hot *prefix* does not
concentrate unique keys into one partition; only a hot *join key*
could, and there are none. AQE's skew-join splitter
(spark.sql.adaptive.skewJoin, enabled in session.py) is the backstop
for the residual case of hash-range imbalance.

This tool makes that measurable instead of asserted. At N x the bench
scale point it builds two equal-size ~1% change sets — UNIFORM (keys
spread over the whole keyspace) and SKEWED (50% of changed keys under
ONE prefix, the VERDICT fixture) — and reports:

  1. per-partition row counts of the diff join's shuffled sides
     (max/mean ratio: a task can only be a data-volume straggler if
     its partition holds the extra rows — ratio < 2 means no >4x
     straggler is possible from skew)
  2. diff + merge wall time for both change sets (within-run A/B,
     same session)

Usage: python tools/profile_skew.py [SCALE=30]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from lakefs_spark.session import get_spark
    from lakefs_spark.storage.repo import Repository

    spark = get_spark("profile_skew")
    sc = spark.sparkContext

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    reps = spark.range(scale).select(F.col("id").alias("rep"))
    ents = (
        li.crossJoin(reps)
        .select(
            F.concat(
                F.lit("tables/lineitem/b"),
                (F.col("l_orderkey") % 8).cast("string"),
                F.lit("/r"),
                F.col("rep").cast("string"),
                F.lit("/"),
                F.lpad(F.col("l_orderkey").cast("string"), 12, "0"),
                F.lit("-"),
                F.col("l_linenumber").cast("string"),
            ).alias("key"),
            F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber", "rep")).alias("identity"),
            F.concat(F.lit("data/g1/"), F.md5(F.concat_ws("-", "l_orderkey", "rep"))).alias("address"),
            F.lit("RELATIVE").alias("address_type"),
            F.lit(1).cast("long").alias("size"),
            F.lit("e").alias("etag"),
            F.lit(None).cast("timestamp").alias("last_modified"),
            F.lit(None).cast("map<string,string>").alias("metadata"),
            F.lit("text/plain").alias("content_type"),
        )
    )
    n = ents.count()
    print(f"scale={scale}x entries={n}", flush=True)

    root = tempfile.mkdtemp(prefix="skew_prof_")
    repo = Repository.create(spark, root)
    t0 = time.time()
    repo.import_entries("main", ents, message="base")
    print(f"import+commit: {time.time() - t0:.1f}s", flush=True)

    key_mod = F.abs(F.xxhash64("key")) % 1000
    hot_prefix = "tables/lineitem/b3/r0/"
    # half-hot BY CONSTRUCTION: hot = every key of ONE prefix (~n/240),
    # cold = an equal count sampled OUTSIDE that prefix — so exactly
    # 50% of changed keys share the prefix and both change sets have
    # the same total size (the uniform set matches 2 x n_hot)
    n_hot = ents.where(F.col("key").startswith(hot_prefix)).count()
    print(f"hot prefix keys: {n_hot} (change sets = {2 * n_hot} rows)", flush=True)
    # hash-sample fractions sized so the limits are actually reachable
    # at any scale (1.5x headroom over the exact fraction)
    frac_u = min(999, int(1000 * 2 * n_hot / n * 1.5) + 1)
    frac_c = min(999, int(1000 * n_hot / n * 1.5) + 1)

    def change_set(kind: str):
        flip = F.concat(F.lit(f"{kind}-"), F.col("identity"))
        if kind == "uniform":
            return (
                ents.where(key_mod < frac_u).limit(2 * n_hot).withColumn("identity", flip)
            )
        hot = ents.where(F.col("key").startswith(hot_prefix))
        cold = (
            ents.where(~F.col("key").startswith(hot_prefix) & (key_mod < frac_c))
            .limit(n_hot)
        )
        return hot.unionByName(cold).withColumn("identity", flip)

    # partition-balance measurement: hash-shuffle each change set on
    # key (the diff/merge join distribution) and report max/mean rows
    shp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    for kind in ("uniform", "skewed"):
        cs = change_set(kind)
        rows = (
            cs.repartition(shp, "key")
            .withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
        counts = [r["count"] for r in rows]
        # mean over ALL shuffle partitions (empty ones included) — the
        # denominator the straggler argument actually uses
        mx, mean = max(counts), sum(counts) / shp
        print(
            f"{kind}: change_rows={sum(counts)} "
            f"nonempty={len(counts)}/{shp} "
            f"max/mean={mx / mean:.2f} (straggler threshold 4.0)",
            flush=True,
        )

    # wall-time A/B: same-size change sets, branch + commit + diff +
    # merge. Each arm merges into its OWN dest branched from the same
    # main snapshot — merging both into main would run the second arm
    # against a history fattened by the first (the ordering bias the
    # loadtest merge-contention mode also avoids).
    for kind in ("uniform", "skewed"):
        br, dest = f"chg-{kind}", f"dest-{kind}"
        repo.create_branch(br, "main")
        repo.create_branch(dest, "main")
        repo.stage_entries(br, change_set(kind))
        repo.commit(br, f"{kind} changes")
        t0 = time.time()
        d = repo.diff(dest, br).count()
        t_diff = time.time() - t0
        t0 = time.time()
        repo.merge(br, dest)
        t_merge = time.time() - t0
        print(f"{kind}: diff={t_diff:.1f}s ({d} rows) merge={t_merge:.1f}s", flush=True)

    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
