#!/usr/bin/env python
"""Profile GC-mark plan shapes at scale (VERDICT r4 'What's wrong #3':
the mark curve bends superlinear past 100x — find which part and
whether a single-aggregation set-difference beats the two anti-joins).

Synthetic inputs mimic the real 100x shape: committed addresses arrive
DUPLICATED (every active snapshot repeats the addresses it shares with
its ancestors — the raw range-scan output), listing = reachable +
orphans.

Usage: python tools/profile_gc.py [N_DISTINCT] [DUP_FACTOR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    dup = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from lakefs_spark.session import get_spark

    spark = get_spark("profile_gc")

    # committed: n distinct addresses, each appearing `dup` times
    committed_raw = (
        spark.range(0, n * dup, 1, 64)
        .select(F.concat(F.lit("data/g1/"), F.md5((F.col("id") % n).cast("string"))).alias("address"))
    )
    # listing: all n reachable + 10% orphans
    listing = (
        spark.range(0, n + n // 10, 1, 64)
        .select(
            F.when(
                F.col("id") < n,
                F.concat(F.lit("data/g1/"), F.md5(F.col("id").cast("string"))),
            )
            .otherwise(F.concat(F.lit("data/orphan/"), F.md5(F.col("id").cast("string"))))
            .alias("address")
        )
    )

    def timed(tag, df):
        t0 = time.time()
        out = df.count()
        print(f"{tag}: {round(time.time() - t0, 1)}s rows={out}", flush=True)

    # shape A (current engine): distinct committed, then left-anti
    from lakefs_spark.operators.gc import committed_addresses, gc_mark

    timed("A_anti_join_with_distinct", gc_mark(listing, committed_addresses(committed_raw)))

    # shape B: anti-join against the RAW (duplicated) committed side
    timed("B_anti_join_no_distinct", gc_mark(listing, committed_raw))

    # shape C: single aggregation — union-all + groupBy(address) max(tag)
    u = listing.select("address", F.lit(1).alias("m")).unionAll(
        committed_raw.select("address", F.lit(2).alias("m"))
    )
    timed(
        "C_single_agg",
        u.groupBy("address").agg(F.max("m").alias("mx")).where(F.col("mx") == 1),
    )


if __name__ == "__main__":
    main()
