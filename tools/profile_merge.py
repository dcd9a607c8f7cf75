#!/usr/bin/env python
"""Decompose the merge-random-1% worst case (VERDICT r4 'What's wrong
#4' / next-round #7): when every range is touched, where does the time
go — the overlay shuffle, or the unavoidable range rewrite?

Measures, at REPLICAS x bench scale:
  a) pure rewrite lower bound: write_ranges over the merged row set,
     pre-chunked (no overlay window) — the cost ANY design pays to
     re-materialize every touched range, including a hypothetical
     sub-range COW that re-encodes parquet around the edits;
  b) the engine's actual commit-apply (overlay window + rechunk +
     write) applying a 1% random change stream onto the base.

If (b) - (a) is small, range granularity is already near-optimal for
this workload and a sub-range scheme could only win by NOT re-encoding
unchanged bytes — which parquet does not offer below the row-group
level, and our ranges are single-row-group files by design (3-5 MB).

Usage: python tools/profile_merge.py [REPLICAS]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from lakefs_spark.session import get_spark
    from lakefs_spark.storage import ranges as R
    from lakefs_spark.storage.commit_apply import apply_changes
    from lakefs_spark.plans.chunker import assign_chunks
    from lakefs_spark.schema import ENTRY_COLS

    spark = get_spark("profile_merge")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").repartition(64)
    li.createOrReplaceTempView("li")
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
    print(f"rows: {ents.count()}", flush=True)
    root = tempfile.mkdtemp(prefix="lakeprof_")
    try:
        base_manifest = R.write_ranges(ents.select(*ENTRY_COLS), root)
        print(f"base ranges: {len(base_manifest)}", flush=True)

        # (a) pure rewrite lower bound: chunk assignment + write, no
        # overlay window — the change stream is already folded in
        changed = ents.withColumn(
            "identity",
            F.when(
                F.abs(F.xxhash64("key")) % 100 == 1,
                F.md5(F.concat("identity", F.lit("C"))),
            ).otherwise(F.col("identity")),
        )
        t0 = time.time()
        chunked = assign_chunks(changed.select(*ENTRY_COLS), "key", 50000)
        mf = R.write_ranges_prechunked(chunked, root)
        t_rewrite = round(time.time() - t0, 1)
        print(f"a_pure_rewrite_s: {t_rewrite} (ranges={len(mf)})", flush=True)

        # (b) the engine's COW apply of the 1% change stream
        changes = (
            ents.where(F.abs(F.xxhash64("key")) % 100 == 1)
            .withColumn("identity", F.md5(F.concat("identity", F.lit("C"))))
            .select(F.lit(False).alias("is_tombstone"), *ENTRY_COLS)
        )
        t0 = time.time()
        mf2 = apply_changes(spark, root, base_manifest, changes, 50000)
        t_apply = round(time.time() - t0, 1)
        print(f"b_commit_apply_s: {t_apply} (ranges={len(mf2)})", flush=True)
        print(
            f"overlay_overhead_s: {round(t_apply - t_rewrite, 1)} "
            f"({round(100 * (t_apply - t_rewrite) / max(t_apply, 1e-9))}% of apply)",
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
