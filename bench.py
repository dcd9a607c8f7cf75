#!/usr/bin/env python
"""BENCH: headline engine operations at $SPARK_GRAFT_SF_DIR (default sf0.1).

Benchmarks follow BASELINE.md's B1-B7 definitions (derived from the
reference's design constants — ~50k entries/range, diff/merge cost
proportional to changed ranges, GC as set difference):

  b1_import_commit  ingest ~600k lineitem-derived entries -> ranges+manifest+commit
  b2_list           full prefix+delimiter listing of the committed ref
  b3_diff_small     diff two refs differing in ~1% of keys (changed-range scan only)
  b4_merge          3-way merge, disjoint ~1% change sets, 0 conflicts
  b5_conflicts      3-way merge with forced conflicts: exact conflict count + strategy=src merge
  b6_log_path       history filtered by 10 paths over dozens of commits (manifest-pruned)
  b7_gc_mark        mark over all addresses with ~10% orphans

Noise control: this host's bulk-I/O throughput swings 2-5x across hours
(README methodology), so a single sample can read 30% off with zero
code change. The whole B1-B7 scenario therefore runs
$SPARK_GRAFT_BENCH_REPEATS times (default 3) in ONE process against
fresh repos, and the reported per-query number is the per-query MEDIAN;
"queries_min" and "queries_all" ride along for dispersion reading.

Prints ONE JSON line: {"metric": ..., "value": total_of_medians,
"unit": "sec", "queries": {name: median_sec}, "queries_min": ...,
"queries_all": ..., "runs": N, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def derived_entries(spark):
    """~600k entries derived from lineitem (BASELINE B1 scale point).

    The raw scan is round-robin-repartitioned to the session's
    parallelism BELOW the md5 projections (guide §2.6): the testdata
    file is one row group = one split, so without this every per-row
    md5 ran on a single core inside b1's timed region. Same rows, same
    derivation, same timing methodology — only the parallelism of the
    derivation changes (core count still comes from the session, so
    the driver's low-core scaling runs measure what they measured).
    """
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").repartition(
        spark.sparkContext.defaultParallelism
    ).createOrReplaceTempView("bench_lineitem")
    return spark.sql(
        """
        select 'tables/lineitem/b' || (l_orderkey % 8) || '/'
               || lpad(cast(l_orderkey as string), 12, '0') || '-'
               || cast(l_linenumber as string) as key,
               md5('li|' || l_orderkey || '|' || l_linenumber || '|' || l_returnflag) as identity,
               'data/g1/' || md5('a|' || l_orderkey || '-' || l_linenumber) as address,
               'RELATIVE' as address_type,
               (l_orderkey % 997) * 100 + l_linenumber as size,
               md5('e|' || l_orderkey || '-' || l_linenumber) as etag,
               cast(null as timestamp) as last_modified,
               cast(null as map<string,string>) as metadata,
               'application/octet-stream' as content_type
        from bench_lineitem
        """
    )


def run_once(spark) -> dict[str, float]:
    """One full B1-B7 pass against a fresh repository."""
    from pyspark.sql import functions as F

    from lakefs_spark.storage.repo import ConflictError, Repository

    timings: dict[str, float] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *a):
                timings[name] = round(time.time() - self.t0, 3)

        return _T()

    root = tempfile.mkdtemp(prefix="lakebench_")
    try:
        # bench data prep OUT of b1/b7's timed regions (r10 verdict:
        # the lazy md5 derivation executed inside b1's timed region, so
        # ~half of b1 was the bench deriving its own input, not the
        # engine). The derivation is materialized once per pass to a
        # temp parquet — timed separately as b1_derive_entries so the
        # old b1 ~= b1_derive_entries + b1_import_commit remains
        # readable — and every consumer reads the materialized input.
        # See HARNESS_CHANGES.md (this is a measurement fix, not an
        # engine speedup; the derivation itself is unchanged).
        with timed("b1_derive_entries"):
            derived_entries(spark).write.mode("overwrite").parquet(
                f"{root}/bench_entries"
            )
        ents = spark.read.parquet(f"{root}/bench_entries")

        # B1: import + commit 600k entries
        repo = Repository.create(spark, root)
        if os.environ.get("SPARK_GRAFT_BENCH_OWNER") == "1":
            # A/B arm: the mostly-correct ownership lease around every
            # branch update (zero contention here — measures pure lease
            # overhead; see README ownership A/B row)
            from lakefs_spark.storage.ownership import MostlyCorrectOwner

            repo.owner = MostlyCorrectOwner(repo.store)
        with timed("b1_import_commit"):
            repo.import_entries("main", ents, message="bench import")

        # B2: full listing, delimiter fold + a paged prefix listing
        with timed("b2_list"):
            n_groups = repo.list_entries("main", prefix="tables/lineitem/", delimiter="/").count()
            n_page = repo.list_entries("main", prefix="tables/lineitem/b3/", limit=1000).count()
        assert n_groups == 8 and n_page == 1000, (n_groups, n_page)

        # setup for diff/merge: two branches with ~1% disjoint changes
        def salted(cond, salt):
            return (
                ents.where(cond)
                .withColumn("identity", F.md5(F.concat(F.col("identity"), F.lit(salt))))
            )

        key_mod = F.abs(F.xxhash64("key")) % 100
        repo.create_branch("left", "main")
        repo.stage_entries("left", salted(key_mod == 1, "L"))
        repo.commit("left", "left 1%")
        repo.create_branch("right", "main")
        repo.stage_entries("right", salted(key_mod == 2, "R"))
        repo.commit("right", "right 1%")

        # B3: diff main vs left (1% of keys differ)
        with timed("b3_diff_small"):
            n_diff = repo.diff("main", "left").count()
        assert n_diff > 0

        # B4: clean 3-way merge left -> right (disjoint changes)
        with timed("b4_merge"):
            repo.merge("left", "right")

        # B5: forced conflicts — both sides change key_mod==5 differently
        repo.create_branch("cleft", "main")
        repo.stage_entries("cleft", salted(key_mod == 5, "CL"))
        repo.commit("cleft", "conflict left")
        repo.create_branch("cright", "main")
        repo.stage_entries("cright", salted(key_mod == 5, "CR"))
        repo.commit("cright", "conflict right")
        with timed("b5_conflicts"):
            try:
                repo.merge("cleft", "cright")
                raise AssertionError("expected conflicts")
            except ConflictError as e:
                n_conf = e.conflicts.count()
            repo.merge("cleft", "cright", strategy="src")
        assert n_conf > 0

        # B6: path-filtered log over a series of commits
        paths = [r["key"] for r in ents.orderBy("key").limit(10).collect()]
        for i in range(12):
            repo.stage_entries(
                "main",
                ents.where(F.col("key") == paths[i % 10]).withColumn(
                    "identity", F.md5(F.concat(F.col("identity"), F.lit(f"h{i}")))
                ),
            )
            repo.commit("main", f"history {i}")
        with timed("b6_log_path"):
            hits = repo.log_with_paths("main", paths[:10])
        assert len(hits) > 0

        # B7: GC mark, ~10% orphans
        reachable = repo.reachable_addresses(repo.active_commits(7.0))
        # a real object-store listing has exactly one row per address
        orphans = (
            ents.where(key_mod < 10)
            .select(F.concat(F.lit("data/orphan/"), F.md5("key")).alias("address"))
            .distinct()
        )
        listing = reachable.unionByName(orphans)
        with timed("b7_gc_mark"):
            n_marked = repo.gc_mark(listing, 7.0).count()
        assert n_marked == orphans.count(), (n_marked,)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return timings


def _cpu_jiffies() -> list[int] | None:
    """Aggregate /proc/stat cpu counters (user..guest_nice)."""
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    except Exception:  # noqa: BLE001 — non-Linux or restricted /proc
        return None


def _host_cpu(before: list[int] | None, after: list[int] | None) -> dict:
    """Host CPU mix over the benched interval, from /proc/stat deltas.

    The load-bearing field is STEAL: this box is a hypervisor guest
    and cycles the host denies it register there. Round-10 bisection
    established that fixed pure-CPU work on this guest swings ~30%
    wall-clock while steal reads 8-11% of total CPU under load — so a
    bench whose steal_pct is materially non-zero ran CPU-starved, and
    its numbers must be compared against spreads, not point medians.
    """
    if not before or not after:
        return {}
    d = [y - x for x, y in zip(before, after)]
    tot = sum(d) or 1
    return {
        "user_pct": round(100 * d[0] / tot, 1),
        "system_pct": round(100 * d[2] / tot, 1),
        "idle_pct": round(100 * d[3] / tot, 1),
        "iowait_pct": round(100 * d[4] / tot, 1),
        "steal_pct": round(100 * d[7] / tot, 1) if len(d) > 7 else None,
    }


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from lakefs_spark.session import get_spark

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    spark = get_spark("bench")
    cpu_before = _cpu_jiffies()
    runs = [run_once(spark) for _ in range(repeats)]

    names = list(runs[0])
    med = {q: round(statistics.median(r[q] for r in runs), 3) for q in names}

    # noise-vs-regression is decidable from the JSON alone (VERDICT r7
    # #8): when any query's median moved >5% vs the latest committed
    # BENCH_r*.json, widen to a 5-run sample before reporting
    prev_file, prev_med = None, {}
    try:
        import glob

        cands = sorted(glob.glob(os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "BENCH_r*.json")))
        if cands:
            prev_file = os.path.basename(cands[-1])
            with open(cands[-1]) as f:
                prev = json.load(f)
            # the driver wraps bench.py's JSON line under "parsed"
            prev_med = (prev.get("parsed") or prev).get("queries") or {}
    except Exception:  # noqa: BLE001 — the bench must never die on history
        prev_file, prev_med = None, {}
    moved = [
        q for q in names
        if q in prev_med and prev_med[q] > 0
        and abs(med[q] - prev_med[q]) / prev_med[q] > 0.05
    ]
    if moved and len(runs) < 5:
        runs += [run_once(spark) for _ in range(5 - len(runs))]
        med = {q: round(statistics.median(r[q] for r in runs), 3) for q in names}
        # re-derive the verdict from the medians actually being shipped
        moved = [
            q for q in names
            if q in prev_med and prev_med[q] > 0
            and abs(med[q] - prev_med[q]) / prev_med[q] > 0.05
        ]

    mins = {q: round(min(r[q] for r in runs), 3) for q in names}
    total = round(sum(med.values()), 3)
    # peak PYTHON-driver RSS (ru_maxrss, kB on linux) — tracks the
    # manifest-plane memory claim round-over-round (VERDICT r6 #8); the
    # JVM heap is capped separately by spark.driver.memory
    import resource

    rss_gb = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
    )
    print(
        json.dumps(
            {
                "metric": "lakefs_spark headline ops (B1-B7)",
                "value": total,
                "unit": "sec",
                "queries": med,
                "queries_min": mins,
                "queries_all": {q: [r[q] for r in runs] for q in names},
                "spread": {
                    q: [min(r[q] for r in runs), max(r[q] for r in runs)]
                    for q in names
                },
                "moved_gt_5pct_vs_prev": moved,
                "prev_bench": prev_file,
                "runs": len(runs),
                "driver_rss_gb": rss_gb,
                "host_cpu": _host_cpu(cpu_before, _cpu_jiffies()),
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
