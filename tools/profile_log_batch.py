"""Job-count profile for the batched annotate / log-with-paths probes.

VERDICT r5 #5: one Spark job per commit step means 10^4-commit
histories pay 10^4 job overheads even when manifest pruning leaves
nothing to read. The batched rewrites tag keys by log position and run
one union-diff (annotate) or one pruned identity scan (log_with_paths)
per ROUND. This tool builds a deep-history fixture and counts actual
Spark jobs per variant via the status tracker.

Run: python tools/profile_log_batch.py [n_commits]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "16")

from lakefs_spark.session import get_spark  # noqa: E402
from lakefs_spark.storage.repo import Repository  # noqa: E402


def _jobs_in(spark, group: str, fn):
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    t0 = time.time()
    result = fn()
    dt = time.time() - t0
    sc.setJobGroup("other", "other")
    n = len(sc.statusTracker().getJobIdsForGroup(group))
    return n, dt, result


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    spark = get_spark("profile_log_batch", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="lakefs_logprof_")
    repo = Repository.create(spark, root)

    # deep history: every commit rewrites one hot key (so every step is
    # a probe candidate for it) plus its own cold key
    for i in range(n_commits):
        repo.set_entry("main", {"key": "hot/k", "identity": f"h{i}", "size": 1, "etag": f"h{i}"})
        repo.set_entry("main", {"key": f"cold/k{i:04d}", "identity": f"c{i}", "size": 1, "etag": f"c{i}"})
        repo.commit("main", f"c{i}")

    results = {}
    for label, fn in [
        ("annotate_batch1", lambda: repo.annotate("main", batch=1).count()),
        ("annotate_batch16", lambda: repo.annotate("main", batch=16).count()),
        ("log_paths_batch1", lambda: len(repo.log_with_paths("main", ["hot/k"], probe_batch=1))),
        ("log_paths_batch32", lambda: len(repo.log_with_paths("main", ["hot/k"], probe_batch=32))),
    ]:
        n, dt, res = _jobs_in(spark, label, fn)
        results[label] = (n, dt, res)
        print(f"{label:20s} jobs={n:5d}  wall={dt:7.1f}s  result={res}")

    a1, a16 = results["annotate_batch1"][0], results["annotate_batch16"][0]
    l1, l32 = results["log_paths_batch1"][0], results["log_paths_batch32"][0]
    assert results["annotate_batch1"][2] == results["annotate_batch16"][2]
    assert results["log_paths_batch1"][2] == results["log_paths_batch32"][2]
    print(f"annotate job reduction: {a1}/{a16} = {a1 / max(a16, 1):.1f}x")
    print(f"log_with_paths job reduction: {l1}/{l32} = {l1 / max(l32, 1):.1f}x")


if __name__ == "__main__":
    main()
