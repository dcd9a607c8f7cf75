"""Child process for the two-OS-process commit/merge race test.

Invoked by tests/test_store.py::test_two_process_merge_race_over_s3 as
``python tests/_race_child.py <endpoint> <bucket> <root> <name> <rounds>``.

Each child owns its feature branch, commits local work there, and races
its merges into ``main`` against the sibling process through ONE
FakeS3Server endpoint — the full commit protocol (seal -> apply ->
If-Match pointer CAS) across real process boundaries, no shared memory,
no POSIX lock. Reference: pkg/graveler/graveler.go:2422-2475
(retryBranchUpdate) exercised cross-process.

Prints one JSON line: {"name": ..., "merged": [commit ids in order]}.
Exit code 0 = all rounds merged.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    endpoint, bucket, root, name, rounds = (
        sys.argv[1],
        sys.argv[2],
        sys.argv[3],
        sys.argv[4],
        int(sys.argv[5]),
    )
    os.environ["SPARK_GRAFT_CPUS"] = "4"
    from lakefs_spark.session import get_spark
    from lakefs_spark.storage.repo import BranchChangedError, Repository
    from lakefs_spark.storage.store_s3 import S3ConditionalStore

    spark = get_spark(f"race-child-{name}")
    store = S3ConditionalStore(endpoint, bucket, local_blob_root=root)
    # every child weathers >=2 injected ConditionalRequestConflicts
    # mid-protocol (deterministic client-armed X-Inject-409) — the 409
    # ambiguity re-read path runs cross-process, not just in-thread
    store.inject_conflicts = 2
    repo = Repository.open(spark, root, store=store)
    branch = f"feat-{name}"
    repo.create_branch(branch, "main")

    merged = []
    for i in range(rounds):
        key = f"{name}/k{i}"
        from lakefs_spark.schema import ENTRY_SCHEMA

        df = spark.createDataFrame(
            [
                (
                    key,
                    f"id-{name}-{i}",
                    f"s3://bucket/{key}",
                    "FULL",
                    1,
                    "e",
                    None,
                    None,
                    "text/plain",
                )
            ],
            ENTRY_SCHEMA,
        )
        repo.stage_entries(branch, df)
        repo.commit(branch, f"{name} round {i}")
        # outer retry: the in-engine bounded retry
        # (BRANCH_UPDATE_MAX_TRIES) can exhaust when the sibling lands
        # several commits during our recomputes — a legitimate client
        # simply re-issues the merge, which is what we assert here:
        # progress without lost updates, not zero contention.
        for _attempt in range(8):
            try:
                mc = repo.merge(branch, "main")
                merged.append(mc.commit_id)
                break
            except BranchChangedError:
                continue
        else:
            print(json.dumps({"name": name, "error": "merge retries exhausted"}))
            return 2
    print(
        json.dumps(
            {
                "name": name,
                "merged": merged,
                "injected_409s_weathered": store.conflict_409_seen,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
