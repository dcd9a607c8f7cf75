"""Metadata-store contract + CAS protocol tests.

The shape of the reference's shared KV driver suite (pkg/kv/kvtest):
every Store implementation must pass the same contract, and the commit
protocol must show exactly-one-winner semantics over the conditional
PUT alone — no POSIX locking above the interface.
"""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from lakefs_spark.storage.repo import (
    BranchChangedError,
    Repository,
)
from lakefs_spark.storage.store import (
    CASConflictError,
    LocalStore,
    MemStore,
    Store,
)
from lakefs_spark.storage.store_s3 import FakeS3Server, S3ConditionalStore


@pytest.fixture(scope="module")
def s3_server():
    with FakeS3Server() as srv:
        yield srv


@pytest.fixture(params=["local", "mem", "s3"])
def store(request, tmp_path) -> Store:
    root = str(tmp_path / "store")
    if request.param == "local":
        return LocalStore(root)
    if request.param == "mem":
        return MemStore(root)
    srv = request.getfixturevalue("s3_server")
    # fresh bucket per test: same isolation a tmp_path gives the others
    bucket = f"b-{tmp_path.name.lower()}"
    return S3ConditionalStore(srv.endpoint, bucket)


# -- contract (every driver must pass — pkg/kv/kvtest role) ---------------


def test_get_missing_is_none(store):
    assert store.get_doc("refs/branches/nope") is None
    assert not store.doc_exists("refs/branches/nope")


def test_put_get_roundtrip_and_version_changes(store):
    v1 = store.put_doc("refs/branches/main", {"head": None, "staging_seq": 0})
    doc, ver = store.get_doc("refs/branches/main")
    assert doc == {"head": None, "staging_seq": 0}
    assert ver == v1
    v2 = store.put_doc("refs/branches/main", {"head": "c1", "staging_seq": 0})
    assert v2 != v1
    assert store.get_doc("refs/branches/main")[0]["head"] == "c1"


def test_put_if_absent_then_conflict(store):
    store.put_doc_if("refs/tags/v1", {"commit_id": "c9"}, None)
    with pytest.raises(CASConflictError):
        store.put_doc_if("refs/tags/v1", {"commit_id": "c8"}, None)
    assert store.get_doc("refs/tags/v1")[0]["commit_id"] == "c9"


def test_put_if_version_match_and_mismatch(store):
    v1 = store.put_doc("k", {"n": 1})
    v2 = store.put_doc_if("k", {"n": 2}, v1)
    assert store.get_doc("k")[0]["n"] == 2
    with pytest.raises(CASConflictError):  # stale token
        store.put_doc_if("k", {"n": 3}, v1)
    store.put_doc_if("k", {"n": 3}, v2)
    assert store.get_doc("k")[0]["n"] == 3


def test_put_if_on_missing_doc_fails(store):
    with pytest.raises(CASConflictError):
        store.put_doc_if("missing", {"n": 1}, "some-version")


def test_delete_and_list(store):
    for name in ("b", "a", "c"):
        store.put_doc(f"refs/branches/{name}", {"head": None})
    store.put_doc("refs/tags/t", {"commit_id": "c"})
    assert store.list_docs("refs/branches/") == [
        "refs/branches/a",
        "refs/branches/b",
        "refs/branches/c",
    ]
    store.delete_doc("refs/branches/b")
    assert store.list_docs("refs/branches/") == [
        "refs/branches/a",
        "refs/branches/c",
    ]
    with pytest.raises(FileNotFoundError):
        store.delete_doc("refs/branches/b")


def test_list_docs_is_plain_string_prefix_over_nested_keys(store):
    """The listing contract is MemStore's: every key under the string
    prefix, including keys whose tail contains '/' (nested store
    layout). A one-level lister hides such docs — which turned a
    slash-named branch's commits into GC-unreachable garbage."""
    store.put_doc("settings/a", {"v": 1})
    store.put_doc("settings/a/b", {"v": 2})
    store.put_doc("settings/a/b/c", {"v": 3})
    store.put_doc("settings2/x", {"v": 4})
    assert store.list_docs("settings/") == [
        "settings/a",
        "settings/a/b",
        "settings/a/b/c",
    ]
    # partial-component prefixes match by string, not by directory
    assert store.list_docs("settings/a/") == ["settings/a/b", "settings/a/b/c"]
    assert store.list_docs("settings") == [
        "settings/a",
        "settings/a/b",
        "settings/a/b/c",
        "settings2/x",
    ]


def test_line_log_append_read_replace(store):
    assert store.read_lines("runs") == []
    store.append_line("runs", '{"a":1}')
    store.append_line("runs", '{"a":2}')
    assert store.read_lines("runs") == ['{"a":1}', '{"a":2}']
    store.replace_lines("runs", ['{"a":2}'])
    assert store.read_lines("runs") == ['{"a":2}']


def test_blob_publish_if_absent(store, tmp_path):
    src1 = tmp_path / "blob1"
    src1.write_bytes(b"content")
    store.publish_blob(str(src1), "ranges/r1.parquet")
    assert store.blob_exists("ranges/r1.parquet")
    # re-publish of the same address keeps the original, consumes src
    src2 = tmp_path / "blob2"
    src2.write_bytes(b"content")
    store.publish_blob(str(src2), "ranges/r1.parquet")
    assert not src2.exists()
    assert store.list_blobs("ranges") == ["r1.parquet"]


# -- exactly-one-winner CAS rounds ----------------------------------------


def test_exactly_one_winner_per_cas_round(store):
    """N writers CAS from the same observed version: exactly one must
    win each round, for as many rounds as writers (the property the
    whole commit protocol rests on — kv SetIf / S3 If-Match)."""
    key = "refs/branches/main"
    store.put_doc("refs/branches/main", {"head": None, "staging_seq": 0})
    n = 8
    for rnd in range(n):
        _, ver = store.get_doc(key)
        outcomes: list[bool] = [None] * n
        barrier = threading.Barrier(n)

        def attempt(i):
            barrier.wait()
            try:
                store.put_doc_if(key, {"head": f"r{rnd}w{i}", "staging_seq": 0}, ver)
                outcomes[i] = True
            except CASConflictError:
                outcomes[i] = False

        threads = [threading.Thread(target=attempt, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sum(outcomes) == 1, f"round {rnd}: {sum(outcomes)} winners"


# -- the commit protocol over the fake object store ------------------------


def _mk_entries(spark, keys):
    rows = [
        (k, f"id-{k}", f"s3://bucket/{k}", "FULL", 1, "e", None, None, "text/plain")
        for k in keys
    ]
    from lakefs_spark.schema import ENTRY_SCHEMA

    return spark.createDataFrame(rows, ENTRY_SCHEMA)


def test_repo_lifecycle_over_mem_store(spark, tmp_path):
    """All repository metadata ops must route through the Store: with a
    MemStore there are no JSON files on disk, so any residual direct
    filesystem access would crash here."""
    root = str(tmp_path / "repo")
    mem = MemStore(root)
    repo = Repository.create(spark, root, store=mem)
    assert repo.default_branch == "main"
    repo.stage_entries("main", _mk_entries(spark, ["a/1", "a/2", "b/1"]))
    c1 = repo.commit("main", "c1")
    repo.create_branch("dev", "main")
    repo.stage_entries("dev", _mk_entries(spark, ["b/2"]))
    repo.commit("dev", "c2")
    repo.create_tag("v1", "main")
    merge_commit = repo.merge("dev", "main")
    # a second Repository over the SAME store sees everything
    repo2 = Repository.open(spark, root, store=mem)
    assert repo2.branches()["main"] == merge_commit.commit_id
    assert repo2.tags() == {"v1": c1.commit_id}
    keys = [r["key"] for r in repo2.list_entries("main").collect()]
    assert keys == ["a/1", "a/2", "b/1", "b/2"]
    assert [c.commit_id for c in repo2.log("main")][0] == merge_commit.commit_id
    # no metadata leaked to the filesystem (blobs + staging only)
    import os

    on_disk = set(os.listdir(root))
    assert "repo.json" not in on_disk and "refs" not in on_disk and "commits" not in on_disk


def test_repo_lifecycle_over_s3_store(spark, tmp_path, s3_server):
    """The full commit protocol over the S3 conditional-PUT driver:
    metadata rides loopback HTTP CAS (If-Match / If-None-Match), blobs
    stay on a Spark-readable filesystem (the reference's KV + block
    split). No JSON metadata may touch the local root."""
    root = str(tmp_path / "repo")
    s3 = S3ConditionalStore(
        s3_server.endpoint, "repo-bucket", key_prefix="tenant/x",
        local_blob_root=root,
    )
    repo = Repository.create(spark, root, store=s3)
    repo.stage_entries("main", _mk_entries(spark, ["a/1", "a/2", "b/1"]))
    c1 = repo.commit("main", "c1")
    repo.create_branch("dev", "main")
    repo.stage_entries("dev", _mk_entries(spark, ["b/2"]))
    repo.commit("dev", "c2")
    repo.create_tag("v1", "main")
    merge_commit = repo.merge("dev", "main")
    repo2 = Repository.open(spark, root, store=s3)
    assert repo2.branches()["main"] == merge_commit.commit_id
    assert repo2.tags() == {"v1": c1.commit_id}
    keys = [r["key"] for r in repo2.list_entries("main").collect()]
    assert keys == ["a/1", "a/2", "b/1", "b/2"]
    import os

    on_disk = set(os.listdir(root))
    assert "repo.json" not in on_disk and "refs" not in on_disk and "commits" not in on_disk


def test_s3_idempotent_requests_retry_transient_500s(tmp_path, s3_server):
    """GET/HEAD retry transient 5xx (bounded); two injected 500s must
    not surface to the caller. Conditional PUT never blind-retries —
    replaying a won If-Match round would misread its own write as a
    lost race."""
    store = S3ConditionalStore(s3_server.endpoint, f"rt-{tmp_path.name.lower()}")
    store.put_doc("k", {"n": 1})
    s3_server.inject_500(2)
    doc, _ = store.get_doc("k")
    assert doc == {"n": 1}
    s3_server.inject_500(3)  # exceeds the retry budget -> surfaced
    from lakefs_spark.storage.store_s3 import S3StoreError

    with pytest.raises(S3StoreError):
        store.get_doc("k")
    assert store.get_doc("k")[0] == {"n": 1}  # budget reset, healthy again


def test_s3_publish_blob_409_concurrent_winner_aborted(tmp_path, s3_server):
    """HTTP 409 (ConditionalRequestConflict) means the outcome is
    UNKNOWN — if the concurrent conditional writer aborted, nothing
    exists yet, and treating 409 as 'already there' would delete the
    only copy. The driver must HEAD + retry the PUT until the object
    provably exists (pkg/block/s3 conditional-write semantics)."""
    store = S3ConditionalStore(s3_server.endpoint, f"c409a-{tmp_path.name.lower()}")
    src = tmp_path / "blob"
    src.write_bytes(b"payload")
    s3_server.inject_409(2, concurrent_writer_wins=False)
    store.publish_blob(str(src), "ranges/r1.parquet")
    assert store.blob_exists("ranges/r1.parquet")
    assert not src.exists()


def test_s3_publish_blob_409_concurrent_winner_landed(tmp_path, s3_server):
    """When the phantom concurrent writer DID land the object, the
    post-409 HEAD finds it and the publish resolves without another
    PUT round (content-addressed: same bytes either way)."""
    store = S3ConditionalStore(s3_server.endpoint, f"c409b-{tmp_path.name.lower()}")
    src = tmp_path / "blob"
    src.write_bytes(b"payload")
    s3_server.inject_409(1, concurrent_writer_wins=True)
    store.publish_blob(str(src), "ranges/r1.parquet")
    assert store.blob_exists("ranges/r1.parquet")
    assert not src.exists()


def test_s3_publish_blob_409_budget_exhausted_keeps_local(tmp_path, s3_server):
    """If 409s persist past the retry budget the local copy must be
    RETAINED (never silently lost) and the error surfaced."""
    from lakefs_spark.storage.store_s3 import S3StoreError

    store = S3ConditionalStore(s3_server.endpoint, f"c409c-{tmp_path.name.lower()}")
    src = tmp_path / "blob"
    src.write_bytes(b"payload")
    s3_server.inject_409(store.cas_retries + 1, concurrent_writer_wins=False)
    with pytest.raises(S3StoreError):
        store.publish_blob(str(src), "ranges/r1.parquet")
    assert src.exists()  # nothing lost; caller can retry
    s3_server.inject_409(0)
    store.publish_blob(str(src), "ranges/r1.parquet")
    assert store.blob_exists("ranges/r1.parquet")


def test_s3_list_docs_paginates_continuation_tokens(tmp_path, s3_server):
    """A listing larger than one page must walk NextContinuationToken
    to the end — a 10⁶-commit repo never fits one response."""
    store = S3ConditionalStore(
        s3_server.endpoint, f"pg-{tmp_path.name.lower()}", list_page_size=3
    )
    want = [f"commits/c{i:03d}" for i in range(10)]
    for k in want:
        store.put_doc(k, {"i": k})
    assert store.list_docs("commits/") == want


def test_concurrent_merges_exactly_one_cas_winner_per_round(spark, tmp_path):
    """Two Repository instances over one shared MemStore race merges
    into the same destination branch: the conditional PUT lets exactly
    one head swap win per round; the loser observes BranchChangedError
    and its bounded retry recomputes the 3-way diffs on the winner's
    head — BOTH merges land (graveler.go:2422-2475 retryBranchUpdate,
    driven end-to-end with no POSIX lock anywhere)."""
    root = str(tmp_path / "repo")
    mem = MemStore(root)
    repo_a = Repository.create(spark, root, store=mem)
    repo_b = Repository.open(spark, root, store=mem)
    repo_a.stage_entries("main", _mk_entries(spark, ["seed"]))
    repo_a.commit("main", "seed")
    for repo, name in ((repo_a, "feat-a"), (repo_b, "feat-b")):
        repo.create_branch(name, "main")
        repo.stage_entries(name, _mk_entries(spark, [f"from-{name}"]))
        repo.commit(name, f"work on {name}")

    results: dict[str, object] = {}
    barrier = threading.Barrier(2)

    def merger(name, repo, src):
        barrier.wait()
        try:
            results[name] = repo.merge(src, "main")
        except Exception as e:  # noqa: BLE001 — record for assertion
            results[name] = e

    ta = threading.Thread(target=merger, args=("a", repo_a, "feat-a"))
    tb = threading.Thread(target=merger, args=("b", repo_b, "feat-b"))
    ta.start(), tb.start()
    ta.join(), tb.join()

    oks = [r for r in results.values() if not isinstance(r, Exception)]
    assert len(oks) == 2, f"both merges should land via retry: {results}"
    keys = {r["key"] for r in repo_a.list_entries("main").collect()}
    assert {"from-feat-a", "from-feat-b", "seed"} <= keys
    # two distinct merge commits on top of seed
    heads = {c.commit_id for c in oks}
    assert len(heads) == 2
    assert repo_a._read_branch("main")["head"] in heads


def test_direct_cas_round_single_winner_two_repos(spark, tmp_path):
    """The raw branch CAS (not the full commit flow): two repos CAS
    from the same observed head; one wins, one gets BranchChangedError."""
    root = str(tmp_path / "repo")
    mem = MemStore(root)
    repo_a = Repository.create(spark, root, store=mem)
    repo_b = Repository.open(spark, root, store=mem)
    head = repo_a._read_branch("main")["head"]

    wins, losses = [], []
    barrier = threading.Barrier(2)

    def cas(repo, tag):
        barrier.wait()
        try:
            repo._cas_update("main", head, {"head": f"new-{tag}"})
            wins.append(tag)
        except BranchChangedError:
            losses.append(tag)

    ts = [
        threading.Thread(target=cas, args=(repo_a, "a")),
        threading.Thread(target=cas, args=(repo_b, "b")),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(wins) == 1 and len(losses) == 1, (wins, losses)


def test_cas_merges_over_concurrent_seq_bump(spark, tmp_path):
    """A staging_seq bump between a committer's read and its head CAS
    must not be lost and must not abort the commit: the conditional
    PUT fails, the merge loop re-reads, and both fields land."""
    root = str(tmp_path / "repo")
    mem = MemStore(root)
    repo = Repository.create(spark, root, store=mem)
    st, _ = repo._get_branch("main")

    bumped = threading.Event()
    orig_put_if = mem.put_doc_if
    calls = {"n": 0}

    def tripping_put_if(key, doc, ver):
        # first head-swap attempt: sneak a seq bump in underneath
        if key == "refs/branches/main" and doc.get("head") == "h1" and calls["n"] == 0:
            calls["n"] += 1
            if not bumped.is_set():
                repo._next_seq("main")
                bumped.set()
            # ver is now stale -> this call must raise, loop re-merges
        return orig_put_if(key, doc, ver)

    mem.put_doc_if = tripping_put_if
    try:
        repo._cas_update("main", st["head"], {"head": "h1"})
    finally:
        mem.put_doc_if = orig_put_if
    final = repo._read_branch("main")
    assert final["head"] == "h1"
    assert final["staging_seq"] == st["staging_seq"] + 1  # bump preserved


def test_settings_manager_cas_and_update(spark):
    """Repository-level settings (pkg/graveler/settings/manager.go):
    GetLatest returns a version token, conditional Save CAS-fails on a
    moved setting, and the Update retry loop makes concurrent
    read-modify-write adds both land."""
    import tempfile

    from lakefs_spark.storage.repo import Repository
    from lakefs_spark.storage.store import CASConflictError

    repo = Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_set_"))
    assert repo.get_setting("gc_policy") is None
    repo.save_setting("gc_policy", {"days": 7})
    val, tok = repo.get_setting_latest("gc_policy")
    assert val == {"days": 7}

    repo.save_setting("gc_policy", {"days": 14}, last_known=tok)
    with pytest.raises(CASConflictError):
        repo.save_setting("gc_policy", {"days": 30}, last_known=tok)  # stale token
    assert repo.get_setting("gc_policy") == {"days": 14}

    # interleaved update loop: simulate a racer by mutating inside fn
    calls = {"n": 0}

    def bump(cur):
        if calls["n"] == 0:
            # another writer lands between our read and our CAS
            v, t = repo.get_setting_latest("counter") or (None, None)
            if t is None:
                repo.save_setting("counter", {"n": 100})
            else:
                repo.save_setting("counter", {"n": cur["n"] + 100}, last_known=t)
        calls["n"] += 1
        return {"n": ((cur or {"n": 0})["n"]) + 1}

    got = repo.update_setting("counter", bump, default={"n": 0})
    assert got == {"n": 101}  # retried over the racer's write, both landed


def test_protection_rules_on_settings_store(spark):
    import tempfile

    from lakefs_spark.storage.repo import Repository, ProtectedBranchError

    repo = Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_prot_"))
    repo.protect_branch("rel-*", blocked=("commit",))
    repo.protect_branch("main")
    assert len(repo.protection_rules()) == 2
    assert repo.get_setting("protected_branches")["rules"][0]["pattern"] == "rel-*"
    repo.create_branch("rel-1", "main")
    repo.set_entry("rel-1", {"key": "k", "identity": "i", "size": 1, "etag": "e"})
    with pytest.raises(ProtectedBranchError):
        repo.commit("rel-1", "nope")


def test_protect_branch_legacy_migration_race(spark):
    """Two concurrent migrators: the loser's delete of the legacy
    'protected_branches' doc (already removed by the winner) must not
    fail an otherwise-successful rule add — the settings merge is
    idempotent via the dedup set."""
    import tempfile

    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_protrace_"))
    legacy = {"rules": [{"pattern": "rel-*", "blocked": ["commit"]}]}
    repo.store.put_doc("protected_branches", legacy)

    orig_delete = repo.store.delete_doc

    def losing_delete(key):
        orig_delete(key)  # the winner's delete lands first...
        raise FileNotFoundError(key)  # ...so ours finds nothing

    repo.store.delete_doc = losing_delete
    try:
        repo.protect_branch("main")  # must not raise
    finally:
        repo.store.delete_doc = orig_delete
    pats = sorted(r["pattern"] for r in repo.protection_rules())
    assert pats == ["main", "rel-*"]  # legacy rule migrated once, new rule added


def test_two_process_merge_race_over_s3(spark, tmp_path, s3_server):
    """Two real OS processes (own JVMs, own SparkSessions, no shared
    memory) race merges into one repo's main through ONE FakeS3Server
    endpoint — the full seal->apply->If-Match-CAS commit protocol
    across process boundaries. The thread-based tests above prove the
    store primitive; this proves the whole stack: every merge either
    lands and is visible at the final head, or surfaces an error —
    nothing is silently lost (graveler.go:2422-2475)."""
    import json
    import subprocess
    import sys as _sys

    root = str(tmp_path / "repo")
    bucket = f"race-{tmp_path.name.lower()}"
    s3 = S3ConditionalStore(s3_server.endpoint, bucket, local_blob_root=root)
    repo = Repository.create(spark, root, store=s3)
    repo.stage_entries("main", _mk_entries(spark, ["seed"]))
    repo.commit("main", "seed")

    rounds = 2
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo_dir, "tests", "_race_child.py")
    env = dict(os.environ, PYTHONPATH=repo_dir, SPARK_DRIVER_MEMORY="2g")
    procs = {
        name: subprocess.Popen(
            [_sys.executable, child, s3_server.endpoint, bucket, root, name, str(rounds)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=repo_dir,
            text=True,
        )
        for name in ("alpha", "beta")
    }
    results = {}
    for name, p in procs.items():
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"{name} rc={p.returncode}\n{out}\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        results[name] = json.loads(line)

    # no lost updates: every merge commit a child reported is on main's
    # log, and every child key is visible at the final head
    log_ids = {c.commit_id for c in repo.log("main")}
    for name, res in results.items():
        assert len(res["merged"]) == rounds, res
        # each child ARMED 2 client-side X-Inject-409 faults — the 409
        # ambiguity re-read path ran end-to-end in every process, and
        # the exactly-one-winner invariants below still hold
        assert res["injected_409s_weathered"] >= 2, res
        for cid in res["merged"]:
            assert cid in log_ids, f"{name} merge {cid} missing from main log"
    keys = {r["key"] for r in repo.list_entries("main").collect()}
    want = {f"{n}/k{i}" for n in ("alpha", "beta") for i in range(rounds)}
    assert want <= keys, f"missing keys: {want - keys}"
    # 1 seed + 2*rounds merge commits + the initial empty head's absence
    assert len(log_ids) >= 1 + 2 * rounds


def test_chunked_log_appends_cross_client_and_legacy(tmp_path, s3_server):
    """append_line is O(1) bytes per append (one If-None-Match segment
    per line): two CLIENTS interleave appends without rewriting the
    log; a pre-chunking legacy single-object log keeps reading in
    front; replace_lines collapses everything back."""
    bucket = f"log-{tmp_path.name.lower()}"
    a = S3ConditionalStore(s3_server.endpoint, bucket)
    b = S3ConditionalStore(s3_server.endpoint, bucket)

    # legacy head object written the old way
    a.replace_lines("runs", ["legacy-1", "legacy-2"])

    for i in range(5):
        (a if i % 2 == 0 else b).append_line("runs", f"seg-{i}")
    got = a.read_lines("runs")
    assert got[:2] == ["legacy-1", "legacy-2"]
    assert sorted(got[2:]) == [f"seg-{i}" for i in range(5)]
    # cross-client monotone order: a's appends appear in a's order,
    # b's in b's (segment numbers are claimed, never reused)
    assert [x for x in got if x in ("seg-0", "seg-2", "seg-4")] == [
        "seg-0", "seg-2", "seg-4"
    ]
    assert [x for x in got if x in ("seg-1", "seg-3")] == ["seg-1", "seg-3"]

    # stale hint: b doesn't know a appended; its next append must
    # survive the lost If-None-Match round
    a.append_line("runs", "after-a")
    b.append_line("runs", "after-b")
    got2 = a.read_lines("runs")
    assert got2.index("after-a") < got2.index("after-b")

    # TTL-style rewrite drops segments and keeps only survivors
    kept = [ln for ln in got2 if ln.startswith("seg-")]
    a.replace_lines("runs", kept)
    assert b.read_lines("runs") == kept
    # appends keep working after the collapse
    b.append_line("runs", "post-collapse")
    assert a.read_lines("runs")[-1] == "post-collapse"


def test_chunked_log_stale_hint_jumps_to_tail(tmp_path, s3_server):
    """A hint stale by MORE than cas_retries segments must cost one
    listing, not permanent append failure (code-review r8 finding)."""
    bucket = f"hint-{tmp_path.name.lower()}"
    a = S3ConditionalStore(s3_server.endpoint, bucket, cas_retries=4)
    b = S3ConditionalStore(s3_server.endpoint, bucket, cas_retries=4)
    a.append_line("tasks", "a-0")  # a's hint -> 1
    for i in range(10):  # far beyond a's retry budget from seq 1
        b.append_line("tasks", f"b-{i}")
    a.append_line("tasks", "a-1")  # must relist-jump, not exhaust
    got = a.read_lines("tasks")
    assert got[0] == "a-0" and got[-1] == "a-1" and len(got) == 12
