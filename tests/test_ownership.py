"""Mostly-correct ownership (pkg/distributed/mc_owner.go analog):
advisory leases over the Store's conditional PUT that serialize hot
critical sections across processes WITHOUT ever becoming a
correctness dependency."""

from __future__ import annotations

import tempfile
import threading
import time

import pytest

from lakefs_spark.storage.ownership import MostlyCorrectOwner, OwnershipTimeoutError
from lakefs_spark.storage.store import MemStore


def _store():
    return MemStore(tempfile.mkdtemp(prefix="lakefs_own_"))


def test_cross_instance_mutual_exclusion_and_handoff():
    """Two owner instances (= two processes) over one store: sections
    never interleave while the holder refreshes its lease."""
    store = _store()
    owners = [
        MostlyCorrectOwner(store, acquire_interval=0.05, refresh_interval=1.0)
        for _ in range(2)
    ]
    events: list[tuple[str, int]] = []
    mu = threading.Lock()

    def worker(idx: int):
        with owners[idx % 2].own("branch/main", timeout=10):
            with mu:
                events.append(("in", idx))
            time.sleep(0.15)
            with mu:
                events.append(("out", idx))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(events) == 8
    for i in range(0, 8, 2):  # every 'in' is immediately followed by ITS 'out'
        assert events[i][0] == "in" and events[i + 1][0] == "out"
        assert events[i][1] == events[i + 1][1]
    # release leaves an EXPIRED sentinel (never a delete — a delete
    # could race a thief's fresh lease), so the key is instantly
    # re-acquirable
    got = store.get_doc("mc-ownership/branch/main")
    assert got is not None and got[0]["expires"] == 0.0


def test_expired_lease_is_stolen():
    store = _store()
    store.put_doc("mc-ownership/k", {"owner": "dead", "expires": time.time() - 1})
    o = MostlyCorrectOwner(store, acquire_interval=0.05, refresh_interval=0.5)
    t0 = time.time()
    with o.own("k", timeout=2) as me:
        got = store.get_doc("mc-ownership/k")[0]
        assert got["owner"] == me  # stolen from the dead owner
    assert time.time() - t0 < 1.0  # no full-timeout wait


def test_acquire_times_out_against_live_lease():
    store = _store()
    store.put_doc("mc-ownership/k", {"owner": "alive", "expires": time.time() + 60})
    o = MostlyCorrectOwner(store, acquire_interval=0.05, refresh_interval=0.5)
    with pytest.raises(OwnershipTimeoutError):
        with o.own("k", timeout=0.3):
            raise AssertionError("must not acquire a live lease")


def test_stolen_lease_never_cancels_the_action():
    """mc_owner.go:118-126: when a thief takes the lease mid-flight the
    original action runs to completion, and release must NOT destroy
    the thief's lease."""
    store = _store()
    o = MostlyCorrectOwner(store, acquire_interval=0.05, refresh_interval=10.0)
    with o.own("k", timeout=2):
        # a thief (e.g. after clock skew) overwrites the lease
        store.put_doc("mc-ownership/k", {"owner": "thief", "expires": time.time() + 60})
        time.sleep(0.1)  # the action keeps running
        done = True
    assert done
    assert store.get_doc("mc-ownership/k")[0]["owner"] == "thief"  # left intact


def test_ownership_removes_branch_cas_retries(spark, tmp_path):
    """The point of the device: two committers to one branch, each
    queueing on the owner BEFORE the expensive work, produce ZERO lost
    branch-pointer CAS rounds — without the owner the same race loses
    at least one (tests/test_store.py pins that behavior)."""
    from lakefs_spark.storage.repo import Repository
    from lakefs_spark.storage.store import CASConflictError

    root = str(tmp_path / "repo")
    store = MemStore(root)
    conflicts = {"n": 0}
    orig = store.put_doc_if

    def counting_put_if(key, doc, ver):
        try:
            return orig(key, doc, ver)
        except CASConflictError:
            if key.startswith("refs/branches/"):
                conflicts["n"] += 1
            raise

    store.put_doc_if = counting_put_if
    repo_a = Repository.create(spark, root, store=store)
    repo_b = Repository.open(spark, root, store=store)
    # one owner INSTANCE per committer: sharing one instance would
    # serialize on its in-process mutex and never exercise the store
    # lease this test exists to pin
    owner_a = MostlyCorrectOwner(store, acquire_interval=0.05, refresh_interval=30.0)
    owner_b = MostlyCorrectOwner(store, acquire_interval=0.05, refresh_interval=30.0)

    def entries(keys):
        return spark.createDataFrame(
            [(k, f"id-{k}", None, None, 1, "e", None, None, None) for k in keys],
            "key string, identity string, address string, address_type string, "
            "size long, etag string, last_modified timestamp, "
            "metadata map<string,string>, content_type string",
        )

    repo_a.stage_entries("main", entries(["seed"]))
    repo_a.commit("main", "seed")
    barrier = threading.Barrier(2)
    errs = []

    def committer(repo, own_inst, tag):
        barrier.wait()
        try:
            with own_inst.own("branch/main", timeout=30):
                repo.stage_entries("main", entries([f"k-{tag}"]))
                repo.commit("main", f"commit {tag}")
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=committer, args=(r, o, t))
          for r, o, t in ((repo_a, owner_a, "a"), (repo_b, owner_b, "b"))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    keys = {r["key"] for r in repo_a.list_entries("main").collect()}
    assert {"seed", "k-a", "k-b"} <= keys
    assert conflicts["n"] == 0  # serialized: nobody lost a head CAS

def test_owner_wired_merges_do_one_apply_each(spark, tmp_path, monkeypatch):
    """Repository.owner (the mc_owner.go wiring): with the advisory
    lease set, 3 concurrent mergers into one branch serialize BEFORE
    the expensive copy-on-write apply — exactly ONE apply_changes per
    landed merge, no lost-CAS recomputes. Without it the same race
    wastes applies (the contenders pay the apply, lose the pointer
    CAS, and recompute). Correctness is identical either way."""
    import threading

    import lakefs_spark.storage.repo as repo_mod
    from lakefs_spark.schema import ENTRY_SCHEMA
    from lakefs_spark.storage.ownership import MostlyCorrectOwner
    from lakefs_spark.storage.repo import Repository
    from lakefs_spark.storage.store import MemStore

    root = str(tmp_path / "repo")
    mem = MemStore(root)
    seed_repo = Repository.create(spark, root, store=mem)

    def ent(key):
        return (key, f"id-{key}", f"s3://b/{key}", "FULL", 1, "e", None, None, "t")

    seed_repo.stage_entries(
        "main", spark.createDataFrame([ent("seed")], ENTRY_SCHEMA)
    )
    seed_repo.commit("main", "seed")

    applies = []
    real_apply = repo_mod.apply_changes

    def counting_apply(*a, **kw):
        applies.append(1)
        return real_apply(*a, **kw)

    monkeypatch.setattr(repo_mod, "apply_changes", counting_apply)
    # small merges take the driver-side apply (localapply) — the lease
    # property ("one apply per landed merge, no lost-CAS recomputes")
    # counts those applies all the same
    from lakefs_spark.storage import localapply as localapply_mod

    real_local = localapply_mod.apply_changes_local

    def counting_local(*a, **kw):
        applies.append(1)
        return real_local(*a, **kw)

    monkeypatch.setattr(localapply_mod, "apply_changes_local", counting_local)

    n = 3
    repos = []
    for i in range(n):
        r = Repository.open(spark, root, store=mem)
        r.owner = MostlyCorrectOwner(
            mem, refresh_interval=5.0, acquire_interval=0.05
        )
        r.create_branch(f"feat-{i}", "main")
        r.stage_entries(
            f"feat-{i}", spark.createDataFrame([ent(f"k{i}")], ENTRY_SCHEMA)
        )
        r.commit(f"feat-{i}", f"work {i}")
        repos.append(r)
    applies.clear()  # count merge applies only

    barrier = threading.Barrier(n)
    results: dict[int, object] = {}

    def merger(i):
        barrier.wait()
        try:
            results[i] = repos[i].merge(f"feat-{i}", "main")
        except Exception as e:  # noqa: BLE001
            results[i] = e

    threads = [threading.Thread(target=merger, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    oks = [r for r in results.values() if not isinstance(r, Exception)]
    assert len(oks) == n, results
    # THE payoff: one apply per landed merge — the lease serialized the
    # contenders before the expensive work, so no recompute was wasted
    assert len(applies) == n, f"expected {n} applies, counted {len(applies)}"
    keys = {r["key"] for r in seed_repo.list_entries("main").collect()}
    assert {"seed", "k0", "k1", "k2"} <= keys
