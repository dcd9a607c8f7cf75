"""Seeded model-based REPOSITORY lifecycle walk.

test_merge_model.py cross-checks one merge against the reference's
key-case table; this walks the whole lifecycle — interleaved staging,
tombstones, commits, staging resets, head reverts, cherry-picks,
prefix-replacing imports, branching and 3-way merges (plain and
SQUASHED, conflicts resolved by src or dest strategy) over a growing
DAG —
against a pure-Python model that tracks per-branch committed
snapshots, staged overlays and the commit graph. After every step the
engine's visible listing must equal the model's overlay; merges must
agree with the model on both the conflict set and (after strategy=src
resolution) the merged snapshot, with the merge base computed by the
MODEL over its own graph — replaying the engine's generation-ordered
algorithm (with the minted commit ids as tie-break) but never asking
the engine to pick the base.

Interleavings this reaches that the unit tests don't: staging on a
branch while it is being merged into, branching from a freshly merged
head, deleting keys that a sibling branch concurrently changes,
re-committing a key deleted two commits ago.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from lakefs_spark.schema import ENTRY_SCHEMA
from lakefs_spark.storage.repo import (
    ConflictError,
    DirtyBranchError,
    ProtectedBranchError,
    ReadOnlyRepositoryError,
    Repository,
)


def _df(spark, ids: dict[str, str]):
    rows = [
        (k, i, f"data/{i}", "RELATIVE", 1, f"e-{i}", None, None, "t")
        for k, i in sorted(ids.items())
    ]
    return spark.createDataFrame(rows, ENTRY_SCHEMA)


class Model:
    """Pure-Python mirror of the engine's visible state."""

    def __init__(self):
        self.commits: dict[str, tuple[dict, list]] = {}  # cid -> (snap, parents)
        self.branches: dict[str, dict] = {}  # name -> {"head", "staged"}
        self.seq = 0

    def new_commit(self, snap: dict, parents: list) -> str:
        self.seq += 1
        cid = f"m{self.seq}"
        self.commits[cid] = (dict(snap), list(parents))
        return cid

    def overlay(self, branch: str) -> dict[str, str]:
        st = self.branches[branch]
        snap = dict(self.commits[st["head"]][0]) if st["head"] else {}
        for k, v in st["staged"].items():
            if v is None:
                snap.pop(k, None)
            else:
                snap[k] = v
        return snap

    def generation(self, cid: str) -> int:
        snap_parents = self.commits[cid][1]
        if not snap_parents:
            return 1
        return 1 + max(self.generation(p) for p in snap_parents)

    def lca(self, a: str, b: str, engine_of: dict) -> dict[str, str]:
        """Merge-base snapshot by the ENGINE's exact algorithm
        (refs.merge_base / merge_base_finder.go): two-sided walk
        ordered by (-generation, engine commit id) — in criss-cross
        histories a hop-count BFS picks a DIFFERENT ancestor and
        mispredicts conflicts, so the model replays the real
        tie-break using the ids the engine actually minted."""
        import heapq

        FLAG_A, FLAG_B = 1, 2
        flags: dict[str, int] = {}
        heap: list = []

        def push(cid, flag):
            flags[cid] = flags.get(cid, 0) | flag
            heapq.heappush(heap, (-self.generation(cid), engine_of[cid], cid))

        push(a, FLAG_A)
        push(b, FLAG_B)
        while heap:
            _, _, cid = heapq.heappop(heap)
            f = flags[cid]
            if f == FLAG_A | FLAG_B:
                return dict(self.commits[cid][0])
            for p in self.commits[cid][1]:
                nf = flags.get(p, 0) | f
                if flags.get(p) == nf:
                    continue
                flags[p] = nf
                heapq.heappush(heap, (-self.generation(p), engine_of[p], p))
        return {}

    def three_way(self, base: dict, s: dict, d: dict):
        """Reference case table (merge.go:329-371) over explicit
        snapshots: returns (merged_with_src_strategy,
        merged_with_dest_strategy, conflict_keys, clean_or_None).
        Shared by merge (base = LCA) and cherry-pick (base = the
        picked commit's parent)."""
        keys = set(base) | set(s) | set(d)
        merged, merged_src, merged_dest, conflicts = {}, {}, {}, []
        for k in sorted(keys):
            bv, sv, dv = base.get(k), s.get(k), d.get(k)
            if sv == dv:
                if sv is not None:
                    merged[k] = sv
                    merged_src[k] = sv
                    merged_dest[k] = sv
                continue
            if sv == bv:  # only dst moved
                if dv is not None:
                    merged[k] = dv
                    merged_src[k] = dv
                    merged_dest[k] = dv
                continue
            if dv == bv:  # only src moved
                if sv is not None:
                    merged[k] = sv
                    merged_src[k] = sv
                    merged_dest[k] = sv
                continue
            conflicts.append(k)  # both moved differently
            if sv is not None:
                merged_src[k] = sv
            if dv is not None:
                merged_dest[k] = dv
            # a strategy picking the deleted side drops the key
        return merged_src, merged_dest, conflicts, (
            merged if not conflicts else None
        )

    def merge_outcome(self, src: str, dst: str, engine_of: dict):
        base = self.lca(
            self.branches[src]["head"], self.branches[dst]["head"], engine_of
        )
        s = self.commits[self.branches[src]["head"]][0]
        d = self.commits[self.branches[dst]["head"]][0]
        return self.three_way(base, s, d)


# seeds re-searched by model-only simulation (the walk's control flow
# never consults the engine) after the round-10 op-mix change: each
# walk covers stage/delete/commit/reset/revert, cherry-pick (apply +
# conflict + no-op), prefix-replacing import (direct AND via hidden
# work branch, incl. the dirty-destination refusal), branch,
# branch-protection refusals (stage/delete/commit blocked, rules
# restored wholesale), clean + squashed merges, conflicted merges
# resolved by BOTH strategies, the already-up-to-date refusal, the
# net-zero-staging commit refusal (NoChangesError), and a read-only
# restore epilogue — >=17 distinct op classes per seed (MIN_OPS), 22
# in union across the three.
SEEDS = [2871, 19425, 3957]
MIN_OPS = {2871: 17, 19425: 17, 3957: 17}


@pytest.mark.parametrize("seed", SEEDS)
def test_repo_lifecycle_random_walk(spark, tmp_path, seed):
    rng = random.Random(seed)
    repo = Repository.create(spark, str(tmp_path / f"walk{seed}"))
    model = Model()

    base = {f"k/{i:02d}": f"v0-{i}" for i in range(8)}
    repo.stage_entries("main", _df(spark, base))
    c = repo.commit("main", "base")
    cid = model.new_commit(base, [])
    model.branches["main"] = {"head": cid, "staged": {}}
    engine_of = {cid: c.commit_id}

    def check(branch):
        got = {
            r["key"]: r["identity"]
            for r in repo.list_entries(branch).select("key", "identity").collect()
        }
        assert got == model.overlay(branch), f"listing mismatch on {branch}"

    from lakefs_spark.storage.commit_apply import NoChangesError

    branches = ["main"]
    n_new_branch = 0
    ops_hit = set()
    for step in range(44):
        op = rng.random()
        b = rng.choice(branches)
        st = model.branches[b]
        if op < 0.26:  # stage a set/change
            k = (
                rng.choice(sorted(model.overlay(b)))
                if model.overlay(b) and rng.random() < 0.6
                else f"n/{seed}/{step}"
            )
            ident = f"s{step}"
            repo.stage_entries(b, _df(spark, {k: ident}))
            st["staged"][k] = ident
            ops_hit.add("stage")
        elif op < 0.38:  # stage a delete
            vis = sorted(model.overlay(b))
            if not vis:
                continue
            k = rng.choice(vis)
            repo.stage_deletes(b, [k])
            st["staged"][k] = None
            ops_hit.add("delete")
        elif op < 0.56:  # commit
            if not st["staged"]:
                continue
            if model.overlay(b) == model.commits[st["head"]][0]:
                # the staged delta nets to ZERO (e.g. a staged-only key
                # deleted again, or a key re-staged to its committed
                # value): the engine refuses the no-op commit
                # (manifest unchanged ⇒ NoChangesError) and leaves
                # staging intact
                with pytest.raises(NoChangesError):
                    repo.commit(b, f"noop {step}")
                ops_hit.add("commit_noop_refusal")
                check(b)
                continue
            c = repo.commit(b, f"step {step}")
            cid = model.new_commit(model.overlay(b), [st["head"]])
            engine_of[cid] = c.commit_id
            st["head"] = cid
            st["staged"] = {}
            ops_hit.add("commit")
        elif op < 0.59:  # reset staging (discard uncommitted work)
            if not st["staged"]:
                continue
            repo.reset_branch(b)
            st["staged"] = {}
            ops_hit.add("reset")
        elif op < 0.63:  # revert the head commit (non-merge heads only:
            # the model's simple inverse is parent's snapshot)
            head = st["head"]
            parents = model.commits[head][1]
            if st["staged"] or len(parents) != 1:
                continue
            rc = repo.revert(b, engine_of[head])
            cid = model.new_commit(model.commits[parents[0]][0], [head])
            engine_of[cid] = rc.commit_id
            st["head"] = cid
            ops_hit.add("revert")
        elif op < 0.66:  # cherry-pick a commit from anywhere in the DAG
            if st["staged"]:
                continue  # engine refuses dirty branches
            cands = [
                c_
                for c_, (_snap, ps) in model.commits.items()
                if len(ps) == 1 and c_ != st["head"]
            ]
            if not cands:
                continue
            pick = rng.choice(cands)
            parent_snap = model.commits[model.commits[pick][1][0]][0]
            _src, _dest, conflicts, clean = model.three_way(
                parent_snap, model.commits[pick][0],
                model.commits[st["head"]][0],
            )
            if conflicts:
                with pytest.raises(ConflictError):
                    repo.cherry_pick(b, engine_of[pick])
                ops_hit.add("cherry_conflict")
                continue
            if clean == model.commits[st["head"]][0]:
                # applying the pick changes nothing: engine refuses
                with pytest.raises(NoChangesError):
                    repo.cherry_pick(b, engine_of[pick])
                ops_hit.add("cherry_noop")
                continue
            cc = repo.cherry_pick(b, engine_of[pick])
            cid = model.new_commit(clean, [st["head"]])
            engine_of[cid] = cc.commit_id
            st["head"] = cid
            ops_hit.add("cherry_pick")
        elif op < 0.72:  # prefix-replacing import — direct, or via the
            # reference's hidden-work-branch topology (rng-chosen)
            newset = {
                f"imp/{step}/{j:02d}": f"im{step}-{j}" for j in range(3)
            }
            hidden = rng.random() < 0.5
            snap = {
                k: v
                for k, v in model.commits[st["head"]][0].items()
                if not k.startswith("imp/")
            }
            snap.update(newset)
            if hidden and st["staged"]:
                # the hidden-branch import ENDS in a merge into b, and
                # merges refuse a dirty destination (ErrDirtyBranch) —
                # the target must be left untouched, work branch gone
                with pytest.raises(DirtyBranchError):
                    repo.import_via_hidden_branch(
                        b, _df(spark, newset), replace_prefixes=["imp/"],
                        message=f"import @{step}",
                    )
                assert not [
                    n for n in repo.branches(show_hidden=True)
                    if n.startswith("_import-")
                ], "hidden work branch leaked"
                ops_hit.add("import_hidden_dirty_refusal")
                check(b)
                continue
            if hidden:
                mc = repo.import_via_hidden_branch(
                    b, _df(spark, newset), replace_prefixes=["imp/"],
                    message=f"import @{step}",
                )
                # model the REAL topology (work-branch commit + merge)
                # so generations/LCA tie-breaks stay DAG-faithful
                cid_i = model.new_commit(snap, [st["head"]])
                engine_of[cid_i] = mc.parents[1]
                cid = model.new_commit(snap, [st["head"], cid_i])
                engine_of[cid] = mc.commit_id
                assert not [
                    n for n in repo.branches(show_hidden=True)
                    if n.startswith("_import-")
                ], "hidden work branch leaked"
                ops_hit.add("import_hidden")
            else:
                ic = repo.import_entries(
                    b, _df(spark, newset), replace_prefixes=["imp/"],
                    message=f"import @{step}",
                )
                cid = model.new_commit(snap, [st["head"]])
                engine_of[cid] = ic.commit_id
                ops_hit.add("import")
            st["head"] = cid
        elif op < 0.76:  # branch-protection refusals: protect b, every
            # blocked op refuses and state is untouched; rules then
            # restored WHOLESALE (the reference's replace-the-list API)
            rules_before = repo.protection_rules()
            repo.protect_branch(b, blocked=("staging_write", "commit",
                                            "delete"))
            with pytest.raises(ProtectedBranchError):
                repo.stage_entries(b, _df(spark, {f"blocked/{step}": "x"}))
            with pytest.raises(ProtectedBranchError):
                repo.stage_deletes(b, ["blocked/nope"])
            if st["staged"]:
                with pytest.raises(ProtectedBranchError):
                    repo.commit(b, "blocked commit")
                ops_hit.add("protect_commit_refusal")
            if b != "main":
                with pytest.raises(ProtectedBranchError):
                    repo.delete_branch(b)
                ops_hit.add("protect_delete_refusal")
            repo.set_protection_rules(rules_before)
            assert repo.protection_rules() == rules_before
            ops_hit.add("protect_refusal")
        elif op < 0.82 and n_new_branch < 5:  # branch from a head
            n_new_branch += 1
            name = f"b{n_new_branch}"
            repo.create_branch(name, b)
            model.branches[name] = {"head": st["head"], "staged": {}}
            branches.append(name)
            ops_hit.add("branch")
        else:  # merge a sibling into b (committing stragglers first,
            # like a real client would)
            srcs = [x for x in branches if x != b]
            if not srcs:
                continue
            src = rng.choice(srcs)
            for side in (src, b):
                side_st = model.branches[side]
                if side_st["staged"]:
                    if (model.overlay(side)
                            == model.commits[side_st["head"]][0]):
                        # net-zero staging can't commit (NoChangesError)
                        # — flush it by discarding, like a real client
                        repo.reset_branch(side)
                        side_st["staged"] = {}
                        continue
                    c = repo.commit(side, f"pre-merge flush @{step}")
                    cid = model.new_commit(
                        model.overlay(side), [side_st["head"]]
                    )
                    engine_of[cid] = c.commit_id
                    side_st["head"] = cid
                    side_st["staged"] = {}
            if model.branches[src]["head"] == st["head"]:
                continue
            merged_src, merged_dest, conflicts, clean = model.merge_outcome(
                src, b, engine_of
            )
            dst_snap = model.commits[st["head"]][0]
            if clean is not None and clean == dst_snap:
                # src fully contained in dst: the engine refuses an
                # empty merge ("already up to date"), like git
                with pytest.raises(NoChangesError):
                    repo.merge(src, b, message="must be empty")
                ops_hit.add("merge_noop")
                continue
            if clean is not None:
                squash = rng.random() < 0.35
                mc = repo.merge(
                    src, b, message=f"merge {src}->{b} @{step}",
                    squash=squash,
                )
                parents = (
                    [st["head"]]
                    if squash
                    else [st["head"], model.branches[src]["head"]]
                )
                cid = model.new_commit(clean, parents)
                engine_of[cid] = mc.commit_id
                st["head"] = cid
                ops_hit.add("merge_squash" if squash else "merge")
            else:
                with pytest.raises(ConflictError) as exc:
                    repo.merge(src, b, message="must conflict")
                got_conf = sorted(
                    r["key"] for r in exc.value.conflicts.select("key").collect()
                )
                assert got_conf == conflicts, f"conflict set @{step}"
                # resolve with a rng-chosen strategy and assert the
                # engine's merged snapshot matches the MODEL's per-key
                # resolution for THAT strategy (not just src)
                strategy = rng.choice(["src", "dest"])
                expect = merged_src if strategy == "src" else merged_dest
                if expect == dst_snap:
                    # dest-strategy resolution can be a no-op
                    with pytest.raises(NoChangesError):
                        repo.merge(src, b, strategy=strategy,
                                   message="resolve noop")
                    ops_hit.add("merge_conflict_noop")
                    continue
                mc = repo.merge(src, b, strategy=strategy,
                                message=f"resolve {strategy}")
                cid = model.new_commit(
                    expect, [st["head"], model.branches[src]["head"]]
                )
                engine_of[cid] = mc.commit_id
                st["head"] = cid
                ops_hit.add(f"merge_conflict_{strategy}")
        check(b)

    # final: every branch's full listing and every model commit's
    # snapshot agree with the engine
    for b in branches:
        check(b)
    for cid, eng_cid in list(engine_of.items())[-6:]:
        got = {
            r["key"]: r["identity"]
            for r in repo.snapshot(eng_cid).select("key", "identity").collect()
        }
        assert got == model.commits[cid][0], f"snapshot mismatch at {cid}"
    # read-only epilogue: dump the walk's final DAG and restore it into
    # a READ-ONLY clone (the reference's dump/restore escape hatch —
    # LoadCommits/LoadBranches run WriteOptions.Force on read-only
    # repos). Every branch's committed listing must match the model,
    # and every mutating entry point must refuse.
    import os as _os
    import shutil as _sh

    dump_dir = str(tmp_path / f"dump{seed}")
    _os.makedirs(dump_dir, exist_ok=True)
    repo.dump_refs(dump_dir)
    ro_root = str(tmp_path / f"ro{seed}")
    ro = Repository.create(spark, ro_root, read_only=True)
    for sub in ("ranges", "manifests"):
        _sh.copytree(
            _os.path.join(repo.root, sub), _os.path.join(ro_root, sub),
            dirs_exist_ok=True,
        )
    ro.restore_refs(dump_dir, force=True)
    for b2 in branches:
        got = {
            r["key"]: r["identity"]
            for r in ro.list_entries(b2).select("key", "identity").collect()
        }
        assert got == model.commits[model.branches[b2]["head"]][0], (
            f"read-only clone listing mismatch on {b2}"
        )
    with pytest.raises(ReadOnlyRepositoryError):
        ro.stage_entries("main", _df(spark, {"x": "y"}))
    with pytest.raises(ReadOnlyRepositoryError):
        ro.commit("main", "nope")
    with pytest.raises(ReadOnlyRepositoryError):
        ro.merge(branches[-1], "main")
    with pytest.raises(ReadOnlyRepositoryError):
        ro.protect_branch("main")
    ops_hit.add("read_only_refusal")

    # the walk must genuinely exercise the op mix (seeds are pinned so
    # this holds deterministically; re-search seeds if the mix changes)
    assert {"stage", "delete", "commit"} <= ops_hit, ops_hit
    assert ops_hit & {"cherry_pick", "cherry_conflict", "cherry_noop"}, ops_hit
    assert ops_hit & {"import", "import_hidden"}, ops_hit
    assert "protect_refusal" in ops_hit, ops_hit
    assert "read_only_refusal" in ops_hit, ops_hit
    assert ops_hit & {"merge", "merge_squash"}, ops_hit
    assert len(ops_hit) >= MIN_OPS[seed], (len(ops_hit), sorted(ops_hit))
    print(f"seed {seed} ops ({len(ops_hit)}): {sorted(ops_hit)}")
