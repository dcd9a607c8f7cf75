"""The versioned repository: branches, staging, commits, merge, GC.

Embedded-engine equivalent of the reference's Graveler orchestration
(pkg/graveler/graveler.go — VersionController + KeyValueStore), minus
server concerns (HTTP/auth/S3 gateway are non-goals, see README).

Storage layout under ``root``::

    repo.json                     {default_branch, ...}
    ranges/<range_id>.parquet     content-addressed sorted entry runs
    manifests/<metarange_id>.parquet
    commits/<commit_id>.json      content-addressed commit records
    refs/branches/<name>.json     {head, staging_seq}   (pointer file)
    refs/tags/<name>.json         {commit_id}
    staging/<branch>/<seq>/       parquet change batches (tombstones incl.)

Concurrency model: every branch-pointer mutation is a version-token
conditional PUT on the metadata store (storage/store.py — the
semantics of kv SetIf, pkg/kv/store.go:96-111, S3 If-Match, DynamoDB
condition writes). The repository never takes a lock: it reads
``(state, version)``, computes, and puts-if-version-matches; a lost
race surfaces as :class:`BranchChangedError` and the bounded retry
loop recomputes on the new head (graveler.go:2422-2475). The default
:class:`~lakefs_spark.storage.store.LocalStore` implements the
conditional PUT over local files (single-host, like the reference's
badger tier); any conditional-PUT backend slots in via the ``store``
parameter. Single-writer-per-branch is assumed for staging appends,
like the reference's staging tokens.

Hooks: pre/post callbacks around commit and merge; a pre-hook raising
``HookAbortError`` aborts the operation (pkg/actions/event.go:16-32,
abort wiring pkg/graveler/graveler.go:2272-2287).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakefs_spark.functions.prefix import upper_bound_for_prefix
from lakefs_spark.operators import diff as diff_ops
from lakefs_spark.operators import merge as merge_ops
from lakefs_spark.operators.listing import list_entries as _list_entries
from lakefs_spark.operators.overlay import overlay, overlay_raw, with_layer
from lakefs_spark.plans.chunker import DEFAULT_RAGGEDNESS
from lakefs_spark.schema import ENTRY_COLS, ENTRY_SCHEMA, STAGED_SCHEMA

_UNSET = object()  # sentinel: "no identity predicate" (None is a valid predicate)
from lakefs_spark.storage import ranges as R
from lakefs_spark.storage import commit_apply, localapply, locallist
from lakefs_spark.storage.commit_apply import NoChangesError, apply_changes
from lakefs_spark.storage.refs import (
    Commit,
    CommitStore,
    RefError,
    log_commits,
    merge_base,
    resolve_ref,
)
from lakefs_spark.storage.store import CASConflictError, LocalStore, Store


# Ref-name validation (pkg/validator/validate.go:11 ReValidBranchID,
# pkg/graveler/validate.go:36-81 ValidateBranchID/ValidateTagID). A
# slash-named branch would otherwise write a nested store doc that a
# naive lister misses — reachability roots must never be creatable
# under names the listing contract can't see.
_BRANCH_ID_RE = re.compile(r"^\w[-\w]*$", re.ASCII)  # Go RE2 \w is ASCII-only


def _validate_branch_id(name: str) -> None:
    if not name or not _BRANCH_ID_RE.fullmatch(name):
        raise RefError(f"invalid branch name: {name!r}")


def _validate_tag_id(name: str) -> None:
    # git-check-ref-format subset the reference enforces ('~' allowed)
    if (
        not name
        or name == "@"
        or name.endswith(".")
        or name.endswith(".lock")
        or ".." in name
        or "/" in name
        or "@{" in name
        or any(c in name for c in "^:?*[\\")
        or any(ord(c) <= 0x20 for c in name)
    ):
        raise RefError(f"invalid tag name: {name!r}")


class ConflictError(Exception):
    """Merge found conflicting changes (ErrConflictFound)."""

    def __init__(self, conflicts: DataFrame):
        super().__init__("merge conflicts found")
        self.conflicts = conflicts


class DirtyBranchError(Exception):
    """Destination branch has uncommitted changes (ErrDirtyBranch)."""


class HookAbortError(Exception):
    """Raised by a pre-hook to abort the operation."""


class ProtectedBranchError(Exception):
    """Operation blocked by a branch-protection rule."""


class PreconditionFailedError(Exception):
    """Conditional write predicate failed (kv.ErrPredicateFailed;
    reference: pkg/graveler/graveler.go:1982-2003, pkg/kv/store.go:96-100)."""


class TooManyTriesError(Exception):
    """Branch update kept losing the CAS race (graveler.ErrTooManyTries;
    pkg/graveler/graveler.go:2422-2475 retryBranchUpdate)."""


class BranchChangedError(Exception):
    """The branch head moved between read and compare-and-swap — the
    optimistic update lost the race (kv.ErrPredicateFailed;
    pkg/kv/store.go:96-100 SetIf). Callers retry via
    :meth:`Repository._retry_branch_update`."""


class ReadOnlyRepositoryError(Exception):
    """Write operation on a read-only repository without force
    (graveler.ErrReadOnlyRepository; pkg/graveler/graveler.go:417-419
    ReadOnly flag, enforcement at every write entry e.g. 1309-1347)."""


#: bounded optimistic-retry budget for branch-pointer updates
#: (pkg/graveler/graveler.go BranchUpdateMaxTries)
BRANCH_UPDATE_MAX_TRIES = 3

# bounded size of the per-Repository merge double-diff memo (entries
# are persisted DataFrames of CHANGED keys only; evicted/cleared
# entries are unpersisted). 0 via env disables the memo entirely.
_MERGE_MEMO_MAX = int(os.environ.get("LAKEFS_SPARK_MERGE_DIFF_MEMO", "2"))


class Repository:
    def __init__(self, spark: SparkSession, root: str, store: Store | None = None):
        self.spark = spark
        self.root = root
        self.store = store if store is not None else LocalStore(root)
        self.commits = CommitStore(self.store)
        self.hooks: dict[str, list] = {}
        self.raggedness = DEFAULT_RAGGEDNESS
        self._read_only: bool | None = None  # lazy; immutable after create
        self._name: str | None = None  # lazy; immutable after create
        #: optional MostlyCorrectOwner (storage/ownership.py): when set,
        #: branch updates queue on an advisory lease BEFORE paying the
        #: copy-on-write apply, so N contenders do ~1 apply per round
        #: instead of N (pkg/distributed/mc_owner.go's role in the
        #: reference). Purely a performance device — correctness stays
        #: with the pointer CAS; an expired/stolen lease never aborts.
        self.owner = None
        #: metarange-keyed memo of the strategy-independent merge join
        #: (operators/merge.qualified_join), persisted per entry: a
        #: conflict-detect merge followed by a strategy=src retry of
        #: the SAME commit triple (the b5 shape) re-ladders the already
        #: materialized double-diff instead of recomputing it. Sound
        #: because the key is three immutable metarange ids (the diff
        #: of two immutable metaranges never changes); scoped to one
        #: API sequence — cleared (and unpersisted) on every successful
        #: branch write, never written to disk, capped at
        #: _MERGE_MEMO_MAX entries. Kill-switch:
        #: LAKEFS_SPARK_MERGE_DIFF_MEMO=0.
        self._merge_join_memo: dict[tuple, DataFrame] = {}

    @property
    def name(self) -> str:
        """Stable repository NAME for hook-visible records and exported
        object keys (graveler's repositoryID, never a filesystem path).
        Stored in the repo doc at create; repos created before the
        field existed fall back to the root's basename, which is stable
        for a given deployment but not across a move — new repos always
        persist the name."""
        if self._name is None:
            got = self.store.get_doc("repo")
            stored = (got[0].get("name") or "") if got is not None else ""
            self._name = stored or os.path.basename(os.path.normpath(self.root))
        return self._name

    @property
    def pulls(self):
        """Pull-request manager (graveler.go:360-392; see storage/pulls.py)."""
        from lakefs_spark.storage.pulls import PullRequests

        return PullRequests(self)

    # -- lifecycle ---------------------------------------------------------

    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        default_branch: str = "main",
        store: Store | None = None,
        read_only: bool = False,
        name: str | None = None,
        storage_namespace: str | None = None,
    ) -> "Repository":
        os.makedirs(root, exist_ok=True)
        for sub in ("ranges", "manifests", "staging"):
            os.makedirs(os.path.join(root, sub), exist_ok=True)
        repo = Repository(spark, root, store=store)
        doc = {
            "default_branch": default_branch,
            "created_at": time.time(),
            "read_only": bool(read_only),
            "name": name or os.path.basename(os.path.normpath(root)),
        }
        if storage_namespace:
            # the repo record's StorageNamespace (pkg/graveler
            # RepositoryRecord) — where DATA objects live, as opposed
            # to where this metadata store lives; hooks see it as
            # action.storage_namespace
            doc["storage_namespace"] = storage_namespace
        repo.store.put_doc("repo", doc)
        repo._write_branch(default_branch, {"head": None, "staging_seq": 0})
        return repo

    @staticmethod
    def open(spark: SparkSession, root: str, store: Store | None = None) -> "Repository":
        repo = Repository(spark, root, store=store)
        if not repo.store.doc_exists("repo"):
            raise FileNotFoundError(f"not a repository: {root}")
        return repo

    @property
    def default_branch(self) -> str:
        return self.store.get_doc("repo")[0]["default_branch"]

    @property
    def storage_namespace(self) -> str:
        """The repo record's storage namespace if set at creation,
        else the metadata store's data root (single-tree layout)."""
        doc = self.store.get_doc("repo")
        ns = (doc[0] if doc else {}).get("storage_namespace")
        return ns or getattr(self.store, "data_root", self.root)

    @property
    def read_only(self) -> bool:
        """Repository-level write lock (pkg/graveler/model.go:127
        ReadOnly): set at creation, immutable — so cached after the
        first store read."""
        if self._read_only is None:
            got = self.store.get_doc("repo")
            self._read_only = bool(got and got[0].get("read_only", False))
        return self._read_only

    def _check_writable(self, op: str, force: bool = False) -> None:
        """Every write entry point refuses on a read-only repository
        unless forced (graveler.go:1309-1347 and siblings: ReadOnly &&
        !options.Force -> ErrReadOnlyRepository). Force is the
        dump/restore + managed-import escape hatch."""
        if self.read_only and not force:
            raise ReadOnlyRepositoryError(
                f"{op}: repository is read-only (pass force=True to override)"
            )

    # -- hooks -------------------------------------------------------------

    def on(self, event: str, fn) -> None:
        """Register a hook: pre-commit, post-commit, pre-merge, post-merge,
        pre-create-branch, post-create-branch, pre-create-tag, ..."""
        self.hooks.setdefault(event, []).append(fn)

    def _fire(self, event: str, **ctx) -> None:
        """Invoke hooks and append to the run-results log
        (pkg/actions/kv_run_results_iterator.go analog: one JSONL row
        per hook run; pre-hooks raise HookAbortError to abort)."""
        fns = self.hooks.get(event, [])
        if not fns:
            return
        if self.read_only:
            # forced writes on a read-only repo run WITHOUT hooks, like
            # the reference (graveler.go:1372,1521,... `if !ReadOnly`)
            return
        # one id per event; run-log rows suffix it with the hook index,
        # and the actions dispatcher reuses the base id for its task
        # rows so the runs API chains run -> hooks on the same id
        ctx = dict(ctx, run_id=f"{int(time.time() * 1e6):016x}")
        abortable = event.startswith("pre") or event == "prepare-commit"
        for i, fn in enumerate(fns):
            status, err = "completed", None
            try:
                fn(self, event, ctx)
            except Exception as e:
                status = "aborted" if abortable else "failed"
                err = f"{type(e).__name__}: {e}"
                # post-* hooks run AFTER the operation landed: a flaky
                # post-commit webhook must not make a succeeded commit
                # look failed (the reference records and moves on)
                if abortable:
                    raise
            finally:
                self._log_run(event, i, status, err, ctx)

    def _log_run(self, event: str, hook_idx: int, status: str, err: str | None, ctx: dict) -> None:
        rec = {
            # %04d: lexicographic run-id cursors must order by index
            # ('-9' > '-10' unpadded breaks pagination past 10 hooks)
            "run_id": f"{ctx.get('run_id') or f'{int(time.time() * 1e6):016x}'}-{hook_idx:04d}",
            "event": event,
            "hook_index": hook_idx,
            "status": status,
            "error": err,
            "branch": ctx.get("branch") or ctx.get("dest") or "",
            "context_keys": sorted(ctx),
            "start_time": time.time(),
        }
        self.store.append_line("runs", json.dumps(rec))

    def hook_runs(self, event: str | None = None, limit: int | None = None) -> list[dict]:
        """Run-results listing, newest first (ListRunResults shape)."""
        runs = [json.loads(line) for line in self.store.read_lines("runs")]
        runs.reverse()
        if event is not None:
            runs = [r for r in runs if r["event"] == event]
        return runs[:limit] if limit is not None else runs

    def expire_runs(self, ttl_seconds: float, now: float | None = None) -> int:
        """TTL cleanup of the run-results log (the expired-tasks delete
        of pkg/catalog/catalog.go:3177-3208). Returns rows dropped;
        the rewrite is atomic on the store."""
        cutoff = (now if now is not None else time.time()) - ttl_seconds
        runs = [json.loads(line) for line in self.store.read_lines("runs")]
        kept = [r for r in runs if r["start_time"] >= cutoff]
        if len(kept) == len(runs):
            return 0
        self.store.replace_lines("runs", [json.dumps(r) for r in kept])
        return len(runs) - len(kept)

    # -- repository-level settings (pkg/graveler/settings/manager.go) --------

    def get_setting_latest(self, key: str):
        """GetLatest (settings/manager.go:117): the setting value plus
        its version token — pass the token back to :meth:`save_setting`
        for a conditional write. None if unset."""
        got = self.store.get_doc(f"settings/{key}")
        return (got[0]["value"], got[1]) if got else None

    def get_setting(self, key: str, default=None):
        got = self.get_setting_latest(key)
        return got[0] if got else default

    def save_setting(self, key: str, value, last_known: str | None = None,
                     force: bool = False) -> str:
        """Save (settings/manager.go:66): unconditional when
        ``last_known`` is None; otherwise a conditional put that raises
        ``CASConflictError`` if the setting moved (the SetMsgIf
        semantics the reference runs on its KV)."""
        self._check_writable("save_setting", force)
        doc = {"value": value}
        if last_known is None:
            return self.store.put_doc(f"settings/{key}", doc)
        return self.store.put_doc_if(f"settings/{key}", doc, last_known)

    def update_setting(self, key: str, fn, default=None, force: bool = False):
        """Read-modify-CAS with bounded retry (the Update loop every
        reference settings consumer runs): ``fn(current) -> new``.
        Returns the value that won."""
        self._check_writable("update_setting", force)
        for _ in range(16):
            got = self.get_setting_latest(key)
            cur, ver = (got[0], got[1]) if got else (default, None)
            new = fn(cur)
            try:
                # ver None -> put_doc_if(..., None) = atomic must-be-absent
                # create; exactly one concurrent creator wins, losers retry
                self.store.put_doc_if(f"settings/{key}", {"value": new}, ver)
                return new
            except CASConflictError:
                continue
        raise TooManyTriesError(f"settings/{key} update kept losing the CAS race")

    # -- branch protection ---------------------------------------------------

    def protection_rules(self) -> list[dict]:
        # union of the settings store and the legacy doc location
        # (pre-settings repos), deduped — a migration interrupted
        # between the settings write and the legacy delete must not
        # hide rules or double-apply them
        rules = list(self.get_setting("protected_branches", {"rules": []})["rules"])
        legacy = self.store.get_doc("protected_branches")
        if legacy:
            seen = {json.dumps(r, sort_keys=True) for r in rules}
            rules += [
                r for r in legacy[0]["rules"]
                if json.dumps(r, sort_keys=True) not in seen
            ]
        return rules

    def protect_branch(self, pattern: str, blocked: tuple[str, ...] = ("staging_write", "commit"),
                       force: bool = False) -> None:
        """Add a protection rule: fnmatch ``pattern`` over branch names,
        blocking the given ops (pkg/graveler/branch/protection_manager.go
        — itself a settings-manager consumer, mirrored here: the rule
        list lives in the repo settings store and concurrent adds both
        land through the CAS update loop). Merges into a protected
        branch stay allowed — that is the rule's point (changes land
        via merge, not direct commit)."""
        self._check_writable("protect_branch", force)
        if self.store.get_doc("protected_branches"):  # migrate legacy doc
            legacy = self.store.get_doc("protected_branches")[0]["rules"]

            def _merge_legacy(cur):
                cur_rules = (cur or {"rules": []})["rules"]
                seen = {json.dumps(r, sort_keys=True) for r in cur_rules}
                return {"rules": cur_rules + [
                    r for r in legacy if json.dumps(r, sort_keys=True) not in seen
                ]}

            self.update_setting(
                "protected_branches", _merge_legacy, default={"rules": []},
                force=force,
            )
            try:
                self.store.delete_doc("protected_branches")
            except FileNotFoundError:
                pass  # concurrent migrator already deleted the legacy doc;
                # the settings merge above is idempotent (dedup set)
        new_rule = {"pattern": pattern, "blocked": list(blocked)}
        self.update_setting(
            "protected_branches",
            lambda cur: {"rules": (cur or {"rules": []})["rules"] + [new_rule]},
            default={"rules": []},
            force=force,
        )

    def set_protection_rules(self, rules: list[dict], force: bool = False) -> None:
        """Replace the protection rule list WHOLESALE — the reference's
        SetBranchProtectionRules (api/swagger.yml branch_protection PUT,
        pkg/api/controller.go SetBranchProtectionRulesPreflight/Set):
        the API replaces the whole list rather than editing entries, so
        an empty list unprotects everything."""
        self._check_writable("set_protection_rules", force)
        clean = [
            {
                "pattern": r["pattern"],
                "blocked": list(r.get("blocked", ("staging_write", "commit"))),
            }
            for r in rules
        ]
        self.update_setting(
            "protected_branches",
            lambda _cur: {"rules": clean},
            default={"rules": []},
            force=force,
        )

    def _check_protected(self, branch: str, op: str) -> None:
        from fnmatch import fnmatch

        for rule in self.protection_rules():
            if fnmatch(branch, rule["pattern"]) and op in rule["blocked"]:
                raise ProtectedBranchError(
                    f"{op} blocked on protected branch {branch!r} (rule {rule['pattern']!r})"
                )

    # -- branch / tag pointers ---------------------------------------------

    def _branch_key(self, name: str) -> str:
        return f"refs/branches/{name}"

    def _get_branch(self, name: str) -> tuple[dict, str]:
        """Branch state + its store version token (the CAS predicate)."""
        got = self.store.get_doc(self._branch_key(name))
        if got is None:
            raise RefError(f"branch not found: {name!r}")
        return got

    def _read_branch(self, name: str) -> dict:
        return self._get_branch(name)[0]

    def _write_branch(self, name: str, state: dict) -> None:
        self.store.put_doc(self._branch_key(name), state)

    #: inner bound for re-merging over concurrent NON-head writes (e.g.
    #: a staging_seq bump racing a commit's head swap) — distinct from
    #: BRANCH_UPDATE_MAX_TRIES, which bounds recomputes after the head
    #: itself moved
    _CAS_MERGE_MAX_TRIES = 16

    def _cas_update(self, name: str, expected_head, update: dict, drop: tuple = ()) -> dict:
        """Set fields on the branch state iff its head still equals
        ``expected_head``, via version-token conditional PUT — no lock
        anywhere (kv SetIf semantics, pkg/kv/store.go:96-111). Merges
        over the CURRENT state (so a concurrent staging_seq bump is
        preserved: the bump changes the version, the conditional PUT
        fails, and this loop re-reads and re-merges), removes ``drop``
        keys, and raises :class:`BranchChangedError` once the HEAD is
        seen to have moved (graveler.go:2422-2475 branch-update
        predicate) so the caller's retry recomputes its work."""
        for _ in range(self._CAS_MERGE_MAX_TRIES):
            cur, ver = self._get_branch(name)
            if cur["head"] != expected_head:
                raise BranchChangedError(
                    f"branch {name!r} moved: expected head {expected_head!r}, "
                    f"found {cur['head']!r}"
                )
            merged_update = {
                # dict-valued fields deep-merge over the current state
                # (stream_epochs: concurrent queries each own one key;
                # a whole-map overwrite would regress the other's epoch)
                k: {**cur[k], **v}
                if isinstance(v, dict) and isinstance(cur.get(k), dict)
                else v
                for k, v in update.items()
            }
            new = {k: v for k, v in {**cur, **merged_update}.items() if k not in drop}
            try:
                self.store.put_doc_if(self._branch_key(name), new, ver)
                # any successful branch write ends the "one API
                # sequence" the merge double-diff memo is scoped to —
                # drop (and unpersist) every entry. Correctness never
                # depends on this (keys are immutable metarange ids);
                # it bounds executor memory held between operations.
                if self._merge_join_memo:
                    for df in self._merge_join_memo.values():
                        df.unpersist()
                    self._merge_join_memo.clear()
                return new
            except CASConflictError:
                continue  # concurrent non-head write; re-read and re-merge
        raise BranchChangedError(
            f"branch {name!r}: conditional PUT kept failing under concurrent writes"
        )

    def _retry_branch_update(self, branch: str, attempt):
        """Run ``attempt()`` (which ends in a :meth:`_cas_update`) with a
        bounded optimistic retry on lost races — the reference's
        retryBranchUpdate loop (graveler.go:2422-2475,
        BranchUpdateMaxTries). Each retry re-reads the head inside
        ``attempt`` and recomputes, so the result is always applied on
        the observed head."""
        def loop():
            last: BranchChangedError | None = None
            for _ in range(BRANCH_UPDATE_MAX_TRIES):
                try:
                    return attempt()
                except BranchChangedError as e:
                    last = e
            raise TooManyTriesError(
                f"branch {branch!r} update failed after "
                f"{BRANCH_UPDATE_MAX_TRIES} tries"
            ) from last

        if self.owner is None:
            return loop()
        # advisory lease: contenders queue BEFORE the expensive apply
        # (mc_owner.go's role around graveler branch updates). If the
        # lease can't be acquired in time, fall through to plain
        # optimistic CAS — ownership must never block progress.
        from lakefs_spark.storage.ownership import OwnershipTimeoutError

        try:
            with self.owner.own(f"branch-update/{branch}"):
                return loop()
        except OwnershipTimeoutError:
            return loop()

    def branches(self, show_hidden: bool = False) -> dict[str, str | None]:
        """Branch name -> head. Hidden branches (import work branches —
        graveler.go:227-267 WithHidden) are excluded from the listing by
        default, like the reference's branch iterator
        (ref/branch_iterator.go:67); internal consumers that need the
        complete reachability picture (ref resolution, GC roots,
        dump/restore) pass ``show_hidden=True``."""
        out: dict[str, str | None] = {}
        for k in self.store.list_docs("refs/branches/"):
            st = self.store.get_doc(k)[0]
            if st.get("hidden") and not show_hidden:
                continue
            out[k[len("refs/branches/"):]] = st["head"]
        return out

    def tags(self) -> dict[str, str]:
        return {
            k[len("refs/tags/"):]: self.store.get_doc(k)[0]["commit_id"]
            for k in self.store.list_docs("refs/tags/")
        }

    def create_branch(self, name: str, source_ref: str, force: bool = False,
                      hidden: bool = False) -> None:
        """``hidden=True`` creates an import-style work branch
        (graveler.go:227-267 CreateBranch WithHidden): fully functional
        — resolvable, committable, mergeable — but invisible to
        ``branches()`` listings until deleted."""
        self._check_writable("create_branch", force)
        _validate_branch_id(name)
        if self.store.doc_exists(self._branch_key(name)):
            raise RefError(f"branch exists: {name!r}")
        self._fire("pre-create-branch", branch=name, source=source_ref)
        head = self.resolve(source_ref).commit_id
        st = {"head": head, "staging_seq": 0}
        if hidden:
            st["hidden"] = True
        try:  # put-if-absent closes the check-then-create race
            self.store.put_doc_if(self._branch_key(name), st, None)
        except CASConflictError:
            raise RefError(f"branch exists: {name!r}") from None
        self._fire("post-create-branch", branch=name, head=head)

    def delete_branch(self, name: str, force: bool = False) -> None:
        self._check_writable("delete_branch", force)
        if name == self.default_branch:
            raise RefError("cannot delete the repository's default branch")
        self._check_protected(name, "delete")
        self._fire("pre-delete-branch", branch=name)
        self.store.delete_doc(self._branch_key(name))
        shutil.rmtree(os.path.join(self.root, "staging", name), ignore_errors=True)
        self._fire("post-delete-branch", branch=name)

    def create_tag(self, name: str, ref: str, force: bool = False) -> None:
        self._check_writable("create_tag", force)
        _validate_tag_id(name)
        if self.store.doc_exists(f"refs/tags/{name}"):
            raise RefError(f"tag exists: {name!r}")
        self._fire("pre-create-tag", tag=name, ref=ref)
        cid = self.resolve(ref).commit_id
        if cid is None:
            raise RefError("cannot tag an empty branch")
        try:
            self.store.put_doc_if(f"refs/tags/{name}", {"commit_id": cid}, None)
        except CASConflictError:
            raise RefError(f"tag exists: {name!r}") from None
        self._fire("post-create-tag", tag=name, commit_id=cid)

    def delete_tag(self, name: str, force: bool = False) -> None:
        self._check_writable("delete_tag", force)
        self._fire("pre-delete-tag", tag=name)
        self.store.delete_doc(f"refs/tags/{name}")
        self._fire("post-delete-tag", tag=name)

    # -- ref resolution ----------------------------------------------------

    def resolve(self, ref: str):
        return resolve_ref(ref, self.branches(show_hidden=True), self.tags(), self.commits)

    def _metarange_of(self, commit_id: str | None) -> str:
        if commit_id is None:
            return R.EMPTY_METARANGE
        return self.commits.get(commit_id).metarange_id

    # -- staging -----------------------------------------------------------

    def _staging_dir(self, branch: str) -> str:
        return os.path.join(self.root, "staging", branch)

    def _next_seq(self, branch: str) -> int:
        # lock-free fetch-and-increment via conditional PUT: two
        # concurrent stagers must not be handed the same seq (= same
        # staging partition dir); a lost CAS just re-reads and retries
        for _ in range(self._CAS_MERGE_MAX_TRIES):
            st, ver = self._get_branch(branch)
            seq = st["staging_seq"] + 1
            try:
                self.store.put_doc_if(
                    self._branch_key(branch), {**st, "staging_seq": seq}, ver
                )
                return seq
            except CASConflictError:
                continue
        raise TooManyTriesError(f"staging_seq bump on {branch!r} kept losing the CAS race")

    def stage_entries(self, branch: str, entries: DataFrame, force: bool = False) -> None:
        """Stage upserts (entry-schema rows) onto a branch."""
        self._check_writable("stage_entries", force)
        self._check_protected(branch, "staging_write")
        seq = self._next_seq(branch)
        out = entries.select(*ENTRY_COLS).withColumn("is_tombstone", F.lit(False))
        # seq lives in the partition dir name (discovered on read)
        out.select("is_tombstone", *ENTRY_COLS).write.mode("overwrite").parquet(
            os.path.join(self._staging_dir(branch), f"seq={seq}")
        )

    def stage_deletes(self, branch: str, keys: DataFrame | list[str], force: bool = False) -> None:
        """Stage tombstones for the given keys."""
        self._check_writable("stage_deletes", force)
        self._check_protected(branch, "staging_write")
        if isinstance(keys, list):
            keys = self.spark.createDataFrame([(k,) for k in keys], "key string")
        seq = self._next_seq(branch)
        out = keys.select(
            F.lit(True).alias("is_tombstone"),
            F.col("key"),
            F.lit(None).cast("string").alias("identity"),
            F.lit(None).cast("string").alias("address"),
            F.lit(None).cast("string").alias("address_type"),
            F.lit(None).cast("long").alias("size"),
            F.lit(None).cast("string").alias("etag"),
            F.lit(None).cast("timestamp").alias("last_modified"),
            F.lit(None).cast("map<string,string>").alias("metadata"),
            F.lit(None).cast("string").alias("content_type"),
        )
        out.write.mode("overwrite").parquet(
            os.path.join(self._staging_dir(branch), f"seq={seq}")
        )
        self._maybe_fire_delete_sensor(branch)

    def set_entry(
        self,
        branch: str,
        entry: dict,
        if_absent: bool = False,
        expected_identity: str | None | object = _UNSET,
        force: bool = False,
    ) -> None:
        """Stage a single entry with optional write predicates
        (graveler.go:1866-2003 Set / SetIfAbsent / safe-replace Update).

        ``if_absent=True``: fail with :class:`PreconditionFailedError`
        if the key is currently visible on the branch (staged or
        committed) — the ``IfAbsent`` flag of the reference's Set.
        ``expected_identity``: compare-and-swap on the current visible
        identity (``None`` means "must be absent") — the predicate of
        the reference's conditional ``Update``.

        Single-object path: one manifest-pruned point lookup + one
        single-row staging append; no full-snapshot scan.
        """
        key = entry["key"]
        if if_absent or expected_identity is not _UNSET:
            cur = self.get(branch, key)
            if if_absent and cur is not None:
                raise PreconditionFailedError(f"{key!r} already exists on {branch!r}")
            if expected_identity is not _UNSET:
                cur_ident = cur["identity"] if cur is not None else None
                if cur_ident != expected_identity:
                    raise PreconditionFailedError(
                        f"{key!r}: identity is {cur_ident!r}, expected {expected_identity!r}"
                    )
        row = {c: entry.get(c) for c in ENTRY_COLS}
        self.stage_entries(branch, self.spark.createDataFrame([row], ENTRY_SCHEMA), force=force)

    def _staged_raw(self, branch: str) -> DataFrame | None:
        d = self._staging_dir(branch)
        if not os.path.isdir(d) or not any(
            p.startswith("seq=") for p in os.listdir(d)
        ):
            return None
        # partition discovery finds seq=N; the explicit schema skips the
        # footer-reading schema-inference job every staging read pays
        df = self.spark.read.schema(STAGED_SCHEMA).parquet(d)
        # newest batch wins: overlay orders seq ascending, so negate
        return df.withColumn("seq", -F.col("seq").cast("long")).select(
            "seq", "is_tombstone", *ENTRY_COLS
        )

    def staged_changes(self, branch: str) -> DataFrame | None:
        """One row per staged key (latest write wins), tombstones kept."""
        raw = self._staged_raw(branch)
        if raw is None:
            return None
        return overlay_raw([raw])

    def has_staged(self, branch: str) -> bool:
        if self._read_branch(branch).get("compacted_mid"):
            return True  # compacted-but-uncommitted state is dirty
        s = self.staged_changes(branch)
        return s is not None and not s.isEmpty()

    def staged_tombstone_count(self, branch: str) -> int:
        s = self.staged_changes(branch)
        if s is None:
            return 0
        return s.where(F.col("is_tombstone")).count()

    def set_delete_sensor(self, threshold: int) -> None:
        """Fire a ``delete-threshold`` hook once a branch accumulates
        that many staged tombstones (pkg/graveler/delete_sensor.go:48-125
        — trigger only; the callback typically calls :meth:`compact`)."""
        self._delete_threshold = threshold

    def _maybe_fire_delete_sensor(self, branch: str) -> None:
        thr = getattr(self, "_delete_threshold", None)
        if thr is not None:
            n = self.staged_tombstone_count(branch)
            if n >= thr:
                self._fire("delete-threshold", branch=branch, tombstones=n)

    def enable_auto_compaction(self, threshold: int) -> None:
        """Wire the delete sensor to :meth:`compact`: once a branch
        accumulates ``threshold`` staged tombstones, it is compacted
        automatically — the reference's intended sensor->callback loop
        (pkg/graveler/delete_sensor.go:48-125 triggering the compaction
        the graveler registers). Compaction empties staging into the
        compacted base, so the sensor naturally re-arms."""
        self.set_delete_sensor(threshold)
        self.on(
            "delete-threshold",
            lambda repo_, event, ctx: repo_.compact(ctx["branch"]),
        )

    def compact(self, branch: str, force: bool = False) -> str:
        """Fold staging into a compacted base metarange
        (CompactedBaseMetaRangeID — graveler.go:541-542,2213).

        Reads and subsequent commits use the compacted snapshot; the
        branch head commit is unchanged, so the state stays uncommitted
        (and the branch dirty) until the next commit.
        """
        self._check_writable("compact", force)
        changes = self.staged_changes(branch)
        if changes is None:
            raise NoChangesError(f"nothing to compact on {branch!r}")
        st = self._read_branch(branch)
        base_mid = st.get("compacted_mid") or self._metarange_of(st["head"])
        base_manifest = (
            R.read_manifest(self.store, base_mid) if base_mid != R.EMPTY_METARANGE else None
        )
        new_manifest = self._apply_staged_local(branch, base_manifest)
        if new_manifest is None:
            new_manifest = apply_changes(
                self.spark, self.root, base_manifest, changes.drop("seq"), self.raggedness
            )
        mid = (
            R.write_manifest(new_manifest, self.store)
            if len(new_manifest)
            else R.EMPTY_METARANGE
        )
        # compaction is invalid if a commit landed mid-flight (it was
        # computed on the old head); no retry here — the staged changes
        # are untouched, the caller can re-compact
        self._cas_update(branch, st["head"], {"compacted_mid": mid})
        self._clear_staging(branch)
        return mid

    def _clear_staging(self, branch: str) -> None:
        shutil.rmtree(self._staging_dir(branch), ignore_errors=True)

    def reset_branch(self, branch: str, prefix: str | None = None, key: str | None = None,
                     force: bool = False) -> None:
        """Drop staged changes: all, one key, or a prefix
        (Reset/ResetKey/ResetPrefix — graveler.go:2576-2828). A full
        reset also discards a pending compacted base."""
        self._check_writable("reset_branch", force)
        d = self._staging_dir(branch)
        if prefix is None and key is None:
            self._clear_staging(branch)
            for _ in range(self._CAS_MERGE_MAX_TRIES):
                st, ver = self._get_branch(branch)
                if not st.get("compacted_mid"):
                    break
                st.pop("compacted_mid", None)
                try:
                    self.store.put_doc_if(self._branch_key(branch), st, ver)
                    break
                except CASConflictError:
                    continue
            return
        raw = self._staged_raw(branch)
        if raw is None:
            return
        if key is not None:
            kept = raw.where(F.col("key") != key)
        else:
            kept = raw.where(~F.col("key").startswith(prefix))
        kept = kept.withColumn("seq", -F.col("seq"))  # undo negation
        tmp = d + ".rewrite"
        kept.write.mode("overwrite").partitionBy("seq").parquet(tmp)
        # one barrier: the rewrite must materialize before the swap
        shutil.rmtree(d, ignore_errors=True)
        os.replace(tmp, d)

    # -- reads -------------------------------------------------------------

    def snapshot(
        self,
        ref: str,
        key_lower: str | None = None,
        key_upper: str | None = None,
        limit_hint: int | None = None,
    ) -> DataFrame:
        """Entries visible at a ref. Bare branch names include staging.

        ``limit_hint`` promises the caller consumes at most that many
        rows in ascending key order; it enables the manifest-count
        window prune ONLY when no staging overlay applies (staged
        tombstones could push a page's cutoff past any committed-count
        window, so an overlaid read must scan the full bounds).
        """
        r = self.resolve(ref)
        base_mid = self._metarange_of(r.commit_id)
        staged = None
        if r.staging:
            cmid = self._read_branch(r.branch).get("compacted_mid")
            if cmid:
                base_mid = cmid
            staged = self._staged_raw(r.branch)
        committed = R.read_snapshot(
            self.spark,
            self.store,
            base_mid,
            key_lower,
            key_upper,
            min_rows=limit_hint if staged is None else None,
        )
        if staged is None:
            return committed
        if key_lower is not None:
            staged = staged.where(F.col("key") >= key_lower)
        if key_upper is not None:
            staged = staged.where(F.col("key") < key_upper)
        return overlay([staged, with_layer(committed, 1 << 60)])

    def list_entries(
        self,
        ref: str,
        prefix: str = "",
        after: str = "",
        delimiter: str = "",
        limit: int | None = None,
    ) -> DataFrame:
        upper = upper_bound_for_prefix(prefix) if prefix else None
        lower = prefix or None
        # resume-cursor pushdown: a page after `after` only needs keys
        # strictly greater, so prune the snapshot read (manifest ranges
        # + parquet scan) at after+'\x00'. Safe with a delimiter too: a
        # group whose derived prefix <= after is re-derived from its
        # remaining members and dropped by the post-fold `key > after`
        # filter, exactly as with an unpruned scan — but later pages no
        # longer re-read the whole listed range (the reference's SeekGE
        # resume, pkg/catalog/entry_listing_iterator.go:70-74).
        if after and (lower is None or after >= lower):
            lower = after + "\x00"
        # Flat listings consume exactly `limit` raw rows in key order, so
        # the snapshot read can window-prune by manifest counts. With a
        # delimiter the limit counts folded groups — one group can span
        # arbitrarily many raw rows, so no raw-row window bound exists.
        snap = self.snapshot(
            ref,
            key_lower=lower,
            key_upper=upper,
            limit_hint=limit if not delimiter else None,
        )
        return _list_entries(snap, prefix=prefix, after=after, delimiter=delimiter, limit=limit)

    def list_page(
        self,
        ref: str,
        prefix: str = "",
        after: str = "",
        delimiter: str = "",
        amount: int = 1000,
    ) -> tuple[list, bool]:
        """One listing page + ``has_more``, via the reference's
        ``amount+1`` probe (pkg/catalog/catalog.go:1270-1325).

        Committed refs with a small pruned interval are served by the
        driver-side page reader (locallist — one iterator, zero Spark
        jobs, same rows; pinned in tests/test_locallist.py); staging
        overlays and big intervals take the DataFrame path."""
        mid = self._committed_view_mid(ref)
        if mid is not None and locallist.LOCAL_LIST_ROWS > 0:
            manifest = (
                R.read_manifest(self.store, mid)
                if mid != R.EMPTY_METARANGE
                else pd.DataFrame(columns=R.MANIFEST_COLS)
            )
            rows = locallist.page_local(
                self.store, manifest, prefix, after, delimiter, amount
            )
            if rows is not None:
                return rows[:amount], len(rows) > amount
        rows = self.list_entries(
            ref, prefix=prefix, after=after, delimiter=delimiter, limit=amount + 1
        ).collect()
        return rows[:amount], len(rows) > amount

    def count_entries(self, ref: str) -> int:
        """Row count of ``snapshot(ref)`` with zero Spark jobs on
        committed views: ranges partition the keyspace disjointly (the
        global key order invariant), so the manifest's count column
        sums to exactly the snapshot's row count. A live staging
        overlay (tombstones/upserts change visibility) falls back to
        the DataFrame count."""
        mid = self._committed_view_mid(ref)
        # honor the same kill-switch as every other driver fast path
        # (get, list_page, _identities_by_range): LOCAL_LIST_ROWS=0
        # must force the distributed count for equivalence/debug runs
        if mid is None or locallist.LOCAL_LIST_ROWS <= 0:
            return self.snapshot(ref).count()
        if mid == R.EMPTY_METARANGE:
            return 0
        return int(R.read_manifest(self.store, mid)["count"].astype("int64").sum())

    def _committed_view_mid(self, ref: str) -> str | None:
        """The metarange that IS the ref's full visible state, or None
        when a staging overlay applies (driver fast paths bail)."""
        r = self.resolve(ref)
        mid = self._metarange_of(r.commit_id)
        if r.staging:
            st = self._read_branch(r.branch)
            cmid = st.get("compacted_mid")
            if cmid:
                mid = cmid
            d = self._staging_dir(r.branch)
            if os.path.isdir(d) and any(p.startswith("seq=") for p in os.listdir(d)):
                return None
        return mid

    def get(self, ref: str, key: str):
        """Point lookup: manifest-pruned single-range read (served
        driver-side on committed refs — locallist.get_local)."""
        mid = self._committed_view_mid(ref)
        if mid is not None and locallist.LOCAL_LIST_ROWS > 0:
            if mid == R.EMPTY_METARANGE:
                return None
            handled, row = locallist.get_local(
                self.store, R.read_manifest(self.store, mid), key
            )
            if handled:
                return row
        upper = key + "\x00"
        rows = self.snapshot(ref, key_lower=key, key_upper=upper).where(
            F.col("key") == key
        ).collect()
        return rows[0] if rows else None

    # -- diff --------------------------------------------------------------

    def _manifest_or_empty(self, mid: str) -> pd.DataFrame:
        return (
            R.read_manifest(self.store, mid)
            if mid != R.EMPTY_METARANGE
            else pd.DataFrame(columns=R.MANIFEST_COLS)
        )

    def _pruned_sides(self, left_mid: str, right_mid: str) -> tuple[DataFrame, DataFrame]:
        """Rows of only the ranges that differ between two manifests —
        the whole-range fast path of diff.go:151,238-247."""
        lm = (
            R.read_manifest(self.store, left_mid)
            if left_mid != R.EMPTY_METARANGE
            else pd.DataFrame(columns=R.MANIFEST_COLS)
        )
        rm = (
            R.read_manifest(self.store, right_mid)
            if right_mid != R.EMPTY_METARANGE
            else pd.DataFrame(columns=R.MANIFEST_COLS)
        )
        lids, rids = set(lm["range_id"]), set(rm["range_id"])
        left_rows = R.read_ranges(self.spark, self.store, sorted(lids - rids))
        right_rows = R.read_ranges(self.spark, self.store, sorted(rids - lids))
        return left_rows, right_rows

    def diff(self, left_ref: str, right_ref: str) -> DataFrame:
        """2-way diff between two refs (committed snapshots), scanning
        only ranges whose content differs."""
        lmid = self._metarange_of(self.resolve(left_ref).commit_id)
        rmid = self._metarange_of(self.resolve(right_ref).commit_id)
        if lmid == rmid:
            return diff_ops.diff(R.empty_entries(self.spark), R.empty_entries(self.spark))
        left_rows, right_rows = self._pruned_sides(lmid, rmid)
        return diff_ops.diff(left_rows, right_rows)

    def uncommitted(self, branch: str) -> DataFrame:
        """Diff of uncommitted state (staging + pending compaction) vs
        the branch's committed head."""
        st = self._read_branch(branch)
        staged = self.staged_changes(branch)
        cmid = st.get("compacted_mid")
        head_mid = self._metarange_of(st["head"])
        if cmid is None:
            if staged is None:
                return diff_ops.diff(R.empty_entries(self.spark), R.empty_entries(self.spark))
            # prune to ranges covering any staged key: a one-key staged
            # change on a 10^4-range snapshot reads one range file, not
            # the repo (same executor-side interval probe as the
            # compacted path below)
            hm = (
                R.read_manifest(self.store, head_mid)
                if head_mid != R.EMPTY_METARANGE
                else pd.DataFrame(columns=R.MANIFEST_COLS)
            )
            staged = staged.persist()
            try:
                touched = commit_apply.ranges_containing_keys(self.spark, hm, staged)
                committed = R.read_ranges(self.spark, self.store, sorted(touched))
                return diff_ops.uncommitted_diff(staged, committed)
            finally:
                staged.unpersist()
        # compacted branch: 2-way diff head -> overlay(staged, compacted),
        # pruned to (a) ranges whose id differs between the two manifests
        # and (b) ranges covering any staged key (sound: a range selected
        # on one side has its key-overlapping counterpart selected too)
        lm = (
            R.read_manifest(self.store, head_mid)
            if head_mid != R.EMPTY_METARANGE
            else pd.DataFrame(columns=R.MANIFEST_COLS)
        )
        rm = (
            R.read_manifest(self.store, cmid)
            if cmid != R.EMPTY_METARANGE
            else pd.DataFrame(columns=R.MANIFEST_COLS)
        )
        lsel = set(lm["range_id"]) - set(rm["range_id"])
        rsel = set(rm["range_id"]) - set(lm["range_id"])
        if staged is not None:
            # executor-side interval probe: the staged key stream never
            # reaches the driver (commit_apply.ranges_containing_keys).
            # persist only for the two probe passes, then unpersist: Spark's
            # CacheManager matches by logical plan, so a lingering cache of
            # the staging-dir read would serve stale rows to any later
            # staged_changes() over the same path.
            staged = staged.persist()
            try:
                for mf, sel in ((lm, lsel), (rm, rsel)):
                    sel.update(
                        commit_apply.ranges_containing_keys(self.spark, mf, staged)
                    )
            finally:
                staged.unpersist()
        left_rows = R.read_ranges(self.spark, self.store, sorted(lsel))
        compacted_rows = R.read_ranges(self.spark, self.store, sorted(rsel))
        if staged is None:
            effective = compacted_rows
        else:
            effective = overlay([staged, with_layer(compacted_rows, 1 << 60)])
        return diff_ops.diff(left_rows, effective)

    # -- commit ------------------------------------------------------------

    def commit(
        self,
        branch: str,
        message: str,
        committer: str = "lakefs_spark",
        metadata: dict[str, str] | None = None,
        allow_empty: bool = False,
        date: float | None = None,
        pointer_extra: dict | None = None,
        force: bool = False,
    ) -> Commit:
        """Commit staged changes (copy-on-write apply; graveler.go:2239-2406).

        ``pointer_extra`` fields ride the same atomic pointer CAS as the
        head swap (used by streaming ingest to bind the microbatch epoch
        to the commit — the Delta txn-version idempotent-sink pattern).
        """
        self._check_writable("commit", force)
        self._check_protected(branch, "commit")
        # prepare-commit fires while staging is still writable, then the
        # abortable pre-commit (pkg/actions/event.go:16-32 ordering)
        self._fire("prepare-commit", branch=branch, message=message,
                   metadata=metadata or {})
        self._fire("pre-commit", branch=branch, message=message,
                   metadata=metadata or {})

        def attempt() -> Commit:
            # each try re-reads the head, so a retry after a lost CAS
            # recomputes the apply on the commit that won the race
            st = self._read_branch(branch)
            changes = self.staged_changes(branch)
            head_mid = self._metarange_of(st["head"])
            # commits apply on top of a pending compacted base when present
            # (CompactedBaseMetaRangeID — graveler.go:541-542)
            base_mid = st.get("compacted_mid") or head_mid
            if changes is None:
                if base_mid == head_mid and not allow_empty:
                    raise NoChangesError(f"no staged changes on {branch!r}")
                new_manifest = (
                    R.read_manifest(self.store, base_mid)
                    if base_mid != R.EMPTY_METARANGE
                    else pd.DataFrame(columns=R.MANIFEST_COLS)
                )
            else:
                base_manifest = (
                    R.read_manifest(self.store, base_mid)
                    if base_mid != R.EMPTY_METARANGE
                    else None
                )
                new_manifest = self._apply_staged_local(branch, base_manifest)
                if new_manifest is None:
                    new_manifest = apply_changes(
                        self.spark, self.root, base_manifest, changes.drop("seq"), self.raggedness
                    )
            new_mid = (
                R.write_manifest(new_manifest, self.store)
                if len(new_manifest)
                else R.EMPTY_METARANGE
            )
            if new_mid == head_mid and not allow_empty:
                raise NoChangesError(f"staged changes are a no-op on {branch!r}")
            commit = self.commits.create(
                parents=[st["head"]] if st["head"] else [],
                metarange_id=new_mid,
                message=message,
                committer=committer,
                metadata=metadata,
                creation_date=date,
            )
            # atomic pointer CAS on the head observed at the top of this
            # attempt; a lost race raises BranchChangedError -> retry
            # (an orphaned commit object from a lost try is unreferenced
            # and swept by GC, matching the reference's behavior)
            self._cas_update(
                branch, st["head"], {"head": commit.commit_id, **(pointer_extra or {})}
            )
            return commit

        commit = self._retry_branch_update(branch, attempt)
        self.reset_branch(branch, force=force)
        self._fire("post-commit", branch=branch, commit=commit)
        return commit

    def _apply_staged_local(self, branch: str, base_manifest) -> pd.DataFrame | None:
        """Driver-side apply of a SMALL staged layer (localapply): the
        size gate reads only parquet footers and the base manifest, so
        a big commit costs two metadata probes and falls through to the
        distributed apply (returns None). Bit-identical manifests are
        pinned in tests/test_localapply.py."""
        if localapply.LOCAL_APPLY_ROWS <= 0:
            return None
        staged = localapply.load_staged_small(
            self._staging_dir(branch), localapply.LOCAL_APPLY_ROWS
        )
        if staged is None:
            return None
        ch = localapply.staged_to_changes(staged)
        if localapply.rebuild_rows_estimate(base_manifest, ch) > localapply.LOCAL_APPLY_ROWS:
            return None
        return localapply.apply_changes_local(
            self.store, base_manifest, ch, self.raggedness
        )

    # -- merge family ------------------------------------------------------

    def _three_way_changes(
        self,
        base_cid: str | None,
        source_cid: str | None,
        dest_cid: str | None,
        strategy: str,
        resolvers=None,
    ) -> DataFrame | list:
        base_mid = self._metarange_of(base_cid)
        src_mid = self._metarange_of(source_cid)
        dst_mid = self._metarange_of(dest_cid)
        # small-merge fast path (localapply): when the pruned diff
        # inputs are provably small BY MANIFEST COUNTS, compute the
        # whole action ladder driver-side — zero Spark jobs for the
        # 1-key merges that dominate lifecycle flows. User resolver
        # chains are Spark Column expressions, so they always take the
        # distributed ladder.
        if resolvers is None and localapply.LOCAL_APPLY_ROWS > 0:
            acts = localapply.merge_actions_small(
                self.store,
                self._manifest_or_empty(base_mid),
                self._manifest_or_empty(src_mid),
                self._manifest_or_empty(dst_mid),
                strategy,
                localapply.LOCAL_APPLY_ROWS,
            )
            if acts is not None:
                return acts
        # strategy-independent double-diff memo: a conflict-detect merge
        # followed by a strategy=src retry of the SAME commit triple
        # (the b5 shape) recomputed the identical two-sided diff — the
        # expensive part of the merge — twice. The joined qualified
        # stream depends only on the three immutable metarange ids (and
        # on whether dest payload is shipped, i.e. resolvers), so it is
        # memoized persisted per (base, src, dst) and the cheap
        # strategy CASE ladder re-runs on top. Scoped to one API
        # sequence: cleared on every successful branch write
        # (_cas_update), bounded by _MERGE_MEMO_MAX, in-memory only.
        memo_key = (base_mid, src_mid, dst_mid)
        if resolvers is None and _MERGE_MEMO_MAX > 0:
            j = self._merge_join_memo.get(memo_key)
            if j is not None:
                return merge_ops.actions_from_joined(j, strategy, None)
        sdiff_l, sdiff_r = self._pruned_sides(base_mid, src_mid)
        ddiff_l, ddiff_r = self._pruned_sides(base_mid, dst_mid)
        # merge_changes_from_sides slims both base sides to
        # (key, identity) before their exchanges — the base payload is
        # provably unused by the merge ladder (removed rows' payload is
        # nulled; every other payload comes from the side) — instead
        # of the previous diff()-then-qualify shape whose CASE ladder
        # defeated Catalyst's column pruning on the source diff's base
        # side (plans/r10/b4_merge_actions_before.txt Exchange (3): 9
        # columns incl. from_json(metadata)).
        if resolvers is not None or _MERGE_MEMO_MAX <= 0:
            return merge_ops.merge_changes_from_sides(
                sdiff_l, sdiff_r, ddiff_l, ddiff_r, strategy, resolvers
            )
        sq = merge_ops._qualified_side(sdiff_l, sdiff_r, "s", with_payload=True)
        dq = merge_ops._qualified_side(ddiff_l, ddiff_r, "d", with_payload=False)
        j = merge_ops.qualified_join(sq, dq).persist()
        while len(self._merge_join_memo) >= _MERGE_MEMO_MAX:
            self._merge_join_memo.pop(next(iter(self._merge_join_memo))).unpersist()
        self._merge_join_memo[memo_key] = j
        return merge_ops.actions_from_joined(j, strategy, None)

    def _apply_actions_commit(
        self,
        branch: str,
        actions: DataFrame,
        parents: list[str],
        message: str,
        committer: str,
        metadata: dict[str, str] | None,
        expected_head: str | None,
        allow_empty: bool = False,
        date: float | None = None,
    ) -> Commit:
        if isinstance(actions, list):
            # locally-computed action stream (small merge): conflict and
            # no-op gates are plain Python, the apply is driver-side
            # unless the touched ranges are too fat for it
            counts_l: dict[str, int] = {}
            for a in actions:
                counts_l[a["action"]] = counts_l.get(a["action"], 0) + 1
            if counts_l.get("conflict"):
                raise ConflictError(localapply.conflicts_df(self.spark, actions))
            if not counts_l and not allow_empty:
                raise NoChangesError("merge produced no changes")
            dest_mid = self._metarange_of(expected_head)
            base_manifest = (
                R.read_manifest(self.store, dest_mid)
                if dest_mid != R.EMPTY_METARANGE
                else None
            )
            ch = localapply.changes_of_actions(actions)
            if localapply.rebuild_rows_estimate(base_manifest, ch) <= localapply.LOCAL_APPLY_ROWS:
                new_manifest = localapply.apply_changes_local(
                    self.store, base_manifest, ch, self.raggedness
                )
            else:
                new_manifest = apply_changes(
                    self.spark, self.root, base_manifest,
                    localapply.changes_df(self.spark, ch), self.raggedness,
                )
            return self._finish_actions_commit(
                branch, new_manifest, parents, message, committer, metadata,
                expected_head, date,
            )
        # the action stream is an expensive double-diff join evaluated by
        # the conflict check, the no-op check, and the apply — cache it
        # and gate with ONE probe job instead of two isEmpty probes.
        # When the dest manifest is small enough to broadcast, that same
        # job also computes the touched base positions and the
        # change-side boundary keys the COW apply needs, so the apply
        # skips its own probe job (guide §1.2: at small-op sizes the
        # sequential job COUNT dominates a storage op).
        actions = actions.persist()
        dest_mid = self._metarange_of(expected_head)
        base_manifest = (
            R.read_manifest(self.store, dest_mid) if dest_mid != R.EMPTY_METARANGE else None
        )
        # the counts aggregation runs ALONE first: it materializes the
        # expensive double-diff into the cache exactly once (a fused
        # multi-branch probe would race its branches on the cold cache
        # and evaluate the diff once per branch), and it is the
        # conflict/no-op gate — a conflicted merge never pays the probe
        counts = {
            r["action"]: r["n"]
            for r in actions.groupBy("action").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        if counts.get("conflict"):
            # materialize the conflict set from the still-cached action
            # stream (cheap) BEFORE dropping the cache: the caller WILL
            # inspect it (count, list, resolve), and without the
            # checkpoint every inspection re-runs the whole double-diff
            conflicts = actions.where(F.col("action") == "conflict").localCheckpoint()
            actions.unpersist()
            raise ConflictError(conflicts)
        changes = actions.where(F.col("action") != "conflict").select(
            (F.col("action") == "delete").alias("is_tombstone"),
            F.col("key"),
            F.col("identity"),
            *[F.col(c) for c in ENTRY_COLS if c not in ("key", "identity")],
        )
        if not counts and not allow_empty:
            actions.unpersist()
            raise NoChangesError("merge produced no changes")
        try:
            # with the cache now warm, one probe job delivers the
            # touched positions + change-side boundary keys the apply
            # needs (replacing its own probe job)
            probe = None
            if base_manifest is not None and len(base_manifest) and len(
                base_manifest
            ) <= commit_apply.LARGE_MANIFEST_ROWS:
                mf = base_manifest.sort_values("min_key").reset_index(drop=True)
                _, touched, bk_all, bk_nontomb = commit_apply.probe_stream(
                    self.spark,
                    mf["max_key"].tolist(),
                    actions,
                    self.raggedness,
                    action_col="action",
                    include_counts=False,
                )
                probe = (touched, bk_all, bk_nontomb)
            new_manifest = None
            if localapply.LOCAL_APPLY_ROWS > 0:
                n_changes = sum(
                    int(v) for a, v in counts.items() if a != "conflict"
                )
                rebuild = None
                if probe is not None:
                    # touched positions index the min_key-sorted manifest
                    mfs = base_manifest.sort_values("min_key").reset_index(drop=True)
                    rebuild = n_changes + int(
                        mfs["count"].astype("int64").iloc[sorted(probe[0])].sum()
                    )
                elif base_manifest is None or not len(base_manifest):
                    rebuild = n_changes  # merge onto an empty tree
                if rebuild is not None and rebuild <= localapply.LOCAL_APPLY_ROWS:
                    # the action stream is already materialized in the
                    # cache; collecting <= LOCAL_APPLY_ROWS rows is the
                    # cheap side of skipping the apply's 3 Spark jobs
                    ch = localapply.rows_to_changes(changes.collect())
                    new_manifest = localapply.apply_changes_local(
                        self.store, base_manifest, ch, self.raggedness
                    )
            if new_manifest is None:
                new_manifest = apply_changes(
                    self.spark, self.root, base_manifest, changes, self.raggedness,
                    probe=probe,
                )
        finally:
            actions.unpersist()
        return self._finish_actions_commit(
            branch, new_manifest, parents, message, committer, metadata,
            expected_head, date,
        )

    def _finish_actions_commit(
        self,
        branch: str,
        new_manifest,
        parents: list[str],
        message: str,
        committer: str,
        metadata: dict[str, str] | None,
        expected_head: str | None,
        date: float | None,
    ) -> Commit:
        new_mid = (
            R.write_manifest(new_manifest, self.store)
            if len(new_manifest)
            else R.EMPTY_METARANGE
        )
        commit = self.commits.create(
            parents=parents,
            metarange_id=new_mid,
            message=message,
            committer=committer,
            metadata=metadata,
            creation_date=date,
        )
        # atomic CAS on the head the caller computed against; a lost race
        # surfaces BranchChangedError so the caller's retry loop can
        # recompute the diffs on the new head (graveler.go:2422-2475)
        self._cas_update(branch, expected_head, {"head": commit.commit_id})
        return commit

    def merge(
        self,
        source_ref: str,
        dest_branch: str,
        strategy: str = "none",
        squash: bool = False,
        message: str | None = None,
        committer: str = "lakefs_spark",
        metadata: dict[str, str] | None = None,
        date: float | None = None,
        resolvers=None,
        force: bool = False,
    ) -> Commit:
        """3-way merge source into dest (graveler.go:3115-3257).

        Dest must be clean (ErrDirtyBranch); conflicts raise unless
        resolved by strategy or a ``resolvers`` chain (the pluggable
        ConflictResolver extension point,
        pkg/graveler/committed/merge.go:304-331,523-534 — see
        operators/merge.py resolvers); result commit has parents
        [dest, source] (dest first — graveler.go:3192), or [dest]
        when squashed.
        """
        self._check_writable("merge", force)
        if self.has_staged(dest_branch):
            raise DirtyBranchError(f"destination branch {dest_branch!r} has uncommitted changes")
        # the pending merge commit's message/metadata ride the ctx, like
        # pre-commit: a metadata-validator hook must see what will land
        self._fire("pre-merge", source=source_ref, dest=dest_branch,
                   message=message or f"merge {source_ref} into {dest_branch}",
                   metadata=metadata or {})
        source_cid = self.resolve(source_ref).commit_id
        if source_cid is None:
            raise RefError("source has no commits")

        def attempt() -> Commit:
            # re-read dest head per try: a retry recomputes the 3-way
            # diffs against whatever commit won the race
            dest_cid = self._read_branch(dest_branch)["head"]
            base_cid = merge_base(self.commits, source_cid, dest_cid) if dest_cid else None
            actions = self._three_way_changes(
                base_cid, source_cid, dest_cid, strategy, resolvers
            )
            parents = [dest_cid] if squash else [dest_cid, source_cid]
            parents = [p for p in parents if p]
            return self._apply_actions_commit(
                dest_branch,
                actions,
                parents,
                message or f"merge {source_ref} into {dest_branch}",
                committer,
                metadata,
                expected_head=dest_cid,
                date=date,
            )

        commit = self._retry_branch_update(dest_branch, attempt)
        self._fire("post-merge", source=source_ref, dest=dest_branch, commit=commit)
        return commit

    def revert(
        self,
        branch: str,
        ref: str,
        parent_number: int = 1,
        committer: str = "lakefs_spark",
        date: float | None = None,
        force: bool = False,
    ) -> Commit:
        """Apply the inverse of a commit: 3-way with base=commit,
        source=commit's parent (graveler.go:2829-2960)."""
        self._check_writable("revert", force)
        if self.has_staged(branch):
            raise DirtyBranchError(f"branch {branch!r} has uncommitted changes")
        cid = self.resolve(ref).commit_id
        c = self.commits.get(cid)
        if c.parents and not 1 <= parent_number <= len(c.parents):
            raise RefError(
                f"commit {cid[:12]} has {len(c.parents)} parent(s); "
                f"parent_number {parent_number} is out of range"
            )
        parent = c.parents[parent_number - 1] if c.parents else None
        self._fire("pre-revert", branch=branch, ref=cid)

        def attempt() -> Commit:
            head = self._read_branch(branch)["head"]
            actions = self._three_way_changes(cid, parent, head, "none")
            return self._apply_actions_commit(
                branch,
                actions,
                [head],
                f"revert {cid[:12]}",
                committer,
                None,
                expected_head=head,
                date=date,
            )

        commit = self._retry_branch_update(branch, attempt)
        self._fire("post-revert", branch=branch, ref=cid, commit=commit)
        return commit

    def cherry_pick(
        self,
        branch: str,
        ref: str,
        parent_number: int = 1,
        committer: str = "lakefs_spark",
        date: float | None = None,
        force: bool = False,
    ) -> Commit:
        """Apply one commit's change onto branch: base=picked parent,
        source=picked commit (graveler.go:2961-3114)."""
        self._check_writable("cherry_pick", force)
        if self.has_staged(branch):
            raise DirtyBranchError(f"branch {branch!r} has uncommitted changes")
        cid = self.resolve(ref).commit_id
        c = self.commits.get(cid)
        if c.parents and not 1 <= parent_number <= len(c.parents):
            raise RefError(
                f"commit {cid[:12]} has {len(c.parents)} parent(s); "
                f"parent_number {parent_number} is out of range"
            )
        parent = c.parents[parent_number - 1] if c.parents else None
        self._fire("pre-cherry-pick", branch=branch, ref=cid)

        def attempt() -> Commit:
            head = self._read_branch(branch)["head"]
            actions = self._three_way_changes(parent, cid, head, "none")
            return self._apply_actions_commit(
                branch,
                actions,
                [head],
                f"cherry-pick {cid[:12]}",
                committer,
                None,
                expected_head=head,
                date=date,
            )

        commit = self._retry_branch_update(branch, attempt)
        self._fire("post-cherry-pick", branch=branch, ref=cid, commit=commit)
        return commit

    # -- import ------------------------------------------------------------

    def import_entries(
        self,
        branch: str,
        entries: DataFrame,
        replace_prefixes: list[str] | None = None,
        message: str = "import",
        committer: str = "lakefs_spark",
        date: float | None = None,
        force: bool = False,
    ) -> Commit:
        """Bulk import with SkipPrefix semantics, range-granular COW
        (pkg/graveler/committed/manager.go:215-236, skip_prefix_iterator.go):
        dest ranges fully inside/outside the replaced prefixes are
        dropped/kept without being read; without prefixes the import is
        a COW upsert. Cost O(import + boundary ranges), not O(repo)."""
        from lakefs_spark.operators.overlay import dedup_entries
        from lakefs_spark.storage.commit_apply import import_apply

        self._check_writable("import_entries", force)
        self._check_protected(branch, "commit")
        ents_raw = entries.select(*ENTRY_COLS)
        ents = dedup_entries(ents_raw)

        def attempt() -> Commit:
            st = self._read_branch(branch)
            head = st["head"]
            # a pending compacted base IS the branch's committed view —
            # importing over head_mid alone would orphan it (reads
            # prefer compacted_mid, the next commit would rebuild from
            # it and silently drop the import)
            head_mid = st.get("compacted_mid") or self._metarange_of(head)
            base_manifest = (
                R.read_manifest(self.store, head_mid) if head_mid != R.EMPTY_METARANGE else None
            )
            if replace_prefixes:
                new_manifest = import_apply(
                    self.spark, self.root, base_manifest, ents, replace_prefixes, self.raggedness
                )
            elif base_manifest is None:
                # first import into an empty tree: no COW to do, so the
                # dedup window is folded into the chunk shuffle
                # (write_ranges dedup=True) — ONE full-payload exchange
                # for the whole import instead of two (guide §2.4);
                # same deterministic winners, same boundary set, same
                # range content-addresses as dedup_entries + write.
                new_manifest = R.write_ranges(
                    ents_raw, self.root, self.raggedness, dedup=True
                )
            else:
                changes = ents.select(
                    F.lit(False).alias("is_tombstone"), *[F.col(c) for c in ENTRY_COLS]
                )
                new_manifest = apply_changes(
                    self.spark, self.root, base_manifest, changes, self.raggedness
                )
            new_mid = R.write_manifest(new_manifest, self.store)
            commit = self.commits.create(
                parents=[head] if head else [],
                metarange_id=new_mid,
                message=message,
                committer=committer,
                creation_date=date,
            )
            self._cas_update(
                branch, head, {"head": commit.commit_id}, drop=("compacted_mid",)
            )
            return commit

        return self._retry_branch_update(branch, attempt)

    def import_via_hidden_branch(
        self,
        branch: str,
        entries: DataFrame,
        replace_prefixes: list[str] | None = None,
        message: str = "import",
        committer: str = "lakefs_spark",
        date: float | None = None,
        force: bool = False,
    ) -> Commit:
        """The reference's import topology (pkg/catalog import flow +
        graveler.go:227-267 WithHidden): stage the import on a hidden
        work branch forked from the target, commit there, then merge
        back source-wins. Readers of ``branch`` never observe a partial
        import, listings never show the work branch, and an aborted
        import leaves the target untouched (the work branch is deleted
        on every exit path)."""
        import_branch = f"_import-{int(time.time() * 1e6):016x}-{os.urandom(3).hex()}"
        self.create_branch(import_branch, branch, force=force, hidden=True)
        try:
            self.import_entries(
                import_branch, entries, replace_prefixes,
                message=message, committer=committer, date=date, force=force,
            )
            return self.merge(
                import_branch, branch, strategy="src",
                message=message, committer=committer, date=date, force=force,
            )
        finally:
            try:
                self.delete_branch(import_branch, force=True)
            except Exception as cleanup_err:  # noqa: BLE001
                # cleanup must never mask the import's own outcome (a
                # broad protection rule can block the delete — force
                # bypasses only the read-only check, by design). The
                # leak is NOT free: hidden branches are GC roots, so
                # the work branch pins its import snapshot until
                # deleted — record it so an operator can find it.
                self.store.append_line(
                    "import_leaks",
                    json.dumps({
                        "branch": import_branch,
                        "error": f"{type(cleanup_err).__name__}: {cleanup_err}",
                        "time": time.time(),
                    }),
                )

    # -- log / gc ----------------------------------------------------------

    def log(
        self,
        ref: str,
        first_parent: bool = False,
        since: float | None = None,
        limit: int | None = None,
        after: str | None = None,
    ) -> list[Commit]:
        cid = self.resolve(ref).commit_id
        if cid is None:
            return []
        return log_commits(self.commits, cid, first_parent, since, limit, after)

    def annotate(self, ref: str, prefix: str = "", batch: int = 64) -> DataFrame:
        """Per-object blame (``lakectl annotate`` /
        cmd/lakectl/cmd/annotate.go): for every visible object under
        ``prefix`` at ``ref``, the most recent first-parent commit
        whose diff against its parent touched the object. Returns
        (key, commit_id, message, pos) with pos the 1-based log
        position of the attributed commit.

        Shape: a driver loop over the COMMIT LOG (metadata-sized) in
        rounds of ``batch`` commits. Each round unions the commits'
        manifest-pruned diff key-sets tagged with their log position
        and runs ONE join+min(pos) aggregation — earliest position (=
        most recent commit) attributes the key — then anti-joins the
        attributed keys out of the remainder. So a 10^4-commit history
        pays ~10^4/batch Spark-job overheads, not 10^4 (measured
        ~1.6 s/round at any batch size — overhead-bound, so the default
        batch is 64: 25 s for a 1k-deep full-churn blame vs 98 s at 16,
        tools/profile_commit_graph.py), while no key
        stream ever reaches the driver. Early-exits once every key is
        attributed, so shallow blames over deep histories stop after
        the few rounds that matter (the reference instead runs one
        log-with-path per object — O(objects x history) round trips).
        """
        kl = prefix or None
        ku = upper_bound_for_prefix(prefix) if prefix else None
        head = self.resolve(ref).commit_id
        if head is None:
            return self.spark.createDataFrame(
                [], "key string, commit_id string, message string, pos long"
            )
        # pin the COMMITTED snapshot: staged-uncommitted keys belong to
        # no commit and could never be attributed
        remaining = self.snapshot(head, key_lower=kl, key_upper=ku).select("key")
        commits = self.log(head, first_parent=True)
        parts: list[DataFrame] = []
        batch = max(1, int(batch))
        for start in range(0, len(commits), batch):
            # the empty-check and the remainder anti-join exist only to
            # feed the NEXT round — a first or last round skips them
            # (for a history under one batch that is two whole jobs of
            # the three the loop body pays; round-1 remaining is the
            # snapshot, non-empty whenever anything is attributable)
            if start > 0 and remaining.isEmpty():
                break
            t = self._touched_keys_by_pos(commits, start, batch, prefix, kl, ku)
            # one aggregation per ROUND: keys tagged by log position,
            # earliest position in the round (= most recent commit) wins
            hit = (
                remaining.join(t, "key", "inner")
                .groupBy("key")
                .agg(F.min("pos").alias("pos"))
            )
            parts.append(hit.localCheckpoint())
            if start + batch < len(commits):
                # checkpoint: each round's isEmpty()/scans must not
                # re-run the whole stacked anti-join lineage (quadratic
                # in history)
                remaining = remaining.join(t, "key", "left_anti").localCheckpoint()
        if not parts:
            return self.spark.createDataFrame(
                [], "key string, commit_id string, message string, pos long"
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # commit metadata joins in once at the end (log-sized, broadcast)
        meta = self.spark.createDataFrame(
            [(i + 1, c.commit_id, c.message) for i, c in enumerate(commits)],
            "pos long, commit_id string, message string",
        )
        return out.join(F.broadcast(meta), "pos").select(
            "key", "commit_id", "message", "pos"
        )

    def _touched_keys_by_pos(
        self,
        commits: list,
        start: int,
        batch: int,
        prefix: str,
        kl: str | None,
        ku: str | None,
    ) -> DataFrame:
        """(key, pos) of every key ADDED or CHANGED by each commit in
        ``commits[start:start+batch]`` vs its first parent — the
        batched diff under :meth:`annotate`.

        Instead of one diff subplan per commit (whose broadcast
        exchanges materialize as one Spark job EACH under AQE), the
        round compares manifests driver-side (LRU-cached, free) to find
        each step's added/removed range_ids, prunes them to the prefix
        window, then runs TWO pruned scans total — all new-side ranges
        and all old-side ranges across the whole round, rows tagged
        with their log position via a broadcast (pos, range_id) map —
        and one anti-join on (pos, key, identity). Rows in rewritten
        boundary ranges whose (key, identity) also appear on the old
        side cancel out, which is exactly diff_type != 'removed'."""
        new_map: list[tuple[int, str]] = []
        old_map: list[tuple[int, str]] = []

        def window_ids(mid: str) -> set[str]:
            if mid == R.EMPTY_METARANGE:
                return set()
            mf = R.read_manifest(self.store, mid)
            if kl is not None:
                mf = mf[mf["max_key"] >= kl]
            if ku is not None:
                mf = mf[mf["min_key"] < ku]
            return set(mf["range_id"])

        for off, c in enumerate(commits[start : start + batch]):
            pos = start + off + 1
            pmid = (
                self.commits.get(c.parents[0]).metarange_id
                if c.parents
                else R.EMPTY_METARANGE
            )
            ids_new = window_ids(c.metarange_id)
            ids_old = window_ids(pmid)
            new_map += [(pos, rid) for rid in sorted(ids_new - ids_old)]
            old_map += [(pos, rid) for rid in sorted(ids_old - ids_new)]

        def side(rmap: list[tuple[int, str]]) -> DataFrame:
            if not rmap:
                return self.spark.createDataFrame(
                    [], "pos long, key string, identity string"
                )
            paths = R._range_paths(self.store, sorted({rid for _, rid in rmap}))
            scan = self.spark.read.schema(R.RANGE_FILE_SCHEMA).parquet(*paths)
            if prefix:
                scan = scan.where(F.col("key").startswith(prefix))
            tag = self.spark.createDataFrame(rmap, "pos long, range_id string")
            return (
                scan.select(
                    F.regexp_extract(
                        F.input_file_name(), r"([^/]+)\.parquet", 1
                    ).alias("range_id"),
                    "key",
                    "identity",
                )
                .join(F.broadcast(tag), "range_id")
                .select("pos", "key", "identity")
            )

        return side(new_map).join(
            side(old_map), ["pos", "key", "identity"], "left_anti"
        ).select("key", "pos")

    def log_with_paths(
        self, ref: str, paths: list[str], limit: int | None = None,
        probe_batch: int = 32,
    ) -> list[Commit]:
        """History filtered to commits that changed any of the paths.

        Two-phase per commit like the reference's GetRangeIDByKey
        pruning (pkg/catalog/catalog.go:1772-1800): (1) a driver-side
        manifest compare (LRU-cached, zero Spark jobs) drops every
        commit whose covering range_ids are identical for all paths;
        (2) survivors are row-probed in BATCHES — one pruned scan per
        ``probe_batch`` candidate commits, keys tagged by range — so a
        deep churn-heavy history pays #candidates/batch Spark-job
        overheads instead of one job pair per step."""
        out: list[Commit] = []
        pending: list[tuple] = []  # (commit, cand, cov_a, cov_b, counts)

        def flush() -> bool:
            """Probe every pending candidate in one job; True = limit hit."""
            if not pending:
                return False
            all_ids: set[str] = set()
            all_keys: set[str] = set()
            counts: dict[str, int] = {}
            for _c, cand, cov_a, cov_b, cnts in pending:
                all_keys.update(cand)
                counts.update(cnts)
                for cov in (cov_a, cov_b):
                    for rids in cov.values():
                        all_ids.update(rids)
            ident = self._identities_by_range(
                all_ids, all_keys, total_rows=sum(counts[r] for r in all_ids)
            )

            def side(cov: dict, p: str):
                for rid in cov.get(p, ()):  # ranges are disjoint: <=1 hit
                    got = ident.get((rid, p))
                    if got is not None:
                        return got
                return None

            for c, cand, cov_a, cov_b, _cnts in pending:
                if any(side(cov_a, p) != side(cov_b, p) for p in cand):
                    out.append(c)
                    if limit is not None and len(out) >= limit:
                        return True
            pending.clear()
            return False

        for c in self.log(ref):
            parent_mid = (
                self.commits.get(c.parents[0]).metarange_id if c.parents else R.EMPTY_METARANGE
            )
            step = self._path_probe_candidates(c.metarange_id, parent_mid, paths)
            if step is None:
                continue
            pending.append((c, *step))
            if len(pending) >= max(1, probe_batch) and flush():
                return out
        flush()
        return out

    def _path_probe_candidates(self, mid_a: str, mid_b: str, paths: list[str]):
        """Driver-side manifest phase: None when no path can have
        changed (identical covering range_ids), else the candidate
        paths plus each side's path -> covering-range_ids map for the
        batched row probe."""
        if mid_a == mid_b:
            return None
        ma = (
            R.read_manifest(self.store, mid_a)
            if mid_a != R.EMPTY_METARANGE
            else pd.DataFrame(columns=R.MANIFEST_COLS)
        )
        mb = (
            R.read_manifest(self.store, mid_b)
            if mid_b != R.EMPTY_METARANGE
            else pd.DataFrame(columns=R.MANIFEST_COLS)
        )

        def covering(mf: pd.DataFrame, path: str, counts: dict[str, int]) -> list[str]:
            hit = mf[(mf["max_key"] >= path) & (mf["min_key"] <= path)]
            counts.update(zip(hit["range_id"], hit["count"].astype("int64")))
            return hit["range_id"].tolist()

        cand: list[str] = []
        cov_a: dict[str, list[str]] = {}
        cov_b: dict[str, list[str]] = {}
        counts: dict[str, int] = {}
        for p in paths:
            ra, rb = covering(ma, p, counts), covering(mb, p, counts)
            if ra != rb:
                cand.append(p)
                cov_a[p] = ra
                cov_b[p] = rb
        if not cand:
            return None
        return cand, cov_a, cov_b, counts

    def _identities_by_range(
        self, range_ids: set[str], keys: set[str], total_rows: int | None = None
    ) -> dict:
        """(range_id, key) -> identity over the given ranges, restricted
        to ``keys`` — ONE pruned scan; result is (|ranges| x |keys|)-
        bounded metadata, never a data stream.

        When the probed ranges are provably small (``total_rows`` from
        manifest counts, same gate as the listing fast path), the probe
        is a driver-side binary search per key through the decoded-range
        LRU — zero Spark jobs; the b6/log-path flows at small scale are
        otherwise one ~0.3-0.5 s job per flush (guide §1.2: the job
        COUNT dominates small metadata ops)."""
        if not range_ids or not keys:
            return {}
        if (
            total_rows is not None
            and locallist.LOCAL_LIST_ROWS > 0
            and total_rows <= locallist.LOCAL_LIST_ROWS
        ):
            import bisect

            out: dict = {}
            skeys = sorted(keys)
            for rid in sorted(range_ids):
                tbl, rkeys = localapply.range_table(self.store, rid)
                ident_col = None
                for k in skeys:
                    i = bisect.bisect_left(rkeys, k)
                    if i < len(rkeys) and rkeys[i] == k:
                        if ident_col is None:
                            ident_col = tbl.column("identity")
                        out[(rid, k)] = ident_col[i].as_py()
            return out
        paths = R._range_paths(self.store, sorted(range_ids))
        rows = (
            self.spark.read.schema(R.RANGE_FILE_SCHEMA).parquet(*paths)
            .where(F.col("key").isin(sorted(keys)))
            .select(
                F.regexp_extract(F.input_file_name(), r"([^/]+)\.parquet", 1).alias(
                    "range_id"
                ),
                "key",
                "identity",
            )
            .collect()
        )
        return {(r["range_id"], r["key"]): r["identity"] for r in rows}

    def active_commits(
        self,
        retention_days_default: float,
        per_branch: dict[str, float] | None = None,
        now: float | None = None,
    ) -> set[str]:
        """GC active-commit set: from every branch head walk ancestry;
        keep commits newer than the branch's retention cutoff plus the
        first commit beyond it (pkg/graveler/retention/active_commits.go;
        walk shared with refs.active_commit_set)."""
        from lakefs_spark.storage.refs import active_commit_set

        per_branch = per_branch or {}
        now = time.time() if now is None else now
        cutoffs: dict[str, float] = {}
        for branch, head in self.branches(show_hidden=True).items():
            if head is None:
                continue
            c = now - 86400.0 * per_branch.get(branch, retention_days_default)
            # two branches on one head: the more-retentive (earlier) cutoff wins
            cutoffs[head] = min(c, cutoffs.get(head, c))
        return active_commit_set(self.commits, cutoffs, list(self.tags().values()))

    def _reachable_addresses_raw(self, commit_ids: set[str]) -> DataFrame:
        """Physical addresses of the given commits' snapshots, WITH
        duplicates (shared ranges repeat across snapshots) — feed this
        to aggregation consumers like gc_mark, which collapse the
        duplicates map-side instead of paying a distinct shuffle."""
        range_ids: set[str] = set()
        for cid in commit_ids:
            mid = self.commits.get(cid).metarange_id
            if mid == R.EMPTY_METARANGE:
                continue
            range_ids.update(R.read_manifest(self.store, mid)["range_id"])
        rows = R.read_ranges(self.spark, self.store, sorted(range_ids))
        return rows.select("address").where(F.col("address").isNotNull())

    def reachable_addresses(self, commit_ids: set[str]) -> DataFrame:
        """Distinct physical addresses referenced by the given commits'
        snapshots (CommittedAddressLister.scala:15-57 analog)."""
        return self._reachable_addresses_raw(commit_ids).distinct()

    def _uncommitted_addresses_raw(self) -> DataFrame:
        dfs = []
        for branch in self.branches(show_hidden=True):
            raw = self._staged_raw(branch)
            if raw is not None:
                dfs.append(raw.where(~F.col("is_tombstone")).select("address"))
            # a pending compacted base is uncommitted state too: compact()
            # folds staging into compacted_mid and CLEARS the staging dir,
            # so its addresses appear in no active commit and no staging —
            # without this they would be marked unreachable and swept,
            # and the branch's next commit would reference deleted data
            cmid = self._read_branch(branch).get("compacted_mid")
            if cmid and cmid != R.EMPTY_METARANGE:
                dfs.append(
                    R.read_snapshot(self.spark, self.store, cmid).select("address")
                )
        if not dfs:
            return self.spark.createDataFrame([], "address string")
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def uncommitted_addresses(self) -> DataFrame:
        return self._uncommitted_addresses_raw().distinct()

    def gc_mark(
        self,
        listing: DataFrame,
        retention_days_default: float,
        per_branch: dict[str, float] | None = None,
        now: float | None = None,
        cutoff=None,
    ) -> DataFrame:
        from lakefs_spark.operators.gc import gc_mark as _mark

        active = self.active_commits(retention_days_default, per_branch, now)
        # RAW address streams: gc_mark's single aggregation collapses
        # duplicates map-side; a distinct here would just add shuffles
        committed = self._reachable_addresses_raw(active)
        uncommitted = self._uncommitted_addresses_raw()
        return _mark(listing, committed, uncommitted, cutoff)

    def gc_range_files(
        self,
        retention_days_default: float = float("inf"),
        per_branch: dict[str, float] | None = None,
        now: float | None = None,
        dry_run: bool = False,
    ) -> dict[str, int]:
        """Collect the engine's own metadata garbage: range and manifest
        files referenced by no active commit (aborted commits, expired
        history). The metadata analog of the reference's GC mark —
        listing ∖ reachable, driver-side because manifests are tiny.

        Default retention is infinite: everything reachable from any
        branch head or tag survives (plus pending compacted bases);
        only orphans from aborted/abandoned commits go. A finite
        retention also drops old commits' files — like the reference's
        data GC, time-travel to collected commits stops working.
        Returns counts {ranges_deleted, manifests_deleted}.
        """
        active = self.active_commits(retention_days_default, per_branch, now)
        live_mids: set[str] = set()
        for cid in active:
            live_mids.add(self.commits.get(cid).metarange_id)
        for branch in self.branches(show_hidden=True):
            cmid = self._read_branch(branch).get("compacted_mid")
            if cmid:
                live_mids.add(cmid)
        live_mids.discard(R.EMPTY_METARANGE)
        live_ranges: set[str] = set()
        for mid in live_mids:
            live_ranges.update(R.read_manifest(self.store, mid)["range_id"])

        dead_ranges = [
            p for p in self.store.list_blobs("ranges")
            if p.endswith(".parquet") and p[: -len(".parquet")] not in live_ranges
        ]
        dead_manifests = [
            p for p in self.store.list_blobs("manifests")
            if p.endswith(".parquet") and p[: -len(".parquet")] not in live_mids
        ]
        if not dry_run:
            for p in dead_ranges:
                self.store.delete_blob(os.path.join("ranges", p))
            for p in dead_manifests:
                self.store.delete_blob(os.path.join("manifests", p))
            if dead_manifests:
                # drop cached copies of collected manifests so a stale
                # read of a deleted id fails loudly instead of serving
                R.manifest_cache_clear()
        return {"ranges_deleted": len(dead_ranges), "manifests_deleted": len(dead_manifests)}

    # -- misc write-path operators -----------------------------------------

    def copy_entry(self, src_ref: str, src_key: str, dest_branch: str, dest_key: str,
                   force: bool = False) -> None:
        """Shallow same-repo copy: stage a new entry at ``dest_key``
        pointing at the *same physical address* (no byte copy) —
        pkg/catalog/catalog.go:3064-3176 CopyEntry."""
        self._check_writable("copy_entry", force)
        row = self.get(src_ref, src_key)
        if row is None:
            raise KeyError(f"{src_key!r} not found at {src_ref!r}")
        src = self.snapshot(src_ref, key_lower=src_key, key_upper=src_key + "\x00").where(
            F.col("key") == src_key
        )
        self.stage_entries(dest_branch, src.withColumn("key", F.lit(dest_key)), force=force)

    def reset_hard(self, branch: str, ref: str, force: bool = False) -> None:
        """Move the branch head to ``ref`` and drop staging (ResetHard —
        graveler.go:2576-2828)."""
        self._check_writable("reset_hard", force)
        self._check_protected(branch, "commit")
        cid = self.resolve(ref).commit_id
        st = self._read_branch(branch)
        # conditional PUT like every other pointer mutation: an
        # unconditional write could silently undo a concurrent
        # staging_seq bump and hand two stagers the same directory
        self._cas_update(branch, st["head"], {"head": cid})
        self.reset_branch(branch, force=force)

    # -- dump / restore refs -------------------------------------------------

    def dump_refs(self, out_dir: str) -> None:
        """Serialize the commit DAG + branch/tag pointers for backup
        (graveler.go:3668-3727 DumpCommits/DumpBranches/DumpTags).
        Commits go to Parquet (the DAG can reach 1e6 rows); pointers,
        which are tiny, to JSON."""
        os.makedirs(out_dir, exist_ok=True)
        rows = []
        for cid in self.commits.all_ids():
            rec = self.commits.get(cid).to_json()
            rec["metadata"] = json.dumps(rec["metadata"], sort_keys=True)
            rows.append(rec)
        pd.DataFrame(
            rows,
            columns=["commit_id", "parents", "metarange_id", "message", "committer",
                     "creation_date", "metadata", "generation", "version"],
        ).to_parquet(os.path.join(out_dir, "commits.parquet"), index=False)
        # one listing + one get per branch: repeated branches() calls
        # would multiply ref-store round-trips and could disagree under
        # concurrent branch creation
        all_branches: dict[str, str | None] = {}
        hidden: list[str] = []
        for bk in self.store.list_docs("refs/branches/"):
            st = self.store.get_doc(bk)[0]
            name = bk[len("refs/branches/"):]
            all_branches[name] = st["head"]
            if st.get("hidden"):
                hidden.append(name)
        with open(os.path.join(out_dir, "refs.json"), "w") as f:
            json.dump({
                "branches": all_branches,
                # hidden flags ride the dump so a restore can't unhide
                # an in-flight import work branch
                "hidden": sorted(hidden),
                "tags": self.tags(),
                "default_branch": self.default_branch,
            }, f)

    def restore_refs(self, in_dir: str, force: bool = False) -> None:
        """Restore a dump into this repository (graveler.go:3552-3659).
        Range/manifest files are content-addressed and assumed present
        (or restored by file copy); this reinstates the DAG + pointers.
        On a read-only repository pass ``force=True`` — the reference's
        dump/restore escape hatch (LoadCommits/LoadBranches run with
        WriteOptions.Force on read-only repos)."""
        self._check_writable("restore_refs", force)
        commits_pdf = pd.read_parquet(os.path.join(in_dir, "commits.parquet"))
        for rec in commits_pdf.to_dict("records"):
            rec["parents"] = list(rec["parents"])
            rec["metadata"] = json.loads(rec["metadata"]) if rec["metadata"] else {}
            rec["generation"] = int(rec["generation"])
            rec["version"] = int(rec["version"])
            self.commits.put(Commit.from_json(rec))
        with open(os.path.join(in_dir, "refs.json")) as f:
            refs = json.load(f)
        hidden = set(refs.get("hidden") or ())
        for name, head in refs["branches"].items():
            flag = {"hidden": True} if name in hidden else {}
            if not self.store.doc_exists(self._branch_key(name)):
                self._write_branch(name, {"head": head, "staging_seq": 0, **flag})
            else:
                st = self._read_branch(name)
                self._write_branch(name, {**st, "head": head, **flag})
        for name, cid in refs["tags"].items():
            self.store.put_doc(f"refs/tags/{name}", {"commit_id": cid})
