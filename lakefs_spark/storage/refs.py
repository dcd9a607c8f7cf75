"""Commit DAG, refs, ref-expression resolution, log, merge-base.

Driver-side algorithms over the (small) commit graph — the reference
does the same: its commit iterators and merge-base finder run in the
server process, not in a distributed engine
(pkg/graveler/ref/commit_iterator.go, merge_base_finder.go). A data
repo has 1e3..1e6 commits — driver-sized at any data scale; the 100 TB
concern lives in the *snapshot* operators, not here.

Implements:
- Commit model: content-addressed id over typed-marshaled fields
  (pkg/graveler/graveler.go:499-527), generation = max(parent)+1
  (graveler.go:3194-3198).
- Ref grammar ``base[~N][^N][@|$]`` with precedence commit-id >
  branch > tag > commit-prefix (pkg/graveler/ref/parse_ref.go:11-68,
  resolve_ref.go:32-133).
- Log: BFS by (creation_date desc, commit_id) priority queue, with
  first_parent / since options (pkg/graveler/ref/commit_iterator.go:75-189).
- Merge-base: two-sided ancestor walk ordered by generation
  (pkg/graveler/ref/merge_base_finder.go:23-76).
"""

from __future__ import annotations

import heapq
import re
import time
from dataclasses import dataclass, field

from lakefs_spark.functions.ident import typed_hash_hex


@dataclass
class Commit:
    commit_id: str
    parents: list[str]
    metarange_id: str
    message: str
    committer: str
    creation_date: float  # epoch seconds; backdatable (GC tests)
    metadata: dict[str, str] = field(default_factory=dict)
    generation: int = 1
    version: int = 1

    def to_json(self) -> dict:
        return {
            "commit_id": self.commit_id,
            "parents": self.parents,
            "metarange_id": self.metarange_id,
            "message": self.message,
            "committer": self.committer,
            "creation_date": self.creation_date,
            "metadata": self.metadata,
            "generation": self.generation,
            "version": self.version,
        }

    @staticmethod
    def from_json(d: dict) -> "Commit":
        return Commit(**d)


def commit_id_of(
    parents: list[str],
    metarange_id: str,
    message: str,
    committer: str,
    creation_date: float,
    metadata: dict[str, str],
) -> str:
    """Content-addressed commit id (typed, order-stable framing)."""
    parts = [
        "commit",
        metarange_id,
        message,
        committer,
        repr(creation_date),
        *parents,
        *[f"{k}={v}" for k, v in sorted(metadata.items())],
    ]
    return typed_hash_hex(parts)


class CommitStore:
    """Content-addressed commit records on the metadata store
    (doc keys ``commits/<id>``; with a LocalStore that is the same
    JSON-file-per-commit layout as before). Commits are immutable, so
    reads cache forever and puts are idempotent — no CAS needed
    (AddCommit's dedup check, pkg/graveler/graveler.go:517-527)."""

    def __init__(self, root_or_store):
        from lakefs_spark.storage.store import as_store

        self.store = as_store(root_or_store)
        self._cache: dict[str, Commit] = {}

    def get(self, commit_id: str) -> Commit:
        if commit_id not in self._cache:
            got = self.store.get_doc(f"commits/{commit_id}")
            if got is None:
                raise FileNotFoundError(f"commit not found: {commit_id!r}")
            self._cache[commit_id] = Commit.from_json(got[0])
        return self._cache[commit_id]

    def exists(self, commit_id: str) -> bool:
        return commit_id in self._cache or self.store.doc_exists(
            f"commits/{commit_id}"
        )

    def put(self, c: Commit) -> None:
        if not self.store.doc_exists(f"commits/{c.commit_id}"):
            # content-addressed => idempotent; last-writer-wins is safe
            self.store.put_doc(f"commits/{c.commit_id}", c.to_json())
        self._cache[c.commit_id] = c

    def all_ids(self) -> list[str]:
        return sorted(
            k[len("commits/"):] for k in self.store.list_docs("commits/")
        )

    def create(
        self,
        parents: list[str],
        metarange_id: str,
        message: str,
        committer: str = "lakefs_spark",
        metadata: dict[str, str] | None = None,
        creation_date: float | None = None,
    ) -> Commit:
        metadata = metadata or {}
        creation_date = time.time() if creation_date is None else creation_date
        gen = 1 + max((self.get(p).generation for p in parents), default=0)
        cid = commit_id_of(parents, metarange_id, message, committer, creation_date, metadata)
        c = Commit(
            commit_id=cid,
            parents=list(parents),
            metarange_id=metarange_id,
            message=message,
            committer=committer,
            creation_date=creation_date,
            metadata=metadata,
            generation=gen,
        )
        self.put(c)
        return c


# -- ref expressions -------------------------------------------------------

_HASH_RE = re.compile(r"^[a-fA-F0-9]{1,64}$")


class RefError(ValueError):
    pass


@dataclass
class ResolvedRef:
    commit_id: str | None  # None for an empty branch head
    branch: str | None  # set iff base resolved to a branch
    staging: bool  # True => include staged changes ($ or bare branch)


def parse_ref(ref: str) -> tuple[str, list[tuple[str, int]]]:
    """Split a ref expression into (base, [(op, n), ...]) with the
    reference's strict grammar (pkg/graveler/ref/parse_ref.go:11-68):
    ``~``/``^`` take an optional decimal count; ``@``/``$`` take none
    (``main$2`` is invalid); any non-numeric trailer is invalid."""
    ref = ref.strip()
    m = re.match(r"^[^~^@$]+", ref)
    if not m:
        raise RefError(f"invalid ref: {ref!r}")
    base, rest = m.group(0), ref[m.end():]
    mods: list[tuple[str, int]] = []
    for t in re.finditer(r"([~^@$])([^~^@$]*)", rest):
        op, arg = t.group(1), t.group(2)
        if op in "@$":
            if arg:
                raise RefError(f"invalid ref: {ref!r} ({op} takes no count)")
            mods.append((op, 1))
        else:
            if arg and not arg.isdigit():
                raise RefError(f"invalid ref: {ref!r} (bad modifier {op}{arg})")
            mods.append((op, int(arg) if arg else 1))
    return base, mods


def parse_mods(mods: str) -> list[tuple[str, int]]:
    """Parse a bare modifier string (no base) — thin wrapper kept for
    compatibility with callers that pre-split the expression."""
    return parse_ref(f"_{mods}")[1]


def resolve_ref(ref: str, branches: dict[str, str | None], tags: dict[str, str], commits: CommitStore) -> ResolvedRef:
    """Resolve a ref expression to a commit (reference precedence:
    full commit > branch > tag > commit prefix —
    pkg/graveler/ref/resolve_ref.go:31-46).

    ``branches`` maps branch -> head commit id (None = no commits yet).
    Modifiers: ``~N`` = N first-parent steps; ``^N`` = N-th parent
    (``^0`` = self); ``@`` = committed head only (no staging); ``$`` =
    staging included (default for a bare branch name). ``@``/``$`` must
    be the SOLE modifier and the base must be a branch — ``main~1$`` is
    invalid (resolve_ref.go:61-92)."""
    base, mods = parse_ref(ref)

    branch = None
    if commits.exists(base):
        cid = base
    elif base in branches:
        branch = base
        cid = branches[base]
    elif base in tags:
        cid = tags[base]
    elif _HASH_RE.match(base):
        matches = [c for c in commits.all_ids() if c.startswith(base)]
        if len(matches) == 1:
            cid = matches[0]
        elif len(matches) > 1:
            raise RefError(f"ambiguous commit prefix: {base!r}")
        else:
            raise RefError(f"ref not found: {base!r}")
    else:
        raise RefError(f"ref not found: {base!r}")

    if any(op in "@$" for op, _ in mods):
        # @/$ are branch-state selectors, not commit navigation: they
        # reject combination with any other modifier (resolve_ref.go:63,77)
        if len(mods) != 1 or branch is None:
            raise RefError(
                f"invalid ref: {ref!r} (@/$ must be the sole modifier on a branch)"
            )
        return ResolvedRef(commit_id=cid, branch=branch, staging=mods[0][0] == "$")

    for op, n in mods:
        if cid is None:
            raise RefError(f"cannot apply {op}{n} to empty branch")
        if op == "~":
            for _ in range(n):
                parents = commits.get(cid).parents
                if not parents:
                    raise RefError(f"{ref}: ran past root")
                cid = parents[0]
        else:  # ^N = N-th parent (^0 = self; resolve_ref.go:108-117)
            if n == 0:
                continue
            parents = commits.get(cid).parents
            if len(parents) < n:
                raise RefError(f"{ref}: commit has {len(parents)} parents, wanted ^{n}")
            cid = parents[n - 1]

    staging = branch is not None and not mods
    return ResolvedRef(commit_id=cid, branch=branch, staging=staging)


# -- log / merge-base ------------------------------------------------------


def log_commits(
    commits: CommitStore,
    head: str,
    first_parent: bool = False,
    since: float | None = None,
    limit: int | None = None,
    after: str | None = None,
) -> list[Commit]:
    """History from head, newest first: priority queue on
    (creation_date desc, commit_id) like the reference's iterator.
    ``after``: emit only commits past that id in iteration order — the
    SeekGE pagination of pkg/graveler/ref/commit_iterator.go:75-189."""
    out: list[Commit] = []
    seen = {head}
    heap: list[tuple[float, str]] = []
    c0 = commits.get(head)
    heapq.heappush(heap, (-c0.creation_date, c0.commit_id))
    skipping = after is not None
    while heap:
        _, cid = heapq.heappop(heap)
        c = commits.get(cid)
        # `since` and `after` are EMISSION filters only — they must not
        # prune traversal: creation_date is backdatable (clock skew, GC
        # tests), so an old commit can hide newer ancestors behind it
        if skipping:
            if cid == after:
                skipping = False
        elif since is None or c.creation_date >= since:
            out.append(c)
        if limit is not None and len(out) >= limit:
            break
        parents = c.parents[:1] if first_parent else c.parents
        for p in parents:
            if p not in seen:
                seen.add(p)
                pc = commits.get(p)
                heapq.heappush(heap, (-pc.creation_date, pc.commit_id))
    return out


def merge_base(commits: CommitStore, a: str, b: str) -> str | None:
    """Best common ancestor via two-sided walk ordered by generation
    (mirrors pkg/graveler/ref/merge_base_finder.go:23-76)."""
    FLAG_A, FLAG_B = 1, 2
    flags: dict[str, int] = {}
    heap: list[tuple[int, str]] = []  # (-generation, id)

    def push(cid: str, flag: int) -> None:
        flags[cid] = flags.get(cid, 0) | flag
        ca = commits.get(cid)
        heapq.heappush(heap, (-ca.generation, cid))

    push(a, FLAG_A)
    push(b, FLAG_B)
    while heap:
        _, cid = heapq.heappop(heap)
        f = flags[cid]
        if f == FLAG_A | FLAG_B:
            return cid
        for p in commits.get(cid).parents:
            nf = flags.get(p, 0) | f
            if flags.get(p) == nf:
                continue
            flags[p] = nf
            pc = commits.get(p)
            heapq.heappush(heap, (-pc.generation, p))
    return None


def active_commit_set(
    commits: CommitStore,
    head_cutoffs: dict[str, float],
    tag_cids: list[str] | None = None,
) -> set[str]:
    """GC active-commit set (pkg/graveler/retention/active_commits.go):
    from each head, walk ancestry keeping commits newer than that
    head's retention cutoff; the FIRST commit at-or-beyond the cutoff
    also survives (its snapshot may still be referenced) but its
    parents are not walked. Tag targets always survive.

    ``head_cutoffs``: head commit id -> absolute cutoff timestamp.
    The commit graph is driver-sized at any data scale (see module
    docstring) — this walk is O(|commits|), never O(data).
    """
    active: set[str] = set()
    for head, cutoff in head_cutoffs.items():
        if head is None:
            continue
        frontier = [head]
        seen: set[str] = set()
        active.add(head)
        while frontier:
            cid = frontier.pop()
            if cid in seen:
                continue
            seen.add(cid)
            c = commits.get(cid)
            active.add(cid)
            if c.creation_date >= cutoff:
                frontier.extend(c.parents)
    for t in tag_cids or []:
        active.add(t)
    return active
