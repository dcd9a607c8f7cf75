"""Pull requests: a review object wrapping diff + merge.

Re-expresses the reference's PR model (pkg/graveler/graveler.go:360-392
PullRequest/PullRequestRecord, graveler.go:3736-3786 Create/Update,
pkg/catalog/catalog.go:3362-3420 CreatePullRequest + status filtering,
pkg/graveler/ref/pulls_iterator.go ordering). The PR itself is pure
metadata — the heavy lifting (compare, merge) delegates to the
Repository operators, so a PR listing never touches range data.

Storage: one document per PR (doc keys ``pulls/<id>`` on the metadata
store — with a LocalStore, the same one-JSON-file-per-PR layout as
before); IDs are time-ordered so the listing iterator (sorted by ID)
is also newest-last, matching the reference's xid ordering.
"""

from __future__ import annotations

import os
import time

OPEN = "OPEN"
CLOSED = "CLOSED"
MERGED = "MERGED"
_STATUSES = {OPEN, CLOSED, MERGED}


class PullRequestError(ValueError):
    pass


class PullRequests:
    """PR manager bound to a :class:`Repository` (composition — the
    reference wires this through RefManager the same way)."""

    def __init__(self, repo):
        self.repo = repo
        self.store = repo.store

    def _write(self, pull_id: str, rec: dict) -> None:
        self.store.put_doc(f"pulls/{pull_id}", rec)

    def create(
        self,
        source: str,
        destination: str,
        title: str = "",
        author: str = "",
        description: str = "",
    ) -> str:
        """Open a PR from source branch into destination branch
        (catalog.go:3362-3407: both must exist, and differ)."""
        self.repo._check_writable("pulls.create")
        if source == destination:
            raise PullRequestError(
                f"source and destination branches are the same: {source!r}"
            )
        branches = self.repo.branches(show_hidden=True)
        for b in (source, destination):
            if b not in branches:
                raise PullRequestError(f"branch not found: {b!r}")
        # time-ordered unique id (xid analog: timestamp + entropy)
        pull_id = f"{int(time.time() * 1e6):016x}{os.urandom(3).hex()}"
        self._write(
            pull_id,
            {
                "id": pull_id,
                "status": OPEN,
                "title": title,
                "author": author,
                "description": description,
                "source": source,
                "destination": destination,
                "creation_date": time.time(),
                "merged_commit_id": None,
                "closed_date": None,
            },
        )
        return pull_id

    def get(self, pull_id: str) -> dict:
        got = self.store.get_doc(f"pulls/{pull_id}")
        if got is None:
            raise PullRequestError(f"pull request not found: {pull_id!r}")
        return got[0]

    def list(
        self, status: str | None = None, after: str = "", amount: int | None = None
    ) -> list[dict]:
        """PRs sorted by id (pulls_iterator.go order), with the
        reference's status filter: ``CLOSED`` matches CLOSED or MERGED,
        ``OPEN`` matches only OPEN (catalog.go:3409-3420)."""
        ids = [k[len("pulls/"):] for k in self.store.list_docs("pulls/")]
        out = []
        for pid in ids:
            if pid <= after:
                continue
            rec = self.get(pid)
            if status is not None and self._skip_by_status(status, rec["status"]):
                continue
            out.append(rec)
            if amount is not None and len(out) >= amount:
                break
        return out

    @staticmethod
    def _skip_by_status(requested: str, status: str) -> bool:
        requested = requested.upper()
        if status == requested:
            return False
        if requested == CLOSED:  # CLOSED can be either CLOSED or MERGED
            return status not in (CLOSED, MERGED)
        if requested == OPEN:
            return status != OPEN
        return False

    def update(
        self,
        pull_id: str,
        title: str | None = None,
        description: str | None = None,
        status: str | None = None,
        merged_commit_id: str | None = None,
    ) -> dict:
        """Partial update (graveler.go:3756-3786): closing statuses stamp
        closed_date; an unknown status is rejected."""
        self.repo._check_writable("pulls.update")
        rec = self.get(pull_id)
        if title is not None:
            rec["title"] = title
        if description is not None:
            rec["description"] = description
        if status is not None:
            status = status.upper()
            if status not in _STATUSES:
                raise PullRequestError(f"invalid pull request status: {status!r}")
            rec["status"] = status
            if status in (CLOSED, MERGED):
                rec["closed_date"] = time.time()
        if merged_commit_id is not None:
            rec["merged_commit_id"] = merged_commit_id
        self._write(pull_id, rec)
        return rec

    def diff(self, pull_id: str):
        """The PR's change view: conflict-aware 3-way compare of source
        against destination from their merge base (what the review UI
        shows; same operator the merge itself runs)."""
        from lakefs_spark.operators.diff import compare
        from lakefs_spark.schema import ENTRY_SCHEMA
        from lakefs_spark.storage.refs import merge_base

        rec = self.get(pull_id)
        repo = self.repo
        src_cid = repo.resolve(rec["source"]).commit_id
        dst_cid = repo.resolve(rec["destination"]).commit_id
        base_cid = (
            merge_base(repo.commits, src_cid, dst_cid) if src_cid and dst_cid else None
        )
        empty = repo.spark.createDataFrame([], ENTRY_SCHEMA)
        return compare(
            repo.snapshot(base_cid) if base_cid else empty,
            repo.snapshot(rec["source"]) if src_cid else empty,
            repo.snapshot(rec["destination"]) if dst_cid else empty,
        )

    def merge(self, pull_id: str, committer: str = "lakefs_spark", **merge_kwargs) -> dict:
        """Merge an OPEN PR: delegates to Repository.merge (all its
        semantics apply — dirty-dest check, conflicts, hooks), then
        marks MERGED with the merge commit id."""
        rec = self.get(pull_id)
        if rec["status"] != OPEN:
            raise PullRequestError(
                f"pull request {pull_id!r} is {rec['status']}, not OPEN"
            )
        commit = self.repo.merge(
            rec["source"],
            rec["destination"],
            message=f"Merge pull request {pull_id}: {rec['title']}",
            committer=committer,
            **merge_kwargs,
        )
        return self.update(pull_id, status=MERGED, merged_commit_id=commit.commit_id)

    def close(self, pull_id: str) -> dict:
        self.repo._check_writable("pulls.close")
        rec = self.get(pull_id)
        if rec["status"] != OPEN:
            raise PullRequestError(
                f"pull request {pull_id!r} is {rec['status']}, not OPEN"
            )
        return self.update(pull_id, status=CLOSED)
