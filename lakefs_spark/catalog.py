"""Catalog: the reference-shaped API facade over :class:`Repository`.

The reference exposes its data plane twice — an OpenAPI server
(api/swagger.yml, 134 operations; pkg/api/controller.go) and the
`Catalog` Go interface (pkg/catalog/catalog.go:530-3491). Our engine's
public surface is this Python class: one method per data-plane
operation, snake_cased from the swagger ``operationId``, delegating to
the Spark-native engine underneath. A reference user maps calls 1:1:

    swagger operationId        -> Catalog method
    ------------------------------------------------
    listObjects                -> list_objects
    statObject                 -> stat_object
    getObject                  -> get_object
    uploadObject               -> upload_object
    deleteObject / deleteObjects -> delete_object / delete_objects
    copyObject                 -> copy_object
    getPhysicalAddress         -> get_physical_address
    linkPhysicalAddress        -> link_physical_address
    diffRefs / diffBranch      -> diff_refs / diff_branch
    commit                     -> commit
    logCommits                 -> log_commits
    mergeIntoBranch            -> merge_into_branch
    findMergeBase              -> find_merge_base
    revertBranch / cherryPick  -> revert_branch / cherry_pick
    resetBranch                -> reset_branch
    createBranch/deleteBranch/listBranches -> *_branch(es)
    createTag/deleteTag/listTags          -> *_tag(s)
    dumpRefs / restoreRefs     -> dump_refs / restore_refs
    importStart / importStatus / importCancel -> import_start/_status/_cancel
    prepareGarbageCollectionCommits       -> prepare_gc_commits
    prepareGarbageCollectionUncommitted   -> prepare_gc_uncommitted
    getMetaRange / getRange    -> get_meta_range / get_range

Physical bytes are out of scope by design: like the reference's block
adapters (pkg/block/adapter.go:187-226), byte I/O belongs to the object
store / Hadoop FS. ``upload_object`` therefore takes the object's
already-known physical address + checksums (the getPhysicalAddress →
write → linkPhysicalAddress flow, pkg/api/controller.go StageObject),
and ``get_object`` returns the entry whose ``address`` the caller
dereferences.

Listing responses mirror the gateway/API pagination envelope
(``results`` + ``pagination{has_more, next_offset}`` —
pkg/api/controller.go:5078-5160).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from lakefs_spark.storage.refs import Commit, merge_base
from lakefs_spark.storage.repo import Repository


def _s3_items(rows) -> tuple[list[dict], list[dict]]:
    """Listing rows -> (CommonPrefixes, Contents) S3 item dicts.

    One ``asDict()`` per row: Row field access BY NAME costs a
    tuple.index() over the field list per lookup, so the previous
    5-lookups-per-row comprehensions were ~6 name scans per emitted
    object — on a 150k-object page walk that was the second-largest
    driver cost after the page fold itself."""
    dirs: list[dict] = []
    files: list[dict] = []
    for r in rows:
        d = r.asDict()
        if d["is_common_prefix"]:
            dirs.append({"Prefix": d["key"]})
        else:
            files.append(
                {
                    "Key": d["key"],
                    "Size": d["size"],
                    "ETag": d["etag"],
                    "LastModified": d["last_modified"],
                    "StorageClass": "STANDARD",
                }
            )
    return dirs, files


class ImportStatus:
    """Tracked state of a started import (importStatus response shape —
    api/swagger.yml ImportStatus; pkg/catalog/catalog.go:2711-2773)."""

    def __init__(self, import_id: str):
        self.id = import_id
        self.completed = False
        self.error: str | None = None
        self.ingested_objects = 0
        self.commit: Commit | None = None
        self.update_time = time.time()


class Catalog:
    def __init__(self, repo: Repository):
        self.repo = repo
        self._imports: dict[str, ImportStatus] = {}

    # -- construction ------------------------------------------------------

    @classmethod
    def create_repository(cls, spark: SparkSession, root: str, default_branch: str = "main",
                          read_only: bool = False) -> "Catalog":
        # createRepository's read_only flag (api/swagger.yml
        # RepositoryCreation; pkg/graveler/graveler.go:417-434)
        return cls(Repository.create(spark, root, default_branch, read_only=read_only))

    @classmethod
    def open_repository(cls, spark: SparkSession, root: str) -> "Catalog":
        return cls(Repository.open(spark, root))

    def repository_info(self) -> dict:
        """getRepository response shape (id, default branch, creation
        date, read_only — api Repository model)."""
        doc = self.repo.store.get_doc("repo")[0]
        return {
            "id": self.repo.root,
            "default_branch": doc["default_branch"],
            "creation_date": doc.get("created_at"),
            "read_only": bool(doc.get("read_only", False)),
        }

    # -- objects -----------------------------------------------------------

    def list_objects(
        self,
        ref: str,
        prefix: str = "",
        after: str = "",
        delimiter: str = "",
        amount: int = 1000,
    ) -> dict:
        rows, has_more = self.repo.list_page(
            ref, prefix=prefix, after=after, delimiter=delimiter, amount=amount
        )
        return {
            "results": rows,
            "pagination": {
                "has_more": has_more,
                "next_offset": rows[-1]["key"] if has_more and rows else "",
                "results": len(rows),
                "max_per_page": amount,
            },
        }

    def list_objects_v2(
        self,
        ref: str,
        prefix: str = "",
        delimiter: str = "",
        max_keys: int = 1000,
        start_after: str = "",
        continuation_token: str = "",
    ) -> dict:
        """S3-gateway ListObjectsV2 envelope
        (pkg/gateway/operations/listobjects.go:106-234): the resume
        cursor is ``continuation-token`` when present, else
        ``start-after``; the response echoes the request token and, when
        truncated, carries ``NextContinuationToken`` = last emitted key,
        which the next call passes back verbatim."""
        from_str = continuation_token or start_after
        rows, has_more = self.repo.list_page(
            ref, prefix=prefix, after=from_str, delimiter=delimiter, amount=max_keys
        )
        dirs, files = _s3_items(rows)
        resp = {
            "Name": self.repo.root,
            "Prefix": prefix,
            "Delimiter": delimiter,
            "KeyCount": len(rows),
            "MaxKeys": max_keys,
            "CommonPrefixes": dirs,
            "Contents": files,
            "IsTruncated": False,
        }
        if continuation_token:
            resp["ContinuationToken"] = continuation_token
        if start_after:
            resp["StartAfter"] = start_after
        if has_more and rows:
            resp["IsTruncated"] = True
            resp["NextContinuationToken"] = rows[-1]["key"]
        return resp

    def list_objects_v1(
        self,
        ref: str,
        prefix: str = "",
        delimiter: str = "",
        max_keys: int = 1000,
        marker: str = "",
    ) -> dict:
        """S3-gateway ListObjects (V1) envelope
        (pkg/gateway/operations/listobjects.go:236-360): the resume
        cursor is ``marker`` (a key, exclusive). Per the reference
        gateway and S3, ``NextMarker`` is only returned when a
        delimiter was given (last emitted item — key or common
        prefix); without a delimiter a truncated page sets only
        ``IsTruncated`` and the client resumes from the last
        ``Contents`` key."""
        rows, has_more = self.repo.list_page(
            ref, prefix=prefix, after=marker, delimiter=delimiter, amount=max_keys
        )
        dirs, files = _s3_items(rows)
        resp = {
            "Name": self.repo.root,
            "Prefix": prefix,
            "Delimiter": delimiter,
            "Marker": marker,
            "MaxKeys": max_keys,
            "CommonPrefixes": dirs,
            "Contents": files,
            "IsTruncated": False,
        }
        if has_more and rows:
            resp["IsTruncated"] = True
            if delimiter:
                resp["NextMarker"] = rows[-1]["key"]
        return resp

    def stat_object(self, ref: str, path: str):
        """Entry row for ``path`` or None (statObject 404)."""
        return self.repo.get(ref, path)

    def get_object(self, ref: str, path: str):
        """Same entry row; the caller reads bytes at ``row.address``."""
        return self.repo.get(ref, path)

    def upload_object(
        self,
        branch: str,
        path: str,
        address: str,
        size: int,
        checksum: str,
        content_type: str = "application/octet-stream",
        metadata: dict[str, str] | None = None,
        if_none_match: bool = False,
    ) -> None:
        """Register an uploaded object (uploadObject / StageObject).

        ``if_none_match=True`` maps the API's ``If-None-Match: *``
        header to the staging IfAbsent predicate.
        """
        import json

        from lakefs_spark.functions.ident import typed_hash_hex

        # same field set + framing as functions.ident.identity_hex
        parts = [str(size), checksum]
        if metadata is not None:
            parts.append(json.dumps(dict(sorted(metadata.items())), separators=(",", ":")))
        parts.append(content_type)
        entry = {
            "key": path,
            "identity": typed_hash_hex(parts),
            "address": address,
            "address_type": "RELATIVE",
            "size": size,
            "etag": checksum,
            "content_type": content_type,
            "metadata": metadata,
        }
        self.repo.set_entry(branch, entry, if_absent=if_none_match)

    def update_object_user_metadata(
        self, branch: str, path: str, metadata: dict[str, str]
    ) -> None:
        """Replace an object's user metadata in place
        (updateObjectUserMetadata — api/swagger.yml; the reference
        restages the entry with new metadata and a recomputed
        identity). 404s via KeyError if the object is not visible."""
        import json as _json

        from lakefs_spark.functions.ident import typed_hash_hex

        cur = self.get_object(branch, path)
        if cur is None:
            raise KeyError(f"{path!r} not found on {branch!r}")
        # restage IN PLACE: upload_object would reset address_type to
        # RELATIVE (corrupting zero-copy FULL-address imports) and drop
        # last_modified; only metadata and the identity may change
        ctype = cur["content_type"] or "application/octet-stream"
        parts = [
            str(cur["size"]), cur["etag"],
            _json.dumps(dict(sorted(metadata.items())), separators=(",", ":")),
            ctype,
        ]
        self.repo.set_entry(
            branch,
            {
                "key": path,
                "identity": typed_hash_hex(parts),
                "address": cur["address"],
                "address_type": cur["address_type"],
                "size": cur["size"],
                "etag": cur["etag"],
                "last_modified": cur["last_modified"],
                "metadata": dict(metadata),
                "content_type": ctype,
            },
        )

    def delete_object(self, branch: str, path: str) -> None:
        self.repo.stage_deletes(branch, [path])

    def delete_objects(self, branch: str, paths: list[str]) -> None:
        """Batched tombstones (deleteObjects — graveler.go:2031-2070)."""
        self.repo.stage_deletes(branch, paths)

    def copy_object(self, branch: str, src_ref: str, src_path: str, dest_path: str) -> None:
        self.repo.copy_entry(src_ref, src_path, branch, dest_path)

    # -- write-without-server data path ------------------------------------

    def get_physical_address(self, branch: str, path: str) -> dict:
        """Mint a physical address the client may write bytes to
        (getPhysicalAddress — api/swagger.yml StagingLocation). The
        token is single-use by convention; linking happens via
        :meth:`link_physical_address`. Addresses are TIME-PARTITIONED
        (pkg/upload/path_provider.go analog, functions/pathtime.py):
        the path encodes reverse rotation-hour time, so uncommitted GC
        excludes in-flight uploads with one pushed-down string range
        predicate instead of per-object stat calls."""
        from lakefs_spark.functions.pathtime import new_physical_path

        token = uuid.uuid4().hex
        return {
            "physical_address": new_physical_path(token),
            "token": token,
            "expiration": time.time() + 24 * 3600,
        }

    def link_physical_address(
        self,
        branch: str,
        path: str,
        physical_address: str,
        size: int,
        checksum: str,
        content_type: str = "application/octet-stream",
        metadata: dict[str, str] | None = None,
    ) -> None:
        self.upload_object(
            branch, path, physical_address, size, checksum, content_type, metadata
        )

    # -- multipart upload (gateway flow) -----------------------------------

    def create_multipart_upload(self, branch: str, path: str) -> dict:
        """S3-gateway CreateMultipartUpload: mint an upload id + the
        physical address parts are written under
        (pkg/gateway/operations/postobject.go)."""
        from lakefs_spark.functions.pathtime import new_physical_path

        upload_id = uuid.uuid4().hex
        self._multiparts = getattr(self, "_multiparts", {})
        self._multiparts[upload_id] = {
            "branch": branch,
            "path": path,
            # time-partitioned like every other mint: multipart uploads
            # are the LONGEST-lived in-flight writes, so the path-time
            # GC guard matters most here
            "physical_address": new_physical_path(upload_id),
            "parts": {},
        }
        return {"upload_id": upload_id,
                "physical_address": self._multiparts[upload_id]["physical_address"]}

    def upload_part(self, upload_id: str, part_number: int, part_md5: str, size: int) -> dict:
        """Record one part's md5+size (UploadPart; bytes go straight to
        the object store at ``physical_address``)."""
        mp = self._multiparts[upload_id]
        mp["parts"][part_number] = {"etag": part_md5, "size": size}
        return {"part_number": part_number, "etag": part_md5}

    def complete_multipart_upload(self, upload_id: str, content_type: str = "application/octet-stream") -> dict:
        """CompleteMultipartUpload: composite S3 ETag over the parts in
        part-number order, then stage the entry
        (gateway CompleteMultipartUpload + md5-of-parts convention)."""
        from lakefs_spark.functions.checksum import multipart_etag

        mp = self._multiparts.pop(upload_id)
        ordered = [mp["parts"][n]["etag"] for n in sorted(mp["parts"])]
        etag = multipart_etag(ordered)
        total = sum(p["size"] for p in mp["parts"].values())
        self.upload_object(
            mp["branch"], mp["path"], mp["physical_address"], total, etag, content_type
        )
        return {"etag": etag, "size": total, "physical_address": mp["physical_address"]}

    def abort_multipart_upload(self, upload_id: str) -> None:
        getattr(self, "_multiparts", {}).pop(upload_id, None)

    # -- diff / commit / history -------------------------------------------

    def diff_refs(self, left_ref: str, right_ref: str) -> DataFrame:
        return self.repo.diff(left_ref, right_ref)

    def diff_refs_paged(
        self,
        left_ref: str,
        right_ref: str,
        prefix: str = "",
        after: str = "",
        delimiter: str = "",
        amount: int = 100,
    ) -> dict:
        """diffRefs with the API's pagination + delimiter-grouping
        envelope (pkg/api/controller.go DiffRefs →
        pkg/catalog/catalog.go listDiffHelper): grouped rows are
        ``path_type: common_prefix`` typed ``prefix_changed``; the
        cursor in delimiter mode seeks past the whole group the
        previous page ended on (GetStartPos). Plan shape: the fold and
        the limit+1 probe run INSIDE Spark, so a page over a huge diff
        collects O(amount) rows."""
        from lakefs_spark.operators.listing import fold_diff

        folded = fold_diff(
            self.repo.diff(left_ref, right_ref), prefix, after, delimiter
        )
        rows = [r.asDict() for r in folded.limit(amount + 1).collect()]
        page, has_more = rows[:amount], len(rows) > amount
        results = [
            {
                "path": r["key"],
                "path_type": (
                    "common_prefix" if r["is_common"] else "object"
                ),
                "type": r["diff_type"],
            }
            for r in page
        ]
        return {
            "pagination": {
                "has_more": has_more,
                "next_offset": page[-1]["key"] if has_more and page else "",
                "results": len(page),
            },
            "results": results,
        }

    def diff_branch(self, branch: str) -> DataFrame:
        """Uncommitted changes of a branch (diffBranch)."""
        return self.repo.uncommitted(branch)

    def commit(
        self,
        branch: str,
        message: str,
        committer: str = "lakefs_spark",
        metadata: dict[str, str] | None = None,
        allow_empty: bool = False,
        date: float | None = None,
    ) -> Commit:
        return self.repo.commit(
            branch, message, committer=committer, metadata=metadata,
            allow_empty=allow_empty, date=date,
        )

    def log_commits(
        self,
        ref: str,
        first_parent: bool = False,
        since: float | None = None,
        amount: int | None = None,
        after: str | None = None,
        paths: list[str] | None = None,
    ) -> list[Commit]:
        if paths:
            return self.repo.log_with_paths(ref, paths, limit=amount)
        return self.repo.log(ref, first_parent=first_parent, since=since,
                             limit=amount, after=after)

    def merge_into_branch(
        self,
        source_ref: str,
        dest_branch: str,
        strategy: str = "none",
        squash: bool = False,
        message: str | None = None,
        committer: str = "lakefs_spark",
        metadata: dict[str, str] | None = None,
    ) -> Commit:
        return self.repo.merge(
            source_ref, dest_branch, strategy=strategy, squash=squash,
            message=message, committer=committer, metadata=metadata,
        )

    def find_merge_base(self, source_ref: str, dest_ref: str) -> str | None:
        a = self.repo.resolve(source_ref).commit_id
        b = self.repo.resolve(dest_ref).commit_id
        if a is None or b is None:
            return None
        return merge_base(self.repo.commits, a, b)

    def revert_branch(self, branch: str, ref: str, parent_number: int = 1) -> Commit:
        return self.repo.revert(branch, ref, parent_number=parent_number)

    def cherry_pick(self, branch: str, ref: str, parent_number: int = 1) -> Commit:
        return self.repo.cherry_pick(branch, ref, parent_number=parent_number)

    def reset_branch(self, branch: str, prefix: str | None = None, key: str | None = None) -> None:
        self.repo.reset_branch(branch, prefix=prefix, key=key)

    # -- refs --------------------------------------------------------------

    def create_branch(self, name: str, source_ref: str) -> None:
        self.repo.create_branch(name, source_ref)

    def delete_branch(self, name: str) -> None:
        self.repo.delete_branch(name)

    def list_branches(self, prefix: str = "", after: str = "", amount: int = 1000) -> dict:
        return self._paginate_names(self.repo.branches(), prefix, after, amount)

    def create_tag(self, name: str, ref: str) -> None:
        self.repo.create_tag(name, ref)

    def delete_tag(self, name: str) -> None:
        self.repo.delete_tag(name)

    def list_tags(self, prefix: str = "", after: str = "", amount: int = 1000) -> dict:
        return self._paginate_names(self.repo.tags(), prefix, after, amount)

    @staticmethod
    def _paginate_names(mapping: dict, prefix: str, after: str, amount: int) -> dict:
        """Name-ordered prefix+after pagination, the KV-scan shape of
        branch/tag listing (pkg/graveler/ref/branch_iterator.go)."""
        names = sorted(n for n in mapping if n.startswith(prefix) and n > after)
        page = names[: amount]
        has_more = len(names) > amount
        return {
            "results": [{"id": n, "commit_id": mapping[n]} for n in page],
            "pagination": {
                "has_more": has_more,
                "next_offset": page[-1] if has_more and page else "",
                "results": len(page),
                "max_per_page": amount,
            },
        }

    def dump_refs(self, out_dir: str) -> None:
        self.repo.dump_refs(out_dir)

    def restore_refs(self, in_dir: str) -> None:
        self.repo.restore_refs(in_dir)

    # -- import ------------------------------------------------------------

    def import_start(
        self,
        branch: str,
        entries: DataFrame,
        replace_prefixes: list[str] | None = None,
        message: str = "import",
    ) -> str:
        """Run an import and track it under an import id
        (importStart/importStatus — pkg/catalog/import.go). Synchronous
        under the hood: Spark's blocking job IS the import job."""
        import_id = uuid.uuid4().hex
        status = ImportStatus(import_id)
        self._imports[import_id] = status
        try:
            # count first: counting AFTER the commit re-runs the input
            # plan, and a failure there would mark a LANDED import as
            # errored (inviting a double-applying retry)
            status.ingested_objects = entries.count()
            status.commit = self.repo.import_entries(
                branch, entries, replace_prefixes=replace_prefixes, message=message
            )
            status.completed = True
        except Exception as e:  # recorded, surfaced via import_status
            status.error = f"{type(e).__name__}: {e}"
        status.update_time = time.time()
        return import_id

    def import_status(self, branch: str, import_id: str) -> ImportStatus:
        return self._imports[import_id]

    def import_cancel(self, branch: str, import_id: str) -> None:
        """Drop tracking (importCancel; the synchronous import cannot be
        interrupted mid-flight, matching a completed-or-failed import)."""
        self._imports.pop(import_id, None)

    # -- actions / runs API (swagger listRepositoryRuns .. getRunHookOutput) --

    def list_repository_runs(
        self, branch: str = "", after: str = "", amount: int = 100
    ) -> dict:
        """listRepositoryRuns: hook runs newest first, filtered by
        branch, with the standard pagination envelope."""
        runs = self.repo.hook_runs()
        if branch:
            runs = [r for r in runs if r.get("branch", "") == branch]
        if after:
            runs = [r for r in runs if r["run_id"] < after]
        page, has_more = runs[:amount], len(runs) > amount
        return {
            "results": page,
            "pagination": {
                "has_more": has_more,
                "next_offset": page[-1]["run_id"] if has_more and page else "",
                "results": len(page),
                "max_per_page": amount,
            },
        }

    def get_run(self, run_id: str) -> dict:
        """getRun: one run-result record. Accepts the run-log id
        ("<hex>-<idx>") or the bare event id ("<hex>", what actions
        task rows carry) — the latter returns the newest row of that
        event."""
        runs = self.repo.hook_runs()
        for r in runs:
            if r["run_id"] == run_id:
                return r
        for r in runs:
            if r["run_id"].split("-")[0] == run_id:
                return r
        raise KeyError(f"run not found: {run_id}")

    def list_run_hooks(self, run_id: str, after: str = "", amount: int = 100) -> dict:
        """listRunHooks: the per-hook task results of one actions run.
        Accepts either a run-log id ("<hex>-<idx>", what
        listRepositoryRuns returns) or the bare actions run id — task
        rows are keyed by the shared base id, so the swagger drill-down
        chains."""
        from lakefs_spark.storage.actions import read_task_results

        tasks = read_task_results(self.repo, run_id)
        if after:
            # newest-first listing: resume strictly below the cursor
            tasks = [t for t in tasks if t["hook_run_id"] < after]
        page, has_more = tasks[:amount], len(tasks) > amount
        return {
            "results": page,
            "pagination": {
                "has_more": has_more,
                "next_offset": page[-1]["hook_run_id"] if has_more and page else "",
                "results": len(page),
                "max_per_page": amount,
            },
        }

    def get_run_hook_output(self, run_id: str, hook_run_id: str) -> str:
        """getRunHookOutput: captured output lines of one hook run."""
        from lakefs_spark.storage.actions import read_hook_output

        return "\n".join(read_hook_output(self.repo, run_id, hook_run_id))

    def expire_tracking(self, ttl_seconds: float, now: float | None = None) -> int:
        """TTL cleanup of finished import records + the hook run log
        (expired imports/tasks cleanup, pkg/catalog/catalog.go:3177-3208).
        Returns the number of records dropped."""
        cutoff = (now if now is not None else time.time()) - ttl_seconds
        stale = [
            iid
            for iid, st in self._imports.items()
            if (st.completed or st.error) and st.update_time < cutoff
        ]
        for iid in stale:
            del self._imports[iid]
        return len(stale) + self.repo.expire_runs(ttl_seconds, now=now)

    # -- GC ----------------------------------------------------------------

    def prepare_gc_commits(
        self,
        retention_days_default: float,
        per_branch: dict[str, float] | None = None,
        now: float | None = None,
    ) -> set[str]:
        """Active-commit set for the GC mark phase
        (prepareGarbageCollectionCommits)."""
        return self.repo.active_commits(retention_days_default, per_branch, now)

    def prepare_gc_uncommitted(self) -> DataFrame:
        """Uncommitted physical addresses (prepareGarbageCollectionUncommitted
        — pkg/catalog/gc_write_uncommitted.go)."""
        return self.repo.uncommitted_addresses()

    # -- metadata plumbing -------------------------------------------------

    def get_meta_range(self, meta_range_id: str) -> dict:
        """Manifest location + rows (getMetaRange — the API returns a
        presigned location; ours is the local manifest path)."""
        import lakefs_spark.storage.ranges as R

        path = os.path.join(R.manifests_dir(self.repo.root), f"{meta_range_id}.parquet")
        return {"id": meta_range_id, "location": path,
                "ranges": R.read_manifest(self.repo.root, meta_range_id)}

    def get_range(self, range_id: str) -> dict:
        import lakefs_spark.storage.ranges as R

        return {"id": range_id,
                "location": os.path.join(R.ranges_dir(self.repo.root), f"{range_id}.parquet")}
