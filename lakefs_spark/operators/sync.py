"""Local-sync operators: walk-vs-listing diff and the 3-way sync plan.

Reference semantics (`lakectl local` — pkg/local/diff.go:268-336 DiffLocalWithHead,
pkg/local/diff.go:109-149 Changes.MergeWith, pkg/local/sync.go apply):
- 2-way diff of a local directory walk against a remote listing:
  local-only path => added, remote-only => removed, present on both
  with differing content (size/etag, the reference compares
  mtime+size or checksum) => changed. The change list is from the
  *local* perspective.
- 3-way sync: the local change list (vs the last-synced base) merged
  with the remote change list (vs the same base); a path changed on
  both sides is a conflict, otherwise local changes become
  upload/delete-remote operations and remote changes become
  download/delete-local operations.

Spark shape: both are single FULL OUTER joins on ``path`` + a CASE
ladder — the same sort-merge-join plan as operators/diff.py, so a
100 TB sync plan is one shuffle of each side keyed by path (and the
walk side comes from sources/walker.py's distributed lister).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: operation labels of the produced plan
UPLOAD, DOWNLOAD = "upload", "download"
DELETE_REMOTE, DELETE_LOCAL = "delete_remote", "delete_local"
CONFLICT = "conflict"


def local_diff(local: DataFrame, remote: DataFrame, path_col: str = "path") -> DataFrame:
    """2-way diff of a local walk against a remote listing.

    Both inputs need ``(path_col, size, etag)``; rows compare equal when
    both size and etag match (etag null-safe — a side that cannot
    produce checksums still diffs on size, like the reference's
    mtime/size fast path). Returns ``(path, change)`` with change in
    {'added','removed','changed'}, local perspective.
    """
    l = local.select(F.col(path_col).alias("path"),
                     F.col("size").alias("l_size"), F.col("etag").alias("l_etag"))
    r = remote.select(F.col(path_col).alias("path"),
                      F.col("size").alias("r_size"), F.col("etag").alias("r_etag"))
    j = l.join(r, on="path", how="full_outer")
    same = F.col("l_size").eqNullSafe(F.col("r_size")) & F.col("l_etag").eqNullSafe(F.col("r_etag"))
    return (
        j.where(F.col("l_size").isNull() | F.col("r_size").isNull() | ~same)
        .select(
            "path",
            F.when(F.col("r_size").isNull() & F.col("r_etag").isNull(), F.lit("added"))
            .when(F.col("l_size").isNull() & F.col("l_etag").isNull(), F.lit("removed"))
            .otherwise(F.lit("changed"))
            .alias("change"),
        )
    )


class SyncConflictError(Exception):
    """A path changed on both sides (pkg/local/sync.go conflict abort)."""


def apply_sync_plan(
    repo,
    branch: str,
    plan: DataFrame,
    local_root: str,
    key_prefix: str = "",
    on_conflict: str = "abort",
) -> dict:
    """Execute a sync plan against a local directory and a branch —
    the ``lakectl local`` apply step (pkg/local/sync.go syncManager:
    upload/delete-remote mutate branch staging, download/delete-local
    mutate the working tree; a conflict aborts unless told to skip).

    Byte movement is client-side BY NATURE: ``lakectl local`` is one
    client against its own filesystem, so Spark distributes the
    PLANNING (walker listing + the two full-outer joins), and this
    loop runs over the plan — which is changed-paths-sized, never
    repo-sized. Uploads copy bytes to a content-addressed RELATIVE
    address under the repo's data root (md5 etag, like the gateway
    single-part flow); downloads resolve RELATIVE or FULL addresses.
    Returns per-op counts; staged changes are left uncommitted, like
    the reference (commit is a separate step).
    """
    import hashlib
    import os

    if on_conflict not in ("abort", "skip"):
        raise ValueError(f"on_conflict must be abort|skip, got {on_conflict!r}")
    rows = plan.collect()
    conflicts = [r["path"] for r in rows if r["op"] == CONFLICT]
    if conflicts and on_conflict == "abort":
        raise SyncConflictError(
            f"{len(conflicts)} conflicting paths, first: {conflicts[0]!r}"
        )
    counts = {UPLOAD: 0, DOWNLOAD: 0, DELETE_REMOTE: 0, DELETE_LOCAL: 0, CONFLICT: len(conflicts)}
    data_root = repo.store.data_root
    to_delete_remote: list[str] = []
    to_upload: list[dict] = []
    for r in rows:
        path, op = r["path"], r["op"]
        key = key_prefix + path
        lpath = os.path.join(local_root, path)
        if op == UPLOAD:
            with open(lpath, "rb") as f:
                payload = f.read()
            etag = hashlib.md5(payload).hexdigest()
            rel = os.path.join("data", "sy", etag)
            dst = os.path.join(data_root, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if not os.path.exists(dst):  # content-addressed: dedup free
                with open(dst, "wb") as f:
                    f.write(payload)
            to_upload.append(
                {"key": key, "identity": etag, "address": rel,
                 "address_type": "RELATIVE", "size": len(payload), "etag": etag}
            )
            counts[UPLOAD] += 1
        elif op == DELETE_REMOTE:
            to_delete_remote.append(key)
        elif op == DOWNLOAD:
            ent = repo.get(branch, key)
            if ent is None:
                raise FileNotFoundError(f"remote object missing: {key}")
            try:  # repo.get may return a pyspark Row (no .get)
                addr_type = ent["address_type"]
            except (KeyError, ValueError):
                addr_type = None
            src = (
                ent["address"]
                if addr_type == "FULL"
                else os.path.join(data_root, ent["address"])
            )
            src = src.removeprefix("file:")
            os.makedirs(os.path.dirname(lpath), exist_ok=True)
            with open(src, "rb") as f_in, open(lpath, "wb") as f_out:
                f_out.write(f_in.read())
            counts[DOWNLOAD] += 1
        elif op == DELETE_LOCAL:
            if os.path.exists(lpath):
                os.remove(lpath)
            counts[DELETE_LOCAL] += 1
    if to_upload:
        # ONE staging batch + ONE pointer bump for all uploads — per-file
        # set_entry would launch a single-row Spark write per object
        rows = [
            (u["key"], u["identity"], u["address"], u["address_type"],
             u["size"], u["etag"], None, None, None)
            for u in to_upload
        ]
        df = repo.spark.createDataFrame(
            rows,
            "key string, identity string, address string, address_type string, "
            "size long, etag string, last_modified timestamp, "
            "metadata map<string,string>, content_type string",
        )
        repo.stage_entries(branch, df)
    if to_delete_remote:
        repo.stage_deletes(branch, to_delete_remote)
        counts[DELETE_REMOTE] = len(to_delete_remote)
    return counts


def sync_plan(local_changes: DataFrame, remote_changes: DataFrame) -> DataFrame:
    """Merge two change lists into sync operations (Changes.MergeWith).

    Inputs are ``(path, change)`` frames — local changes vs the synced
    base and remote changes vs the same base. Returns ``(path, op)``:

    - both sides changed            => ``conflict``
      (except both *removed*, which is agreement: no operation)
    - local added/changed           => ``upload``
    - local removed                 => ``delete_remote``
    - remote added/changed          => ``download``
    - remote removed                => ``delete_local``
    """
    l = local_changes.select("path", F.col("change").alias("l_change"))
    r = remote_changes.select("path", F.col("change").alias("r_change"))
    j = l.join(r, on="path", how="full_outer")
    both = F.col("l_change").isNotNull() & F.col("r_change").isNotNull()
    # null-safe: a one-sided row must not be dropped by three-valued logic
    both_removed = F.col("l_change").eqNullSafe(F.lit("removed")) & F.col(
        "r_change"
    ).eqNullSafe(F.lit("removed"))
    return (
        j.where(~both_removed)
        .select(
            "path",
            F.when(both, F.lit(CONFLICT))
            .when(F.col("l_change") == "removed", F.lit(DELETE_REMOTE))
            .when(F.col("l_change").isNotNull(), F.lit(UPLOAD))
            .when(F.col("r_change") == "removed", F.lit(DELETE_LOCAL))
            .otherwise(F.lit(DOWNLOAD))
            .alias("op"),
        )
    )
