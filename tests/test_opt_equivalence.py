"""Round-10 optimization equivalence pins.

Each optimization this round restructured an operator's *plan* while
claiming bit-identical results; these tests pin the claims against the
unoptimized formulations so a future refactor cannot silently diverge:

1. ``write_ranges(dedup=True)`` (dedup folded into the chunk shuffle)
   == ``dedup_entries`` + ``write_ranges`` — same manifest (range ids,
   min/max/count) and byte-identical range files, on an input with
   duplicate keys whose winners exercise the tiebreak.
2. ``merge_changes_from_sides`` (slim base sides, payload-free dest)
   == ``merge_changes_from_diffs(diff(...), diff(...))`` — same action
   rows across add/remove/change/conflict/delete-vs-change cases,
   with and without a resolver reading ``d_*`` payload columns.
3. Hoisted-norm cosine (``cosine_pairs``) == inlined ``cosine()`` —
   bit-equal doubles, not approximately equal.
4. Listing-page window prune (``read_snapshot(min_rows=...)``) — a
   committed page walk returns exactly the unpruned listing while each
   page scans a strict subset of the range files; a staging overlay
   disables the prune (tombstones can push the cutoff past any
   committed-count window).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from lakefs_spark.operators import diff as D
from lakefs_spark.operators import merge as M
from lakefs_spark.operators.overlay import dedup_entries
from lakefs_spark.operators.similarity import _dot, _norm, cosine
from lakefs_spark.schema import ENTRY_COLS


def _entries(spark, rows):
    """rows: (key, identity, etag)."""
    data = [
        (k, ident, f"s3://b/{k}", "FULL", 1, etag, None, None, "text/plain")
        for k, ident, etag in rows
    ]
    return spark.createDataFrame(
        data,
        "key string, identity string, address string, address_type string, "
        "size long, etag string, last_modified timestamp, "
        "metadata map<string,string>, content_type string",
    )


def test_write_ranges_folded_dedup_matches_window_dedup(spark, tmp_path):
    from lakefs_spark.storage import ranges as R

    # duplicate keys with distinct identities/etags so the winner is
    # decided by the tiebreak, plus clean keys, at a raggedness small
    # enough to produce several chunks
    rows = []
    for i in range(2000):
        k = f"k{i:05d}"
        rows.append((k, f"id{i}a", "e1"))
        if i % 3 == 0:
            rows.append((k, f"id{i}b", "e2"))  # duplicate key, different row
    ents = _entries(spark, rows)

    r_old = tmp_path / "old"
    r_new = tmp_path / "new"
    m_old = R.write_ranges(dedup_entries(ents.select(*ENTRY_COLS)), str(r_old), raggedness=200)
    m_new = R.write_ranges(ents.select(*ENTRY_COLS), str(r_new), raggedness=200, dedup=True)

    assert m_old.reset_index(drop=True).equals(m_new.reset_index(drop=True))
    assert len(m_old) > 1  # the raggedness actually split chunks
    for rid in m_old["range_id"]:
        b_old = open(os.path.join(r_old, "ranges", f"{rid}.parquet"), "rb").read()
        b_new = open(os.path.join(r_new, "ranges", f"{rid}.parquet"), "rb").read()
        assert hashlib.sha256(b_old).hexdigest() == hashlib.sha256(b_new).hexdigest()


def _merge_fixture(spark):
    base = _entries(
        spark,
        [("a", "a0", "e"), ("b", "b0", "e"), ("c", "c0", "e"), ("d", "d0", "e"), ("e", "e0", "e")],
    )
    # source: changes a, deletes b, adds f, conflicts on d (vs dest), delete-vs-change on e
    source = _entries(
        spark,
        [("a", "a1", "e"), ("c", "c0", "e"), ("d", "d1", "e"), ("f", "f1", "e")],
    )
    # dest: changes c, conflicts on d, changes e (source deleted it)
    dest = _entries(
        spark,
        [("a", "a0", "e"), ("b", "b0", "e"), ("c", "c1", "e"), ("d", "d2", "e"), ("e", "e1", "e")],
    )
    return base, source, dest


def _collect_actions(df):
    return sorted(
        (r["key"], r["action"], r["identity"], r["etag"]) for r in df.collect()
    )


def test_merge_changes_from_sides_matches_from_diffs(spark):
    base, source, dest = _merge_fixture(spark)
    for strategy in ("none", "src", "dest"):
        via_diffs = M.merge_changes_from_diffs(
            D.diff(base, source), D.diff(base, dest), strategy
        )
        via_sides = M.merge_changes_from_sides(base, source, base, dest, strategy)
        assert _collect_actions(via_diffs) == _collect_actions(via_sides), strategy


def test_merge_changes_from_sides_matches_with_resolver(spark):
    # a resolver that reads d_* payload forces the dest side to carry
    # payload — the slim path must detect that and ship it
    base, source, dest = _merge_fixture(spark)

    def prefer_src_on_d(strategy):
        return F.when(F.col("key") == "d", F.lit("src"))

    via_diffs = M.merge_changes_from_diffs(
        D.diff(base, source), D.diff(base, dest), "none", [prefer_src_on_d]
    )
    via_sides = M.merge_changes_from_sides(
        base, source, base, dest, "none", [prefer_src_on_d]
    )
    assert _collect_actions(via_diffs) == _collect_actions(via_sides)


def test_hoisted_norm_cosine_is_bit_equal(spark):
    from lakefs_spark.operators.similarity import cosine_pairs

    vecs = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 13) - 6.0 for j in range(8)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    hoisted = {
        (r["qa"], r["qb"]): r["sim"] for r in cosine_pairs(vecs, vecs).collect()
    }
    a = vecs.select(F.col("vec_id").alias("qa"), F.col("embedding").alias("va"))
    b = vecs.select(F.col("vec_id").alias("qb"), F.col("embedding").alias("vb"))
    inlined = {
        (r["qa"], r["qb"]): r["sim"]
        for r in a.join(F.broadcast(b))
        .select("qa", "qb", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .collect()
    }
    assert hoisted == inlined  # exact equality, not approx


def test_listing_window_prune_is_exact_and_prunes(spark, tmp_path):
    from lakefs_spark.storage import ranges as R
    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "repo"))
    repo.raggedness = 40  # many small ranges
    rows = [(f"t/{i:05d}", f"id{i}", "e") for i in range(1200)]
    repo.import_entries("main", _entries(spark, rows), message="base")

    mid = repo._metarange_of(repo.resolve("main").commit_id)
    all_ranges = set(R.read_manifest(repo.store, mid)["range_id"])
    assert len(all_ranges) > 5  # the raggedness actually split chunks

    def scanned_ranges(df):
        return {
            os.path.basename(p).removesuffix(".parquet")
            for p in df.inputFiles()
            if "/ranges/" in p
        }

    # ranges the cursor lower bound alone keeps (pre-window-prune set)
    man = R.read_manifest(repo.store, mid)
    cursor_kept = set(man[man["max_key"] >= "t/00300\x00"]["range_id"])

    # committed flat page mid-walk: scans a strict subset of the
    # cursor-kept ranges (the count window cut in)
    probe = repo.list_entries("main", prefix="t/", after="t/00300", limit=51)
    assert scanned_ranges(probe) < cursor_kept

    # the pruned page walk reproduces the unpruned listing exactly
    truth = [r["key"] for r in repo.snapshot("main").orderBy("key").collect()]
    walked, after = [], ""
    while True:
        page, more = repo.list_page("main", prefix="t/", after=after, amount=37)
        walked.extend(r["key"] for r in page)
        if not more:
            break
        assert len(page) == 37  # non-final pages must fill
        after = page[-1]["key"]
    assert walked == truth

    # a staging overlay disables the prune and the walk stays exact
    repo.stage_deletes("main", spark.createDataFrame(
        [(k,) for k in truth[40:80]], "key string"
    ))
    probe = repo.list_entries("main", prefix="t/", after="t/00300", limit=51)
    assert scanned_ranges(probe) == cursor_kept
    walked, after = [], ""
    while True:
        page, more = repo.list_page("main", prefix="t/", after=after, amount=37)
        walked.extend(r["key"] for r in page)
        if not more:
            break
        after = page[-1]["key"]
    assert walked == truth[:40] + truth[80:]


def test_fused_probe_apply_matches_merged_scan_apply(spark, tmp_path):
    """Pin for the fused-probe COW apply (round-10 continuation): the
    single probe job + base-rows-only boundary scan must reproduce the
    exact manifest (range ids = content addresses) the previous shape
    (separate touched job + merged-overlay boundary scan) produced.

    The change stream deliberately exercises every term of the
    set-algebra rewrite
      bflag(merged) = (bflag(base) - bflag(changes_all))
                      | bflag(changes_nontombstone)
    — sets and tombstones on boundary-flagged keys, a tombstone exactly
    on a range's max_key (the p+1 boundary-dissolution rule), new keys
    past the last range (one of them boundary-flagged), and a touched
    pattern with gaps so untouched-run edge injection engages.
    """
    import numpy as np

    from lakefs_spark.plans.chunker import assign_chunks, boundary_flag
    from lakefs_spark.storage import ranges as R
    from lakefs_spark.storage.commit_apply import (
        _assign_positions,
        apply_changes,
        cow_overlay,
    )

    rag = 200
    rows = [(f"k{i:05d}", f"id{i}", "e") for i in range(3000)]
    root = tmp_path / "repo"
    base_mf = R.write_ranges(_entries(spark, rows), str(root), raggedness=rag)
    assert len(base_mf) > 6

    keys = [r[0] for r in rows]
    flagged = [
        r[0]
        for r in spark.createDataFrame([(k,) for k in keys], "key string")
        .where(boundary_flag(F.col("key"), rag))
        .orderBy("key")
        .collect()
    ]
    assert len(flagged) >= 4  # need boundary keys to set AND delete
    mf_sorted = base_mf.sort_values("min_key").reset_index(drop=True)
    max_keys = mf_sorted["max_key"].tolist()

    # candidate extension keys past the last range, one boundary-flagged
    ext = [f"z{i:05d}" for i in range(400)]
    ext_flagged = [
        r[0]
        for r in spark.createDataFrame([(k,) for k in ext], "key string")
        .where(boundary_flag(F.col("key"), rag))
        .orderBy("key")
        .collect()
    ]
    assert ext_flagged, "pick more ext candidates"

    set_keys = [keys[10], flagged[0], keys[1500], ext[0], ext_flagged[0]]
    del_keys = [keys[20], flagged[1], max_keys[2]]  # incl. a range max_key
    changed = sorted(set(set_keys) | set(del_keys))

    def change_df():
        data = [
            (False, k, f"nid-{k}", f"s3://b/{k}", "FULL", 2, "e9", None, None, "text/plain")
            for k in set_keys
        ] + [
            (True, k, None, None, None, None, None, None, None, None)
            for k in del_keys
        ]
        return spark.createDataFrame(
            data,
            "is_tombstone boolean, key string, identity string, address string, "
            "address_type string, size long, etag string, last_modified timestamp, "
            "metadata map<string,string>, content_type string",
        )

    # ---- expected manifest via the OLD formulation --------------------
    # touched: searchsorted + the tombstone-on-max-key p+1 rule
    tomb = {k: (k in del_keys) for k in changed}
    pos = _assign_positions(np.array(changed, dtype=object), max_keys)
    touched = set()
    for k, p in zip(changed, pos):
        p = int(p)
        touched.add(p)
        if tomb[k] and p + 1 < len(max_keys) and k == max_keys[p]:
            touched.add(p + 1)
    assert len(touched) < len(max_keys)  # gaps exist -> edges engage
    touched_sorted = sorted(touched)
    last = len(max_keys) - 1
    edge_keys = {
        max_keys[p]
        for i, p in enumerate(touched_sorted)
        if p != last
        and (i + 1 == len(touched_sorted) or touched_sorted[i + 1] != p + 1)
    }
    base_rows = R.read_ranges(
        spark, str(root), mf_sorted.iloc[touched_sorted]["range_id"].tolist()
    )
    merged = cow_overlay(base_rows, change_df())
    bks_old = sorted(
        {r[0] for r in merged.where(boundary_flag(F.col("key"), rag)).select("key").collect()}
        | edge_keys
    )
    # the scenario really exercises the algebra: a boundary key was
    # deleted (must drop from bks) and a boundary key added (must join)
    assert flagged[1] not in bks_old and ext_flagged[0] in bks_old
    chunked = assign_chunks(merged, "key", rag, boundaries=bks_old)
    root_old = tmp_path / "old"
    rebuilt = R.write_ranges_prechunked(chunked, str(root_old), n_chunks=len(bks_old) + 1)
    untouched = mf_sorted[~mf_sorted.index.isin(touched)]
    import pandas as pd

    expected = (
        pd.concat([untouched[R.MANIFEST_COLS], rebuilt], ignore_index=True)
        .sort_values("min_key")
        .reset_index(drop=True)
    )

    # ---- actual: the fused-probe apply ---------------------------------
    actual = apply_changes(spark, str(root), base_mf, change_df(), rag)
    assert actual.reset_index(drop=True).equals(expected)


def test_identities_probe_local_matches_spark(spark, tmp_path, monkeypatch):
    """The driver-side (decoded-range LRU) identities probe behind
    log_with_paths returns exactly the Spark pruned-scan's mapping, and
    log_with_paths itself returns the same commits either way."""
    from lakefs_spark.storage import locallist
    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "idrepo"))
    repo.raggedness = 40
    rows = [
        (f"k/{i:04d}", f"id{i}", f"s3://{i}", "FULL", i, f"e{i}", None, None, "t")
        for i in range(300)
    ]
    ents = _entries_ddl(spark, rows)
    repo.import_entries("main", ents, message="base", date=100.0)
    touched = ["k/0003", "k/0123", "k/0299"]
    hits = []
    for i, k in enumerate(touched):
        repo.stage_entries(
            "main", ents.where(F.col("key") == k).withColumn("identity", F.lit(f"v{i}"))
        )
        hits.append(repo.commit("main", f"touch {i}", date=200.0 + i))

    from lakefs_spark.storage import ranges as R

    mid = repo._metarange_of(repo.resolve("main").commit_id)
    mf = R.read_manifest(repo.store, mid)
    ids = set(mf["range_id"])
    keys = set(touched) | {"k/0000", "nope/absent"}
    local = repo._identities_by_range(ids, keys, total_rows=int(mf["count"].sum()))
    dist = repo._identities_by_range(ids, keys, total_rows=None)
    assert local == dist and local  # same mapping, non-empty

    on = [c.commit_id for c in repo.log_with_paths("main", touched)]
    monkeypatch.setattr(locallist, "LOCAL_LIST_ROWS", 0)
    off = [c.commit_id for c in repo.log_with_paths("main", touched)]
    assert on == off
    assert set(c.commit_id for c in hits) <= set(on)


def _entries_ddl(spark, rows):
    return spark.createDataFrame(
        rows,
        "key string, identity string, address string, address_type string, "
        "size long, etag string, last_modified timestamp, "
        "metadata map<string,string>, content_type string",
    )


def test_count_entries_matches_snapshot_count(spark, tmp_path):
    """Manifest-count sum == snapshot row count on committed views;
    staging overlays (upsert + tombstone) fall back to the DataFrame
    count and still agree."""
    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "cntrepo"))
    repo.raggedness = 50
    assert repo.count_entries("main") == 0 == repo.snapshot("main").count()
    rows = [
        (f"c/{i:03d}", f"id{i}", f"s3://{i}", "FULL", i, f"e{i}", None, None, "t")
        for i in range(220)
    ]
    ents = _entries_ddl(spark, rows)
    repo.import_entries("main", ents, message="base")
    assert repo.count_entries("main") == 220 == repo.snapshot("main").count()
    # staging overlay: one new key, one tombstone
    repo.stage_entries("main", _entries_ddl(
        spark, [("c/new", "idn", "s3://n", "FULL", 1, "en", None, None, "t")]
    ))
    repo.stage_deletes("main", ["c/000"])
    assert repo.count_entries("main") == repo.snapshot("main").count() == 220
    assert repo.count_entries("main@") == 220  # committed view unaffected


def test_merge_diff_memo_matches_memo_off(spark, tmp_path, monkeypatch):
    """The metarange-keyed merge double-diff memo (repo._merge_join_memo)
    must be result-invisible: a conflict-detect merge followed by a
    strategy=src merge of the same commit triple produces the identical
    conflict count and metarange with the memo on and off; the memo is
    held across the failed merge (that is the reuse), is actually HIT
    (the qualified sides are built once, not twice), and is cleared by
    the successful branch write."""
    import lakefs_spark.storage.repo as repo_mod
    from lakefs_spark.storage.repo import ConflictError, Repository

    # force the distributed merge ladder (the memo's path): the local
    # small-merge fast path would otherwise serve these tiny merges
    monkeypatch.setattr(repo_mod.localapply, "LOCAL_APPLY_ROWS", 0)

    side_builds = {"n": 0}
    real_side = M._qualified_side

    def counting_side(*a, **kw):
        side_builds["n"] += 1
        return real_side(*a, **kw)

    monkeypatch.setattr(repo_mod.merge_ops, "_qualified_side", counting_side)

    results = {}
    for arm, cap in (("off", 0), ("on", 2)):
        monkeypatch.setattr(repo_mod, "_MERGE_MEMO_MAX", cap)
        repo = Repository.create(spark, str(tmp_path / f"memo_{arm}"))
        repo.raggedness = 40
        rows = [(f"k/{i:03d}", f"id{i}", f"e{i}") for i in range(300)]
        repo.import_entries("main", _entries(spark, rows), message="base")
        for br, salt in (("l", "L"), ("r", "R")):
            repo.create_branch(br, "main")
            ch = [(f"k/{i:03d}", f"id{i}{salt}", f"e{i}{salt}") for i in range(0, 300, 7)]
            ch.append((f"k/new{salt}", f"idn{salt}", f"en{salt}"))
            repo.stage_entries(br, _entries(spark, ch))
            repo.commit(br, f"{br} change")
        side_builds["n"] = 0
        try:
            repo.merge("l", "r")
            raise AssertionError("expected conflicts")
        except ConflictError as e:
            n_conf = e.conflicts.count()
        if cap:
            assert repo._merge_join_memo, "memo must survive a failed merge"
        c = repo.merge("l", "r", strategy="src")
        assert not repo._merge_join_memo, "memo must clear on a branch write"
        results[arm] = (n_conf, repo._metarange_of(c.commit_id), side_builds["n"])
    # identical conflicts and identical merged metarange, memo on/off
    assert results["on"][0] == results["off"][0] > 0
    assert results["on"][1] == results["off"][1]
    # memo off: both merges build both qualified sides (2 + 2);
    # memo on: only the first merge does (2) — the second is a cache hit
    assert results["off"][2] == 4 and results["on"][2] == 2
