"""Unit tests for operators/sync.py edge semantics."""

from __future__ import annotations

from lakefs_spark.operators import sync as SY


def _files(spark, rows):
    return spark.createDataFrame(rows, "path string, size long, etag string")


def _changes(spark, rows):
    return spark.createDataFrame(rows, "path string, change string")


def test_local_diff_cases(spark):
    local = _files(spark, [("a", 1, "e1"), ("b", 2, "e2"), ("d", 4, None)])
    remote = _files(spark, [("a", 1, "e1"), ("c", 3, "e3"), ("d", 4, None)])
    out = {r["path"]: r["change"] for r in SY.local_diff(local, remote).collect()}
    # a: identical => absent; d: null etags compare null-safe equal => absent
    assert out == {"b": "added", "c": "removed"}
    # size match but etag differs => changed
    out2 = SY.local_diff(
        _files(spark, [("x", 1, "e1")]), _files(spark, [("x", 1, "eX")])
    ).collect()
    assert [(r["path"], r["change"]) for r in out2] == [("x", "changed")]


def test_sync_plan_cases(spark):
    lc = _changes(
        spark,
        [("up", "added"), ("up2", "changed"), ("delr", "removed"),
         ("cf", "changed"), ("gone", "removed")],
    )
    rc = _changes(
        spark,
        [("down", "added"), ("dell", "removed"), ("cf", "changed"),
         ("gone", "removed")],
    )
    out = {r["path"]: r["op"] for r in SY.sync_plan(lc, rc).collect()}
    assert out == {
        "up": "upload",
        "up2": "upload",
        "delr": "delete_remote",
        "down": "download",
        "dell": "delete_local",
        "cf": "conflict",
        # "gone" removed on both sides: agreement, no op
    }


def test_asof_join_semantics(spark):
    """Inclusive match, per-key isolation, null when nothing precedes,
    tolerance nulls stale matches."""
    from lakefs_spark.operators.asof import asof_join
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, "u", 100.0), (2, "u", 205.0), (3, "v", 50.0)],
        "lid long, k string, ts double",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    right = spark.createDataFrame(
        [("u", 100.0, "a"), ("u", 200.0, "b"), ("v", 60.0, "c")],
        "k string, ts double, tag string",
    ).withColumn("ts", F.timestamp_seconds("ts"))

    out = {
        r["lid"]: (r["tag"], r["matched_ts"])
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert out[1][0] == "a"      # inclusive: right at exactly left_ts matches
    assert out[2][0] == "b"      # latest preceding, not first
    assert out[3][0] is None     # v's only click is later -> no match

    tol = {
        r["lid"]: r["tag"]
        for r in asof_join(left, right, on=["k"], tolerance_s=4.0).collect()
    }
    assert tol[1] == "a" and tol[2] is None  # 5s-stale match nulled


def test_asof_and_range_join_match_naive_random(spark):
    """Seeded randomized cross-check of both custom joins against naive
    pandas references (merge_asof / filtered cross join)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from lakefs_spark.operators.asof import asof_join
    from lakefs_spark.operators.rangejoin import range_join

    rng = np.random.default_rng(42)
    n = 400
    lp = pd.DataFrame({
        "lid": np.arange(n),
        "k": rng.integers(0, 15, n).astype(str),
        "ts": rng.uniform(0, 1000, n),
    })
    rp = pd.DataFrame({
        "k": rng.integers(0, 15, n).astype(str),
        "ts": rng.uniform(0, 1000, n),
        "tag": np.arange(n),
    }).drop_duplicates(["k", "ts"])

    left = spark.createDataFrame(lp).withColumn("ts", F.timestamp_seconds("ts"))
    right = spark.createDataFrame(rp).withColumn("ts", F.timestamp_seconds("ts"))
    got = {
        r["lid"]: r["tag"] for r in asof_join(left, right, on=["k"]).collect()
    }
    exp_df = pd.merge_asof(
        lp.sort_values("ts"), rp.sort_values("ts"), on="ts", by="k", direction="backward"
    )
    exp = {int(r.lid): (None if pd.isna(r.tag) else int(r.tag)) for r in exp_df.itertuples()}
    assert got == exp

    pts = pd.DataFrame({
        "pid": np.arange(n),
        "k": rng.integers(0, 10, n).astype(str),
        "v": rng.uniform(0, 1000, n),
    })
    lo = rng.uniform(0, 900, 120)
    iv = pd.DataFrame({
        "iid": np.arange(120),
        "k": rng.integers(0, 10, 120).astype(str),
        "lo": lo,
        "hi": lo + rng.uniform(0, 300, 120),
    })
    got_rj = {
        (r["pid"], r["iid"])
        for r in range_join(
            spark.createDataFrame(pts), spark.createDataFrame(iv),
            on=["k"], point_col="v", lo_col="lo", hi_col="hi", bucket_width=128.0,
        ).collect()
    }
    m = pts.merge(iv, on="k")
    exp_rj = {
        (int(r.pid), int(r.iid))
        for r in m[(m.v >= m.lo) & (m.v <= m.hi)].itertuples()
    }
    assert got_rj == exp_rj


def test_duplicate_clusters_components(spark):
    """Chain, triangle-with-tail, and disjoint pair resolve to their
    component minima; propagation converges past one hop."""
    from lakefs_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (diameter 3: needs multi-round propagation),
        # triangle 10-11-12 with tail 13, disjoint pair 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (12, 13), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r["member"]: r["rep"] for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}
    # driver union-find fast path and distributed propagation agree
    dist = {
        r["member"]: r["rep"]
        for r in duplicate_clusters(pairs, driver_threshold=0).collect()
    }
    assert dist == got


def test_apply_sync_plan_converges(spark, tmp_path):
    """apply_sync_plan (pkg/local/sync.go syncManager): uploads /
    remote-deletes land in branch staging, downloads / local-deletes
    mutate the working tree; after apply + commit both sides agree."""
    import hashlib
    import os
    import tempfile

    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, tempfile.mkdtemp(prefix="lakefs_sync_"))
    data_root = repo.store.data_root

    def put_remote(key, payload: bytes):
        etag = hashlib.md5(payload).hexdigest()
        rel = os.path.join("data", "sy", etag)
        os.makedirs(os.path.join(data_root, "data", "sy"), exist_ok=True)
        with open(os.path.join(data_root, rel), "wb") as f:
            f.write(payload)
        repo.set_entry("main", {"key": key, "identity": etag, "address": rel,
                                "address_type": "RELATIVE", "size": len(payload),
                                "etag": etag})

    # base: a, b, c on both sides
    local = tmp_path / "worktree"
    local.mkdir()
    for name, body in [("a.txt", b"A1"), ("b.txt", b"B1"), ("c.txt", b"C1")]:
        (local / name).write_bytes(body)
        put_remote(name, body)
    repo.commit("main", "base")

    # remote side moves: adds e.txt, deletes c.txt (committed)
    put_remote("e.txt", b"E1")
    repo.stage_deletes("main", ["c.txt"])
    repo.commit("main", "remote changes")

    # local side moves: modifies a, deletes b, adds d
    (local / "a.txt").write_bytes(b"A2-modified")
    (local / "b.txt").unlink()
    (local / "d.txt").write_bytes(b"D1")

    local_changes = spark.createDataFrame(
        [("a.txt", "changed"), ("b.txt", "removed"), ("d.txt", "added")],
        "path string, change string",
    )
    remote_changes = spark.createDataFrame(
        [("e.txt", "added"), ("c.txt", "removed")], "path string, change string"
    )
    plan = SY.sync_plan(local_changes, remote_changes)
    counts = SY.apply_sync_plan(repo, "main", plan, str(local))
    assert counts == {"upload": 2, "download": 1, "delete_remote": 1,
                      "delete_local": 1, "conflict": 0}

    repo.commit("main", "local changes synced up")
    remote_keys = {r["key"]: r["size"] for r in repo.list_entries("main").collect()}
    assert set(remote_keys) == {"a.txt", "d.txt", "e.txt"}
    assert remote_keys["a.txt"] == len(b"A2-modified")
    assert sorted(p.name for p in local.iterdir()) == ["a.txt", "d.txt", "e.txt"]
    assert (local / "e.txt").read_bytes() == b"E1"

    # conflict: both sides changed the same path -> abort by default
    bad = SY.sync_plan(
        spark.createDataFrame([("x", "changed")], "path string, change string"),
        spark.createDataFrame([("x", "changed")], "path string, change string"),
    )
    import pytest as _pytest

    with _pytest.raises(SY.SyncConflictError):
        SY.apply_sync_plan(repo, "main", bad, str(local))
    assert SY.apply_sync_plan(repo, "main", bad, str(local), on_conflict="skip")[
        "conflict"
    ] == 1
