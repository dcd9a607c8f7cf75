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
