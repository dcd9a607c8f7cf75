"""Pluggable ConflictResolver scenarios.

Ports the reference's TestMergeWithConflictResolver table
(pkg/graveler/committed/merge_test.go:1745-1860: no-choice, chooses-
source, chooses-dest, first-resolver-decides) onto the Spark merge
operator, plus the engine's declarative resolvers (key-pattern,
prefer-newer payload resolution) end-to-end through Repository.merge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakefs_spark.operators import merge as M
from lakefs_spark.schema import ENTRY_SCHEMA
from lakefs_spark.storage.repo import ConflictError, Repository


def _snap(spark, rows):
    """rows: (key, identity) or (key, identity, last_modified_epoch)."""
    data = []
    for r in rows:
        key, ident = r[0], r[1]
        ts = r[2] if len(r) > 2 else None
        data.append((key, ident, f"s3://b/{key}", "FULL", 1, "e", ts, None, "text/plain"))
    df = spark.createDataFrame(
        data,
        "key string, identity string, address string, address_type string, "
        "size long, etag string, ts long, metadata map<string,string>, content_type string",
    )
    return df.select(
        "key", "identity", "address", "address_type", "size", "etag",
        F.col("ts").cast("timestamp").alias("last_modified"), "metadata", "content_type",
    )


# merge_test.go:1747-1763 fixture: base={b:b}; source={a:a1}; dest={a:a2}
@pytest.fixture()
def sides(spark):
    base = _snap(spark, [("b", "b")])
    source = _snap(spark, [("a", "a1"), ("b", "b")])
    dest = _snap(spark, [("a", "a2"), ("b", "b")])
    return base, source, dest


def _acts(base, source, dest, strategy="none", resolvers=None):
    return {
        r["key"]: (r["action"], r["identity"])
        for r in M.merge_actions(base, source, dest, strategy, resolvers).collect()
    }


def test_resolver_makes_no_choice_is_conflict(sides):
    """merge_test.go 'resolver makes no choice': a passing resolver
    leaves the conflict to the strategy; 'none' => ErrConflictFound."""
    passer = lambda strategy: F.lit(None).cast("string")  # noqa: E731
    acts = _acts(*sides, strategy="none", resolvers=[passer])
    assert acts == {"a": ("conflict", "a1")}


def test_resolver_chooses_source(sides):
    """merge_test.go 'resolver chooses source': resolved write of a1."""
    chooser = lambda strategy: F.lit("src")  # noqa: E731
    acts = _acts(*sides, strategy="none", resolvers=[chooser])
    assert acts == {"a": ("set", "a1")}


def test_resolver_chooses_dest(sides):
    """merge_test.go 'resolver chooses dest': dest kept, no action."""
    chooser = lambda strategy: F.lit("dest")  # noqa: E731
    acts = _acts(*sides, strategy="none", resolvers=[chooser])
    assert acts == {}


def test_first_resolver_decides_over_strategy(sides):
    """merge_test.go 'first resolver decides': a dest-choosing resolver
    ahead of the strategy resolver wins even under strategy 'src'."""
    chooser = lambda strategy: F.lit("dest")  # noqa: E731
    acts = _acts(*sides, strategy="src", resolvers=[chooser])
    assert acts == {}
    # and without the custom resolver, strategy 'src' takes source
    assert _acts(*sides, strategy="src") == {"a": ("set", "a1")}


def test_key_pattern_resolver_scopes_resolution(spark):
    """Only conflicts under the pattern resolve; others stay conflicts."""
    base = _snap(spark, [])
    source = _snap(spark, [("logs/x", "s1"), ("tables/x", "s2")])
    dest = _snap(spark, [("logs/x", "d1"), ("tables/x", "d2")])
    acts = _acts(base, source, dest, resolvers=[M.key_pattern_resolver("^logs/", "src")])
    assert acts == {"logs/x": ("set", "s1"), "tables/x": ("conflict", "s2")}


def test_prefer_newer_resolver_uses_payload(spark):
    """Payload-based resolution: later last_modified wins; delete-vs-
    change (no source timestamp) passes through -> conflict."""
    base = _snap(spark, [("a", "a0", 50), ("b", "b0", 50), ("c", "c0", 50)])
    source = _snap(spark, [("a", "a1", 200), ("b", "b1", 100)])  # c deleted
    dest = _snap(spark, [("a", "a2", 100), ("b", "b2", 200), ("c", "c2", 60)])
    acts = _acts(base, source, dest, resolvers=[M.prefer_newer_resolver()])
    assert acts["a"] == ("set", "a1")  # source newer
    assert "b" not in acts  # dest newer -> kept, no action
    assert acts["c"] == ("conflict", None)  # delete-vs-change stays


def test_repository_merge_with_resolvers(spark, tmp_path):
    """End-to-end: Repository.merge(resolvers=...) resolves what would
    otherwise raise ConflictError (graveler wiring of the chain —
    committed/manager.go:319)."""
    repo = Repository.create(spark, str(tmp_path / "repo"))
    repo.stage_entries("main", _snap(spark, [("k", "v0")]))
    repo.commit("main", "base")
    repo.create_branch("feat", "main")
    repo.stage_entries("feat", _snap(spark, [("k", "v-src")]))
    repo.commit("feat", "src change")
    repo.stage_entries("main", _snap(spark, [("k", "v-dest")]))
    repo.commit("main", "dest change")

    with pytest.raises(ConflictError):
        repo.merge("feat", "main")
    c = repo.merge("feat", "main", resolvers=[M.key_pattern_resolver("^k$", "src")])
    assert repo.branches()["main"] == c.commit_id
    row = repo.get("main", "k")
    assert row["identity"] == "v-src"


def test_prefer_newer_keeps_delete_vs_change_conflict_on_engine_path(spark, tmp_path):
    """Review regression: on the diff-based engine merge path, removed
    rows must not leak the base entry's payload to resolvers —
    prefer_newer would otherwise compare the DELETED side's stale
    timestamp and silently resolve a delete-vs-change conflict."""
    import datetime

    from lakefs_spark.operators.merge import (
        merge_changes_from_diffs,
        prefer_newer_resolver,
    )

    def ts(h):
        return datetime.datetime(2026, 1, 1, h)

    # source deleted k; dest changed k (with a newer timestamp)
    schema = (
        "key string, diff_type string, identity string, left_identity string, "
        "address string, address_type string, size long, etag string, "
        "last_modified timestamp, metadata map<string,string>, content_type string"
    )
    sdiff = spark.createDataFrame(
        [("k", "removed", "base-id", None, None, "RELATIVE", 1, "e", ts(1), None, None)],
        schema,
    )
    ddiff = spark.createDataFrame(
        [("k", "changed", "dest-id", "base-id", None, "RELATIVE", 1, "e", ts(9), None, None)],
        schema,
    )
    out = merge_changes_from_diffs(
        sdiff, ddiff, "none", resolvers=[prefer_newer_resolver()]
    ).collect()
    assert [r["action"] for r in out] == ["conflict"], out
