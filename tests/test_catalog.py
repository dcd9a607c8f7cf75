"""Catalog facade: reference-API-shaped operations over Repository.

Covers the swagger data-plane core (SURVEY.md §2.13) and the
conditional-write predicates of §2.11 (SetIfAbsent / identity CAS,
pkg/graveler/graveler.go:1982-2003).
"""

from __future__ import annotations

import pytest

from lakefs_spark.catalog import Catalog
from lakefs_spark.sources.fixtures import create_fixture_views, entries_view
from lakefs_spark.storage.repo import PreconditionFailedError, Repository
from tests.conftest import SF_SMOKE


@pytest.fixture()
def cat(spark, tmp_path):
    create_fixture_views(spark, SF_SMOKE)
    r = Repository.create(spark, str(tmp_path / "repo"))
    r.raggedness = 97
    return Catalog(r)


def _seed(cat, spark, n_prefix="tables/orders/b1/"):
    ents = entries_view(spark, "entries").where(f"key like '{n_prefix}%'")
    cat.repo.import_entries("main", ents, message="seed")
    return ents


def test_repository_info_shape(cat, spark, tmp_path):
    info = cat.repository_info()
    assert info["default_branch"] == "main" and info["read_only"] is False
    ro = Catalog.create_repository(spark, str(tmp_path / "ro"), read_only=True)
    assert ro.repository_info()["read_only"] is True


def test_object_crud_and_listing(cat, spark):
    _seed(cat, spark)
    cat.upload_object("main", "raw/a.bin", "data/aa/1", 10, "etag-a")
    cat.upload_object("main", "raw/b.bin", "data/bb/2", 20, "etag-b")
    cat.commit("main", "objects")

    st = cat.stat_object("main", "raw/a.bin")
    assert st is not None and st["size"] == 10 and st["etag"] == "etag-a"
    assert cat.get_object("main", "raw/a.bin")["address"] == "data/aa/1"
    # identity derivation is deterministic on (size, etag, content_type)
    assert st["identity"] == cat.stat_object("main", "raw/a.bin")["identity"]

    page = cat.list_objects("main", prefix="raw/", amount=1)
    assert page["pagination"]["has_more"] is True
    assert page["results"][0]["key"] == "raw/a.bin"
    page2 = cat.list_objects("main", prefix="raw/", after=page["pagination"]["next_offset"])
    assert [r["key"] for r in page2["results"]] == ["raw/b.bin"]

    cat.copy_object("main", "main", "raw/a.bin", "raw/a-copy.bin")
    assert cat.stat_object("main", "raw/a-copy.bin")["address"] == "data/aa/1"

    cat.delete_objects("main", ["raw/a.bin", "raw/b.bin"])
    assert cat.stat_object("main", "raw/a.bin") is None
    assert cat.stat_object("main", "raw/a-copy.bin") is not None


def test_conditional_writes(cat, spark):
    cat.upload_object("main", "k1", "data/x/1", 1, "e1")
    with pytest.raises(PreconditionFailedError):
        cat.upload_object("main", "k1", "data/x/2", 2, "e2", if_none_match=True)
    # CAS on visible identity
    ident = cat.stat_object("main", "k1")["identity"]
    cat.repo.set_entry(
        "main",
        {"key": "k1", "identity": "new-ident", "address": "data/x/3", "size": 3},
        expected_identity=ident,
    )
    assert cat.stat_object("main", "k1")["address"] == "data/x/3"
    with pytest.raises(PreconditionFailedError):
        cat.repo.set_entry(
            "main",
            {"key": "k1", "identity": "i4", "address": "data/x/4", "size": 4},
            expected_identity=ident,  # stale expectation
        )
    with pytest.raises(PreconditionFailedError):
        cat.repo.set_entry(
            "main",
            {"key": "brand-new", "identity": "i5", "address": "a", "size": 5},
            expected_identity="something",  # key absent => predicate fails
        )
    # expected_identity=None == "must be absent" (create semantics)
    cat.repo.set_entry(
        "main",
        {"key": "brand-new", "identity": "i5", "address": "a", "size": 5},
        expected_identity=None,
    )
    assert cat.stat_object("main", "brand-new") is not None


def test_physical_address_flow(cat, spark):
    loc = cat.get_physical_address("main", "up/obj")
    assert loc["physical_address"].startswith("data/")
    cat.link_physical_address("main", "up/obj", loc["physical_address"], 99, "etag-up")
    row = cat.stat_object("main", "up/obj")
    assert row["address"] == loc["physical_address"] and row["size"] == 99


def test_refs_history_merge(cat, spark):
    _seed(cat, spark)
    cat.create_branch("dev", "main")
    cat.upload_object("dev", "raw/dev.bin", "data/d/1", 5, "e-dev")
    c_dev = cat.commit("dev", "dev work", metadata={"k": "v"})

    base = cat.find_merge_base("dev", "main")
    assert base == cat.repo.resolve("main").commit_id
    mc = cat.merge_into_branch("dev", "main")
    assert set(mc.parents) == {c_dev.commit_id, base} or len(mc.parents) == 2
    assert cat.stat_object("main", "raw/dev.bin") is not None

    log = cat.log_commits("main")
    assert [c.commit_id for c in log][0] == mc.commit_id
    assert cat.log_commits("main", amount=1)[0].commit_id == mc.commit_id
    plog = cat.log_commits("main", paths=["raw/dev.bin"])
    assert {c.commit_id for c in plog} <= {c.commit_id for c in log}
    assert plog and all("raw" not in (c.message or "") or True for c in plog)

    br = cat.list_branches()
    assert {r["id"] for r in br["results"]} == {"dev", "main"}
    cat.create_tag("v1", "main")
    assert cat.list_tags()["results"][0]["id"] == "v1"
    assert cat.stat_object("v1", "raw/dev.bin") is not None
    cat.delete_tag("v1")
    cat.delete_branch("dev")
    assert {r["id"] for r in cat.list_branches()["results"]} == {"main"}

    # revert the merge's dev-side change
    rv = cat.revert_branch("main", mc.commit_id, parent_number=1)
    assert cat.stat_object("main", "raw/dev.bin") is None
    assert rv.parents[0] == mc.commit_id


def test_import_tracking_and_gc(cat, spark, tmp_path):
    ents = entries_view(spark, "entries").where("key like 'tables/orders/b2/%'")
    imp = cat.import_start("main", ents, message="tracked import")
    st = cat.import_status("main", imp)
    assert st.completed and st.error is None
    assert st.ingested_objects == ents.count()
    assert cat.stat_object("main", ents.first()["key"]) is not None
    cat.import_cancel("main", imp)
    with pytest.raises(KeyError):
        cat.import_status("main", imp)

    active = cat.prepare_gc_commits(retention_days_default=1e9)
    assert st.commit.commit_id in active
    unc = cat.prepare_gc_uncommitted()
    assert unc.count() == 0

    # metadata plumbing
    head = cat.repo.resolve("main").commit_id
    mid = cat.repo.commits.get(head).metarange_id
    mr = cat.get_meta_range(mid)
    assert len(mr["ranges"]) >= 1
    rng = cat.get_range(mr["ranges"]["range_id"].iloc[0])
    import os
    assert os.path.exists(rng["location"])


def test_multipart_upload_flow(cat, spark):
    """Gateway multipart: composite ETag in part order, entry staged on
    complete (pkg/gateway multipart + md5-of-parts convention)."""
    import hashlib

    from lakefs_spark.functions.checksum import multipart_etag

    up = cat.create_multipart_upload("main", "big/obj.bin")
    p1 = hashlib.md5(b"chunk-one").hexdigest()
    p2 = hashlib.md5(b"chunk-two").hexdigest()
    # out-of-order part uploads must still compose in part order
    cat.upload_part(up["upload_id"], 2, p2, 700)
    cat.upload_part(up["upload_id"], 1, p1, 300)
    done = cat.complete_multipart_upload(up["upload_id"])
    assert done["etag"] == multipart_etag([p1, p2]) and done["etag"].endswith("-2")
    assert done["size"] == 1000

    row = cat.stat_object("main", "big/obj.bin")
    assert row["etag"] == done["etag"] and row["size"] == 1000
    assert row["address"] == up["physical_address"]

    up2 = cat.create_multipart_upload("main", "gone.bin")
    cat.abort_multipart_upload(up2["upload_id"])
    assert cat.stat_object("main", "gone.bin") is None
    import pytest as _pytest
    with _pytest.raises(KeyError):
        cat.complete_multipart_upload(up2["upload_id"])


def test_expire_tracking_ttl(cat, spark):
    """TTL cleanup of finished imports + hook run log (§2.12 expired
    imports/tasks — pkg/catalog/catalog.go:3177-3208)."""
    import time as _time

    from lakefs_spark.sources.fixtures import entries_view

    cat.repo.on("post-commit", lambda *_: None)
    ents = entries_view(spark, "entries").where("key like 'tables/orders/b4/%'")
    imp = cat.import_start("main", ents, message="tracked")
    assert cat.import_status("main", imp).completed
    cat.upload_object("main", "ttl/x", "data/t/1", 1, "e1")
    cat.commit("main", "hooked commit")  # post-commit hook -> one run row
    assert len(cat.repo.hook_runs()) >= 1

    # nothing is old enough yet
    assert cat.expire_tracking(ttl_seconds=3600) == 0
    assert cat.import_status("main", imp) is not None

    # with now pushed far into the future everything expires
    future = _time.time() + 10_000
    dropped = cat.expire_tracking(ttl_seconds=3600, now=future)
    assert dropped >= 2  # the import record + at least one run row
    assert cat.repo.hook_runs() == []
    import pytest as _pytest
    with _pytest.raises(KeyError):
        cat.import_status("main", imp)


def test_list_objects_v2_continuation(cat, spark):
    """ListObjectsV2 envelope: token precedence over start-after,
    truncation marker, and a token walk that yields every key exactly
    once (pkg/gateway/operations/listobjects.go:106-234)."""
    ents = entries_view(spark, "entries").where("key like 'tables/orders/b1/%'")
    cat.repo.import_entries("main", ents, message="seed")
    all_keys = sorted(r["key"] for r in ents.select("key").collect())

    # token-paged walk: no duplicates, no gaps
    seen, token, pages = [], "", 0
    while True:
        resp = cat.list_objects_v2("main", prefix="tables/orders/b1/",
                                   max_keys=7, continuation_token=token)
        assert resp["MaxKeys"] == 7 and resp["KeyCount"] == len(resp["Contents"])
        if token:
            assert resp["ContinuationToken"] == token  # echoed back
        seen += [c["Key"] for c in resp["Contents"]]
        pages += 1
        if not resp["IsTruncated"]:
            assert "NextContinuationToken" not in resp
            break
        token = resp["NextContinuationToken"]
        assert token == seen[-1]
    assert seen == all_keys and pages == -(-len(all_keys) // 7)

    # continuation-token takes precedence over start-after
    resp = cat.list_objects_v2("main", prefix="tables/orders/b1/", max_keys=2,
                               start_after=all_keys[5], continuation_token=all_keys[0])
    assert [c["Key"] for c in resp["Contents"]] == all_keys[1:3]
    assert resp["StartAfter"] == all_keys[5]

    # delimiter fold produces CommonPrefixes, not Contents
    resp = cat.list_objects_v2("main", prefix="tables/orders/", delimiter="/",
                               max_keys=10)
    assert [d["Prefix"] for d in resp["CommonPrefixes"]] == ["tables/orders/b1/"]
    assert resp["Contents"] == [] and resp["IsTruncated"] is False


def test_update_object_user_metadata(cat, spark):
    _seed(cat, spark)
    cat.upload_object("main", "raw/meta.bin", "data/mm/1", 5, "etag-m")
    cat.commit("main", "obj")
    before = cat.stat_object("main", "raw/meta.bin")
    cat.update_object_user_metadata("main", "raw/meta.bin", {"team": "ml", "v": "2"})
    cat.commit("main", "meta update")
    after = cat.stat_object("main", "raw/meta.bin")
    assert after["metadata"] == {"team": "ml", "v": "2"}
    # bytes untouched, identity recomputed (metadata is identity input)
    assert after["address"] == before["address"] and after["etag"] == before["etag"]
    assert after["identity"] != before["identity"]
    with pytest.raises(KeyError):
        cat.update_object_user_metadata("main", "raw/absent.bin", {"x": "1"})


def test_runs_api_surface(spark, tmp_path):
    """listRepositoryRuns / getRun / listRunHooks / getRunHookOutput
    (swagger.yml:5727-5841) over the hook run log + declarative-action
    task results."""
    from lakefs_spark.catalog import Catalog
    from lakefs_spark.storage.actions import ActionsService
    from lakefs_spark.storage.repo import HookAbortError

    cat = Catalog.create_repository(spark, str(tmp_path / "runsrepo"))
    svc = ActionsService(cat.repo)
    svc.add_action(
        {
            "name": "trace",
            "on": {"pre-commit": None},
            "hooks": [
                {"id": "say", "type": "script",
                 "properties": {"script": "output('hello ' + action['branch_id'])"}},
            ],
        }
    )
    cat.upload_object("main", "a/1", address="data/x1", size=1, checksum="c1")
    cat.commit("main", "one")
    cat.create_branch("dev", "main")
    cat.upload_object("dev", "a/2", address="data/x2", size=2, checksum="c2")
    cat.commit("dev", "two")

    got = cat.list_repository_runs(branch="dev")
    assert got["results"] and all(r["branch"] == "dev" for r in got["results"])
    any_run = got["results"][0]
    assert cat.get_run(any_run["run_id"])["run_id"] == any_run["run_id"]

    # task results + output of the script hook
    task = svc.task_results()[0]
    hooks = cat.list_run_hooks(task["run_id"])
    assert [h["hook_id"] for h in hooks["results"]] == ["say"]
    out = cat.get_run_hook_output(task["run_id"], task["hook_run_id"])
    assert out.startswith("hello ")


def test_runs_api_id_chain_and_pagination(spark, tmp_path):
    """Review regressions: (a) listRepositoryRuns ids chain into
    listRunHooks (shared base id), (b) hook pagination walks newest->
    oldest without repeats, (c) reading the runs API must NOT bind a
    second dispatcher (hooks still run exactly once per event)."""
    from lakefs_spark.catalog import Catalog
    from lakefs_spark.storage.actions import ActionsService

    cat = Catalog.create_repository(spark, str(tmp_path / "chainrepo"))
    svc = ActionsService(cat.repo)
    svc.add_action(
        {
            "name": "multi",
            "on": {"pre-commit": None},
            "hooks": [
                {"id": f"h{i}", "type": "script", "properties": {"script": "x = 1"}}
                for i in range(3)
            ],
        }
    )
    cat.upload_object("main", "a/1", address="data/x1", size=1, checksum="c1")
    cat.commit("main", "one")

    # (a) chain: the run-log id resolves the same event's task rows
    rid = cat.list_repository_runs()["results"][0]["run_id"]
    hooks = cat.list_run_hooks(rid)
    assert [h["hook_id"] for h in hooks["results"]] == ["h2", "h1", "h0"]
    assert cat.get_run(hooks["results"][0]["run_id"])["event"] in (
        "pre-commit", "prepare-commit", "post-commit",
    )

    # (b) pagination: newest-first pages, no repeats, full coverage
    page1 = cat.list_run_hooks(rid, amount=2)
    assert page1["pagination"]["has_more"]
    page2 = cat.list_run_hooks(rid, after=page1["pagination"]["next_offset"], amount=2)
    seen = [h["hook_run_id"] for h in page1["results"] + page2["results"]]
    assert len(seen) == 3 and len(set(seen)) == 3

    # (c) the reads above must not have registered another dispatcher
    n_before = len(svc.task_results())
    cat.upload_object("main", "a/2", address="data/x2", size=2, checksum="c2")
    cat.commit("main", "two")
    assert len(svc.task_results()) - n_before == 3  # once per hook, not twice


def test_annotate_ignores_staged_uncommitted(spark, tmp_path):
    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "blamerepo"))
    repo.set_entry("main", {"key": "a", "identity": "i", "size": 1, "etag": "e"})
    repo.commit("main", "c1")
    repo.set_entry("main", {"key": "staged-only", "identity": "s", "size": 1, "etag": "s"})
    got = {r["key"] for r in repo.annotate("main").collect()}
    assert got == {"a"}  # committed view only; staged key is unattributable


def test_if_eval_error_logged_as_failed(spark, tmp_path):
    from lakefs_spark.storage.actions import ActionsService
    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "ifrepo"))
    svc = ActionsService(repo)
    svc.add_action(
        {
            "name": "badif",
            "on": {"post-commit": None},
            "hooks": [{"id": "h1", "type": "script", "if": "1 + 1",
                       "properties": {"script": "x = 1"}}],
        }
    )
    repo.set_entry("main", {"key": "a", "identity": "i", "size": 1, "etag": "e"})
    repo.commit("main", "ok")
    t = svc.task_results()[0]
    assert t["status"] == "failed" and "boolean" in t["error"]


def test_update_metadata_preserves_address_type(spark, tmp_path):
    """Review regression: metadata update restages IN PLACE — a
    zero-copy FULL-address import must keep its address_type and
    last_modified."""
    from lakefs_spark.catalog import Catalog

    cat = Catalog.create_repository(spark, str(tmp_path / "metarepo"))
    cat.repo.set_entry(
        "main",
        {"key": "imported/x", "identity": "i1", "address": "s3://bkt/abs/x",
         "address_type": "FULL", "size": 5, "etag": "e1"},
    )
    cat.update_object_user_metadata("main", "imported/x", {"team": "data"})
    got = cat.get_object("main", "imported/x")
    assert got["address_type"] == "FULL"
    assert got["address"] == "s3://bkt/abs/x"
    assert dict(got["metadata"]) == {"team": "data"}


def test_diff_refs_paged_delimiter_grouping(cat, spark):
    """diff_refs_paged mirrors the API's listDiffHelper envelope
    (pkg/api/controller.go DiffRefs, pkg/catalog/catalog.go:1994-2060):
    grouped rows are common_prefix/prefix_changed, leaves keep their
    diff type, and the delimiter-mode cursor seeks past the WHOLE group
    (UpperBoundForPrefix) — including the reference's deliberate
    skipping of leaves that extend a leaf cursor."""
    from lakefs_spark.schema import ENTRY_SCHEMA

    cat.repo.set_entry("main", {"key": "seed", "identity": "i0",
                                "size": 1, "etag": "e"})
    cat.repo.commit("main", "seed")
    cat.repo.create_branch("dev", "main")
    cat.repo.stage_entries(
        "dev",
        spark.createDataFrame(
            [(k, f"id-{k}", f"a/{k}", "RELATIVE", 1, "e", None, None, "t")
             for k in ["a/1", "a/2", "b/1", "c", "ca"]],
            ENTRY_SCHEMA,
        ),
    )
    cat.repo.commit("dev", "adds")

    body = cat.diff_refs_paged("main", "dev", delimiter="/")
    assert [(r["path"], r["path_type"], r["type"]) for r in body["results"]] == [
        ("a/", "common_prefix", "prefix_changed"),
        ("b/", "common_prefix", "prefix_changed"),
        ("c", "object", "added"),
        ("ca", "object", "added"),
    ]
    assert body["pagination"]["has_more"] is False

    # cursor walk at amount=1: a/ → b/ → c → END ('ca' is skipped by
    # the UpperBoundForPrefix seek after the page ending at leaf 'c' —
    # reference semantics, reproduced not "fixed")
    walked, cursor = [], ""
    while True:
        page = cat.diff_refs_paged("main", "dev", after=cursor,
                                   delimiter="/", amount=1)
        walked += [r["path"] for r in page["results"]]
        if not page["pagination"]["has_more"]:
            break
        cursor = page["pagination"]["next_offset"]
    assert walked == ["a/", "b/", "c"]

    # prefix narrows to one group's members as objects
    body = cat.diff_refs_paged("main", "dev", prefix="a/", delimiter="/")
    assert [r["path"] for r in body["results"]] == ["a/1", "a/2"]
    assert all(r["path_type"] == "object" for r in body["results"])
