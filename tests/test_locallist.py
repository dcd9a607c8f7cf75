"""Driver-side listing/point-lookup (locallist) parity pins: every page
and lookup must return exactly the DataFrame path's rows — field
order, metadata decode, timestamps, group/leaf interleaving, cursor
edge cases — and staging overlays must disable the fast path."""

from __future__ import annotations

import datetime as dt

import pytest

from lakefs_spark.storage import locallist as LL

TS = dt.datetime(2024, 5, 6, 7, 8, 9, 120000)
META = {"q": 'quo"te', "u": "ünïcode🙂", "n": "line\nbreak"}

ENTRY_DDL = (
    "key string, identity string, address string, address_type string, "
    "size long, etag string, last_modified timestamp, "
    "metadata map<string,string>, content_type string"
)


@pytest.fixture(scope="module")
def lrepo(spark, tmp_path_factory):
    from lakefs_spark.storage.repo import Repository

    root = str(tmp_path_factory.mktemp("locallist"))
    repo = Repository.create(spark, root)
    repo.raggedness = 60
    rows = []
    # leaves and groups interleaved at the fold level: "t/a.txt" (leaf)
    # sorts between groups like "t/a-dir/" and "t/b/..."; unicode keys;
    # metadata + timestamps on some rows
    for i in range(900):
        rows.append((f"t/b{i % 7}/d{i:04d}/f", f"id{i}", f"s3://{i}", "FULL",
                     i % 97, f"e{i}", TS if i % 3 == 0 else None,
                     META if i % 5 == 0 else None, "x" if i % 2 else None))
    for i in range(40):
        rows.append((f"t/leaf{i:03d}.txt", f"lid{i}", "s3://l", "FULL",
                     1, "el", None, None, "t"))
    rows.append(("t/émoji🙂/k", "uid", "s3://u", "FULL", 2, "eu", TS, META, "t"))
    rows.append(("outside/x", "oid", "s3://o", "FULL", 3, "eo", None, None, None))
    repo.import_entries("main", spark.createDataFrame(rows, ENTRY_DDL), message="base")
    return repo


def _walk(repo, prefix, delimiter, amount):
    out, after = [], ""
    while True:
        page, more = repo.list_page(
            "main", prefix=prefix, after=after, delimiter=delimiter, amount=amount
        )
        out.extend(page)
        if not more:
            break
        assert len(page) == amount
        after = page[-1]["key"]
    return out


@pytest.mark.parametrize(
    "prefix,delimiter,amount",
    [
        ("t/", "", 37),          # flat paged walk
        ("t/", "/", 5),          # grouped walk, cursor lands on groups
        ("", "/", 11),           # root-level fold
        ("t/b3/", "/", 7),       # nested groups
        ("t/leaf", "", 9),       # pure-leaf prefix
    ],
)
def test_page_walk_local_matches_dataframe(lrepo, monkeypatch, prefix, delimiter, amount):
    local = _walk(lrepo, prefix, delimiter, amount)
    monkeypatch.setattr(LL, "LOCAL_LIST_ROWS", 0)
    dist = _walk(lrepo, prefix, delimiter, amount)
    assert [tuple(r) for r in local] == [tuple(r) for r in dist]
    assert local and len(local) == len(dist)


def test_point_lookup_local_matches_dataframe(lrepo, monkeypatch):
    keys = ["t/émoji🙂/k", "t/b3/d0003/f", "t/leaf000.txt", "absent/key", "t/b3"]
    local = [lrepo.get("main", k) for k in keys]
    monkeypatch.setattr(LL, "LOCAL_LIST_ROWS", 0)
    dist = [lrepo.get("main", k) for k in keys]
    for a, b in zip(local, dist):
        assert (a is None) == (b is None)
        if a is not None:
            assert tuple(a) == tuple(b)
    assert local[0] is not None and local[0]["metadata"] == META


def test_staging_overlay_disables_and_stays_exact(lrepo, spark, monkeypatch):
    lrepo.create_branch("st", "main")
    lrepo.stage_deletes("st", spark.createDataFrame(
        [("t/leaf000.txt",), ("t/b3/d0003/f",)], "key string"))
    lrepo.stage_entries("st", spark.createDataFrame(
        [("t/new/k", "nid", "s3://n", "FULL", 1, "en", None, None, "t")], ENTRY_DDL))

    def walk(prefix, delim, amount):
        out, after = [], ""
        while True:
            page, more = lrepo.list_page("st", prefix=prefix, after=after,
                                         delimiter=delim, amount=amount)
            out.extend(page)
            if not more:
                break
            after = page[-1]["key"]
        return out

    local = walk("t/", "", 41)
    assert lrepo.get("st", "t/leaf000.txt") is None  # tombstone visible
    assert lrepo.get("st", "t/new/k") is not None
    monkeypatch.setattr(LL, "LOCAL_LIST_ROWS", 0)
    dist = walk("t/", "", 41)
    assert [tuple(r) for r in local] == [tuple(r) for r in dist]
    keys = {r["key"] for r in local}
    assert "t/leaf000.txt" not in keys and "t/new/k" in keys
