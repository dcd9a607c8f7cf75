"""Pebble SSTable reader golden tests (sources/sstable.py).

Three layers, each pinned against fixtures the REFERENCE's own test
suites ship (tests/data/sstable/, vendored — see its README):

1. block format: the h.* pebble tables must decode to exactly the
   h.txt word histogram (single- and two-level index, snappy and
   uncompressed);
2. graveler codec: range.sst / metarange.sst / ok1.sst decode to the
   entry/range shapes the reference wrote, and the metarange's
   descriptor agrees with the range file's own properties;
3. migration: metarange + range land in a Repository as one commit
   whose listing preserves keys, identities, addresses and sizes —
   then behaves like any native commit (diff against a follow-up).
"""

from __future__ import annotations

import os
import re
import shutil

import pytest

from lakefs_spark.sources import sstable as S

DATA = os.path.join(os.path.dirname(__file__), "data", "sstable")


def _load(name: str) -> bytes:
    return S.read_file(os.path.join(DATA, name))


def _h_expected() -> dict[str, str]:
    out = {}
    with open(os.path.join(DATA, "h.txt")) as f:
        for line in f:
            m = re.match(r" *(\d+) +(\w+) *$", line)
            if m:
                out[m.group(2)] = m.group(1)
    assert len(out) == 1710
    return out


# -- 1. block format ---------------------------------------------------------


@pytest.mark.parametrize(
    "fixture", ["h.sst", "h.no-compression.two_level_index.sst"]
)
def test_pebble_golden_word_histogram(fixture):
    got = {k.decode(): v.decode() for k, v in S.iter_raw_entries(_load(fixture))}
    assert got == _h_expected()


def test_keys_come_back_in_order():
    keys = [k for k, _ in S.iter_raw_entries(_load("h.sst"))]
    assert keys == sorted(keys)


def test_bad_magic_rejected():
    with pytest.raises(S.BadSSTable, match="magic"):
        list(S.iter_raw_entries(b"\x00" * 100))


def test_corrupt_block_crc_rejected():
    buf = bytearray(_load("range.sst"))
    buf[10] ^= 0xFF  # flip a data byte; footer/magic stay intact
    with pytest.raises(S.BadSSTable, match="crc"):
        list(S.iter_raw_entries(bytes(buf)))


def test_properties_block():
    props = S.read_properties(_load("range.sst"))
    assert props[b"type"] == b"ranges"
    assert props[b"count"] == b"2"
    assert props[b"min_key"] == b"a/b/c/no"
    assert props[b"max_key"] == b"a/b/c/yes"


# -- 2. graveler codec -------------------------------------------------------


def test_range_sst_decodes_reference_entries():
    rows = S.read_range_sstable(_load("range.sst"))
    assert [r["key"] for r in rows] == ["a/b/c/no", "a/b/c/yes"]
    no, yes = rows
    assert no["identity"] == (
        "56fef3921aa6e7fd62bbe23b2f69db3f9049a54b6f2c7bd886b7eb1a6ca3ab3e"
    )
    assert no["address"] == "b0c968736d8f42a2b1c6284835f08226"
    assert no["address_type"] == "RELATIVE"
    assert no["size"] == 11 and no["etag"] == "664c688b4ea9c56730daacfc3d70aeed"
    assert no["last_modified_s"] == 1628163584
    assert yes["size"] == 4
    assert yes["identity"] == (
        "6039b184d29379328b5364bb041b9926b4b388dbc326b7dd57f70cefd77b961e"
    )


def test_metarange_matches_range_contents():
    (desc,) = S.read_metarange_sstable(_load("metarange.sst"))
    rows = S.read_range_sstable(_load("range.sst"))
    assert desc["count"] == len(rows) == 2
    assert desc["min_key"] == rows[0]["key"]
    assert desc["max_key"] == rows[-1]["key"] == desc["key"]
    assert re.fullmatch(r"[0-9a-f]{64}", desc["range_id"])


def test_ok1_larger_range():
    rows = S.read_range_sstable(_load("ok1.sst"))
    props = S.read_properties(_load("ok1.sst"))
    assert len(rows) == int(props[b"count"]) == 105
    keys = [r["key"] for r in rows]
    assert keys == sorted(keys)
    assert keys[0] == "first"
    # (ok1's own min_key property is junk bytes in the upstream fixture;
    # max_key and count agree with the decoded records)
    assert keys[-1] == props[b"max_key"].decode() == "xyzzy"
    # deprecated by-prefix address type survives decode
    assert rows[{k: i for i, k in enumerate(keys)}["first"]][
        "address_type"
    ] == "BY_PREFIX_DEPRECATED"


def test_graveler_value_codec_roundtrip_shapes():
    # hand-built value: zigzag lengths |id|data| with trailing junk ignored
    ident = b"\x01\x02"
    data = b"payload"

    def zz(n):
        out = b""
        v = (n << 1) ^ (n >> 63)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b | 0x80])
            else:
                out += bytes([b])
                return out

    buf = zz(len(ident)) + ident + zz(len(data)) + data + b"EXTRA"
    got_i, got_d = S.split_graveler_value(buf)
    assert got_i == ident and got_d == data


# -- 3. migration into a Repository ------------------------------------------


def _stage_fixture_repo(tmp_path):
    ranges_dir = tmp_path / "lakefs-ranges"
    os.makedirs(ranges_dir, exist_ok=True)
    (desc,) = S.read_metarange_sstable(_load("metarange.sst"))
    shutil.copy(
        os.path.join(DATA, "range.sst"), str(ranges_dir / desc["range_id"])
    )
    return str(ranges_dir), desc


def test_sst_entries_df_distributed_parse(spark, tmp_path):
    df = S.sst_entries_df(
        spark,
        [os.path.join(DATA, "range.sst"), os.path.join(DATA, "ok1.sst")],
    )
    from lakefs_spark.schema import ENTRY_SCHEMA

    assert df.schema == ENTRY_SCHEMA
    rows = {r["key"]: r for r in df.collect()}
    assert len(rows) == 107
    assert rows["a/b/c/no"]["identity"].startswith("56fef3921aa6e7fd")
    assert rows["a/b/c/no"]["last_modified"] is not None
    assert rows["xyzzy"]["size"] is not None


def test_migrate_from_lakefs_commit(spark, tmp_path):
    from lakefs_spark.storage.repo import Repository

    ranges_dir, desc = _stage_fixture_repo(tmp_path)
    repo = Repository.create(spark, str(tmp_path / "repo"))
    commit, n_ranges, n_entries = S.migrate_from_lakefs(
        repo,
        os.path.join(DATA, "metarange.sst"),
        ranges_dir,
        message="import from lakeFS",
    )
    assert (n_ranges, n_entries) == (1, 2)
    listed = {r["key"]: r for r in repo.snapshot(commit.commit_id).collect()}
    assert set(listed) == {"a/b/c/no", "a/b/c/yes"}
    # identities/addresses imported VERBATIM — diff/merge against other
    # imports of the same lakeFS repo keeps working
    assert listed["a/b/c/no"]["identity"] == (
        "56fef3921aa6e7fd62bbe23b2f69db3f9049a54b6f2c7bd886b7eb1a6ca3ab3e"
    )
    assert listed["a/b/c/no"]["address"] == "b0c968736d8f42a2b1c6284835f08226"
    assert listed["a/b/c/yes"]["size"] == 4

    # the imported snapshot is a first-class commit: a follow-up change
    # diffs range-granularly like any native one
    repo.set_entry(
        "main", {"key": "a/b/c/maybe", "identity": "i9", "size": 9, "etag": "e9"}
    )
    c2 = repo.commit("main", "native follow-up")
    d = {r["key"]: r["diff_type"] for r in repo.diff(commit.commit_id, c2.commit_id).collect()}
    assert d == {"a/b/c/maybe": "added"}


def test_migrate_missing_range_fails_loudly(spark, tmp_path):
    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "repo"))
    with pytest.raises(FileNotFoundError, match="a/b/c/no"):
        S.migrate_from_lakefs(
            repo, os.path.join(DATA, "metarange.sst"), str(tmp_path / "empty")
        )


# -- 4. the writer: export AS lakeFS SSTables ---------------------------------


def test_value_codec_reencode_is_byte_identical():
    """decode→encode round-trips every raw value in the golden range
    tables byte-exactly — our proto/value encoders produce the same
    canonical form Go's marshaler wrote."""
    for fixture in ["range.sst", "ok1.sst"]:
        buf = _load(fixture)
        n = 0
        for _key, raw in S.iter_raw_entries(buf):
            ident, data = S.split_graveler_value(raw)
            e = S.decode_entry_proto(data)
            again = S.build_graveler_value(
                ident,
                S.encode_entry_proto(
                    {**e, "last_modified_s": e["last_modified_s"]}
                ),
            )
            assert again == raw, (fixture, _key)
            n += 1
        assert n > 0


def test_range_id_derivation_matches_reference():
    """derive_table_id over range.sst's records reproduces EXACTLY the
    range id metarange.sst references — our writer's content addresses
    follow the lakeFS ident protocol byte-for-byte."""
    buf = _load("range.sst")
    records = list(S.iter_raw_entries(buf))
    rid = S.derive_table_id(records, {b"type": b"ranges"})
    (desc,) = S.read_metarange_sstable(_load("metarange.sst"))
    assert rid == desc["range_id"]


def test_writer_reproduces_golden_range_id_from_decoded_entries():
    """Full writer fidelity: DECODE range.sst to plain entry dicts,
    re-encode through write_range_sstable, and the resulting table has
    the same records, same lakeFS content address, and reads back
    identically."""
    entries = S.read_range_sstable(_load("range.sst"))
    buf, rid, rd = S.write_range_sstable(entries)
    (desc,) = S.read_metarange_sstable(_load("metarange.sst"))
    assert rid == desc["range_id"]
    assert rd["count"] == 2 and rd["min_key"] == "a/b/c/no"
    assert S.read_range_sstable(buf) == entries
    props = S.read_properties(buf)
    assert props[b"type"] == b"ranges" and props[b"count"] == b"2"


def test_writer_multiblock_roundtrip():
    """10k entries span many 4KB blocks with real prefix compression;
    read-back must be exact and key-ordered."""
    entries = [
        {
            "key": f"corpus/shard={i % 7:02d}/doc-{i:06d}.txt",
            "identity": f"{i:064x}",
            "address": f"data/{i:08x}",
            "address_type": "RELATIVE",
            "size": i % 1000 + 1,
            "etag": f"{i*31 % 2**32:08x}",
            "last_modified_s": 1700000000 + i,
            "metadata": {"lang": "en"} if i % 5 == 0 else None,
            "content_type": "text/plain" if i % 3 == 0 else "",
        }
        for i in range(10_000)
    ]
    entries.sort(key=lambda e: e["key"])
    buf, rid, rd = S.write_range_sstable(entries)
    assert rd["count"] == 10_000
    back = S.read_range_sstable(buf)
    assert len(back) == 10_000
    for want, got in zip(entries, back):
        assert got["key"] == want["key"]
        assert got["identity"] == want["identity"]
        assert got["size"] == want["size"]
        assert got["metadata"] == want["metadata"]
        assert got["content_type"] == (want["content_type"] or None)
    # the file is a valid table end-to-end (props, index, crc)
    props = S.read_properties(buf)
    assert int(props[b"count"]) == 10_000


def test_export_import_full_circle(spark, tmp_path):
    """repo A → export_to_lakefs (real .sst files, lakeFS content
    addresses) → migrate_from_lakefs into repo B → identical
    snapshots. The bidirectional migration story in one test."""
    from lakefs_spark.storage.repo import Repository

    repo_a = Repository.create(spark, str(tmp_path / "a"))
    rows = [
        {
            "key": f"t/{i:05d}",
            "identity": f"{i:064x}",
            "size": i + 1,
            "etag": f"e{i}",
            "address": f"s3://bucket/obj/{i}",
            "address_type": "FULL",
        }
        for i in range(500)
    ]
    for r in rows:
        repo_a.set_entry("main", r)
    c_a = repo_a.commit("main", "source commit")

    out = str(tmp_path / "lakefs-export")
    mid, n_ranges, n_entries = S.export_to_lakefs(
        repo_a, c_a.commit_id, out, raggedness=40
    )
    assert n_entries == 500 and n_ranges >= 4
    # every exported file's NAME is its lakeFS-protocol content address
    for fname in os.listdir(out):
        buf = S.read_file(os.path.join(out, fname))
        records = list(S.iter_raw_entries(buf))
        kind = S.read_properties(buf)[b"type"]
        assert S.derive_table_id(records, {b"type": kind}) == fname

    repo_b = Repository.create(spark, str(tmp_path / "b"))
    commit_b, nr, ne = S.migrate_from_lakefs(
        repo_b, os.path.join(out, mid), out
    )
    assert (nr, ne) == (n_ranges, 500)
    a = sorted(
        (r["key"], r["identity"], r["size"], r["etag"], r["address"])
        for r in repo_a.snapshot(c_a.commit_id).collect()
    )
    b = sorted(
        (r["key"], r["identity"], r["size"], r["etag"], r["address"])
        for r in repo_b.snapshot(commit_b.commit_id).collect()
    )
    assert a == b


def test_epoch_zero_timestamp_is_present_not_null():
    """Presence semantics: Timestamp{0,0} is a PRESENT epoch-0 mtime —
    encoded as the empty nested message (Go's canonical form) and
    decoded back as 0, never conflated with an absent field."""
    e = {"key": "k", "identity": "00" * 32, "address": "a",
         "address_type": "RELATIVE", "size": 1, "etag": "e",
         "last_modified_s": 0, "metadata": None, "content_type": None}
    data = S.encode_entry_proto(e)
    assert b"\x12\x00" in data  # field 2, zero-length Timestamp
    back = S.decode_entry_proto(data)
    assert back["last_modified_s"] == 0
    absent = S.encode_entry_proto({**e, "last_modified_s": None})
    assert b"\x12" not in absent[:1] and S.decode_entry_proto(absent)[
        "last_modified_s"
    ] is None


def test_migrate_history_replays_commits_with_diffs(spark, tmp_path):
    """Commit HISTORY migration: three exported snapshots replay as
    three native commits via diff-based staging (adds, changes AND
    deletes land), and the replayed branch diffs exactly like the
    source history."""
    from lakefs_spark.storage.repo import Repository

    src = Repository.create(spark, str(tmp_path / "src"))

    def _hex(tag):
        import hashlib

        return hashlib.sha256(tag.encode()).hexdigest()

    def _set(key, ver, size=1):
        ident = _hex(f"{key}@{ver}")
        src.set_entry("main", {"key": key, "identity": ident,
                               "size": size, "etag": f"e-{ver}",
                               "address": f"s3://b/{key}",
                               "address_type": "FULL"})

    _set("a/1", "v1"); _set("a/2", "v1"); _set("b/1", "v1")
    c1 = src.commit("main", "c1")
    _set("a/1", "v2"); _set("c/1", "v1")           # change + add
    c2 = src.commit("main", "c2")
    src.stage_deletes("main", ["a/2"])             # delete
    _set("c/2", "v1")
    c3 = src.commit("main", "c3")

    out = str(tmp_path / "export")
    metaranges = []
    for c, msg in [(c1, "c1"), (c2, "c2"), (c3, "c3")]:
        mid, _nr, _ne = S.export_to_lakefs(src, c.commit_id, out,
                                           raggedness=2)
        metaranges.append((os.path.join(out, mid), msg))

    dst = Repository.create(spark, str(tmp_path / "dst"))
    commits = S.migrate_history(dst, metaranges, out)
    assert len(commits) == 3

    # final snapshots identical
    want = sorted((r["key"], r["identity"])
                  for r in src.snapshot(c3.commit_id).collect())
    got = sorted((r["key"], r["identity"])
                 for r in dst.snapshot(commits[-1].commit_id).collect())
    assert got == want

    # intermediate diffs replay exactly: c1→c2 and c2→c3 in the
    # DESTINATION match the source history's deltas
    d12 = sorted((r["key"], r["diff_type"]) for r in
                 dst.diff(commits[0].commit_id, commits[1].commit_id).collect())
    assert d12 == [("a/1", "changed"), ("c/1", "added")]
    d23 = sorted((r["key"], r["diff_type"]) for r in
                 dst.diff(commits[1].commit_id, commits[2].commit_id).collect())
    assert d23 == [("a/2", "removed"), ("c/2", "added")]
    # the replayed branch has a real 3-commit log
    assert len(list(dst.log("main"))) == 3


def test_migrate_history_payload_only_update_and_empty_commit(spark, tmp_path):
    """Review-hardened cases: (a) a commit changing only an entry's
    PAYLOAD (same identity, new size/etag) must replay — identity-only
    deltas would drop it; (b) an allow-empty source commit replays as
    an allow-empty commit instead of aborting the whole history."""
    from lakefs_spark.storage.repo import Repository

    src = Repository.create(spark, str(tmp_path / "src"))
    ident = "ab" * 32
    src.set_entry("main", {"key": "p/1", "identity": ident, "size": 1,
                           "etag": "e1", "address": "s3://b/p1",
                           "address_type": "FULL"})
    c1 = src.commit("main", "c1")
    # payload-only change: identity constant, size/etag move
    src.set_entry("main", {"key": "p/1", "identity": ident, "size": 99,
                           "etag": "e2", "address": "s3://b/p1",
                           "address_type": "FULL"})
    c2 = src.commit("main", "payload only")
    c3 = src.commit("main", "deliberately empty", allow_empty=True)

    out = str(tmp_path / "export")
    metaranges = []
    for c, msg in [(c1, "c1"), (c2, "payload only"), (c3, "empty")]:
        mid, _, _ = S.export_to_lakefs(src, c.commit_id, out, raggedness=3)
        metaranges.append((os.path.join(out, mid), msg))

    dst = Repository.create(spark, str(tmp_path / "dst"))
    commits = S.migrate_history(dst, metaranges, out)
    assert len(commits) == 3
    rows = {r["key"]: r for r in dst.snapshot(commits[1].commit_id).collect()}
    assert rows["p/1"]["size"] == 99 and rows["p/1"]["etag"] == "e2"
    # the empty step produced a commit whose snapshot equals its parent
    s2 = sorted(map(tuple, dst.snapshot(commits[1].commit_id).collect()))
    s3 = sorted(map(tuple, dst.snapshot(commits[2].commit_id).collect()))
    assert s2 == s3


# ---------------------------------------------------------------------------
# round 9: content-defined chunking, range-pruned replay, export_history,
# store-backed RangeFS
# ---------------------------------------------------------------------------


def _mk_entry(repo, key, ver, size=1):
    _stage_rows(repo, [(key, ver, size)])


def _stage_rows(repo, rows):
    """Batch-stage (key, ver, size) rows in ONE staging write — per-key
    set_entry is a Spark job each, far too slow for 1000-key fixtures."""
    import hashlib

    from lakefs_spark.schema import ENTRY_SCHEMA

    data = [
        {
            "key": k,
            "identity": hashlib.sha256(f"{k}@{v}".encode()).hexdigest(),
            "address": f"s3://b/{k}",
            "address_type": "FULL",
            "size": size,
            "etag": f"e-{v}",
            "last_modified": None,
            "metadata": None,
            "content_type": None,
        }
        for k, v, size in rows
    ]
    repo.stage_entries("main", repo.spark.createDataFrame(data, ENTRY_SCHEMA))


def test_export_structural_sharing_across_commits(spark, tmp_path):
    """Content-defined chunking (the whole point of it): two exports of
    snapshots differing in ~1% of keys share >90% of range IDs — the
    second export's put-if-absent writes skip every unchanged range.
    The fixed-row-count slicing this replaced shared ZERO ranges (one
    inserted key shifted all later boundaries)."""
    from lakefs_spark.storage.repo import Repository

    src = Repository.create(spark, str(tmp_path / "src"))
    _stage_rows(src, [(f"d/{i:06d}", "v1", 1) for i in range(2000)])
    c1 = src.commit("main", "c1")
    # ~1% churn: 10 contiguous payload changes + 10 adds at the tail
    # (a scattered change dirties one ~25-key range EACH — still >85%
    # shared, but the robust >90% bound wants realistic locality)
    _stage_rows(src, [(f"d/{i:06d}", "v2", 2) for i in range(100, 110)]
                + [(f"d/new-{i}", "v1", 1) for i in range(10)])
    c2 = src.commit("main", "c2")

    out = str(tmp_path / "export")
    mid1, n1, _ = S.export_to_lakefs(src, c1.commit_id, out, raggedness=25)
    mid2, n2, _ = S.export_to_lakefs(src, c2.commit_id, out, raggedness=25)
    r1 = {r["range_id"] for r in S.read_metarange_sstable(
        S.read_file(os.path.join(out, mid1)))}
    r2 = {r["range_id"] for r in S.read_metarange_sstable(
        S.read_file(os.path.join(out, mid2)))}
    assert n1 >= 40  # raggedness=25 over 2000 keys: ~80 ranges
    shared = len(r1 & r2) / len(r2)
    assert shared > 0.9, f"only {shared:.0%} of ranges shared"


def test_migrate_history_parses_only_changed_ranges(spark, tmp_path):
    """The r8 verdict's finding #1, closed: step N of a history replay
    opens ONLY ranges present in exactly one of the two consecutive
    metaranges (identical range_id ⇒ identical contents — the
    reference's diff fast path, pkg/graveler/committed/diff.go:151).
    Asserted via on_step's parse counts AND by monkeypatch-counting
    the actual resolved ranges; results stay identical to a full
    replay."""
    from lakefs_spark.storage.repo import Repository

    src = Repository.create(spark, str(tmp_path / "src"))
    _stage_rows(src, [(f"d/{i:06d}", "v1", 1) for i in range(1000)])
    c1 = src.commit("main", "c1")
    # 1 payload change + 1 add at the tail, one staging write
    _stage_rows(src, [("d/000500", "v2", 7), ("d/zzz-new", "v1", 1)])
    c2 = src.commit("main", "c2")
    src.stage_deletes("main", ["d/000100"])    # 1 delete
    c3 = src.commit("main", "c3")

    out = str(tmp_path / "export")
    metaranges = []
    for c, msg in [(c1, "c1"), (c2, "c2"), (c3, "c3")]:
        mid, _, _ = S.export_to_lakefs(src, c.commit_id, out, raggedness=25)
        metaranges.append((os.path.join(out, mid), msg))

    resolved_per_call = []
    orig = S._resolve_names

    def _spy(ranges, fs):
        out_names = orig(ranges, fs)
        resolved_per_call.append(len(out_names))
        return out_names

    steps = []
    dst = Repository.create(spark, str(tmp_path / "dst"))
    try:
        S._resolve_names = _spy
        commits = S.migrate_history(dst, metaranges, out,
                                    on_step=steps.append)
    finally:
        S._resolve_names = orig

    assert len(commits) == 3
    # step 1 parses the whole snapshot; steps 2-3 each changed ONE key
    # region, so they parse a handful of ranges, not ~40 per side
    assert steps[0]["ranges_parsed"] == steps[0]["ranges_total"]
    for st in steps[1:]:
        assert st["ranges_parsed"] <= 6, st
        assert st["ranges_parsed"] < st["ranges_total"] / 4, st
    # the spy saw the same counts (full + per-step prev/cur slices)
    assert sum(resolved_per_call) == steps[0]["ranges_parsed"] + sum(
        st["ranges_parsed"] for st in steps[1:]
    )
    # and the replay is still exact
    want = sorted((r["key"], r["identity"], r["size"])
                  for r in src.snapshot(c3.commit_id).collect())
    got = sorted((r["key"], r["identity"], r["size"])
                 for r in dst.snapshot(commits[-1].commit_id).collect())
    assert got == want
    d23 = sorted((r["key"], r["diff_type"]) for r in
                 dst.diff(commits[1].commit_id, commits[2].commit_id).collect())
    assert d23 == [("d/000100", "removed")]


def test_export_history_incremental_equals_full(spark, tmp_path):
    """export_history is O(changes) per commit AND canonical: the
    incremental metarange of every commit is byte-identical (same id)
    to a from-scratch full export — chunk boundaries are a pure
    function of the keys, so there is exactly one chunking per
    snapshot. Also pins the rebuild counts (only dirty regions) and
    the full round-trip: native history → lakeFS chain →
    migrate_history reproduces commit-for-commit listings."""
    from lakefs_spark.storage.repo import Repository

    src = Repository.create(spark, str(tmp_path / "src"))
    # fine-grained NATIVE ranges: incremental export granularity is the
    # native range span (its content-addressed descriptor diff drives
    # dirtiness), and 1000 keys under the 50k default would be ONE span
    src.raggedness = 25
    _stage_rows(src, [(f"d/{i:06d}", "v1", 1) for i in range(1000)])
    c1 = src.commit("main", "c1")
    _mk_entry(src, "d/000250", "v2", size=9)
    c2 = src.commit("main", "c2")
    src.stage_deletes("main", ["d/000700"])
    _mk_entry(src, "d/000700x", "v1")
    c3 = src.commit("main", "c3")
    # PAYLOAD-ONLY change: same identity, new etag/size — invisible to
    # the identity-based repo.diff but a real manifest change; the
    # native-range descriptor diff must catch it (the r9 dirty rule)
    from lakefs_spark.schema import ENTRY_SCHEMA
    import hashlib as _hl
    src.stage_entries("main", spark.createDataFrame(
        [{"key": "d/000400",
          "identity": _hl.sha256(b"d/000400@v1").hexdigest(),
          "address": "s3://b/d/000400", "address_type": "FULL",
          "size": 777, "etag": "e-payload-only", "last_modified": None,
          "metadata": None, "content_type": None}], ENTRY_SCHEMA))
    c4 = src.commit("main", "c4 payload only")
    commits_src = [c1, c2, c3, c4]

    out = str(tmp_path / "inc")
    steps = []
    chain = S.export_history(
        src, [c.commit_id for c in commits_src], out,
        raggedness=25, on_step=steps.append,
    )
    assert [cid for cid, _ in chain] == [c.commit_id for c in commits_src]
    # incremental steps rebuilt only the dirty neighborhoods
    assert steps[0]["ranges_rebuilt"] == steps[0]["ranges_total"]
    for st in steps[1:]:
        # a one-key edit dirties its chunk ± rows-cap-slice neighbors;
        # bound is layout-dependent (8 under the fnv64a export rule)
        assert st["ranges_rebuilt"] <= 8, st
        assert st["ranges_reused"] > st["ranges_total"] * 0.8, st

    # canonical-chunking pin: full export of each commit → same mid
    full = str(tmp_path / "full")
    for c, (_, mid_inc) in zip(commits_src, chain):
        mid_full, _, _ = S.export_to_lakefs(src, c.commit_id, full,
                                            raggedness=25)
        assert mid_full == mid_inc, c.message

    # round trip: replay the incremental chain, listings match per commit
    dst = Repository.create(spark, str(tmp_path / "dst"))
    replayed = S.migrate_history(
        dst, [(os.path.join(out, mid), f"replay {i}")
              for i, (_, mid) in enumerate(chain)], out)
    for c_src, c_dst in zip(commits_src, replayed):
        want = sorted((r["key"], r["identity"], r["size"], r["etag"])
                      for r in src.snapshot(c_src.commit_id).collect())
        got = sorted((r["key"], r["identity"], r["size"], r["etag"])
                     for r in dst.snapshot(c_dst.commit_id).collect())
        assert got == want, c_src.message


def test_export_history_removed_boundary_key_merges_chunks(spark, tmp_path):
    """Adversarial dirty-rule case: deleting a key that IS a chunk
    boundary merges its chunk into the next one — the incremental
    export must dirty BOTH (the merged region re-chunks as one span)
    and still match the full export's metarange id."""
    from lakefs_spark.storage.repo import Repository
    from pyspark.sql import functions as F

    src = Repository.create(spark, str(tmp_path / "src"))
    src.raggedness = 20  # fine-grained native ranges (see test above)
    _stage_rows(src, [(f"d/{i:06d}", "v1", 1) for i in range(600)])
    c1 = src.commit("main", "c1")

    # find an actual boundary key of this snapshot at raggedness=20
    from lakefs_spark.plans.chunker import boundary_keys
    bounds = boundary_keys(
        src.snapshot(c1.commit_id), "key", 20, S.EXPORT_BOUNDARY_ALGO
    )
    assert bounds, "need at least one boundary for this test"
    victim = bounds[len(bounds) // 2]
    src.stage_deletes("main", [victim])
    c2 = src.commit("main", "drop a boundary key")

    out = str(tmp_path / "inc")
    chain = S.export_history(src, [c1.commit_id, c2.commit_id], out,
                             raggedness=20)
    full = str(tmp_path / "full")
    mid_full, _, _ = S.export_to_lakefs(src, c2.commit_id, full,
                                        raggedness=20)
    assert chain[1][1] == mid_full


def test_store_backed_rangefs_roundtrip(spark, tmp_path):
    """Cluster-safe storage (r8 finding #3 closed): export and import
    run with ranges stored through a Store DRIVER — executors publish
    via put-if-absent publish_blob and fetch via read_blob; no bare
    open() on driver-held paths anywhere in the task path."""
    from lakefs_spark.storage.repo import Repository
    from lakefs_spark.storage.store import LocalStore

    src = Repository.create(spark, str(tmp_path / "src"))
    _stage_rows(src, [(f"d/{i:06d}", "v1", 1) for i in range(300)])
    c1 = src.commit("main", "c1")

    store = LocalStore(str(tmp_path / "blobstore"))
    fs = S.StoreRangeFS(store, prefix="sstables")
    mid, n_ranges, n_entries = S.export_to_lakefs(
        src, c1.commit_id, fs, raggedness=30)
    assert n_entries == 300
    assert store.blob_exists(f"sstables/{mid}")

    dst = Repository.create(spark, str(tmp_path / "dst"))
    commit_b, nr, ne = S.migrate_from_lakefs(dst, mid, fs)
    assert (nr, ne) == (n_ranges, 300)
    want = sorted((r["key"], r["identity"])
                  for r in src.snapshot(c1.commit_id).collect())
    got = sorted((r["key"], r["identity"])
                 for r in dst.snapshot(commit_b.commit_id).collect())
    assert got == want


# ---------------------------------------------------------------------------
# round 9: Pebble-format robustness corpus — the reader's failure envelope.
# Contract: a damaged or foreign table raises BadSSTable (clean, typed),
# or — ONLY where the damage sits in bytes the format deliberately does
# not checksum (footer padding/version) — decodes EXACTLY the golden
# content. Never a wrong decode, never a non-BadSSTable crash.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _golden_range_records():
    return list(S.iter_raw_entries(_load("range.sst")))


def _decode_or_bad(buf):
    """Returns ('ok', records) or ('bad', msg); anything else is a
    contract violation the test will surface as the raw exception."""
    try:
        return ("ok", list(S.iter_raw_entries(buf)))
    except S.BadSSTable as e:
        return ("bad", str(e))


def test_truncation_sweep_always_bad():
    """Every strict prefix fails typed: the magic lives in the last 8
    bytes, so no truncation can masquerade as a table."""
    buf = _load("range.sst")
    for n in range(0, len(buf), 7):
        kind, _ = _decode_or_bad(buf[:n])
        assert kind == "bad", f"prefix of {n} bytes decoded"


def test_bitflip_sweep_never_wrong():
    """Flip one bit in EVERY byte of the fixture: each flipped table
    either raises BadSSTable or decodes byte-identical to the golden
    records (footer padding/version bytes are outside any checksum —
    the format ignores them, and so honestly does the reader)."""
    buf = bytearray(_load("range.sst"))
    golden = _golden_range_records()
    decoded_fine = 0
    for i in range(len(buf)):
        buf[i] ^= 0x40
        kind, got = _decode_or_bad(bytes(buf))
        if kind == "ok":
            assert got == golden, f"flip at {i} changed the decode"
            decoded_fine += 1
        buf[i] ^= 0x40
    # only the unchecksummed footer slack can survive a flip — a 2.2 KiB
    # table must reject the overwhelming majority of single flips
    assert decoded_fine < 60, decoded_fine


def test_foreign_zstd_compression_rejected():
    """A table whose data block claims zstd (compression type 4 — what
    a non-lakeFS RocksDB writer might emit) fails typed even with a
    VALID crc over the retyped block."""
    buf = bytearray(_load("h.sst"))
    # first data block starts at offset 0; find its trailer via the
    # index: cheaper — rewrite byte [size] after re-deriving the first
    # handle through the public reader internals
    footer = S._read_footer(bytes(buf))
    index = S._read_block(bytes(buf), *footer.index)
    first = next(iter(S._iter_block_entries(index)))
    off, pos = S.read_uvarint(first[1], 0)
    size, _ = S.read_uvarint(first[1], pos)
    buf[off + size] = 4  # kZSTD
    crc = S._mask_crc(S.crc32c(bytes(buf[off : off + size + 1])))
    import struct as _struct

    buf[off + size + 1 : off + size + 5] = _struct.pack("<I", crc)
    with pytest.raises(S.BadSSTable, match="compression type 4"):
        list(S.iter_raw_entries(bytes(buf)))


def test_foreign_checksum_type_rejected():
    """A table footer claiming xxhash64 (checksum type 4, kXXH3 family)
    fails typed before any block is trusted."""
    buf = bytearray(_load("h.sst"))
    buf[-S.FOOTER_LEN] = 4
    with pytest.raises(S.BadSSTable, match="checksum type 4"):
        list(S.iter_raw_entries(bytes(buf)))


@settings(max_examples=300, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_garbage_bytes_fail_typed(data):
    """Arbitrary bytes — with or without a grafted-on valid magic —
    raise BadSSTable, never IndexError/struct.error/KeyError."""
    kind, _ = _decode_or_bad(data)
    assert kind == "bad"
    kind, _ = _decode_or_bad(data + S.MAGIC)
    assert kind == "bad"


@settings(max_examples=200, deadline=None)
@given(
    pos=st.integers(min_value=0, max_value=2200),
    xor=st.integers(min_value=1, max_value=255),
)
def test_random_byte_corruption_never_wrong(pos, xor):
    """hypothesis-driven generalization of the bit-flip sweep: any
    single-byte XOR anywhere in the fixture either fails typed or
    decodes exactly the golden records."""
    buf = bytearray(_load("range.sst"))
    pos %= len(buf)
    buf[pos] ^= xor
    kind, got = _decode_or_bad(bytes(buf))
    if kind == "ok":
        assert got == _golden_range_records()


@settings(max_examples=200, deadline=None)
@given(value=st.binary(min_size=0, max_size=64))
def test_graveler_value_split_fails_typed(value):
    """The value codec's envelope: arbitrary value bytes either split
    or raise BadSSTable (negative/oversized zigzag lengths included)."""
    try:
        ident, data = S.split_graveler_value(value)
        assert len(ident) + len(data) <= len(value)
    except S.BadSSTable:
        pass


@settings(max_examples=200, deadline=None)
@given(data=st.binary(min_size=0, max_size=96))
def test_entry_proto_decode_fails_typed(data):
    """decode_entry_proto on arbitrary bytes: a dict or BadSSTable,
    never an uncontrolled exception."""
    try:
        out = S.decode_entry_proto(data)
        assert isinstance(out, dict)
    except S.BadSSTable:
        pass


def test_export_bounded_range_size_and_still_canonical(spark, tmp_path):
    """Hash-rule chunk sizes are geometric (max ~ mean*ln(n)); one
    oversized .sst would serialize a whole task on build AND re-import
    parse. Exports cap any range at EXPORT_MAX_ROWS_FACTOR x raggedness
    rows by deterministic equal slicing of the level-1 chunk — and
    export_history stays byte-identical to a full export because dirty
    runs expand to whole level-1 groups."""
    from lakefs_spark.storage.repo import Repository

    src = Repository.create(spark, str(tmp_path / "src"))
    src.raggedness = 40
    # 800 keys, raggedness 400: usually ONE oversized level-1 chunk
    _stage_rows(src, [(f"d/{i:06d}", "v1", 1) for i in range(800)])
    c1 = src.commit("main", "c1")
    _mk_entry(src, "d/000400", "v2", size=5)
    c2 = src.commit("main", "c2")

    out = str(tmp_path / "exp")
    # expected chunk ~100 rows, cap 300: the geometric tail reliably
    # produces at least one chunk the cap has to slice at this scale
    rag = 100
    mid1, n1, total = S.export_to_lakefs(src, c1.commit_id, out,
                                         raggedness=rag)
    assert total == 800
    descs = S.read_metarange_sstable(S.read_file(os.path.join(out, mid1)))
    assert max(d["count"] for d in descs) <= rag * S.EXPORT_MAX_ROWS_FACTOR
    # canonical under the cap: incremental chain == full export per commit
    chain = S.export_history(src, [c1.commit_id, c2.commit_id],
                             str(tmp_path / "inc"), raggedness=rag)
    mid2_full, _, _ = S.export_to_lakefs(src, c2.commit_id, out,
                                         raggedness=rag)
    assert chain[0][1] == mid1
    assert chain[1][1] == mid2_full


# ---------------------------------------------------------------------------
# round 10: byte-budgeted export chunking, snappy compression, empty
# metaranges, two-level index writer, descriptor-count cross-check
# ---------------------------------------------------------------------------


def _fat_rows(n, meta_kb=4):
    """(key, ver, size) rows whose exported records are multi-KB: the
    metadata map carries ~meta_kb KB of INCOMPRESSIBLE hex (real lakeFS
    values can run to ~41 MB — pkg/graveler/committed/value.go:23)."""
    import hashlib

    from lakefs_spark.schema import ENTRY_SCHEMA

    return [
        {
            "key": f"fat/{i:06d}",
            "identity": hashlib.sha256(f"{i}".encode()).hexdigest(),
            "address": f"s3://b/fat/{i:06d}",
            "address_type": "FULL",
            "size": i + 1,
            "etag": f"e-{i}",
            "last_modified": None,
            "metadata": {
                "blob": hashlib.sha256(f"m{i}".encode()).hexdigest()
                * (meta_kb * 16)
            },
            "content_type": None,
        }
        for i in range(n)
    ], ENTRY_SCHEMA


def test_export_byte_budget_caps_sst_size(spark, tmp_path, monkeypatch):
    """The reference breaks a range when the accumulated size crosses
    max_range_size_bytes (20 MiB — defaults.go:97, writer.go:168-183);
    rows-only slicing let a fat-metadata corpus emit one .sst far over
    the cap, serializing a whole task. With the byte budget, every
    exported range's logical size lands within one record of the cap —
    and chunking stays canonical (incremental == full)."""
    from lakefs_spark.storage.repo import Repository

    src = Repository.create(spark, str(tmp_path / "src"))
    rows, schema = _fat_rows(400, meta_kb=4)  # ~1.7 MB of records
    src.stage_entries("main", spark.createDataFrame(rows, schema))
    c1 = src.commit("main", "fat c1")

    cap = 100_000
    monkeypatch.setattr(S, "EXPORT_MAX_RANGE_BYTES", cap)
    out = str(tmp_path / "exp")
    # raggedness >> n keys: ONE level-1 chunk — the byte budget alone
    # must do the splitting
    mid, n_ranges, total = S.export_to_lakefs(src, c1.commit_id, out,
                                              raggedness=10_000)
    assert total == 400 and n_ranges > 10
    descs = S.read_metarange_sstable(S.read_file(os.path.join(out, mid)))
    per_rec = max(d["estimated_size"] // d["count"] for d in descs)
    for d in descs:
        assert d["estimated_size"] <= cap + per_rec, d
    # every .sst parses and the union reproduces the snapshot exactly
    keys = []
    for d in descs:
        keys += [e["key"] for e in S.read_range_sstable(
            S.read_file(os.path.join(out, d["range_id"])))]
    assert keys == sorted(keys) and len(keys) == 400
    # canonical: a payload edit later re-exports incrementally to the
    # SAME metarange a full export produces
    _stage_rows(src, [("fat/000100", "v2", 9)])
    c2 = src.commit("main", "edit")
    chain = S.export_history(src, [c1.commit_id, c2.commit_id],
                             str(tmp_path / "inc"), raggedness=10_000)
    mid2_full, _, _ = S.export_to_lakefs(src, c2.commit_id, out,
                                         raggedness=10_000)
    assert chain[0][1] == mid and chain[1][1] == mid2_full


def test_writer_snappy_default_shrinks_and_roundtrips():
    """The reference writes Snappy blocks (sstable.SnappyCompression,
    writer.go:48-51). Our builder now defaults to snappy with per-block
    fallback-to-raw (Pebble's rule): ids are unchanged (they derive
    from RECORDS, not file bytes), tables round-trip through our
    reader, and compressible payloads shrink >=2x."""
    entries = [
        {
            "key": f"k/{i:06d}",
            "identity": f"{i:064x}",
            "address": f"data/part-{i:06d}",
            "address_type": "RELATIVE",
            "size": i,
            "etag": f"{i:032x}",
            "last_modified_s": 1700000000,
            "metadata": {"lang": "en", "split": "train"},
            "content_type": "text/plain",
        }
        for i in range(4000)
    ]
    buf_snappy, rid_s, rd_s = S.write_range_sstable(entries)
    buf_raw, rid_r, rd_r = S.write_range_sstable(
        entries, compression=S.COMPRESSION_NONE
    )
    assert rid_s == rid_r and rd_s == rd_r
    assert len(buf_raw) >= 2 * len(buf_snappy), (len(buf_raw), len(buf_snappy))
    back = S.read_range_sstable(buf_snappy)
    assert back == S.read_range_sstable(buf_raw)
    assert len(back) == 4000 and back[0]["key"] == "k/000000"
    # incompressible blocks fall back to raw per-block, never grow
    import hashlib as _h

    noise = [
        {**e, "metadata": {"x": _h.sha256(e["key"].encode()).hexdigest() * 8}}
        for e in entries[:500]
    ]
    bn, _, _ = S.write_range_sstable(noise)
    bu, _, _ = S.write_range_sstable(noise, compression=S.COMPRESSION_NONE)
    assert len(bn) <= len(bu) + 64


def test_writer_two_level_index_roundtrip(monkeypatch):
    """Past the index-size threshold the builder writes a PARTITIONED
    (two-level) index — what Pebble itself does for large tables — and
    our reader (which has always handled both, pinned by the h.*
    golden fixtures) round-trips it. A metarange big enough to trip
    the real 4 MiB threshold needs ~100k ranges, so the threshold is
    lowered instead."""
    import struct as _struct

    monkeypatch.setattr(S, "INDEX_TWO_LEVEL_THRESHOLD", 2048)
    entries = [
        {
            "key": f"two/{i:07d}",
            "identity": f"{i:064x}",
            "address": f"a/{i}",
            "address_type": "RELATIVE",
            "size": 1,
            "etag": "e",
            "last_modified_s": None,
            "metadata": None,
            "content_type": None,
        }
        for i in range(20_000)
    ]
    buf, rid, rd = S.write_range_sstable(entries)
    props = S.read_properties(buf)
    itype = _struct.unpack("<I", props[S.INDEX_TYPE_KEY][:4])[0]
    assert itype == S.INDEX_TYPE_TWO_LEVEL
    back = S.read_range_sstable(buf)
    assert [e["key"] for e in back] == [e["key"] for e in entries]
    # under the threshold the index stays single-level
    small, _, _ = S.write_range_sstable(entries[:10])
    sp = S.read_properties(small)
    assert _struct.unpack("<I", sp[S.INDEX_TYPE_KEY][:4])[0] == 0


def test_export_boundaries_match_reference_break_rule(spark, tmp_path):
    """Cross-system range-id parity (round 10): with the default
    min_range_size_bytes=0 (defaults.go:96) the reference breaks a
    range after key k iff the accumulated size crossed 20 MiB or
    ``fnv64a(k) % raggedness == 0`` (ShouldBreakAtKey,
    writer.go:168-183). Simulate that rule driver-side over the
    sorted keyset — asserting no size cap fires on this dataset, so
    the simulation IS the reference's full rule — and require the
    export to produce EXACTLY those (min_key, max_key, count) groups:
    the same record grouping a live lakeFS writer would emit, hence
    (ident protocol being pinned elsewhere) the same range ids."""
    from lakefs_spark.functions.ident import fnv64a
    from lakefs_spark.storage.repo import Repository

    rag = 30  # chosen so the largest hash chunk (62) stays under the
    # rows cap (90) — guarded below, so the pure rule is complete
    src = Repository.create(spark, str(tmp_path / "src"))
    _stage_rows(src, [(f"p/{i:06d}", "v1", 1) for i in range(600)])
    c1 = src.commit("main", "c1")

    keys = [r["key"] for r in src.snapshot(c1.commit_id).select("key").orderBy("key").collect()]
    sim_groups, cur = [], []
    for k in keys:
        cur.append(k)
        if fnv64a(k.encode("utf-8")) % rag == 0:
            sim_groups.append(cur)
            cur = []
    if cur:
        sim_groups.append(cur)
    assert len(sim_groups) > 3, "dataset must produce several hash chunks"
    # guard: neither our rows cap nor any byte cap fires on this data,
    # so the pure hash rule is the complete break rule on BOTH systems
    assert max(len(g) for g in sim_groups) < rag * S.EXPORT_MAX_ROWS_FACTOR

    out = str(tmp_path / "exp")
    mid, n_ranges, total = S.export_to_lakefs(src, c1.commit_id, out, raggedness=rag)
    descs = S.read_metarange_sstable(S.read_file(os.path.join(out, mid)))
    got = [(d["min_key"], d["max_key"], d["count"]) for d in descs]
    exp = [(g[0], g[-1], len(g)) for g in sim_groups]
    assert got == exp


def test_export_empty_snapshot_and_history(spark, tmp_path):
    """A commit whose tree is EMPTY (every key deleted) is real lakeFS
    history and must export: the metarange has zero descriptors, the
    chain stays canonical through it, and migrate_history replays the
    empty step as an empty tree (round-trip both directions)."""
    from lakefs_spark.storage.repo import Repository

    src = Repository.create(spark, str(tmp_path / "src"))
    src.raggedness = 20
    _stage_rows(src, [(f"e/{i:04d}", "v1", 1) for i in range(60)])
    c1 = src.commit("main", "c1")
    src.stage_deletes("main", [f"e/{i:04d}" for i in range(60)])
    c2 = src.commit("main", "wipe")
    _stage_rows(src, [(f"f/{i:04d}", "v1", 1) for i in range(30)])
    c3 = src.commit("main", "regrow")

    out = str(tmp_path / "exp")
    chain = S.export_history(
        src, [c1.commit_id, c2.commit_id, c3.commit_id], out, raggedness=20
    )
    # the empty commit's metarange: zero descriptors, equal to its own
    # full export
    mid2 = chain[1][1]
    assert S.read_metarange_sstable(S.read_file(os.path.join(out, mid2))) == []
    mid2_full, n2, total2 = S.export_to_lakefs(src, c2.commit_id, out,
                                               raggedness=20)
    assert (mid2_full, n2, total2) == (mid2, 0, 0)
    # and c3's full export matches the incremental chain (prev empty →
    # whole-export path)
    mid3_full, _, _ = S.export_to_lakefs(src, c3.commit_id, out,
                                         raggedness=20)
    assert chain[2][1] == mid3_full

    # replay the chain into a fresh repo: snapshots match step-for-step
    dst = Repository.create(spark, str(tmp_path / "dst"))
    commits = S.migrate_history(
        dst, [(os.path.join(out, m), f"step {i}") for i, (_, m) in
              enumerate(chain)], out
    )
    assert dst.snapshot(commits[1].commit_id).count() == 0
    got = sorted(r["key"] for r in
                 dst.snapshot(commits[2].commit_id).select("key").collect())
    assert got == [f"f/{i:04d}" for i in range(30)]


def test_migrate_rejects_descriptor_count_mismatch(spark, tmp_path):
    """entries_imported is the metarange descriptor sum — now VERIFIED:
    a descriptor promising more rows than its range holds fails typed
    (BadSSTable) executor-side instead of silently misreporting
    (round-9 advice)."""
    from lakefs_spark.storage.repo import Repository

    entries = [
        {
            "key": f"m/{i}",
            "identity": f"{i:064x}",
            "address": f"a/{i}",
            "address_type": "RELATIVE",
            "size": 1,
            "etag": "e",
            "last_modified_s": None,
            "metadata": None,
            "content_type": None,
        }
        for i in range(5)
    ]
    buf, rid, rd = S.write_range_sstable(entries)
    lying = {**rd, "count": 7}
    mbuf, mid = S.write_metarange_sstable([lying])
    out = str(tmp_path / "exp")
    os.makedirs(out)
    with open(os.path.join(out, rid), "wb") as f:
        f.write(buf)
    with open(os.path.join(out, mid), "wb") as f:
        f.write(mbuf)
    dst = Repository.create(spark, str(tmp_path / "dst"))
    with pytest.raises(Exception, match="promises 7 entries, table holds 5"):
        S.migrate_from_lakefs(dst, os.path.join(out, mid), out)
