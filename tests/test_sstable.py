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
