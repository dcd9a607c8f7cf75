"""Driver-side small-apply (localapply) bit-parity pins.

The local path claims BYTE-identical manifests (content addresses and
all) to the distributed COW apply; these tests pin that claim on
adversarial fixtures — unicode keys/metadata, JSON-escaping edge
cases, timestamps with trailing-zero microseconds, null payload
fields, tombstones on range max-keys and on boundary-flagged keys —
and pin each parity kernel (xxh64, timestamp cast, canonical metadata
JSON) directly against Spark.
"""

from __future__ import annotations

import datetime as dt
import random
import string

import pytest
from pyspark.sql import functions as F

from lakefs_spark.storage import localapply as LA
from lakefs_spark.storage import ranges as R
from lakefs_spark.storage.commit_apply import apply_changes
from lakefs_spark.storage.store import as_store

RAG = 150

TS_A = dt.datetime(2024, 5, 6, 7, 8, 9, 120000)   # trailing-zero micros
TS_B = dt.datetime(2023, 1, 2, 3, 4, 5)           # no micros
TS_C = dt.datetime(2025, 12, 31, 23, 59, 59, 7)   # tiny micros

META_A = {"b": "2", "a": "1"}
META_B = {"q": 'quo"te', "n": "line\nbreak", "u": "ünïcode🙂", "c": "\x01ctl", "s": "a\\b"}


def _base_rows(n=2400):
    rows = []
    for i in range(n):
        rows.append(
            (
                f"döc/{i:05d}",
                f"id{i}",
                f"s3://b/{i}",
                "RELATIVE",
                (i * 7) % 997 if i % 11 else None,
                f"e{i}",
                [TS_A, TS_B, TS_C, None][i % 4],
                [META_A, META_B, None][i % 3],
                "text/plain" if i % 5 else None,
            )
        )
    return rows


ENTRY_DDL = (
    "key string, identity string, address string, address_type string, "
    "size long, etag string, last_modified timestamp, "
    "metadata map<string,string>, content_type string"
)


def _entries_df(spark, rows):
    return spark.createDataFrame(rows, ENTRY_DDL)


def _changes(flagged, max_keys):
    """(is_tombstone, entry...) tuples exercising every algebra term."""
    sets = [
        ("döc/00010", META_B, TS_C),
        (flagged[0], META_A, None),           # set ON a boundary key
        ("zzz/new-0", None, TS_A),            # past the last range
        ("zzz/nëw-1", META_B, TS_B),
    ]
    dels = ["döc/00020", flagged[1], max_keys[1]]  # incl. a range max_key
    out = [
        (False, k, f"nid-{k}", f"s3://n/{k}", "FULL", 5, "ne", ts, m, "text/x")
        for k, m, ts in sets
    ]
    out += [(True, k, None, None, None, None, None, None, None, None) for k in dels]
    return out


CHANGES_DDL = "is_tombstone boolean, " + ENTRY_DDL


@pytest.fixture(scope="module")
def parity_ctx(spark, tmp_path_factory):
    rows = _base_rows()
    ents = _entries_df(spark, rows)
    root_a = str(tmp_path_factory.mktemp("la_local"))
    root_b = str(tmp_path_factory.mktemp("la_dist"))
    mf_a = R.write_ranges(ents, root_a, raggedness=RAG)
    mf_b = R.write_ranges(ents, root_b, raggedness=RAG)
    assert mf_a.equals(mf_b) and len(mf_a) > 6
    keys = [r[0] for r in rows]
    flagged = [
        r[0]
        for r in spark.createDataFrame([(k,) for k in keys], "key string")
        .where(F.pmod(F.xxhash64("key"), F.lit(RAG)) == 0)
        .orderBy("key")
        .collect()
    ]
    assert len(flagged) >= 2
    return rows, mf_a, root_a, root_b, flagged


def test_xxh64_matches_spark(spark):
    rng = random.Random(11)
    keys = ["", "a", "k" * 31, "k" * 32, "k" * 33, "k" * 64, "döc/🙂/путь", "a\x00b"]
    keys += [
        "".join(rng.choices(string.printable + "éü🙂", k=rng.randint(0, 90)))
        for _ in range(300)
    ]
    got = spark.createDataFrame([(k,) for k in keys], "key string").select(
        "key", F.xxhash64("key").alias("h")
    ).collect()
    for r in got:
        mine = LA.xxh64(r["key"].encode("utf-8"))
        if mine >= 1 << 63:
            mine -= 1 << 64
        assert mine == r["h"], repr(r["key"])


def test_ts_and_json_kernels_match_spark(spark):
    tss = [TS_A, TS_B, TS_C, dt.datetime(1969, 12, 31, 23, 59, 59, 999999),
           dt.datetime(2024, 2, 29, 0, 0, 0, 100)]
    got = spark.createDataFrame([(t,) for t in tss], "ts timestamp").select(
        F.col("ts").cast("string").alias("s")
    ).collect()
    for t, r in zip(tss, got):
        assert LA.ts_to_str(t) == r["s"], t
    maps = [META_A, META_B, {"": "e", "k": ""}, {"sl": "a/b", "bs": "x\\y"}]
    got = spark.createDataFrame([(m,) for m in maps], "m map<string,string>").select(
        F.to_json(F.map_from_entries(F.array_sort(F.map_entries(F.col("m"))))).alias("j")
    ).collect()
    for m, r in zip(maps, got):
        assert LA.meta_json(m) == r["j"], m


def test_local_apply_matches_distributed_apply(spark, parity_ctx):
    rows, base_mf, root_a, root_b, flagged = parity_ctx
    max_keys = base_mf.sort_values("min_key")["max_key"].tolist()
    ch = _changes(flagged, max_keys)

    # distributed
    mf_dist = apply_changes(
        spark, root_b, base_mf, spark.createDataFrame(ch, CHANGES_DDL), RAG
    )
    # local (same change rows through the collected-Row normalizer)
    ch_local = LA.rows_to_changes(spark.createDataFrame(ch, CHANGES_DDL).collect())
    mf_local = LA.apply_changes_local(as_store(root_a), base_mf, ch_local, RAG)

    assert mf_local.reset_index(drop=True).equals(mf_dist.reset_index(drop=True))

    # rebuilt (non-shared) ranges must be readable by the Spark reader
    # with identical rows — pins the pyarrow-written file's schema
    # (timestamp micros/UTC, metadata_json decode) against Spark's
    new_ids = sorted(set(mf_local["range_id"]) - set(base_mf["range_id"]))
    assert new_ids
    rows_a = R.read_ranges(spark, root_a, new_ids).orderBy("key").collect()
    rows_b = R.read_ranges(spark, root_b, new_ids).orderBy("key").collect()
    assert rows_a == rows_b and len(rows_a) > 0


def test_local_apply_empty_base_matches_write_ranges(spark, parity_ctx, tmp_path):
    rows, *_ = parity_ctx
    sub = rows[:700]
    mf_dist = R.write_ranges(_entries_df(spark, sub), str(tmp_path / "d"), raggedness=RAG)
    ch = [(False, *r) for r in sub]
    ch_local = LA.rows_to_changes(spark.createDataFrame(ch, CHANGES_DDL).collect())
    mf_local = LA.apply_changes_local(as_store(str(tmp_path / "l")), None, ch_local, RAG)
    assert mf_local.reset_index(drop=True).equals(mf_dist.reset_index(drop=True))


def test_repo_commit_and_merge_parity_local_vs_distributed(spark, tmp_path, monkeypatch):
    """End to end: the same lifecycle (stage/commit incl. multi-seq
    overwrite + tombstones, then a conflicting merge resolved src) on
    two repos, local path ON vs forced OFF — identical metarange ids at
    every step (content addresses all the way down)."""
    from lakefs_spark.storage.repo import ConflictError, Repository

    rows = _base_rows(900)

    def drive(root, local_on):
        monkeypatch.setattr(LA, "LOCAL_APPLY_ROWS", 100000 if local_on else 0)
        repo = Repository.create(spark, root)
        repo.raggedness = RAG
        repo.import_entries("main", _entries_df(spark, rows), message="base")
        # two staged seqs: overwrite the same key (tiebreak), tombstones
        repo.stage_entries("main", _entries_df(
            spark, [("döc/00005", "idX", "s3://x", "FULL", 1, "ex", TS_A, META_B, "t")]
        ))
        repo.stage_entries("main", _entries_df(
            spark, [("döc/00005", "idY", "s3://y", "FULL", 2, "ey", TS_C, META_A, "t"),
                    ("zzz/n1", "idZ", "s3://z", "FULL", 3, "ez", None, None, None)]
        ))
        repo.stage_deletes("main", spark.createDataFrame(
            [("döc/00007",), ("absent/key",)], "key string"))
        repo.commit("main", "c2")
        # branches with disjoint + conflicting changes
        repo.create_branch("l", "main")
        repo.stage_entries("l", _entries_df(
            spark, [("döc/00100", "L1", "s3://l", "FULL", 9, "el", TS_B, META_A, "t"),
                    ("cnf/k", "LC", "s3://lc", "FULL", 1, "ec", None, None, None)]
        ))
        repo.commit("l", "left")
        repo.create_branch("r", "main")
        repo.stage_entries("r", _entries_df(
            spark, [("döc/00200", "R1", "s3://r", "FULL", 9, "er", TS_C, META_B, "t"),
                    ("cnf/k", "RC", "s3://rc", "FULL", 2, "ec2", None, None, None)]
        ))
        repo.commit("r", "right")
        try:
            repo.merge("l", "r")
            raise AssertionError("expected conflict")
        except ConflictError as e:
            assert e.conflicts.count() == 1
        repo.merge("l", "r", strategy="src")
        repo.revert("r", "r")  # exercises revert through the same apply
        mids = [
            repo._metarange_of(repo.resolve(b).commit_id) for b in ("main", "l", "r")
        ]
        snap = sorted(
            tuple(r) for r in repo.snapshot("r").select("key", "identity").collect()
        )
        return mids, snap

    mids_on, snap_on = drive(str(tmp_path / "on"), True)
    mids_off, snap_off = drive(str(tmp_path / "off"), False)
    assert mids_on == mids_off
    assert snap_on == snap_off


def test_merge_actions_local_matches_distributed_ladder(spark):
    """The driver-side merge ladder == merge_changes_from_sides over the
    same four row sets, for all three strategies, across add / remove /
    change / both-same / both-diff / delete-vs-change / change-vs-delete
    / both-deleted, with payload and metadata riding the source side."""
    from lakefs_spark.operators.merge import merge_changes_from_sides

    def e(k, ident, meta=None, ts=None):
        return {
            "key": k, "identity": ident, "address": f"s3://{k}",
            "address_type": "FULL", "size": 3, "etag": f"e{ident}",
            "last_modified": ts, "metadata_json": LA.meta_json(meta),
            "content_type": "t",
        }

    base = [e("same", "b0"), e("srconly", "b1"), e("destonly", "b2"),
            e("bothsame", "b3"), e("bothdiff", "b4"), e("delvschg", "b5"),
            e("chgvsdel", "b6"), e("bothdel", "b7"), e("srcdel", "b8")]
    src = [e("same", "b0"), e("srconly", "s1", META_B, TS_A), e("destonly", "b2"),
           e("bothsame", "x3"), e("bothdiff", "s4", META_A, TS_C),
           e("chgvsdel", "s6"), e("addboth", "sa"), e("addsrc", "sb")]
    dest = [e("same", "b0"), e("srconly", "b1"), e("destonly", "d2"),
            e("bothsame", "x3"), e("bothdiff", "d4"), e("delvschg", "d5"),
            e("bothdel2", "b9"), e("addboth", "da"), e("adddest", "dc"),
            e("delvschg2", "b5b")]
    base += [e("bothdel2", "b9"), e("delvschg2", "b5b")]
    src += [e("delvschg2", "s5b")]  # dest deleted it, src changed -> conflict

    def df(rows):
        import json as _json
        data = [
            (r["key"], r["identity"], r["address"], r["address_type"], r["size"],
             r["etag"], r["last_modified"],
             None if r["metadata_json"] is None else _json.loads(r["metadata_json"]),
             r["content_type"])
            for r in rows
        ]
        return spark.createDataFrame(data, ENTRY_DDL)

    for strategy in ("none", "src", "dest"):
        local = LA.merge_actions_local(base, src, base, dest, strategy)
        dist = merge_changes_from_sides(
            df(base), df(src), df(base), df(dest), strategy
        ).collect()
        dist_norm = sorted(
            (r["key"], r["action"], r["identity"],
             LA.meta_json(r["metadata"]), r["last_modified"], r["size"])
            for r in dist
        )
        local_norm = sorted(
            (a["key"], a["action"], a["identity"],
             a["metadata_json"], a["last_modified"], a["size"])
            for a in local
        )
        assert local_norm == dist_norm, strategy
