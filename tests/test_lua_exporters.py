"""Stock catalogexport exporter chains running as real ``type: lua``.

Round-7 closed the symlink chain; these tests close the remaining
reference exporters — delta_exporter / glue_exporter / unity_exporter
(pkg/actions/lua/lakefs/catalogexport/*.lua) — plus the host modules
they pull in (crypto/*, time, uuid, encoding/{base64,hex,z85enc},
formats.delta_client, aws.glue_client, databricks.client). The scripts
under test are the reference's own esti/example hook bodies (modulo
the same action-field override lines the esti fixtures themselves
use), so passing here means a lakeFS user's existing exporter hooks
run unmodified.
"""

from __future__ import annotations

import json
import os

import pytest

from lakefs_spark.lua.modules import make_hook_env, run_lua_hook
from lakefs_spark.lua import run_lua
from lakefs_spark.schema import ENTRY_SCHEMA


# ---------------------------------------------------------------------------
# host modules exercised from Lua
# ---------------------------------------------------------------------------


def run(src, **globals_):
    out = []
    g = make_hook_env(output_sink=out.append)
    from lakefs_spark.lua.modules import py_to_lua

    for k, v in globals_.items():
        g.set(k, py_to_lua(v))
    return run_lua(src, g), out


def test_crypto_modules_from_lua():
    ret, _ = run(
        """
        local sha256 = require("crypto/sha256")
        local md5 = require("crypto/md5")
        local hmac = require("crypto/hmac")
        local hex = require("encoding/hex")
        local b64 = require("encoding/base64")
        return hex.encode(sha256.digest("abc")),
               md5.digest("abc"),
               hex.encode(hmac.sign_sha256("msg", "key")),
               b64.encode("foob"),
               b64.decode("Zm9vYg=="),
               b64.url_encode("foob"),
               b64.url_decode("Zm9vYg"),
               hex.decode("4142")
        """
    )
    import hashlib
    import hmac as pyhmac

    assert ret == [
        hashlib.sha256(b"abc").hexdigest(),
        hashlib.md5(b"abc").hexdigest(),
        pyhmac.new(b"key", b"msg", hashlib.sha256).hexdigest(),
        "Zm9vYg==",
        "foob",
        "Zm9vYg",
        "foob",
        "AB",
    ]


def test_aes_cbc_roundtrip_from_lua():
    ret, _ = run(
        """
        local aes = require("crypto/aes")
        local ct = aes.encryptCBC("0123456789abcdef", "attack at dawn")
        return aes.decryptCBC("0123456789abcdef", ct), ct ~= "attack at dawn"
        """
    )
    assert ret == ["attack at dawn", True]


def test_time_module_from_lua():
    ret, _ = run(
        """
        local time = require("time")
        local ns = time.parse_iso("2024-03-05T12:30:45+02:00")
        local iso = time.format_iso(ns, "")
        local day = time.format(ns, "2006-01-02", "UTC")
        local ns2 = time.add(ns, {hour=1, second=15})
        local t0 = time.now()
        time.sleep(1000000) -- 1ms
        local el = time.since(t0)
        return ns, iso, day, ns2 - ns, el > 0, time.parse("2006-01-02", "2021-12-31")
        """
    )
    assert ret[0] == 1709634645e9
    assert ret[1] == "2024-03-05T10:30:45+00:00"
    assert ret[2] == "2024-03-05"
    assert ret[3] == 3615e9
    assert ret[4] is True
    assert ret[5] == 1640908800e9


def test_uuid_and_z85_from_lua():
    ret, _ = run(
        """
        local uuid = require("uuid")
        local z85 = require("encoding/z85enc")
        local u1, u2 = uuid.new(), uuid.new()
        local id, prefix = z85.decode_uuid("ab/cdHelloWorldHelloWorld")
        return u1 ~= u2, #u1, id, prefix
        """
    )
    assert ret[0] is True and ret[1] == 36
    # "HelloWorld" is the Z85 spec test vector (decodes 864FD26FB559F75B)
    assert ret[2] == "864fd26f-b559-f75b-864f-d26fb559f75b"
    assert ret[3] == "ab/cd"


# ---------------------------------------------------------------------------
# repository fixtures for the exporter chains
# ---------------------------------------------------------------------------

# the Delta fixture block (descriptor, log rows, seeding helpers) is
# SHARED with the driver gate q_lua_stock_validators, so it lives in a
# non-test module (round-9 advice: a runtime gate must not import the
# pytest tree)
from lakefs_spark.fixtures import (  # noqa: F401 — re-exported for test use
    DELTA_DESCRIPTOR,
    DELTA_EXPORT_SCRIPT,
    GLUE_EXPORT_SCRIPT,
    HIVE_DESCRIPTOR,
    HOOKS_DATA,
    META_ACTION,
    delta_repo as _delta_repo,
    delta_repo_ns as _delta_repo_ns,
    put_file as _put_file,
    seed_delta_rows as _seed_delta_rows,
)




def test_delta_exporter_stock_chain_dispatched(spark, tmp_path):
    """The esti delta-export action spec dispatched as a REAL
    post-commit ``type: lua`` hook: changed_table_defs filters via
    diff_refs paging, formats.delta_client reads the committed
    _delta_log, physical addresses are rewritten, and the log lands
    via the s3 stand-in under the export namespace."""
    from lakefs_spark.storage.actions import ActionsService

    repo, _base = _delta_repo(spark, tmp_path)
    export_root = str(tmp_path / "exports")
    svc = ActionsService(repo, export_root=export_root)
    svc.add_action(
        {
            "name": "Delta Exporter",
            "on": {"post-commit": {"branches": ["main*"]}},
            "hooks": [
                {
                    "id": "delta_exporter",
                    "type": "lua",
                    "properties": {
                        "script": DELTA_EXPORT_SCRIPT,
                        "args": {
                            "export_namespace": "s3://ext-bucket/ns",
                            "aws": {"access_key_id": "k",
                                    "secret_access_key": "s", "region": "r"},
                            "lakefs": {"access_key_id": "lk",
                                       "secret_access_key": "ls"},
                            "table_names": ["famous"],
                        },
                    },
                }
            ],
        }
    )
    c = repo.commit("main", "land the delta table")

    short = c.commit_id[:6]
    log_dir = os.path.join(
        export_root, "ext-bucket", "ns", "_lakefs", "exported", "main",
        short, "famous", "_delta_log",
    )
    v0 = os.path.join(log_dir, "00000000000000000000.json")
    v1 = os.path.join(log_dir, "00000000000000000001.json")
    assert os.path.exists(v0), v0
    assert os.path.exists(v1), v1
    with open(v0) as f:
        body0 = f.read()
    # physical address rewritten from the repo-relative logical path
    assert '"path": "s3://phys-bucket/data/part-0.parquet"' in body0
    assert "part-0.parquet\"" in body0 and "metaData" in body0
    # the commit file is valid NDJSON — one action per line, exactly
    # what line-based Delta readers require
    lines0 = [ln for ln in body0.splitlines() if ln.strip()]
    assert len(lines0) == 3
    kinds = [next(iter(json.loads(ln))) for ln in lines0]
    assert sorted(kinds) == ["add", "metaData", "protocol"]
    with open(v1) as f:
        body1 = f.read()
    assert len([ln for ln in body1.splitlines() if ln.strip()]) == 2
    assert '"path": "s3://phys-bucket/data/part-1.parquet"' in body1
    # inline deletion vector rides through untouched
    assert '"storageType": "i"' in body1
    # the vacuumed remove target is kept as a remove action (404 skipped)
    assert "part-gone.parquet" in body1


def test_delta_changed_table_defs_filters_unchanged(spark, tmp_path):
    """changed_table_defs only returns tables whose data moved between
    the two refs — an unchanged second table is filtered out."""
    repo, base = _delta_repo(spark, tmp_path)
    c = repo.commit("main", "land")
    out = []
    ret = run_lua_hook(
        """
        local delta = require("lakefs/catalogexport/delta_exporter")
        local changed = delta.changed_table_defs(args.names, "_lakefs_tables",
            action.repository_id, args.base_ref, action.commit_id)
        local out = {}
        for _, n in ipairs(changed) do table.insert(out, n) end
        return out
        """,
        action={"repository_id": repo.name, "commit_id": c.commit_id},
        args={"names": ["famous"], "base_ref": base.commit_id},
        repo=repo,
        output_sink=out.append,
    )
    from lakefs_spark.lua.modules import lua_to_py

    assert lua_to_py(ret[0]) == ["famous"]




def test_glue_exporter_stock_chain(spark, tmp_path):
    """The esti glue_exporter.lua body against a committed hive
    descriptor: database created, table input built from the hive
    schema (integer→int, partitions split out, EXTERNAL_TABLE,
    symlink location under the export prefix)."""
    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "repo"))
    rows = [
        ("_lakefs_tables/animals.yaml", "iy",
         _put_file(repo, "data/animals.yaml", HIVE_DESCRIPTOR),
         "RELATIVE", len(HIVE_DESCRIPTOR), "ey", None, None, "t"),
    ]
    repo.stage_entries("main", spark.createDataFrame(rows, ENTRY_SCHEMA))
    c = repo.commit("main", "descriptor")

    from lakefs_spark.storage.actions import lua_event_record

    record = lua_event_record(
        repo, "post-commit", {"branch": "main", "commit": c, "run_id": "r1"},
        "Glue Exporter", "glue_exporter",
    )
    recorder: list = []
    run_lua_hook(
        GLUE_EXPORT_SCRIPT,
        action=record,
        args={
            "aws": {"aws_access_key_id": "k", "aws_secret_access_key": "s",
                    "aws_region": "r"},
            "table_source": "_lakefs_tables/animals.yaml",
            "export_base_uri": "s3://ext-bucket/ns",
            "catalog": {
                "db_name": "my-db",
                "table_input": {
                    "StorageDescriptor": {
                        "InputFormat": "org.apache.hadoop.hive.ql.io.SymlinkTextInputFormat",
                        "OutputFormat": "org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat",
                        "SerdeInfo": {
                            "SerializationLibrary": "org.apache.hadoop.hive.serde2.OpenCSVSerde",
                            "Parameters": {"separatorChar": ","},
                        },
                    },
                    "Parameters": {"classification": "csv"},
                },
            },
        },
        repo=repo,
        export_root=str(tmp_path / "exports"),
        export_recorder=recorder,
    )
    ops = {r["op"]: r for r in recorder if r.get("service") == "glue"}
    assert "create_database" in ops and ops["create_database"]["database"] == "my-db"
    ti = ops["create_table"]["table_input"]
    short = c.commit_id[:6]
    assert ti["Name"] == f"animals_{repo.name}_main_{short}"
    assert ti["TableType"] == "EXTERNAL_TABLE"
    assert ti["StorageDescriptor"]["Location"].startswith(
        f"s3://ext-bucket/ns/_lakefs/exported/main/{short}/animals"
    )
    # hive integer → glue int; partition column excluded from Columns
    cols = {c_["Name"]: c_["Type"] for c_ in ti["StorageDescriptor"]["Columns"]}
    assert cols == {"weight": "int", "name": "string"}
    parts = [(p["Name"], p["Type"]) for p in ti["PartitionKeys"]]
    assert parts == [("type", "string")]
    # base-input fields survive the deepcopy
    assert (
        ti["StorageDescriptor"]["InputFormat"]
        == "org.apache.hadoop.hive.ql.io.SymlinkTextInputFormat"
    )
    assert ti["Parameters"]["classification"] == "csv"


def test_unity_exporter_stock_chain(spark, tmp_path):
    """unity_exporter.register_tables over delta_exporter's response
    shape: schema created per branch, external table registered with
    the CREATE EXTERNAL TABLE statement client.go would send."""
    repo, _ = _delta_repo(spark, tmp_path)
    c = repo.commit("main", "land")

    recorder: list = []
    ret = run_lua_hook(
        """
        local unity = require("lakefs/catalogexport/unity_exporter")
        local databricks = require("databricks")
        local client = databricks.client(args.host, args.token)
        local resp = unity.register_tables(action, "_lakefs_tables",
            args.details, client, args.warehouse_id)
        return resp["famous"]
        """,
        action={
            "repository_id": repo.name,
            "commit_id": c.commit_id,
            "branch_id": "main",
        },
        args={
            "host": "h", "token": "t", "warehouse_id": "wh-1",
            "details": {
                "famous": {
                    "path": "s3://ext-bucket/ns/_lakefs/exported/main/abc123/famous",
                    "metadata": {"description": "famous animals"},
                }
            },
        },
        repo=repo,
        export_recorder=recorder,
    )
    assert ret == ["SUCCEEDED"]
    ops = {r["op"]: r for r in recorder if r.get("service") == "databricks"}
    assert ops["create_schema"]["catalog"] == "main-cat"
    assert ops["create_schema"]["schema"] == "main"
    reg = ops["register_external_table"]
    assert reg["table"] == "famous"
    assert reg["catalog"] == "main-cat" and reg["schema"] == "main"
    assert reg["statement"] == (
        "CREATE EXTERNAL TABLE famous LOCATION "
        "'s3://ext-bucket/ns/_lakefs/exported/main/abc123/famous'"
        " COMMENT 'famous animals'"
    )


def test_unity_exporter_rejects_non_delta(spark, tmp_path):
    from lakefs_spark.lua import LuaError
    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "repo"))
    repo.stage_entries(
        "main",
        spark.createDataFrame(
            [("_lakefs_tables/animals.yaml", "iy",
              _put_file(repo, "data/animals.yaml", HIVE_DESCRIPTOR),
              "RELATIVE", len(HIVE_DESCRIPTOR), "ey", None, None, "t")],
            ENTRY_SCHEMA,
        ),
    )
    c = repo.commit("main", "hive descriptor")
    with pytest.raises(LuaError, match="only table descriptors of type 'delta'"):
        run_lua_hook(
            """
            local unity = require("lakefs/catalogexport/unity_exporter")
            local databricks = require("databricks")
            return unity.register_tables(action, "_lakefs_tables",
                {animals = {path = "s3://x/y", metadata = {}}},
                databricks.client("h", "t"), "wh")
            """,
            action={"repository_id": repo.name, "commit_id": c.commit_id,
                    "branch_id": "main"},
            repo=repo,
        )


def test_array_marker_marshals_empty_as_list():
    ret, _ = run(
        """
        local json = require("encoding/json")
        return json.marshal({a = array({}), b = {}})
        """
    )
    assert ret == ['{"a": [], "b": {}}']




def _commit_parquet_table(spark, repo, branch, key, columns):
    """Write a real parquet file into the repo's data root and commit
    it at `key` on `branch`."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(pa.table(columns), buf)
    raw = buf.getvalue()
    rel = f"data/pq/{key.replace('/', '_')}"
    p = os.path.join(repo.store.data_root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as f:
        f.write(raw)
    repo.stage_entries(
        branch,
        spark.createDataFrame(
            [(key, f"i-{key}", rel, "RELATIVE", len(raw), "e", None, None,
              "application/parquet")],
            ENTRY_SCHEMA,
        ),
    )


def test_parquet_schema_validator_stock_hook(spark, tmp_path):
    """The reference's examples/hooks/parquet_schema_validator.lua runs
    VERBATIM (vendored fixture) as a pre-merge type:lua hook: a merge
    introducing a parquet file with a block-listed column is vetoed;
    clean columns merge fine. Exercises encoding/parquet.get_schema
    over real parquet bytes (binary-safe object loading), regexp
    pattern matching, and diff_refs paging with a prefix."""
    from lakefs_spark.storage.actions import ActionsService
    from lakefs_spark.storage.repo import HookAbortError, Repository

    with open(os.path.join(HOOKS_DATA, "parquet_schema_validator.lua")) as f:
        stock_script = f.read()

    repo = Repository.create(spark, str(tmp_path / "repo"))
    repo.stage_entries(
        "main",
        spark.createDataFrame(
            [("seed", "i0", _put_file(repo, "data/seed", "s"),
              "RELATIVE", 1, "e0", None, None, "t")],
            ENTRY_SCHEMA,
        ),
    )
    repo.commit("main", "seed")
    svc = ActionsService(repo)
    svc.add_action(
        {
            "name": "pre merge format check on main",
            "on": {"pre-merge": {"branches": ["main"]}},
            "hooks": [
                {
                    "id": "check_formats",
                    "type": "lua",
                    "properties": {
                        "script": stock_script,
                        "args": {
                            "sample": False,
                            "column_block_list": ["user_id", "email", "private_*"],
                            "locations": ["tables/users/", "tables/sales/"],
                        },
                    },
                }
            ],
        }
    )

    # negative: blocked column vetoes the merge
    repo.create_branch("bad", "main")
    _commit_parquet_table(
        spark, repo, "bad", "tables/users/part-0.parquet",
        {"user_id": [1, 2], "name": ["a", "b"]},
    )
    repo.commit("bad", "blocked column lands on a branch")
    import pytest as _pytest

    with _pytest.raises(HookAbortError, match="Column is not allowed: 'user_id'"):
        repo.merge("bad", "main")

    # positive: clean schema merges
    repo.create_branch("good", "main")
    _commit_parquet_table(
        spark, repo, "good", "tables/sales/part-0.parquet",
        {"order_id": [1], "amount": [2.5], "region": ["emea"]},
    )
    repo.commit("good", "clean columns")
    mc = repo.merge("good", "main")
    assert mc.commit_id


def test_parquet_get_schema_from_lua():
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(pa.table({"geoname_id": ["x"], "population": [7]}), buf)
    payload = buf.getvalue().decode("latin-1")
    ret, out = run(
        """
        local parquet = require("encoding/parquet")
        local schema = parquet.get_schema(content)
        local acc = {}
        for _, col in ipairs(schema) do
          table.insert(acc, col.name .. ":" .. col.type)
        end
        return table.concat(acc, ",")
        """,
        content=payload,
    )
    assert ret == ["geoname_id:BYTE_ARRAY,population:INT64"]


def _stock(name):
    with open(os.path.join(HOOKS_DATA, name)) as f:
        return f.read()


def _seeded_repo(spark, tmp_path):
    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "repo"))
    repo.stage_entries(
        "main",
        spark.createDataFrame(
            [("seed", "i0", _put_file(repo, "data/seed", "s"),
              "RELATIVE", 1, "e0", None, None, "t")],
            ENTRY_SCHEMA,
        ),
    )
    repo.commit("main", "seed")
    return repo


def test_format_validator_stock_hook(spark, tmp_path):
    """examples/hooks/format_validator.lua VERBATIM as pre-merge:
    disallowed extensions veto the merge; hidden (_-prefixed) paths are
    exempt; allowed extensions pass."""
    from lakefs_spark.storage.actions import ActionsService
    from lakefs_spark.storage.repo import HookAbortError

    repo = _seeded_repo(spark, tmp_path)
    ActionsService(repo).add_action(
        {
            "name": "pre merge format check on main",
            "on": {"pre-merge": {"branches": ["main"]}},
            "hooks": [{
                "id": "check_formats", "type": "lua",
                "properties": {
                    "script": _stock("format_validator.lua"),
                    "args": {"allow_list": ["parquet", "orc", "log"],
                             "ignore_hidden": True},
                },
            }],
        }
    )
    repo.create_branch("bad", "main")
    repo.stage_entries(
        "bad",
        spark.createDataFrame(
            [("tables/t/part-0.csv", "i1", "x", "RELATIVE", 1, "e", None, None, "t"),
             ("_hidden/scratch.tmp", "i2", "x", "RELATIVE", 1, "e", None, None, "t")],
            ENTRY_SCHEMA,
        ),
    )
    repo.commit("bad", "csv lands on branch")
    with pytest.raises(HookAbortError, match="forbidden paths found"):
        repo.merge("bad", "main")

    repo.create_branch("good", "main")
    repo.stage_entries(
        "good",
        spark.createDataFrame(
            [("tables/t/part-0.parquet", "i3", "x", "RELATIVE", 1, "e", None, None, "t"),
             ("_staging/tmp.whatever", "i4", "x", "RELATIVE", 1, "e", None, None, "t")],
            ENTRY_SCHEMA,
        ),
    )
    repo.commit("good", "parquet + hidden")
    assert repo.merge("good", "main").commit_id


def test_dataset_validator_stock_hook(spark, tmp_path):
    """examples/hooks/dataset_validator.lua VERBATIM as pre-merge:
    nearest dataset_metadata.yaml is fetched and its fields validated
    (required/type/choices/match_pattern via hook.fail); a dataset
    without metadata — or with a bad field — vetoes the merge."""
    from lakefs_spark.storage.actions import ActionsService
    from lakefs_spark.storage.repo import HookAbortError

    repo = _seeded_repo(spark, tmp_path)
    fields = [
        {"name": "contains_pii", "required": True, "type": "boolean"},
        {"name": "approval_link", "required": True, "type": "string",
         "match_pattern": r"https?:\/\/.*"},
        {"name": "rank", "required": True, "type": "number"},
        {"name": "department", "type": "string",
         "choices": ["hr", "it", "other"]},
    ]
    ActionsService(repo).add_action(
        {
            "name": "Validate Dataset Fields",
            "on": {"pre-merge": {"branches": ["main"]}},
            "hooks": [{
                "id": "validate_datasets", "type": "lua",
                "properties": {
                    "script": _stock("dataset_validator.lua"),
                    "args": {"prefix": "datasets/",
                             "metadata_file_name": "dataset_metadata.yaml",
                             "fields": fields},
                },
            }],
        }
    )

    good_meta = (
        "contains_pii: false\n"
        "approval_link: https://approvals.example.com/123\n"
        "rank: 4\n"
        "department: it\n"
    )
    repo.create_branch("good", "main")
    repo.stage_entries(
        "good",
        spark.createDataFrame(
            [("datasets/users/dataset_metadata.yaml", "im",
              _put_file(repo, "data/ds_good.yaml", good_meta),
              "RELATIVE", len(good_meta), "em", None, None, "t"),
             ("datasets/users/part-0.parquet", "ip", "x",
              "RELATIVE", 1, "e", None, None, "t")],
            ENTRY_SCHEMA,
        ),
    )
    repo.commit("good", "dataset with metadata")
    assert repo.merge("good", "main").commit_id

    # bad type: rank as a string fails the type check through hook.fail
    bad_meta = good_meta.replace("rank: 4", "rank: 'high'")
    repo.create_branch("badtype", "main")
    repo.stage_entries(
        "badtype",
        spark.createDataFrame(
            [("datasets/sales/dataset_metadata.yaml", "im2",
              _put_file(repo, "data/ds_bad.yaml", bad_meta),
              "RELATIVE", len(bad_meta), "em2", None, None, "t"),
             ("datasets/sales/part-0.parquet", "ip2", "x",
              "RELATIVE", 1, "e", None, None, "t")],
            ENTRY_SCHEMA,
        ),
    )
    repo.commit("badtype", "bad rank type")
    with pytest.raises(HookAbortError, match="should be of type number"):
        repo.merge("badtype", "main")

    # no metadata at all: explicit HookFailure
    repo.create_branch("nometa", "main")
    repo.stage_entries(
        "nometa",
        spark.createDataFrame(
            [("datasets/orphan/part-0.parquet", "ip3", "x",
              "RELATIVE", 1, "e", None, None, "t")],
            ENTRY_SCHEMA,
        ),
    )
    repo.commit("nometa", "no metadata file")
    with pytest.raises(HookAbortError, match="No dataset metadata found"):
        repo.merge("nometa", "main")


def test_commit_metadata_validator_stock_hook(spark, tmp_path):
    """examples/hooks/commit_metadata_validator.lua VERBATIM as
    pre-commit: missing mandatory field and pattern mismatch veto."""
    from lakefs_spark.storage.actions import ActionsService
    from lakefs_spark.storage.repo import HookAbortError

    repo = _seeded_repo(spark, tmp_path)
    ActionsService(repo).add_action(
        {
            "name": "pre commit metadata field check",
            "on": {"pre-commit": {"branches": ["main"]}},
            "hooks": [{
                "id": "check_commit_metadata", "type": "lua",
                "properties": {
                    "script": _stock("commit_metadata_validator.lua"),
                    "args": {
                        "notebook_url": {"pattern": "my-jupyter.example.com/.*"},
                        "spark_version": {},
                    },
                },
            }],
        }
    )
    repo.set_entry("main", {"key": "a/1", "identity": "i1", "size": 1, "etag": "e"})
    c = repo.commit(
        "main", "ok",
        metadata={"notebook_url": "my-jupyter.example.com/nb/42",
                  "spark_version": "4.1.2"},
    )
    assert c.commit_id
    repo.set_entry("main", {"key": "a/2", "identity": "i2", "size": 1, "etag": "e"})
    with pytest.raises(HookAbortError):
        repo.commit("main", "bad", metadata={"notebook_url": "elsewhere.com/x",
                                             "spark_version": "4.1.2"})
    with pytest.raises(HookAbortError):
        repo.commit("main", "missing", metadata={"notebook_url":
                                                 "my-jupyter.example.com/nb/1"})


def test_azure_abfss_transform_and_delta_chain(spark, tmp_path):
    """The esti AZURE delta-export hook body: blob_client writes
    through the azure stand-in and abfss_transform_path (the
    reference's exact rewrite) transforms physical addresses."""
    from lakefs_spark.storage.actions import ActionsService

    # transform is the pure reference regex
    ret, _ = run(
        """
        local azure = require("azure")
        return azure.abfss_transform_path(
          "https://myacct.blob.core.windows.net/cont/a/b.parquet"),
          azure.abfss_transform_path(
          "https://old.adls.core.windows.net/c2/x")
        """
    )
    assert ret == [
        "abfss://cont@myacct.dfs.core.windows.net/a/b.parquet",
        "abfss://c2@old.dfs.core.windows.net/x",
    ]

    repo, _base = _delta_repo(spark, tmp_path)
    export_root = str(tmp_path / "exports")
    svc = ActionsService(repo, export_root=export_root)
    svc.add_action(
        {
            "name": "Delta Exporter",
            "on": {"post-commit": {"branches": ["main*"]}},
            "hooks": [{
                "id": "delta_exporter", "type": "lua",
                "properties": {
                    # the esti azure variant (write through blob_client,
                    # no path_transformer for blob-store physicals here
                    # since our fixture uses s3:// addresses)
                    "script": """
action.storage_namespace = args.export_namespace
local azure = require("azure")
local formats = require("formats")
local delta_exporter = require("lakefs/catalogexport/delta_exporter")

local table_descriptors_path = "_lakefs_tables"
local sc = azure.blob_client(args.azure.storage_account, args.azure.access_key)
local function write_object(_, key, buf)
  return sc.put_object(key,buf)
end
local delta_client = formats.delta_client(args.lakefs.access_key_id, args.lakefs.secret_access_key)
local delta_table_details = delta_exporter.export_delta_log(action, {"famous"}, write_object, delta_client, table_descriptors_path)
for t, details in pairs(delta_table_details) do
  if details["path"] == nil then error("missing path for " .. t) end
end
""",
                    "args": {
                        "export_namespace": "https://myacct.blob.core.windows.net/ext-container/ns",
                        "azure": {"storage_account": "myacct", "access_key": "k"},
                        "lakefs": {"access_key_id": "lk", "secret_access_key": "ls"},
                    },
                },
            }],
        }
    )
    c = repo.commit("main", "land the delta table")
    short = c.commit_id[:6]
    # parse_storage_uri of the https namespace: bucket = host, key = path
    log_dir = os.path.join(
        export_root, "azure", "myacct", "ext-container",
        "ns", "_lakefs", "exported", "main", short, "famous", "_delta_log",
    )
    assert os.path.exists(os.path.join(log_dir, "00000000000000000000.json")), log_dir


def test_gcsfuse_symlink_exporter_stock_hook(spark, tmp_path):
    """examples/hooks/gcsfuse_symlink_exporter.lua VERBATIM as a
    post-commit hook: one symlink object per exported entry (metadata
    target = mount-rewritten physical address) plus the 'current'
    branch marker."""
    from lakefs_spark.storage.actions import ActionsService
    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "repo"))
    export_root = str(tmp_path / "exports")
    recorder: list = []
    svc = ActionsService(repo, export_root=export_root,
                         export_recorder=recorder)
    svc.add_action(
        {
            "name": "export_images",
            "on": {"post-commit": {"branches": ["main"]}},
            "hooks": [{
                "id": "gcsfuse_export_images", "type": "lua",
                "properties": {
                    "script": _stock("gcsfuse_symlink_exporter.lua"),
                    "args": {
                        "prefix": "datasets/images/",
                        "destination": "gs://my-bucket/exports/my-repo/",
                        "mount": {
                            "from": "gs://my-bucket/repos/my-repo/",
                            "to": "/gcs/my-bucket/repos/my-repo/",
                        },
                        "gcs_credentials_json_string": "{}",
                    },
                },
            }],
        }
    )
    rows = [
        (f"datasets/images/img-{i}.png", f"i{i}",
         f"gs://my-bucket/repos/my-repo/obj/{i}", "FULL", 10, f"e{i}",
         None, None, "image/png")
        for i in range(3)
    ]
    repo.stage_entries("main", spark.createDataFrame(rows, ENTRY_SCHEMA))
    c = repo.commit("main", "land images")

    links = [r for r in recorder if r.get("op") == "write_fuse_symlink"]
    # 3 per-object symlinks + the branch 'current' marker
    assert len(links) == 4, links
    per_obj = [r for r in links if "/commits/" in r["output"]]
    assert len(per_obj) == 3
    assert per_obj[0]["gcsfuse_symlink_target"] == (
        "/gcs/my-bucket/repos/my-repo/obj/0"
    )
    assert per_obj[0]["output"] == (
        f"gs://my-bucket/exports/my-repo/commits/{c.commit_id}/"
        "datasets/images/img-0.png"
    )
    marker = [r for r in links if r["output"].endswith("branches/main")]
    assert marker and marker[0]["gcsfuse_symlink_target"] == (
        "../commits/" + c.commit_id
    )
    # the stand-in materialized the objects under export_root/gs
    p = os.path.join(export_root, "gs", "my-bucket", "exports", "my-repo",
                     "commits", c.commit_id, "datasets/images/img-1.png")
    assert os.path.exists(p)


def test_base64_decode_rejects_non_alphabet_bytes():
    """Go's StdEncoding errors on corrupt input; a validator hook must
    see the failure, not a silently-reshaped payload."""
    from lakefs_spark.lua import LuaError

    with pytest.raises(LuaError, match="base64"):
        run('local b64 = require("encoding/base64")\nreturn b64.decode("ab!cd")')
    with pytest.raises(LuaError, match="base64"):
        run('local b64 = require("encoding/base64")\nreturn b64.url_decode("a+b")')


def test_changed_table_defs_dedupes_across_diff_pages(spark, tmp_path):
    """A table whose changes span multiple diff_refs pages (>100 rows)
    must be reported ONCE (the reference re-inserts per page —
    deliberate fix, disclosed in the module)."""
    repo, base = _delta_repo(spark, tmp_path)
    many = [
        (f"tables/famous/bulk/part-{i:04d}.parquet", f"ib{i}",
         f"s3://phys-bucket/bulk/{i}.parquet", "FULL", 1, f"eb{i}",
         None, None, "t")
        for i in range(220)
    ]
    repo.stage_entries("main", spark.createDataFrame(many, ENTRY_SCHEMA))
    c = repo.commit("main", "bulk change spanning diff pages")
    ret = run_lua_hook(
        """
        local delta = require("lakefs/catalogexport/delta_exporter")
        local changed = delta.changed_table_defs({"famous"}, "_lakefs_tables",
            action.repository_id, args.base_ref, action.commit_id)
        return #changed, changed[1]
        """,
        action={"repository_id": repo.name, "commit_id": c.commit_id},
        args={"base_ref": base.commit_id},
        repo=repo,
    )
    assert ret == [1, "famous"]


# ---------------------------------------------------------------------------
# round 9: the LAST stock example hooks, vendored byte-identical and run
# VERBATIM under type: lua — with these, all 12 of the reference's
# examples/hooks/*.lua execute unmodified against this engine
# ---------------------------------------------------------------------------


def test_action_logger_stock_hook(spark, tmp_path):
    """examples/hooks/action_logger.lua VERBATIM: marshals the entire
    `action` record to JSON on every event — the output line must be
    valid JSON carrying the reference's applyRecord fields."""
    from lakefs_spark.storage.actions import ActionsService

    repo = _seeded_repo(spark, tmp_path)
    svc = ActionsService(repo)
    svc.add_action(
        {
            "name": "log_everything",
            "on": {"post-commit": {"branches": ["main"]}},
            "hooks": [{
                "id": "log_it", "type": "lua",
                "properties": {"script": _stock("action_logger.lua")},
            }],
        }
    )
    repo.stage_entries(
        "main",
        spark.createDataFrame(
            [("a/1", "i1", "x", "RELATIVE", 1, "e", None, None, "t")],
            ENTRY_SCHEMA,
        ),
    )
    c = repo.commit("main", "logged commit")
    task = svc.task_results()[0]
    assert task["status"] == "completed"
    out = svc.hook_output(task["run_id"], task["hook_run_id"])
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["event_type"] == "post-commit"
    assert rec["commit_id"] == c.commit_id
    assert rec["branch_id"] == "main"
    assert rec["repository_id"] == repo.name
    assert rec["commit"]["message"] == "logged commit"


def test_s3_branch_head_exporter_stock_hook(spark, tmp_path):
    """examples/hooks/s3_branch_head_exporter.lua VERBATIM as
    post-commit: the branch head lands at
    <export_path>/repositories/<repo>/heads/<branch> with the commit id
    as content."""
    from lakefs_spark.storage.actions import ActionsService

    repo = _seeded_repo(spark, tmp_path)
    export_root = str(tmp_path / "exports")
    svc = ActionsService(repo, export_root=export_root)
    svc.add_action(
        {
            "name": "export_all_heads",
            "on": {"post-commit": {"branches": None}},
            "hooks": [{
                "id": "export_branch_head", "type": "lua",
                "properties": {
                    "script": _stock("s3_branch_head_exporter.lua"),
                    "args": {
                        "aws_access_key_id": "AKIA..",
                        "aws_secret_access_key": "...",
                        "aws_region": "us-east-1",
                        "export_bucket": "my-external-bucket",
                        "export_path": "lakefs-exported-heads",
                    },
                },
            }],
        }
    )
    repo.stage_entries(
        "main",
        spark.createDataFrame(
            [("b/1", "i1", "x", "RELATIVE", 1, "e", None, None, "t")],
            ENTRY_SCHEMA,
        ),
    )
    c = repo.commit("main", "head moves")
    p = os.path.join(export_root, "my-external-bucket",
                     "lakefs-exported-heads", "repositories", repo.name,
                     "heads", "main")
    assert os.path.exists(p), p
    with open(p) as f:
        assert f.read() == c.commit_id


def test_s3_hive_manifest_exporter_stock_hook(spark, tmp_path):
    """examples/hooks/s3_hive_manifest_exporter.lua VERBATIM across
    TWO commits: run 1 finds no markers → clean mode (lists the whole
    source, writes one symlink.txt per partition dir + start/end
    markers); run 2 finds matching markers → diff mode (diff_refs
    between marker and head), regenerating ONLY the dirty partition's
    symlink."""
    from lakefs_spark.storage.actions import ActionsService
    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "repo"))
    export_root = str(tmp_path / "exports")
    recorder: list = []
    svc = ActionsService(repo, export_root=export_root,
                         export_recorder=recorder)
    svc.add_action(
        {
            "name": "auto symlink",
            "on": {"post-commit": {"branches": ["main"]}},
            "hooks": [{
                "id": "symlink_creator", "type": "lua",
                "properties": {
                    "script": _stock("s3_hive_manifest_exporter.lua"),
                    "args": {
                        "aws_access_key_id": "AKIA...",
                        "aws_secret_access_key": "...",
                        "aws_region": "us-east-1",
                        "export_bucket": "oz-repo",
                        "export_path": "lakefs_tables",
                        "sources": ["tables/my-table/"],
                    },
                },
            }],
        }
    )
    rows = [
        (f"tables/my-table/dt={d}/part-{i}.parquet", f"i{d}{i}",
         f"s3://phys/data/{d}/{i}.parquet", "FULL", 10, f"e{d}{i}",
         None, None, "t")
        for d in ("2024-01-01", "2024-01-02") for i in range(2)
    ]
    repo.stage_entries("main", spark.createDataFrame(rows, ENTRY_SCHEMA))
    c1 = repo.commit("main", "land partitions")
    assert svc.task_results()[0]["status"] == "completed"

    base = os.path.join(export_root, "oz-repo", "lakefs_tables",
                        "repositories", repo.name, "refs", "main",
                        "tables", "my-table")
    # the hook joins each entry's FULL parent path under the location
    # export root, so the source prefix appears twice — that is the
    # stock script's real output layout, pinned as-is
    link1 = os.path.join(base, "tables", "my-table", "dt=2024-01-01",
                         "symlink.txt")
    link2 = os.path.join(base, "tables", "my-table", "dt=2024-01-02",
                         "symlink.txt")
    for p in (link1, link2):
        assert os.path.exists(p), p
    with open(link1) as f:
        assert f.read() == ("s3://phys/data/2024-01-01/0.parquet\n"
                            "s3://phys/data/2024-01-01/1.parquet")
    # markers carry the landed commit
    for marker in ("_start_commit_id", "_completed_commit_id"):
        with open(os.path.join(base, marker)) as f:
            assert f.read() == c1.commit_id

    # second commit touches ONLY dt=2024-01-02 → diff mode
    recorder.clear()
    repo.stage_entries(
        "main",
        spark.createDataFrame(
            [("tables/my-table/dt=2024-01-02/part-9.parquet", "inew",
              "s3://phys/data/2024-01-02/9.parquet", "FULL", 10, "enew",
              None, None, "t")],
            ENTRY_SCHEMA,
        ),
    )
    c2 = repo.commit("main", "append to one partition")
    assert svc.task_results()[0]["status"] == "completed"
    puts = [r["key"] for r in recorder if "key" in r]
    # dirty partition symlink + the two markers — NOT dt=2024-01-01
    assert not any("dt=2024-01-01" in k for k in puts), puts
    assert any(k.endswith("dt=2024-01-02/symlink.txt") for k in puts), puts
    with open(link2) as f:
        body = f.read()
    assert "s3://phys/data/2024-01-02/9.parquet" in body
    assert len(body.splitlines()) == 3
    with open(os.path.join(base, "_completed_commit_id")) as f:
        assert f.read() == c2.commit_id


def test_delta_lake_s3_export_stock_hook(spark, tmp_path):
    """examples/hooks/delta_lake_S3_export.lua VERBATIM: exports the
    committed _delta_log under the repo's storage namespace via the s3
    client, printing per-table locations + metadata."""
    from lakefs_spark.storage.actions import ActionsService

    repo, _base = _delta_repo_ns(spark, tmp_path, "s3://ext-bucket/ns")
    export_root = str(tmp_path / "exports")
    svc = ActionsService(repo, export_root=export_root)
    svc.add_action(
        {
            "name": "Delta Exporter",
            "on": {"post-commit": {"branches": ["main*"]}},
            "hooks": [{
                "id": "delta_exporter", "type": "lua",
                "properties": {
                    "script": _stock("delta_lake_S3_export.lua"),
                    "args": {
                        "table_defs": ["famous"],
                        "lakefs": {"access_key_id": "lk",
                                   "secret_access_key": "ls"},
                        "aws": {"access_key_id": "k",
                                "secret_access_key": "s", "region": "r"},
                        "region": "r",
                    },
                },
            }],
        }
    )
    c = repo.commit("main", "land the delta table")
    task = svc.task_results()[0]
    assert task["status"] == "completed", task
    short = c.commit_id[:6]
    log_dir = os.path.join(export_root, "ext-bucket", "ns", "_lakefs",
                           "exported", "main", short, "famous",
                           "_delta_log")
    assert os.path.exists(os.path.join(log_dir,
                                       "00000000000000000000.json"))
    out = svc.hook_output(task["run_id"], task["hook_run_id"])
    assert any("Delta Lake exported table \"famous\"'s location" in ln
               for ln in out)


def test_delta_lake_azure_export_stock_hook(spark, tmp_path):
    """examples/hooks/delta_lake_azure_export.lua VERBATIM: same chain
    through the azure blob client (repo namespace is an Azure https
    URL; the exporter parses account/container from it)."""
    from lakefs_spark.storage.actions import ActionsService

    repo, _base = _delta_repo_ns(
        spark, tmp_path,
        "https://myacct.blob.core.windows.net/ext-container/ns",
    )
    export_root = str(tmp_path / "exports")
    svc = ActionsService(repo, export_root=export_root)
    svc.add_action(
        {
            "name": "Azure Delta Exporter",
            "on": {"post-commit": {"branches": ["main*"]}},
            "hooks": [{
                "id": "delta_exporter", "type": "lua",
                "properties": {
                    "script": _stock("delta_lake_azure_export.lua"),
                    "args": {
                        "table_defs": ["famous"],
                        "lakefs": {"access_key_id": "lk",
                                   "secret_access_key": "ls"},
                        "azure": {"storage_account": "myacct",
                                  "access_key": "k"},
                    },
                },
            }],
        }
    )
    c = repo.commit("main", "land the delta table")
    task = svc.task_results()[0]
    assert task["status"] == "completed", task
    short = c.commit_id[:6]
    log_dir = os.path.join(export_root, "azure", "myacct",
                           "ext-container", "ns", "_lakefs", "exported",
                           "main", short, "famous", "_delta_log")
    assert os.path.exists(os.path.join(log_dir,
                                       "00000000000000000000.json"))


def test_unity_table_export_stock_hook(spark, tmp_path):
    """examples/hooks/unity_table_export.lua VERBATIM: the exhaustive
    chain — changed_table_defs via diff_refs, Delta export under the
    repo namespace, then Unity registration through the databricks
    client."""
    from lakefs_spark.storage.actions import ActionsService

    repo, _base = _delta_repo_ns(spark, tmp_path, "s3://ext-bucket/ns")
    export_root = str(tmp_path / "exports")
    recorder: list = []
    svc = ActionsService(repo, export_root=export_root,
                         export_recorder=recorder)
    svc.add_action(
        {
            "name": "unity_exporter",
            "on": {"post-commit": {"branches": ["main*"]}},
            "hooks": [{
                "id": "unity_export", "type": "lua",
                "properties": {
                    "script": _stock("unity_table_export.lua"),
                    "args": {
                        "table_defs": ["famous"],
                        "table_descriptors_path": "_lakefs_tables",
                        "lakefs": {"access_key_id": "lk",
                                   "secret_access_key": "ls"},
                        "aws": {"access_key_id": "k",
                                "secret_access_key": "s", "region": "r"},
                        "databricks_host": "https://dbx.example",
                        "databricks_token": "t",
                        "warehouse_id": "wh-1",
                    },
                },
            }],
        }
    )
    c = repo.commit("main", "land the delta table")
    task = svc.task_results()[0]
    assert task["status"] == "completed", task
    short = c.commit_id[:6]
    assert os.path.exists(os.path.join(
        export_root, "ext-bucket", "ns", "_lakefs", "exported", "main",
        short, "famous", "_delta_log", "00000000000000000000.json"))
    reg = [r for r in recorder
           if r.get("service") == "databricks"
           and r.get("op") == "register_external_table"]
    assert len(reg) == 1 and reg[0]["table"] == "famous"
    out = svc.hook_output(task["run_id"], task["hook_run_id"])
    assert any("completed with status: SUCCEEDED" in ln for ln in out)


def test_unity_table_export_azure_stock_hook(spark, tmp_path):
    """examples/hooks/unity_table_export_azure.lua VERBATIM: the Azure
    flavor — blob_client writes, abfss_transform_path rewrites the
    exported location, then Unity registration."""
    from lakefs_spark.storage.actions import ActionsService

    repo, _base = _delta_repo_ns(
        spark, tmp_path,
        "https://myacct.blob.core.windows.net/ext-container/ns",
        # physical addresses must be Azure https URLs: the hook runs
        # every data-file address through abfss_transform_path
        phys="https://myacct.blob.core.windows.net/phys/data",
    )
    export_root = str(tmp_path / "exports")
    recorder: list = []
    svc = ActionsService(repo, export_root=export_root,
                         export_recorder=recorder)
    svc.add_action(
        {
            "name": "unity_exporter_azure",
            "on": {"post-commit": {"branches": ["main*"]}},
            "hooks": [{
                "id": "unity_export_azure", "type": "lua",
                "properties": {
                    "script": _stock("unity_table_export_azure.lua"),
                    "args": {
                        "table_defs": ["famous"],
                        "table_descriptors_path": "_lakefs_tables",
                        "lakefs": {"access_key_id": "lk",
                                   "secret_access_key": "ls"},
                        "azure": {"storage_account": "myacct",
                                  "access_key": "k"},
                        "databricks_host": "https://dbx.example",
                        "databricks_token": "t",
                        "warehouse_id": "wh-1",
                    },
                },
            }],
        }
    )
    repo.commit("main", "land the delta table")
    task = svc.task_results()[0]
    assert task["status"] == "completed", task
    reg = [r for r in recorder
           if r.get("service") == "databricks"
           and r.get("op") == "register_external_table"]
    assert len(reg) == 1 and reg[0]["table"] == "famous"
    # the registered location went through abfss_transform_path
    assert reg[0]["statement"].startswith(
        "CREATE EXTERNAL TABLE famous LOCATION 'abfss://ext-container@"
        "myacct.dfs.core.windows.net/"
    ), reg[0]["statement"]
