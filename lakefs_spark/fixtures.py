"""Deterministic repo-seeding fixtures shared by the driver gates
(``__spark_entry__.py``) and the pytest suite.

These used to live in ``tests/test_lua_exporters.py``, but the driver
gate ``q_lua_stock_validators`` needs them at runtime and a runtime
gate must not depend on the pytest tree being importable (round-9
advice). Everything here is plain data + seeding helpers — no test
framework imports.

The Delta fixture mirrors what the reference's esti suite stages for
its stock delta exporter hooks (esti/catalog_export_test.go +
examples/hooks/delta_exporter.lua): a ``_lakefs_tables/`` descriptor,
a two-commit ``_delta_log`` (protocol/metaData/add, then a
deletion-vector add + a remove of a long-vacuumed file), a checkpoint
parquet the exporter must skip, and FULL-address data files that are
stat-only like production.
"""

from __future__ import annotations

import json
import os

from lakefs_spark.schema import ENTRY_SCHEMA

DELTA_DESCRIPTOR = """\
name: famous
type: delta
catalog: main-cat
path: tables/famous
"""

META_ACTION = {
    "metaData": {
        "id": "11-22",
        "name": "famous",
        "description": "famous animals",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": '{"type":"struct","fields":[]}',
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 1699276565000,
    }
}


def put_file(repo, rel: str, text: str) -> str:
    """Land readable object content under the repo's data root and
    return the RELATIVE address entries can reference."""
    p = os.path.join(repo.store.data_root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write(text)
    return rel


def seed_delta_rows(spark, repo, phys: str = "s3://phys-bucket/data"):
    """Stage the Delta-table fixture rows onto ``main`` (after a base
    commit so post-commit ``parents[1]`` resolves for diff_refs).
    Returns (repo, base_commit)."""
    repo.stage_entries(
        "main",
        spark.createDataFrame(
            [("README.md", "i0", put_file(repo, "data/readme", "hi"),
              "RELATIVE", 2, "e0", None, None, "t")],
            ENTRY_SCHEMA,
        ),
    )
    base = repo.commit("main", "base")

    v0 = "\n".join(
        [
            json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}),
            json.dumps(META_ACTION),
            json.dumps(
                {
                    "add": {
                        "path": "part-0.parquet",
                        "partitionValues": {},
                        "size": 100,
                        "modificationTime": 1699276565000,
                        "dataChange": True,
                    }
                }
            ),
        ]
    )
    v1 = "\n".join(
        [
            json.dumps(
                {
                    "add": {
                        "path": "part-1.parquet",
                        "partitionValues": {},
                        "size": 50,
                        "dataChange": True,
                        "deletionVector": {
                            "storageType": "i",
                            "pathOrInlineDv": "deadbeef",
                            "sizeInBytes": 4,
                            "cardinality": 1,
                        },
                    }
                }
            ),
            # remove of a long-vacuumed file: stat 404 must be skipped
            json.dumps(
                {
                    "remove": {
                        "path": "part-gone.parquet",
                        "deletionTimestamp": 1699276565259,
                        "dataChange": True,
                    }
                }
            ),
        ]
    )
    rows = [
        ("_lakefs_tables/famous.yaml", "iy",
         put_file(repo, "data/famous.yaml", DELTA_DESCRIPTOR),
         "RELATIVE", len(DELTA_DESCRIPTOR), "ey", None, None, "t"),
        ("tables/famous/_delta_log/00000000000000000000.json", "il0",
         put_file(repo, "data/log0.json", v0),
         "RELATIVE", len(v0), "el0", None, None, "t"),
        ("tables/famous/_delta_log/00000000000000000001.json", "il1",
         put_file(repo, "data/log1.json", v1),
         "RELATIVE", len(v1), "el1", None, None, "t"),
        # a checkpoint parquet coexists with the JSON commits (Delta
        # writes one every ~10 commits); get_table must SKIP it, not
        # abort (code-review r8 finding)
        ("tables/famous/_delta_log/00000000000000000001.checkpoint.parquet",
         "ick", "s3://phys-bucket/ckpt/1.parquet", "FULL", 999, "eck",
         None, None, "t"),
        ("tables/famous/part-0.parquet", "ip0",
         f"{phys}/part-0.parquet", "FULL", 100, "ep0", None, None, "t"),
        ("tables/famous/part-1.parquet", "ip1",
         f"{phys}/part-1.parquet", "FULL", 50, "ep1", None, None, "t"),
    ]
    repo.stage_entries("main", spark.createDataFrame(rows, ENTRY_SCHEMA))
    return repo, base


def delta_repo_ns(spark, tmp_path, storage_namespace,
                  phys: str = "s3://phys-bucket/data"):
    """A Delta-fixture repo whose record carries a real storage
    namespace (like any lakeFS repo) — the VERBATIM delta hooks export
    under action.storage_namespace, no script-side override."""
    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "repo"),
                             storage_namespace=storage_namespace)
    return seed_delta_rows(spark, repo, phys=phys)


def delta_repo(spark, tmp_path):
    """A repo holding a Delta table at tables/famous: the _delta_log
    JSON commits live as readable RELATIVE objects; the parquet data
    files are FULL s3:// addresses (stat-only, like production)."""
    from lakefs_spark.storage.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "repo"))
    return seed_delta_rows(spark, repo)


# the reference's stock examples/hooks/*.lua, vendored VERBATIM under
# tests/data/hooks (test-only artifacts, licenses vendored — README);
# the stock-validator driver gate executes them from here too
HOOKS_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "hooks",
)

HIVE_DESCRIPTOR = """\
name: animals
type: hive
path: tables/animals
partition_columns: ['type']
schema:
  type: struct
  fields:
    - name: type
      type: string
      comment: animal type
    - name: weight
      type: integer
    - name: name
      type: string
"""

# the esti delta_export.yaml script body (s3 variant), with the same
# kind of action-field override the esti glue fixture itself uses
# (storage_namespace → a URI the sandbox s3 stand-in can address)
DELTA_EXPORT_SCRIPT = """
action.storage_namespace = args.export_namespace
local aws = require("aws")
local formats = require("formats")
local delta_exporter = require("lakefs/catalogexport/delta_exporter")
local json = require("encoding/json")

local table_descriptors_path = "_lakefs_tables"

local ref = action.commit.parents[1]
local compare_ref = action.commit_id
local changed_table_names = delta_exporter.changed_table_defs(args.table_names, table_descriptors_path, action.repository_id, ref, compare_ref)

local sc = aws.s3_client(args.aws.access_key_id, args.aws.secret_access_key, args.aws.region)
local delta_client = formats.delta_client(args.lakefs.access_key_id, args.lakefs.secret_access_key, args.aws.region)
local delta_table_details = delta_exporter.export_delta_log(action, changed_table_names, sc.put_object, delta_client, table_descriptors_path)

for t, details in pairs(delta_table_details) do
  if details["path"] == nil then
    error("Delta Lake exported table \\"" .. t .. "\\"'s location is not available\\n")
  end
  print("Delta Lake exported table \\"" .. t .. "\\"'s location: " .. details["path"] .. "\\n")
  if details["metadata"] == nil then
    error("Delta Lake exported table \\"" .. t .. "\\"'s metadata is not available\\n")
  end
end
"""

GLUE_EXPORT_SCRIPT = """
local aws = require("aws")
local exporter = require("lakefs/catalogexport/glue_exporter")
local glue = aws.glue_client(args.aws.aws_access_key_id, args.aws.aws_secret_access_key, args.aws.aws_region)
local create_db_input_table = {DatabaseInput = {Description="Created by Glue Exporter"}}
exporter.export_glue(glue, args.catalog.db_name, args.table_source, args.catalog.table_input, action, {debug=true, create_db_input = create_db_input_table, export_base_uri = args.export_base_uri})
"""