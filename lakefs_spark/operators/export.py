"""Catalog exporters: symlink (Athena-style) manifests + Delta log.

Reference: the Lua catalog exporters
(pkg/actions/lua/lakefs/catalogexport/{symlink_exporter,delta_exporter}.lua)
publish a committed table prefix to external engines — symlink.txt
directories for Hive/Athena SymlinkTextInputFormat, and a Delta Lake
transaction log (JSON actions) for Delta readers.

Spark shape: one ``groupBy(dir)`` with a sorted ``collect_list`` —
map-side partial aggregation keeps the shuffle to one row per
directory; file writes fan out per-partition on executors (the analog
of the reference's per-directory PUTs). The Delta log is a single
driver-written JSON file: its size is one line per data file, metadata-
scale, not data-scale.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symlink_manifest(entries: DataFrame) -> DataFrame:
    """Per-directory symlink manifest rows.

    Returns ``(dir, n_objects, content)`` where ``content`` is the
    newline-joined sorted physical addresses — exactly the bytes of
    that directory's ``symlink.txt``.
    """
    key = F.col("key")
    return (
        entries.select(
            # a key without '/' lives in the ROOT manifest (dir "") —
            # the unanchored regexp would leave it unchanged and turn
            # the file name into a bogus partition directory
            F.when(
                key.contains("/"), F.regexp_replace(key, "/[^/]*$", "")
            ).otherwise(F.lit("")).alias("dir"),
            "address",
        )
        .groupBy("dir")
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            F.array_join(F.sort_array(F.collect_list("address")), "\n").alias("content"),
        )
    )


def write_symlinks(entries: DataFrame, out_dir: str) -> int:
    """Write one ``<dir>/symlink.txt`` per directory under ``out_dir``.

    Executor-parallel via foreachPartition; returns directory count.
    """
    manifest = symlink_manifest(entries).persist()

    def _write(rows) -> None:
        for row in rows:
            d = os.path.join(out_dir, row["dir"])
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "symlink.txt"), "w") as f:
                f.write(row["content"] + "\n")

    try:
        manifest.foreachPartition(_write)
        return manifest.count()
    finally:
        manifest.unpersist()


def hive_partitions(entries: DataFrame, table_prefix: str) -> DataFrame:
    """Partition inventory of a committed table prefix.

    The Glue/Hive exporters (catalogexport/{glue_exporter,
    table_extractor}.lua) walk a table's prefix, take the first path
    component under it as the partition value, and register one
    catalog partition per value with its location. This computes that
    inventory: ``(part_value, n_objects, total_size)`` — one shuffled
    row per partition after map-side partial aggregation.
    """
    # component boundary: 'tables/animals' must not match sibling
    # 'tables/animals_v2/...' rows as a bogus '_v2' partition
    prefix = table_prefix.rstrip("/") + "/"
    sfx = F.substring(F.col("key"), len(prefix) + 1, 1_000_000)
    pos = F.instr(sfx, "/")
    return (
        entries.where(F.col("key").startswith(prefix) & (pos > 0))
        .select(sfx.substr(F.lit(1), pos - 1).alias("part_value"), "size")
        .groupBy("part_value")
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            F.sum(F.coalesce(F.col("size"), F.lit(0))).alias("total_size"),
        )
    )


GLUE_BATCH_CREATE_MAX = 100  # BatchCreatePartition hard API cap


def glue_partition_input(
    partitions: DataFrame, database: str, table: str, location_root: str
) -> list[dict]:
    """Glue ``BatchCreatePartition`` request bodies for the inventory
    (glue_exporter.lua analog): one PartitionInput per value, location
    = ``location_root/<value>/``, chunked into batches of at most 100
    PartitionInputs — the Glue API's per-call cap. Partition count is
    catalog-scale, so the collect is metadata-bounded. Returns one
    request dict per batch."""
    inputs = [
        {
            "Values": [r["part_value"]],
            "StorageDescriptor": {
                "Location": f"{location_root.rstrip('/')}/{r['part_value']}/",
                "InputFormat": "org.apache.hadoop.hive.ql.io.SymlinkTextInputFormat",
            },
        }
        for r in partitions.orderBy("part_value").collect()
    ]
    return [
        {
            "DatabaseName": database,
            "TableName": table,
            "PartitionInputList": inputs[i : i + GLUE_BATCH_CREATE_MAX],
        }
        for i in range(0, len(inputs), GLUE_BATCH_CREATE_MAX)
    ]


def hive_add_partition_ddl(
    partitions: DataFrame, table: str, location_root: str, partition_key: str = "part"
) -> str:
    """``ALTER TABLE .. ADD IF NOT EXISTS PARTITION ..`` statement for
    the inventory — the HMS-dialect twin of :func:`glue_partition_input`."""
    clauses = [
        f"PARTITION ({partition_key}='{r['part_value']}') "
        f"LOCATION '{location_root.rstrip('/')}/{r['part_value']}/'"
        for r in partitions.orderBy("part_value").collect()
    ]
    return f"ALTER TABLE {table} ADD IF NOT EXISTS\n" + "\n".join(clauses)


def unity_table_input(
    entries: DataFrame,
    catalog: str,
    schema: str,
    table: str,
    location_root: str,
    columns: list[tuple[str, str]] | None = None,
    data_source_format: str = "DELTA",
) -> dict:
    """Unity-catalog external-table registration payload
    (catalogexport/unity_exporter.lua: creates an EXTERNAL table over
    the exported location, typically the Delta log written by
    :func:`delta_log_export`). Returns the create-table request body;
    the only data-dependent fields are metadata-scale aggregates."""
    stats = entries.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.coalesce(F.col("size"), F.lit(0))).alias("bytes"),
    ).first()
    return {
        "name": table,
        "catalog_name": catalog,
        "schema_name": schema,
        "table_type": "EXTERNAL",
        "data_source_format": data_source_format,
        "storage_location": location_root.rstrip("/") + "/",
        "columns": [
            {"name": n, "type_text": t, "position": i}
            for i, (n, t) in enumerate(columns or [])
        ],
        "properties": {
            "exported_objects": str(stats["n"]),
            "exported_bytes": str(stats["bytes"] or 0),
        },
    }


def delta_log_export(
    entries: DataFrame,
    out_dir: str,
    schema_json: str | None = None,
    table_name: str = "exported",
    version: int = 0,
    prev_entries: DataFrame | None = None,
) -> str:
    """Write a Delta Lake transaction-log version file for a snapshot.

    One ``add`` action per object (path = physical address, size,
    modificationTime), plus ``protocol`` and ``metaData`` — the minimal
    action set Delta readers require (delta_exporter.lua analog; Delta
    log format per the Delta Lake VLDB'20 paper, PAPERS.md). The table
    id is content-derived so re-exporting the same snapshot is
    idempotent. Returns the log file path.

    ``version > 0`` requires ``prev_entries`` (the previously exported
    snapshot): Delta log replay is union-of-adds minus removes, so an
    incremental version must emit ``remove`` actions for paths that
    left the snapshot and adds ONLY for paths that entered — a full
    re-add would leave deleted files visible and duplicate the rest.
    """
    if version > 0 and prev_entries is None:
        raise ValueError(
            "version > 0 needs prev_entries: without removes, objects "
            "deleted since the previous export stay visible to readers"
        )
    sel = ["key", "address", "size", "last_modified"]
    removed = None
    if prev_entries is not None:
        cur, prev = entries.select(*sel), prev_entries.select(*sel)
        removed = prev.join(cur.select("address"), "address", "left_anti")
        entries = cur.join(prev.select("address"), "address", "left_anti")
    # content-derived table id, computed distributively (order-independent
    # xor of per-object hashes + count): never materializes the listing
    # on the driver, unlike a sorted-concat re-hash
    ent = entries.select(*sel).persist()
    try:
        return _write_delta_log(ent, out_dir, version, table_name, schema_json, removed)
    finally:
        # always drop the cache: CacheManager matches by plan, so a leaked
        # entry would serve stale rows to later reads of the same source
        ent.unpersist()


def _write_delta_log(ent, out_dir, version, table_name, schema_json, removed=None):
    agg = ent.agg(
        F.bit_xor(F.xxhash64(F.concat_ws(":", "address", "size"))).alias("x"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    table_id = hashlib.sha256(f"{agg['x']}:{agg['n']}".encode()).hexdigest()
    log_dir = os.path.join(out_dir, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"{version:020d}.json")
    schema = schema_json or json.dumps(
        {"type": "struct", "fields": []}, separators=(",", ":")
    )
    with open(path, "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}) + "\n")
        f.write(
            json.dumps(
                {
                    "metaData": {
                        "id": table_id,
                        "name": table_name,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": schema,
                        "partitionColumns": [],
                        "configuration": {},
                    }
                }
            )
            + "\n"
        )
        # add actions: JSON built executor-side (to_json), streamed to
        # the single local log file via toLocalIterator — one partition
        # in driver memory at a time, never the full listing (a 1e9-
        # object snapshot would OOM a collect)
        act_lines = (
            ent.select(
                "key",
                F.to_json(
                    F.struct(
                        F.struct(
                            F.col("address").alias("path"),
                            F.coalesce(F.col("size").cast("long"), F.lit(0)).alias("size"),
                            F.from_json(F.lit("{}"), "map<string,string>").alias(
                                "partitionValues"
                            ),
                            F.coalesce(
                                F.unix_millis(F.col("last_modified").cast("timestamp")),
                                F.lit(0),
                            ).alias("modificationTime"),
                            F.lit(True).alias("dataChange"),
                        ).alias("add")
                    )
                ).alias("line"),
            )
            .orderBy("key")
            .select("line")
        )
        for row in act_lines.toLocalIterator():
            f.write(row["line"] + "\n")
        if removed is not None:
            rm_lines = (
                removed.select(
                    "key",
                    F.to_json(
                        F.struct(
                            F.struct(
                                F.col("address").alias("path"),
                                F.lit(0).cast("long").alias("deletionTimestamp"),
                                F.lit(True).alias("dataChange"),
                            ).alias("remove")
                        )
                    ).alias("line"),
                )
                .orderBy("key")
                .select("line")
            )
            for row in rm_lines.toLocalIterator():
                f.write(row["line"] + "\n")
    return path


def export_bucketed_table(
    entries: DataFrame,
    table: str,
    buckets: int = 8,
    bucket_col: str = "key",
    partition_col: str | None = None,
) -> None:
    """Export a snapshot as a Spark-managed BUCKETED table so
    downstream consumers join/aggregate on ``bucket_col`` without a
    shuffle (the catalog records the hash-bucketing; two tables
    bucketed the same way sort-merge join with zero Exchange).

    This is the Spark-native analog of the reference's Hive/Glue
    exporters (catalogexport/*.lua registers partitions for engines to
    consume): where those hand the listing to an external metastore,
    this registers the layout Spark itself exploits. At 100 TB the
    bucketing is the difference between re-shuffling the snapshot on
    every join and reading co-located buckets; pick ``buckets`` near
    the target cluster's core count x a small factor.
    """
    w = entries.write.mode("overwrite").bucketBy(buckets, bucket_col).sortBy(bucket_col)
    if partition_col is not None:
        w = w.partitionBy(partition_col)
    w.format("parquet").saveAsTable(table)


def delta_checkpoint(
    spark,
    out_dir: str,
    version: int,
) -> str:
    """Write a Delta checkpoint for ``version``: the reconciled action
    state (latest protocol + metaData + live add set after applying
    removes) as ONE parquet file, plus the ``_last_checkpoint`` pointer
    readers consult to skip replaying the JSON log from zero
    (delta-io protocol CHECKPOINTS section; the Delta Lake VLDB'20
    paper's log-compaction mechanism).

    Scale shape: the JSON versions are read as a DataFrame (one task
    per log file), reconciliation is a window-free anti-join of removes
    onto adds (remove wins for its path at a later-or-equal version),
    and the checkpoint is written by the native parquet writer —
    nothing driver-side but the pointer file.
    """
    import glob as _glob

    log_dir = os.path.join(out_dir, "_delta_log")
    files = sorted(
        p
        for p in _glob.glob(os.path.join(log_dir, "*.json"))
        if int(os.path.basename(p).split(".")[0]) <= version
    )
    if not files:
        raise FileNotFoundError(f"no delta log versions <= {version} in {log_dir}")
    df = (
        spark.read.json(files)
        .withColumn("__f", F.input_file_name())
        .withColumn(
            "__v",
            F.regexp_extract(F.col("__f"), r"(\d{20})\.json", 1).cast("long"),
        )
    )
    cols = set(df.columns)
    adds = (
        df.where(F.col("add").isNotNull()).select("add", "__v")
        if "add" in cols
        else None
    )
    if adds is not None:
        # Delta reconciliation: the NEWEST add per path wins — a
        # re-added path must not appear twice in the checkpoint
        from pyspark.sql.window import Window

        w = Window.partitionBy(F.col("add.path")).orderBy(F.col("__v").desc())
        adds = (
            adds.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    if adds is not None and "remove" in cols:
        removes = df.where(F.col("remove").isNotNull()).select(
            F.col("remove.path").alias("rpath"), F.col("__v").alias("rv")
        )
        adds = (
            adds.join(
                removes,
                (F.col("add.path") == F.col("rpath")) & (F.col("rv") >= F.col("__v")),
                "left_anti",
            )
        )
    # latest protocol / metaData win
    latest = {}
    for action in ("protocol", "metaData"):
        if action in cols:
            rows = (
                df.where(F.col(action).isNotNull())
                .orderBy(F.col("__v").desc())
                .select(action)
                .limit(1)
                .collect()
            )
            if rows:
                latest[action] = rows[0][action]
    # one action per checkpoint row (Delta checkpoint schema): emit
    # protocol and metaData as separate rows
    state = (
        spark.createDataFrame(
            [(latest.get("protocol"), None), (None, latest.get("metaData"))],
            df.select("protocol", "metaData").schema,
        )
        if ("protocol" in cols and "metaData" in cols)
        else None
    )
    ckpt_tmp = os.path.join(log_dir, f".ckpt.{os.getpid()}")
    # an empty table (protocol/metaData but zero add actions) is a
    # legal Delta state: checkpoint carries just the state rows, no
    # add column. A log with neither state nor adds is not a log.
    out = adds.select("add") if adds is not None else None
    if out is None and state is None:
        raise ValueError(f"delta log {log_dir} has no checkpointable actions")
    n_actions = 0
    import shutil as _shutil

    if state is not None and out is not None:
        full = state.select(
            "protocol", "metaData", F.lit(None).cast(out.schema["add"].dataType).alias("add")
        ).unionByName(
            out.select(
                F.lit(None).cast(state.schema["protocol"].dataType).alias("protocol"),
                F.lit(None).cast(state.schema["metaData"].dataType).alias("metaData"),
                "add",
            )
        )
    elif state is not None:
        full = state.select("protocol", "metaData")
    else:
        full = out
    full.coalesce(1).write.mode("overwrite").parquet(ckpt_tmp)
    n_actions = full.count()
    part = [p for p in os.listdir(ckpt_tmp) if p.endswith(".parquet")][0]
    ckpt_path = os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")
    os.replace(os.path.join(ckpt_tmp, part), ckpt_path)
    _shutil.rmtree(ckpt_tmp, ignore_errors=True)
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        f.write(json.dumps({"version": version, "size": int(n_actions)}))
    return ckpt_path
