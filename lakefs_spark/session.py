"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the config is written so the same code
runs unchanged on a multi-executor cluster: AQE on (runtime re-plan +
skew-join splitting), shuffle partitions sized by env, UTC session TZ
(required for DuckDB-oracle comparisons), Arrow enabled for the
Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "lakefs_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batches by BYTES, not just the 10k-row default:
        # rows with multi-MB values (metadata maps can run to ~41 MB in
        # the reference's own bound, pkg/graveler/committed/value.go:23)
        # would otherwise make one batch — and thus every Pandas-UDF
        # task's working set — arbitrarily large
        .config(
            "spark.sql.execution.arrow.maxBytesPerBatch",
            str(64 * 1024 * 1024),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testdata events.parquet stores TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long ns and convert in the loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # JVM<->Python-worker transport over UNIX DOMAIN SOCKETS (Spark
        # 4.1), not loopback TCP. Not a tuning whim: on this kernel the
        # TCP loopback path was observed to collapse mid-job — the
        # executor's advertised receive window stuck at 1024 bytes with
        # an EMPTY Recv-Q (ss: rwnd_limited 99.9%, retransmits and
        # reordering ON LOOPBACK), throttling an Arrow stream to ~5
        # KB/s and stalling a 24M-row migration indefinitely. UDS
        # bypasses TCP flow control entirely; an interleaved on/off
        # B1-B7 A/B measured NO throughput difference (means 29.4 s
        # both arms), so this removes the wedge failure class for
        # free. Env-overridable for A/B.
        .config(
            "spark.python.unix.domain.socket.enabled",
            os.environ.get("SPARK_GRAFT_UDS", "true"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
