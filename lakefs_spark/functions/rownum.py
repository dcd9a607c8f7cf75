"""Scalable global row numbering.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves every
row to ONE partition (Spark warns "No Partition Defined for Window
operation") — a non-starter at 100 TB. This computes the same number
distributively with the classic zipWithIndex two-pass:

1. range-repartition + sort within partitions on the order key
   (partition ids are range-ordered, so partition p holds keys below
   partition p+1);
2. count rows per partition — ONE small row per partition on the
   driver — and prefix-sum into per-partition offsets;
3. per-partition ``row_number()`` (safe: partitionBy(pid)) + offset.

Cost: one range shuffle + one tiny count job, instead of a full
collapse to a single task. The reference's range writer solves the
same problem with its sequential SSTable writer; this is the
Spark-parallel equivalent (clients/spark uses RDD.zipWithIndex for
identical reasons).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gxrn_pid"


def with_global_row_number(
    df: DataFrame, order_cols: list[str], out_col: str = "rn", num_partitions: int | None = None
) -> DataFrame:
    """Add ``out_col`` = 1-based global row number under
    ``ORDER BY order_cols``, without a single-partition window."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    cols = [F.col(c) for c in order_cols]
    # localCheckpoint (not persist): materializes the shuffled sort once so
    # the count pass and the numbering pass see identical partitions, is
    # invisible to the plan-matching CacheManager (no stale-read hazard for
    # other readers of the same source), and is freed when the DataFrame
    # is garbage collected
    d = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # one row per partition — bounded by partition count, not data volume
    counts = d.groupBy(_PID).count().collect()
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r[_PID]):
        offsets[int(r[_PID])] = acc
        acc += int(r["count"])
    # map literal: pid -> offset (one entry per partition, tiny)
    pairs = []
    for pid, off in offsets.items():
        pairs += [F.lit(pid), F.lit(off)]
    offset = (
        F.coalesce(F.create_map(*pairs)[F.col(_PID)], F.lit(0)) if pairs else F.lit(0)
    )
    w = Window.partitionBy(_PID).orderBy(*cols)
    return d.withColumn(
        out_col, (F.row_number().over(w) + offset).cast("long")
    ).drop(_PID)
