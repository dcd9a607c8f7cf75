"""Spark-side fixture registration (mirror of sources/relspec.py).

Registers the base parquet tables and executes the shared portable SQL
view definitions, so the Spark operators and the DuckDB oracle compute
over byte-identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakefs_spark.schema import ENTRY_COLS
from lakefs_spark.sources.relspec import VIEWS

BASE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

_NULL_TYPES = {"last_modified": "timestamp", "metadata": "map<string,string>"}


def register_base_tables(spark: SparkSession, sf_dir: str) -> None:
    # The driver harness calls queries() on a VANILLA SparkSession (not
    # lakefs_spark.session.get_spark()), so the confs the fixtures depend on
    # must be set here at runtime.  Both are runtime-settable:
    #  - nanosAsLong: events.parquet stores TIMESTAMP(NANOS) which Spark
    #    rejects by default (PARQUET_TYPE_ILLEGAL); read as bigint and
    #    convert below.
    #  - UTC session TZ: keeps to_date()/day bucketing identical to the
    #    DuckDB oracle regardless of machine TZ.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for name in BASE_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            # nanos-as-long (see session.py) -> proper timestamp (us)
            df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        df.createOrReplaceTempView(name)


def create_fixture_views(spark: SparkSession, sf_dir: str) -> None:
    register_base_tables(spark, sf_dir)
    for name, sql in VIEWS.items():
        spark.sql(f"create or replace temporary view {name} as {sql}")


def pad_entries(df: DataFrame) -> DataFrame:
    """Add typed-null entry columns the relational fixtures omit."""
    out = df
    for col, typ in _NULL_TYPES.items():
        if col not in out.columns:
            out = out.withColumn(col, F.lit(None).cast(typ))
    return out


def entries_view(spark: SparkSession, name: str) -> DataFrame:
    """Fixture view as a full entry-schema DataFrame."""
    return pad_entries(spark.table(name)).select(*ENTRY_COLS)


def staged_view(spark: SparkSession, name: str) -> DataFrame:
    """Staged-layer fixture view (seq + is_tombstone + entry cols)."""
    return pad_entries(spark.table(name)).select("seq", "is_tombstone", *ENTRY_COLS)
