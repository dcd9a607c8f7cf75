"""As-of (point-in-time) join — the canonical "operator Spark lacks".

For each left row, attach the LATEST right row whose timestamp is
at-or-before the left row's timestamp, per join key ("for each
purchase, the last click before it"). Spark has no native ASOF JOIN;
a naive theta-join (``l.ts >= r.ts``) plans as a per-key cross
product — quadratic per key, a non-starter at scale.

Spark-native shape: the classic MERGE-SCAN. Union both sides tagged
(right=0, left=1), ONE shuffle on the join keys, sort by (ts, side)
within each key, and carry the last non-null right payload forward
with ``last(..., ignorenulls=True)`` over an unbounded-preceding
window. Cost: one shuffle + one in-partition sort over |L|+|R| rows —
linear, and the window is per-key so there is no single-task collapse.
The right-before-left tie order makes the join inclusive
(``right_ts <= left_ts``), matching DuckDB's ASOF semantics used by
the oracle.

Skew note (100 TB): a hot join key serializes its own partition's
sort; salt the key and as-of within salt buckets, then resolve across
buckets with a second, bucket-count-sized pass, if a single key's
traffic outgrows one executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Left as-of join: all left columns + the matched right row's
    non-key columns (null when no right row precedes).

    Right rows should be unique per (keys, right_ts) — pre-aggregate
    ties (e.g. ``groupBy(keys, ts).agg(max(id))``) so the match is
    deterministic; with ties the lexicographically greatest right
    payload wins.

    ``tolerance_s``: optional max staleness — matches older than
    ``left_ts - tolerance_s`` are nulled (pandas ``merge_asof``'s
    tolerance).
    """
    pay_cols = [c for c in right.columns if c not in on and c != right_ts]
    pay = F.struct(
        F.col(right_ts).alias("__matched_ts"), *[F.col(c) for c in pay_cols]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        pay.alias("__pay"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema) + ">"
        ).alias("__lrow"),
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__pay"].dataType.simpleString()).alias("__pay"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__pay"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__m", F.last("__pay", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    if tolerance_s is not None:
        fresh = F.col("__m.__matched_ts").cast("timestamp").cast("double") >= (
            F.col("__ts").cast("timestamp").cast("double") - tolerance_s
        )
        matched = matched.withColumn("__m", F.when(fresh, F.col("__m")))
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__m.__matched_ts").alias("matched_ts"))
    out_cols += [F.col(f"__m.{c}").alias(c) for c in pay_cols]
    return matched.select(*out_cols)
