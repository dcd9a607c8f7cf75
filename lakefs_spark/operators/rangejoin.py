"""Range (interval-containment) join via bucketized equi-join.

``points.value BETWEEN intervals.lo AND intervals.hi`` planned naively
is a per-key cross product (BroadcastNestedLoopJoin / theta join) —
quadratic and a scale-killer. The standard fix: quantize the value
axis into fixed-width buckets; each interval explodes to the buckets
it overlaps, each point maps to its single bucket, and the join
becomes an EQUI-join on (keys..., bucket) with a cheap residual
``between`` filter. A (point, interval) pair can only meet in the
point's bucket, so no dedup pass is needed.

Cost: |intervals| x (avg_span/width + 1) exploded rows + one hash
shuffle — linear for bounded spans. Pick ``bucket_width`` near the
typical interval span: too small inflates the explode, too big
degrades bucket selectivity toward the cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join of points to the intervals containing them
    (inclusive on both ends), equi-keyed on ``on`` + bucket.

    Returns all columns of both inputs (join keys once).
    """
    w = float(bucket_width)
    i2 = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    p2 = points.withColumn("__b", F.floor(F.col(point_col) / w).cast("long"))
    return (
        p2.join(i2, on=on + ["__b"])
        .where(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("__b")
    )
