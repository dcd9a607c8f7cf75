"""Stateful streaming sessionization: exact session windows under
arbitrary event-time disorder, without a watermark.

Spark's native ``session_window`` on a stream finalizes a session only
once the watermark passes its gap — late events beyond the watermark
are dropped, and nothing is emitted for still-open sessions. This
operator instead keeps each user's session set as MERGEABLE INTERVALS
in ``applyInPandasWithState`` state: an event either founds a new
interval or absorbs/bridges existing ones (joining two sessions into
one when it lands in the gap between them). Interval merging is
associative and commutative, so the final state is EXACTLY the batch
gaps-and-islands result for ANY batching and ANY arrival order — the
same batch-invariance contract the tombstone sensor gate uses.

Each microbatch emits the group's full current session set tagged with
a per-group ``version``; the latest version per user is the final
answer (a streaming sink would typically upsert by user_id instead).

Semantics match ``streaming/ingest.session_event_stats`` (Spark
``F.session_window``): two events share a session iff their gap is
STRICTLY less than ``gap_us``; ``session_end = last event + gap``;
microsecond precision; emitted epochs floor to seconds.

Scale: state per user is its OPEN session intervals (bounded by the
user's activity span / gap, not stream length); the only shuffle is
the per-microbatch groupBy(user). Reference analog: this is the
versioning engine's streaming surface applied to the events table —
the reference has no sessionizer; cited here as a beyond-reference
streaming operator like ingest.py's windowed aggregations.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, version long, session_start_s long, session_end_s long, "
    "n_events long, total_value double"
)
_STATE_SCHEMA = (
    "version long, starts array<long>, ends array<long>, "
    "ns array<long>, sums array<double>"
)


def merge_event(ivals: list[list], t: int, v: float, gap: int) -> list[list]:
    """Fold one event into a session-interval set: the event founds a
    new interval or absorbs/bridges every interval within STRICT gap
    distance. Each interval is ``[lo, hi, n, sum]``. This fold is
    order-insensitive (same final set for any event permutation or
    grouping), which is the operator's whole batch-invariance
    contract — property-tested in tests/test_streaming.py."""
    lo, hi, n, s = t, t, 1, v
    keep = []
    for iv in ivals:
        if iv[0] - t < gap and t - iv[1] < gap:
            lo, hi = min(lo, iv[0]), max(hi, iv[1])
            n, s = n + iv[2], s + iv[3]
        else:
            keep.append(iv)
    keep.append([lo, hi, n, s])
    return keep


def session_stats_stream(
    events: DataFrame,
    gap_us: int = 1_800_000_000,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
) -> DataFrame:
    """``events``: a stream with (user_id, ts_us microseconds, value).

    Returns the append stream of per-user session sets described in
    the module docstring.
    """
    gap = int(gap_us)

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            version, starts, ends, ns, sums = state.get
            ivals = [list(t) for t in zip(starts, ends, ns, sums)]
        else:
            version, ivals = 0, []
        for pdf in pdfs:
            for t, v in zip(pdf[ts_col], pdf[value_col]):
                ivals = merge_event(ivals, int(t), float(v), gap)
        ivals.sort()
        version += 1
        state.update(
            (
                version,
                [iv[0] for iv in ivals],
                [iv[1] for iv in ivals],
                [iv[2] for iv in ivals],
                [iv[3] for iv in ivals],
            )
        )
        yield pd.DataFrame(
            {
                "user_id": [user] * len(ivals),
                "version": [version] * len(ivals),
                "session_start_s": [iv[0] // 1_000_000 for iv in ivals],
                "session_end_s": [(iv[1] + gap) // 1_000_000 for iv in ivals],
                "n_events": [iv[2] for iv in ivals],
                "total_value": [round(iv[3], 4) for iv in ivals],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        _update,
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def latest_sessions(emitted: DataFrame) -> DataFrame:
    """Reduce the append stream's emissions to the final session set:
    the max-version rows per user (batch DataFrame helper for sinks
    that collected the raw append stream)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id")
    return (
        emitted.withColumn("__mx", F.max("version").over(w))
        .where(F.col("version") == F.col("__mx"))
        .drop("__mx", "version")
    )
