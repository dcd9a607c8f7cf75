"""Stateful streaming sensors: cross-microbatch counters with alerts.

The reference's delete sensor is a stateful counter that watches a
branch's accumulating tombstones and fires a compaction callback when
they cross a threshold (pkg/graveler/delete_sensor.go:48-125; the
batch analog lives in Repository.set_delete_sensor). On a change
*stream* the same semantics need state that survives microbatches —
exactly what ``applyInPandasWithState`` provides: per-group (branch)
state kept by the streaming engine in the checkpoint, updated with
each batch's Arrow-transferred rows.

Output is append-mode alert rows — one per threshold crossing — which
a downstream ``foreachBatch`` can feed into ``Repository.compact`` (or
any hook), mirroring the reference's callback.

Scale: state is one counter per branch (bytes, not rows); the only
shuffle is the groupBy(branch) of each microbatch's changes. Skew on a
hot branch is bounded by microbatch size, not stream history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_SCHEMA = "branch string, tombstones long, threshold long, crossings long"
_STATE_SCHEMA = "cnt long"

#: Recommended staged-row count at which to fire auto-compaction,
#: justified by measurement (tools/loadtest.py --mode staging-scale,
#: local[32], 2026-08-15): the staging-layer materializers stay
#: interactive through 1e6 staged rows (uncommitted diff 8.8 s,
#: list page 1.8 s, prefix reset 1.2 s) but degrade linearly past it
#: (at 1e7: 45.9 s / 4.2 s / 5.1 s). Compact around 1e6 so no branch
#: read ever pays the 1e7-row overlay.
DEFAULT_COMPACTION_THRESHOLD_ROWS = 1_000_000


def tombstone_alerts(changes: DataFrame, threshold: int) -> DataFrame:
    """Alert stream for a staged-change stream.

    ``changes`` needs columns ``branch`` (string) and ``is_tombstone``
    (boolean). Emits one row per branch each time its *cumulative*
    tombstone count crosses ``threshold`` (counter keeps running, so a
    branch alerts again after every further ``threshold`` tombstones —
    the repeated-trigger behavior of the reference's sensor between
    compactions).
    """
    if threshold <= 0:
        # fail at plan-build time, not as a ZeroDivisionError inside the
        # stateful UDF on the first microbatch
        raise ValueError(f"threshold must be positive, got {threshold}")

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (branch,) = key
        prev = state.get[0] if state.exists else 0
        new = prev
        for pdf in pdfs:
            new += int(pdf["is_tombstone"].fillna(False).astype(bool).sum())
        state.update((new,))
        if new // threshold > prev // threshold:
            # crossings = multiples of the threshold passed this batch;
            # sum(crossings) over the alert stream is floor(total/th),
            # invariant to how rows were batched — the contract the
            # driver oracle checks
            yield pd.DataFrame(
                {
                    "branch": [branch],
                    "tombstones": [new],
                    "threshold": [threshold],
                    "crossings": [new // threshold - prev // threshold],
                }
            )

    return changes.groupBy("branch").applyInPandasWithState(
        _update,
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def first_seen_hashes(changes: DataFrame, hash_col: str = "fp") -> DataFrame:
    """Streaming exact-dedup: emit each content hash the first time it
    is seen across the whole stream; later occurrences (any batch) are
    swallowed by the per-hash state.

    The dedup-on-ingest pattern for a training pipeline: the emitted
    stream is the deduplicated corpus feed. State per distinct hash is
    one counter (bytes); the emitted SET is batch-order-invariant —
    exactly the distinct hashes — which is what the driver oracle
    checks.
    """

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (fp,) = key
        seen = state.get[0] if state.exists else 0
        n = seen
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        if seen == 0 and n > 0:
            yield pd.DataFrame({"fp": [fp]})

    return changes.groupBy(hash_col).applyInPandasWithState(
        _update,
        outputStructType="fp string",
        stateStructType="cnt long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
