"""Structured-Streaming ingestion: one repository commit per microbatch.

The reference has no stream processing — its event-driven surface is
the hooks/actions system (SURVEY.md §2.10). This module is the
Spark-native extension the reference's architecture points at:
``readStream → foreachBatch → stage + commit``, so every microbatch
becomes an atomic, versioned, diffable commit on a branch
(the "commit-per-batch" shape; cf. Delta Lake's streaming sink
transaction log in PAPERS.md).

Exactly-once: Spark replays a microbatch after failure with the SAME
``batch_id``. We record the last applied batch id in the branch
pointer and skip replays — the pointer swap is the same CAS that
guards regular commits, so the epoch check and head update are one
atomic file replace. That is precisely the Delta/lakeFS idempotent-
sink pattern (txn version per application).

Scale: each microbatch's stage+commit is a bounded COW apply
(O(changed ranges)); the stream's long-run cost is a function of churn,
not snapshot size. Watermarked windowed aggregation (below) keeps
state bounded for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakefs_spark.storage.repo import Repository


def last_applied_batch(repo: Repository, branch: str, query_name: str) -> int:
    st = repo._read_branch(branch)
    return int(st.get("stream_epochs", {}).get(query_name, -1))


def commit_batch(
    repo: Repository,
    branch: str,
    entries: DataFrame,
    batch_id: int,
    query_name: str = "stream",
    committer: str = "stream",
) -> bool:
    """Stage + commit one microbatch; returns False on replay skip.

    ``entries`` must be entry-schema rows (use ``entries_from_events``
    or similar to map domain rows to objects).
    """
    from lakefs_spark.storage.commit_apply import NoChangesError

    if batch_id <= last_applied_batch(repo, branch, query_name):
        return False  # replayed microbatch — already committed
    repo.stage_entries(branch, entries)
    # ONLY this query's epoch: the branch CAS deep-merges dict-valued
    # fields over the CURRENT state, so a concurrent query's newer
    # epoch is never clobbered by our pre-commit snapshot (commit
    # retries recompute against the fresh head, and the merge happens
    # at CAS time either way)
    epochs = {query_name: batch_id}
    try:
        # the epoch rides the SAME atomic pointer CAS as the head swap
        # (pointer_extra): no window exists where the commit landed but
        # the epoch didn't — a crash either replays the whole batch
        # (pointer untouched) or skips it (pointer has both)
        repo.commit(
            branch,
            f"{query_name} batch {batch_id}",
            committer=committer,
            metadata={"stream.query": query_name, "stream.batch": str(batch_id)},
            pointer_extra={"stream_epochs": epochs},
        )
    except NoChangesError:
        # batch re-ingested already-committed content: advance the epoch
        # alone (no commit happened; a crash before this write just
        # replays a no-op batch, which converges the same way)
        repo.reset_branch(branch)
        from lakefs_spark.storage.store import CASConflictError

        for _ in range(16):  # conditional PUT, merged over current state
            st, ver = repo._get_branch(branch)
            merged = {**st.get("stream_epochs", {}), query_name: batch_id}
            try:
                repo.store.put_doc_if(
                    repo._branch_key(branch), {**st, "stream_epochs": merged}, ver
                )
                break
            except CASConflictError:
                continue
    return True


def foreach_batch_committer(
    repo: Repository,
    branch: str,
    to_entries,
    query_name: str = "stream",
):
    """``foreachBatch`` callback: ``writeStream.foreachBatch(this)``.

    ``to_entries(df) -> DataFrame`` maps the microbatch to entry rows.
    """

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        entries = to_entries(batch_df)
        commit_batch(repo, branch, entries, batch_id, query_name=query_name)

    return _fn


def entries_from_events(events: DataFrame, prefix: str = "events/") -> DataFrame:
    """Map event rows to entry-schema objects (one object per event).

    Key layout ``<prefix>date=<d>/<event_id>`` keeps the keyspace
    sorted by ingest day — commits touch a bounded set of trailing
    ranges instead of rewriting history (the append-mostly pattern).
    """
    # value rides through a fixed-scale decimal, not raw double->string:
    # float shortest-repr differs across engines (1e-4 vs 0.0001), and a
    # content identity must not depend on a printer's notation choice.
    # Fields are LENGTH-TAGGED (functions/ident framing): an untagged
    # null-skipping concat_ws collides ("a|b","c") with ("a","b|c") and
    # (x, NULL) with (NULL-printed x) — and a silent overflow-to-NULL
    # would give two different huge values the SAME identity, turning a
    # corrected re-ingest into a no-op commit (lost update)
    def _tag(c):
        v = F.coalesce(c.cast("string"), F.lit("\x00null"))
        return F.concat(F.length(v).cast("string"), F.lit(":"), v)

    ident = F.md5(
        F.concat(
            _tag(F.col("event_id")),
            _tag(F.col("event_type")),
            _tag(F.col("value").cast("decimal(30,6)")),
        )
    )
    return events.select(
        F.concat(
            F.lit(prefix),
            F.lit("date="), F.date_format("ts", "yyyy-MM-dd"), F.lit("/"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("key"),
        ident.alias("identity"),
        F.concat(F.lit("data/events/"), F.md5(F.col("event_id").cast("string"))).alias("address"),
        F.lit("RELATIVE").alias("address_type"),
        F.octet_length(F.coalesce(F.col("props"), F.lit(""))).cast("long").alias("size"),
        F.md5(F.concat(_tag(F.col("event_id")), _tag(F.col("props")))).alias("etag"),
        F.col("ts").alias("last_modified"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.lit("application/json").alias("content_type"),
    )


def event_time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Hypertable-style multi-granularity rollup (day ⊃ hour) in ONE
    aggregation pass via ROLLUP grouping sets — Catalyst expands the
    sets map-side, so the N-granularity rollup costs one shuffle, not
    N scans. ``grain`` labels each output row ('day' rows have hour
    null), the continuous-aggregate shape time-series stores maintain.
    """
    df = events
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    day = F.date_format(ts_col, "yyyy-MM-dd").alias("day")
    hour = F.date_format(ts_col, "HH").alias("hour")
    return (
        df.rollup(day, hour)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .where(F.col("day").isNotNull())  # drop the grand-total row
        .select(
            "day",
            "hour",
            F.when(F.col("hour").isNull(), F.lit("day")).otherwise(F.lit("hour")).alias("grain"),
            "n_events",
            "total_value",
        )
    )


def session_event_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session-window per-user stats: events closer than ``gap`` merge
    into one session; ``session_end = last event + gap`` (Spark
    session-window semantics). Works identically on a stream (state
    closes when the watermark passes a session's gap) and a batch
    (equivalent to the gaps-and-islands SQL the oracle uses).
    """
    df = events
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark(ts_col, gap)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding/hopping) per-type counts
    with a late-data watermark: each event lands in window_size/slide
    overlapping windows.

    Works on both a streaming DataFrame (state is dropped once the
    watermark passes a window) and a static one (watermark is a no-op)
    — the standard Structured Streaming windowed-agg shape.
    """
    df = events
    # naive parquet micros arrive as TIMESTAMP_NTZ, which watermarks
    # reject (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — normalize to
    # TIMESTAMP (callers pin session TZ to UTC, so the instant is stable)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            (
                F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
            ).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
