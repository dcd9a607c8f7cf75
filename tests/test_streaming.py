"""Structured-Streaming ingestion: commit-per-microbatch, exactly-once
replay skip, watermarked windowed aggregation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakefs_spark.storage.repo import Repository
from lakefs_spark.streaming.ingest import (
    entries_from_events,
    foreach_batch_committer,
    last_applied_batch,
    windowed_event_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def repo(spark, tmp_path):
    r = Repository.create(spark, str(tmp_path / "repo"))
    r.raggedness = 97
    return r


def _events(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def _run_stream(spark, repo, src_dir, ckpt, schema):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_committer(repo, "main", entries_from_events, query_name="ingest")
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_stream_commit_per_batch(repo, spark, tmp_path):
    events = _events(spark).where(F.col("event_id") < 300)
    src = str(tmp_path / "stream_src")
    # three files -> three microbatches (maxFilesPerTrigger=1)
    for i in range(3):
        events.where(F.col("event_id") % 3 == i).coalesce(1).write.mode("append").parquet(src)
    schema = events.schema

    ckpt = str(tmp_path / "ckpt")
    _run_stream(spark, repo, src, ckpt, schema)

    assert last_applied_batch(repo, "main", "ingest") >= 2
    log = repo.log("main")
    assert len(log) == 3
    assert all(c.metadata.get("stream.query") == "ingest" for c in log)
    snap = repo.snapshot("main")
    assert snap.count() == events.count()
    # keys are date-partitioned and globally sorted in the snapshot
    assert snap.where(~F.col("key").startswith("events/date=")).count() == 0

    # replay: same checkpoint, no new input -> no new commits
    _run_stream(spark, repo, src, ckpt, schema)
    assert len(repo.log("main")) == 3

    # fresh checkpoint replays batches 0..2 -> epoch guard skips them all
    _run_stream(spark, repo, src, str(tmp_path / "ckpt2"), schema)
    assert len(repo.log("main")) == 3


def test_windowed_event_counts_streaming_matches_batch(spark, tmp_path):
    events = _events(spark).where(F.col("event_id") < 500)
    src = str(tmp_path / "wsrc")
    events.coalesce(2).write.mode("overwrite").parquet(src)

    static = windowed_event_counts(events).orderBy("window_start", "event_type")
    expected = [tuple(r) for r in static.collect()]

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = [
        tuple(r)
        for r in spark.table("win_counts").orderBy("window_start", "event_type").collect()
    ]
    assert got == expected


def test_tombstone_alert_sensor_stateful(spark, tmp_path):
    """applyInPandasWithState sensor: cumulative per-branch counts
    survive microbatches; alerts fire exactly on threshold crossings."""
    from lakefs_spark.streaming.sensors import tombstone_alerts

    src = str(tmp_path / "ssrc")
    schema = "branch string, key string, is_tombstone boolean"

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    # batch 1: main=3 tombstones (below 5), dev=5 (crosses)
    drop(
        [("main", f"k{i}", True) for i in range(3)]
        + [("main", "ka", False)]
        + [("dev", f"d{i}", True) for i in range(5)]
    )

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    alerts = tombstone_alerts(stream, threshold=5)
    out = str(tmp_path / "alerts_out")

    def run():
        q = (
            alerts.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "sckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    def alerts_set():
        from lakefs_spark.streaming.sensors import ALERT_SCHEMA

        df = spark.read.schema(ALERT_SCHEMA).parquet(out)
        return {(r["branch"], r["tombstones"]) for r in df.collect()}

    run()
    assert alerts_set() == {("dev", 5)}

    # batch 2: main +2 => 5, crosses; dev +3 => 8, no new crossing
    drop(
        [("main", f"k2{i}", True) for i in range(2)]
        + [("dev", f"d2{i}", True) for i in range(3)]
    )
    run()
    assert alerts_set() == {("dev", 5), ("main", 5)}

    # batch 3: dev +2 => 10, second crossing fires again
    drop([("dev", f"d3{i}", True) for i in range(2)])
    run()
    assert alerts_set() == {("dev", 5), ("main", 5), ("dev", 10)}


def test_session_event_stats_streaming_matches_batch(spark, tmp_path):
    from lakefs_spark.streaming.ingest import session_event_stats

    events = _events(spark).where(F.col("event_id") < 500)
    src = str(tmp_path / "ssrc")
    events.coalesce(2).write.mode("overwrite").parquet(src)

    static = session_event_stats(events).orderBy("user_id", "session_start")
    expected = [tuple(r) for r in static.collect()]
    assert expected, "fixture produced no sessions"

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = session_event_stats(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_stats")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = [
        tuple(r)
        for r in spark.table("sess_stats").orderBy("user_id", "session_start").collect()
    ]
    assert got == expected


def test_late_data_dropped_behind_watermark(spark, tmp_path):
    """The streaming-only late-data contract (batch replay cannot show
    it): with an event-time watermark, a window is finalized once the
    watermark passes its end, and a row arriving after that is DROPPED
    — it must not reopen or re-emit the finalized window. Four files
    replayed one per microbatch (mtime-ordered): on-time rows, a
    watermark-advancing row, a buffer batch (the wm used by batch N is
    derived from data through batch N-1), then a late row into the
    closed window."""
    import datetime as dt
    import glob
    import shutil

    from lakefs_spark.streaming.ingest import windowed_event_counts

    def t(minute):
        return dt.datetime(2026, 1, 1, 10, minute)

    src = tmp_path / "late_src"
    src.mkdir()
    batches = [
        ("f1", [(t(1), "a", 1.0), (t(4), "a", 1.0)]),   # window 10:00-10:10
        ("f2", [(t(50), "a", 1.0)]),                     # max event -> 10:50
        # the wm used by batch N is derived from data through batch N-1,
        # so one buffer batch is needed before the wm=10:40 cutoff is in
        # force for arriving rows
        ("f3", [(t(52), "a", 1.0)]),
        ("f4", [(t(2), "a", 99.0), (t(59), "a", 1.0)]),  # late row: dropped
    ]
    for i, (name, rows) in enumerate(batches):
        stage = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(
            rows, "ts timestamp, event_type string, value double"
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = str(src / f"{name}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = windowed_event_counts(stream, window="10 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_win")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {
        (r["window_start"].minute, r["n_events"], r["total_value"])
        for r in spark.table("late_win").collect()
    }
    # the 10:00 window closed with exactly the 2 on-time rows; the late
    # 10:02 row (value 99) is absent everywhere
    assert (0, 2, 2.0) in rows, rows
    assert not any(v == 99.0 or v == 101.0 for _, _, v in rows), rows


def test_session_stream_merges_islands_out_of_order(spark, tmp_path):
    """The interval-state sessionizer (streaming/sessions.py) must
    reproduce batch gaps-and-islands sessions under adversarial batch
    order: a bridging event arrives in a LATER microbatch and must
    fuse two already-recorded sessions into one."""
    from lakefs_spark.streaming.sessions import latest_sessions, session_stats_stream

    M = 1_000_000
    gap = 1_800_000_000  # 30 min in us
    # user 7: events at t=0s and t=3000s (two sessions: 3000s >= 1800s
    # apart), then a bridge at t=1500s arrives in the LAST batch ->
    # one merged session [0, 3000].
    # user 8: single event; exactly-gap pair stays two sessions.
    batches = [
        [(7, 0 * M, 1.0), (8, 50 * M, 5.0)],
        [(7, 3000 * M, 2.0), (8, 50 * M + gap, 6.0)],  # exactly gap apart
        [(7, 1500 * M, 4.0)],
    ]
    src = tmp_path / "sess_src"
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "user_id long, ts_us long, value double"
        ).coalesce(1).write.mode("append").parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q = (
        session_stats_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_test")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    final = {
        (r["user_id"], r["session_start_s"], r["session_end_s"], r["n_events"], r["total_value"])
        for r in latest_sessions(spark.table("sess_test")).collect()
    }
    assert final == {
        (7, 0, 3000 + 1800, 3, 7.0),        # bridged into ONE session
        (8, 50, 50 + 1800, 1, 5.0),         # exactly-gap pair: two sessions
        (8, 50 + 1800, 50 + 3600, 1, 6.0),
    }, final


def test_commit_batch_epoch_merge_no_clobber(spark, tmp_path):
    """Review regression: two streaming queries on one branch — a
    query's commit must not regress the OTHER query's epoch (the epoch
    map deep-merges at CAS time instead of being written wholesale
    from a pre-commit snapshot)."""
    from lakefs_spark.storage.repo import Repository
    from lakefs_spark.streaming.ingest import commit_batch, last_applied_batch

    repo = Repository.create(spark, str(tmp_path / "epochrepo"))

    def ent(key, ident):
        return spark.createDataFrame(
            [(key, ident, None, "RELATIVE", 1, "e", None, None, None)],
            "key string, identity string, address string, address_type string, "
            "size long, etag string, last_modified timestamp, "
            "metadata map<string,string>, content_type string",
        )

    assert commit_batch(repo, "main", ent("a/1", "i1"), 4, query_name="q1")
    assert commit_batch(repo, "main", ent("b/1", "j1"), 8, query_name="q2")
    # q1 commits again: its epoch map contribution must merge, not
    # overwrite the branch's {q2: 8}
    assert commit_batch(repo, "main", ent("a/2", "i2"), 5, query_name="q1")
    assert last_applied_batch(repo, "main", "q1") == 5
    assert last_applied_batch(repo, "main", "q2") == 8
    # q2 replaying batch 8 must still skip
    assert not commit_batch(repo, "main", ent("b/1", "j1"), 8, query_name="q2")


def test_tombstone_alerts_threshold_guard(spark):
    import pytest as _pytest

    from lakefs_spark.streaming.sensors import tombstone_alerts

    df = spark.createDataFrame([("b", True)], "branch string, is_tombstone boolean")
    with _pytest.raises(ValueError, match="positive"):
        tombstone_alerts(df, threshold=0)
