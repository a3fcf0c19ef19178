"""Streaming windowed aggregation (watermark) + stateful dedup
(applyInPandasWithState): micro-batch semantics pinned with file-source
streams processed one file per trigger."""

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from text_search_spark.streaming.windows import (
    dedup_stream,
    dedup_stream_epoch,
    windowed_event_stats,
)

SF_DIR = "/root/testdata/sf0.001"


def _run_stream(spark, stream_df, out_table, checkpoint):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(out_table)


def test_windowed_stats_stream_equals_batch(spark, tmp_path):
    """Single-pass stream (no late data) must equal the batch windowed
    aggregate exactly."""
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    batch = windowed_event_stats(events).orderBy("window_start").collect()

    # the file stream source wants a DIRECTORY; stage the single file
    import shutil

    src = str(tmp_path / "events_src")
    os.makedirs(src)
    shutil.copy(
        os.path.join(SF_DIR, "events.parquet"),
        os.path.join(src, "events.parquet"),
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    got = (
        _run_stream(
            spark,
            windowed_event_stats(stream),
            "win_stats",
            str(tmp_path / "ck"),
        )
        .orderBy("window_start")
        .collect()
    )
    # append mode only emits FINALIZED windows (window end < final
    # watermark = max event time - 2h); those must match the batch
    # aggregate value-for-value, and nothing else may be emitted
    import datetime as dt

    max_ts = events.agg(F.max("ts")).first()[0]
    horizon = max_ts - dt.timedelta(hours=2)
    finalized = [
        tuple(r)
        for r in batch
        if r.window_start + dt.timedelta(hours=1) < horizon
    ]
    assert len(got) >= 1
    assert set(tuple(r) for r in got) <= set(tuple(r) for r in batch)
    assert set(finalized) <= set(tuple(r) for r in got)


def test_windowed_stats_finalized_window_drops_late_rows(spark, tmp_path):
    """Spark's watermark guarantee (pinned empirically): once a window is
    finalized (emitted + state evicted because the watermark passed its
    end), a later very-late row for that window is DROPPED — the window
    appears exactly once, with only its pre-finalization rows. (Late rows
    arriving BEFORE finalization may still be merged — Spark documents
    late-data dropping as one-directional / best-effort, so the test
    drives the watermark forward one extra batch before the late row.)"""
    src = str(tmp_path / "src")
    os.makedirs(src)

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts_s string, value double"
        ).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
        )

    mk(
        [(1, "2024-01-01 05:30:00", 1.0), (2, "2024-01-01 12:30:00", 2.0)]
    ).coalesce(1).write.parquet(os.path.join(src, "b1"))
    time.sleep(1.1)  # file mtime order = processing order
    # advances the watermark to 11:30 -> the 05:00 window finalizes
    mk([(3, "2024-01-01 13:30:00", 3.0)]).coalesce(1).write.parquet(
        os.path.join(src, "b2")
    )
    time.sleep(1.1)
    # very late row for the finalized window + a fresh row
    mk(
        [(4, "2024-01-01 05:45:00", 100.0), (5, "2024-01-01 14:00:00", 4.0)]
    ).coalesce(1).write.parquet(os.path.join(src, "b3"))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "*"))
    )
    got = _run_stream(
        spark,
        windowed_event_stats(stream, window="1 hour", watermark="2 hours"),
        "late_stats",
        str(tmp_path / "ck2"),
    ).collect()
    early = [r for r in got if str(r.window_start) == "2024-01-01 05:00:00"]
    # exactly one emission, containing only the pre-finalization row —
    # the 100.0 late row neither merged nor re-emitted the window
    assert [(r.n_events, r.sum_value) for r in early] == [(1, 1.0)]


def test_dedup_stream_drops_cross_batch_redeliveries(spark, tmp_path):
    src = str(tmp_path / "docs")
    os.makedirs(src)
    b1 = spark.createDataFrame(
        [(1, "u1", "a"), (2, "u2", "b"), (2, "u2", "b")],
        "doc_id long, url string, text string",
    )
    b2 = spark.createDataFrame(
        [(2, "u2", "b"), (3, "u3", "c"), (1, "u1", "a"), (4, "u4", "d")],
        "doc_id long, url string, text string",
    )
    b1.coalesce(1).write.parquet(os.path.join(src, "b1"))
    time.sleep(1.1)
    b2.coalesce(1).write.parquet(os.path.join(src, "b2"))

    stream = (
        spark.readStream.schema("doc_id long, url string, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    got = _run_stream(
        spark, dedup_stream(stream), "deduped", str(tmp_path / "ck3")
    )
    ids = sorted(r.doc_id for r in got.collect())
    assert ids == [1, 2, 3, 4]  # each id exactly once across batches


def test_dedup_stream_epoch_bounded_state(spark, tmp_path):
    """The bounded-state variant: (1) re-deliveries inside an epoch are
    dropped, (2) the same id in a LATER epoch is re-admitted, (3) state
    for epochs behind the watermark's retention horizon is EVICTED — the
    state-store row count at the end covers only live epochs, not the
    stream's whole history."""
    src = str(tmp_path / "docs_ep")
    os.makedirs(src)

    def mk(rows):
        return spark.createDataFrame(
            rows, "doc_id long, url string, text string, ts_s string"
        ).select(
            "doc_id", "url", "text",
            F.col("ts_s").cast("timestamp").alias("ts"),
        )

    mk(
        [
            (1, "u1", "a", "2024-01-01 06:00:00"),
            (2, "u2", "b", "2024-01-01 06:10:00"),
            (2, "u2", "b", "2024-01-01 06:20:00"),  # in-batch dup
        ]
    ).coalesce(1).write.parquet(os.path.join(src, "b1"))
    time.sleep(1.1)
    mk(
        [
            (2, "u2", "b", "2024-01-01 07:00:00"),  # same-epoch redelivery
            (2, "u2b", "b2", "2024-01-02 06:00:00"),  # next epoch: readmit
            (5, "u5", "e", "2024-01-02 06:30:00"),
        ]
    ).coalesce(1).write.parquet(os.path.join(src, "b2"))
    time.sleep(1.1)
    # jump the event clock far ahead: watermark passes day-1 AND day-2
    # retention horizons (epoch + 2 days at ttl_units=1)
    mk([(9, "u9", "i", "2024-01-06 12:00:00")]).coalesce(1).write.parquet(
        os.path.join(src, "b3")
    )
    time.sleep(1.1)
    # one more batch so the advanced watermark actually fires timeouts
    mk([(10, "u10", "j", "2024-01-06 13:00:00")]).coalesce(1).write.parquet(
        os.path.join(src, "b4")
    )

    stream = (
        spark.readStream.schema(
            "doc_id long, url string, text string, ts timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    q = (
        dedup_stream_epoch(stream, n_buckets=4)
        .writeStream.format("memory")
        .queryName("deduped_ep")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ep"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("deduped_ep").collect()
    emitted = sorted((r.doc_id, str(r.epoch)) for r in rows)
    assert emitted == [
        (1, "2024-01-01 00:00:00"),
        (2, "2024-01-01 00:00:00"),  # once, despite 3 deliveries in epoch
        (2, "2024-01-02 00:00:00"),  # re-admitted across the boundary
        (5, "2024-01-02 00:00:00"),
        (9, "2024-01-06 00:00:00"),
        (10, "2024-01-06 00:00:00"),
    ]
    # eviction: remaining state rows = live (epoch, bucket) groups only.
    # Day-1 held {1, 2} (2 buckets) and day-2 held {2, 5} (2 buckets);
    # both epochs are behind the final watermark's horizon, so without
    # eviction the store would keep >= 6 rows — with it, only day-6's
    # groups for ids {9, 10} remain.
    progress = q.lastProgress
    n_state = progress["stateOperators"][0]["numRowsTotal"]
    assert n_state == 2, progress["stateOperators"][0]


def test_latest_snapshot_stream_emits_upserts(spark, tmp_path):
    """Streaming crawl refetch dedup: emit an upsert when a url's
    newest-snapshot winner changes; drop older/duplicate refetches in
    any later micro-batch; collapse within-batch churn to one
    candidate per url."""
    from text_search_spark.streaming.windows import latest_snapshot_stream

    src = str(tmp_path / "pages")
    os.makedirs(src)

    def mk(rows):
        return spark.createDataFrame(
            rows, "url string, ts_s string, fetch_id long, text string"
        ).select(
            "url",
            F.col("ts_s").cast("timestamp").alias("warc_ts"),
            "fetch_id",
            "text",
        )

    mk(
        [
            ("u/a", "2024-01-01 00:00:10", 1, "a v1"),
            ("u/b", "2024-01-01 00:00:40", 4, "b v1"),
        ]
    ).coalesce(1).write.parquet(os.path.join(src, "b1"))
    time.sleep(1.1)
    mk(
        [
            # newer than state ts=10 -> upsert (the in-batch older
            # ts=20 row collapses away first)
            ("u/a", "2024-01-01 00:00:30", 3, "a v3"),
            ("u/a", "2024-01-01 00:00:20", 2, "a v2"),
            # equal ts, LOWER fetch_id than state -> dropped
            ("u/b", "2024-01-01 00:00:40", 3, "b stale"),
            # first sighting -> upsert
            ("u/c", "2024-01-01 00:00:05", 9, "c v1"),
        ]
    ).coalesce(1).write.parquet(os.path.join(src, "b2"))
    time.sleep(1.1)
    mk(
        [
            # null ts loses to the real state ts -> dropped
            ("u/a", None, 99, "a null-ts"),
            # null url has no upsert identity -> dropped
            (None, "2024-01-01 00:00:50", 7, "null-url"),
            # first sighting with only a null ts still emits
            ("u/d", None, 5, "d only-null"),
        ]
    ).coalesce(1).write.parquet(os.path.join(src, "b3"))

    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, fetch_id long, text string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    got = _run_stream(
        spark,
        latest_snapshot_stream(stream),
        "snap_upserts",
        str(tmp_path / "ck_snap"),
    )
    rows = sorted(
        ((r.url, r.fetch_id, r.text) for r in got.collect()),
    )
    assert rows == [
        ("u/a", 1, "a v1"),
        ("u/a", 3, "a v3"),
        ("u/b", 4, "b v1"),
        ("u/c", 9, "c v1"),
        ("u/d", 5, "d only-null"),
    ]
    # last upsert per url == the batch operator's winners (null-url
    # rows excluded: the stream documents dropping them)
    from text_search_spark.operators.webtext import latest_snapshot

    all_pages = spark.read.parquet(os.path.join(src, "*")).where(
        F.col("url").isNotNull()
    )
    batch = {
        r.url: (r.fetch_id, r.text)
        for r in latest_snapshot(
            all_pages, ts_col="warc_ts", tiebreak_col="fetch_id"
        ).collect()
    }
    stream_last = {}
    for r in got.orderBy("warc_ts", "fetch_id").collect():
        stream_last[r.url] = (r.fetch_id, r.text)
    assert stream_last == batch


def test_latest_snapshot_stream_epoch_bounded_state(spark, tmp_path):
    """Bounded-epoch refetch dedup (ADVICE r04 item 2 — the variant the
    old docstring promised): (1) within an epoch, a url collapses to
    its newest (warc_ts, fetch_id) winner with upserts emitted only on
    change; (2) the same url in a LATER epoch starts fresh (its own
    winner, own upsert); (3) state behind the watermark horizon is
    evicted; (4) null-url and null-ts rows are dropped."""
    src = str(tmp_path / "snap_ep")
    os.makedirs(src)

    def mk(rows):
        return spark.createDataFrame(
            rows, "url string, ts_s string, fetch_id long, text string"
        ).select(
            "url",
            F.col("ts_s").cast("timestamp").alias("warc_ts"),
            "fetch_id",
            "text",
        )

    mk(
        [
            ("u1", "2024-01-01 06:00:00", 1, "v1"),
            ("u1", "2024-01-01 07:00:00", 2, "v2"),  # same-batch newer
            (None, "2024-01-01 06:00:00", 3, "null-url"),
            ("u9", None, 4, "null-ts"),
        ]
    ).coalesce(1).write.parquet(os.path.join(src, "b1"))
    time.sleep(1.1)
    mk(
        [
            ("u1", "2024-01-01 05:00:00", 5, "old"),    # older: no upsert
            ("u1", "2024-01-01 08:00:00", 6, "v3"),     # newer: upsert
            ("u1", "2024-01-02 06:00:00", 7, "day2"),   # next epoch: fresh
        ]
    ).coalesce(1).write.parquet(os.path.join(src, "b2"))
    time.sleep(1.1)
    # jump event time past both epochs' retention horizons, then one
    # more batch so the advanced watermark fires the timeouts
    mk([("u8", "2024-01-06 12:00:00", 8, "f8")]).coalesce(1).write.parquet(
        os.path.join(src, "b3")
    )
    time.sleep(1.1)
    mk([("u9", "2024-01-06 13:00:00", 9, "f9")]).coalesce(1).write.parquet(
        os.path.join(src, "b4")
    )

    from text_search_spark.streaming.windows import latest_snapshot_stream_epoch

    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, fetch_id long, text string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    q = (
        latest_snapshot_stream_epoch(stream, n_buckets=4)
        .writeStream.format("memory")
        .queryName("snap_ep")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_snap_ep"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("snap_ep").collect()
    emitted = sorted(
        (r.url, str(r.epoch), r.fetch_id, r.text) for r in rows
    )
    assert emitted == [
        ("u1", "2024-01-01 00:00:00", 2, "v2"),   # batch-collapsed winner
        ("u1", "2024-01-01 00:00:00", 6, "v3"),   # upsert on newer fetch
        ("u1", "2024-01-02 00:00:00", 7, "day2"),  # fresh per epoch
        ("u8", "2024-01-06 00:00:00", 8, "f8"),
        ("u9", "2024-01-06 00:00:00", 9, "f9"),
    ]
    # eviction: day-1 and day-2 groups are behind the watermark horizon;
    # only day-6's (epoch, bucket) groups for u8/u9 remain
    n_state = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    assert n_state == 2, q.lastProgress["stateOperators"][0]
