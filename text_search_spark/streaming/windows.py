"""Structured-Streaming operators beyond the incremental index: a
watermarked windowed aggregation (late-data tolerance) and a custom
stateful operator (applyInPandasWithState cross-batch dedup).

The reference pipeline is batch (SURVEY.md §2.8) — these are the
streaming shapes a production ingest of the same data would need:
new pages/events arrive continuously, aggregates must tolerate
late/out-of-order event times, and re-deliveries must be dropped
exactly once across micro-batches.

Scale notes:
  * The windowed agg is a plain `groupBy(window(...))` — Spark keeps
    per-window partial state in its state store, sized by (windows
    within watermark x grouping keys), NOT by row volume; the watermark
    bounds state eviction.
  * The stateful dedup groups by a BUCKET of the id space (pmod), not by
    the id itself: state rows = n_buckets, each holding that bucket's
    seen-id set — at 10^12 ids the per-bucket set is the thing to size
    (n_buckets is a parameter), and lookups inside a bucket are a numpy
    isin, not per-row Python.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling-window aggregate over an event stream (or a
    batch frame — the expression is identical, which is how the entry's
    DuckDB oracle checks it): (window_start, n_events, sum_value).

    On a STREAMING input, rows later than `watermark` behind the max
    observed event time are dropped and their windows finalized —
    windows emit exactly once in append mode."""
    # event-time must be TIMESTAMP (LTZ) for watermarking; parquet written
    # from pandas is TIMESTAMP_NTZ — cast is a no-op re-interpretation
    # under the engine's fixed UTC session timezone
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


_DEDUP_STATE_SCHEMA = "seen array<long>"
_DEDUP_OUT_SCHEMA = "doc_id long, url string, text string"


def _sorted_member_mask(seen, ids):
    """Membership of `ids` in the SORTED int64 array `seen` via
    searchsorted — O(B log S), no hashing of the whole state."""
    import numpy as np

    if not seen.size:
        return np.zeros(ids.shape, dtype=bool)
    idx = np.searchsorted(seen, ids)
    idx[idx == seen.size] = seen.size - 1
    return seen[idx] == ids


def _sorted_merge_insert(seen, new_sorted):
    """One sorted-merge pass inserting `new_sorted` into sorted `seen`
    — no full re-sort of the whole set (np.union1d re-sorts S+B every
    batch: O((S+B) log (S+B)) growing with stream lifetime)."""
    import numpy as np

    merged = np.empty(seen.size + new_sorted.size, dtype=seen.dtype)
    pos = np.searchsorted(seen, new_sorted)
    mask = np.ones(merged.size, dtype=bool)
    mask[pos + np.arange(new_sorted.size)] = False
    merged[~mask] = new_sorted
    merged[mask] = seen
    return merged


def _dedup_fn(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    # `seen` is kept SORTED in the state store (shared helpers above);
    # when a batch brings nothing new, the state is NOT rewritten at all
    seen = (
        np.asarray(state.get[0], dtype=np.int64)
        if state.exists
        else np.empty(0, dtype=np.int64)
    )
    out = []
    dirty = False
    for pdf in pdfs:
        dup = _sorted_member_mask(seen, pdf["doc_id"].to_numpy())
        fresh = pdf[~dup]
        # also drop duplicates WITHIN the batch (first occurrence wins)
        fresh = fresh.drop_duplicates(subset=["doc_id"], keep="first")
        if len(fresh):
            out.append(fresh)
            new_ids = np.sort(fresh["doc_id"].to_numpy().astype(np.int64))
            seen = _sorted_merge_insert(seen, new_ids)
            dirty = True
    if dirty:
        state.update((seen.tolist(),))
    for pdf in out:
        yield pdf[["doc_id", "url", "text"]]


def dedup_stream(
    docs: DataFrame,
    n_buckets: int = 64,
) -> DataFrame:
    """Cross-batch exactly-once doc_id dedup for a streaming source:
    re-delivered or repeated doc_ids are dropped in every later
    micro-batch (applyInPandasWithState; state = per-bucket sorted id
    array). Input/output: (doc_id long, url string, text string).

    State growth: the per-bucket seen-set grows with distinct ids for the
    stream's lifetime (exact dedup needs it); NoTimeout is deliberate —
    evicting a bucket would re-admit its ids. For bounded-state
    deployments use dedup_stream_epoch (exact within an event-time
    epoch, state evicted when the watermark passes the epoch), or accept
    approximate dedup via a bloom/cuckoo state — not implemented here."""
    return (
        docs.withColumn(
            "bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int")
        )
        .groupBy("bucket")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=_DEDUP_OUT_SCHEMA,
            stateStructType=_DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_EPOCH_OUT_SCHEMA = (
    "doc_id long, url string, text string, epoch timestamp"
)

_EPOCH_UNIT_MS = {"hour": 3_600_000, "day": 86_400_000}


def _make_dedup_epoch_fn(unit_ms: int, ttl_units: int):
    """Driver-side factory: unit_ms/ttl ride the UDF closure (worker
    processes re-import the module, so config must not live in globals
    that tests monkeypatch)."""

    def fn(
        key,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.hasTimedOut:
            # the watermark passed this (epoch, bucket)'s retention
            # horizon — drop the whole seen-set. Anything for this epoch
            # arriving later is either filtered by the watermark or
            # (worst case) re-admitted once; state is what's bounded.
            state.remove()
            yield from ()
            return
        epoch_ts, _bucket = key
        seen = (
            np.asarray(state.get[0], dtype=np.int64)
            if state.exists
            else np.empty(0, dtype=np.int64)
        )
        out = []
        dirty = False
        for pdf in pdfs:
            dup = _sorted_member_mask(seen, pdf["doc_id"].to_numpy())
            fresh = pdf[~dup]
            fresh = fresh.drop_duplicates(subset=["doc_id"], keep="first")
            if len(fresh):
                out.append(fresh)
                new_ids = np.sort(
                    fresh["doc_id"].to_numpy().astype(np.int64)
                )
                seen = _sorted_merge_insert(seen, new_ids)
                dirty = True
        if dirty:
            state.update((seen.tolist(),))
        # retention horizon: epoch start + (1 + ttl) units — the epoch's
        # own span plus ttl units of watermark grace
        epoch_ms = int(pd.Timestamp(epoch_ts).value // 1_000_000)
        state.setTimeoutTimestamp(epoch_ms + (1 + ttl_units) * unit_ms)
        for pdf in out:
            yield pdf[["doc_id", "url", "text", "epoch"]]

    return fn


_SNAP_STATE_SCHEMA = (
    "urls array<string>, ts_ns array<long>, tie array<long>"
)
_SNAP_OUT_SCHEMA = (
    "url string, warc_ts timestamp, fetch_id long, text string"
)
_SNAP_EPOCH_OUT_SCHEMA = _SNAP_OUT_SCHEMA + ", epoch timestamp"


def _make_snapshot_fn(unit_ms: Optional[int] = None, ttl_units: int = 0):
    """Factory for the snapshot-winner state function. unit_ms=None:
    the unbounded per-url-bucket form (NoTimeout). unit_ms set: the
    epoch-scoped bounded form — key is (epoch, bucket), the output
    carries the epoch column, and state is evicted by event-time
    timeout at epoch start + (1+ttl_units) units (the
    dedup_stream_epoch retention recipe)."""

    def fn(
        key,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        out_cols = ["url", "warc_ts", "fetch_id", "text"]
        if unit_ms is not None:
            if state.hasTimedOut:
                # watermark passed this (epoch, bucket)'s horizon —
                # drop the whole winner set; a straggler snapshot for
                # the epoch is watermark-filtered (or worst case
                # re-emitted once) — state is what's bounded
                state.remove()
                yield from ()
                return
            out_cols.append("epoch")
        # state = this bucket's current winners, three parallel arrays
        # kept SORTED by url so lookups are searchsorted, inserts one
        # sorted-merge pass, and a batch that changes nothing writes
        # nothing
        if state.exists:
            urls, ts_ns, tie = (
                np.asarray(state.get[0], dtype=object),
                np.asarray(state.get[1], dtype=np.int64),
                np.asarray(state.get[2], dtype=np.int64),
            )
        else:
            urls = np.empty(0, dtype=object)
            ts_ns = np.empty(0, dtype=np.int64)
            tie = np.empty(0, dtype=np.int64)
        dirty = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            # collapse WITHIN the batch first: keep each url's max
            # (warc_ts, fetch_id) row, so state sees one candidate per url.
            # na_position='first' makes a null warc_ts LOSE to any real
            # timestamp (pandas sorts NaT last by default — the opposite of
            # the batch operator's pinned null contract); NaT that still
            # wins (all-null url) becomes int64-min below and can never
            # beat a real state entry.
            pdf = (
                pdf.sort_values(
                    ["url", "warc_ts", "fetch_id"], na_position="first"
                )
                .groupby("url", sort=True)
                .tail(1)
                .reset_index(drop=True)
            )
            b_urls = pdf["url"].to_numpy(dtype=object)
            b_ts = (
                pdf["warc_ts"].astype("datetime64[ns]").to_numpy().astype(np.int64)
            )
            b_tie = pdf["fetch_id"].to_numpy(dtype=np.int64)
            if urls.size:
                idx = np.searchsorted(urls, b_urls)
                safe = np.minimum(idx, urls.size - 1)
                found = urls[safe] == b_urls
                fidx = safe[found]
                newer = (b_ts[found] > ts_ns[fidx]) | (
                    (b_ts[found] == ts_ns[fidx]) & (b_tie[found] > tie[fidx])
                )
            else:
                found = np.zeros(b_urls.shape, dtype=bool)
                newer = np.empty(0, dtype=bool)
            # existing urls beaten by a newer snapshot: update in place
            upd = fidx[newer] if urls.size else np.empty(0, dtype=np.int64)
            if upd.size:
                src = np.flatnonzero(found)[newer]
                ts_ns[upd] = b_ts[src]
                tie[upd] = b_tie[src]
                dirty = True
            # unseen urls: sorted-merge insert
            new_mask = ~found
            if new_mask.any():
                n_urls = b_urls[new_mask]
                pos = np.searchsorted(urls, n_urls)
                total = urls.size + n_urls.size
                keep = np.ones(total, dtype=bool)
                keep[pos + np.arange(n_urls.size)] = False
                m_urls = np.empty(total, dtype=object)
                m_ts = np.empty(total, dtype=np.int64)
                m_tie = np.empty(total, dtype=np.int64)
                m_urls[~keep] = n_urls
                m_ts[~keep] = b_ts[new_mask]
                m_tie[~keep] = b_tie[new_mask]
                m_urls[keep] = urls
                m_ts[keep] = ts_ns
                m_tie[keep] = tie
                urls, ts_ns, tie = m_urls, m_ts, m_tie
                dirty = True
            won = new_mask.copy()
            if urls.size and found.any():
                won[np.flatnonzero(found)[newer]] = True
            out = pdf[won]
            if len(out):
                yield out[out_cols]
        if dirty:
            state.update((urls.tolist(), ts_ns.tolist(), tie.tolist()))
        if unit_ms is not None:
            # retention horizon: epoch start + (1 + ttl) units — set on
            # EVERY invocation (clean batches included) so eviction
            # never depends on a state write
            epoch_ts, _bucket = key
            epoch_ms = int(pd.Timestamp(epoch_ts).value // 1_000_000)
            state.setTimeoutTimestamp(epoch_ms + (1 + ttl_units) * unit_ms)

    return fn


_snapshot_fn = _make_snapshot_fn()


def latest_snapshot_stream_epoch(
    pages: DataFrame,
    n_buckets: int = 64,
    ts_col: str = "warc_ts",
    epoch_unit: str = "day",
    watermark: str = "2 hours",
    ttl_units: int = 1,
) -> DataFrame:
    """BOUNDED-STATE refetch dedup: latest_snapshot_stream semantics
    WITHIN an event-time epoch (date_trunc(epoch_unit, warc_ts)) — one
    upsert stream per crawl window, state keyed by (epoch, bucket) and
    EVICTED once the watermark passes epoch start + (1+ttl_units)
    units (the dedup_stream_epoch retention recipe). A url refetched
    inside its epoch collapses to the newest (warc_ts, fetch_id)
    winner; the SAME url in a later epoch starts fresh (per-window
    winners are exactly what an Iceberg MERGE-per-crawl-window sink
    consumes). State is bounded by (distinct urls per epoch) x (epochs
    in the horizon), independent of stream lifetime.

    Contract: null urls dropped (as latest_snapshot_stream); rows with
    null warc_ts are dropped TOO — they have no epoch (the unbounded
    variant keeps them as weakest candidates). Output adds the epoch
    column."""
    if epoch_unit not in _EPOCH_UNIT_MS:
        raise ValueError(f"epoch_unit must be one of {list(_EPOCH_UNIT_MS)}")
    src = pages.where(
        F.col("url").isNotNull() & F.col(ts_col).isNotNull()
    ).withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if pages.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.withColumn("epoch", F.date_trunc(epoch_unit, F.col(ts_col)))
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int"),
        )
        .groupBy("epoch", "bucket")
        .applyInPandasWithState(
            _make_snapshot_fn(_EPOCH_UNIT_MS[epoch_unit], ttl_units),
            outputStructType=_SNAP_EPOCH_OUT_SCHEMA,
            stateStructType=_SNAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def latest_snapshot_stream(
    pages: DataFrame,
    n_buckets: int = 64,
) -> DataFrame:
    """Streaming form of operators/webtext.latest_snapshot: the crawl
    arrives as a stream of (url, warc_ts timestamp, fetch_id long,
    text); emit an UPSERT record each time a url's newest-snapshot
    winner changes (first sighting, or a strictly newer (warc_ts,
    fetch_id)). Older/duplicate re-fetches are dropped in every later
    micro-batch; within a batch each url is collapsed to its max
    before the state compare. Downstream, the upsert stream is exactly
    what an Iceberg MERGE-by-url sink consumes.

    Contract differences vs the batch operator: rows with a null url
    are DROPPED (an upsert stream keyed by url has no identity for
    them — the batch form keeps them as their own group), and
    fetch_id must be non-null. A null warc_ts loses to any real
    timestamp, matching the batch null contract.

    State: per url-bucket (pmod(xxhash64(url))), three sorted parallel
    arrays url/ts/tie — the payload is NOT stored (it is emitted the
    moment it wins). State size is the distinct-url count, i.e. the
    table's key set: UNBOUNDED in distinct urls (NoTimeout — nothing
    is ever evicted; the price of a single global winner per url). At
    full-crawl scale the authoritative merge lives in the table sink —
    use latest_snapshot_stream_epoch for bounded state (per-crawl-
    window winners, watermark-evicted the way dedup_stream_epoch
    is)."""
    return (
        pages.where(F.col("url").isNotNull())
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int"),
        )
        .groupBy("bucket")
        .applyInPandasWithState(
            _snapshot_fn,
            outputStructType=_SNAP_OUT_SCHEMA,
            stateStructType=_SNAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream_epoch(
    docs: DataFrame,
    n_buckets: int = 64,
    ts_col: str = "ts",
    epoch_unit: str = "day",
    watermark: str = "2 hours",
    ttl_units: int = 1,
) -> DataFrame:
    """BOUNDED-STATE cross-batch dedup: exact within an event-time epoch
    (date_trunc(epoch_unit, ts)), state keyed by (epoch, bucket) and
    EVICTED by event-time timeout once the watermark passes the epoch's
    retention horizon (epoch start + (1+ttl_units) epoch_units). A
    doc_id re-delivered inside its epoch is dropped; the same doc_id in
    a LATER epoch is re-admitted (that is the documented contract — web
    recrawls usually WANT the newer snapshot kept per crawl window).

    State size is bounded by (distinct ids per epoch) x (epochs inside
    the retention horizon), independent of stream lifetime — the fix for
    dedup_stream's unbounded seen-set. Input: (doc_id, url, text,
    ts:timestamp); output adds the epoch column."""
    if epoch_unit not in _EPOCH_UNIT_MS:
        raise ValueError(f"epoch_unit must be one of {list(_EPOCH_UNIT_MS)}")
    src = docs.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if docs.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.withColumn("epoch", F.date_trunc(epoch_unit, F.col(ts_col)))
        .withColumn(
            "bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int")
        )
        .groupBy("epoch", "bucket")
        .applyInPandasWithState(
            _make_dedup_epoch_fn(_EPOCH_UNIT_MS[epoch_unit], ttl_units),
            outputStructType=_EPOCH_OUT_SCHEMA,
            stateStructType=_DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
