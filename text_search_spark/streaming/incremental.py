"""Structured-Streaming incremental index maintenance (SURVEY.md §2.8).

The reference's pipeline is batch with idempotent skip-if-exists re-runs
(/root/reference/examples/libriheavy/tools/split_into_chunks.py:81-83); the
streaming analog is micro-batch appends: each batch of new pages becomes a
set of NEW segment rows appended to the same term-partitioned layout — the
query engine already merges multiple rows per (term, shard)
(query._TermPostings), and block-max bounds stay valid under avgdl drift
via the per-row bm_avgdl correction.

Usage:
    q = incremental_index(spark, stream_df, index_dir, checkpoint_dir)
    q.awaitTermination()          # or trigger(availableNow=True)

stream_df: a STREAMING DataFrame with (doc_id long, url string, text
string). Caller guarantees doc_ids are new (exactly-once feed or upstream
dedup); re-ingesting a doc_id double-counts it.

Consistency model: each micro-batch writes segments + doc_stats +
metrics first, then commits the manifest (single JSON rename) carrying
BOTH the scoring statistics (n_docs, avgdl) AND the committed segment
FILE SET (manifest.segment_files, Iceberg-snapshot style). IndexReader
opens exactly the manifest-listed files, so a reader whose query runs
concurrently with an in-flight append sees the pre-commit snapshot in
full — never a torn subset of the landing batch's part files
(tests/test_streaming.py: in-flight-file isolation + concurrent-reader
stress). Contract: appends are atomic per batch with respect to
CRASHES (a retry replaces the batch's files, never duplicates), every
read is a consistent committed snapshot, and refresh() flips a live
reader to the newest commit. At 10^12-doc scale the file list lives in
Iceberg manifest-list files instead of one JSON array; the commit
protocol is the same. term_stats is maintained incrementally: each
batch commits a tiny df/cf DELTA file aggregated from its own segment
rows (round-7), and IndexReader.term_stats serves base (+) deltas, so
a stream never needs rebuild_term_stats just because it appended —
the rebuild remains the way to (re)establish the base (first build,
or after a purge shifted df/cf) and folds consumed deltas into it.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..textnorm import spark_tokens
from ..index import format as fmt
from ..index.build import (
    _auto_size,
    _segment_builder,
    bucket_expr,
    shard_expr,
    grouped_postings,
)


def _clean_batch_files(target_dir: str, batch_id: int) -> None:
    tag = f"batch{batch_id}-"
    if not os.path.isdir(target_dir):
        return
    for root, _dirs, files in os.walk(target_dir):
        for f in files:
            if f.startswith(tag):
                os.remove(os.path.join(root, f))


def _append_scoped(
    write_fn: Callable[[str], None], target_dir: str, batch_id: int
) -> None:
    """Idempotent append under foreachBatch's at-least-once semantics:
    the batch writes to a scratch dir, any files from a previous attempt
    of the SAME batch are removed, then the new part files move into the
    target under batch-tagged names. A retry after a partial append
    therefore replaces — never duplicates — this batch's rows."""
    tmp = target_dir.rstrip("/") + f"._batch{batch_id}_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    write_fn(tmp)
    _clean_batch_files(target_dir, batch_id)
    for root, _dirs, files in os.walk(tmp):
        rel = os.path.relpath(root, tmp)
        for f in files:
            if not f.endswith(".parquet"):
                continue
            dst_dir = (
                target_dir if rel == "." else os.path.join(target_dir, rel)
            )
            os.makedirs(dst_dir, exist_ok=True)
            os.replace(
                os.path.join(root, f),
                os.path.join(dst_dir, f"batch{batch_id}-{f}"),
            )
    shutil.rmtree(tmp, ignore_errors=True)


def _append_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    batch_id: int,
) -> None:
    man = fmt.load_manifest(index_dir)
    if man is not None and man.stages.get(f"stream:{batch_id}"):
        # this batch already committed (manifest flip is the commit
        # point) — a redelivery after a post-commit failure is a no-op
        return
    if man is None:
        man = fmt.IndexManifest(
            format_version=fmt.FORMAT_VERSION,
            run_id=f"stream:{batch_id}",
        )
    # one materialization feeds all four jobs below (doc_stats write,
    # posting shuffle, vocab explode, metrics count) — without it each
    # job re-reads the micro-batch source. The three tokenize passes
    # themselves could further fuse via the batch builder's persisted
    # grouped_terms (build.py fused path) — seam noted, not done: at
    # micro-batch sizes the source re-read dominated, not the tokenize.
    batch = batch.select("doc_id", "url", "text").persist()
    try:
        _append_batch_inner(spark, batch, index_dir, batch_id, man)
    finally:
        batch.unpersist()


def _append_batch_inner(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    batch_id: int,
    man,
) -> None:

    # per-batch doc stats (batch-scoped files: retry-safe); same
    # null-coalesce as the batch builder — text=NULL counts 0, not
    # NULL (ANSI) / -1 (ansi=false)
    ds = batch.select(
        "doc_id",
        "url",
        F.size(
            F.coalesce(
                spark_tokens(F.col("text")), F.array().cast("array<string>")
            )
        ).alias("doc_len"),
    )
    _append_scoped(
        lambda p: ds.write.mode("overwrite").parquet(p),
        fmt.doc_stats_dir(index_dir),
        batch_id,
    )
    ds_tag = f"batch{batch_id}-"
    new_ds_files = [
        p
        for p in fmt.list_doc_stats_files(index_dir)
        if os.path.basename(p).startswith(ds_tag)
    ]
    # BATCH-ONLY stats (round-6b, review finding): the commit applies
    # them as DELTAS (m2.n_docs += ...), never as absolute values read
    # from the doc_stats directory — an absolute dir read races a
    # concurrent compaction purge (count pre-swap and commit post-purge
    # re-inflates the stats by the purged docs; the mirror interleaving
    # double-subtracts). Deltas compose under CAS rebase in ANY
    # interleaving: the mutate re-runs against the then-latest
    # committed totals. Retry-stable too — _append_scoped REPLACED any
    # prior attempt's files, and these numbers come from the batch
    # data, not the directory.
    bstats = ds.select(
        F.count("*"), F.coalesce(F.sum("doc_len"), F.lit(0))
    ).first()
    b_docs, b_tokens = int(bstats[0]), int(bstats[1])
    est_total = man.total_tokens + b_tokens
    est_docs = man.n_docs + b_docs

    # the FIRST batch WITH TOKENS fixes the layout: sizing from an
    # empty/blank leading batch (possible on recovery or a no-data
    # trigger) would lock the whole stream's lifetime at the minimum
    # n_buckets/n_shards. Until tokens arrive the floor layout is
    # provisional (no segment/vocab rows exist to invalidate) and is
    # re-derived each batch.
    if man.n_buckets == 0 or (
        man.total_tokens == 0 and not man.stages.get("layout_from_data")
    ):
        # man.total_tokens is the PRE-batch committed cumulative: once
        # any tokens have been indexed, segments exist under the fixed
        # layout and it must never be re-derived (covers pre-flag
        # manifests too)
        man.n_buckets, man.n_shards = _auto_size(
            max(est_total, 1) * 4,  # leave headroom for growth
            spark.sparkContext.defaultParallelism,
        )
    if est_total > 0:
        man.stages["layout_from_data"] = True
    n_buckets, n_shards = man.n_buckets, man.n_shards
    # bm_avgdl stamped on this batch's segment rows: best estimate of
    # the corpus avgdl at encode time. A racing purge/append makes it
    # slightly stale, which the per-row bm_avgdl bound correction
    # absorbs by design (query._TermPostings.max_sat).
    batch_avgdl = est_total / est_docs if est_docs else 0.0

    # one row per (doc, term), positions pre-encoded map-side — the same
    # posting relation the batch builder shuffles (build.grouped_postings)
    tokens = grouped_postings(batch)
    # vocab append: this batch's distinct terms (dedup on read)
    vocab = (
        batch.select(F.explode(spark_tokens(F.col("text"))).alias("term"))
        .distinct()
        .select(
            "term",
            F.xxhash64("term").alias("term_id"),
            F.pmod(F.xxhash64("term"), F.lit(n_buckets))
            .cast("int")
            .alias("term_bucket"),
        )
    )
    _append_scoped(
        lambda p: vocab.write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(p),
        fmt.vocab_dir(index_dir),
        batch_id,
    )
    seg_schema = "term_bucket int, " + fmt.SEGMENT_SCHEMA
    seg = (
        tokens.repartition(
            max(n_buckets, spark.sparkContext.defaultParallelism),
            bucket_expr(n_buckets),
            shard_expr(n_shards),
        )
        .sortWithinPartitions("term_id", shard_expr(n_shards), "doc_id")
        .mapInArrow(
            _segment_builder(batch_avgdl, n_buckets, n_shards),
            schema=seg_schema,
        )
    )
    _append_scoped(
        lambda p: seg.write.mode("overwrite")
        .option("parquet.block.size", str(fmt.SEGMENT_ROW_GROUP_BYTES))
        .partitionBy("term_bucket")
        .parquet(p),
        fmt.segments_dir(index_dir),
        batch_id,
    )
    # this batch's landed segment files (batch-tagged; _append_scoped
    # replaced any partial same-batch attempt)
    tag = f"batch{batch_id}-"
    all_files = fmt.list_segment_files(index_dir)
    new_files = [
        p for p in all_files if os.path.basename(p).startswith(tag)
    ]

    # term_stats DELTA (round-7, VERDICT item 7): aggregate df/cf over
    # JUST this batch's landed segment rows (already partially summed
    # per shard by the encoder — this job reads batch-sized data, never
    # the index) and land it batch-tagged under term_stats_deltas/. The
    # committed view is base (+) deltas (IndexReader.term_stats), so an
    # append no longer invalidates term_stats; rebuild_term_stats folds
    # consumed deltas into a fresh base. Same doc_stats-delta discipline
    # as round-6: the commit records the delta FILES, never absolute
    # stats, so append-vs-purge races rebase correctly.
    ts_delta_rels: list = []
    if new_files:
        seg_root = fmt.segments_dir(index_dir)
        batch_seg = (
            spark.read.schema(fmt.SEG_READ_SCHEMA)
            .option("basePath", seg_root)
            .parquet(
                *(
                    os.path.join(seg_root, p.replace("/", os.sep))
                    for p in new_files
                )
            )
        )
        ts_delta = (
            batch_seg.groupBy("term_id", "term_bucket")
            .agg(
                F.sum("df_part").alias("df"),
                F.sum("cf_part").alias("cf"),
            )
            .join(vocab, ["term_id", "term_bucket"])
            .select("term", "term_id", "df", "cf", "term_bucket")
        )
        _append_scoped(
            lambda p: ts_delta.coalesce(1)
            .write.mode("overwrite")
            .parquet(p),
            fmt.term_stats_deltas_dir(index_dir),
            batch_id,
        )
        td = fmt.term_stats_deltas_dir(index_dir)
        ts_delta_rels = sorted(
            f
            for f in os.listdir(td)
            if f.startswith(tag) and f.endswith(".parquet")
        )
    # metrics row, batch-scoped like the data files
    import datetime as _dt

    metrics = spark.createDataFrame(
        [
            (
                f"stream:{batch_id}",
                f"stream_batch:{batch_id}",
                "batch",
                int(batch.count()),
                0,
                0,
                "complete",
                _dt.datetime.now(_dt.timezone.utc),
            )
        ],
        "run_id string, stage string, unit string, docs long, "
        "postings long, bytes long, status string, updated_at timestamp",
    )
    _append_scoped(
        lambda p: metrics.coalesce(1).write.mode("overwrite").parquet(p),
        fmt.metrics_dir(index_dir),
        batch_id,
    )

    # manifest commit LAST, via the optimistic-CAS protocol: the mutate
    # below is a REBASE — it runs against the then-latest snapshot, so
    # if a compaction committed while this batch was landing, prev is
    # the compacted file set and this batch's files are added on top
    # (the compaction read only the pre-batch committed snapshot, so
    # nothing is lost or double-counted in either interleaving).
    def _commit(m2: "fmt.IndexManifest") -> bool:
        if m2.stages.get(f"stream:{batch_id}"):
            return False  # redelivered after commit — no-op
        if m2.n_buckets == 0 or (
            m2.total_tokens == 0 and not m2.stages.get("layout_from_data")
        ):
            # first real commit (or provisional pre-token layout):
            # persist the layout this batch's segment job actually used
            m2.n_buckets, m2.n_shards = n_buckets, n_shards
        if m2.total_tokens + b_tokens > 0:
            m2.stages["layout_from_data"] = True
        if m2.segment_files is None:
            # legacy pre-snapshot manifest: initialize the file set
            # from a directory walk, keeping only files a COMMITTED
            # stage owns. Orphans from an earlier crashed
            # never-committed batch (e.g. a checkpoint reset reassigned
            # batch ids) are excluded instead of silently committed
            # (round-6 fix).
            prev_files = [
                p
                for p in fmt.committed_files_legacy(index_dir, m2.stages)
                if not os.path.basename(p).startswith(tag)
            ]
        else:
            prev_files = m2.segment_files
        m2.segment_files = sorted(set(prev_files) | set(new_files))
        if m2.doc_stats_files is None:
            prev_ds = [
                p
                for p in fmt.committed_doc_stats_legacy(
                    index_dir, m2.stages
                )
                if not os.path.basename(p).startswith(ds_tag)
            ]
        else:
            prev_ds = m2.doc_stats_files
        m2.doc_stats_files = sorted(set(prev_ds) | set(new_ds_files))
        if not m2.complete and m2.n_docs == 0:
            # brand-new index: stamp the current format. An EXISTING
            # other-version manifest keeps its version so the reader's
            # validation still rejects the mixed layout loudly.
            m2.format_version = fmt.FORMAT_VERSION
        if not m2.run_id:
            m2.run_id = f"stream:{batch_id}"
        m2.n_docs += b_docs
        m2.total_tokens += b_tokens
        m2.avgdl = (
            m2.total_tokens / m2.n_docs if m2.n_docs else 0.0
        )
        m2.stages[f"stream:{batch_id}"] = True
        # term_stats stays VALID across this append: the batch's delta
        # files join the committed view (base + deltas). A never-built
        # base (stage False/absent) stays stale until the first rebuild.
        m2.term_stats_delta_files = sorted(
            set(m2.term_stats_delta_files or []) | set(ts_delta_rels)
        )
        m2.complete = True
        return True

    fmt.commit_manifest(index_dir, _commit)


def incremental_index(
    spark: SparkSession,
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    auto_compact_files: Optional[int] = None,
):
    """Start the incremental indexing query. Returns the StreamingQuery.

    auto_compact_files: when set, after each batch commit the stream
    runs merge.maybe_compact(max_files_per_bucket=auto_compact_files) —
    inline maintenance that bounds the per-bucket file count (and so
    query latency) for a long-lived stream. Runs AFTER the batch's
    manifest commit, in the same foreachBatch slot, so it serializes
    with appends; crash-safety is the compaction's own contract (the
    snapshot claim is the commit point, a half-landed attempt is
    invisible and cleaned by the rerun)."""

    def _on_batch(b, bid):
        _append_batch(spark, b, index_dir, bid)
        if auto_compact_files is not None:
            from ..index.merge import maybe_compact

            maybe_compact(
                spark, index_dir, max_files_per_bucket=auto_compact_files
            )
            # same inline-maintenance slot bounds the term_stats delta
            # list (manifest-length check; a no-op almost every batch)
            fold_term_stats_deltas(spark, index_dir)

    writer = stream_df.writeStream.foreachBatch(_on_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# consumed delta files survive on disk this long after the commit that
# unreferenced them: a long-lived IndexReader pinned to the PRIOR
# snapshot still unions the old delta set on its next term_stats()
# call, and an immediate unlink turned that into path-does-not-exist
# (round-8, ADVICE fix — same landing-window discipline as
# vacuum_segments' grace_s). 0 = immediate (tests / single-process).
TERM_STATS_DELTA_GRACE_S = 600.0


def _term_stats_lock_path(index_dir: str) -> str:
    return os.path.join(index_dir, ".term_stats.lock")


def _sweep_unreferenced_deltas(index_dir: str, grace_s: float) -> None:
    """Remove delta files no CURRENT manifest references, once older
    than grace_s (mtime). Also sweeps crash leftovers from interrupted
    folds/rebuilds. Best-effort: a lost race with a concurrent remover
    is fine."""
    import time as _time

    man = fmt.load_manifest(index_dir)
    ref = set(man.term_stats_delta_files or []) if man is not None else set()
    td = fmt.term_stats_deltas_dir(index_dir)
    if not os.path.isdir(td):
        return
    now = _time.time()
    for f in os.listdir(td):
        if f.startswith(".") or not f.endswith(".parquet") or f in ref:
            continue
        p = os.path.join(td, f)
        try:
            if grace_s <= 0 or now - os.path.getmtime(p) > grace_s:
                os.remove(p)
        except OSError:
            pass


def fold_term_stats_deltas(
    spark: SparkSession,
    index_dir: str,
    max_delta_files: int = 64,
    delta_grace_s: float = TERM_STATS_DELTA_GRACE_S,
) -> bool:
    """Fold the snapshot's term_stats delta files into ONE combined
    delta once more than max_delta_files have accumulated (a long
    stream commits one tiny delta per batch; the reader view unions
    them all, so an unbounded list slowly inflates every term_stats()
    plan). Returns whether a fold ran.

    Cost: reads ONLY the delta files (batch-sized sums, never the
    index), writes one combined file, CAS-swaps the list. The mutate
    is a rebase: deltas committed by appends racing the fold were not
    in the consumed set and survive (same discipline as
    rebuild_term_stats). The manifest-only length check makes this
    safe to call after every micro-batch (incremental_index does).
    Consumed files are swept best-effort after a `delta_grace_s`
    landing window (readers pinned to the prior snapshot keep reading
    them until they refresh — ADVICE round-8); a crash before the
    sweep leaves unreferenced files a later fold's sweep collects.

    Fold and rebuild are serialized on `.term_stats.lock` (round-8,
    ADVICE fix): a fold racing a rebuild double-counted df/cf — the
    rebuild bakes the consumed deltas into the new base while the
    fold's CAS-rebased commit re-adds the same sums as a fold file
    (the rebase protects list membership, not that semantic
    conflict). The fold is opportunistic, so a held lock just means
    "maintenance already running" and returns False."""
    lock = _term_stats_lock_path(index_dir)
    if not fmt.try_claim_pid_lock(lock):
        return False
    try:
        return _fold_term_stats_locked(
            spark, index_dir, max_delta_files, delta_grace_s
        )
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


def _fold_term_stats_locked(
    spark: SparkSession,
    index_dir: str,
    max_delta_files: int,
    delta_grace_s: float,
) -> bool:
    import uuid as _uuid

    man0 = fmt.load_manifest(index_dir)
    if man0 is None:
        return False
    deltas = list(man0.term_stats_delta_files or [])
    if len(deltas) <= max_delta_files:
        return False
    td = fmt.term_stats_deltas_dir(index_dir)
    ddf = spark.read.schema(fmt.TERM_STATS_READ_SCHEMA).parquet(
        *(os.path.join(td, rel) for rel in deltas)
    )
    folded = (
        ddf.groupBy("term_id")
        .agg(
            F.min("term").alias("term"),
            F.sum("df").alias("df"),
            F.sum("cf").alias("cf"),
            F.min("term_bucket").alias("term_bucket"),
        )
        .select("term", "term_id", "df", "cf", "term_bucket")
    )
    tag = f"fold-{_uuid.uuid4().hex[:12]}"
    tmp = os.path.join(td, "." + tag)
    shutil.rmtree(tmp, ignore_errors=True)
    folded.coalesce(1).write.mode("overwrite").parquet(tmp)
    rels = []
    for i, f in enumerate(sorted(os.listdir(tmp))):
        if f.endswith(".parquet"):
            out = f"{tag}-{i:04d}.parquet"
            os.replace(os.path.join(tmp, f), os.path.join(td, out))
            rels.append(out)
    shutil.rmtree(tmp, ignore_errors=True)
    consumed = set(deltas)

    def _commit(m2: "fmt.IndexManifest") -> None:
        cur = set(m2.term_stats_delta_files or [])
        m2.term_stats_delta_files = sorted(
            (cur - consumed) | set(rels)
        ) or None

    fmt.commit_manifest(index_dir, _commit)
    _sweep_unreferenced_deltas(index_dir, delta_grace_s)
    return True


def rebuild_term_stats(
    spark: SparkSession,
    index_dir: str,
    delta_grace_s: float = TERM_STATS_DELTA_GRACE_S,
) -> None:
    # serialized against fold_term_stats_deltas on the same lock (see
    # there: a racing fold re-adds delta sums the rebuild just baked
    # into the base). Rebuild is an explicit operator action, so a held
    # lock is a loud error rather than a silent skip.
    lock = _term_stats_lock_path(index_dir)
    if not fmt.try_claim_pid_lock(lock):
        raise RuntimeError(
            f"term_stats maintenance already running at {index_dir} "
            f"({lock}); fold/rebuild are one-at-a-time"
        )
    try:
        _rebuild_term_stats_locked(spark, index_dir, delta_grace_s)
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


def _rebuild_term_stats_locked(
    spark: SparkSession, index_dir: str, delta_grace_s: float
) -> None:
    man0 = fmt.load_manifest(index_dir)
    root = fmt.segments_dir(index_dir)
    if man0 is not None and man0.segment_files is not None:
        # derive stats from the committed snapshot only (a concurrent
        # in-flight append's files must not leak into term_stats)
        if man0.segment_files:
            seg = (
                spark.read.schema(fmt.SEG_READ_SCHEMA)
                .option("basePath", root)
                .parquet(
                    *(os.path.join(root, p.replace("/", os.sep))
                      for p in man0.segment_files)
                )
            )
        else:
            seg = spark.createDataFrame([], fmt.SEG_READ_SCHEMA)
    else:
        seg = spark.read.schema(fmt.SEG_READ_SCHEMA).parquet(root)
    vocab = (
        spark.read.schema(fmt.VOCAB_READ_SCHEMA)
        .parquet(fmt.vocab_dir(index_dir))
        .select("term", "term_id")
        .dropDuplicates(["term_id"])
    )
    (
        seg.groupBy("term_id", "term_bucket")
        .agg(F.sum("df_part").alias("df"), F.sum("cf_part").alias("cf"))
        .join(vocab, "term_id")
        .select("term", "term_id", "df", "cf", "term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(fmt.term_stats_dir(index_dir))
    )
    # the rebuild FOLDED the snapshot's deltas into the new base —
    # clear exactly those (an append racing this rebuild keeps its own
    # delta: its segment files were not in man0's scan)
    consumed = set(
        (man0.term_stats_delta_files or []) if man0 is not None else []
    )
    base_segs = set(
        (man0.segment_files or []) if man0 is not None else []
    )

    def _mark(m2: "fmt.IndexManifest") -> None:
        if base_segs - set(m2.segment_files or []):
            # a compaction/purge replaced files the rebuild scanned —
            # the fresh base may be stale already; leave the flag down
            # (df/cf is unchanged by a pure merge, but a purge shifts
            # it, and we can't tell which happened from here)
            m2.stages["term_stats"] = False
        else:
            m2.stages["term_stats"] = True
        m2.term_stats_delta_files = sorted(
            set(m2.term_stats_delta_files or []) - consumed
        ) or None

    fmt.commit_manifest(index_dir, _mark)
    # consumed delta files are unreferenced by the new snapshot — swept
    # after the landing-window grace (readers pinned to the prior
    # snapshot keep unioning them until they refresh)
    _sweep_unreferenced_deltas(index_dir, delta_grace_s)


def incremental_deletes(
    spark: SparkSession,
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    id_col: str = "doc_id",
):
    """Streaming deletes: each micro-batch of doc ids tombstones its
    docs (index/delete.py) — takedowns / robots revocations / opt-outs
    arriving as a stream next to the indexing stream. Returns the
    StreamingQuery.

    Idempotence under at-least-once foreachBatch: a redelivered batch
    writes a second tombstone file with the same ids, which is
    harmless — readers take the union, and the next purge consumes
    both files. Deletes and appends may run concurrently: both commit
    through the CAS protocol, so neither clobbers the other's manifest
    state (a doc appended and deleted around the same time converges
    to deleted as long as the delete's tombstone commit is observed by
    the reader's refresh — tombstones mask by doc_id regardless of
    which segment file holds the postings)."""
    from ..index.delete import delete_docs

    writer = stream_df.writeStream.foreachBatch(
        lambda b, bid: delete_docs(spark, index_dir, b, id_col=id_col)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def upsert_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    batch_id: int,
    ts_col: Optional[str] = None,
) -> None:
    """Index UPSERT for one micro-batch of (url, text[, ts_col]) pages:
    re-crawled urls REPLACE their previous version in the index — the
    Common-Crawl refetch story (webtext.latest_snapshot) carried all
    the way into the inverted index instead of stopping at the corpus
    table.

    Mechanics (all existing primitives — append + tombstones):

    1. within-batch collapse: with ts_col, only each url's newest
       snapshot indexes (webtext.latest_snapshot — one combiner-
       friendly agg); without it, the batch must be one-row-per-url.
    2. fresh version-scoped doc_ids: xxhash64(url, batch_id) — a
       re-crawl gets a NEW doc_id, so the old version's tombstone can
       never shadow the new one (tombstones mask by doc_id).
    3. append the batch (idempotent, stage-gated like every stream
       batch).
    4. tombstone the url's PREVIOUS doc_ids: doc_stats rows for these
       urls minus this batch's own ids — recomputable idempotently, so
       an at-least-once redelivery converges (the append no-ops, the
       delete re-derives the same set and writes an overlapping
       tombstone file, which readers union).

    Crash contract: append commits before the delete, so the worst
    in-between state is BOTH versions briefly visible (a duplicate),
    never a url missing from the index; the batch retry completes the
    delete. n_docs/avgdl count tombstoned versions until compaction
    purges (the documented Lucene stats drift — maybe_compact's
    tombstone-fraction trigger is the pressure valve, important here
    because every upsert produces one tombstone)."""
    from ..index.delete import delete_docs
    from ..operators.webtext import latest_snapshot

    if ts_col is not None:
        batch = latest_snapshot(
            batch, url_col="url", ts_col=ts_col, payload_cols=["text"]
        ).select("url", "text")
    else:
        batch = batch.select("url", "text")
    versioned = batch.select(
        F.xxhash64(F.col("url"), F.lit(batch_id)).alias("doc_id"),
        "url",
        "text",
    ).persist()
    try:
        _append_batch(spark, versioned, index_dir, batch_id)
        # previous versions come from the COMMITTED doc_stats snapshot
        # (which now includes this batch's own rows — excluded by the
        # anti-join on our ids); never a raw dir scan, which could see
        # another in-flight batch's uncommitted landing files
        ds_dir = fmt.doc_stats_dir(index_dir)
        man2 = fmt.load_manifest(index_dir)
        ds_files = man2.doc_stats_files if man2 else None
        if ds_files is not None:
            ds = spark.read.schema(fmt.DOC_STATS_READ_SCHEMA).parquet(
                *(
                    os.path.join(ds_dir, p.replace("/", os.sep))
                    for p in ds_files
                )
            ) if ds_files else spark.createDataFrame(
                [], fmt.DOC_STATS_READ_SCHEMA
            )
        else:
            ds = spark.read.schema(fmt.DOC_STATS_READ_SCHEMA).parquet(
                ds_dir
            )
        old = (
            ds.join(versioned.select("url"), "url", "leftsemi")
            .join(versioned.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id")
        )
        delete_docs(spark, index_dir, old)
    finally:
        versioned.unpersist()


def incremental_index_upserts(
    spark: SparkSession,
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    ts_col: Optional[str] = None,
    auto_compact_files: Optional[int] = None,
    auto_compact_tombstone_frac: Optional[float] = 0.2,
):
    """Streaming upsert maintenance: each micro-batch of re-crawled
    pages replaces its urls' previous versions (upsert_batch). Returns
    the StreamingQuery.

    auto_compact_files / auto_compact_tombstone_frac: inline
    maintenance after each batch (merge.maybe_compact) — especially
    relevant here, where EVERY re-crawl leaves one tombstoned version
    behind: the tombstone-fraction trigger is what keeps a long-lived
    upsert stream's dead-posting volume (and per-query mask) bounded
    without an external job."""

    def _on_batch(b, bid):
        upsert_batch(spark, b, index_dir, bid, ts_col=ts_col)
        if auto_compact_files is not None:
            from ..index.merge import maybe_compact

            maybe_compact(
                spark,
                index_dir,
                max_files_per_bucket=auto_compact_files,
                max_tombstone_frac=auto_compact_tombstone_frac,
            )

    writer = stream_df.writeStream.foreachBatch(_on_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
