"""Hierarchical segment merge (SURVEY.md §4 custom-work item 4; north star:
"hierarchically merged into term-partitioned index shards").

merge_shards halves (or /f) the shard count of an index: every f doc-
disjoint (term, shard) segments merge into one. Because shard = hash(doc_id)
% S and S_new divides S, `new_shard = shard % S_new` equals hash(doc_id) %
S_new — the doc-sharded query invariant survives the merge, and a merged
index is BYTE-IDENTICAL to one built directly at S_new (asserted in
tests/test_merge.py): the merged doc list is the same sorted sequence, so
gaps, blocks, block-max and positions re-encode to the same bytes.

Repeated application gives the log-depth merge tree: S -> S/f -> ... -> 1.
Each level is one Spark job over segment ROWS (already compressed — orders
of magnitude smaller than the token relation), shuffled on (term_bucket,
new_shard) and spliced in a streaming Arrow UDF.
"""

from __future__ import annotations

import os
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..codec import (
    decode_block_postings,
    decode_positions,
    encode_block_postings,
    encode_blockmax,
    encode_positions,
)
from . import format as fmt


def _merge_rows(rows: List[tuple], avgdl: float) -> tuple:
    """Merge f segment rows of one (term, new_shard): returns the new
    (df_part, cf_part, postings, positions, blockmax)."""
    docs_l, tfs_l, dls_l, pos_l = [], [], [], []
    for postings, positions in rows:
        d, t, l = decode_block_postings(bytes(postings))
        p = decode_positions(bytes(positions), t)
        docs_l.append(d)
        tfs_l.append(t)
        dls_l.append(l)
        pos_l.append(p)
    d = np.concatenate(docs_l)
    t = np.concatenate(tfs_l)
    l = np.concatenate(dls_l)
    order = np.argsort(d, kind="stable")  # inputs doc-disjoint
    d, t_s, l_s = d[order], t[order], l[order]
    # reorder ragged position segments to the merged doc order
    seg_starts = np.concatenate([[0], np.cumsum(t)])[:-1]
    flat = np.concatenate(pos_l)
    take = (
        np.concatenate(
            [np.arange(seg_starts[i], seg_starts[i] + t[i]) for i in order]
        )
        if order.size
        else np.empty(0, np.int64)
    )
    flat = flat[take]
    # re-delta the positions (reset at each doc)
    new_starts = np.concatenate([[0], np.cumsum(t_s)])[:-1].astype(np.int64)
    gaps = flat.copy()
    if flat.size:
        gaps[1:] = flat[1:] - flat[:-1]
        gaps[new_starts] = flat[new_starts]
    return (
        int(d.size),
        int(t_s.sum()),
        encode_block_postings(d, t_s, l_s),
        encode_positions(gaps),
        encode_blockmax(d, t_s, l_s, avgdl),
    )


def _splice_fn(avgdl: float):
    """mapInPandas fn merging consecutive rows of one (term, new_shard)
    group (partition is sorted on term_id, new_shard); emits completed
    groups incrementally so peak memory is bounded by _OUT_ROWS merged
    segments, not the whole partition."""
    from .build import _OUT_ROWS

    _COLS = [
        "term_bucket", "term_id", "shard", "df_part", "cf_part",
        "postings", "positions", "blockmax", "bm_avgdl",
    ]

    def splice(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_key = None
        cur_rows: List[tuple] = []
        cur_meta = None
        out: List[tuple] = []

        def flush():
            if cur_key is None:
                return
            dfp, cfp, postings, positions, blockmax = _merge_rows(
                cur_rows, avgdl
            )
            out.append(
                cur_meta + (dfp, cfp, postings, positions, blockmax, avgdl)
            )

        for b in batches:
            for i in range(len(b)):
                key = (int(b["term_id"].iat[i]), int(b["new_shard"].iat[i]))
                if key != cur_key:
                    flush()
                    if len(out) >= _OUT_ROWS:
                        yield pd.DataFrame(out, columns=_COLS)
                        out = []
                    cur_key = key
                    cur_rows = []
                    cur_meta = (
                        int(b["term_bucket"].iat[i]),
                        int(b["term_id"].iat[i]),
                        int(b["new_shard"].iat[i]),
                    )
                cur_rows.append((b["postings"].iat[i], b["positions"].iat[i]))
        flush()
        if out:
            yield pd.DataFrame(out, columns=_COLS)

    return splice


def _merged_segments(spark, seg, avgdl, n_buckets, s_new):
    """The merge plan: shuffle segment rows on (term_bucket, new_shard),
    sort within partitions, splice consecutive same-key rows."""
    seg = seg.withColumn("new_shard", (F.col("shard") % s_new).cast("int"))
    schema = "term_bucket int, " + fmt.SEGMENT_SCHEMA
    return (
        seg.repartition(
            max(n_buckets, spark.sparkContext.defaultParallelism),
            "term_bucket",
            "new_shard",
        )
        .sortWithinPartitions("term_id", "new_shard", "shard")
        .mapInPandas(_splice_fn(avgdl), schema=schema)
    )


def _read_committed_segments(spark: SparkSession, index_dir: str, man):
    """The source index's segment rows — exactly the manifest-committed
    snapshot when the manifest carries a file list (a compaction racing
    a streaming append must not absorb half an uncommitted batch);
    directory scan for legacy manifests."""
    src_root = fmt.segments_dir(index_dir)
    if man.segment_files is not None and not man.segment_files:
        return spark.createDataFrame([], fmt.SEG_READ_SCHEMA)
    if man.segment_files is not None:
        return (
            spark.read.schema(fmt.SEG_READ_SCHEMA)
            .option("basePath", src_root)
            .parquet(
                *(os.path.join(src_root, p) for p in man.segment_files)
            )
        )
    return spark.read.schema(fmt.SEG_READ_SCHEMA).parquet(src_root)


def merge_shards(
    spark: SparkSession, index_dir: str, out_dir: str, factor: int = 2
) -> None:
    """Produce a new index at out_dir with n_shards /= factor."""
    man = fmt.load_manifest(index_dir)
    assert man is not None and man.complete
    s_old, s_new = man.n_shards, man.n_shards // factor
    assert s_new >= 1 and s_old % s_new == 0
    avgdl = man.avgdl

    merged = _merged_segments(spark, seg=_read_committed_segments(
        spark, index_dir, man
    ), avgdl=avgdl, n_buckets=man.n_buckets, s_new=s_new)
    merged.write.mode("overwrite").partitionBy("term_bucket").parquet(
        fmt.segments_dir(out_dir)
    )
    # stats tables + manifest carry over (doc space unchanged). Explicit
    # schemas + makedirs: a streaming-built index has no term_stats dir
    # until rebuild_term_stats runs (the merged copy is then empty and
    # likewise needs a rebuild), and an all-blank index has empty dirs —
    # neither may crash the merge on schema inference / missing path.
    os.makedirs(fmt.doc_stats_dir(index_dir), exist_ok=True)
    os.makedirs(fmt.term_stats_dir(index_dir), exist_ok=True)
    spark.read.schema(fmt.DOC_STATS_READ_SCHEMA).parquet(
        fmt.doc_stats_dir(index_dir)
    ).write.mode("overwrite").parquet(fmt.doc_stats_dir(out_dir))
    spark.read.schema(fmt.VOCAB_READ_SCHEMA).parquet(
        fmt.vocab_dir(index_dir)
    ).write.mode(
        "overwrite"
    ).partitionBy("term_bucket").parquet(fmt.vocab_dir(out_dir))
    spark.read.schema(fmt.TERM_STATS_READ_SCHEMA).parquet(
        fmt.term_stats_dir(index_dir)
    ).write.mode(
        "overwrite"
    ).partitionBy("term_bucket").parquet(fmt.term_stats_dir(out_dir))
    new_man = fmt.IndexManifest(
        format_version=fmt.FORMAT_VERSION,
        n_docs=man.n_docs,
        total_tokens=man.total_tokens,
        avgdl=man.avgdl,
        n_buckets=man.n_buckets,
        n_shards=s_new,
        run_id=man.run_id + f"+merge{factor}",
        complete=True,
        stages={"merged_from": True},
    )
    new_man.segment_files = fmt.list_segment_files(out_dir)
    fmt.save_manifest(out_dir, new_man)


def compact_in_place(
    spark: SparkSession,
    index_dir: str,
    factor: int = 1,
    one_file_per_bucket: bool = True,
) -> None:
    """Compact an index IN PLACE under snapshot isolation: rewrite the
    committed segment rows (merging the multi-row (term, shard) groups
    incremental appends accumulate; factor>1 also merges shards like
    merge_shards), land the new files NEXT TO the old ones, then flip
    the manifest to list only the new file set. Readers holding the old
    manifest keep answering from the old files (Iceberg snapshot
    semantics — this is what manifest.segment_files buys); new readers
    see only the compacted files. Old files stay on disk until
    vacuum_segments() expires them — run it when no reader older than
    the current snapshot remains.

    Motivation is measured, not hypothetical: compacting the sf0.1
    bench index 61 -> 8 files cut single-query p50 4.65 -> 2.75 ms
    (BENCH.md round-5) — per-file open/decode is the dominant latency
    term, and streaming appends strictly grow the file count.

    Crash contract: the manifest save is the only commit point. A crash
    before it leaves half-landed compact files that no manifest
    references (invisible to every reader); a rerun replaces them
    (same-generation files are cleaned first) and vacuum removes any
    strays. one_file_per_bucket adds a second small shuffle of the
    MERGED rows (already compressed — tiny next to the corpus), re-
    sorted on term_id so parquet row-group pruning survives, and each
    bucket partition lands as a single part file.

    Writer contract: ONE writer at a time (the standard Iceberg
    optimistic-commit assumption, minus the retry loop). Running
    compaction concurrently with a streaming append is a lost-update
    race on the manifest — whichever commits last wins and the other's
    file-list/n_shards update is clobbered. Pause the stream (or
    schedule compaction between micro-batches) exactly as you would
    around an Iceberg rewrite_data_files."""
    import shutil

    man = fmt.load_manifest(index_dir)
    assert man is not None and man.complete
    s_old, s_new = man.n_shards, man.n_shards // factor
    assert s_new >= 1 and s_old % s_new == 0

    merged = _merged_segments(
        spark,
        seg=_read_committed_segments(spark, index_dir, man),
        avgdl=man.avgdl,
        n_buckets=man.n_buckets,
        s_new=s_new,
    )
    if one_file_per_bucket:
        # restore term clustering after the repartition: parquet
        # row-group stats on term_id are what make the per-query
        # filtered read cheap — an unsorted bucket file forces a
        # full-file scan per query (measured: compacted-but-unsorted
        # p50 8.4 ms vs 2.8 ms sorted)
        merged = merged.repartition(
            man.n_buckets, F.col("term_bucket")
        ).sortWithinPartitions("term_id", "shard")

    seg_root = fmt.segments_dir(index_dir)
    gen = sum(1 for k in man.stages if k.startswith("compact:"))
    prefix = f"compact{gen}-"
    tmp = seg_root.rstrip("/") + "._compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").partitionBy("term_bucket").parquet(tmp)
    # clean a previous crashed attempt of the SAME generation, then move
    # the new files in under generation-tagged names
    for d, _dirs, files in os.walk(seg_root):
        for f in files:
            if f.startswith(prefix):
                os.remove(os.path.join(d, f))
    new_files: List[str] = []
    for d, _dirs, files in os.walk(tmp):
        rel = os.path.relpath(d, tmp)
        for f in files:
            if not f.endswith(".parquet"):
                continue
            dst_dir = seg_root if rel == "." else os.path.join(seg_root, rel)
            os.makedirs(dst_dir, exist_ok=True)
            os.replace(
                os.path.join(d, f), os.path.join(dst_dir, prefix + f)
            )
            new_files.append(
                prefix + f if rel == "." else os.path.join(rel, prefix + f)
            )
    shutil.rmtree(tmp, ignore_errors=True)
    # COMMIT: the manifest flip makes the compacted set the snapshot
    man.n_shards = s_new
    man.segment_files = sorted(new_files)
    man.stages[f"compact:{gen}"] = True
    fmt.save_manifest(index_dir, man)


def vacuum_segments(index_dir: str, grace_s: float = 3600.0) -> int:
    """Expire segment files the current manifest does not reference
    (pre-compaction snapshots, crashed attempts). Returns the number of
    files removed. Safe once no live reader holds a manifest older than
    the current one — the Iceberg expire-snapshots contract; a reader
    opened before the vacuum on an OLD manifest would lose its files,
    exactly like expiring a snapshot a scan still pins.

    grace_s: unreferenced files YOUNGER than this are kept (default
    1 h). This is the guard against a concurrent writer: a streaming
    append lands its part files BEFORE its manifest commit, so without
    the grace a vacuum racing the append would delete a landing batch.
    Pass 0 only when no writer can be active (same retention idea as
    Iceberg's expire-older-than)."""
    import time as _time

    man = fmt.load_manifest(index_dir)
    assert man is not None and man.segment_files is not None, (
        "vacuum needs a manifest with a committed file list"
    )
    listed = set(man.segment_files)
    root = fmt.segments_dir(index_dir)
    removed = 0
    cutoff = _time.time() - grace_s
    for d, _dirs, files in os.walk(root):
        rel = os.path.relpath(d, root)
        for f in files:
            if not f.endswith(".parquet"):
                continue
            relpath = f if rel == "." else os.path.join(rel, f)
            if relpath in listed:
                continue
            p = os.path.join(d, f)
            if os.path.getmtime(p) > cutoff:
                continue  # young enough to be a landing batch — keep
            os.remove(p)
            removed += 1
    return removed
