"""On-disk index layout + small helpers.

Layout under <index_dir>/ (all Parquet; Iceberg-style: immutable data files,
directory partitioning, an explicit JSON manifest committed last as the
atomicity point, and an append-only metrics table for lineage):

  segments/term_bucket=NN/   (term_id long, shard int, df_part long,
                              cf_part long, postings binary,
                              positions binary, blockmax binary,
                              bm_avgdl double)
      term_id = xxhash64(term) — the big build shuffle carries an int64
      key, never strings (~45% shuffle-volume cut); the query planner
      computes term_id driver-side (functions/xxhash.py), so lookups need
      no vocab join. Uniqueness term<->term_id is asserted at build.
      doc-sharded-within-term-partitioned posting segments. `shard` is a
      consistent hash of doc_id so every term's postings for a given doc
      land in the same shard -> query scoring is doc-sharded with no
      cross-term shuffle (see query.py).
  doc_stats/                 (doc_id long, url string, doc_len long)
  vocab/                     (term string, term_id long, term_bucket int)
      distinct terms (the dictionary) — built from a map-side-combined
      distinct pass, tiny next to the posting shuffle.
  term_stats/                (term string, term_id long, df long, cf long,
                              term_bucket int)
  metrics/                   (run_id, stage, unit, docs long, postings long,
                              bytes long, status, updated_at) — per-partition
      lineage + counters; append-only (north rule: metrics table).
  manifest.json              global stats + build config; written LAST.
      A build is complete iff the manifest exists and `complete` is true.
      checkpoints: per-stage completion markers for resume (stage name ->
      true) — segment-level checkpointing (SURVEY.md §7.1 M5).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from typing import Dict, List, Optional


# v3: int64 term_id shuffle/segments + vocab table
# v4: tokens_tmp layout (doc_id, blob, term, term_bucket) — doc_len/tf fold
#     into a varbyte blob header, shard is an expression, never a column;
#     build_index refuses to RESUME a partial build from another version
FORMAT_VERSION = 4


@dataclass
class IndexManifest:
    format_version: int = 1  # explicitly set on save; old manifests lack it
    n_docs: int = 0
    total_tokens: int = 0
    avgdl: float = 0.0
    n_buckets: int = 32
    n_shards: int = 4
    k1: float = 1.2
    b: float = 0.75
    complete: bool = False
    run_id: str = ""
    stages: Dict[str, bool] = field(default_factory=dict)
    # JVM->Python pipe narrowing for the segment stage (build-transport
    # only — on-disk bytes are identical either way): when the corpus's
    # doc_id RANGE fits 31 bits (sequential/dense ingest ids), the pipe
    # carries int32 (doc_id - doc_id_base) instead of int64 doc_id.
    # Sparse 60-bit hashed ids auto-disable it. Persisted so a resumed
    # build re-runs the segment stage with the same transport.
    doc_id_base: int = 0
    doc_id_narrow: bool = False
    # resumable-unit layout: group g owns buckets range(g, n_buckets,
    # bucket_groups), and the 'segments:{g}' checkpoints are only valid
    # under the layout that wrote them — persisted so a resume cannot
    # silently skip buckets by re-deriving groups from a DIFFERENT
    # caller-supplied bucket_groups. 0 = unset (legacy partial).
    bucket_groups: int = 0
    # Iceberg-style snapshot: the COMMITTED segment file set, as paths
    # relative to segments_dir (e.g. "term_bucket=3/batch0-part-...").
    # Readers that honor this list get true snapshot isolation against
    # concurrent streaming appends — a part file an in-flight batch has
    # already landed is invisible until the manifest flip commits it
    # (closes the torn-read seam incremental.py documented through
    # round 4). None = legacy manifest: readers fall back to the
    # directory scan. At 10^12-doc scale this list lives in Iceberg
    # manifest-list files rather than one JSON array; the commit
    # protocol (file set flips with the snapshot pointer) is identical.
    segment_files: Optional[List[str]] = None


def manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.json")


def load_manifest(index_dir: str) -> Optional[IndexManifest]:
    p = manifest_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return IndexManifest(**json.load(f))


def save_manifest(index_dir: str, m: IndexManifest) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = manifest_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f, indent=2)
    os.replace(tmp, manifest_path(index_dir))  # atomic commit point


# read-side schema of the segments table (data columns + the term_bucket
# partition column). Passed explicitly wherever segments are read so an
# EMPTY index (every doc tokenized to zero tokens -> zero segment files)
# reads as an empty DataFrame instead of failing schema inference.
SEG_READ_SCHEMA = (
    "term_id long, shard int, df_part long, cf_part long, "
    "postings binary, positions binary, blockmax binary, "
    "bm_avgdl double, term_bucket int"
)


VOCAB_READ_SCHEMA = "term string, term_id long, term_bucket int"

# same explicit-schema discipline for the stats tables: a streaming-built
# index has no term_stats until rebuild_term_stats runs, and an all-blank
# corpus writes empty dirs — inference over zero files throws where an
# empty relation is the correct answer.
DOC_STATS_READ_SCHEMA = "doc_id long, url string, doc_len int"
TERM_STATS_READ_SCHEMA = (
    "term string, term_id long, df long, cf long, term_bucket int"
)


def list_segment_files(index_dir: str) -> List[str]:
    """Walk segments_dir and return sorted segments_dir-relative paths of
    every .parquet part file — used by writers at COMMIT time to record
    the snapshot's file set in the manifest (readers never walk)."""
    root = segments_dir(index_dir)
    out: List[str] = []
    if not os.path.isdir(root):
        return out
    for d, _dirs, files in os.walk(root):
        rel = os.path.relpath(d, root)
        # never snapshot committer staging (a crashed job's _temporary
        # tree also holds .parquet files) or hidden/_ metadata files
        if rel != "." and any(
            p.startswith(("_", ".")) for p in rel.split(os.sep)
        ):
            continue
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(f if rel == "." else os.path.join(rel, f))
    return sorted(out)


def segments_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "segments")


def doc_stats_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "doc_stats")


def term_stats_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "term_stats")


def metrics_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "metrics")


SEGMENT_SCHEMA = (
    "term_id long, shard int, df_part long, cf_part long, "
    "postings binary, positions binary, blockmax binary, bm_avgdl double"
)


def vocab_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "vocab")
