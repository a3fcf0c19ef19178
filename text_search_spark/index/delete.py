"""Document deletes — the tombstone half of the index lifecycle.

Lucene/Iceberg shape: `delete_docs` writes an immutable tombstone
parquet (doc_id long) and CAS-commits its path into
`manifest.tombstone_files`. From the next reader refresh on, every
query path excludes the tombstoned docs — driver sidecar, scan-stage,
shard-scorer, AND/OR/phrase/near alike (the mask lives in the shared
posting-decode layer, query._TermPostings, plus the two single-term
fast paths).

Semantics (Lucene's deleted-docs contract, stated not hidden):

* Exclusion is IMMEDIATE and snapshot-consistent: the tombstone list is
  part of the claimed snapshot, so a pinned time-travel reader on a
  pre-delete snapshot still sees the docs, and a reader that refreshes
  never sees a torn state.
* Corpus statistics (df, cf, n_docs, avgdl) keep their full-corpus
  values until a compaction purges the postings physically — surviving
  docs' SCORES are unchanged by a delete, exactly like Lucene before a
  merge. Block-max bounds may still include deleted docs: they remain
  valid UPPER bounds, so MaxScore pruning stays exact (just looser).
* `merge.compact_in_place` purges: tombstoned postings are dropped
  during the re-encode, stats recomputed from the surviving doc_stats,
  and the consumed tombstone files removed from the manifest (a
  CAS-rebase keeps tombstones committed by a racing delete). After a
  purge the index is rank- AND score-identical to a fresh build of the
  surviving corpus (pinned in tests/test_deletes.py).

The reference (k2-fsa/text_search) has no delete analog — its corpora
are immutable in-process arrays; this is the 100 TB lifecycle path
(crawl re-processing: takedowns, robots revocations, opt-outs).

Scale notes — two regimes, size-gated (round-7, VERDICT item 2):

* SMALL (takedowns, opt-outs — up to TOMBSTONE_DRIVER_MAX distinct
  ids): readers hold the union as one driver-side numpy array
  (searchsorted membership — no Python sets) and ship it in the
  scorer closure; single-query latency stays on the driver-sidecar
  fast path. This is the Lucene assumption: deletes are a small
  fraction of the corpus between compactions.
* MASS (fraction-of-corpus re-processing — robots revocations over a
  whole host, license sweeps): NOTHING materializes on the driver.
  `delete_docs(DataFrame)` writes the tombstone parquet DISTRIBUTED
  (Spark job, bounded file count), and readers exclude via
  executor-side plans — query.py cogroups the tombstones with the
  segment scan on the shard key (exclusion happens inside posting
  decode, BEFORE per-shard top-k), doc_stats anti-joins under AQE's
  strategy choice. The gate is `tombstone_rows_bound` (parquet footer
  row counts — no data read).

The compaction purge is the pressure valve for both regimes, and
`maybe_compact`-style policies can key on tombstone volume as well as
file count.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid
from typing import Iterable, List, Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import format as fmt

# Above this many tombstoned ids (bound from parquet footers, so an
# overestimate when delete batches overlap), readers stop materializing
# the union on the driver and switch to executor-side exclusion plans.
# 4M int64 ids ≈ 32 MB — same driver-comfort scale as query.py's
# DRIVER_SCORE_MAX_POSTINGS.
TOMBSTONE_DRIVER_MAX = 4_000_000

# A DataFrame delete at or under this many distinct ids collects and
# writes ONE tidy sorted file (driver path); above it, the write is a
# Spark job that never moves ids through the driver.
_DF_COLLECT_MAX = 262_144

# Target ids per tombstone parquet file in the distributed write
# (~128 MB of raw int64 per file; parquet encodes far smaller).
_IDS_PER_FILE = 16_000_000


def delete_docs(
    spark: SparkSession,
    index_dir: str,
    doc_ids: Union[DataFrame, Iterable[int]],
    id_col: str = "doc_id",
) -> int:
    """Tombstone-delete documents from the index. Returns the number of
    distinct doc_ids written to this delete's tombstone file(s) (ids
    may overlap earlier deletes or reference absent docs — readers take
    the union, absent ids are inert).

    doc_ids: a DataFrame with `id_col`, or any iterable of ints. A
    small DataFrame (<= _DF_COLLECT_MAX distinct ids) collects to one
    sorted file; a larger one is written DISTRIBUTED — distinct +
    range-partitioned Spark write landed under tombstones/ and renamed
    in, so deleting 1% of a 10^12-doc corpus never pulls 10^10 ids to
    the driver. Either way every file is fully landed BEFORE the CAS
    commit references it (same landing-then-commit order as segment
    batches), so a crash between the two leaves unreferenced files that
    never affect any reader."""
    rels: List[str]
    if isinstance(doc_ids, DataFrame):
        ids_df = (
            doc_ids.select(F.col(id_col).cast("long").alias("doc_id"))
            .where(F.col("doc_id").isNotNull())
            .distinct()
        )
        n = ids_df.count()
        if n == 0:
            return 0
        if n <= _DF_COLLECT_MAX:
            ids = np.array(
                [r[0] for r in ids_df.collect()], dtype=np.int64
            )
            rels = [_write_tombstone_file(index_dir, np.unique(ids))]
        else:
            rels = _write_tombstones_distributed(spark, index_dir, ids_df, n)
        n_written = int(n)
    else:
        ids = np.array(sorted(set(int(x) for x in doc_ids)), dtype=np.int64)
        if ids.size == 0:
            return 0
        rels = [_write_tombstone_file(index_dir, ids)]
        n_written = int(ids.size)

    def _commit(m: "fmt.IndexManifest") -> None:
        cur = list(m.tombstone_files or [])
        for rel in rels:
            if rel not in cur:
                cur.append(rel)
        m.tombstone_files = sorted(cur)

    fmt.commit_manifest(index_dir, _commit)
    return n_written


def _write_tombstone_file(index_dir: str, ids: np.ndarray) -> str:
    """Land one sorted single-column tombstone parquet; returns its
    manifest-relative path."""
    tdir = fmt.tombstones_dir(index_dir)
    os.makedirs(tdir, exist_ok=True)
    fname = f"del-{uuid.uuid4().hex[:12]}.parquet"
    tmp = os.path.join(tdir, "." + fname + ".tmp")
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, type=pa.int64())}), tmp
    )
    os.replace(tmp, os.path.join(tdir, fname))
    return f"tombstones/{fname}"


def _write_tombstones_distributed(
    spark: SparkSession, index_dir: str, ids_df: DataFrame, n: int
) -> List[str]:
    """Executor-side tombstone write: range-partition the distinct ids
    (sorted within each file — keeps the driver path's load contract),
    write to a landing dir, rename the parts into tombstones/ under one
    delete's uuid tag. The rename is the same land-then-commit pattern
    segment batches use; a crashed half-landed set is unreferenced and
    inert (vacuum's tombstone grace sweeps it)."""
    tdir = fmt.tombstones_dir(index_dir)
    os.makedirs(tdir, exist_ok=True)
    tag = f"del-{uuid.uuid4().hex[:12]}"
    tmp = os.path.join(tdir, "." + tag + ".landing")
    shutil.rmtree(tmp, ignore_errors=True)
    n_files = max(1, math.ceil(n / _IDS_PER_FILE))
    (
        ids_df.repartitionByRange(n_files, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    rels: List[str] = []
    for i, f in enumerate(sorted(os.listdir(tmp))):
        if not f.endswith(".parquet"):
            continue
        fname = f"{tag}-{i:05d}.parquet"
        os.replace(os.path.join(tmp, f), os.path.join(tdir, fname))
        rels.append(f"tombstones/{fname}")
    shutil.rmtree(tmp, ignore_errors=True)
    if not rels:  # all-null input degenerates to nothing to commit
        raise AssertionError("distributed tombstone write landed 0 files")
    return rels


def tombstone_rows_bound(index_dir: str, man: "fmt.IndexManifest") -> int:
    """Upper bound on the snapshot's distinct tombstoned ids: sum of
    parquet footer row counts (no data read — one metadata fetch per
    tombstone file). Overlapping delete batches make it an
    overestimate, which only errs toward the distributed path."""
    total = 0
    for rel in man.tombstone_files or []:
        p = os.path.join(index_dir, rel.replace("/", os.sep))
        total += pq.read_metadata(p).num_rows
    return total


def tombstones_df(
    spark: SparkSession, index_dir: str, man: "fmt.IndexManifest"
) -> Optional[DataFrame]:
    """The snapshot's tombstoned ids as a DataFrame(doc_id long) — the
    executor-side twin of load_tombstones; None when the snapshot has
    no tombstones. NOT deduplicated across files (anti-join and
    np.unique-per-group consumers don't need it; dedup here would be a
    wasted shuffle)."""
    files = man.tombstone_files or []
    if not files:
        return None
    return spark.read.schema("doc_id long").parquet(
        *(os.path.join(index_dir, rel.replace("/", os.sep)) for rel in files)
    )


def load_tombstones(index_dir: str, man: "fmt.IndexManifest") -> np.ndarray:
    """Union of a manifest's tombstoned doc_ids as ONE sorted int64
    array (empty array when none). Driver-side pyarrow read — tombstone
    files are a single int64 column, tiny next to the index."""
    files = man.tombstone_files or []
    if not files:
        return np.empty(0, dtype=np.int64)
    parts = []
    for rel in files:
        p = os.path.join(index_dir, rel.replace("/", os.sep))
        parts.append(
            pq.read_table(p, columns=["doc_id"])["doc_id"].to_numpy()
        )
    return np.unique(np.concatenate(parts).astype(np.int64))
