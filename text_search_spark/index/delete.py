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

Scale notes: a tombstone file is one sorted int64 column; readers hold
the union as one numpy array (searchsorted membership — no Python
sets). Deletes are assumed a small fraction of the corpus between
compactions (the Lucene assumption); the compaction purge is the
pressure valve, and `maybe_compact`-style policies can key on
tombstone volume as well as file count.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterable, Union

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from . import format as fmt


def delete_docs(
    spark: SparkSession,
    index_dir: str,
    doc_ids: Union[DataFrame, Iterable[int]],
    id_col: str = "doc_id",
) -> int:
    """Tombstone-delete documents from the index. Returns the number of
    distinct doc_ids written to this delete's tombstone file (ids may
    overlap earlier deletes or reference absent docs — readers take the
    union, absent ids are inert).

    doc_ids: a DataFrame with `id_col`, or any iterable of ints. The
    tombstone file is written fully BEFORE the CAS commit references it
    (same landing-then-commit order as segment batches), so a crash
    between the two leaves an unreferenced file that never affects any
    reader."""
    if isinstance(doc_ids, DataFrame):
        ids = np.array(
            [r[0] for r in doc_ids.select(id_col).distinct().collect()],
            dtype=np.int64,
        )
    else:
        ids = np.array(sorted(set(int(x) for x in doc_ids)), dtype=np.int64)
    ids = np.unique(ids)
    if ids.size == 0:
        return 0

    tdir = fmt.tombstones_dir(index_dir)
    os.makedirs(tdir, exist_ok=True)
    fname = f"del-{uuid.uuid4().hex[:12]}.parquet"
    tmp = os.path.join(tdir, "." + fname + ".tmp")
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, type=pa.int64())}), tmp
    )
    os.replace(tmp, os.path.join(tdir, fname))
    rel = f"tombstones/{fname}"

    def _commit(m: "fmt.IndexManifest") -> None:
        cur = list(m.tombstone_files or [])
        if rel not in cur:
            cur.append(rel)
        m.tombstone_files = sorted(cur)

    fmt.commit_manifest(index_dir, _commit)
    return int(ids.size)


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
