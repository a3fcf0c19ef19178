"""BM25 top-k query engine over the doc-sharded inverted index (M4).

The reference's "ranking operator" is a per-query candidate-document vote
(/root/reference/textsearch/python/textsearch/match.py:453-478: coverage
argmax + min-ratio gate); BM25 top-k generalizes it (SURVEY.md §2.3 J3) with
the same discipline: deterministic scores, explicit total-order tie-break
(score desc, doc_id asc).

Query plan (Spark-first):
  1. driver: normalize query terms with the canonical tokenizer; compute
     term buckets with a driver-side XXH64 (bit-identical to the build's
     F.xxhash64, no Spark job); global df per term from the PRUNED
     segments scan (postings column never read — parquet column pruning).
  2. segments scan pruned TWICE: directory pruning on term_bucket +
     parquet predicate pushdown on term — only the query terms' posting
     rows are read; the positions column is read ONLY for phrase queries.
  3. groupBy(shard).applyInPandas: each shard holds a doc-disjoint slice of
     EVERY term's postings (shard = hash(doc_id), build.py), so one group
     computes exact final BM25 scores for its docs with a FIXED per-term
     float64 summation order (rank-identity discipline, SURVEY.md §7.3),
     evaluates AND/OR/phrase semantics, and emits its local top-k.
     OR queries run block-max MaxScore pruning (prune=True): terms are
     decoded in descending max-contribution order; once the remaining
     terms' upper bounds cannot beat the running kth score, their postings
     are decoded ONLY for blocks containing current candidates (the v2
     codec's fixed-width block directory makes the skip a byte-offset
     jump). Pruned docs are PROVABLY below the kth score, and survivors
     are re-accumulated in canonical term order -> exact, rank-identical
     top-k.
  4. global merge: k*n_shards candidate rows per query -> window top-k.

No posting list ever crosses the network to another shard's scorer, and the
driver only ever sees k rows per query.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..codec import (
    B,
    BLOCK,
    K1,
    decode_block_postings,
    decode_blockmax,
    decode_positions,
    decode_selected_blocks,
)
from ..textnorm import tokenize
from . import format as fmt

# K1/B live in codec (imported above): the block-max bounds stored at
# build time (codec.tf_saturation) and the scoring here MUST share one
# definition or the MaxScore caps stop being upper bounds.


@dataclass
class QuerySpec:
    query_id: str
    terms: List[str]  # raw; normalized internally
    mode: str = "or"  # or | and | phrase | near
    window: int = 8  # near mode: max token span covering all terms


class IndexReader:
    # total decoded postings the driver-side cache may hold (LRU evict
    # beyond it; 0 disables). 8M postings ~ 200 MB of int64 arrays —
    # per reader, on the DRIVER only (executor paths never cache).
    POSTINGS_CACHE_MAX = 8_000_000

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        snapshot_id: Optional[int] = None,
    ):
        """snapshot_id pins the reader to a historical claimed snapshot
        (time travel — fmt.snapshot_history lists them): queries answer
        against exactly that commit's file set, regardless of later
        appends/compactions. A pinned reader's refresh() keeps the pin
        (Iceberg as-of-snapshot scan semantics); its data files stay
        readable until vacuum_segments/expire_snapshots retire the
        snapshot, exactly like expiring a snapshot a scan still pins."""
        self.spark = spark
        self.index_dir = index_dir
        self.snapshot_id = snapshot_id
        self.manifest = self._load_validated()
        self._df_cache: Dict[str, int] = {}
        self._segments_df: Optional[DataFrame] = None
        # term_id -> list[(docs, tfs, dls)] decoded postings, LRU via
        # OrderedDict order; bounded by total postings, not entries
        from collections import OrderedDict

        self.postings_cache_max_postings = self.POSTINGS_CACHE_MAX
        self._postings_cache: "OrderedDict[int, List[tuple]]" = (
            OrderedDict()
        )
        self._postings_cache_size = 0

    def _postings_cache_put(self, tid: int, rows: List[tuple]) -> None:
        """Insert decoded postings for one term, LRU-evicting until the
        total-postings budget holds. A single term bigger than the whole
        budget is not cached (it would evict everything for one entry)."""
        n = sum(d.size for d, _t, _l in rows)
        cap = self.postings_cache_max_postings
        if cap <= 0 or n > cap:
            return
        old = self._postings_cache.pop(tid, None)
        if old is not None:
            self._postings_cache_size -= sum(
                d.size for d, _t, _l in old
            )
        while self._postings_cache and self._postings_cache_size + n > cap:
            _etid, erows = self._postings_cache.popitem(last=False)
            self._postings_cache_size -= sum(
                d.size for d, _t, _l in erows
            )
        self._postings_cache[tid] = rows
        self._postings_cache_size += n

    def _load_validated(self) -> "fmt.IndexManifest":
        """Load + validate the manifest — shared by __init__ and
        refresh() so a reader can never silently hold a None /
        incomplete / other-format manifest (e.g. the index dir was
        deleted for a rebuild while this reader was open)."""
        if self.snapshot_id is not None:
            m = fmt.load_snapshot(self.index_dir, self.snapshot_id)
            if m is None:
                raise ValueError(
                    f"no snapshot v{self.snapshot_id} at "
                    f"{self.index_dir} (never claimed, or expired by "
                    "expire_snapshots)"
                )
        else:
            m = fmt.load_manifest(self.index_dir)
        if m is None or not m.complete:
            raise ValueError(f"no complete index at {self.index_dir}")
        if m.format_version != fmt.FORMAT_VERSION:
            raise ValueError(
                f"index format v{m.format_version} at {self.index_dir}; "
                f"this reader needs v{fmt.FORMAT_VERSION} — rebuild the "
                "index"
            )
        if (m.k1, m.b) != (K1, B):
            raise ValueError(
                f"index was built for BM25 k1={m.k1} b={m.b}; this "
                f"engine scores with k1={K1} b={B} (codec.K1/B) — "
                "block-max bounds would not match the scorer"
            )
        if m.segment_files is None and os.path.isdir(
            fmt.segments_dir(self.index_dir)
        ):
            # legacy pre-snapshot manifest on a LOCAL filesystem: pin
            # the committed-stage file walk so every reader path opens
            # exactly the committed set — a raw directory scan would
            # adopt landed-but-never-committed batchN-/compactN- orphans
            # from a crashed append/compaction, which the maintenance
            # paths (merge/incremental) deliberately exclude. Non-local
            # roots keep None: the walk cannot see them, and the
            # Spark-scan branches (which CAN read URIs) take over.
            m.segment_files = fmt.committed_files_legacy(
                self.index_dir, m.stages
            )
        return m

    def refresh(self) -> None:
        """Re-read the manifest (after incremental appends/deletes)."""
        self.manifest = self._load_validated()
        self._df_cache.clear()
        self._segments_df = None
        self._tombstones = None
        self._tomb_bound = None
        # a new snapshot may have appended segment rows to ANY term
        self._postings_cache.clear()
        self._postings_cache_size = 0

    def tombstones(self) -> np.ndarray:
        """Sorted tombstoned doc_ids of this reader's snapshot (empty
        array when none) — loaded once per reader/refresh, masked into
        every query path. The postings cache stores UNMASKED decoded
        rows (masking happens at score time), so a delete only needs a
        refresh(), never a cache-coherence protocol."""
        t = getattr(self, "_tombstones", None)
        if t is None:
            from .delete import load_tombstones

            t = load_tombstones(self.index_dir, self.manifest)
            self._tombstones = t
        return t

    def tombstone_rows_bound(self) -> int:
        """Upper bound on this snapshot's tombstoned-id count, from
        parquet footers only (cached; no id is ever read). This is THE
        regime gate (round-7, VERDICT item 2): at or under
        delete.TOMBSTONE_DRIVER_MAX every query path uses the driver
        numpy union (lowest latency); above it no path materializes
        ids on the driver — scoring cogroups tombstones with the
        segment scan, doc_stats anti-joins executor-side."""
        b = getattr(self, "_tomb_bound", None)
        if b is None:
            from .delete import tombstone_rows_bound

            b = tombstone_rows_bound(self.index_dir, self.manifest)
            self._tomb_bound = b
        return b

    def tombstones_distributed(self) -> bool:
        """True when this snapshot's tombstones exceed the driver
        regime (see tombstone_rows_bound)."""
        from .delete import TOMBSTONE_DRIVER_MAX

        return self.tombstone_rows_bound() > TOMBSTONE_DRIVER_MAX

    def tombstones_df(self) -> Optional[DataFrame]:
        """This snapshot's tombstoned ids as DataFrame(doc_id long);
        None when it has none. Executor-side twin of tombstones()."""
        from .delete import tombstones_df

        return tombstones_df(self.spark, self.index_dir, self.manifest)

    def segments(self) -> DataFrame:
        # reuse one DataFrame across queries: the file listing + parquet
        # footer reads happen once per reader, not once per query
        if self._segments_df is None:
            root = fmt.segments_dir(self.index_dir)
            files = self.manifest.segment_files
            if files is not None:
                # snapshot isolation: open exactly the manifest-committed
                # file set — part files an in-flight streaming append has
                # landed but not committed are invisible (Iceberg-style
                # snapshot read; see format.IndexManifest.segment_files).
                # basePath keeps term_bucket partition-column discovery.
                if not files:
                    self._segments_df = self.spark.createDataFrame(
                        [], fmt.SEG_READ_SCHEMA
                    )
                else:
                    self._segments_df = (
                        self.spark.read.schema(fmt.SEG_READ_SCHEMA)
                        .option("basePath", root)
                        .parquet(*(os.path.join(root, p.replace("/", os.sep)) for p in files))
                    )
            else:
                # legacy manifest (pre-snapshot): directory scan.
                # explicit schema: an empty index (zero segment files)
                # must read as an empty relation, not fail inference
                self._segments_df = self.spark.read.schema(
                    fmt.SEG_READ_SCHEMA
                ).parquet(root)
        return self._segments_df

    def segment_files_for_bucket(self, bucket: int) -> Optional[List[str]]:
        """Manifest-committed segment files (absolute paths) under one
        term_bucket partition; None on a legacy manifest (caller falls
        back to the directory scan). Empty list = committed snapshot has
        no files for this bucket."""
        files = self.manifest.segment_files
        if files is None:
            return None
        root = fmt.segments_dir(self.index_dir)
        prefix = f"term_bucket={bucket}/"  # manifest paths are always '/'
        return [
            os.path.join(root, p.replace("/", os.sep))
            for p in files
            if p.startswith(prefix)
        ]

    def term_stats(self) -> DataFrame:
        """df/cf per term: the rebuilt base table (+) this snapshot's
        committed per-batch deltas (round-7 — streamed appends maintain
        term_stats without rebuild_term_stats's full segment scan). The
        re-aggregation only exists when deltas do; a batch-built or
        freshly-rebuilt index reads the base table straight through."""
        ts_dir = fmt.term_stats_dir(self.index_dir)
        if os.path.isdir(ts_dir):
            base = self.spark.read.schema(
                fmt.TERM_STATS_READ_SCHEMA
            ).parquet(ts_dir)
        else:
            base = self.spark.createDataFrame(
                [], fmt.TERM_STATS_READ_SCHEMA
            )
        deltas = self.manifest.term_stats_delta_files
        if not deltas:
            return base
        dd = fmt.term_stats_deltas_dir(self.index_dir)
        ddf = self.spark.read.schema(fmt.TERM_STATS_READ_SCHEMA).parquet(
            *(os.path.join(dd, rel) for rel in deltas)
        )
        return (
            base.unionByName(ddf)
            .groupBy("term_id")
            .agg(
                F.min("term").alias("term"),
                F.sum("df").alias("df"),
                F.sum("cf").alias("cf"),
                F.min("term_bucket").alias("term_bucket"),
            )
            .select("term", "term_id", "df", "cf", "term_bucket")
        )

    def doc_stats(self) -> DataFrame:
        """This snapshot's doc_stats — opens exactly the manifest-
        committed file set (a pinned time-travel reader sees its own
        snapshot's rows even after a later purge landed replacement
        files; legacy manifests fall back to the dir scan), minus
        tombstoned docs."""
        root = fmt.doc_stats_dir(self.index_dir)
        files = self.manifest.doc_stats_files
        if files is not None:
            if not files:
                ds = self.spark.createDataFrame(
                    [], fmt.DOC_STATS_READ_SCHEMA
                )
            else:
                ds = self.spark.read.schema(
                    fmt.DOC_STATS_READ_SCHEMA
                ).parquet(
                    *(
                        os.path.join(root, p.replace("/", os.sep))
                        for p in files
                    )
                )
        else:
            ds = self.spark.read.schema(fmt.DOC_STATS_READ_SCHEMA).parquet(
                root
            )
        if self.tombstones_distributed():
            # MASS regime: anti-join the tombstone parquet directly —
            # ids never touch the driver; AQE picks broadcast vs
            # shuffle from the measured size at runtime
            ds = ds.join(self.tombstones_df(), "doc_id", "left_anti")
        else:
            t = self.tombstones()
            if t.size:
                # tombstoned docs are gone from every reader surface,
                # not just scoring (compaction purges rows physically)
                tomb_df = self.spark.createDataFrame(
                    [(int(x),) for x in t], "doc_id long"
                )
                ds = ds.join(F.broadcast(tomb_df), "doc_id", "left_anti")
        return ds

    def ids_for(self, terms: Sequence[str]) -> Dict[str, int]:
        """term -> term_id via a driver-side XXH64 bit-identical to the
        build's F.xxhash64 (tests/test_xxhash.py) — no Spark job, no
        vocab join."""
        from ..functions.xxhash import xxhash64_str

        return {t: xxhash64_str(t) for t in set(terms)}

    def buckets_for(self, terms: Sequence[str]) -> Dict[str, int]:
        """term -> term_bucket (pmod of the term_id)."""
        from ..functions.xxhash import pmod

        nb = self.manifest.n_buckets
        ids = self.ids_for(terms)
        return {t: pmod(i, nb) for t, i in ids.items()}

    def df_for(self, terms: Sequence[str], buckets: Dict[str, int]) -> Dict[str, int]:
        """Global df per term, cached per reader.

        Served by a DRIVER-SIDE pyarrow scan of only the query terms'
        term_bucket partitions (term_id row-group stats prune inside,
        and only term_id/df_part columns are read) — NO Spark job, so a
        query batch costs exactly one job: the scoring scan. Falls back
        to the pruned Spark scan if the local read fails (e.g. a
        non-local filesystem without a pyarrow handler)."""
        ids = self.ids_for(terms)
        missing = [t for t in set(terms) if t not in self._df_cache]
        if missing:
            blist = sorted({buckets[t] for t in missing})
            id_list = [ids[t] for t in missing]
            try:
                found = self._df_sidecar_scan(id_list, blist)
            except Exception:
                found = self._df_spark_scan(id_list, blist)
            for t in missing:
                self._df_cache[t] = found.get(ids[t], 0)
        return {t: self._df_cache[t] for t in set(terms)}

    def _df_sidecar_scan(
        self, id_list: List[int], blist: List[int]
    ) -> Dict[int, int]:
        import pyarrow.dataset as pads

        seg_root = fmt.segments_dir(self.index_dir)
        # list ONLY the needed bucket partitions — never the whole
        # segments tree (a 10^12-doc index has many buckets; a query
        # touches len(terms) of them). Per bucket: the manifest-committed
        # file set when available (snapshot isolation vs in-flight
        # appends), else the partition directory (legacy manifest).
        sources = []
        for b in blist:
            flist = self.segment_files_for_bucket(b)
            if flist is not None:
                if flist:
                    sources.append(flist)
            else:
                # legacy manifest AND non-local root (a local legacy
                # root was pinned to a file list by _load_validated):
                # os.path.isdir is False for every URI, so continuing
                # would silently return {} and cache df=0 for every
                # term — raise into the Spark-scan fallback instead,
                # which reads URIs fine
                if not os.path.isdir(seg_root):
                    raise FileNotFoundError(
                        f"{seg_root} is not a local directory — "
                        "sidecar scan unavailable for a non-local "
                        "legacy index"
                    )
                d = os.path.join(seg_root, f"term_bucket={b}")
                if os.path.isdir(d):
                    sources.append(d)
        out: Dict[int, int] = {}
        for src in sources:
            dset = pads.dataset(src, format="parquet")
            tbl = dset.to_table(
                columns=["term_id", "df_part"],
                filter=pads.field("term_id").isin(id_list),
            )
            tid = tbl["term_id"].to_numpy()
            dfp = tbl["df_part"].to_numpy()
            for t, v in zip(tid, dfp):
                out[int(t)] = out.get(int(t), 0) + int(v)
        return out

    def _df_spark_scan(
        self, id_list: List[int], blist: List[int]
    ) -> Dict[int, int]:
        rows = (
            self.segments()
            .where(
                F.col("term_bucket").isin(blist)
                & F.col("term_id").isin(id_list)
            )
            .groupBy("term_id")
            .agg(F.sum("df_part").alias("df"))
            .collect()
        )
        return {r.term_id: int(r.df) for r in rows}


def _normalize_queries(queries: Sequence[QuerySpec]) -> List[QuerySpec]:
    out = []
    for q in queries:
        terms = [nt for t in q.terms for nt in tokenize(t)]
        out.append(QuerySpec(q.query_id, terms, q.mode, q.window))
    return out


from ..codec import live_doc_mask as _live_mask, ragged_take_index


class _TermPostings:
    """All segment rows of one term within one shard (>1 row only after
    incremental appends), decoded lazily: fully, or selected-blocks-only.

    tombs: sorted tombstoned doc_ids (index/delete.py) — every decode
    surface (full / for_docs / positions_full) excludes them, so AND /
    OR / phrase / near and the MaxScore candidate generation all honor
    deletes through this one choke point. max_sat() deliberately does
    NOT re-tighten: bounds that include deleted docs are still valid
    upper bounds (pruning stays exact, just looser, until compaction
    purges)."""

    __slots__ = ("rows", "_full", "_maxsat", "avgdl_now", "tombs")

    def __init__(
        self, avgdl_now: float, tombs: Optional[np.ndarray] = None
    ):
        self.rows: List[tuple] = []  # (postings, positions, blockmax, bmav)
        self._full = None
        self._maxsat = None
        self.avgdl_now = avgdl_now
        self.tombs = tombs

    def add(self, postings, positions, blockmax, bm_avgdl):
        self.rows.append(
            (bytes(postings), positions, bytes(blockmax), float(bm_avgdl))
        )

    def max_sat(self) -> float:
        """Upper bound of the tf-saturation factor under the CURRENT avgdl.
        Sidecar bounds were computed with the row's build-time bm_avgdl;
        sat(avgdl_now) <= sat(bm_avgdl) * max(1, avgdl_now/bm_avgdl), so
        incremental appends (avgdl drift) keep the bound safe."""
        if self._maxsat is None:
            m = 0.0
            for _, _, bm, bmav in self.rows:
                _, sat = decode_blockmax(bm)
                if sat.size:
                    corr = max(1.0, self.avgdl_now / bmav) if bmav > 0 else 1.0
                    m = max(m, float(sat.max()) * corr)
            self._maxsat = m
        return self._maxsat

    def full(self):
        """-> (doc_ids, tfs, dls) merged over rows, sorted by doc_id."""
        if self._full is None:
            parts = [decode_block_postings(p) for p, _, _, _ in self.rows]
            if len(parts) == 1:
                d, t, l = parts[0]
            else:
                d = np.concatenate([p[0] for p in parts])
                t = np.concatenate([p[1] for p in parts])
                l = np.concatenate([p[2] for p in parts])
                o = np.argsort(d, kind="stable")
                d, t, l = d[o], t[o], l[o]
            keep = _live_mask(d, self.tombs)
            if keep is not None:
                d, t, l = d[keep], t[keep], l[keep]
            self._full = (d, t, l)
        return self._full

    def for_docs(self, docs: np.ndarray):
        """-> (doc_ids, tfs, dls) restricted to `docs` (sorted array),
        decoding ONLY blocks that can contain them (byte-offset skip)."""
        if self._full is not None:  # already decoded — just filter
            d, t, l = self._full
            m = np.isin(d, docs, assume_unique=True)
            return d[m], t[m], l[m]
        ds, ts, ls = [], [], []
        for pbuf, _, bm, _bmav in self.rows:
            last_doc, _ = decode_blockmax(bm)
            if last_doc.size == 0:
                continue
            blk = np.searchsorted(last_doc, docs, side="left")
            blk = np.unique(blk[blk < last_doc.size])
            if blk.size == 0:
                continue
            bases = np.where(blk > 0, last_doc[np.maximum(blk - 1, 0)], 0)
            d, t, l = decode_selected_blocks(pbuf, blk, bases)
            m = np.isin(d, docs)
            keep = _live_mask(d, self.tombs)
            if keep is not None:
                m &= keep
            ds.append(d[m])
            ts.append(t[m])
            ls.append(l[m])
        if not ds:
            e = np.empty(0, np.int64)
            return e, e.copy(), e.copy()
        d = np.concatenate(ds)
        t = np.concatenate(ts)
        l = np.concatenate(ls)
        o = np.argsort(d, kind="stable")
        return d[o], t[o], l[o]

    def positions_full(self):
        """-> (doc_ids, tfs, flat_positions) merged, doc-sorted."""
        parts = []
        for pbuf, qbuf, _, _ in self.rows:
            d, t, _ = decode_block_postings(pbuf)
            flat = decode_positions(bytes(qbuf), t)
            keep = _live_mask(d, self.tombs)
            if keep is not None:
                # drop deleted docs AND their ragged position runs
                kidx = np.flatnonzero(keep)
                take = ragged_take_index(t, kidx)
                d, t, flat = d[kidx], t[kidx], flat[take]
            parts.append((d, t, flat))
        if len(parts) == 1:
            return parts[0]
        d = np.concatenate([p[0] for p in parts])
        t = np.concatenate([p[1] for p in parts])
        order = np.argsort(d, kind="stable")
        # reorder ragged position segments to the sorted doc order
        flat_all = np.concatenate([p[2] for p in parts])
        take = ragged_take_index(t, order)
        return d[order], t[order], flat_all[take]


def _topk_tiebreak(p: np.ndarray, docs: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k best scores with ties broken by doc_id asc —
    the SAME (score desc, doc_id asc) discipline as _shard_scorer's
    lexsort, so every local selection preserves rank-identity with the
    full path. A bare np.argpartition keeps an ARBITRARY subset of
    boundary ties (e.g. duplicated pages with identical tf/dl), which
    can drop the doc the global merge's tie-break would keep."""
    if p.size <= k:
        return np.arange(p.size)
    part = np.argpartition(-p, k - 1)
    kth = p[part[k - 1]]
    cand = np.flatnonzero(p >= kth)
    order = np.lexsort((docs[cand], -p[cand]))
    return cand[order[:k]]


def _partial(w: float, tfs: np.ndarray, dls: np.ndarray, avgdl: float):
    f = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    denom = f + K1 * (1.0 - B + B * dl / avgdl)
    return (w * (f * (K1 + 1.0))) / denom


def _canonical_scores(
    terms: List[str],
    idfs: List[float],
    tp: Dict[str, "_TermPostings"],
    docs: np.ndarray,
    avgdl: float,
) -> np.ndarray:
    """Exact scores for the sorted doc array `docs`, accumulated in
    canonical (first-occurrence) term order — the oracle's float64 op
    order, so results are bit-identical regardless of pruning path."""
    acc = np.zeros(docs.size, dtype=np.float64)
    for t, w in zip(terms, idfs):
        if t not in tp:
            continue
        d, f, l = tp[t].for_docs(docs)
        if d.size == 0:
            continue
        idx = np.searchsorted(docs, d)
        acc[idx] += _partial(w, f, l, avgdl)
    return acc


def _or_candidates_pruned(
    terms: List[str],
    idfs: List[float],
    tp: Dict[str, "_TermPostings"],
    avgdl: float,
    k: int,
) -> np.ndarray:
    """Block-max MaxScore: returns a sorted doc array PROVABLY containing
    the exact top-k. Terms are fully decoded in descending upper-bound
    order only while the undeced terms' bounds could still beat the
    running kth partial score; after that, remaining terms can only
    re-score existing candidates (selected-block decode)."""
    present = [(t, w) for t, w in zip(terms, idfs) if t in tp]
    if not present:
        return np.empty(0, dtype=np.int64)
    # upper bound of a term's contribution to any doc
    caps = [w * tp[t].max_sat() for t, w in present]
    order = np.argsort([-c for c in caps], kind="stable")
    docs = np.empty(0, dtype=np.int64)
    scores = np.empty(0, dtype=np.float64)
    rest = float(sum(caps))
    for oi in order:
        t, w = present[oi]
        theta = (
            -np.inf
            if scores.size < k
            else float(np.partition(scores, scores.size - k)[scores.size - k])
        )
        if rest < theta:
            break  # no undecoded term set can create a new top-k doc
        d, f, l = tp[t].full()
        p = _partial(w, f, l, avgdl)
        new = np.setdiff1d(d, docs, assume_unique=True)
        merged = np.union1d(docs, new)
        ns = np.zeros(merged.size, dtype=np.float64)
        ns[np.searchsorted(merged, docs)] = scores
        ns[np.searchsorted(merged, d)] += p
        docs, scores = merged, ns
        rest -= caps[oi]
    return docs


def _phrase_docs(
    tp: Dict[str, "_TermPostings"], terms: List[str]
) -> np.ndarray:
    """Docs (within this shard) containing terms consecutively: positional
    intersection on (doc, pos) pairs via a dense local doc index."""
    for t in terms:
        if t not in tp:
            return np.empty(0, dtype=np.int64)
    dec = {t: tp[t].positions_full() for t in set(terms)}
    all_docs = np.unique(np.concatenate([dec[t][0] for t in terms]))

    # pack (local doc index, position) into one int64 for the n-way
    # intersection; the shift adapts to the longest document so packing
    # never overflows silently (>2^22-token docs exist at web scale)
    max_pos = max(
        (int(dec[t][2].max()) if dec[t][2].size else 0) for t in set(terms)
    )
    shift = max(22, max_pos.bit_length())
    if int(all_docs.size) >= (1 << (63 - shift)):
        raise OverflowError(
            f"phrase packing overflow: {all_docs.size} candidate docs with "
            f"positions up to {max_pos} exceed int64 packing"
        )

    def pairs(t: str, k: int) -> np.ndarray:
        doc_ids, tfs, flat_pos = dec[t]
        docs_rep = np.repeat(np.searchsorted(all_docs, doc_ids), tfs)
        p = flat_pos - k
        keep = p >= 0
        return docs_rep[keep] * (1 << shift) + p[keep]

    inter = pairs(terms[0], 0)
    for k, t in enumerate(terms[1:], start=1):
        inter = np.intersect1d(inter, pairs(t, k))
        if inter.size == 0:
            return np.empty(0, dtype=np.int64)
    return all_docs[np.unique(inter >> shift)]


def _near_docs(
    tp: Dict[str, "_TermPostings"], terms: List[str], window: int
) -> np.ndarray:
    """Docs (within this shard) where one occurrence of every distinct term
    fits in a token window <= `window` (minimal-covering-window sweep per
    candidate doc; candidates pre-filtered by the AND intersection)."""
    uterms = list(dict.fromkeys(terms))
    for t in uterms:
        if t not in tp:
            return np.empty(0, dtype=np.int64)
    dec = {t: tp[t].positions_full() for t in uterms}
    docs = None
    for t in uterms:
        d = dec[t][0]
        docs = d if docs is None else np.intersect1d(docs, d, assume_unique=True)
        if docs.size == 0:
            return np.empty(0, dtype=np.int64)
    m = len(uterms)
    if m == 1:
        return docs

    # fully vectorized minimal-covering-window sweep over ALL candidate
    # docs at once: positions are globalized per doc with a span gap
    # wider than the window (so windows never cross docs), events are
    # sorted once, and for each event we ask whether every term has an
    # occurrence within [pos - window, pos] via per-term running maxima.
    g_parts: List[np.ndarray] = []
    t_parts: List[np.ndarray] = []
    d_parts: List[np.ndarray] = []
    pos_parts = []
    max_pos = 0
    for t in uterms:
        d, tf, flat = dec[t]
        idx = np.searchsorted(d, docs)  # docs ⊆ d per the intersection
        lens = tf[idx]
        pos_v = flat[ragged_take_index(tf, idx)]
        pos_parts.append((pos_v, np.repeat(np.arange(docs.size), lens)))
        if pos_v.size:
            max_pos = max(max_pos, int(pos_v.max()))
    span = np.int64(max_pos + window + 2)
    if float(docs.size) * float(span) >= 2**53:  # float64 exactness bound
        raise OverflowError("near packing overflow")  # pragma: no cover
    for i, (pos_v, doc_rep) in enumerate(pos_parts):
        g_parts.append(doc_rep.astype(np.int64) * span + pos_v)
        t_parts.append(np.full(pos_v.size, i, dtype=np.int8))
        d_parts.append(doc_rep)
    g_all = np.concatenate(g_parts)
    t_all = np.concatenate(t_parts)
    d_all = np.concatenate(d_parts)
    order = np.argsort(g_all, kind="stable")
    gs = g_all[order].astype(np.float64)  # < 2^62 guarded; exact < 2^53
    ts_lbl = t_all[order]
    min_last = np.full(gs.size, np.inf)
    for k in range(m):
        vals = np.where(ts_lbl == k, gs, -np.inf)
        np.maximum.accumulate(vals, out=vals)
        np.minimum(min_last, vals, out=min_last)
    hit = gs - min_last <= window
    return docs[np.unique(d_all[order][hit])]


def _shard_scorer(
    plan,
    avgdl: float,
    k: int,
    prune: bool,
    tombs: Optional[np.ndarray] = None,
):
    """applyInPandas fn for one shard group.

    plan: list of (query_id, mode, [distinct terms, fixed order], [idfs],
    phrase_seq). Input: (shard, term, postings, positions?, blockmax) rows.
    Output: (query_id, doc_id, score) — the shard-local exact top-k.

    tombs (sorted np.int64, pickled into the UDF closure): tombstoned
    doc_ids every decode excludes. Ships with the task like the plan
    itself — correct only in the SMALL-tombstone regime
    (delete.TOMBSTONE_DRIVER_MAX); above it _shard_topk_candidates
    switches to _shard_scorer_cogrouped, which receives each shard's
    tombstones as cogrouped DATA instead of closure bytes."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_shard_pdf(pdf, plan, avgdl, k, prune, tombs)

    return score


def _shard_scorer_cogrouped(plan, avgdl: float, k: int, prune: bool):
    """applyInPandas fn for one cogrouped (segments, tombstones) shard
    group — the MASS-delete twin of _shard_scorer (round-7, VERDICT
    item 2): each group's tombstoned ids arrive as the right-side
    DataFrame rows (one shard's slice, ~n_tombs/n_shards ids), so the
    full union never exists on the driver OR in any task closure.
    Exclusion still happens inside posting decode, BEFORE the
    shard-local top-k — identical semantics to the closure path
    (pinned in tests/test_deletes.py)."""

    def score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        tombs = (
            np.unique(right["doc_id"].to_numpy(dtype=np.int64, copy=False))
            if len(right)
            else None
        )
        return _score_shard_pdf(left, plan, avgdl, k, prune, tombs)

    return score


def _score_shard_pdf(
    pdf: pd.DataFrame,
    plan,
    avgdl: float,
    k: int,
    prune: bool,
    tombs: Optional[np.ndarray],
) -> pd.DataFrame:
    has_pos = "positions" in pdf.columns
    tp: Dict[int, _TermPostings] = {}
    for i in range(len(pdf)):
        term = int(pdf["term_id"].iat[i])
        tp.setdefault(term, _TermPostings(avgdl, tombs)).add(
            pdf["postings"].iat[i],
            pdf["positions"].iat[i] if has_pos else b"",
            pdf["blockmax"].iat[i],
            pdf["bm_avgdl"].iat[i],
        )
    out_q: List[str] = []
    out_d: List[int] = []
    out_s: List[float] = []
    for query_id, mode, terms, idfs, phrase_seq, window in plan:
        present = [t for t in terms if t in tp]
        if not present:
            continue
        if mode in ("and", "phrase", "near") and len(present) != len(
            terms
        ):
            continue
        if mode == "and":
            docs = None
            for t in terms:
                d = tp[t].full()[0]
                docs = d if docs is None else np.intersect1d(
                    docs, d, assume_unique=True
                )
                if docs.size == 0:
                    break
            if docs is None or docs.size == 0:
                continue
        elif mode == "phrase":
            docs = _phrase_docs(tp, phrase_seq)
            if docs.size == 0:
                continue
        elif mode == "near":
            docs = _near_docs(tp, terms, window)
            if docs.size == 0:
                continue
        elif prune and len(present) > 1:
            docs = _or_candidates_pruned(terms, idfs, tp, avgdl, k)
        else:
            docs = np.unique(
                np.concatenate([tp[t].full()[0] for t in present])
            )
        if docs.size == 0:
            continue
        acc = _canonical_scores(terms, idfs, tp, docs, avgdl)
        order = np.lexsort((docs, -acc))[:k]
        out_q.extend([query_id] * order.size)
        out_d.extend(docs[order].tolist())
        out_s.extend(acc[order].tolist())
    return pd.DataFrame(
        {"query_id": out_q, "doc_id": out_d, "score": out_s}
    )


def _shard_topk_candidates(
    spark: SparkSession,
    index_dir: str,
    queries: Sequence[QuerySpec],
    k: int,
    reader: Optional[IndexReader],
    prune: bool,
) -> Optional[DataFrame]:
    """Shared plan: pruned segments scan -> per-shard exact top-k rows
    (query_id, doc_id, score), k rows per (query, shard). None = no
    query term hits the index."""
    r = reader or IndexReader(spark, index_dir)
    man = r.manifest
    qs = _normalize_queries(queries)
    all_terms = sorted({t for q in qs for t in q.terms})
    buckets = r.buckets_for(all_terms)
    dfs = r.df_for(all_terms, buckets)
    n, avgdl = man.n_docs, man.avgdl

    def idf(t: str) -> float:
        d = dfs.get(t, 0)
        return math.log(1.0 + (n - d + 0.5) / (d + 0.5))

    ids = r.ids_for(all_terms)
    plan = []
    need_pos = False
    for q in qs:
        uterms: Dict[str, None] = {}
        for t in q.terms:
            uterms.setdefault(t, None)
        terms = list(uterms)
        if not terms:
            continue
        seq = [ids[t] for t in q.terms] if q.mode == "phrase" else None
        need_pos = need_pos or q.mode in ("phrase", "near")
        plan.append(
            (
                q.query_id,
                q.mode,
                [ids[t] for t in terms],
                [idf(t) for t in terms],
                seq,
                q.window,
            )
        )

    hit_terms = [t for t in all_terms if dfs.get(t, 0) > 0]
    if not plan or not hit_terms:
        return None

    blist = sorted({buckets[t] for t in hit_terms})
    seg = r.segments().where(
        F.col("term_bucket").isin(blist)
        & F.col("term_id").isin([ids[t] for t in hit_terms])
    )
    cols = ["shard", "term_id", "postings", "blockmax", "bm_avgdl"] + (
        ["positions"] if need_pos else []
    )
    out_schema = "query_id string, doc_id long, score double"
    if r.tombstones_distributed():
        # MASS-delete regime: tombstones reach each scorer group as
        # cogrouped DATA, partitioned by the same doc-shard key the
        # index uses — never via the driver or task closures. Both
        # sides group on pmod(·, n_shards) rather than the raw shard
        # column: n_shards only ever SHRINKS (compaction), so the
        # current value divides every historical batch's numbering and
        # the fold sends a doc's segment rows and its tombstone row to
        # the same group even when an append landed under a pre-
        # compaction numbering (the "appended docs carry their own
        # shard numbering" contract in merge.py).
        ns = man.n_shards
        sgrp = F.pmod(F.col("shard"), F.lit(ns)).cast("int").alias("sgrp")
        tomb_sdf = r.tombstones_df().select(
            F.pmod(F.xxhash64("doc_id"), F.lit(ns))
            .cast("int")
            .alias("sgrp"),
            "doc_id",
        )
        return (
            seg.select(sgrp, *cols)
            .groupBy("sgrp")
            .cogroup(tomb_sdf.groupBy("sgrp"))
            .applyInPandas(
                _shard_scorer_cogrouped(plan, avgdl, k, prune),
                schema=out_schema,
            )
        )
    return (
        seg.select(*cols)
        .groupBy("shard")
        .applyInPandas(
            _shard_scorer(plan, avgdl, k, prune, tombs=r.tombstones()),
            schema=out_schema,
        )
    )


def bm25_topk_df(
    spark: SparkSession,
    index_dir: str,
    queries: Sequence[QuerySpec],
    k: int = 10,
    reader: Optional[IndexReader] = None,
    prune: bool = True,
) -> DataFrame:
    """-> DataFrame(query_id string, rank int, doc_id long, score double).

    Composable (stays a DataFrame for downstream joins); the global
    merge is a window over k*n_shards candidate rows per query."""
    cand = _shard_topk_candidates(spark, index_dir, queries, k, reader, prune)
    if cand is None:
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id long, score double"
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


# above this pruned-postings volume the single-term fast path stays on
# executors (a stop-word term at 10^12 docs must never be pulled to the
# driver); below it, driver-side decode beats any Spark job's floor
DRIVER_SCORE_MAX_POSTINGS = 4_000_000


def _score_single_term_local(
    reader: "IndexReader",
    qplan: Dict[int, List[Tuple[str, float]]],
    avgdl: float,
    k: int,
    phase_sink: Optional[Dict[str, float]] = None,
):
    """Driver-side single-term scoring over the pyarrow sidecar scan:
    yields (query_id, doc_id, score) candidate rows (per-row top-k; rows
    of one term are doc-disjoint). Bounded by DRIVER_SCORE_MAX_POSTINGS.

    phase_sink: optional dict accumulating wall seconds for the two
    sub-phases ("read_s" = pyarrow dataset open + filtered to_table,
    "score_s" = posting decode + BM25 partial + top-k) — bench
    triage instrumentation, zero cost when None. Cache hits skip
    read_s entirely (the phase table is how the cache's effect shows
    up in BENCH).

    Decoded postings are cached per term on the reader (LRU, bounded
    by reader.postings_cache_max_postings total postings): the phase
    triage showed the sidecar READ is ~85% of single-query latency, so
    a repeated term answers from memory at score+merge cost only.
    refresh() invalidates (a new snapshot may append rows to any
    term)."""
    import os
    import time as _time

    import pyarrow.dataset as pads

    from ..functions.xxhash import pmod

    seg_root = fmt.segments_dir(reader.index_dir)
    cache = reader._postings_cache
    id_list = sorted(qplan)
    missing = [t for t in id_list if t not in cache]
    fetched: Dict[int, List[tuple]] = {}
    if missing:
        nb = reader.manifest.n_buckets
        need_buckets = sorted({pmod(t, nb) for t in missing})
        for b in need_buckets:
            flist = reader.segment_files_for_bucket(b)
            if flist is not None:
                if not flist:
                    continue
                src = flist  # manifest-committed snapshot file set
            else:
                if not os.path.isdir(seg_root):
                    raise FileNotFoundError(
                        f"{seg_root} is not a local directory — "
                        "driver sidecar scoring unavailable for a "
                        "non-local legacy index"
                    )
                src = os.path.join(seg_root, f"term_bucket={b}")
                if not os.path.isdir(src):
                    continue
            t0 = _time.perf_counter() if phase_sink is not None else 0.0
            tbl = pads.dataset(src, format="parquet").to_table(
                columns=["term_id", "postings"],
                filter=pads.field("term_id").isin(missing),
            )
            if phase_sink is not None:
                phase_sink["read_s"] = (
                    phase_sink.get("read_s", 0.0)
                    + _time.perf_counter()
                    - t0
                )
            tids = tbl["term_id"].to_numpy()
            posts = tbl["postings"].to_pylist()
            t1 = _time.perf_counter() if phase_sink is not None else 0.0
            for tid, pbuf in zip(tids, posts):
                docs, tfs, dls = decode_block_postings(bytes(pbuf))
                if docs.size:
                    fetched.setdefault(int(tid), []).append(
                        (docs, tfs, dls)
                    )
            if phase_sink is not None:
                phase_sink["score_s"] = (
                    phase_sink.get("score_s", 0.0)
                    + _time.perf_counter()
                    - t1
                )
        for t in missing:
            # absent terms cache an empty list too — df>0 should make
            # that impossible, but re-reading every query would be the
            # worse failure mode
            reader._postings_cache_put(t, fetched.get(t, []))
    t1 = _time.perf_counter() if phase_sink is not None else 0.0
    out: List[Tuple[str, int, float]] = []
    for tid in id_list:
        rows = cache.get(tid)
        if rows is None:
            rows = fetched.get(tid, [])
        else:
            cache.move_to_end(tid)  # LRU touch
        specs = qplan[tid]
        tombs = reader.tombstones()
        for docs, tfs, dls in rows:
            keep = _live_mask(docs, tombs)
            if keep is not None:
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            if docs.size == 0:
                continue
            for query_id, w in specs:
                p = _partial(w, tfs, dls, avgdl)
                idx = _topk_tiebreak(p, docs, k)
                out.extend(
                    (query_id, int(docs[j]), float(p[j])) for j in idx
                )
    if phase_sink is not None:
        phase_sink["score_s"] = (
            phase_sink.get("score_s", 0.0) + _time.perf_counter() - t1
        )
    return out


def _single_term_scorer(qplan: Dict[int, List[Tuple[str, float]]],
                        avgdl: float, k: int,
                        tombs: Optional[np.ndarray] = None):
    """mapInPandas fn scoring single-term queries row-by-row: every
    segment row is doc-disjoint from every other row of the same term
    (doc-sharded build; incremental appends add new docs), so a per-row
    top-k is an exact local top-k and no shuffle is needed."""

    def score(batches):
        for pdf in batches:
            out_q: List[str] = []
            out_d: List[int] = []
            out_s: List[float] = []
            for i in range(len(pdf)):
                specs = qplan.get(int(pdf["term_id"].iat[i]))
                if not specs:
                    continue
                d, f, l = decode_block_postings(bytes(pdf["postings"].iat[i]))
                keep = _live_mask(d, tombs)
                if keep is not None:
                    d, f, l = d[keep], f[keep], l[keep]
                if d.size == 0:
                    continue
                for query_id, w in specs:
                    p = _partial(w, f, l, avgdl)
                    idx = _topk_tiebreak(p, d, k)
                    out_q.extend([query_id] * idx.size)
                    out_d.extend(d[idx].tolist())
                    out_s.extend(p[idx].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "doc_id": out_d, "score": out_s}
            )

    return score


def bm25_topk_rows(
    spark: SparkSession,
    index_dir: str,
    queries: Sequence[QuerySpec],
    k: int = 10,
    reader: Optional[IndexReader] = None,
    prune: bool = True,
    phase_sink: Optional[Dict[str, float]] = None,
) -> List[Tuple[str, int, int, float]]:
    """Low-latency variant: the global merge runs driver-side over the
    collected candidate rows (the reference's bounded-heap global merge,
    SURVEY §2.5 T3) instead of a second shuffle. When EVERY query in the
    batch is single-term, scoring happens inside the scan stage itself
    (segment rows are doc-disjoint per term) — one shuffle-free stage
    per batch. Rank- and score-identical to bm25_topk_df in both paths
    (same float64 ops, same total order).

    phase_sink: optional dict; when given, accumulates wall seconds per
    phase ("plan_s" df/bucket lookups + weight planning, "read_s"
    sidecar parquet read, "score_s" decode+score, "merge_s" driver
    merge) and records "path" = driver_sidecar | scan_stage |
    shard_topk. Bench triage instrumentation (BENCH.md round-5);
    zero overhead when None.

    -> [(query_id, rank, doc_id, score)]"""
    import time as _time

    _t_start = _time.perf_counter() if phase_sink is not None else 0.0
    r = reader or IndexReader(spark, index_dir)
    qs = _normalize_queries(queries)
    all_single = (
        all(
            len(set(q.terms)) == 1 and q.mode in ("or", "and") for q in qs
        )
        and len(qs) > 0
        # MASS-delete regime: both single-term paths (driver sidecar,
        # scan-stage closure) need the driver numpy tombstone union —
        # above the gate they'd materialize it, so the batch routes to
        # the cogrouped shard path instead (exact, fully distributed;
        # higher per-query floor, which is the documented trade until
        # compaction purges)
        and not r.tombstones_distributed()
    )
    rows_iter = None
    if all_single:
        all_terms = sorted({t for q in qs for t in q.terms})
        buckets = r.buckets_for(all_terms)
        dfs = r.df_for(all_terms, buckets)
        man = r.manifest
        n, avgdl = man.n_docs, man.avgdl
        ids = r.ids_for(all_terms)
        qplan: Dict[int, List[Tuple[str, float]]] = {}
        for q in qs:
            t = q.terms[0]
            d = dfs.get(t, 0)
            if d <= 0:
                continue
            w = math.log(1.0 + (n - d + 0.5) / (d + 0.5))
            qplan.setdefault(ids[t], []).append((q.query_id, w))
        if not qplan:
            return []
        blist = sorted({buckets[t] for t in all_terms if dfs.get(t, 0) > 0})
        total_df = sum(dfs.get(t, 0) for t in all_terms)
        if phase_sink is not None:
            phase_sink["plan_s"] = (
                phase_sink.get("plan_s", 0.0)
                + _time.perf_counter()
                - _t_start
            )
        if total_df <= DRIVER_SCORE_MAX_POSTINGS:
            # small pruned volume (known exactly from df): read the
            # posting rows through the pyarrow sidecar and score on the
            # driver — NO Spark job at all (~ms, the real latency path).
            # Fallback is for ENVIRONMENTAL failures only (non-local
            # fs, missing pyarrow handler) — a genuine defect (codec
            # corruption, bad manifest) must surface, not silently
            # downgrade to the Spark path; the failed attempt's partial
            # phase timings are rolled back so triage numbers stay
            # attributable.
            import pyarrow as _pa

            saved = dict(phase_sink) if phase_sink is not None else None
            try:
                rows_iter = _score_single_term_local(
                    r, qplan, avgdl, k, phase_sink=phase_sink
                )
                if phase_sink is not None:
                    phase_sink["path"] = "driver_sidecar"
            except (OSError, NotImplementedError, _pa.ArrowException):
                rows_iter = None
                if phase_sink is not None:
                    phase_sink.clear()
                    phase_sink.update(saved)
        if rows_iter is None:
            # big terms / non-local fs: shuffle-free scan-stage scoring
            # (segment rows are doc-disjoint per term -> exact)
            cand = (
                r.segments()
                .where(
                    F.col("term_bucket").isin(blist)
                    & F.col("term_id").isin(sorted(qplan))
                )
                .select("term_id", "postings")
                .mapInPandas(
                    _single_term_scorer(qplan, avgdl, k, tombs=r.tombstones()),
                    schema="query_id string, doc_id long, score double",
                )
            )
            rows_iter = (
                (row.query_id, row.doc_id, row.score)
                for row in cand.collect()
            )
            if phase_sink is not None:
                phase_sink["path"] = "scan_stage"
    else:
        cand = _shard_topk_candidates(
            spark, index_dir, queries, k, r, prune
        )
        if cand is None:
            return []
        rows_iter = (
            (row.query_id, row.doc_id, row.score) for row in cand.collect()
        )
        if phase_sink is not None:
            phase_sink["path"] = "shard_topk"
    _t_merge = _time.perf_counter() if phase_sink is not None else 0.0
    by_q: Dict[str, List[Tuple[float, int]]] = {}
    for qid, doc_id, score in rows_iter:
        by_q.setdefault(qid, []).append((score, doc_id))
    out: List[Tuple[str, int, int, float]] = []
    for qid in sorted(by_q):
        rows = sorted(by_q[qid], key=lambda x: (-x[0], x[1]))[:k]
        out.extend(
            (qid, rank, doc_id, score)
            for rank, (score, doc_id) in enumerate(rows, start=1)
        )
    if phase_sink is not None:
        phase_sink["merge_s"] = (
            phase_sink.get("merge_s", 0.0)
            + _time.perf_counter()
            - _t_merge
        )
    return out
