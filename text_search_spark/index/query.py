"""BM25 top-k query engine over the doc-sharded inverted index (M4).

The reference's "ranking operator" is a per-query candidate-document vote
(/root/reference/textsearch/python/textsearch/match.py:453-478: coverage
argmax + min-ratio gate); BM25 top-k generalizes it (SURVEY.md §2.3 J3) with
the same discipline: deterministic scores, explicit total-order tie-break
(score desc, doc_id asc).

Query plan (Spark-first):
  1. driver: normalize query terms with the canonical tokenizer; compute
     idf from term_stats (partition-pruned + predicate-pushdown scan);
     O(|distinct terms|) rows collected — tiny.
  2. segments scan pruned TWICE: directory pruning on term_bucket +
     parquet predicate pushdown on term — reads only the posting lists of
     the query terms, never the index.
  3. groupBy(shard).applyInPandas: each shard holds a doc-disjoint slice of
     EVERY term's postings (shard = hash(doc_id), build.py), so one group
     computes exact final BM25 scores for its docs with a FIXED per-term
     float64 summation order (rank-identity discipline, SURVEY.md §7.3),
     evaluates AND/OR/phrase semantics, optionally applies block-max
     pruning, and emits its local top-k.
  4. global merge: k*n_shards candidate rows per query -> window top-k.
     (TakeOrderedAndProject-shaped: bounded heap per shard, tiny merge —
     same shape as the reference's bounded-heap top-k, match.py:870-882.)

No posting list ever crosses the network to another shard's scorer, and the
driver only ever sees k rows per query.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..codec import decode_postings_flat
from ..textnorm import tokenize
from . import format as fmt

K1 = 1.2
B = 0.75


@dataclass
class QuerySpec:
    query_id: str
    terms: List[str]  # raw; normalized internally
    mode: str = "or"  # or | and | phrase


class IndexReader:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        m = fmt.load_manifest(index_dir)
        if m is None or not m.complete:
            raise ValueError(f"no complete index at {index_dir}")
        self.manifest = m
        self._df_cache: Dict[str, int] = {}

    def segments(self) -> DataFrame:
        return self.spark.read.parquet(fmt.segments_dir(self.index_dir))

    def term_stats(self) -> DataFrame:
        return self.spark.read.parquet(fmt.term_stats_dir(self.index_dir))

    def doc_stats(self) -> DataFrame:
        return self.spark.read.parquet(fmt.doc_stats_dir(self.index_dir))

    def buckets_for(self, terms: Sequence[str]) -> Dict[str, int]:
        """term -> term_bucket via a driver-side XXH64 bit-identical to the
        build's F.xxhash64 (tests/test_xxhash.py) — no Spark job."""
        from ..functions.xxhash import pmod, xxhash64_str

        nb = self.manifest.n_buckets
        return {t: pmod(xxhash64_str(t), nb) for t in set(terms)}

    def df_for(self, terms: Sequence[str], buckets: Dict[str, int]) -> Dict[str, int]:
        """Global df per term, summed from the PRUNED segments scan (postings
        column never read — parquet column pruning), cached per reader."""
        missing = [t for t in set(terms) if t not in self._df_cache]
        if missing:
            blist = sorted({buckets[t] for t in missing})
            rows = (
                self.segments()
                .where(
                    F.col("term_bucket").isin(blist)
                    & F.col("term").isin(missing)
                )
                .groupBy("term")
                .agg(F.sum("df_part").alias("df"))
                .collect()
            )
            found = {r.term: int(r.df) for r in rows}
            for t in missing:
                self._df_cache[t] = found.get(t, 0)
        return {t: self._df_cache[t] for t in set(terms)}


def _normalize_queries(queries: Sequence[QuerySpec]) -> List[QuerySpec]:
    out = []
    for q in queries:
        terms = [nt for t in q.terms for nt in tokenize(t)]
        out.append(QuerySpec(q.query_id, terms, q.mode))
    return out


def _shard_scorer(plan, avgdl: float, k: int):
    """applyInPandas fn for one shard group.

    plan: list of (query_id, mode, [distinct terms, fixed order], [idfs],
    phrase_seq) where phrase_seq is the full in-order term sequence for
    phrase intersection (None otherwise).
    Input: (shard, term, postings) rows. Output: (query_id, doc_id, score).
    """

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        decoded: Dict[str, tuple] = {}
        for term, buf in zip(pdf["term"], pdf["postings"]):
            if term not in decoded:
                decoded[term] = decode_postings_flat(bytes(buf))
        out_q: List[str] = []
        out_d: List[int] = []
        out_s: List[float] = []
        for query_id, mode, terms, idfs, phrase_seq in plan:
            present = [t for t in terms if t in decoded]
            if not present:
                continue
            if mode in ("and", "phrase") and len(present) != len(terms):
                continue
            # candidate doc set
            if mode == "and":
                allowed = None
                for t in terms:
                    d = decoded[t][0]
                    allowed = d if allowed is None else np.intersect1d(
                        allowed, d, assume_unique=True
                    )
                    if allowed.size == 0:
                        break
                if allowed is None or allowed.size == 0:
                    continue
            elif mode == "phrase":
                allowed = _phrase_docs(decoded, phrase_seq)
                if allowed.size == 0:
                    continue
            else:
                allowed = None

            # union doc space for dense accumulation
            doc_union = np.unique(
                np.concatenate([decoded[t][0] for t in present])
            )
            if allowed is not None:
                doc_union = np.intersect1d(
                    doc_union, allowed, assume_unique=True
                )
                if doc_union.size == 0:
                    continue
            acc = np.zeros(doc_union.size, dtype=np.float64)
            for t, w in zip(terms, idfs):
                if t not in decoded:
                    continue
                doc_ids, tfs, _, dls = decoded[t]
                if allowed is not None:
                    m = np.isin(doc_ids, doc_union, assume_unique=True)
                    doc_ids, tfs, dls = doc_ids[m], tfs[m], dls[m]
                    if doc_ids.size == 0:
                        continue
                f = tfs.astype(np.float64)
                dl = dls.astype(np.float64)
                denom = f + K1 * (1.0 - B + B * dl / avgdl)
                partial = (w * (f * (K1 + 1.0))) / denom
                idx = np.searchsorted(doc_union, doc_ids)
                acc[idx] += partial
            # local top-k with total-order tie-break (score desc, doc_id asc)
            order = np.lexsort((doc_union, -acc))[:k]
            out_q.extend([query_id] * order.size)
            out_d.extend(doc_union[order].tolist())
            out_s.extend(acc[order].tolist())
        return pd.DataFrame(
            {"query_id": out_q, "doc_id": out_d, "score": out_s}
        )

    return score


def _phrase_docs(decoded: Dict[str, tuple], terms: List[str]) -> np.ndarray:
    """Docs (within this shard) containing terms consecutively: positional
    intersection on (doc, pos) pairs via a dense local doc index."""
    for t in terms:
        if t not in decoded:
            return np.empty(0, dtype=np.int64)
    all_docs = np.unique(np.concatenate([decoded[t][0] for t in terms]))

    def pairs(t: str, k: int) -> np.ndarray:
        doc_ids, tfs, flat_pos, _ = decoded[t]
        docs_rep = np.repeat(np.searchsorted(all_docs, doc_ids), tfs)
        p = flat_pos - k
        keep = p >= 0
        return docs_rep[keep] * (1 << 22) + p[keep]

    inter = pairs(terms[0], 0)
    for k, t in enumerate(terms[1:], start=1):
        inter = np.intersect1d(inter, pairs(t, k))
        if inter.size == 0:
            return np.empty(0, dtype=np.int64)
    return all_docs[np.unique(inter >> 22)]


def bm25_topk_df(
    spark: SparkSession,
    index_dir: str,
    queries: Sequence[QuerySpec],
    k: int = 10,
    reader: Optional[IndexReader] = None,
) -> DataFrame:
    """-> DataFrame(query_id string, rank int, doc_id long, score double)."""
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

    plan = []
    for q in qs:
        uterms: Dict[str, None] = {}
        for t in q.terms:
            uterms.setdefault(t, None)
        terms = list(uterms)
        if not terms:
            continue
        seq = q.terms if q.mode == "phrase" else None
        plan.append((q.query_id, q.mode, terms, [idf(t) for t in terms], seq))

    hit_terms = [t for t in all_terms if dfs.get(t, 0) > 0]
    if not plan or not hit_terms:
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id long, score double"
        )

    blist = sorted({buckets[t] for t in hit_terms})
    seg = r.segments().where(
        F.col("term_bucket").isin(blist) & F.col("term").isin(hit_terms)
    )
    # phrase mode dedup: scorer handles repeated terms via decoded dict
    cand = seg.select("shard", "term", "postings").groupBy("shard").applyInPandas(
        _shard_scorer(plan, avgdl, k),
        schema="query_id string, doc_id long, score double",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
