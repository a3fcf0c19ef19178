"""Span matching / fuzzy alignment operators (SURVEY.md §2.3 J1-J5, M7).

Re-expresses the reference's query pipeline `align_queries`
(/root/reference/textsearch/python/textsearch/match.py:344-523) as a Spark
operator over (query, candidate-doc) pairs:

  reference:  suffix array -> find_close_matches -> LIS chain -> candidate
              doc vote -> segment -> infix Levenshtein -> merge
  here:       candidate docs come from the inverted index (BM25 top-k or a
              caller-provided pairing); the per-pair exact work (close
              matches over a per-pair suffix array, LIS chaining, infix
              Levenshtein) runs in a grouped Arrow UDF — per-group input is
              ONE query x ONE doc, so the quadratic/log-linear kernels stay
              tiny and local, exactly like the reference bounds its DP cost
              by segmenting (match.py:482-491).

The kernels themselves are golden-pinned against the reference's own test
vectors (tests/test_kernels.py).
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import (
    create_suffix_array,
    find_close_matches,
    get_longest_increasing_pairs,
    levenshtein_distance,
)

ALIGN_SCHEMA = (
    "query_id string, doc_id long, n_matched int, q_start int, q_end int, "
    "t_start int, t_end int, distance int, align string"
)


def _align_pair(
    query_text: str, doc_text: str, num_close_matches: int = 4
) -> tuple:
    """One (query, doc) alignment: returns (n_matched, q_start, q_end,
    t_start, t_end, distance, align_str) or None when nothing chains.

    Pipeline mirrors match.py:399-514 at per-pair scale: concatenate query
    + doc codepoints, suffix-array close matches (J1), LIS chain (J2),
    bounding box -> infix Levenshtein on the spanned doc slice (J4)."""
    q = np.array([ord(c) for c in query_text], dtype=np.int32)
    t = np.array([ord(c) for c in doc_text], dtype=np.int32)
    if q.size == 0 or t.size == 0:
        return None
    concat = np.concatenate([q, t])
    sa = create_suffix_array(concat)
    cm = find_close_matches(sa, q.size, num_close_matches)
    seq_len = concat.size + 1
    sentinel = seq_len - 2
    # (query_pos, ref_pos) candidate pairs, sentinel-trimmed (match.py:437)
    qpos = np.repeat(np.arange(q.size), num_close_matches)
    rpos = cm.reshape(-1)
    keep = (rpos != sentinel) & (rpos >= q.size)
    if not keep.any():
        return None
    chain = get_longest_increasing_pairs(qpos[keep], rpos[keep])
    if len(chain) < 2:
        return None
    q_start, q_end = chain[0][0], chain[-1][0]
    t_start = chain[0][1] - q.size
    t_end = chain[-1][1] - q.size
    # exact rescoring: infix Levenshtein of the full query against the
    # chained doc span padded by the unmatched query margins
    pad_l = q_start + 4
    pad_r = (q.size - 1 - q_end) + 4
    s = max(0, t_start - pad_l)
    e = min(t.size, t_end + 1 + pad_r)
    dist, aligns = levenshtein_distance(q, t[s:e], mode="infix")
    a_start, a_end, align = aligns[0]
    return (
        len(chain),
        int(q_start),
        int(q_end),
        int(s + a_start),
        int(s + a_end),
        int(dist),
        align,
    )


def align_spans(pairs: DataFrame, num_close_matches: int = 4) -> DataFrame:
    """pairs: (query_id string, query_text string, doc_id long, doc_text
    string) -> one row per pair that aligns, ALIGN_SCHEMA.

    mapInPandas (no shuffle: the pairing upstream — an index top-k join —
    already placed each pair on one row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for query_id, qt, doc_id, dt in zip(
                b["query_id"], b["query_text"], b["doc_id"], b["doc_text"]
            ):
                r = _align_pair(qt, dt, num_close_matches)
                if r is not None:
                    rows.append((query_id, doc_id) + r)
            yield pd.DataFrame(
                rows,
                columns=[
                    "query_id", "doc_id", "n_matched", "q_start", "q_end",
                    "t_start", "t_end", "distance", "align",
                ],
            )

    return pairs.mapInPandas(run, schema=ALIGN_SCHEMA)


SUBTITLE_SCHEMA = (
    "pair_id string, distance int, ref_len int, t_start int, t_end int, "
    "start_time double, end_time double"
)


def subtitle_align(
    pairs: DataFrame, max_error_rate: float = 0.15
) -> DataFrame:
    """Index-free direct alignment with the error-rate gate — the
    reference's subtitle variant (/root/reference/examples/subtitle/
    matching.py:142-166): infix-align each (reference text, transcript)
    pair, DROP pairs with distance/len(reference) > max_error_rate
    (gate at :152-153), and read start/end times from the per-symbol
    times at the aligned span (the byte-vs-codepoint time stride at
    :159 folds away because `char_times` is already per character).

    pairs: (pair_id string, ref_text string, hyp_text string,
    char_times array<double>) — char_times aligned to hyp_text chars
    (operators/transcripts.py output). mapInPandas, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for pid, ref, hyp, times in zip(
                b["pair_id"], b["ref_text"], b["hyp_text"], b["char_times"]
            ):
                q = np.array([ord(c) for c in ref], dtype=np.int32)
                t = np.array([ord(c) for c in hyp], dtype=np.int32)
                if q.size == 0 or t.size == 0:
                    continue
                dist, aligns = levenshtein_distance(q, t, mode="infix")
                if dist / q.size > max_error_rate:
                    continue
                start, end, _ = aligns[0]
                end = end + 1 if end + 1 < t.size else end
                rows.append(
                    (
                        pid, int(dist), int(q.size), int(start), int(end),
                        float(times[start]), float(times[end]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "pair_id", "distance", "ref_len", "t_start", "t_end",
                    "start_time", "end_time",
                ],
            )

    return pairs.mapInPandas(run, schema=SUBTITLE_SCHEMA)


def search_and_align(
    spark,
    index_dir: str,
    queries: List[tuple],
    corpus: DataFrame,
    k: int = 3,
) -> DataFrame:
    """End-to-end reference-capability composite (J5 `align_queries`):
    BM25 top-k candidate retrieval through the inverted index, then exact
    span alignment of each query against its candidates.

    queries: [(query_id, query_text)]; corpus: (doc_id, text).
    The candidate->text join is an equi hash join on doc_id (the snippet
    fetch the reference does by slicing its in-memory array)."""
    from ..index.query import QuerySpec, bm25_topk_df

    specs = [QuerySpec(qid, text.split(), "or") for qid, text in queries]
    topk = bm25_topk_df(spark, index_dir, specs, k=k)
    qdf = spark.createDataFrame(
        queries, "query_id string, query_text string"
    )
    pairs = (
        topk.join(F.broadcast(qdf), "query_id")
        .join(corpus.select("doc_id", F.col("text").alias("doc_text")), "doc_id")
        .select("query_id", "query_text", "doc_id", "doc_text")
    )
    return align_spans(pairs)
