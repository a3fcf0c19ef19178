"""Snippet/highlight generation for query hits (the reference's result
materialization stage: it returns matched spans with provenance positions,
match.py:497-523; our index stores token positions, so snippets re-derive
the char-level view from the canonical tokenizer).

Pipeline: BM25 top-k -> broadcast query terms -> equi-join candidate docs
to the corpus text (the "snippet fetch" join, SURVEY.md §2.3) -> Arrow UDF
picks the densest window of query-term hits and returns the token span.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..textnorm import tokenize

SNIPPET_SCHEMA = (
    "query_id string, doc_id long, n_hits int, span_start int, "
    "span_end int, snippet string"
)


def _best_window(
    toks: List[str], qterms: set, width: int
) -> tuple:
    """Densest window of query-term hits: (n_hits, start, end) over token
    indices; deterministic (first-best wins)."""
    hits = [i for i, t in enumerate(toks) if t in qterms]
    if not hits:
        return 0, 0, min(len(toks), width) - 1
    best = (0, hits[0])
    lo = 0
    for hi in range(len(hits)):
        while hits[hi] - hits[lo] >= width:
            lo += 1
        n = hi - lo + 1
        if n > best[0]:
            best = (n, hits[lo])
    start = max(0, best[1] - 2)
    end = min(len(toks) - 1, start + width - 1)
    return best[0], start, end


def snippets_for_pairs(pairs: DataFrame, width: int = 16) -> DataFrame:
    """pairs: (query_id, terms array<string>, doc_id, text) ->
    SNIPPET_SCHEMA rows (one per pair)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for qid, terms, doc_id, text in zip(
                b["query_id"], b["terms"], b["doc_id"], b["text"]
            ):
                toks = tokenize(text)
                qset = {nt for t in terms for nt in tokenize(t)}
                n, s, e = _best_window(toks, qset, width)
                rows.append(
                    (qid, doc_id, n, s, e, " ".join(toks[s : e + 1]))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "query_id", "doc_id", "n_hits", "span_start",
                    "span_end", "snippet",
                ],
            )

    return pairs.mapInPandas(run, schema=SNIPPET_SCHEMA)


def search_with_snippets(
    spark: SparkSession,
    index_dir: str,
    queries: Sequence,
    corpus: DataFrame,
    k: int = 5,
    width: int = 16,
) -> DataFrame:
    """queries: QuerySpec list; corpus: (doc_id, text). Returns top-k hits
    per query with ranked snippets."""
    from ..index.query import bm25_topk_df

    topk = bm25_topk_df(spark, index_dir, queries, k=k)
    qdf = spark.createDataFrame(
        [(q.query_id, q.terms) for q in queries],
        "query_id string, terms array<string>",
    )
    pairs = (
        topk.join(F.broadcast(qdf), "query_id")
        .join(corpus.select("doc_id", "text"), "doc_id")
        .select("query_id", "terms", "doc_id", "text")
    )
    return snippets_for_pairs(pairs, width)
