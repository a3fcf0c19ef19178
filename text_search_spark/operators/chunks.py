"""Chunk split / merge operators (SURVEY.md §2.3 J7, §2.8).

The reference splits long recordings into overlapping 30s chunks
(/root/reference/examples/libriheavy/tools/split_into_chunks.py:87-90) and
later merges consecutive chunk cuts per recording, dropping the overlap
margins (/root/reference/examples/libriheavy/tools/merge_chunks.py:66-179).

Spark-native re-expression over token streams:
  split_chunks: (id, tokens[], times[]) -> one row per overlapping window
    — pure JVM array ops (transform/slice/sequence), no shuffle.
  merge_chunks: inverse — groupBy(id), order chunks by start, keep each
    token whose time falls in the chunk's "owned" interval (midpoint-of-
    overlap rule; first/last chunks own their outer margins), concatenate.
    One shuffle on the group key, splice in applyInPandas.

With integer token times the split->merge round trip is exact (pinned by
tests and by the chunk_roundtrip correctness entry against DuckDB).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_SCHEMA = (
    "id long, chunk_idx int, chunk_start double, chunk_end double, "
    "terms array<string>, times array<double>"
)


def split_chunks(
    df: DataFrame,
    window: int = 50,
    extra: int = 5,
    id_col: str = "id",
    tokens_col: str = "tokens",
    times_col: str = "times",
) -> DataFrame:
    """Overlapping windows of `window` tokens, hop = window - 2*extra.
    times are per-token doubles (ascending within a doc)."""
    hop = window - 2 * extra
    assert hop > 0
    n = F.size(F.col(tokens_col))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(2 * extra)) / F.lit(hop)).cast("int")
    )
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                F.slice(F.col(tokens_col), i * hop + 1, window).alias("terms"),
                F.slice(F.col(times_col), i * hop + 1, window).alias("times"),
            ),
        )
    )
    out = df.select(F.col(id_col).alias("id"), chunk.alias("c")).select(
        "id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.element_at(F.col("c.times"), 1).alias("chunk_start"),
        F.element_at(F.col("c.times"), -1).alias("chunk_end"),
        F.col("c.terms").alias("terms"),
        F.col("c.times").alias("times"),
    )
    return out


def merge_chunks(chunks: DataFrame) -> DataFrame:
    """Inverse of split_chunks: (id, merged_terms array<string>).

    Ownership rule: sort chunks by chunk_start; the boundary between two
    consecutive chunks is the midpoint of their overlap [next.start,
    cur.end]; a chunk keeps tokens with time in [own_lo, own_hi) (last
    chunk: closed on the right). Mirrors the reference's margin-drop splice
    (merge_chunks.py:86-138) with a deterministic midpoint instead of the
    lhotse `extra` parameter."""

    def splice(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["chunk_start", "chunk_idx"])
        starts = pdf["chunk_start"].to_numpy(np.float64)
        ends = pdf["chunk_end"].to_numpy(np.float64)
        m = len(pdf)
        out_terms = []
        for i in range(m):
            lo = -np.inf if i == 0 else (starts[i] + ends[i - 1]) / 2.0
            hi = np.inf if i == m - 1 else (starts[i + 1] + ends[i]) / 2.0
            times = np.asarray(pdf["times"].iat[i], dtype=np.float64)
            terms = pdf["terms"].iat[i]
            keep = (times >= lo) & (times < hi)
            out_terms.extend(
                [t for t, k in zip(terms, keep) if k]
            )
        return pd.DataFrame(
            {"id": [pdf["id"].iat[0]], "merged_terms": [out_terms]}
        )

    return chunks.groupBy("id").applyInPandas(
        splice, schema="id long, merged_terms array<string>"
    )
