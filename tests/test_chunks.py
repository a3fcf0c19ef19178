"""Chunk split/merge (J7): round-trip exactness on token streams."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_search_spark.operators.chunks import merge_chunks, split_chunks


@pytest.mark.parametrize("n_tokens", [5, 40, 50, 51, 90, 123, 400])
def test_roundtrip(spark, n_tokens):
    toks = [f"t{i}" for i in range(n_tokens)]
    times = [float(i) for i in range(n_tokens)]
    df = spark.createDataFrame(
        [(1, toks, times)],
        "id long, tokens array<string>, times array<double>",
    )
    chunks = split_chunks(df, window=50, extra=5)
    merged = merge_chunks(chunks).collect()
    assert len(merged) == 1
    assert merged[0].merged_terms == toks


def test_chunks_overlap(spark):
    toks = [f"t{i}" for i in range(100)]
    times = [float(i) for i in range(100)]
    df = spark.createDataFrame(
        [(1, toks, times)],
        "id long, tokens array<string>, times array<double>",
    )
    rows = split_chunks(df, window=50, extra=5).collect()
    assert len(rows) == 3  # ceil((100-10)/40)
    # consecutive chunks overlap by 2*extra tokens
    r0, r1 = sorted(rows, key=lambda r: r.chunk_start)[:2]
    overlap = set(r0.terms) & set(r1.terms)
    assert len(overlap) == 10


def test_multiple_ids(spark):
    rows = [
        (i, [f"d{i}_t{j}" for j in range(n)], [float(j) for j in range(n)])
        for i, n in [(1, 75), (2, 10), (3, 200)]
    ]
    df = spark.createDataFrame(
        rows, "id long, tokens array<string>, times array<double>"
    )
    merged = {
        r.id: r.merged_terms
        for r in merge_chunks(split_chunks(df)).collect()
    }
    for i, toks, _ in rows:
        assert merged[i] == toks, i
