"""Extractor + tokenizer kernel tests, incl. the byte-identity invariant and
the three-rendition (Python / Spark / DuckDB) agreement for the tokenizer."""

import duckdb
import numpy as np
import pytest

from text_search_spark import textnorm
from text_search_spark.corpus import generate_pages
from text_search_spark.textnorm import (
    ascii_upper,
    duckdb_tokens_sql,
    extract_text,
    normalize,
    tokenize,
)


def test_ascii_fold_is_ascii_only():
    # reference folds ONLY [a-z] (datatypes.py:306-313); ü/ß untouched
    assert ascii_upper("abcXYZ üß你好") == "ABCXYZ üß你好"


def test_normalize_punct_to_space():
    assert normalize("Hello, world! (yes)") == "HELLO WORLD YES"
    # CJK punctuation from the reference set is stripped too
    assert normalize("你好。世界，") == "你好 世界"


def test_tokenize_empty():
    assert tokenize("") == []
    assert tokenize("  \t\n ") == []
    assert tokenize("...!!!") == []


def test_tokenize_positions_stable():
    toks = tokenize("a b, c.d")
    assert toks == ["A", "B", "C", "D"]


def test_extract_text_basic():
    html = b"<html><body><p>Hello <b>world</b></p><script>x()</script></body></html>"
    assert extract_text(html) == "Hello world"


def test_extract_text_entities_and_control():
    html = b"<div><p>a&amp;b</p><span>c\x07d</span></div>"
    assert extract_text(html) == "a&b cd"


def test_extract_text_skips_style():
    html = b"<head><style>p{color:red}</style></head><body>ok</body>"
    assert extract_text(html) == "ok"


def test_corpus_byte_identity():
    """text column == extract_text(html) per url — BASELINE.json input_hint."""
    pages = generate_pages(200)
    for p in pages:
        assert p.text == extract_text(p.html), p.url
    # deterministic across calls
    again = generate_pages(200)
    assert [p.text for p in pages] == [q.text for q in again]
    assert [p.html for p in pages] == [q.html for q in again]


def test_duckdb_tokenizer_matches_python():
    pages = generate_pages(60)
    texts = [p.text for p in pages] + ["", "  ", "a,b.c", "Mixed CASE text!"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, txt VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    sql = f"SELECT id, {duckdb_tokens_sql('txt')} AS toks FROM t ORDER BY id"
    rows = con.execute(sql).fetchall()
    for (i, toks), text in zip(rows, texts):
        assert toks == tokenize(text), (i, text)


def test_spark_tokenizer_matches_python(spark):
    pages = generate_pages(60)
    texts = [p.text for p in pages] + ["", "  ", "a,b.c", "Mixed CASE text!"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, txt string"
    )
    out = (
        df.select("id", textnorm.spark_tokens("txt").alias("toks"))
        .orderBy("id")
        .collect()
    )
    for row, text in zip(out, texts):
        assert row.toks == tokenize(text), (row.id, text)


def test_repetition_stats_semantics(spark):
    """Gopher repetition signals on hand-computable docs."""
    from text_search_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b\na b\nc d\n\na b"),   # 'a b' x3 of 4 non-empty lines
            (2, "x y x y x y"),            # top bigram covers all tokens
            (3, ""),                        # degenerate
            (4, "unique words only here"),  # no repetition
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert (out[1].n_lines, out[1].dup_line_frac,
            out[1].dup_line_char_frac, out[1].top_bigram_frac) == (
        4, 0.5, 0.5, 0.75)
    assert out[2].top_bigram_frac == 1.0 and out[2].dup_line_frac == 0.0
    assert (out[3].n_lines, out[3].top_bigram_frac) == (0, 0.0)
    assert out[4].top_bigram_frac == 0.5  # 2/n_tokens floor for unique text
