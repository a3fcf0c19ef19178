"""Span alignment operator (J1+J2+J4 composite) tests."""

import pytest

from text_search_spark.operators.align import _align_pair, align_spans


def test_align_pair_exact_substring():
    r = _align_pair("hello world", "xxx hello world yyy")
    assert r is not None
    n, qs, qe, ts, te, dist, align = r
    assert dist == 0
    assert "hello world" in "xxx hello world yyy"[ts : te + 1]


def test_align_pair_fuzzy():
    # one substitution inside the matched span
    r = _align_pair("hello world", "prefix hallo world suffix")
    assert r is not None
    *_, dist, align = r
    assert dist == 1
    assert align.count("S") == 1


def test_align_pair_no_match():
    assert _align_pair("abc", "xyz") is None or _align_pair("abc", "xyz")[5] > 0


def test_align_spans_df(spark):
    pairs = spark.createDataFrame(
        [
            ("q1", "needle phrase", 1, "some text with a needle phrase inside"),
            ("q1", "needle phrase", 2, "completely unrelated words zzz qqq"),
            ("q2", "spark engine", 3, "the spark engine aligns spans"),
        ],
        "query_id string, query_text string, doc_id long, doc_text string",
    )
    out = {(r.query_id, r.doc_id): r for r in align_spans(pairs).collect()}
    assert ("q1", 1) in out and out[("q1", 1)].distance == 0
    assert ("q2", 3) in out and out[("q2", 3)].distance == 0
    got = out[("q1", 1)]
    doc = "some text with a needle phrase inside"
    assert doc[got.t_start : got.t_end + 1] == "needle phrase"
