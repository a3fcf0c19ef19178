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


def test_snippets(spark, tmp_path):
    from text_search_spark.corpus import NEEDLES, generate_pages
    from text_search_spark.index.build import (
        build_index,
        hash_doc_id_py,
        prepare_corpus,
    )
    from text_search_spark.index.query import QuerySpec
    from text_search_spark.operators.snippets import search_with_snippets

    pages = generate_pages(300)
    pdf = spark.createDataFrame(
        [(p.url, p.text) for p in pages], "url string, text string"
    )
    corpus = prepare_corpus(pdf, url_col="url")
    ix = str(tmp_path / "ix")
    build_index(spark, corpus, ix, n_buckets=4, n_shards=2, bucket_groups=1)

    specs = [QuerySpec("q0", NEEDLES[0].split(), "phrase")]
    out = search_with_snippets(spark, ix, specs, corpus, k=5).collect()
    # phrase hits exist in this corpus slice and the snippet contains the
    # needle tokens
    if out:
        for r in out:
            assert r.n_hits >= 1
            assert NEEDLES[0].split()[0].upper() in r.snippet
    # an OR query over a common word must produce ranked snippets
    out2 = search_with_snippets(
        spark, ix, [QuerySpec("q1", ["the"], "or")], corpus, k=3
    ).collect()
    assert len(out2) == 3
    assert all("THE" in r.snippet for r in out2)


def test_align_pair_long_query_segmented_path(monkeypatch):
    """>20k-symbol query: the segmented flow (break_query -> per-segment
    global DP -> combine) must (a) actually run and (b) reproduce the
    unsegmented infix DP's result on the overlap."""
    import text_search_spark.operators.segment as seg_mod
    from text_search_spark.operators.align import (
        LONG_PAIR_GOLDEN,
        synthetic_long_pair,
    )

    q, doc = synthetic_long_pair()
    assert len(q) > 20000

    calls = []
    orig = seg_mod.break_query

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(seg_mod, "break_query", spy)
    r_seg = _align_pair(q, doc)
    assert calls, "long query did not take the segmented path"

    r_un = _align_pair(q, doc, segment_length=10**9)
    assert not len(calls) > 1  # unsegmented path didn't re-enter break_query

    # identical distance, identical covered span, identical alignment
    assert r_seg[5] == r_un[5]
    assert (r_seg[3], r_seg[4]) == (r_un[3], r_un[4])
    assert r_seg[6] == r_un[6]
    # alignment covers the full query: I+C+S ops count == len(query)
    consumed = sum(r_seg[6].count(c) for c in "ICS")
    assert consumed == len(q)
    # and the UNSEGMENTED result matches the pinned golden the driver's
    # align_long_query oracle uses (guards generator/golden drift)
    import hashlib

    got = r_un[:6] + (hashlib.md5(r_un[6].encode()).hexdigest(),)
    assert got == LONG_PAIR_GOLDEN


def test_align_pair_short_query_unsegmented(monkeypatch):
    """Short queries must NOT pay the segmentation machinery."""
    import text_search_spark.operators.segment as seg_mod

    calls = []
    orig = seg_mod.break_query

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(seg_mod, "break_query", spy)
    r = _align_pair("hello world", "xxx hello world yyy")
    assert r is not None and r[5] == 0
    assert not calls
