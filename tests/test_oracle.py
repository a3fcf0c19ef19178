"""Sanity tests for the NumPy BM25 oracle on hand-computable corpora."""

import math

from text_search_spark.corpus import generate_pages, generate_queries
from text_search_spark.oracle import (
    bm25_topk,
    build_oracle_index,
    idf,
)


def _tiny_index():
    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat"),
        (2, "cat cat cat"),
        (3, "completely unrelated words here"),
    ]
    return build_oracle_index(docs)


def test_counts():
    ix = _tiny_index()
    assert ix.n_docs == 4
    assert ix.doc_len[0] == 6
    assert ix.df("CAT") == 2
    assert ix.tf["CAT"][2] == 3
    assert ix.positions["CAT"][0] == [1]
    assert ix.avgdl == (6 + 3 + 3 + 4) / 4


def test_idf_formula():
    ix = _tiny_index()
    # df(CAT)=2, N=4 -> ln(1 + (4-2+0.5)/(2+0.5)) = ln(2)
    assert math.isclose(idf(ix, "CAT"), math.log(2.0))


def test_topk_or_ranking():
    ix = _tiny_index()
    top = bm25_topk(ix, ["cat".upper()], k=10, mode="or")
    doc_ids = [d for d, _ in top]
    assert doc_ids[0] == 2  # tf=3, shortest doc
    assert set(doc_ids) == {0, 2}


def test_and_mode():
    ix = _tiny_index()
    top = bm25_topk(ix, ["THE", "CAT"], k=10, mode="and")
    assert [d for d, _ in top] == [0]


def test_phrase_mode():
    ix = _tiny_index()
    top = bm25_topk(ix, ["CAT", "SAT"], k=10, mode="phrase")
    assert [d for d, _ in top] == [0]
    top2 = bm25_topk(ix, ["SAT", "CAT"], k=10, mode="phrase")
    assert top2 == []


def test_tie_break_doc_id_asc():
    docs = [(5, "alpha beta"), (2, "alpha beta"), (9, "alpha beta")]
    ix = build_oracle_index(docs)
    top = bm25_topk(ix, ["ALPHA"], k=3)
    assert [d for d, _ in top] == [2, 5, 9]
    s = [sc for _, sc in top]
    assert s[0] == s[1] == s[2]


def test_oracle_on_synthetic_corpus():
    pages = generate_pages(300)
    ix = build_oracle_index([(i, p.text) for i, p in enumerate(pages)])
    queries = generate_queries()
    nonempty = 0
    for q in queries:
        top = bm25_topk(ix, q.terms, k=10, mode=q.mode)
        # scores sorted desc, ties by doc_id asc
        for (d1, s1), (d2, s2) in zip(top, top[1:]):
            assert s1 > s2 or (s1 == s2 and d1 < d2)
        nonempty += bool(top)
    assert nonempty > 50  # most queries hit something
