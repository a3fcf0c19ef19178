"""Unit contract of the map-side (doc, term) grouper (build._doc_grouper):
one output row per distinct (doc, term); blob = varbyte(doc_len) +
varbyte(tf) + varbyte(absolute first position, then deltas) — a 2-value
header followed by the positions-sidecar per-run byte layout, checked
against a naive per-token reference."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_search_spark.codec import varbyte_decode, varbyte_encode
from text_search_spark.index.build import _doc_grouper


def _run(doc_ids, token_lists):
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(doc_ids, pa.int64()),
            pa.array(token_lists, pa.list_(pa.string())),
        ],
        names=["doc_id", "tokens"],
    )
    out = list(_doc_grouper(iter([batch])))
    rows = []
    for b in out:
        for i in range(b.num_rows):
            rows.append(
                (
                    b.column(0)[i].as_py(),
                    b.column(1)[i].as_py(),
                    b.column(2)[i].as_py(),
                )
            )
    return rows


def _naive(doc_ids, token_lists):
    rows = {}
    for d, toks in zip(doc_ids, token_lists):
        for p, t in enumerate(toks):
            rows.setdefault((d, t), []).append(p)
    out = []
    for (d, t), ps in rows.items():
        dl = len(token_lists[doc_ids.index(d)])
        gaps = [ps[0]] + [b - a for a, b in zip(ps, ps[1:])]
        out.append(
            (d, t,
             varbyte_encode(np.array([dl, len(ps)] + gaps, dtype=np.uint64)))
        )
    return out


def test_grouper_matches_naive():
    doc_ids = [10, 20, 30]
    toks = [
        ["a", "b", "a", "c", "a"],
        ["b", "b"],
        [],
    ]
    got = sorted(_run(doc_ids, toks))
    want = sorted(_naive(doc_ids, toks))
    assert got == want


def test_grouper_positions_decode():
    rows = _run([7], [["x", "y", "x", "x", "z", "y"]])
    by_term = {r[1]: r for r in rows}

    def parse(blob):
        vals = varbyte_decode(blob)
        dl, tf = int(vals[0]), int(vals[1])
        return dl, tf, list(np.cumsum(vals[2:]))

    dl, tf, ps = parse(by_term["x"][2])
    assert (dl, tf) == (6, 3)
    assert ps == [0, 2, 3]
    assert parse(by_term["y"][2]) == (6, 2, [1, 5])


def test_grouper_empty_and_null_batches():
    empty = pa.RecordBatch.from_arrays(
        [pa.array([], pa.int64()), pa.array([], pa.list_(pa.string()))],
        names=["doc_id", "tokens"],
    )
    assert list(_doc_grouper(iter([empty]))) == []
    all_empty = _run([1, 2], [[], []])
    assert all_empty == []


def test_grouper_bounded_slicing_equivalence(monkeypatch):
    """Oversized input batches are re-sliced to bound the working set;
    output must be identical at any slice granularity (docs never split)."""
    import text_search_spark.index.build as B

    doc_ids = list(range(50))
    toks = [[f"w{j % 7}" for j in range(40 + i)] for i in range(50)]
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(doc_ids, pa.int64()),
            pa.array(toks, pa.list_(pa.string())),
        ],
        names=["doc_id", "tokens"],
    )

    def collect(max_tokens):
        monkeypatch.setattr(B, "_GROUPER_MAX_TOKENS", max_tokens)
        rows = []
        for b in B._doc_grouper(iter([batch])):
            for i in range(b.num_rows):
                rows.append(tuple(b.column(c)[i].as_py() for c in range(3)))
        return sorted(rows)

    full, tiny, degenerate = collect(10**9), collect(100), collect(1)
    assert full == tiny == degenerate
    assert len(full) == 50 * 7


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "bb", "ccc", "dddd", "e"]),
                 max_size=30),
        min_size=1,
        max_size=8,
    )
)
def test_grouper_property(token_lists):
    doc_ids = list(range(100, 100 + len(token_lists)))
    got = sorted(_run(doc_ids, token_lists))
    want = sorted(_naive(doc_ids, token_lists))
    assert got == want
