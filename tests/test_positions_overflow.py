"""Phrase/NEAR correctness past the old 2^22-position packing limit and
equivalence of the vectorized NEAR sweep with a brute-force oracle.

The old packing (local_doc_idx << 22 | pos) silently corrupted phrase
intersection for documents longer than ~4.19M tokens (ADVICE r01); the
shift now adapts to the longest document. Tested at the kernel level with
synthetic posting buffers — building a real 4M-token document through the
full index pipeline checks the same code path at ~1000x the cost.
"""

import numpy as np
import pytest

from text_search_spark.codec import (
    encode_block_postings,
    encode_blockmax,
    encode_positions,
)
from text_search_spark.index.query import _TermPostings, _near_docs, _phrase_docs

BIG = 1 << 22  # the old packing limit


def _mk(term_positions, avgdl=100.0):
    """term_positions: {term: {doc_id: [positions]}} -> tp dict."""
    tp = {}
    for term, docs in term_positions.items():
        doc_ids = np.array(sorted(docs), dtype=np.int64)
        tfs = np.array([len(docs[d]) for d in doc_ids], dtype=np.int64)
        dls = np.array(
            [max(docs[d]) + 1 if docs[d] else 1 for d in doc_ids],
            dtype=np.int64,
        )
        flat = np.concatenate(
            [np.sort(np.asarray(docs[d], dtype=np.int64)) for d in doc_ids]
        )
        starts = np.concatenate([[0], np.cumsum(tfs)])[:-1]
        gaps = flat.copy()
        if flat.size:
            gaps[1:] = flat[1:] - flat[:-1]
            gaps[starts] = flat[starts]
        t = _TermPostings(avgdl)
        t.add(
            encode_block_postings(doc_ids, tfs, dls),
            encode_positions(gaps),
            encode_blockmax(doc_ids, tfs, dls, avgdl),
            avgdl,
        )
        tp[term] = t
    return tp


def test_phrase_beyond_packing_limit():
    # doc 5: "A B" adjacent at position > 2^22; doc 9 has both words but
    # NOT adjacent — the old 22-bit packing would corrupt both
    tp = _mk(
        {
            "A": {5: [BIG + 100], 9: [BIG + 5000]},
            "B": {5: [BIG + 101], 9: [BIG + 9000]},
        }
    )
    assert _phrase_docs(tp, ["A", "B"]).tolist() == [5]


def test_phrase_collision_regression():
    # adversarial pair: under 22-bit packing doc0's (pos=BIG+7) aliases
    # doc1's (pos=7) — a false phrase match the adaptive shift avoids
    tp = _mk(
        {
            "A": {0: [BIG + 7], 1: [3]},
            "B": {0: [2], 1: [8 + BIG]},
        }
    )
    assert _phrase_docs(tp, ["A", "B"]).size == 0


def test_phrase_small_positions_unchanged():
    tp = _mk({"A": {1: [0, 10], 2: [4]}, "B": {1: [11], 2: [99]}})
    assert _phrase_docs(tp, ["A", "B"]).tolist() == [1]


def test_near_beyond_packing_limit():
    tp = _mk(
        {
            "A": {5: [BIG + 100], 9: [BIG + 5000]},
            "B": {5: [BIG + 104], 9: [BIG + 9000]},
        }
    )
    assert _near_docs(tp, ["A", "B"], window=6).tolist() == [5]
    assert _near_docs(tp, ["A", "B"], window=2).size == 0


def _near_brute(term_positions, terms, window):
    """Brute-force oracle: every doc where some window <= `window` holds
    one occurrence of each distinct term."""
    uterms = list(dict.fromkeys(terms))
    docs = set.intersection(
        *[set(term_positions[t]) for t in uterms]
    )
    out = []
    for d in sorted(docs):
        events = sorted(
            (p, i)
            for i, t in enumerate(uterms)
            for p in term_positions[t].get(d, [])
        )
        ok = False
        for lo in range(len(events)):
            seen = set()
            for hi in range(lo, len(events)):
                if events[hi][0] - events[lo][0] > window:
                    break
                seen.add(events[hi][1])
                if len(seen) == len(uterms):
                    ok = True
                    break
            if ok:
                break
        if ok:
            out.append(d)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("window", [0, 3, 17])
def test_near_vectorized_vs_brute(seed, window):
    rng = np.random.Generator(np.random.PCG64(seed))
    terms = ["A", "B", "C"]
    term_positions = {}
    for t in terms:
        docs = {}
        for d in rng.choice(50, size=30, replace=False):
            docs[int(d)] = sorted(
                set(rng.integers(0, 60, size=rng.integers(1, 6)).tolist())
            )
        term_positions[t] = docs
    tp = _mk(term_positions)
    got = _near_docs(tp, terms, window).tolist()
    want = _near_brute(term_positions, terms, window)
    assert got == want


def test_near_single_term_and_duplicates():
    tp = _mk({"A": {3: [7]}})
    assert _near_docs(tp, ["A"], 5).tolist() == [3]
    assert _near_docs(tp, ["A", "A"], 5).tolist() == [3]
