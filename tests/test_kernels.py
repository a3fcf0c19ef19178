"""Reference-golden tests (FIXTURES.md §4) — vectors taken from the
reference's own test suite so our kernels are semantics-identical."""

import numpy as np
import pytest

from text_search_spark.kernels import (
    create_suffix_array,
    find_close_matches,
    get_longest_increasing_pairs,
    is_overlap,
    levenshtein_distance,
    row_ids_to_row_splits,
)


# /root/reference/textsearch/python/tests/test_suffix_array.py:30-36
@pytest.mark.parametrize("dtype", [np.int8, np.int16, np.int32, np.int64])
def test_suffix_array_golden(dtype):
    arr = np.array([3, 2, 1], dtype=dtype)
    assert create_suffix_array(arr).tolist() == [2, 1, 0, 3]


# /root/reference/docs/source/python-api/code/suffix-array.py (banana)
def test_suffix_array_banana():
    arr = np.frombuffer(b"banana", dtype=np.int8)
    assert create_suffix_array(arr).tolist() == [1, 3, 5, 0, 2, 4, 6]


def test_suffix_array_random_vs_naive():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(1, 60))
        arr = rng.integers(0, 5, size=n).astype(np.int32)
        sa = create_suffix_array(arr)
        # naive oracle: EOS sorts largest -> compare suffixes with sentinel
        eos = int(arr.max()) + 1
        s = list(arr) + [eos]
        expected = sorted(range(len(s)), key=lambda i: s[i:])
        assert sa.tolist() == expected


# /root/reference/textsearch/python/tests/test_find_close_matches.py:30-118
def test_find_close_matches_golden():
    queries = ["hello", "hallo"]
    documents = ["iholloyou", "youhellome"]
    texts = "".join(queries) + "".join(documents)
    arr = np.frombuffer(texts.encode(), dtype=np.int8)
    sa = create_suffix_array(arr)
    query_len = len("".join(queries))

    out = find_close_matches(sa, query_len, num_close_matches=2)
    expected2 = np.array(
        [
            [28, 22], [28, 23], [10, 24], [13, 25], [27, 12],
            [28, 22], [28, 23], [10, 24], [13, 25], [27, 12],
        ],
        dtype=np.int32,
    )
    assert (out == expected2).all()

    out4 = find_close_matches(sa, query_len, num_close_matches=4)
    expected4 = np.array(
        [
            [23, 28, 22, 11], [28, 28, 23, 28], [11, 10, 24, 13],
            [24, 13, 25, 14], [14, 27, 12, 26],
            [23, 28, 22, 11], [28, 28, 23, 28], [11, 10, 24, 13],
            [24, 13, 25, 14], [14, 27, 12, 26],
        ],
        dtype=np.int32,
    )
    assert (out4 == expected4).all()


# /root/reference/docs/source/tutorials/code/find-close-matches.py
def test_find_close_matches_hi():
    texts = "hi" + "howareyou"
    arr = np.frombuffer(texts.encode(), dtype=np.int8)
    sa = create_suffix_array(arr)
    out = find_close_matches(sa, 2, num_close_matches=2)
    assert out.tolist() == [[7, 2], [2, 9]]


# /root/reference/textsearch/python/tests/test_match.py:30-37
def test_lis_golden():
    seq1 = [0, 1, 1, 2, 2, 3, 4, 5, 6]
    seq2 = [9, 7, 8, 9, 6, 7, 10, 12, 8]
    assert get_longest_increasing_pairs(seq1, seq2) == [
        (1, 7), (1, 8), (2, 9), (4, 10), (5, 12),
    ]


def test_lis_empty_and_single():
    assert get_longest_increasing_pairs([], []) == []
    assert get_longest_increasing_pairs([5], [3]) == [(5, 3)]


# /root/reference/textsearch/python/tests/test_levenshtein_distance.py:30-48
def test_levenshtein_infix_golden():
    q = np.array([1, 2, 3, 4], dtype=np.int32)
    t = np.array([1, 5, 3, 4, 6, 7, 1, 2, 4], dtype=np.int32)
    dist, aligns = levenshtein_distance(q, t, mode="infix")
    assert dist == 1
    assert aligns == [(0, 3, "CSCC"), (6, 8, "CCIC")]


def test_levenshtein_global_golden():
    q = np.array([1, 2, 3, 4], dtype=np.int32)
    t = np.array([1, 5, 3, 4, 6, 7, 1, 2, 4], dtype=np.int32)
    dist, aligns = levenshtein_distance(q, t, mode="global")
    assert dist == 6
    assert len(aligns) == 1
    start, end, a = aligns[0]
    assert (start, end) == (0, 8)
    assert a.count("D") == 5 and a.count("S") + a.count("I") == 1
    assert len(a) == 9


def test_levenshtein_infix_free_ends():
    # ACT in CGACTGAC: distance 0 (doc example, levenshtein.cc:40-45)
    q = np.frombuffer(b"ACT", dtype=np.int8)
    t = np.frombuffer(b"CGACTGAC", dtype=np.int8)
    dist, aligns = levenshtein_distance(q, t, mode="infix")
    assert dist == 0
    assert (2, 4, "CCC") in aligns


# /root/reference/textsearch/python/tests/test_row_ids_to_row_splits.py:18-24
def test_row_splits_golden():
    out = row_ids_to_row_splits(np.array([1, 1, 3, 3, 5], dtype=np.uint32))
    assert out.tolist() == [0, 0, 2, 2, 4, 4, 5]


def test_is_overlap_basic():
    ranges, indexes = [], []
    assert is_overlap(ranges, indexes, (0.0, 10.0), 0) == (False, None)
    # heavy overlap with existing -> dropped
    assert is_overlap(ranges, indexes, (1.0, 11.0), 1) == (True, None)
    # disjoint -> inserted
    assert is_overlap(ranges, indexes, (20.0, 30.0), 2) == (False, None)
    assert ranges == [(0.0, 10.0), (20.0, 30.0)]
    assert indexes == [0, 2]
    # small overlap below ratio -> inserted
    ok, d = is_overlap(ranges, indexes, (10.5, 19.0), 3, overlap_ratio=0.25)
    assert (ok, d) == (False, None)
    assert len(ranges) == 3


def test_get_nice_alignments():
    from text_search_spark.kernels import get_nice_alignments

    q = [1, 2, 3, 4]
    t = [1, 5, 3, 4, 6, 7, 1, 2, 4]
    dist, aligns = levenshtein_distance(q, t, mode="infix")
    outs = get_nice_alignments(aligns, q, t)
    assert len(outs) == 2
    top, mid, bot = outs[0].split("\n")
    assert "*" in mid  # the substitution marked
    assert top.split() == ["1", "2", "3", "4"]
    assert bot.split() == ["1", "5", "3", "4"]


def test_levenshtein_vectorized_perf():
    """The DP runs row-wise in NumPy (min-prefix trick for the left
    dependency). The pre-vectorization per-cell Python loop took ~30 s on
    this 5000x6250 pair (~31M interpreted iterations); the vectorized kernel
    must finish the same pair in seconds — a bound the old loop cannot meet
    on any hardware this suite runs on (>=50x observed: 0.54 s locally)."""
    import random
    import time

    rng = random.Random(0)
    q = [rng.randrange(50) for _ in range(5000)]
    t = [rng.randrange(50) for _ in range(6250)]
    # CPU time, not wall time: the bound must hold on a fully contended
    # machine (the suite runs alongside benchmark builds in CI)
    t0 = time.process_time()
    dist, aligns = levenshtein_distance(q, t, mode="infix")
    elapsed = time.process_time() - t0
    assert elapsed < 5.0, f"vectorized DP too slow: {elapsed:.2f}s CPU"
    assert dist > 0 and aligns


def test_levenshtein_vectorized_matches_scalar_reference():
    """Property check: the vectorized DP equals a straightforward per-cell
    reference implementation on random small inputs, all modes/costs."""
    import random

    def scalar_dp(q, t, mode, ic, dc, rc):
        m, n = len(q), len(t)
        dp = [[0] * (n + 1) for _ in range(m + 1)]
        for j in range(n + 1):
            dp[0][j] = 0 if mode == "infix" else j * dc
        for i in range(1, m + 1):
            dp[i][0] = i * ic
            for j in range(1, n + 1):
                c = 0 if t[j - 1] == q[i - 1] else rc
                dp[i][j] = min(
                    dp[i - 1][j - 1] + c, dp[i - 1][j] + ic, dp[i][j - 1] + dc
                )
        if mode == "global":
            return dp[m][n]
        return min(dp[m])

    rng = random.Random(7)
    for trial in range(40):
        m = rng.randrange(0, 12)
        n = rng.randrange(0, 15)
        q = [rng.randrange(4) for _ in range(m)]
        t = [rng.randrange(4) for _ in range(n)]
        mode = rng.choice(["global", "infix"])
        ic, dc, rc = (
            rng.randrange(1, 4),
            rng.randrange(1, 4),
            rng.randrange(1, 4),
        )
        want = scalar_dp(q, t, mode, ic, dc, rc)
        got, _ = levenshtein_distance(
            q, t, mode=mode, insert_cost=ic, delete_cost=dc, replace_cost=rc
        )
        assert got == want, (trial, q, t, mode, ic, dc, rc, got, want)
