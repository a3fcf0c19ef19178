"""Reference-parity kernels, re-implemented from scratch in NumPy/pure Python.

These reproduce the *semantics* (pinned by the reference's own golden test
vectors, see tests/test_kernels.py) of the reference's C++ kernels, for use
inside grouped Arrow UDFs on bounded per-group data (SURVEY.md §2.3 J1-J6).
The algorithms are deliberately different from the reference's:

  - create_suffix_array: prefix-doubling + numpy lexsort (O(n log^2 n)),
    NOT the reference's DC3 (/root/reference/textsearch/csrc/suffix_array.cc:58-140).
    Same contract: EOS sentinel sorts LARGEST; output length = len(input)+1
    (/root/reference/docs/source/tutorials/suffix-arrays.rst:10-15).
  - find_close_matches: single linear sweep, contract from
    /root/reference/textsearch/csrc/utils.h:29-67 (sentinel seq_len-2).
  - get_longest_increasing_pairs: patience LIS with bisect, contract from
    /root/reference/textsearch/csrc/match.h:28-115.
  - levenshtein_distance: NumPy DP + pointer backtrace, modes "global"/"infix",
    contract from /root/reference/textsearch/python/csrc/levenshtein.cc:28-127.
  - row_ids_to_row_splits: np.searchsorted, contract
    /root/reference/textsearch/python/textsearch/utils.py:90-107.
  - is_overlap: sorted-interval suppression, semantics from
    /root/reference/textsearch/python/textsearch/utils.py:110-205.
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right, insort
from typing import List, Optional, Sequence, Tuple

import numpy as np


def create_suffix_array(arr) -> np.ndarray:
    """Suffix array of arr + [EOS] where EOS compares larger than any symbol.

    Returns int32 array of length len(arr)+1: the i-th entry is the start
    position of the i-th suffix in lexicographic order.
    """
    a = np.asarray(arr)
    if a.size == 0:
        return np.zeros(1, dtype=np.int32)
    # dense-rank symbols (the reference renumbers for the same reason:
    # suffix_array.py:21-43 — bound the alphabet); EOS gets the top rank.
    rank = np.unique(a, return_inverse=True)[1].astype(np.int64)
    rank = np.concatenate([rank, [rank.max() + 1]])
    n = rank.shape[0]
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        diff = (rank[order[1:]] != rank[order[:-1]]) | (
            key2[order[1:]] != key2[order[:-1]]
        )
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.concatenate([[0], np.cumsum(diff)])
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order.astype(np.int32)
        k *= 2


def find_close_matches(
    suffix_array: np.ndarray, query_len: int, num_close_matches: int = 2
) -> np.ndarray:
    """For each query position (text positions < query_len), the
    num_close_matches/2 reference positions immediately preceding and
    following it in suffix-array order, output in suffix-array order.

    Sentinel seq_len-2 where a neighbor is missing or is the EOS position
    (seq_len-1). Contract: /root/reference/textsearch/csrc/utils.h:29-67.
    """
    sa = np.asarray(suffix_array, dtype=np.int64)
    n = sa.shape[0]
    assert num_close_matches % 2 == 0 and num_close_matches >= 2
    half = num_close_matches // 2
    sentinel = n - 2
    out = np.full((query_len, num_close_matches), sentinel, dtype=np.int32)

    def ref_value(pos: int) -> int:
        # EOS position is mapped to the sentinel per the contract
        return sentinel if pos == n - 1 else pos

    # backward fill: last `half` reference positions seen before each SA slot
    prev: List[int] = []
    for slot in range(n):
        p = int(sa[slot])
        if p < query_len:
            for j, rp in enumerate(prev[-half:]):
                out[p, half - min(half, len(prev)) + j] = rp
        else:
            prev.append(ref_value(p))
    # forward fill: next `half` reference positions after each SA slot
    nxt: List[int] = []
    for slot in range(n - 1, -1, -1):
        p = int(sa[slot])
        if p < query_len:
            for j, rp in enumerate(reversed(nxt[-half:])):
                out[p, half + j] = rp
        else:
            nxt.append(ref_value(p))
    return out


def get_longest_increasing_pairs(
    seq1: Sequence[int], seq2: Sequence[int]
) -> List[Tuple[int, int]]:
    """Longest chain of (seq1[i], seq2[i]) pairs non-decreasing in both
    coordinates. O(n log n) patience algorithm with dominance pruning.
    Contract: /root/reference/textsearch/csrc/match.h:28-115.
    """
    pairs = sorted(zip(seq1, seq2))
    if not pairs:
        return []
    # LIS (non-decreasing) on the second coordinate
    tails: List[int] = []  # smallest tail second-value per chain length
    tails_idx: List[int] = []
    prev = [-1] * len(pairs)
    seconds = [p[1] for p in pairs]
    for i, s in enumerate(seconds):
        j = bisect_right(tails, s)
        prev[i] = tails_idx[j - 1] if j > 0 else -1
        if j == len(tails):
            tails.append(s)
            tails_idx.append(i)
        else:
            tails[j] = s
            tails_idx[j] = i
    # backtrace
    out: List[Tuple[int, int]] = []
    i = tails_idx[-1]
    while i != -1:
        out.append(pairs[i])
        i = prev[i]
    out.reverse()
    return out


def levenshtein_distance(
    query,
    target,
    mode: str = "infix",
    insert_cost: int = 1,
    delete_cost: int = 1,
    replace_cost: int = 1,
) -> Tuple[int, List[Tuple[int, int, str]]]:
    """Edit distance with full alignment backtrace.

    mode="global": standard Levenshtein; returns [(0, len(target)-1, align)].
    mode="infix": deletions at target start/end are free; returns ALL
    co-optimal (start, end, align) segments (end = index of last consumed
    target element). Align chars: C correct, S substitution, I insertion
    (query symbol unmatched), D deletion (target symbol unmatched).
    Contract: /root/reference/textsearch/python/csrc/levenshtein.cc:28-127.
    """
    q = list(query)
    t = list(target)
    m, n = len(q), len(t)
    # Vectorized row-wise DP (the reference's equivalent is GIL-released C++,
    # levenshtein.h:264-378; here the per-row recurrence runs as whole-row
    # NumPy ops). dp[i][j]: cost aligning q[:i] against t[..j] (suffix-free
    # start in infix mode). The left-to-right dependency
    #   row[j] = min(cand[j], row[j-1] + delete_cost)
    # resolves exactly via the min-prefix identity: with
    #   g[j] = row[j] - j*delete_cost,
    # g is the running minimum of [row[0], cand[j] - j*delete_cost].
    dp = np.zeros((m + 1, n + 1), dtype=np.int32)
    dp[0, :] = 0 if mode == "infix" else np.arange(n + 1) * delete_cost
    dp[1:, 0] = np.arange(1, m + 1) * insert_cost
    t_arr = np.asarray(t) if n else np.empty(0)
    j_del = np.arange(1, n + 1, dtype=np.int32) * delete_cost
    for i in range(1, m + 1):
        prev_row = dp[i - 1]
        cost = np.where(t_arr == q[i - 1], 0, replace_cost) if n else j_del
        cand = np.minimum(prev_row[:-1] + cost, prev_row[1:] + insert_cost)
        g = np.minimum.accumulate(
            np.concatenate(([dp[i, 0]], cand - j_del))
        )
        dp[i, 1:] = g[1:] + j_del
    if mode == "global":
        ends = [n]
        distance = int(dp[m, n])
    else:
        distance = int(dp[m].min())
        ends = np.nonzero(dp[m] == distance)[0].tolist()
        # an end at j=0 means empty target segment; the reference only
        # reports segments that consume target symbols unless target empty
        if n > 0:
            ends = [j for j in ends if j > 0] or ends

    def backtrace(j_end: int) -> Tuple[int, int, str]:
        i, j = m, j_end
        ops: List[str] = []
        while i > 0 or (mode == "global" and j > 0):
            if i > 0 and j > 0:
                c = 0 if t[j - 1] == q[i - 1] else replace_cost
                if dp[i, j] == dp[i - 1, j - 1] + c:
                    ops.append("C" if c == 0 else "S")
                    i -= 1
                    j -= 1
                    continue
            if i > 0 and dp[i, j] == dp[i - 1, j] + insert_cost:
                ops.append("I")
                i -= 1
                continue
            if j > 0 and dp[i, j] == dp[i, j - 1] + delete_cost:
                ops.append("D")
                j -= 1
                continue
            break  # i==0 in infix mode: free prefix
        ops.reverse()
        start = j
        return (start, j_end - 1, "".join(ops))

    aligns = [backtrace(j) for j in ends]
    return distance, aligns


def row_ids_to_row_splits(row_ids) -> np.ndarray:
    """[1,1,3,3,5] -> [0,0,2,2,4,4,5]. splits[r] = first index with id >= r.
    Contract: /root/reference/textsearch/python/textsearch/utils.py:90-107."""
    ids = np.asarray(row_ids, dtype=np.int64)
    num_rows = int(ids[-1]) + 1 if ids.size else 0
    return np.searchsorted(ids, np.arange(num_rows + 1), side="left").astype(
        np.uint32
    )


def is_overlap(
    ranges: List[Tuple[float, float]],
    indexes: List[int],
    query: Tuple[float, float],
    segment_index: int,
    overlap_ratio: float = 0.25,
) -> Tuple[bool, Optional[int]]:
    """Sorted non-overlapping interval set with ratio-based suppression.

    Semantics match /root/reference/textsearch/python/textsearch/utils.py:110-205:
    mutates `ranges`/`indexes`; returns (False, None) if inserted cleanly,
    (True, None) if the query is dropped (overlaps an existing range by more
    than overlap_ratio of the query, or both neighbors), (True, evicted_index)
    if an existing range was evicted in favor of the query.
    """
    idx = bisect_left(ranges, query)
    if not ranges:
        ranges.insert(idx, query)
        indexes.insert(idx, segment_index)
        return False, None

    qlen = query[1] - query[0]
    if idx > 0 and ranges[idx - 1][1] - query[0] > qlen * overlap_ratio:
        return True, None
    if idx < len(ranges) and query[1] - ranges[idx][0] > qlen * overlap_ratio:
        return True, None

    left_hit = False
    if idx > 0:
        left = ranges[idx - 1]
        left_hit = left[1] - query[0] > (left[1] - left[0]) * overlap_ratio
    right_hit = False
    if idx < len(ranges):
        right = ranges[idx]
        right_hit = query[1] - right[0] > (right[1] - right[0]) * overlap_ratio

    if left_hit and not right_hit:
        ranges.insert(idx, query)
        ranges.pop(idx - 1)
        indexes.insert(idx, segment_index)
        return True, indexes.pop(idx - 1)
    if right_hit and not left_hit:
        ranges.insert(idx, query)
        ranges.pop(idx + 1)
        indexes.insert(idx, segment_index)
        return True, indexes.pop(idx + 1)
    if left_hit and right_hit:
        return True, None
    ranges.insert(idx, query)
    indexes.insert(idx, segment_index)
    return False, None


def get_nice_alignments(alignments, query, target):
    """Pretty-print (start, end, align_str) items like the reference's
    textsearch.get_nice_alignments: three lines per segment — query symbols,
    operation markers (space for C, * for S, + for I, - for D), target
    symbols. Contract: /root/reference/textsearch/python/textsearch/utils.py
    (display helper; format kept human-oriented, pinned loosely)."""
    out = []
    q = list(query)
    t = list(target)
    for start, end, align in alignments:
        qi, ti = 0, start
        top, mid, bot = [], [], []
        for op in align:
            if op in ("C", "S"):
                a, b = str(q[qi]), str(t[ti])
                w = max(len(a), len(b))
                top.append(a.rjust(w))
                bot.append(b.rjust(w))
                mid.append((" " if op == "C" else "*").rjust(w))
                qi += 1
                ti += 1
            elif op == "I":
                a = str(q[qi])
                top.append(a)
                bot.append(" " * len(a))
                mid.append("+".rjust(len(a)))
                qi += 1
            else:  # D
                b = str(t[ti])
                top.append(" " * len(b))
                bot.append(b)
                mid.append("-".rjust(len(b)))
                ti += 1
        out.append(" ".join(top) + chr(10) + " ".join(mid) + chr(10) + " ".join(bot))
    return out
