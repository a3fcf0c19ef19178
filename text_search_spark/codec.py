"""Posting-list physical codec: delta-gap + variable-byte, with block-max
metadata for WAND pruning (SURVEY.md §4 custom-work item 2).

The reference bounds memory by renumbering its alphabet before the radix sort
(/root/reference/textsearch/python/textsearch/suffix_array.py:73-78); our
analog at index scale is gap+varbyte compression of posting lists. Everything
is NumPy-vectorized (no per-doc Python) so it runs inside Arrow UDFs on the
build/query hot path.

Posting-list layout for one term — struct-of-arrays, so decode is four
vectorized slices (all values varbyte uint64):
  [n_docs]
  [doc_gap_0 .. doc_gap_{n-1}]     doc_gap_0 = doc_id_0, strictly ascending
  [tf_0 .. tf_{n-1}]
  [doc_len_0 .. doc_len_{n-1}]     per-doc token count, so BM25 scoring
                                   needs NO join against doc_stats
  [pos_gap stream]                 per-doc position gaps, first = position_0

Block-max sidecar (BLOCK docs per block, little-endian struct array):
  (last_doc_id uint64, max_tf_sat float32) per block, where tf_sat is the
  exact per-doc BM25 tf-saturation factor tf*(k1+1)/(tf+k1*(1-b+b*dl/avgdl));
  multiplied by idf at query time it upper-bounds the block's contribution.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

BLOCK = 128
K1 = 1.2
B = 0.75

_BM_DTYPE = np.dtype([("last_doc", "<u8"), ("max_sat", "<f4")])


def varbyte_encode_with_sizes(values: np.ndarray):
    """Vectorized varbyte encode -> (bytes, per-value byte counts int64).
    The sizes array lets a caller that encoded MANY posting lists in one
    pass slice the output buffer per list (see build.py's segment builder)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    rem = v.copy()
    k = 0
    active = np.arange(v.size)
    while active.size:
        idx = starts[active] + k
        byte = (rem[active] & np.uint64(0x7F)).astype(np.uint8)
        more = (rem[active] >> np.uint64(7)) > 0
        out[idx] = byte | (more.astype(np.uint8) << 7)
        rem[active] >>= np.uint64(7)
        active = active[more]
        k += 1
    return out.tobytes(), nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte (7 bits/byte, high bit = continuation)."""
    return varbyte_encode_with_sizes(values)[0]


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Vectorized varbyte decode -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate([[0], ends[:-1] + 1])
    lengths = ends - starts + 1
    out = np.zeros(ends.size, dtype=np.uint64)
    payload = (b & 0x7F).astype(np.uint64)
    for k in range(int(lengths.max())):
        mask = lengths > k
        out[mask] |= payload[starts[mask] + k] << np.uint64(7 * k)
    return out


def _segment_delta(flat: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Per-segment delta: gap[i] = flat[i]-flat[i-1], except at segment starts
    where gap = flat[start] (absolute). Fully vectorized."""
    gaps = np.empty_like(flat)
    gaps[1:] = flat[1:] - flat[:-1]
    if flat.size:
        gaps[0] = flat[0]
        gaps[seg_starts] = flat[seg_starts]
    return gaps


def _segment_cumsum(gaps: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Inverse of _segment_delta: per-segment inclusive cumsum, vectorized
    via global-cumsum minus carried offset."""
    if gaps.size == 0:
        return gaps
    g = np.cumsum(gaps)
    # offset to subtract for each element = global cumsum just before its
    # segment start
    seg_of = np.zeros(gaps.size, dtype=np.int64)
    seg_of[seg_starts] = 1
    seg_id = np.cumsum(seg_of) - 1
    base = np.concatenate([[0], g])[seg_starts]  # cumsum before each segment
    return g - base[seg_id]


def encode_postings_flat(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    flat_positions: np.ndarray,
    doc_lens: np.ndarray | None = None,
) -> bytes:
    """doc_ids strictly ascending; flat_positions = concatenation of each
    doc's ascending positions (len == tfs.sum()); doc_lens per doc."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    flat_positions = np.asarray(flat_positions, dtype=np.int64)
    if doc_lens is None:
        doc_lens = np.zeros_like(tfs)
    n = doc_ids.size
    doc_gaps = np.diff(doc_ids, prepend=0).astype(np.uint64)
    seg_starts = np.concatenate([[0], np.cumsum(tfs)[:-1]]) if n else np.empty(
        0, dtype=np.int64
    )
    pos_gaps = _segment_delta(flat_positions, seg_starts.astype(np.int64)).astype(
        np.uint64
    )
    stream = np.concatenate(
        [
            np.array([n], dtype=np.uint64),
            doc_gaps,
            tfs.astype(np.uint64),
            np.asarray(doc_lens, dtype=np.uint64),
            pos_gaps,
        ]
    )
    return varbyte_encode(stream)


def decode_postings_flat(
    buf: bytes,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """-> (doc_ids int64, tfs int64, flat_positions int64, doc_lens int64)."""
    vals = varbyte_decode(buf)
    if vals.size == 0:
        e = np.empty(0, np.int64)
        return e, e.copy(), e.copy(), e.copy()
    n = int(vals[0])
    doc_ids = np.cumsum(vals[1 : 1 + n].astype(np.int64))
    tfs = vals[1 + n : 1 + 2 * n].astype(np.int64)
    doc_lens = vals[1 + 2 * n : 1 + 3 * n].astype(np.int64)
    pos_gaps = vals[1 + 3 * n :].astype(np.int64)
    seg_starts = np.concatenate([[0], np.cumsum(tfs)[:-1]]) if n else np.empty(
        0, dtype=np.int64
    )
    flat_positions = _segment_cumsum(pos_gaps, seg_starts.astype(np.int64))
    return doc_ids, tfs, flat_positions, doc_lens


# convenience ragged wrappers (tests / small-data paths)

def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    positions: List[np.ndarray],
    doc_lens: np.ndarray | None = None,
) -> bytes:
    flat = (
        np.concatenate([np.asarray(p, dtype=np.int64) for p in positions])
        if positions
        else np.empty(0, dtype=np.int64)
    )
    return encode_postings_flat(doc_ids, tfs, flat, doc_lens)


def decode_postings(buf: bytes) -> Tuple[np.ndarray, np.ndarray, List[np.ndarray]]:
    doc_ids, tfs, flat, _ = decode_postings_flat(buf)
    positions, off = [], 0
    for tf in tfs:
        positions.append(flat[off : off + int(tf)])
        off += int(tf)
    return doc_ids, tfs, positions


def tf_saturation(
    tfs: np.ndarray, doc_lens: np.ndarray, avgdl: float
) -> np.ndarray:
    """Exact BM25 tf factor per posting: tf*(k1+1)/(tf+k1*(1-b+b*dl/avgdl))."""
    tfs = np.asarray(tfs, dtype=np.float64)
    doc_lens = np.asarray(doc_lens, dtype=np.float64)
    return tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * doc_lens / avgdl))


def f32_upper(x: np.ndarray) -> np.ndarray:
    """float32 values >= the float64 inputs (a round-UP narrowing
    cast). The stored block-max is consumed as an UPPER bound by the
    query engine's MaxScore pruning ('provably exact top-k'): a plain
    round-to-nearest .astype(float32) can land up to half an ulp BELOW
    the exact float64 saturation, letting a hairline-tie doc be pruned
    out of the true top-k."""
    f = np.asarray(x, dtype=np.float64).astype(np.float32)
    low = f.astype(np.float64) < x
    if low.any():
        f[low] = np.nextafter(f[low], np.float32(np.inf))
    return f


def encode_blockmax(
    doc_ids: np.ndarray, tfs: np.ndarray, doc_lens: np.ndarray, avgdl: float
) -> bytes:
    """Per-BLOCK (last_doc_id, max tf_saturation) sidecar, vectorized."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    sat = tf_saturation(tfs, doc_lens, avgdl)
    n = doc_ids.size
    nblocks = (n + BLOCK - 1) // BLOCK
    out = np.empty(nblocks, dtype=_BM_DTYPE)
    pad = nblocks * BLOCK - n
    sat_p = np.pad(sat, (0, pad), constant_values=0.0).reshape(nblocks, BLOCK)
    ends = np.minimum(np.arange(1, nblocks + 1) * BLOCK, n) - 1
    out["last_doc"] = doc_ids[ends].astype(np.uint64)
    out["max_sat"] = f32_upper(sat_p.max(axis=1))
    return out.tobytes()


def decode_blockmax(buf: bytes) -> Tuple[np.ndarray, np.ndarray]:
    arr = np.frombuffer(buf, dtype=_BM_DTYPE)
    return arr["last_doc"].astype(np.int64), arr["max_sat"].copy()


# ---------------------------------------------------------------------------
# v2 block-skippable postings: the query engine's physical format.
#
#   prefix : u32 n_docs, u32 n_blocks            (little-endian, fixed)
#   header : per block (u16 nd, u32 nbytes)      (fixed-width directory)
#   payload: per block, varbyte values [doc_gap*nd, tf*nd, dl*nd]
#
# doc_gap semantics: plain delta from the previous doc overall (first doc
# of the list is absolute). A block decodes INDEPENDENTLY because the
# block-max sidecar stores the previous block's last_doc as the base.
# Positions live in a SEPARATE column (encode_positions) so OR/AND scoring
# never reads position bytes — they typically dominate the index size.
# The fixed-width directory is what makes block-max MaxScore/WAND able to
# skip decoding blocks it proves can't reach the top-k (query.py).
# ---------------------------------------------------------------------------

_PREFIX_DTYPE = np.dtype([("n_docs", "<u4"), ("n_blocks", "<u4")])
_HDR_DTYPE = np.dtype([("nd", "<u2"), ("nbytes", "<u4")])


def encode_block_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, doc_lens: np.ndarray
) -> bytes:
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    doc_lens = np.asarray(doc_lens, dtype=np.int64)
    n = doc_ids.size
    nb = (n + BLOCK - 1) // BLOCK
    gaps = np.diff(doc_ids, prepend=0).astype(np.uint64)
    # value stream: per block [gaps, tfs, dls]
    vals = np.empty(3 * n, dtype=np.uint64)
    nd_b = np.minimum(BLOCK, n - np.arange(nb) * BLOCK)
    v_off = np.concatenate([[0], np.cumsum(3 * nd_b)])
    idx = np.arange(n)
    bb = idx // BLOCK
    rb = idx % BLOCK
    base = v_off[bb]
    vals[base + rb] = gaps
    vals[base + nd_b[bb] + rb] = tfs.astype(np.uint64)
    vals[base + 2 * nd_b[bb] + rb] = doc_lens.astype(np.uint64)
    payload, sizes = varbyte_encode_with_sizes(vals)
    nbytes_b = (
        np.add.reduceat(sizes, v_off[:-1]) if n else np.empty(0, np.int64)
    )
    prefix = np.array([(n, nb)], dtype=_PREFIX_DTYPE)
    hdr = np.empty(nb, dtype=_HDR_DTYPE)
    hdr["nd"] = nd_b
    hdr["nbytes"] = nbytes_b
    return prefix.tobytes() + hdr.tobytes() + payload


def block_header(buf: bytes):
    """-> (n_docs, nd per block, payload byte offset per block, payload_base)."""
    n, nb = np.frombuffer(buf, dtype=_PREFIX_DTYPE, count=1)[0]
    hdr = np.frombuffer(buf, dtype=_HDR_DTYPE, count=int(nb), offset=8)
    nd_b = hdr["nd"].astype(np.int64)
    byte_off = np.concatenate([[0], np.cumsum(hdr["nbytes"].astype(np.int64))])
    return int(n), nd_b, byte_off, 8 + _HDR_DTYPE.itemsize * int(nb)


def decode_block_postings(buf: bytes):
    """Full decode -> (doc_ids, tfs, dls) int64."""
    n, nd_b, byte_off, base = block_header(buf)
    if n == 0:
        e = np.empty(0, np.int64)
        return e, e.copy(), e.copy()
    vals = varbyte_decode(buf[base:])
    v_off = np.concatenate([[0], np.cumsum(3 * nd_b)])
    nb = nd_b.size
    idx = np.arange(n)
    bb = idx // BLOCK
    rb = idx % BLOCK
    vb = v_off[bb]
    gaps = vals[vb + rb].astype(np.int64)
    tfs = vals[vb + nd_b[bb] + rb].astype(np.int64)
    dls = vals[vb + 2 * nd_b[bb] + rb].astype(np.int64)
    return np.cumsum(gaps), tfs, dls


def decode_selected_blocks(buf: bytes, sel: np.ndarray, bases: np.ndarray):
    """Decode only blocks in `sel` (sorted block indices). `bases[i]` is the
    doc_id base of block sel[i] (previous block's last_doc from the
    block-max sidecar; 0 for block 0). -> (doc_ids, tfs, dls)."""
    n, nd_b, byte_off, base = block_header(buf)
    sel = np.asarray(sel, dtype=np.int64)
    if sel.size == 0:
        e = np.empty(0, np.int64)
        return e, e.copy(), e.copy()
    chunks = [buf[base + byte_off[b] : base + byte_off[b + 1]] for b in sel]
    vals = varbyte_decode(b"".join(chunks))
    nd_s = nd_b[sel]
    total = int(nd_s.sum())
    v_off = np.concatenate([[0], np.cumsum(3 * nd_s)])
    seg_id = np.repeat(np.arange(sel.size), nd_s)
    rank = np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(nd_s)])[:-1], nd_s
    )
    vb = v_off[seg_id]
    gaps = vals[vb + rank].astype(np.int64)
    tfs = vals[vb + nd_s[seg_id] + rank].astype(np.int64)
    dls = vals[vb + 2 * nd_s[seg_id] + rank].astype(np.int64)
    # per-block cumsum with sidecar bases
    starts = np.concatenate([[0], np.cumsum(nd_s)])[:-1]
    doc_ids = _segment_cumsum(gaps, starts) + np.repeat(
        np.asarray(bases, dtype=np.int64), nd_s
    )
    return doc_ids, tfs, dls


def encode_positions(flat_pos_gaps: np.ndarray) -> bytes:
    """Positions sidecar: varbyte of per-doc position gaps (first of each
    doc absolute). Boundaries come from the postings' tfs at decode time."""
    return varbyte_encode(np.asarray(flat_pos_gaps, dtype=np.uint64))


def decode_positions(buf: bytes, tfs: np.ndarray) -> np.ndarray:
    """-> flat positions (int64), per-doc ascending; len == tfs.sum()."""
    gaps = varbyte_decode(buf).astype(np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    starts = (
        np.concatenate([[0], np.cumsum(tfs)[:-1]])
        if tfs.size
        else np.empty(0, np.int64)
    )
    return _segment_cumsum(gaps, starts.astype(np.int64))


def live_doc_mask(d: np.ndarray, tombs) -> "np.ndarray | None":
    """Boolean keep-mask for doc array `d` against a SORTED tombstone
    array (index/delete.py); None = keep everything (the common
    no-deletes path allocates nothing). Shared by the query-side
    exclusion (query._TermPostings) and the compaction purge
    (merge._live_rows) so the membership test cannot diverge."""
    if tombs is None or tombs.size == 0 or d.size == 0:
        return None
    idx = np.searchsorted(tombs, d)
    idx_c = np.minimum(idx, tombs.size - 1)
    return ~((idx < tombs.size) & (tombs[idx_c] == d))


def ragged_take_index(tfs: np.ndarray, keep_idx: np.ndarray) -> np.ndarray:
    """Gather index into a flat per-doc-run array (e.g. decode_positions
    output, len == tfs.sum()) selecting the runs of docs `keep_idx`
    (indices into tfs), in keep_idx order. One vectorized construction
    shared by every ragged filter/reorder site."""
    tfs = np.asarray(tfs, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(tfs)])[:-1]
    lens = tfs[keep_idx]
    out_starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    return (
        np.arange(int(lens.sum()), dtype=np.int64)
        - np.repeat(out_starts, lens)
        + np.repeat(starts[keep_idx], lens)
    )
