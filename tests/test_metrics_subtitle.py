"""Overlap-ratio sweep (A5) + subtitle max_error_rate gate — semantics
mirrored from /root/reference/examples/libriheavy/tools/
calculate_overlap_ratio.py:43-86 and examples/subtitle/matching.py:142-166."""

import numpy as np
import pytest

from text_search_spark.operators.metrics import GLOBAL_ID, _sweep, overlap_ratio


def _ref_sweep(pairs):
    """Line-for-line mirror of the reference's nested while loop."""
    values = sorted(pairs, key=lambda x: x[0])
    overlap = 0
    for i in range(len(values) - 1):
        j = i + 1
        while values[j][0] < values[i][1]:
            overlap += values[i][1] - values[j][0]
            if j == len(values) - 1:
                break
            j += 1
    return overlap


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_sweep_vs_reference_semantics(seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    starts = np.sort(rng.integers(0, 1000, size=60))
    durs = rng.integers(1, 80, size=60)
    ends = starts + durs
    order = np.lexsort((ends, starts))
    got = _sweep(starts[order].astype(np.int64), ends[order].astype(np.int64))
    # the reference's start-only stable sort leaves tie order to input
    # order; hand it the determinized (start, end) order so both sides
    # resolve ties identically (the operator's documented totalization)
    want = _ref_sweep(
        [(int(starts[i]), int(ends[i])) for i in order]
    )
    assert got == want


def test_sweep_hand_case():
    # [0,10) [5,8) [6,20) [25,30): i=0 overlaps j=1 (10-5) and j=2 (10-6);
    # i=1 overlaps j=2 (8-6); i=2 none (20<25 false -> 25>=20); total 11
    s = np.array([0, 5, 6, 25], dtype=np.int64)
    e = np.array([10, 8, 20, 30], dtype=np.int64)
    assert _sweep(s, e) == 11
    assert _ref_sweep(list(zip(s.tolist(), e.tolist()))) == 11


def test_overlap_ratio_spark(spark):
    rows = [
        ("r1", 0, 10), ("r1", 5, 3), ("r1", 6, 14), ("r1", 25, 5),
        ("r2", 0, 4), ("r2", 10, 4),
    ]
    df = spark.createDataFrame(
        rows, "recording_id string, start_us long, duration_us long"
    )
    out = {r.recording_id: r for r in overlap_ratio(df).collect()}
    assert out["r1"].overlap_us == 11
    assert out["r1"].duration_us == 32
    assert out["r1"].ratio == round(11 / 32, 6)
    assert out["r2"].overlap_us == 0
    assert out[GLOBAL_ID].overlap_us == 11
    assert out[GLOBAL_ID].duration_us == 40
    assert out[GLOBAL_ID].n_segments == 6


def test_subtitle_gate_spark(spark):
    from text_search_spark.operators.align import subtitle_align

    hyp = "the quick brown fox jumps over the lazy dog"
    times = [i * 0.1 for i in range(len(hyp))]
    rows = [
        ("exact", "quick brown", hyp, times),
        ("one_err", "quick brawn", hyp, times),     # 1/11 err -> passes 0.15
        ("garbage", "zzzzqqqqvvv", hyp, times),     # way over budget
    ]
    df = spark.createDataFrame(
        rows,
        "pair_id string, ref_text string, hyp_text string, "
        "char_times array<double>",
    )
    out = {r.pair_id: r for r in subtitle_align(df, 0.15).collect()}
    assert set(out) == {"exact", "one_err"}
    r = out["exact"]
    assert r.distance == 0
    assert hyp[r.t_start : r.t_end] == "quick brown"  # end advanced by 1
    assert r.start_time == pytest.approx(times[hyp.index("quick")])
    assert out["one_err"].distance == 1
