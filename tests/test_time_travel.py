"""Snapshot time travel: a reader pinned to a historical claimed
snapshot answers as of that commit, regardless of later appends and
compactions (Iceberg as-of-snapshot scan semantics)."""

import pytest

from text_search_spark.index import format as fmt
from text_search_spark.index.merge import compact_in_place, vacuum_segments
from text_search_spark.index.query import IndexReader, QuerySpec, bm25_topk_rows
from text_search_spark.streaming.incremental import _append_batch

from tests.test_commit_protocol import _batch_df


def _docs_at(spark, ix, term, snapshot_id=None):
    rows = bm25_topk_rows(
        spark,
        ix,
        [QuerySpec("q", [term], "or")],
        k=500,
        reader=IndexReader(spark, ix, snapshot_id=snapshot_id),
    )
    return {r[2] for r in rows}


def test_pinned_reader_sees_historic_state(spark, tmp_path):
    ix = str(tmp_path / "tt")
    sids = []
    for bid in range(3):
        _append_batch(spark, _batch_df(spark, bid), ix, batch_id=bid)
        sids.append(fmt.load_manifest(ix).snapshot_id)
    compact_in_place(spark, ix)
    sid_compact = fmt.load_manifest(ix).snapshot_id
    assert sid_compact > sids[-1]

    # as-of each append: exactly the batches committed by then
    for n_batches, sid in enumerate(sids, start=1):
        got = _docs_at(spark, ix, "alpha", snapshot_id=sid)
        assert got == {
            1000 * b + i for b in range(n_batches) for i in range(30)
        }, f"snapshot v{sid}"
    # pinned pre-compaction snapshot answers identically post-compaction
    assert _docs_at(spark, ix, "alpha", snapshot_id=sids[-1]) == _docs_at(
        spark, ix, "alpha"
    )

    # a pinned reader's refresh keeps the pin
    r = IndexReader(spark, ix, snapshot_id=sids[0])
    r.refresh()
    assert r.manifest.snapshot_id == sids[0]

    hist = fmt.snapshot_history(ix)
    assert [h["snapshot_id"] for h in hist] == sorted(
        h["snapshot_id"] for h in hist
    )
    assert {s for s in sids} <= {h["snapshot_id"] for h in hist}
    by_sid = {h["snapshot_id"]: h for h in hist}
    assert by_sid[sids[0]]["n_docs"] == 30
    assert by_sid[sid_compact]["n_docs"] == 90
    assert f"compact:0" in by_sid[sid_compact]["stages"]


def test_expired_snapshot_raises_and_vacuum_retires_its_files(
    spark, tmp_path
):
    ix = str(tmp_path / "ttexp")
    for bid in range(2):
        _append_batch(spark, _batch_df(spark, bid), ix, batch_id=bid)
    sid_old = fmt.load_manifest(ix).snapshot_id
    compact_in_place(spark, ix)

    # retained: pinned read works even though the live snapshot moved on
    assert len(_docs_at(spark, ix, "alpha", snapshot_id=sid_old)) == 60

    fmt.expire_snapshots(ix, retain_last=1)
    with pytest.raises(ValueError, match="expired|never claimed"):
        IndexReader(spark, ix, snapshot_id=sid_old)

    # with history expired, vacuum (no grace) retires the old files;
    # the live snapshot still answers
    removed = vacuum_segments(ix, grace_s=0.0, retain_last=1)
    assert removed > 0
    assert len(_docs_at(spark, ix, "alpha")) == 60
