"""Index upserts: re-crawled urls replace their previous version
(append + version-scoped doc_ids + tombstones), streamed end-to-end;
post-purge the index equals a fresh build of the latest-snapshot
corpus."""

import datetime

from pyspark.sql import functions as F

from text_search_spark.index import format as fmt
from text_search_spark.index.build import build_index, prepare_corpus
from text_search_spark.index.merge import compact_in_place
from text_search_spark.index.query import QuerySpec, bm25_topk_df
from text_search_spark.streaming.incremental import (
    incremental_index_upserts,
    upsert_batch,
)

N_URLS = 60


def _pages(version: int, urls):
    # version-tagged marker terms make old/new content distinguishable
    return [
        (
            f"https://ex.org/p{u}",
            datetime.datetime(2024, 1, version),
            f"shared corpus text page{u} marker{'old' if version == 1 else 'new'}v "
            f"filler{u % 7} " * 3,
        )
        for u in urls
    ]


def _results(spark, ix, terms):
    specs = [QuerySpec(t, [t], "or") for t in terms]
    out = bm25_topk_df(spark, ix, specs, k=50)
    return sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 9))
        for r in out.collect()
    )


def test_upsert_replaces_recrawled_urls_and_purge_matches_fresh(
    spark, tmp_path
):
    ix = str(tmp_path / "ups_ix")
    schema = "url string, warc_ts timestamp, text string"

    # batch 0: all urls v1; batch 1: half the urls re-crawled as v2
    b0 = spark.createDataFrame(_pages(1, range(N_URLS)), schema)
    recrawled = list(range(0, N_URLS, 2))
    b1 = spark.createDataFrame(_pages(2, recrawled), schema)
    upsert_batch(spark, b0, ix, 0, ts_col="warc_ts")
    upsert_batch(spark, b1, ix, 1, ts_col="warc_ts")

    man = fmt.load_manifest(ix)
    assert len(man.tombstone_files) == 1  # batch 1's replacements
    # old-version marker only matches never-recrawled urls
    got_old = _results(spark, ix, ["markeroldv"])
    assert len(got_old) == N_URLS - len(recrawled)
    got_new = _results(spark, ix, ["markernewv"])
    assert len(got_new) == len(recrawled)
    # per-url uniqueness: page{u} terms hit exactly one doc each
    for u in (0, 1):
        hit = _results(spark, ix, [f"page{u}"])
        assert len(hit) == 1, hit

    # redelivery of batch 1 converges (append no-ops, delete re-derives)
    upsert_batch(spark, b1, ix, 1, ts_col="warc_ts")
    assert _results(spark, ix, ["markernewv"]) == got_new

    # purge, then compare against a fresh build of the latest corpus
    compact_in_place(spark, ix)
    man = fmt.load_manifest(ix)
    assert man.tombstone_files is None and man.n_docs == N_URLS

    latest = b0.where(
        ~F.col("url").isin([f"https://ex.org/p{u}" for u in recrawled])
    ).select(
        F.xxhash64("url", F.lit(0)).alias("doc_id"), "url", "text"
    ).unionByName(
        b1.select(
            F.xxhash64("url", F.lit(1)).alias("doc_id"), "url", "text"
        )
    )
    fresh = str(tmp_path / "fresh_ix")
    build_index(
        spark,
        prepare_corpus(latest, doc_id_col="doc_id", url_col="url"),
        fresh,
        n_buckets=man.n_buckets,
        n_shards=man.n_shards,
        bucket_groups=1,
    )
    terms = ["markeroldv", "markernewv", "shared", "page3"]
    assert _results(spark, ix, terms) == _results(spark, fresh, terms)


def test_streaming_upserts_with_in_batch_refetch_collapse(
    spark, tmp_path
):
    """The streaming wrapper: batch 1 contains TWO snapshots of the same
    url — only the newest indexes (latest_snapshot collapse)."""
    src = tmp_path / "ups_src"
    src.mkdir()
    schema = "url string, warc_ts timestamp, text string"
    spark.createDataFrame(_pages(1, range(10)), schema).coalesce(
        1
    ).write.parquet(str(src / "b0"))
    dup = _pages(1, [3]) + _pages(2, [3])  # two snapshots of p3
    spark.createDataFrame(dup, schema).coalesce(1).write.parquet(
        str(src / "b1")
    )

    ix = str(tmp_path / "s_ix")
    q = incremental_index_upserts(
        spark,
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*"),
        ix,
        str(tmp_path / "s_ckpt"),
        ts_col="warc_ts",
    )
    q.awaitTermination(120)

    hit = _results(spark, ix, ["page3"])
    assert len(hit) == 1
    # and it's the v2 text (markernewv present for p3)
    assert len(_results(spark, ix, ["markernewv"])) == 1


def test_streaming_upserts_auto_compact_purges_versions(spark, tmp_path):
    """Upsert stream with inline maintenance: the tombstone-fraction
    trigger purges replaced versions mid-stream, keeping n_docs at the
    live count and the tombstone list consumed."""
    src = tmp_path / "ac_src"
    src.mkdir()
    schema = "url string, warc_ts timestamp, text string"
    urls = list(range(20))
    spark.createDataFrame(_pages(1, urls), schema).coalesce(
        1
    ).write.parquet(str(src / "b0"))
    # re-crawl everything: 100% tombstone fraction after batch 1
    spark.createDataFrame(_pages(2, urls), schema).coalesce(
        1
    ).write.parquet(str(src / "b1"))

    ix = str(tmp_path / "ac_ix")
    from text_search_spark.streaming.incremental import (
        incremental_index_upserts,
    )

    q = incremental_index_upserts(
        spark,
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*"),
        ix,
        str(tmp_path / "ac_ckpt"),
        ts_col="warc_ts",
        auto_compact_files=10**6,  # file-count trigger off
        # 20 dead versions / 40 manifest docs = 0.5; the trigger is
        # strictly greater-than, so 0.4 fires it
        auto_compact_tombstone_frac=0.4,
    )
    q.awaitTermination(180)

    man = fmt.load_manifest(ix)
    assert man.tombstone_files is None  # purge consumed them
    assert any(k.startswith("compact:") for k in man.stages)
    assert man.n_docs == len(urls)  # dead versions physically gone
    assert len(_results(spark, ix, ["markernewv"])) == len(urls)
    assert len(_results(spark, ix, ["markeroldv"])) == 0
