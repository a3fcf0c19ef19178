"""Hierarchical shard merge: merged index must be BYTE-identical to one
built directly at the target shard count (same docs -> same gaps -> same
varbyte), across one and two merge levels."""

import pytest
from pyspark.sql import functions as F

from text_search_spark.corpus import generate_pages
from text_search_spark.index import format as fmt
from text_search_spark.index.build import build_index, prepare_corpus
from text_search_spark.index.merge import merge_shards
from text_search_spark.index.query import QuerySpec, bm25_topk_df

N_DOCS = 300


def _fingerprint(spark, d):
    return sorted(
        tuple(r)
        for r in spark.read.parquet(fmt.segments_dir(d))
        .select(
            "term_id",
            "shard",
            "df_part",
            "cf_part",
            F.md5(F.hex("postings")).alias("ph"),
            F.md5(F.hex("positions")).alias("qh"),
            F.md5(F.hex("blockmax")).alias("bh"),
        )
        .collect()
    )


def test_merge_matches_direct_build(spark, tmp_path):
    pages = generate_pages(N_DOCS)
    pdf = spark.createDataFrame(
        [(p.url, p.text) for p in pages], "url string, text string"
    )
    corpus = prepare_corpus(pdf, url_col="url")
    dirs = {}
    for s in (4, 2, 1):
        d = str(tmp_path / f"ix{s}")
        build_index(spark, corpus, d, n_buckets=4, n_shards=s, bucket_groups=1)
        dirs[s] = d

    m2 = str(tmp_path / "m2")
    merge_shards(spark, dirs[4], m2, factor=2)
    assert _fingerprint(spark, m2) == _fingerprint(spark, dirs[2])

    m1 = str(tmp_path / "m1")
    merge_shards(spark, m2, m1, factor=2)
    assert _fingerprint(spark, m1) == _fingerprint(spark, dirs[1])

    # and the merged index answers queries identically
    specs = [
        QuerySpec("q1", ["the"], "or"),
        QuerySpec("q2", ["needlea", "marker0"], "and"),
        QuerySpec("q3", ["needlea", "marker0", "sentinel0"], "phrase"),
    ]

    def res(d):
        return sorted(
            (r.query_id, r.rank, r.doc_id, r.score)
            for r in bm25_topk_df(spark, d, specs, k=10).collect()
        )

    assert res(m1) == res(dirs[4]) == res(dirs[1])
