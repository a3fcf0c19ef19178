"""Crawl-table operators: URL refetch dedup + per-host rollup/filter."""

import datetime as dt

from pyspark.sql import functions as F

from text_search_spark.operators import webtext


def _ts(s):
    return dt.datetime(2020, 1, 1) + dt.timedelta(seconds=s)


def _pages(spark):
    rows = [
        # url A fetched three times; newest ts=30 wins
        ("https://a.example/p1", _ts(10), "a v1", "en", 1),
        ("https://a.example/p1", _ts(30), "a v3", "en", 3),
        ("https://a.example/p1", _ts(20), "a v2", "en", 2),
        # url B fetched twice with EQUAL ts; larger fetch_id (5) wins
        ("https://b.example/p1", _ts(40), "b first", "en", 4),
        ("https://b.example/p1", _ts(40), "b second", "de", 5),
        # url C once
        ("https://C.EXAMPLE/p2?x=1", _ts(50), "c only", "fr", 6),
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, lang string, fetch_id long"
    )


def test_latest_snapshot_keeps_newest(spark):
    out = webtext.latest_snapshot(
        _pages(spark), tiebreak_col="fetch_id"
    ).collect()
    by_url = {r.url: r for r in out}
    assert len(out) == 3
    a = by_url["https://a.example/p1"]
    assert (a.text, a.n_snapshots, a.fetch_id) == ("a v3", 3, 3)
    assert a.warc_ts == _ts(30)
    b = by_url["https://b.example/p1"]
    assert (b.text, b.lang, b.n_snapshots) == ("b second", "de", 2)
    c = by_url["https://C.EXAMPLE/p2?x=1"]
    assert (c.text, c.n_snapshots) == ("c only", 1)


def test_latest_snapshot_payload_never_decides(spark):
    # a LARGER payload value on the older row must not beat a newer ts
    rows = [
        ("u", _ts(1), "zzzz late alphabetically", 1),
        ("u", _ts(2), "aaaa", 2),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, fetch_id long"
    )
    (r,) = webtext.latest_snapshot(df, tiebreak_col="fetch_id").collect()
    assert r.text == "aaaa" and r.fetch_id == 2


def test_latest_snapshot_is_single_agg_no_window(spark):
    plan = webtext.latest_snapshot(
        _pages(spark), tiebreak_col="fetch_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # map-side combine: partial_max runs BELOW the url shuffle (Spark
    # picks SortAggregate here — max over a struct with string fields
    # has no hash-buffer impl — but the partial/final split is what
    # bounds the hottest url)
    assert "partial_max" in plan.split("Exchange")[1]
    assert plan.count("Exchange") == 1


def test_host_col_edge_cases(spark):
    df = spark.createDataFrame(
        [
            ("https://WWW.Site.Org:8080/a/b",),
            ("http://user:pw@host.net/x",),
            ("ftp://f.example",),
            ("HTTPS://Upper.Scheme.Net/p",),
            ("not a url",),
        ],
        "url string",
    )
    got = [r[0] for r in df.select(webtext.host_col(F.col("url"))).collect()]
    assert got == [
        "www.site.org", "host.net", "f.example", "upper.scheme.net", ""
    ]


def test_host_stats(spark):
    out = {r.host: r for r in webtext.host_stats(_pages(spark)).collect()}
    assert set(out) == {"a.example", "b.example", "c.example"}
    a = out["a.example"]
    assert a.n_docs == 3 and a.total_chars == 12 and a.n_langs == 1
    assert float(a.avg_chars) == 4.0
    b = out["b.example"]
    assert b.n_docs == 2 and b.total_chars == 15 and b.n_langs == 2
    assert float(b.avg_chars) == 7.5


def test_host_filter_thresholds(spark):
    # min_docs=2 drops the single-page host c.example
    kept = webtext.host_filter(_pages(spark), min_docs=2)
    hosts = {r[0] for r in kept.select(webtext.host_col(F.col("url"))).collect()}
    assert hosts == {"a.example", "b.example"}
    # avg-chars floor drops a.example (avg 4.0) but keeps b.example (8.0)
    kept2 = webtext.host_filter(_pages(spark), min_docs=1, min_avg_chars=5)
    hosts2 = {r[0] for r in kept2.select(webtext.host_col(F.col("url"))).collect()}
    assert hosts2 == {"b.example", "c.example"}


def test_host_filter_broadcasts_small_verdict(spark):
    """Plan pin (round-4 verdict item 3 + round-6 size guard + round-7
    no-cache guard): the verdict side is a broadcast-hinted join — no
    driver-collected local relation, no InMemoryRelation (the round-7
    guard probes cardinality with limit(N+1).count() instead of
    persist(), so nothing is cached), and the page side enters no
    exchange: the ONLY shuffle in the whole plan is the verdict
    rollup's own partial->final aggregate."""
    plan = (
        webtext.host_filter(_pages(spark), min_docs=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # the old path collected the verdict to the driver and joined a
    # LocalTableScan back — gone
    assert "LocalTableScan" not in plan
    # round-7: the guard no longer persists the verdict (cache leak in
    # per-micro-batch callers); the rollup recomputes inside the
    # broadcast side instead of being served from cache
    assert "InMemoryTableScan" not in plan
    # exactly ONE shuffle: the verdict rollup's agg exchange (on the
    # broadcast side). The 10^12-row page table reaches the join bare —
    # no map-stage write of the page side, which plain-join-under-AQE
    # would do
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastExchange" in plan


def test_host_filter_guard_demotes_huge_verdict(spark):
    """Above broadcast_max_hosts the hint is dropped (plain hash join
    under AQE) instead of letting a ~GB broadcast fail the job; results
    identical."""
    kept = webtext.host_filter(
        _pages(spark), min_docs=2, broadcast_max_hosts=1
    )
    hosts = {
        r[0] for r in kept.select(webtext.host_col(F.col("url"))).collect()
    }
    assert hosts == {"a.example", "b.example"}
    # the DRIVER-FORCED hint is gone from the logical plan; AQE is
    # still free to broadcast at runtime if the verdict turns out tiny
    # (as it is here) — what the guard prevents is forcing a ~GB
    # broadcast that would FAIL, not runtime demotion that succeeds
    plan = kept._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in plan


def test_host_filter_guard_leaves_no_cache(spark):
    """Round-7 ADVICE fix: the guard used to persist() the verdict with
    no unpersist point — one leaked cached rollup per call in a
    per-micro-batch caller. Pinned: after the call (and after consuming
    the result) the session holds zero persisted RDDs."""
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    kept = webtext.host_filter(_pages(spark), min_docs=2,
                               broadcast_max_hosts=1)
    kept.count()
    kept2 = webtext.host_filter(_pages(spark), min_docs=2,
                                broadcast_max_hosts=100)
    kept2.count()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before, f"host_filter leaked {after - before} cached RDDs"


def test_latest_snapshot_null_semantics(spark):
    rows = [
        ("u", None, "null-ts", 9),
        ("u", _ts(1), "real-ts", 1),
        ("v", None, "only-null", 2),
        (None, _ts(2), "null-url", 3),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, fetch_id long"
    )
    out = {
        r.url: r
        for r in webtext.latest_snapshot(df, tiebreak_col="fetch_id").collect()
    }
    # null ts loses to any real timestamp (even a higher tiebreak)
    assert out["u"].text == "real-ts" and out["u"].fetch_id == 1
    # a url with only null timestamps still yields its row
    assert out["v"].text == "only-null" and out["v"].warc_ts is None
    # null urls form their own group
    assert out[None].text == "null-url" and out[None].n_snapshots == 1


def test_latest_snapshot_randomized_vs_pandas(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n = 400
    pdf = pd.DataFrame(
        {
            "url": [f"u{int(x)}" for x in rng.integers(0, 37, n)],
            "warc_ts": [_ts(int(x)) for x in rng.integers(0, 50, n)],
            "text": [f"t{i}" for i in range(n)],
            "fetch_id": np.arange(n, dtype=np.int64),
        }
    )
    got = (
        webtext.latest_snapshot(
            spark.createDataFrame(pdf), tiebreak_col="fetch_id"
        )
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    # reference: max (warc_ts, fetch_id) per url, plus snapshot counts
    idx = (
        pdf.sort_values(["warc_ts", "fetch_id"])
        .groupby("url")
        .tail(1)
        .sort_values("url")
        .reset_index(drop=True)
    )
    idx["n_snapshots"] = (
        pdf.groupby("url").size().sort_index().values
    )
    pd.testing.assert_frame_equal(
        got[["url", "warc_ts", "fetch_id", "text", "n_snapshots"]],
        idx[["url", "warc_ts", "fetch_id", "text", "n_snapshots"]],
        check_dtype=False,
    )


def test_on_generated_corpus(spark, tmp_path):
    from text_search_spark.corpus import write_pages_parquet

    p = str(tmp_path / "pages.parquet")
    write_pages_parquet(p, 500)
    pages = spark.read.parquet(p)
    # generator urls are unique -> dedup is identity with n_snapshots=1
    out = webtext.latest_snapshot(pages.select("url", "warc_ts", "text"))
    assert out.count() == 500
    assert out.where(F.col("n_snapshots") != 1).count() == 0
    st = webtext.host_stats(pages)
    assert st.count() == st.select("host").distinct().count()
    assert st.agg(F.sum("n_docs")).first()[0] == 500
