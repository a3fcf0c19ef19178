"""connected_components + dedup_resolve — the near-dup GROUPS step.

Oracle in-tests is a plain union-find; the driver-level oracle is a
DuckDB recursive CTE over the same ngram_jaccard edges
(__spark_entry__.oracle_sql()['dedup_components'])."""

import random

from pyspark.sql import functions as F

from text_search_spark.operators import dedup


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully: label = min of component
    return {x: find(x) for x in parent}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    out = dedup.connected_components(df)
    return {r["id"]: r["component"] for r in out.collect()}


def test_chain_collapses_to_min(spark):
    edges = [(f"d{i:02d}", f"d{i + 1:02d}") for i in range(9)]
    got = _run(spark, edges)
    assert got == {f"d{i:02d}": "d00" for i in range(10)}


def test_disjoint_cliques_and_duplicate_edges(spark):
    c1 = [("a1", "a2"), ("a2", "a3"), ("a1", "a3"), ("a3", "a1")]
    c2 = [("b1", "b2"), ("b2", "b1")]
    got = _run(spark, c1 + c2)
    assert got == {
        "a1": "a1", "a2": "a1", "a3": "a1", "b1": "b1", "b2": "b1",
    }


def test_self_loops_and_empty(spark):
    got = _run(spark, [("x", "x")])
    assert got == {}  # a pure self-loop is not membership evidence
    empty = spark.createDataFrame([], "id_a string, id_b string")
    assert dedup.connected_components(empty).count() == 0


def test_random_graphs_match_union_find(spark):
    rng = random.Random(1234)
    for trial in range(3):
        n = 60
        nodes = [f"n{i:03d}" for i in range(n)]
        edges = [
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(40 + 30 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _run(spark, edges) == _uf_components(edges)


def test_dedup_resolve_keeps_longest_then_smallest_id(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "short"),
            ("d2", "the longest text here"),
            ("d3", "mid-length text"),
            ("d4", "lonely doc"),
            ("d5", "same len a"),
            ("d6", "same len b"),
        ],
        "doc_id string, text string",
    )
    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3"), ("d5", "d6")],
        "id_a string, id_b string",
    )
    out = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in dedup.dedup_resolve(docs, pairs).collect()
    }
    # component d1: canonical is d2 (longest)
    assert out["d1"] == ("d1", False)
    assert out["d2"] == ("d1", True)
    assert out["d3"] == ("d1", False)
    # singleton keeps itself
    assert out["d4"] == ("d4", True)
    # equal lengths: smallest id wins
    assert out["d5"] == ("d5", True)
    assert out["d6"] == ("d5", False)
    # exactly one canonical per component
    assert sum(1 for c, k in out.values() if k) == 3


def test_dedup_resolve_null_text_never_canonical(spark):
    """Round-7 ADVICE fix: length(NULL) = NULL sorts FIRST inside
    min(struct), so a null-text doc used to beat every real text for
    canonical — dedup would keep the empty copy. Pinned: null text
    always LOSES (to any real text, even ''), and an all-null component
    still elects exactly one canonical (smallest id)."""
    docs = spark.createDataFrame(
        [
            ("a1", None),
            ("a2", "real text wins"),
            ("b1", None),
            ("b2", None),
            ("c1", ""),
            ("c2", None),
        ],
        "doc_id string, text string",
    )
    pairs = spark.createDataFrame(
        [("a1", "a2"), ("b1", "b2"), ("c1", "c2")],
        "id_a string, id_b string",
    )
    out = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in dedup.dedup_resolve(docs, pairs).collect()
    }
    assert out["a2"] == ("a1", True) and out["a1"] == ("a1", False)
    # all-null component: deterministic smallest-id canonical
    assert out["b1"] == ("b1", True) and out["b2"] == ("b1", False)
    # empty string ('' len 0) still beats NULL (len -1)
    assert out["c1"] == ("c1", True) and out["c2"] == ("c1", False)
    assert sum(1 for _, k in out.values() if k) == 3


def test_components_over_lsh_recovered_buckets_stay_connected(spark):
    """The round-6 LSH cap recovery promises connectivity: an oversized
    bucket's members must land in ONE component even though only
    O(n*max_bucket) of its pairs are expanded directly."""
    docs = spark.createDataFrame(
        [(f"doc{i:03d}", "common boilerplate text repeated here") for i in range(12)],
        "doc_id string, text string",
    )
    sigs = dedup.minhash_signatures(docs)
    pairs = dedup.lsh_candidate_pairs(sigs, max_bucket=3)
    comp = dedup.connected_components(pairs)
    assert comp.select("component").distinct().count() == 1
    assert comp.count() == 12
