"""Recall of the IVF ANN path against the brute-force baseline.

Two claims, tested separately:
  1. The MACHINERY (trained spherical-k-means quantizer + nprobe probing +
     n_assign multi-assignment) reaches recall@5 >= 0.9 at a 25% scan
     fraction when the data has neighborhood structure (tight clusters).
  2. On the sf0.01 synthetic embeddings — whose top-5 neighbors are
     noise-dominated (10 diffuse Gaussian clusters in 64-d; measured
     ceiling for ANY 16-cell partition at nprobe=4 is ~0.6-0.8) — the
     trained quantizer is not worse than the deterministic lowest-id one,
     and multi-assignment monotonically improves recall (its candidate
     set is a strict superset)."""

import os

import numpy as np
import pytest

from text_search_spark.operators.ann import cosine_topk, ivf_topk

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def emb(spark):
    if not os.path.exists(os.path.join(SF_DIR, "embeddings.parquet")):
        pytest.skip("no embeddings table")
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


@pytest.fixture(scope="module")
def clustered(spark):
    """2000 unit vectors in 40 tight clusters (noise sigma 0.15) — data
    WITH neighborhood structure, where IVF's scan-fraction/recall tradeoff
    is meaningful."""
    rng = np.random.default_rng(7)
    n_clu, per, dim = 40, 50, 64
    c0 = rng.normal(size=(n_clu, dim))
    c0 /= np.linalg.norm(c0, axis=1)[:, None]
    v = np.repeat(c0, per, axis=0) + rng.normal(
        scale=0.15, size=(n_clu * per, dim)
    )
    v /= np.linalg.norm(v, axis=1)[:, None]
    rows = [(i, [float(x) for x in v[i]]) for i in range(len(v))]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _queries(emb, lo=100, hi=120):
    # query ids DISJOINT from the lowest-id quantizer's centroid ids
    # (vec_id < n_cells) — a query that IS a centroid gets its own cell's
    # neighbors for free, inflating that quantizer's measured recall
    from pyspark.sql import functions as F

    return emb.where(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    ).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
    )


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.q_id, set()).add(r.vec_id)
    return out


def _recall(approx, exact):
    per_q = []
    for q, truth in exact.items():
        got = approx.get(q, set())
        per_q.append(len(got & truth) / len(truth))
    return sum(per_q) / len(per_q)


def test_ivf_kmeans_recall_on_clusterable_data(clustered, spark):
    """recall@5 >= 0.9 at nprobe/n_cells = 25% scan fraction."""
    qs = _queries(clustered)
    exact = _topk_sets(cosine_topk(clustered, qs, k=5))
    approx = _topk_sets(
        ivf_topk(
            clustered, qs, k=5, n_cells=16, nprobe=4, quantizer="kmeans"
        )
    )
    r = _recall(approx, exact)
    assert r >= 0.9, f"kmeans IVF recall@5 = {r:.3f} < 0.9"


def test_ivf_lloyd_recall_on_clusterable_data(clustered, spark):
    """The deterministic Lloyd quantizer (the driver-gated trained path)
    reaches the same recall bar as MLlib k-means at a 25% scan
    fraction."""
    qs = _queries(clustered)
    exact = _topk_sets(cosine_topk(clustered, qs, k=5))
    approx = _topk_sets(
        ivf_topk(
            clustered, qs, k=5, n_cells=16, nprobe=4, quantizer="lloyd"
        )
    )
    r = _recall(approx, exact)
    assert r >= 0.9, f"lloyd IVF recall@5 = {r:.3f} < 0.9"


def test_ivf_lloyd_not_worse_than_lowest_id(emb, spark):
    """Training helps (or at least never hurts) vs the untrained
    lowest-id quantizer on the hard sf embeddings, same probe budget."""
    qs = _queries(emb)
    exact = _topk_sets(cosine_topk(emb, qs, k=5))
    det = _recall(
        _topk_sets(ivf_topk(emb, qs, k=5, n_cells=16, nprobe=4)), exact
    )
    ll = _recall(
        _topk_sets(
            ivf_topk(emb, qs, k=5, n_cells=16, nprobe=4, quantizer="lloyd")
        ),
        exact,
    )
    assert ll >= det - 0.05, (ll, det)
    assert ll >= 0.5, ll


def test_ivf_kmeans_not_worse_than_lowest_id(emb, spark):
    """On the hard sf0.01 embeddings, same budget: trained >= deterministic
    (within noise), and the absolute recall clears the measured floor."""
    qs = _queries(emb)
    exact = _topk_sets(cosine_topk(emb, qs, k=5))
    det = _recall(
        _topk_sets(ivf_topk(emb, qs, k=5, n_cells=16, nprobe=4)), exact
    )
    km = _recall(
        _topk_sets(
            ivf_topk(emb, qs, k=5, n_cells=16, nprobe=4, quantizer="kmeans")
        ),
        exact,
    )
    assert km >= det - 0.05, (km, det)
    assert km >= 0.5, km


def test_ivf_multi_assign_monotone(emb, spark):
    """n_assign=2 candidates are a superset of n_assign=1 -> recall can
    only improve."""
    qs = _queries(emb)
    exact = _topk_sets(cosine_topk(emb, qs, k=5))
    r1 = _recall(
        _topk_sets(
            ivf_topk(
                emb, qs, k=5, n_cells=16, nprobe=4, quantizer="kmeans",
                n_assign=1,
            )
        ),
        exact,
    )
    r2 = _recall(
        _topk_sets(
            ivf_topk(
                emb, qs, k=5, n_cells=16, nprobe=4, quantizer="kmeans",
                n_assign=2,
            )
        ),
        exact,
    )
    assert r2 >= r1, (r1, r2)


def test_multiprobe_lsh_recall_not_worse(clustered, spark):
    """Round-7: probe_hamming=1 (multi-probe LSH) probes the query's
    bucket plus every Hamming-1 neighbor — its candidate set is a
    strict superset of single-probe's, so recall@5 vs brute force is
    monotonically >= , and on clusterable data the gap is material."""
    from text_search_spark.operators.ann import lsh_cosine_topk

    qs = _queries(clustered, 100, 120)
    exact = _topk_sets(cosine_topk(clustered, qs, k=5))
    single = _recall(
        _topk_sets(lsh_cosine_topk(clustered, qs, k=5, n_planes=8)),
        exact,
    )
    multi = _recall(
        _topk_sets(
            lsh_cosine_topk(
                clustered, qs, k=5, n_planes=8, probe_hamming=1
            )
        ),
        exact,
    )
    assert multi > single
    # bar from the fixture itself: sigma-0.15 clusters put the true
    # top-5 at signature Hamming distance {0: 2%, 1: 15%, 2+: 83%}
    # (numpy replay of the same planes), so Hamming<=1 probing can
    # recover ~0.17 — the measured value matches that ceiling exactly,
    # which is the real pin here (the MECHANISM recovers everything
    # distance-1 probing can see; single-probe sees only the 2%)
    assert multi >= 0.15, f"multi-probe recall@5 = {multi:.3f}"
    with pytest.raises(ValueError):
        lsh_cosine_topk(clustered, qs, k=5, probe_hamming=2)


def test_ivf_reuse_identical_to_self_contained(clustered, spark):
    """Round-7: precomputed centroids + persisted assignments (the
    build-once inverted lists) give row-identical top-k to the
    self-contained ivf_topk call, for single- and multi-assignment."""
    from text_search_spark.operators.ann import (
        ivf_assignments,
        lloyd_centroids,
    )

    qs = _queries(clustered, 100, 110)
    cents = lloyd_centroids(clustered, 16)
    for n_assign in (1, 2):
        want = sorted(
            map(
                tuple,
                ivf_topk(
                    clustered, qs, k=5, n_cells=16, nprobe=4,
                    quantizer="lloyd", n_assign=n_assign,
                ).collect(),
            )
        )
        asg = ivf_assignments(clustered, cents, n_assign=n_assign)
        got = sorted(
            map(
                tuple,
                ivf_topk(
                    clustered, qs, k=5, n_cells=16, nprobe=4,
                    n_assign=n_assign, centroids=cents,
                    assignments=asg,
                ).collect(),
            )
        )
        assert got == want, f"reuse diverged at n_assign={n_assign}"
    with pytest.raises(ValueError):
        ivf_topk(clustered, qs, assignments=asg)
