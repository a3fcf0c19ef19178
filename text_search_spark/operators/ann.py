"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — JVM-side zip_with/aggregate dot
products (whole-stage codegen, deterministic left-fold summation), broadcast
of the query set, TakeOrderedAndProject-shaped per-query top-k.

Scale path: LSH-bucketed search (random-hyperplane signs -> bucket join) —
candidates only within matching buckets, multi-probe via sign-flip neighbor
buckets. At 100 TB the brute force is O(N*Q*d) scan-bound; LSH cuts the
candidate set by the bucket selectivity while the bucketing itself is one
hash shuffle. Hyperplanes are generated from a seed (no wall-clock) so
results are reproducible and the DuckDB oracle can replicate them.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _spread(df: DataFrame) -> DataFrame:
    """Defensive parallelism guard for row-independent scoring inputs:
    a single-file parquet corpus arrives as 1-2 scan splits, which
    serializes the interpreted per-row fold expressions onto 1-2 cores.
    Row-wise ops + deterministic (rounded cos, id) ranking make the
    repartition result-neutral here. NEVER applied to training paths
    whose float aggregation order must stay fixed (lloyd_centroids /
    kmeans_centroids input partitioning is part of their determinism
    contract)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, par // 2):
        return df.repartition(par)
    return df


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    round_digits: Optional[int] = 4,
) -> DataFrame:
    """Brute-force cosine top-k: (q_id, rank, vec_id, cos).

    queries is expected to be small -> broadcast; candidates never shuffle.
    Ties broken by (cos desc, vec_id asc) on the ROUNDED cosine so ranking
    is reproducible across engines (float64 sum-order differences live far
    below the rounding grain).
    """
    # norms hoisted to projected columns: the fold expressions are
    # interpreted (no cross-expression CSE), so an inline _norm(v) is
    # re-folded per (vector, query) PAIR and _norm(q) per candidate row;
    # identical float64 values, computed once per side (round-8)
    cand = _spread(
        vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    ).withColumn("_vn", _norm(F.col("v")))
    qs = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).cast("array<double>").alias("q"),
    ).withColumn("_qn", _norm(F.col("q")))
    joined = cand.crossJoin(F.broadcast(qs)).where(
        F.col("vec_id") != F.col("q_id")
    )
    cos = _dot(F.col("v"), F.col("q")) / (F.col("_vn") * F.col("_qn"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = joined.select("q_id", "vec_id", cos.alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> List[List[float]]:
    """Seeded random hyperplanes for sign-LSH (deterministic)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col, planes: List[List[float]]):
    """Bucket id = sign bits against each hyperplane, as a long column."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec_col, F.array(*[F.lit(float(x)) for x in p]), lambda a, b: a * b
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 1,
) -> DataFrame:
    """Embedding near-duplicate pairs WITHOUT an all-pairs crossJoin:
    vectors bucket by hyperplane signs (one hash shuffle), candidate
    pairs form only inside a bucket (equi self-join on bucket), exact
    rounded cosine filters to >= threshold -> (id_a, id_b, cos).

    At 100 TB the pair count is sum of per-bucket squares instead of
    N^2; recall is governed by n_planes (near-identical vectors agree on
    every sign with high probability). The brute-force variant stays
    available as the small-scale oracle.

    n_bands (round-7): >1 gives BANDED sign-LSH — n_bands independent
    signatures of n_planes bits each (same minhash-LSH shape the text
    dedup uses); a pair is a candidate when ANY band agrees, so
    pair-recall rises from (1-p)^P to 1-(1-(1-p)^P)^B (the round-7
    400k bench measured single-band planted-dup recall at 0.82 — the
    banded config buys the missing tail at B x the bucketing cost,
    still one shuffle)."""
    planes = hyperplanes(dim, n_bands * n_planes, seed)
    v = _spread(
        vectors.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    )
    if n_bands <= 1:
        v = v.withColumn("band", F.lit(0)).withColumn(
            "bucket", lsh_bucket(F.col("v"), planes[:n_planes])
        )
    else:
        band_buckets = F.array(
            *[
                lsh_bucket(
                    F.col("v"),
                    planes[b * n_planes: (b + 1) * n_planes],
                )
                for b in range(n_bands)
            ]
        )
        v = v.select(
            "id", "v", F.posexplode(band_buckets).alias("band", "bucket")
        )
    # hoisted norm: folded once per (id, band) row instead of once per
    # candidate pair side (identical float64 value; see _cell_scores)
    v = v.withColumn("_n", _norm(F.col("v")))
    a = v.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("_n").alias("_na"), "band", "bucket",
    )
    b = v.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("_n").alias("_nb"), "band", "bucket",
    )
    j = a.join(b, ["band", "bucket"]).where(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb"))
    out = j.select("id_a", "id_b", F.round(cos, 4).alias("cos")).where(
        F.col("cos") >= threshold
    )
    if n_bands > 1:
        # a pair agreeing in 2+ bands is one candidate (identical cos)
        out = out.dropDuplicates(["id_a", "id_b"])
    return out


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    probe_hamming: int = 0,
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to the query's LSH
    bucket(s). Recall/latency tradeoff governed by n_planes and
    probe_hamming.

    probe_hamming=0 is classic single-probe. probe_hamming=1 is
    multi-probe LSH (Lv et al., VLDB'07): each query ALSO probes the
    n_planes buckets at Hamming distance 1 from its own signature —
    a true neighbor that disagrees on exactly one hyperplane sign (the
    dominant miss mode: the round-7 400k bench measured single-probe
    recall@10 at just 0.14) is recovered at (n_planes+1)x the probed
    buckets, still a tiny fraction of the corpus and still one
    broadcast join — the scan fraction stays ~(n_planes+1)/2^n_planes
    of brute force. Each vector lives in exactly one bucket, so probes
    never duplicate a candidate and no dedup step is needed."""
    if probe_hamming not in (0, 1):
        raise ValueError("probe_hamming supports 0 or 1")
    planes = hyperplanes(dim, n_planes, seed)
    cand = _spread(
        vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes)).withColumn(
        "_vn", _norm(F.col("v"))  # hoisted: see _cell_scores
    )
    qs = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).cast("array<double>").alias("q"),
    ).withColumn("bucket", lsh_bucket(F.col("q"), planes)).withColumn(
        "_qn", _norm(F.col("q"))
    )
    if probe_hamming >= 1:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(n_planes)
            ],
        )
        qs = qs.select(
            "q_id", "q", "_qn", F.explode(probes).alias("bucket")
        )
    joined = cand.join(F.broadcast(qs), "bucket").where(
        F.col("vec_id") != F.col("q_id")
    )
    cos = _dot(F.col("v"), F.col("q")) / (F.col("_vn") * F.col("_qn"))
    scored = joined.select("q_id", "vec_id", F.round(cos, 4).alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos")
    )


def _centroids(
    vectors: DataFrame, n_cells: int, id_col: str, vec_col: str
) -> List[tuple]:
    """Deterministic coarse quantizer: the embeddings of the n_cells
    lowest-id vectors, with precomputed norms. A trained k-means would
    give tighter cells, but a data-derived deterministic quantizer keeps
    the operator reproducible across engines (the DuckDB oracle replays
    it exactly); swapping in trained centroids is a drop-in (same shape).
    """
    rows = (
        vectors.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .orderBy("id")
        .limit(n_cells)
        .collect()
    )
    out = []
    for cell, r in enumerate(rows):
        v = np.asarray(r.v, dtype=np.float64)
        out.append((cell, r.v, float(np.sqrt((v * v).sum()))))
    return out


def _unit_rows(
    vectors: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, u: array<double>) with u = v / ||v||, the EXACT division
    the DuckDB oracle computes (bit-identical f64). Measured (not
    assumed): the norm aggregate referenced inside the transform lambda
    is hoisted and evaluated once per ROW here — d=1024→4096 at flat
    wall time — unlike the regexp-in-lambda case langid_ngram pins, so
    no materialization step is needed. An MLlib Normalizer variant was
    built and REVERTED: it multiplies by the reciprocal, which
    bit-differed from the oracle's division on 302/500 fixture rows
    (sub-ulp noise the downstream rounding only probabilistically
    absorbs) and measured ~1.8x slower."""
    arr = F.col(vec_col).cast("array<double>")
    return vectors.select(
        F.col(id_col).alias("id"),
        F.transform(arr, lambda x: x / _norm(arr)).alias("u"),
    )


def kmeans_centroids(
    vectors: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> List[tuple]:
    """Trained coarse quantizer: seeded MLlib k-means over the vector
    column — tighter cells than the deterministic lowest-id quantizer, so
    nearest-cell recall no longer depends on data order. Same output
    shape as _centroids ((cell, vec, norm)), so it is a drop-in for
    ivf_topk(quantizer="kmeans"). Seeded init keeps runs reproducible on
    a fixed cluster layout; the lowest-id quantizer remains the
    cross-engine-reproducible oracle path."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # cells are ASSIGNED by cosine (ivf_topk._cell_scores), so train on
    # unit-normalized vectors: L2 k-means on the unit sphere == spherical
    # k-means up to centroid scaling, aligning the trained partition with
    # the cosine assignment rule (training on raw vectors lets norm
    # variation split direction-clusters: measured recall@5 0.65 -> >0.9)
    from pyspark import StorageLevel

    feats = _unit_rows(vectors, id_col, vec_col).select(
        array_to_vector(F.col("u")).alias("features")
    )  # exact-division unit vectors (see _unit_rows)
    # persist for the training's duration: k-means|| init + every Lloyd
    # iteration re-scans the input, and MLlib's internal caching sits
    # ABOVE this projection's interpreted per-row normalization fold —
    # measured 20.7-28.7 s -> 8.1-10.1 s at 20k x 64d with bit-identical
    # centroids (round-8; intra-call reuse only, unpersisted below)
    feats = feats.persist(StorageLevel.MEMORY_AND_DISK)
    feats.count()
    model = KMeans(
        k=n_cells, seed=seed, maxIter=max_iter, initMode="k-means||"
    ).fit(feats)
    feats.unpersist()
    out = []
    for cell, c in enumerate(model.clusterCenters()):
        v = np.asarray(c, dtype=np.float64)
        nrm = float(np.sqrt((v * v).sum()))
        out.append((cell, [float(x) for x in v], nrm if nrm > 0 else 1.0))
    return out


def _round_sql(x: float, digits: int) -> float:
    """round() with DuckDB round(DOUBLE) semantics — half AWAY from
    zero on the scaled double. Python's built-in round() is banker's
    (half-to-even), so a value landing on a representable decimal tie
    (e.g. 1/128 at 6 digits) would bake a different literal into the
    Spark plan than the oracle's replay derives; verified
    mismatch-free vs DuckDB over 200k random + tie-heavy samples at 4
    and 6 digits. NOT a Spark F.round clone: Spark's Round on doubles
    goes through BigDecimal.valueOf (shortest-decimal repr) with
    HALF_UP, which can differ on shortest-decimal ties (e.g.
    round(0.285, 2) -> 0.29 in Spark, 0.28 here and in DuckDB) — only
    use this helper where driver-side literals must match the DuckDB
    oracle, never where Spark-side rounding parity is assumed."""
    m = 10.0 ** digits
    s = x * m
    return math.copysign(math.floor(abs(s) + 0.5), x) / m


def lloyd_centroids(
    vectors: DataFrame,
    n_cells: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> List[tuple]:
    """Deterministic distributed spherical k-means (Lloyd's algorithm):
    init = the n_cells lowest-id vectors unit-normalized, then `iters`
    rounds of (assign every vector to its nearest cell by ROUNDED cosine,
    recompute each centroid as the component mean of its members' unit
    vectors, ROUND to `round_digits`). Rounding at every step makes the
    whole training replayable bit-for-bit by a SQL engine (the DuckDB
    oracle unrolls the same iterations), unlike MLlib k-means whose
    kmeans||-init sampling is engine-internal.

    Distribution shape: each iteration is one scan — per-row JVM argmax
    against the broadcast centroids, posexplode of the unit components,
    one map-side-combined avg keyed by (cell, dim) (n_cells*dim rows
    collected, ~1k). No iteration state lives on executors. Empty cells
    keep their previous centroid. Output shape = _centroids:
    [(cell, vec, norm)]."""
    from pyspark.sql import functions as F

    # persist the unit rows for the training's duration: every Lloyd
    # iteration re-assigns the SAME unit vectors (and init reads them
    # too) — without the cache each iteration re-scans the source and
    # re-runs the per-row normalization fold (round-8; intra-call
    # reuse only, unpersisted before return). The hoisted _un column
    # likewise folds ||u|| once per row instead of once per centroid
    # per iteration (see _cell_scores).
    from pyspark import StorageLevel

    base = _unit_rows(vectors, id_col, vec_col).withColumn(
        "_un", _norm(F.col("u"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    init_rows = base.orderBy("id").limit(n_cells).collect()
    cents = []
    for cell, r in enumerate(init_rows):
        v = [_round_sql(float(x), round_digits) for x in r.u]
        arr = np.asarray(v, dtype=np.float64)
        cents.append((cell, v, float(np.sqrt((arr * arr).sum()))))
    for _ in range(iters):
        assigned = base.withColumn(
            "best",
            F.array_max(
                _cell_scores(F.col("u"), cents, norm_col=F.col("_un"))
            ),
        ).select((-F.col("best.nc")).alias("cell"), "u")
        means = (
            assigned.select("cell", F.posexplode("u").alias("i", "x"))
            .groupBy("cell", "i")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell: dict = {}
        for row in means:
            by_cell.setdefault(row.cell, {})[row.i] = _round_sql(
                float(row.m), round_digits
            )
        new_cents = []
        for cell, old_vec, old_norm in cents:
            if cell in by_cell:
                d = by_cell[cell]
                v = [d[i] for i in range(len(old_vec))]
                arr = np.asarray(v, dtype=np.float64)
                nrm = float(np.sqrt((arr * arr).sum()))
                new_cents.append((cell, v, nrm if nrm > 0 else 1.0))
            else:
                new_cents.append((cell, old_vec, old_norm))
        cents = new_cents
    base.unpersist()
    return cents


def _cell_scores(
    vec_col, cents: List[tuple], round_digits: int = 4, norm_col=None
):
    """array<struct<cos, negcell>> of rounded cosines against every
    centroid — a pure per-row JVM expression (no explode, no shuffle).

    norm_col: optional pre-projected ||vec|| column. The higher-order
    fold expressions here are interpreted (CodegenFallback — no
    cross-expression subexpression elimination), so an inline
    _norm(vec_col) is re-folded once PER CENTROID; hoisting it to its
    own projected column computes the identical float64 value once per
    row (round-8: halves the assignment scan's expression work)."""
    nv = _norm(vec_col) if norm_col is None else norm_col
    entries = []
    for cell, cvec, cnorm in cents:
        c = F.array(*[F.lit(float(x)) for x in cvec])
        cos = F.round(
            _dot(vec_col, c) / (nv * F.lit(cnorm)), round_digits
        )
        entries.append(F.struct(cos.alias("cos"), F.lit(-cell).alias("nc")))
    return F.array(*entries)


def ivf_assignments(
    vectors: DataFrame,
    centroids: List[tuple],
    n_assign: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, v, cell) — every vector assigned to its n_assign nearest
    coarse cells by a per-row JVM array argmax/sort (NO shuffle, bounded
    n_assign-way replication). This IS the IVF index build: persist it
    `partitionBy("cell")` once at ingest and hand it to
    ivf_topk(assignments=...) so queries pay only the probed-cells join
    (the round-7 bench attributed ~70% of a self-contained call to this
    step)."""
    base = _spread(
        vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    ).withColumn("_vn", _norm(F.col("v")))  # hoisted: see _cell_scores
    scores = _cell_scores(F.col("v"), centroids, norm_col=F.col("_vn"))
    if n_assign <= 1:
        return base.withColumn(
            "best", F.array_max(scores)
        ).select("vec_id", "v", (-F.col("best.nc")).alias("cell"))
    return (
        base.withColumn(
            "cells",
            F.slice(F.reverse(F.array_sort(scores)), 1, n_assign),
        )
        .select("vec_id", "v", F.explode(F.col("cells.nc")).alias("nc"))
        .select("vec_id", "v", (-F.col("nc")).alias("cell"))
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    quantizer: str = "lowest_id",
    n_assign: int = 1,
    centroids: Optional[List[tuple]] = None,
    assignments: Optional[DataFrame] = None,
) -> DataFrame:
    """IVF approximate cosine top-k: (q_id, rank, vec_id, cos).

    Index side: every vector is assigned to its `n_assign` nearest
    coarse-quantizer cells with a per-row array argmax/sort (struct(cos,
    -cell) — lexicographic struct order = highest cosine, lowest cell on
    ties) — NO shuffle and no unbounded row explosion (n_assign-way
    replication only); at scale the assignment rides the ingest scan and
    the inverted lists are just `partitionBy(cell)`. Query side: each
    query probes its `nprobe` nearest cells; candidates are only the
    vectors in probed cells (join on cell against the broadcast probe
    set), then exact rounded cosine + per-query top-k. Scan fraction ~
    n_assign*nprobe/n_cells of brute force; recall governed by nprobe
    and n_assign (multi-assignment is the standard recall lever for
    boundary-straddling neighbors — storage cost n_assign x). Ties
    broken by (cos desc, vec_id asc) like cosine_topk.

    quantizer: "lowest_id" (deterministic untrained — the simplest
    oracle path), "lloyd" (deterministic TRAINED spherical k-means,
    lloyd_centroids — also fully oracle-replayable, the driver-gated
    trained path), or "kmeans" (seeded spherical MLlib training; recall
    pinned in tests/test_ann_recall.py).

    centroids / assignments: the INDEX-side reuse seam (round-7 — the
    400k bench measured ~70% of a self-contained ivf_topk call as cell
    assignment of the corpus, an index-time cost). Pass `centroids`
    (output of lloyd_centroids / kmeans_centroids / _centroids) to skip
    training, and/or `assignments` (output of ivf_assignments, e.g.
    persisted/partitionBy(cell) inverted lists) to skip assignment —
    the call then pays only the probed-cells join, the true per-query
    marginal cost. Results are identical either way (pinned)."""
    if assignments is not None and centroids is None:
        raise ValueError(
            "assignments reuse needs the same `centroids` the "
            "assignment was built with (query probes must agree)"
        )
    if centroids is not None:
        cents = centroids
    elif quantizer == "kmeans":
        cents = kmeans_centroids(vectors, n_cells, id_col, vec_col)
    elif quantizer == "lloyd":
        cents = lloyd_centroids(vectors, n_cells, id_col=id_col, vec_col=vec_col)
    else:
        cents = _centroids(vectors, n_cells, id_col, vec_col)
    if assignments is not None:
        cand = assignments
    else:
        cand = ivf_assignments(
            vectors, cents, n_assign=n_assign, id_col=id_col,
            vec_col=vec_col,
        )
    qs = (
        queries.select(
            F.col(q_id_col).alias("q_id"),
            F.col(q_vec_col).cast("array<double>").alias("q"),
        )
        .withColumn(
            "probes",
            F.slice(
                F.reverse(F.array_sort(_cell_scores(F.col("q"), cents))),
                1,
                nprobe,
            ),
        )
        .select(
            "q_id", "q", F.explode(F.col("probes.nc")).alias("nc")
        )
        .select("q_id", "q", (-F.col("nc")).alias("cell"))
    )
    # hoisted norms (see _cell_scores): candidate norm folded once per
    # assignment row instead of once per (candidate, probing query);
    # query norm once per probe row instead of per candidate
    cand = cand.withColumn("_vn", _norm(F.col("v")))
    qs = qs.withColumn("_qn", _norm(F.col("q")))
    joined = cand.join(F.broadcast(qs), "cell").where(
        F.col("vec_id") != F.col("q_id")
    )
    cos = F.round(
        _dot(F.col("v"), F.col("q")) / (F.col("_vn") * F.col("_qn")), 4
    )
    scored = joined.select("q_id", "vec_id", cos.alias("cos"))
    if n_assign > 1 or assignments is not None:
        # a vector assigned to 2+ probed cells would pair with the same
        # query twice — dedupe (identical cos, so any survivor is
        # right). External assignments dedupe unconditionally: their
        # n_assign is not visible here and a missed dedup is a wrong
        # top-k, while a redundant one is a bounded candidate shuffle.
        scored = scored.dropDuplicates(["q_id", "vec_id"])
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cos")
    )
