#!/usr/bin/env python3
"""ANN family at crawl scale (round-7, VERDICT item 4).

The per-round bench times the ANN operators only at sf0.1 (2k
embeddings), where fixed overhead dominates. This harness times the
bucketed family — hyperplane-LSH top-k, IVF top-k (untrained +
deterministic-Lloyd-trained), and embedding near-dup pairs — over a
deterministic 400k x 64-dim clustered synthetic embedding table, with
the brute-force cosine top-k as the exact baseline for recall@10, and
the no-silent-caps census (LSH bucket sizes, planted-dup recall)
alongside the seconds. Writes BENCH_ANN.json.

Usage: python bench_ann_scale.py
Env: TSS_ANN_VECS (default 400_000), TSS_ANN_CORES (default 16).

Data: 64 seeded unit-sphere centers; vec i = normalize(center[i % 64] +
0.25 * noise). The last 1% of ids are PLANTED near-dups: copies of the
first ids with 0.005 noise — lsh_dup_pairs must surface them (recall
reported, never silently capped).
"""

from __future__ import annotations

import json
import os
import sys
import time

N_VECS = int(os.environ.get("TSS_ANN_VECS", "400000"))
CORES = int(os.environ.get("TSS_ANN_CORES", "16"))
DIM = 64
N_CENTERS = 64
N_Q = 50
K = 10
VEC_PATH = f"/tmp/tss_ann_vecs_{N_VECS}.parquet"
SEED = 20260818


def ensure_vectors() -> None:
    if os.path.exists(VEC_PATH):
        return
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = time.perf_counter()
    rng = np.random.Generator(np.random.PCG64(SEED))
    centers = rng.standard_normal((N_CENTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    n_dup = N_VECS // 100
    n_base = N_VECS - n_dup
    cells = np.arange(n_base) % N_CENTERS
    vecs = centers[cells] + 0.25 * rng.standard_normal((n_base, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # planted near-dups: id n_base+j duplicates id j with tiny noise
    dups = vecs[:n_dup] + 0.005 * rng.standard_normal((n_dup, DIM))
    dups /= np.linalg.norm(dups, axis=1, keepdims=True)
    allv = np.concatenate([vecs, dups]).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(N_VECS), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(allv.reshape(-1)), DIM
            ).cast(pa.list_(pa.float32())),
        }
    )
    tmp = VEC_PATH + ".tmp"
    pq.write_table(tbl, tmp, row_group_size=4000)
    os.replace(tmp, VEC_PATH)
    print(
        f"generated {N_VECS} x {DIM} embeddings in "
        f"{time.perf_counter() - t0:.1f}s -> {VEC_PATH}",
        file=sys.stderr,
    )


def _topk_sets(rows):
    out: dict = {}
    for r in rows:
        out.setdefault(r.q_id, set()).add(r.vec_id)
    return out


def main() -> None:
    ensure_vectors()

    from pyspark.sql import functions as F

    from text_search_spark.operators import ann
    from text_search_spark.session import get_spark

    spark = get_spark("ann_scale", cores=CORES, shuffle_partitions=CORES * 2)
    spark.sparkContext.setLogLevel("ERROR")
    vecs = spark.read.parquet(VEC_PATH).repartition(CORES * 2).cache()
    n = vecs.count()
    # queries: 50 ids spread across every cluster (1000..1049 -> all
    # residues mod 64 ... 50 of them), well away from the planted dups
    qs = (
        vecs.where((F.col("vec_id") >= 1000) & (F.col("vec_id") < 1000 + N_Q))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_vec"),
        )
        .cache()
    )
    assert qs.count() == N_Q

    timings: dict = {}
    extra: dict = {"n_vecs": n, "dim": DIM, "cpus": CORES, "k": K,
                   "n_queries": N_Q}

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"{name}: {timings[name]}s", file=sys.stderr)
        return r

    # warmup: tiny slices through each shape (codegen)
    w = vecs.limit(2000).repartition(CORES).cache()
    w.count()
    ann.cosine_topk(w, qs.limit(4), k=3).count()
    ann.lsh_cosine_topk(w, qs.limit(4), k=3).count()
    ann.ivf_topk(w, qs.limit(4), k=3, n_cells=8, nprobe=2).count()
    w.unpersist()

    # ---- exact baseline: brute-force cosine top-k ----
    exact = _topk_sets(
        timed(
            "brute_topk",
            lambda: ann.cosine_topk(vecs, qs, k=K).collect(),
        )
    )

    def recall(rows):
        got = _topk_sets(rows)
        return round(
            sum(
                len(got.get(q, set()) & exact[q]) / len(exact[q])
                for q in exact
            )
            / len(exact),
            4,
        )

    # ---- hyperplane LSH top-k (single-probe) ----
    # two points on the single-probe recall/scan curve: more planes =
    # smaller buckets = cheaper + lower recall (lsh_cosine_topk is
    # single-probe by design; the census rows keep the tradeoff honest)
    for np_ in (8, 4):
        lsh_rows = timed(
            f"lsh_topk_p{np_}",
            lambda np_=np_: ann.lsh_cosine_topk(
                vecs, qs, k=K, n_planes=np_, dim=DIM
            ).collect(),
        )
        extra[f"lsh_topk_p{np_}_recall"] = recall(lsh_rows)
        extra[f"lsh_topk_p{np_}_scan_fraction"] = round(1 / 2**np_, 4)
    # multi-probe (round-7): query probes its bucket + all Hamming-1
    # neighbors — (n_planes+1)x the scan of single-probe, recovers
    # every neighbor that disagrees on exactly one sign
    mp_rows = timed(
        "lsh_topk_p8_h1",
        lambda: ann.lsh_cosine_topk(
            vecs, qs, k=K, n_planes=8, dim=DIM, probe_hamming=1
        ).collect(),
    )
    extra["lsh_topk_p8_h1_recall"] = recall(mp_rows)
    extra["lsh_topk_p8_h1_scan_fraction"] = round(9 / 2**8, 4)

    # ---- IVF, untrained deterministic quantizer ----
    ivf_rows = timed(
        "ivf_lowest_topk",
        lambda: ann.ivf_topk(
            vecs, qs, k=K, n_cells=N_CENTERS, nprobe=16
        ).collect(),
    )
    extra["ivf_lowest_recall"] = recall(ivf_rows)
    extra["ivf_scan_fraction_theoretical"] = round(16 / N_CENTERS, 3)

    # ---- IVF, deterministic trained (Lloyd) quantizer ----
    cents = timed(
        "ivf_lloyd_train",
        lambda: ann.lloyd_centroids(vecs, N_CENTERS),
    )
    ivf_l_rows = timed(  # ivf_topk(qualifier=lloyd) retrains inside:
        "ivf_lloyd_train_plus_topk",  # this row = train + query
        lambda: ann.ivf_topk(
            vecs, qs, k=K, n_cells=N_CENTERS, nprobe=16, quantizer="lloyd"
        ).collect(),
    )
    extra["ivf_lloyd_recall"] = recall(ivf_l_rows)
    # build-once/query-many split (round-7): persist the inverted lists
    # (cell assignments) once, then the query pays only the probed-cells
    # join — the true per-query marginal cost at scale
    asg = ann.ivf_assignments(vecs, cents).persist()
    timed("ivf_assign_once", lambda: asg.count())
    ivf_q_rows = timed(
        "ivf_query_only",
        lambda: ann.ivf_topk(
            vecs, qs, k=K, n_cells=N_CENTERS, nprobe=16,
            centroids=cents, assignments=asg,
        ).collect(),
    )
    assert recall(ivf_q_rows) == extra["ivf_lloyd_recall"]
    asg.unpersist()

    # ---- embedding near-dup pairs + no-silent-caps census ----
    planes = ann.hyperplanes(DIM, 16, seed=42)
    buckets = (
        vecs.select(
            ann.lsh_bucket(
                F.col("embedding").cast("array<double>"), planes
            ).alias("b")
        )
        .groupBy("b")
        .count()
    )
    census = buckets.agg(
        F.count("*").alias("n_buckets"),
        F.max("count").alias("max_bucket"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias(
            "candidate_pairs"
        ),
    ).first()
    extra["duppairs_bucket_census"] = {
        "n_planes": 16,
        "n_buckets": int(census["n_buckets"]),
        "max_bucket": int(census["max_bucket"]),
        "candidate_pairs": int(census["candidate_pairs"]),
    }
    dup_pairs = timed(
        "lsh_dup_pairs",
        lambda: ann.lsh_dup_pairs(
            vecs, threshold=0.99, n_planes=16, dim=DIM
        ).cache(),
    )
    n_pairs = dup_pairs.count()
    n_dup = N_VECS // 100
    found_planted = (
        dup_pairs.where(
            (F.col("id_b") >= N_VECS - n_dup)
            & (F.col("id_a") == F.col("id_b") - (N_VECS - n_dup))
        ).count()
    )
    dup_pairs.unpersist()
    extra["dup_pairs_found"] = int(n_pairs)
    extra["planted_dups"] = n_dup
    extra["planted_dup_recall"] = round(found_planted / n_dup, 4)

    # banded variant (round-7): 4 bands x 16 planes — candidate when
    # ANY band agrees; planted-pair miss prob drops from ~0.19
    # single-band to (1-(1-p)^16)^4 ~ 0.001. Band WIDTH matters at
    # scale: a first attempt with 8-plane bands (256 buckets/band) put
    # random-pair collision at 4/2^8 and generated ~1e9 candidates at
    # 400k vectors (job killed) — the banded recall lever is only free
    # when 2^planes_per_band keeps the random collision rate near zero
    dupb = timed(
        "lsh_dup_pairs_b4x16",
        lambda: ann.lsh_dup_pairs(
            vecs, threshold=0.99, n_planes=16, n_bands=4, dim=DIM
        ).cache(),
    )
    extra["dup_pairs_b4x16_found"] = int(dupb.count())
    found_b = dupb.where(
        (F.col("id_b") >= N_VECS - n_dup)
        & (F.col("id_a") == F.col("id_b") - (N_VECS - n_dup))
    ).count()
    dupb.unpersist()
    extra["planted_dup_recall_b4x16"] = round(found_b / n_dup, 4)

    out = {
        "metric": "ANN family at 400k embeddings",
        "timings_s": timings,
        **extra,
    }
    line = json.dumps(out)
    print(line)
    with open("BENCH_ANN.json", "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
