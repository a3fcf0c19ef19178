#!/usr/bin/env python3
"""Round-8 optimization probe harness (separate from the FROZEN bench.py).

Isolates the phases of the expensive bench queries with noop sinks
(guide §1.4) so each number times computation, not the sink. Usage:

  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py minhash
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py build
  ... (see PROBES)

Prints one JSON line per probe: {"probe": ..., "phases": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    which = sys.argv[1] if len(sys.argv) > 1 else "minhash"

    from pyspark.sql import functions as F

    from text_search_spark.operators import dedup
    from text_search_spark.session import get_spark

    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .repartition(cpus)
    )
    docs.count()

    phases: dict[str, float] = {}

    def timed(name, fn):
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        r = fn()
        phases[name] = round(time.perf_counter() - t0, 3)
        sc.setJobDescription(None)
        return r

    if which == "minhash":
        # warmup: touch the same codepaths once
        wd = docs.limit(2000).cache()
        wd.count()
        dedup.lsh_candidate_pairs(dedup.minhash_signatures(wd)).count()
        wd.unpersist()

        units = dedup._distinct_terms(docs, "text", "doc_id")
        timed("a_units_distinct", lambda: noop(units))
        sigs = dedup.minhash_signatures(docs)
        timed("b_sigs", lambda: noop(sigs))
        bands = dedup._band_buckets(sigs, "doc_id", 2, dedup.NUM_MINHASHES)
        timed("c_bands", lambda: noop(bands))
        grouped = (
            bands.groupBy("band", "bucket")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("sec", "id"))
                ).alias("members")
            )
            .where(F.size("members") >= 2)
        )
        timed("d_grouped", lambda: noop(grouped))
        timed(
            "d2_bucket_histo",
            lambda: print(
                grouped.select(F.size("members").alias("n"))
                .groupBy()
                .agg(
                    F.count("*").alias("buckets"),
                    F.max("n").alias("max_n"),
                    F.expr("percentile_approx(n, 0.5)").alias("p50"),
                    F.expr("percentile_approx(n, 0.99)").alias("p99"),
                    F.sum(F.col("n") * (F.col("n") - 1) / 2).alias(
                        "pair_ub"
                    ),
                )
                .collect()
            ),
        )
        pairs_nodist = dedup.lsh_candidate_pairs(sigs)  # rebuild full
        # pre-distinct expansion: replicate internals minus distinct
        timed(
            "e_full_with_distinct_count",
            lambda: print("pairs:", pairs_nodist.count()),
        )
    elif which == "build":
        import shutil

        from text_search_spark.index.build import build_index, prepare_corpus

        corpus = prepare_corpus(docs, doc_id_col="doc_id")
        d = "/tmp/tss_r8_probe/index"
        shutil.rmtree(d, ignore_errors=True)
        # warm workers
        wd = docs.limit(max(50, docs.count() // 5)).cache()
        wd.count()
        build_index(
            spark, prepare_corpus(wd, doc_id_col="doc_id"),
            d + "_warm", n_buckets=4, n_shards=2, bucket_groups=1,
        )
        shutil.rmtree(d + "_warm", ignore_errors=True)
        wd.unpersist()
        timed(
            "build",
            lambda: build_index(
                spark, corpus, d, n_buckets=None, n_shards=None,
                bucket_groups=1,
            ),
        )
    else:
        raise SystemExit(f"unknown probe {which}")

    print(json.dumps({"probe": which, "sf": sf_dir, "phases": phases}))


if __name__ == "__main__":
    main()
