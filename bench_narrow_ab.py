#!/usr/bin/env python3
"""A/B measurement of the segment-pipe doc_id narrowing (int32 delta vs
int64) on a DENSE-id corpus — the configuration where the gate engages
(sequential ingest ids; the scaling bench's url-hashed ids auto-disable
it, see index/build.py).

Method per the repo's measurement discipline (BENCH.md): each arm runs in
its own JVM with an untimed warmup build, then TSS_AB_INNER same-JVM
timed builds; arms interleave across TSS_AB_RUNS process rounds and the
best (steady-state) time per arm is reported.

  python bench_narrow_ab.py              # parent, prints one JSON line
  TSS_AB_ARM=on|off python bench_narrow_ab.py --child
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

N_DOCS = int(os.environ.get("TSS_AB_DOCS", "400000"))
CORES = int(os.environ.get("TSS_AB_CORES", "16"))
INNER = int(os.environ.get("TSS_AB_INNER", "3"))
ROUNDS = int(os.environ.get("TSS_AB_RUNS", "2"))
CORPUS_PATH = f"/tmp/tss_ab_corpus_{N_DOCS}.parquet"


def ensure_corpus() -> None:
    """Dense ids: the generated pages get doc_id = row index (the Iceberg
    sequential-ingest shape), not the url hash."""
    if os.path.exists(CORPUS_PATH):
        return
    from text_search_spark.corpus import write_pages_parquet

    write_pages_parquet(CORPUS_PATH, N_DOCS)


def child(arm: str) -> None:
    from text_search_spark.index.build import build_index, prepare_corpus
    from text_search_spark.session import get_spark

    os.environ["TSS_NARROW_DOC_ID"] = "1" if arm == "on" else "0"
    spark = get_spark(f"ab{arm}", cores=CORES, shuffle_partitions=CORES)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    pages = spark.read.parquet(CORPUS_PATH)
    # dense sequential ids, deterministic (order by url)
    w = Window.orderBy("url")
    ided = pages.select(
        (F.row_number().over(w) - 1).alias("doc_id"), "url", "text"
    )
    # materialize once so the global sort isn't inside the timed builds
    ided_path = f"/tmp/tss_ab_ided_{N_DOCS}.parquet"
    if not os.path.exists(ided_path):
        ided.coalesce(8).write.mode("overwrite").parquet(ided_path)
    corpus = prepare_corpus(
        spark.read.parquet(ided_path), doc_id_col="doc_id", url_col="url"
    )

    warm = f"/tmp/tss_ab_warm_{arm}"
    shutil.rmtree(warm, ignore_errors=True)
    build_index(
        spark,
        prepare_corpus(
            spark.read.parquet(ided_path).limit(200),
            doc_id_col="doc_id",
            url_col="url",
        ),
        warm,
        n_buckets=4,
        n_shards=2,
        bucket_groups=1,
    )
    shutil.rmtree(warm, ignore_errors=True)

    runs = []
    for _ in range(INNER):
        ix = f"/tmp/tss_ab_ix_{arm}"
        shutil.rmtree(ix, ignore_errors=True)
        t0 = time.perf_counter()
        build_index(
            spark, corpus, ix, n_buckets=None, n_shards=None, bucket_groups=1
        )
        runs.append(time.perf_counter() - t0)
    from text_search_spark.index import format as ixfmt

    man = ixfmt.load_manifest(ix)
    print(
        "CHILD_RESULT "
        + json.dumps(
            {
                "arm": arm,
                "narrow_engaged": man.doc_id_narrow
                and os.environ["TSS_NARROW_DOC_ID"] != "0",
                "runs_s": [round(x, 3) for x in runs],
                "best_s": round(min(runs), 3),
            }
        )
    )


def main() -> None:
    if "--child" in sys.argv:
        child(os.environ["TSS_AB_ARM"])
        return
    ensure_corpus()
    best = {"on": [], "off": []}
    cold = {"on": [], "off": []}
    for r in range(ROUNDS):
        for arm in ("on", "off") if r % 2 == 0 else ("off", "on"):
            env = dict(os.environ, TSS_AB_ARM=arm)
            out = subprocess.run(
                [sys.executable, __file__, "--child"],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            for line in out.splitlines():
                if line.startswith("CHILD_RESULT "):
                    d = json.loads(line[len("CHILD_RESULT "):])
                    best[arm].append(d["best_s"])
                    cold[arm].append(d["runs_s"][0])
                    print(f"round {r} {arm}: {d}", file=sys.stderr)
    on, off = min(best["on"]), min(best["off"])
    print(
        json.dumps(
            {
                "metric": "segment-pipe narrowing A/B (dense-id build)",
                "n_docs": N_DOCS,
                "cores": CORES,
                "best_on_s": on,
                "best_off_s": off,
                "speedup": round(off / on, 3),
                "all_on_s": best["on"],
                "all_off_s": best["off"],
            }
        )
    )


if __name__ == "__main__":
    main()
