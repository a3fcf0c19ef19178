"""Quality metrics over result segments (SURVEY.md §2.4 A5).

overlap_ratio reimplements the reference's dataset QA sweep
(/root/reference/examples/libriheavy/tools/calculate_overlap_ratio.py:
43-86): per recording, segments sorted by start time; every segment i
accumulates (end_i - start_j) for the CONTIGUOUS run of following
segments j whose start falls before end_i (the reference's inner while
breaks at the first non-overlapping j — identical to "all j with
start_j < end_i" under the start sort); per-recording and global
overlap ratios roll up from the same sums.

Determinization note: the reference sorts by start only (Python stable
sort); this operator totalizes the order with (start, end, seg_id) so
distributed runs are reproducible when starts tie.

Times are integer microseconds end-to-end, so the sums are exact and
engine/oracle comparisons are hash-stable; the only float op is the
final ratio division.

Scale shape: one shuffle on recording_id, NumPy-vectorized sweep per
group (searchsorted + prefix sums, no Python pair loop), two-level
rollup for the global row — the same partial/final split Spark uses for
any aggregate.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OVERLAP_SCHEMA = (
    "recording_id string, n_segments long, overlap_us long, "
    "duration_us long"
)

GLOBAL_ID = "__all__"


def _sweep(starts: np.ndarray, ends: np.ndarray) -> int:
    """Sum of (end_i - start_j) over pairs i<j with start_j < end_i,
    inputs sorted by (start, end); exact int64 math."""
    n = starts.size
    if n < 2:
        return 0
    # first index with start >= end_i
    hi = np.searchsorted(starts, ends, side="left")
    lo = np.arange(n) + 1
    hi = np.maximum(hi, lo)  # never look backwards
    prefix = np.concatenate([[0], np.cumsum(starts)])
    cnt = hi - lo
    return int(np.sum(cnt * ends - (prefix[hi] - prefix[lo])))


def overlap_ratio(
    segments: DataFrame,
    recording_col: str = "recording_id",
    start_col: str = "start_us",
    duration_col: str = "duration_us",
    with_global: bool = True,
) -> DataFrame:
    """segments: (recording_id, start_us long, duration_us long, seg_id)
    -> per-recording rows + optional global rollup row, OVERLAP_SCHEMA
    plus `ratio` (overlap/duration, rounded to 6)."""
    base = segments.select(
        F.col(recording_col).cast("string").alias("recording_id"),
        F.col(start_col).cast("long").alias("s"),
        (F.col(start_col).cast("long") + F.col(duration_col).cast("long"))
        .alias("e"),
        F.col(duration_col).cast("long").alias("dur"),
    )

    def sweep(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["s", "e"], kind="stable")
        ov = _sweep(
            pdf["s"].to_numpy(np.int64), pdf["e"].to_numpy(np.int64)
        )
        return pd.DataFrame(
            {
                "recording_id": [pdf["recording_id"].iat[0]],
                "n_segments": [len(pdf)],
                "overlap_us": [ov],
                "duration_us": [int(pdf["dur"].sum())],
            }
        )

    per_rec = base.groupBy("recording_id").applyInPandas(
        sweep, schema=OVERLAP_SCHEMA
    )
    if with_global:
        per_rec = per_rec.unionByName(
            per_rec.agg(
                F.lit(GLOBAL_ID).alias("recording_id"),
                F.sum("n_segments").alias("n_segments"),
                F.sum("overlap_us").alias("overlap_us"),
                F.sum("duration_us").alias("duration_us"),
            )
        )
    return per_rec.withColumn(
        "ratio",
        F.when(
            F.col("duration_us") > 0,
            F.round(
                F.col("overlap_us").cast("double") / F.col("duration_us"), 6
            ),
        ).otherwise(F.lit(0.0)),
    )
