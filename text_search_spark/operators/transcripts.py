"""Transcript ingestion (SURVEY.md §2.1 S2): the reference's
Transcript.from_dict re-expressed as JVM column expressions.

Reference contract (/root/reference/textsearch/python/textsearch/
datatypes.py:158-237): a query arrives as token list + per-token begin
times; BPE tokens expand "▁"->space when is_bpe (replace at :190,:216);
begin times must be STRICTLY increasing (assert at :196-203); every
symbol of a token carries the token's begin time. The reference stores
per-BYTE times (4x stride for codepoints); Spark strings are codepoint
sequences, so this operator emits per-CHARACTER times — the same value
surface (all bytes of one char share its token's time), pinned against
the reference's own test vector in tests/test_transcripts.py.

Everything is built-in Spark SQL functions (transform / replace /
array_repeat / flatten / zip_with) — zero Python in the row path, so
ingest scales with the scan. The output (query_id, text, char_times)
feeds operators/segment.split_alignments directly (its `times` column
is per-char).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BPE_MARKER = "▁"


def transcripts_from_tokens(
    df: DataFrame,
    id_col: str = "query_id",
    tokens_col: str = "tokens",
    times_col: str = "begin_times",
    is_bpe: bool = False,
    strict: bool = True,
) -> DataFrame:
    """(id, tokens array<string>, begin_times array<double>) ->
    (query_id, text string, char_times array<double>, times_ok boolean).

    strict=True validates the strictly-increasing-times contract with
    one aggregate and raises on the first violating id (the reference
    asserts per row); strict=False keeps the times_ok flag for the
    caller to filter/quarantine.
    """
    tokens = F.col(tokens_col)
    if is_bpe:
        tokens = F.transform(
            tokens, lambda t: F.replace(t, F.lit(BPE_MARKER), F.lit(" "))
        )
    times = F.col(times_col)
    n = F.size(times)
    increasing = F.when(n <= 1, F.lit(True)).otherwise(
        F.forall(
            F.zip_with(
                F.slice(times, 1, n - 1),
                F.slice(times, 2, n - 1),
                lambda a, b: a < b,
            ),
            lambda x: x,
        )
    )
    out = df.select(
        F.col(id_col).alias("query_id"),
        F.array_join(tokens, "").alias("text"),
        F.flatten(
            F.zip_with(
                tokens, times, lambda t, bt: F.array_repeat(bt, F.length(t))
            )
        ).alias("char_times"),
        increasing.alias("times_ok"),
        F.size(F.col(tokens_col)).cast("int").alias("n_tokens"),
    )
    if strict:
        bad = out.where(~F.col("times_ok")).select("query_id").limit(1).collect()
        if bad:
            raise ValueError(
                f"begin_times not strictly increasing for query_id="
                f"{bad[0].query_id}"
            )
    return out
