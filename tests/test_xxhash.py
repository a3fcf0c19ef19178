"""Python XXH64 must be bit-identical to Spark's xxhash64 (seed 42)."""

import numpy as np
from pyspark.sql import functions as F

from text_search_spark.functions.xxhash import (
    pmod,
    xxhash64_long,
    xxhash64_str,
)


def test_xxhash64_str_matches_spark(spark):
    vals = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefgh", "abcdefghi",
        "the", "WORD00042", "你好世界", "x" * 31, "y" * 32, "z" * 100,
        "needlea marker0 sentinel0",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select("s", F.xxhash64("s").alias("h")).collect()
    for r in rows:
        assert xxhash64_str(r.s) == r.h, r.s


def test_xxhash64_long_matches_spark(spark):
    vals = [0, 1, -1, 42, 2**40, -(2**40), 2**62, -(2**62), 123456789]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = df.select("v", F.xxhash64("v").alias("h")).collect()
    for r in rows:
        assert xxhash64_long(r.v) == r.h, r.v


def test_pmod_matches_spark(spark):
    rng = np.random.default_rng(5)
    vals = [int(v) for v in rng.integers(-(2**62), 2**62, size=50)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = df.select(
        "v", F.pmod(F.xxhash64("v"), F.lit(32)).alias("b")
    ).collect()
    for r in rows:
        assert pmod(xxhash64_long(r.v), 32) == r.b
