"""Plan-inspection helpers: capture .explain output for assertions.

The engine's performance claims are properties of the PLAN — filters
reaching the parquet scan, partition pruning on term_bucket, broadcast
joins for small dimensions, no row-at-a-time Python in relational paths.
tests/test_plans.py pins them so a refactor that silently loses a pushdown
fails CI, which is the 100-TB discipline: a plan regression that costs
nothing at sf0.01 costs hours at scale."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *needles: str) -> str:
    plan = formatted_plan(df)
    for n in needles:
        assert n in plan, f"expected {n!r} in plan:\n{plan}"
    return plan


def assert_not_in_plan(df: DataFrame, *needles: str) -> str:
    plan = formatted_plan(df)
    for n in needles:
        assert n not in plan, f"unexpected {n!r} in plan:\n{plan}"
    return plan
