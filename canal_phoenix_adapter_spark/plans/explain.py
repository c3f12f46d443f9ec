"""Helpers to assert the physical plan has the shape we designed for:
filters pushed into the scan, columns pruned, dimensions broadcast,
no accidental extra shuffles. Used by tests/test_plans.py so a perf
regression (e.g. a filter that stops reaching parquet) fails CI, not
just the benchmark."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    """True iff the plan contains a Broadcast HASH join. Deliberately
    NOT BroadcastNestedLoopJoin: that is the O(n^2) degenerate shape
    the plan suite exists to catch — counting it as a satisfying
    'broadcast join' would green-light an equi-join regressing to a
    non-equi nested loop."""
    return "BroadcastHashJoin" in explain_str(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the plan (pre-AQE)."""
    return len(re.findall(r"\(\d+\) Exchange", explain_str(df)))
