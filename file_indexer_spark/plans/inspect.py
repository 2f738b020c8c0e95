"""Helpers to assert the SHAPE of a physical plan, not just its answer.

A query can be correct at sf0.01 and catastrophic at 100 TB; the tests
use these to pin the properties that matter at scale: filters reaching
the parquet scan, unused columns pruned out of ReadSchema, forced
broadcasts only where a page-size bound exists, and shuffle counts.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every scan node in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def scan_columns(df: DataFrame) -> set[str]:
    """Column names in every scan's ReadSchema — what is actually read."""
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Shuffle boundaries in the physical plan (AQE may later coalesce
    them, but each is a full data movement at scale). Counts hash, range
    AND single-partition exchanges — a global agg/limit shuffles too."""
    plan = simple_plan(df)
    return (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition")
    )


def has_broadcast_hint(df: DataFrame) -> bool:
    """True if the ANALYZED plan carries an explicit broadcast hint
    (runtime AQE broadcasts are fine — a forced hint on an unbounded
    side is the scale bug)."""
    return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans (``[codegen id : N]`` in the
    formatted plan / ``*(N)`` in the simple plan)."""
    return len(set(re.findall(r"codegen id : (\d+)", formatted_plan(df))))
