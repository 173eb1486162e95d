"""Physical-plan audits: assertions that the plans we *want* are the
plans we *get* (SURVEY.md §4.2). Used by tests and by bench reports.

The checks parse ``explain`` output text — the only stable public
surface for plan inspection from PySpark.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Executed-plan text, FINAL section only: after an action runs,
    AQE's toString prints the final plan AND the pre-adaptive
    "== Initial Plan ==" — counting features over both double-counts
    every operator (split is a no-op when the marker is absent)."""
    return (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_python_eval(df: DataFrame) -> bool:
    """True if any Python UDF stage (Arrow or row) appears — the thing
    native chains must avoid."""
    plan = executed_plan(df)
    return "ArrowEvalPython" in plan or "BatchEvalPython" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters reaching the parquet scan."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan (column-pruning audit)."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = better fused)."""
    plan = executed_plan(df)
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (each is a full-data network pass
    at scale; the merge path budget is ONE)."""
    plan = executed_plan(df)
    return plan.count("Exchange hashpartitioning") + plan.count("Exchange rangepartitioning")


def broadcast_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")
