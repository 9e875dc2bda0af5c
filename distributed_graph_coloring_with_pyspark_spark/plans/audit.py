"""Physical-plan audit helpers: programmatic checks that the plans we
designed for are the plans Catalyst actually produces (column pruning
reaching the parquet scan, broadcast joins where hinted, codegen
coverage).  Used by tests/test_plans.py as a *plan regression gate* —
an operator that silently loses its pushdown or broadcast at 100 TB is
a performance bug even while every value stays correct.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def scan_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan in the plan — the ground truth for
    column pruning (a scan reading all columns for a 2-column projection
    is wrong)."""
    return [m.group(1).strip() for m in re.finditer(r"ReadSchema: (.*)", plan_string(df))]


def pushed_filters(df: DataFrame) -> list[str]:
    return [
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan_string(df))
        if m.group(1).strip()
    ]


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans — wider/fewer is better (fewer
    interpreted boundaries).  ``formatted`` mode tags operators with
    ``[codegen id : N]``."""
    p = plan_string(df)
    return len(
        set(re.findall(r"codegen id : (\d+)", p))
        | set(re.findall(r"WholeStageCodegen \((\d+)\)", p))
    )


def scans_read_only(df: DataFrame, table_cols: dict[str, set[str]]) -> list[str]:
    """Return violations: scans whose ReadSchema includes a column not in
    the allowed set for any listed table (identified by a distinguishing
    column).  Empty list = pruning holds."""
    problems = []
    for schema in scan_schemas(df):
        cols = set(re.findall(r"(\w+):", schema))
        for table, allowed in table_cols.items():
            marker = next(iter(allowed))
            if marker in cols and not cols <= allowed:
                problems.append(f"{table}: scan reads {sorted(cols - allowed)} beyond {sorted(allowed)}")
    return problems
