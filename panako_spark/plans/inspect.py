"""Physical-plan inspection helpers.

The 100 TB contract is enforced here, not hoped for: tests assert that
the plans Catalyst produces have the properties the design depends on —
small dimensions broadcast, filters reach the parquet scan, column
pruning holds, JVM-only queries contain no Python evaluation, and
whole-stage codegen covers the hot expressions (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan(df)


def has_python_eval(df: DataFrame) -> bool:
    p = plan(df)
    return ("BatchEvalPython" in p or "ArrowEvalPython" in p
            or "MapInPandas" in p or "FlatMapGroupsInPandas" in p)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan node."""
    out = []
    for line in plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line[len("PushedFilters:"):].strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries (column-pruning evidence) from scan nodes."""
    out = []
    for line in plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            out.append(line[len("ReadSchema:"):].strip())
    return out


def codegen_stage_count(df: DataFrame, execute: bool = False) -> int:
    """WholeStageCodegen spans. With AQE the final plan only exists after
    execution; pass execute=True to materialize first."""
    if execute:
        # collect() executes THIS Dataset's query execution, finalizing
        # its AQE plan (count() would spawn a separate plan)
        df.collect()
    import re

    p = plan(df, "simple")
    stages = set(re.findall(r"\*\((\d+)\)", p))
    return len(stages) or p.count("WholeStageCodegen")


def shuffle_count(df: DataFrame) -> int:
    """Exchange nodes in the plan — every one is a cluster-wide shuffle."""
    return plan(df, "simple").count("Exchange")
