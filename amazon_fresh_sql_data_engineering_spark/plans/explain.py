"""Physical-plan introspection helpers (SURVEY.md §4).

The engine's optimizer contract is "express the plan declaratively and
Catalyst does the rest" — these helpers make that contract *testable*:
tests assert that filters reach the parquet scan (PushedFilters), that
projections prune columns (ReadSchema), that small dimensions broadcast,
and that top-k compiles to TakeOrderedAndProject instead of a full sort.
At 100 TB each of these is the difference between reading gigabytes and
reading the whole lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Formatted physical plan string (post-AQE initial plan)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the scan nodes."""
    plan = physical_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def read_schema(df: DataFrame) -> str:
    plan = physical_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "ReadSchema" in line)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider is better (fewer
    interpreter boundaries)."""
    import re

    # 'codegen' explain mode compiles the plan and reports
    # "Found N WholeStageCodegen subtrees" even under AQE
    s = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", s)
    return int(m.group(1)) if m else 0


def partial_aggregation_present(df: DataFrame) -> bool:
    """Map-side partial aggregation before the shuffle (partial_sum/count)."""
    return "partial_" in physical_plan(df)


def vectorized_scan(df: DataFrame) -> bool:
    """Parquet scan runs in the vectorized (Batched) reader."""
    return "Batched: true" in physical_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the plan."""
    plan = physical_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith(("Exchange", "+- Exchange"))
        or "hashpartitioning" in line and "Exchange" in line
    )
