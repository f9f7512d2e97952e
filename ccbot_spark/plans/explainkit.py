"""Physical-plan inspection helpers (the ".explain and iterate" loop,
made assertable). Used by tests/test_plans.py and bench.py to keep the
plans we shipped the plans we wanted:

  * filters reach the parquet scan (PushedFilters non-empty)
  * scans read only projected columns (ReadSchema)
  * small dimensions broadcast (BroadcastHashJoin, not SortMergeJoin)
  * shuffle (Exchange) count doesn't regress
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


def n_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries in the plan (formatted mode prints
    each shuffle as '(n) Exchange'; BroadcastExchange is NOT counted —
    broadcasts are the point, shuffles are the cost)."""
    return len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists that appear on scans in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))
