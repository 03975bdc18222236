"""Physical-plan inspection utilities.

The Catalyst plan is the engine's real output — a correct result with a
wrong plan (full scan instead of pushdown, shuffle instead of broadcast,
global sort instead of TakeOrdered) fails at 100 TB even though every
small-sf hash matches. These helpers turn `.explain("formatted")` into
assertable strings; tests/test_plans.py pins the plan properties each
operator's docstring claims (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted explain output (what `.explain("formatted")` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    """Final (AQE-resolved) physical plan string — triggers execution."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def simple_plan(df: DataFrame) -> str:
    """Pre-AQE physical plan in simple (one line per node) form — carries
    per-node flags the formatted header omits, e.g. BroadcastHashJoin's
    trailing isNullAwareAntiJoin boolean. Does not trigger execution."""
    return df._jdf.queryExecution().sparkPlan().toString()


def has_pushed_filters(df: DataFrame) -> bool:
    """True if any scan in the plan pushes at least one filter to parquet."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "[]" not in line.split("PushedFilters")[1][:4]:
            return True
    return False


def read_schema_columns(df: DataFrame, table_hint: str) -> list[str]:
    """Columns actually read from the parquet scan whose path mentions
    table_hint — the column-pruning check."""
    plan = formatted_plan(df)
    cols: list[str] = []
    current_scan_matches = False
    for line in plan.splitlines():
        if "Location:" in line:
            current_scan_matches = table_hint in line
        if current_scan_matches and "ReadSchema" in line:
            schema = line.split("ReadSchema:")[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            cols.extend(part.split(":")[0] for part in inner.split(",") if ":" in part)
            current_scan_matches = False
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of distinct shuffle exchanges in the (pre-AQE) physical plan.

    Counts the detail entries `(N) Exchange` of the formatted plan —
    shuffle exchanges only (BroadcastExchange/ReusedExchange excluded,
    and reused subtrees counted once, matching actual shuffle work).
    """
    import re

    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange\b", line.strip())
    )


def uses(df: DataFrame, operator: str) -> bool:
    """True if the physical plan contains the named operator (e.g.
    'BroadcastHashJoin', 'TakeOrderedAndProject', 'WindowGroupLimit')."""
    return operator in formatted_plan(df)
