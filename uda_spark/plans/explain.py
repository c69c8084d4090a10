"""Physical-plan introspection — the feedback loop for scale tuning.

The task is not "passes at sf0.01" but "the plan survives 100 TB": filters
must reach the parquet scan, dims must broadcast, exchanges must be
counted and justified.  Tests assert on these helpers so plan regressions
fail CI, not production.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast
    exchanges excluded — those are the cheap ones we *want*).

    Matches both simple mode (``Exchange hashpartitioning(...)``) and
    formatted mode (``(5) Exchange`` + ``Arguments: hashpartitioning``).
    """
    plan = plan_str(df)
    return len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning)"
            r"|Arguments: (?:hashpartitioning|rangepartitioning)",
            plan,
        )
    )


def count_broadcasts(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastExchange|BroadcastHashJoin", plan_str(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    plan = plan_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — verify column pruning reached parquet."""
    plan = plan_str(df)
    return re.findall(r"ReadSchema: (\S+)", plan)


def codegen_stages(df: DataFrame) -> int:
    """Count WholeStageCodegen spans — wider is better (JVM-side fused)."""
    plan = plan_str(df)
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
