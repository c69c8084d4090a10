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


def plan_str(df: DataFrame, mode: str = "formatted", final_only: bool = True) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    plan = buf.getvalue()
    # An executed AQE plan prints "== Final Plan ==" then "== Initial
    # Plan ==" — final_only keeps just the final tree so operator counts
    # aren't doubled (no-op for unexecuted / non-adaptive plans).  NOTE:
    # in formatted mode the per-operator detail sections come AFTER the
    # initial-plan tree, so detail readers pass final_only=False and
    # dedupe instead.
    return plan.split("== Initial Plan ==")[0] if final_only else plan


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast
    exchanges excluded — those are the cheap ones we *want*).

    Counts in simple mode, where the (final) tree names the partitioning
    inline — formatted mode splits it into detail sections that would
    double-count against the initial plan.
    """
    plan = plan_str(df, mode="simple")
    return len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
            plan,
        )
    )


def count_broadcasts(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastExchange", plan_str(df, mode="simple")))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan, deduplicated (an executed
    AQE explain lists each scan twice — final + initial plan)."""
    plan = plan_str(df, final_only=False)
    return list(dict.fromkeys(re.findall(r"PushedFilters: \[([^\]]*)\]", plan)))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan (deduplicated) — verify column pruning
    reached parquet."""
    plan = plan_str(df, final_only=False)
    return list(dict.fromkeys(re.findall(r"ReadSchema: (\S+)", plan)))


def count_scans(df: DataFrame) -> int:
    """Number of file scans in the (final) plan — counted from the simple
    tree, NOT from deduped detail sections (two scans of the same file
    with identical schemas are still two scans)."""
    return len(re.findall(r"FileScan|Scan parquet", plan_str(df, mode="simple")))


def codegen_stages(df: DataFrame) -> int:
    """Count whole-stage-codegen spans — wider is better (JVM-side fused).

    Counts ``*(3)`` span markers in simple mode (the final plan after
    execution; unexecuted AQE plans carry no codegen annotation).
    """
    plan = plan_str(df, mode="simple")
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
