"""Data-layout operators: multi-dimensional clustering for scan pruning.

A 100 TB table queried by BOTH user and time can serve only one of them
with a plain sort.  Z-ordering interleaves the bits of the two cluster
keys so rows close in EITHER dimension land close in the file order —
min/max row-group statistics then prune scans for predicates on either
key (the Delta/Iceberg OPTIMIZE ZORDER idea, built from first
principles: a Morton curve + range partition + in-partition sort).

Key contract: Morton interleaving consumes exactly the low ``bits`` bits
of each key, so inputs must be integers in ``[0, 2**bits - 1]``.  A key
outside that range would silently alias onto another Z-prefix and
degrade clustering with no visible error — ``zorder_by`` therefore
guards every key at runtime (raise by default, ``on_overflow="clamp"``
to saturate instead, e.g. for open-ended id spaces where the tail can
share the top bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from uda_spark.functions import portable


def zvalue_col(df: DataFrame, col_a: str, col_b: str, bits: int = 20) -> Column:
    """Morton value of two integer columns (see portable.zvalue; the
    expression is unrolled integer arithmetic, fully inside whole-stage
    codegen).

    UNGUARDED: callers must ensure both columns are non-negative and
    < 2**bits, or use :func:`zorder_by`, which enforces the contract.
    """
    return F.expr(portable.zvalue(col_a, col_b, bits, "spark"))


def _guard_key(col: str, bits: int, on_overflow: str) -> str:
    """SQL text for one Z-key with the range contract enforced."""
    hi = (1 << bits) - 1
    if on_overflow == "clamp":
        return f"greatest(0L, least(CAST({col} AS BIGINT), {hi}L))"
    if on_overflow == "error":
        return (
            f"(CASE WHEN {col} < 0 OR {col} > {hi} THEN "
            f"CAST(raise_error(concat('zorder_by: key {col}=', CAST({col} AS STRING), "
            f"' outside [0, {hi}]; raise bits or use on_overflow=clamp')) AS BIGINT) "
            f"ELSE CAST({col} AS BIGINT) END)"
        )
    raise ValueError(f"on_overflow must be 'error' or 'clamp', got {on_overflow!r}")


def zorder_by(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 20,
    num_partitions: int | None = None,
    on_overflow: str = "error",
) -> DataFrame:
    """Cluster rows along the Z-curve of (col_a, col_b): range-partition
    by the Morton value (balanced output files via range sampling), sort
    within partitions, drop the helper column.

    Write the result with any sink and both keys get effective min/max
    pruning.  One exchange (the range partitioner's sampling pass is
    O(num_partitions) driver metadata, same as total_order_sort).

    Both keys must lie in ``[0, 2**bits - 1]`` (module docstring); out of
    range raises at execution unless ``on_overflow="clamp"``.
    """
    a = _guard_key(col_a, bits, on_overflow)
    b = _guard_key(col_b, bits, on_overflow)
    z = df.withColumn("_z", F.expr(portable.zvalue(a, b, bits, "spark")))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        z.repartitionByRange(parts, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
