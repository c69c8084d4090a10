"""Data-layout operators: multi-dimensional clustering for scan pruning.

A 100 TB table queried by BOTH user and time can serve only one of them
with a plain sort.  Z-ordering interleaves the bits of the two cluster
keys so rows close in EITHER dimension land close in the file order —
min/max row-group statistics then prune scans for predicates on either
key (the Delta/Iceberg OPTIMIZE ZORDER idea, built from first
principles: a Morton curve + range partition + in-partition sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from uda_spark.functions import portable


def zvalue_col(df: DataFrame, col_a: str, col_b: str, bits: int = 20) -> Column:
    """Morton value of two non-negative integer columns (see
    portable.zvalue; the expression is unrolled integer arithmetic, fully
    inside whole-stage codegen)."""
    return F.expr(portable.zvalue(col_a, col_b, bits, "spark"))


def zorder_by(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster rows along the Z-curve of (col_a, col_b): range-partition
    by the Morton value (balanced output files via range sampling), sort
    within partitions, drop the helper column.

    Write the result with any sink and both keys get effective min/max
    pruning.  One exchange (the range partitioner's sampling pass is
    O(num_partitions) driver metadata, same as total_order_sort).
    """
    z = df.withColumn("_z", zvalue_col(df, col_a, col_b, bits))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        z.repartitionByRange(parts, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
