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


def compact_files(
    spark,
    src_path: str,
    dst_path: str,
    target_mb: int = 128,
    sort_within_by: tuple[str, ...] = (),
) -> dict:
    """Small-file compaction: rewrite a directory of many small parquet
    files into ~``target_mb``-sized ones — the maintenance pass that
    keeps scan task counts sane after streaming/incremental ingest (a
    100 TB table ingested in 1 MB micro-batch files is 100M files; scans
    die on listing and task overhead long before IO).

    File count is derived from the actual byte size via the Hadoop
    FileSystem API (driver-side metadata call, works on any scheme —
    local, HDFS, object store), not from row counts, so compaction
    behaves the same for wide and narrow schemas.  ``sort_within_by``
    optionally re-sorts rows inside each output file so min/max
    row-group stats stay selective after the rewrite (pair with
    :func:`zorder_by` for multi-dimensional layouts).

    Returns {"src_files", "dst_files", "total_bytes"} for observability.
    Writes to a NEW path: compaction must never rewrite in place (a
    failed job would destroy the table); swapping the directory pointer
    is the caller's (atomic) move.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = jpath.getFileSystem(hconf)
    summary = fs.getContentSummary(jpath)
    total_bytes = summary.getLength()
    src_files = summary.getFileCount()
    n_out = max(1, -(-total_bytes // (target_mb * 1024 * 1024)))

    df = spark.read.parquet(src_path)
    out = df.repartition(int(n_out))
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(dst_path)

    dst_files = (
        jvm.org.apache.hadoop.fs.Path(dst_path)
        .getFileSystem(hconf)
        .getContentSummary(jvm.org.apache.hadoop.fs.Path(dst_path))
        .getFileCount()
    )
    return {
        "src_files": int(src_files),
        "dst_files": int(dst_files),
        "total_bytes": int(total_bytes),
    }


def zorder_by_normalized(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Z-order clustering with per-key range normalization: each key is
    first rescaled to the full ``[0, 2**bits - 1]`` range from its actual
    min/max (one tiny agg — two scalars per key on the driver, same cost
    class as the range partitioner's sampling).

    Why: raw Morton interleaving weights keys by their BIT WIDTH, not
    their cardinality — a 14-bit user_id dominates a 10-bit hour bucket,
    so file pruning is lopsided (measured in PLANS.md).  Rescaling makes
    both dimensions span the same bit range, balancing min/max pruning
    across them.  The scaled value is a layout key only (dropped after
    clustering), so the double rounding inside the rescale never touches
    query results.
    """
    row = df.agg(
        F.min(col_a).alias("a_min"),
        F.max(col_a).alias("a_max"),
        F.min(col_b).alias("b_min"),
        F.max(col_b).alias("b_max"),
    ).first()
    hi = (1 << bits) - 1

    def scale(col: str, lo: int, up: int) -> str:
        if up <= lo:  # constant column: everything maps to bucket 0
            return "0L"
        return (
            f"CAST(floor((CAST({col} AS DOUBLE) - {lo}) * {hi} / ({up} - {lo})) AS BIGINT)"
        )

    a = scale(col_a, row["a_min"], row["a_max"])
    b = scale(col_b, row["b_min"], row["b_max"])
    z = df.withColumn("_z", F.expr(portable.zvalue(f"({a})", f"({b})", bits, "spark")))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        z.repartitionByRange(parts, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
