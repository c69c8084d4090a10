"""Skew handling: salting helper — the analog of the reference's
anti-hotspot randomized fetch ordering (src/Merger/MergeManager.cc:58-63),
lifted from the transport layer to the key space.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime; explicit salting remains necessary for skewed *aggregations*
and for joins where one hot key dwarfs everything (AQE splits partitions,
salting splits the key itself).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``target`` partitions ONLY if
    its current plan has fewer — the guard that makes CPU-heavy map stages
    (md5 signature computation) use the whole cluster when the input is a
    handful of parquet splits.

    At real scale the scan already yields >= cores splits and this is a
    no-op (zero added shuffle); it only fires on small inputs, where the
    repartition it adds moves a trivially small relation.  Deliberately
    NOT applied wholesale to every scan: an unconditional repartition
    would be a full-corpus shuffle at 100 TB.
    """
    target = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts): spreads a hot key over n_salts
    shuffle partitions.  Derived from a stable hash of the whole row via
    monotonically-independent columns is wrong (breaks co-location); a
    random-ish but *data-independent* spread is exactly what we want, so
    spark_partition_id + a per-row counter seeds it."""
    return df.withColumn(
        salt_col,
        (
            # pmod, not abs+%: abs(Integer.MIN_VALUE) is still negative and
            # Spark's % keeps the dividend's sign, so abs+% can emit a salt
            # outside [0, n_salts) ~1 in 2^32 rows — such a row would never
            # match the exploded 0..n_salts-1 range on the small join side.
            F.pmod(F.hash(F.spark_partition_id(), F.monotonically_increasing_id()), F.lit(n_salts))
        ).cast("int"),
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    n_salts: int,
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
) -> DataFrame:
    """Two-stage aggregation for skewed keys: aggregate on (key, salt)
    first (hot key split n_salts ways), then merge the partials on key.

    ``partial_aggs`` / ``final_aggs`` must be the decomposition of the
    target aggregate (e.g. count -> sum of counts; sum -> sum of sums).
    """
    salted = with_salt(df, n_salts)
    stage1 = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return stage1.groupBy(*keys).agg(*final_aggs)


def explode_salt_for_join(
    small_df: DataFrame, n_salts: int, salt_col: str = "_salt"
) -> DataFrame:
    """Replicate the SMALL side of a skewed join n_salts times so it can
    equi-join a salted big side on (key, salt)."""
    return small_df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
