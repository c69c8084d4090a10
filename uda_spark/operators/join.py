"""Join surface (SURVEY §2.2: no join code exists in the reference; the
workloads and the 100 TB north star need the full set).

Strategy notes for scale:
  * ``broadcast_join`` — dims under the broadcast threshold never shuffle
    the fact side; at 100 TB the fact table stays put.
  * plain ``join`` on keys — Catalyst picks sort-merge with both sides
    exchanged on the key; AQE converts to broadcast at runtime if a side
    turns out small, and splits skewed partitions (skew-join).
  * ``asof_join`` — implemented as union + ordered window "last non-null
    carry-forward" instead of an inequality join: one exchange on the key,
    no O(n*m) range explosion, scales linearly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: Sequence[str] | str, how: str = "inner"
) -> DataFrame:
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str] | str) -> DataFrame:
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str] | str) -> DataFrame:
    return left.join(right, on=on, how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join in three directions, all inclusive of equal timestamps:

      * ``backward`` — latest right row with ``right_ts <= left_ts``,
      * ``forward``  — earliest right row with ``right_ts >= left_ts``,
      * ``nearest``  — whichever of the two is closer in absolute time
        difference; exact ties resolve to the backward match (pandas
        ``merge_asof`` tie semantics).

    Spark-first formulation: tag and union both sides, then ordered window
    passes per key carrying the adjacent right payload across.  Exactly
    one shuffle (by ``on``) for every direction — nearest adds a second
    in-partition sort but no extra exchange — no inequality-join blowup;
    this is the scalable pattern for 100 TB event streams.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction {direction!r}")

    # The match timestamp rides inside the payload struct so `nearest`
    # can compare distances without a re-join.
    payload = F.struct(
        F.col(right_ts).alias("_mts"), *[F.col(c) for c in right_values]
    ).alias("_r")
    left_cols = [c for c in left.columns]
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c) for c in left_cols],
    )
    merged = l.unionByName(r)

    # backward: right(side 0) sorts before an equal-ts left(side 1), so the
    # trailing frame's last non-null includes equal timestamps.
    w_back = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: order _side DESC so an equal-ts right lands AFTER the left
    # row and is included in the leading frame.
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction == "backward":
        merged = merged.withColumn("_match", F.last("_r", ignorenulls=True).over(w_back))
    elif direction == "forward":
        merged = merged.withColumn("_match", F.first("_r", ignorenulls=True).over(w_fwd))
    else:  # nearest
        merged = (
            merged.withColumn("_mb", F.last("_r", ignorenulls=True).over(w_back))
            .withColumn("_mf", F.first("_r", ignorenulls=True).over(w_fwd))
            .withColumn(
                "_match",
                F.when(F.col("_mb").isNull(), F.col("_mf"))
                .when(F.col("_mf").isNull(), F.col("_mb"))
                .when(
                    (F.col("_ts") - F.col("_mb._mts"))
                    <= (F.col("_mf._mts") - F.col("_ts")),
                    F.col("_mb"),
                )
                .otherwise(F.col("_mf")),
            )
        )
    out = merged.where(F.col("_side") == 1).select(
        *left_cols,
        *[F.col("_match").getField(c).alias(f"asof_{c}") for c in right_values],
    )
    return out
