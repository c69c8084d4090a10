"""MERGE INTO (upsert) semantics as a DataFrame operator.

The reference's closest concept is the sorted-run merge (SURVEY §2.1
O5/O10) — merging streams by key with a resolution rule.  Relationally
that rule is SQL MERGE: matched keys update, unmatched source keys
insert, unmatched target keys pass through.  Table formats with native
MERGE (Delta/Iceberg) compile to exactly this plan — a keyed full outer
join — so this operator is both the fallback for plain parquet and the
semantic spec for the format-native path.

Scale shape: one shuffle of each side on the merge keys (broadcast the
source when it is a small delta batch — the common refresh case); the
output is a full new snapshot, written partition-parallel.  Copy-on-write
at 100 TB pairs this with partition pruning: join only the target
partitions the source touches.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    action_col: str | None = "merge_action",
) -> DataFrame:
    """Upsert ``source`` into ``target`` by ``keys``.

    Matched rows take the source's non-key columns (NULL source values
    fall back to the target's — coalesce-update semantics); source-only
    rows insert; target-only rows pass through.  Source columns must be
    a subset of target columns.  ``action_col`` (optional) tags each row
    'updated' / 'inserted' / 'unchanged'.
    """
    extra = set(source.columns) - set(target.columns)
    if extra:
        raise ValueError(f"source columns not in target: {sorted(extra)}")
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    cond = None
    for k in keys:
        eq = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = eq if cond is None else (cond & eq)
    joined = t.join(s, cond, "full_outer")

    src_cols = set(source.columns)
    # side presence via sentinel columns, not key nullability: NULL merge
    # keys never equi-match, and a NULL-keyed row must still be labeled
    # by which side it came from
    t_present = F.coalesce(F.col("t._t_present"), F.lit(False))
    s_present = F.coalesce(F.col("s._s_present"), F.lit(False))
    matched = t_present & s_present
    out = []
    for c in target.columns:
        if c in keys:
            out.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
        elif c in src_cols:
            out.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
        else:
            out.append(F.col(f"t.{c}").alias(c))
    if action_col:
        out.append(
            F.when(matched, F.lit("updated"))
            .when(s_present & ~t_present, F.lit("inserted"))
            .otherwise(F.lit("unchanged"))
            .alias(action_col)
        )
    return joined.select(*out)
