"""Python UDF surface: Arrow-batched pandas UDFs (scalar, grouped-agg)
and grouped-map applyInPandas (SURVEY §2.2 'UDF/UDAF/UDTF surface').

UDFs are the slow path (JVM→Arrow→Python round trip); everything here
exists because the logic is genuinely Python-shaped — the built-in-
function queries cover the fast path.  Determinism discipline: inside a
UDF, accumulate in exact Python/numpy int64 and apply one final float
formula, so the DuckDB oracle (same integer sums, same formula) matches
bit-for-bit despite pandas/DuckDB using different internal algorithms
for mean/std/median.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


@pandas_udf(LongType())
def pd_token_count(text: pd.Series) -> pd.Series:
    """Scalar pandas UDF: whitespace token count (Arrow-batched)."""
    return text.str.lower().str.split(" ").map(len).astype("int64")


@pandas_udf(LongType())
def pd_vowel_count(text: pd.Series) -> pd.Series:
    """Scalar pandas UDF: vowel frequency (regex in vectorized pandas)."""
    return text.str.lower().str.count(r"[aeiou]").astype("int64")


ZSCORE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("z_bp", LongType()),
    ]
)


def zscore_by_group(df: DataFrame, group_col: str, value_col: str, id_col: str) -> DataFrame:
    """Grouped-map applyInPandas: per-group z-score in basis points.

    Exact-integer accumulation: sum and sum-of-squares are Python ints
    (never float partials), then one closed-form double expression —
    the same expression the SQL oracle uses, so results match exactly.
    Sample variance (n-1); groups of size 1 emit z=0.
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].astype("int64")
        n = len(x)
        s = int(x.sum())
        s2 = int((x * x).sum())
        if n > 1:
            var = (s2 - s * s / n) / (n - 1)
            std = math.sqrt(var) if var > 0 else 0.0
        else:
            std = 0.0
        mean = s / n
        if std > 0:
            z = ((x - mean) / std * 10000 + 0.5).apply(math.floor).astype("int64")
        else:
            z = pd.Series([0] * n, index=x.index, dtype="int64")
        return pd.DataFrame(
            {"doc_id": pdf[id_col], "lang": pdf[group_col], "z_bp": z}
        )

    return df.groupBy(group_col).applyInPandas(zscore, schema=ZSCORE_SCHEMA)


@pandas_udf(DoubleType())
def pd_median_cents(cents: pd.Series) -> float:
    """Grouped-agg pandas UDF: exact median of integer cents.

    Linear interpolation over int64 is exact in doubles (x or x+.5),
    matching quantile_cont in the oracle.
    """
    return float(cents.astype("int64").median())


def median_by_group(df: DataFrame, group_col: str, cents_col, alias: str) -> DataFrame:
    return df.groupBy(group_col).agg(pd_median_cents(cents_col).alias(alias))
