"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only "state" is merge progress; this is the Spark-native
escape hatch for operators the built-in windows can't express (running
per-key accumulators, custom eviction, CEP-ish logic).  Arrow-batched:
each call processes a pandas DataFrame per key group, state is a plain
tuple persisted in the state store, timeouts evict idle keys.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# State accumulates integer CENTS, not doubles: integer addition is exact
# and order-independent, so the emitted totals are deterministic under any
# partitioning / trigger slicing — which is what lets the batch SQL oracle
# value-hash the streaming result.
_STATE_SCHEMA = "n LONG, cents LONG"


def _update_running_totals(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["value_cents"].sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
    )


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Running per-user (count, value-total) maintained across triggers —
    a custom stateful accumulator the built-in aggregations cover in
    batch but which demonstrates the arbitrary-state API for streams.
    State per key is two scalars (exact integer cents); no timeout
    (bounded key domain)."""
    from pyspark.sql import functions as F

    prepped = events.select(
        "user_id",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS LONG)").alias("value_cents"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
