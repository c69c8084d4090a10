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

_STATE_SCHEMA = "n LONG, total DOUBLE"


def _update_running_totals(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Running per-user (count, value-total) maintained across triggers —
    a custom stateful accumulator the built-in aggregations cover in
    batch but which demonstrates the arbitrary-state API for streams.
    State per key is two scalars; no timeout (bounded key domain)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running_totals,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
