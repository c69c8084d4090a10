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


def _make_evicting_update(idle_timeout_ms: int):
    """Update fn with processing-time eviction: an idle key's state is
    emitted one final time and REMOVED — bounded state on an unbounded
    key domain.  Totals are unchanged for keys that never go idle, so a
    single availableNow pass (no idle gaps) equals the no-timeout
    operator — which is what keeps the batch oracle valid."""

    def update(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - needs multi-trigger idle
            n, cents = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
            )
            return
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pdf["value_cents"].sum())
        state.update((n, cents))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    return update


def running_totals_stream(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Running per-user (count, value-total) maintained across triggers —
    a custom stateful accumulator the built-in aggregations cover in
    batch but which demonstrates the arbitrary-state API for streams.
    State per key is two scalars (exact integer cents).

    ``idle_timeout_ms`` is the production posture for an UNBOUNDED key
    domain: keys idle longer than the timeout are flushed and evicted
    (ProcessingTimeTimeout), so the state store stays O(active keys)
    instead of O(all keys ever seen).  Default (None) keeps state forever
    — right only when the key domain is bounded.  NOTE: processing-time
    timers fire only under continuous triggers; an availableNow run never
    fires them (and never terminates while timers are registered), so
    tests drive the eviction fn directly (tests/test_streaming.py)."""
    from pyspark.sql import functions as F

    prepped = events.select(
        "user_id",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS LONG)").alias("value_cents"),
    )
    if idle_timeout_ms is None:
        fn, conf = _update_running_totals, GroupStateTimeout.NoTimeout
    else:
        fn, conf = (
            _make_evicting_update(idle_timeout_ms),
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    return prepped.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=conf,
    )
