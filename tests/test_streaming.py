"""Streaming-vs-batch equivalence: the batch queries are the oracle for
the streaming twins (same semantics, different execution mode)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from uda_spark.registry import all_specs
from uda_spark.streaming.windows import (
    events_file_stream,
    hourly_counts_stream,
    run_stream_to_memory,
    sessionize_stream,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_hourly_counts_stream_matches_batch(spark):
    stream = events_file_stream(spark, SF_SMOKE)
    result = run_stream_to_memory(hourly_counts_stream(stream), "t_hourly")
    batch = all_specs()["events_hourly_rollup"].fn(spark, SF_SMOKE)
    cols = ["bucket_epoch", "event_type", "n_events", "total_value"]
    assert _rows(result, cols) == _rows(batch, cols)


def test_sessionize_stream_matches_batch_sessions(spark):
    stream = events_file_stream(spark, SF_SMOKE)
    result = run_stream_to_memory(sessionize_stream(stream), "t_sessions")
    batch = all_specs()["events_sessionize"].fn(spark, SF_SMOKE)
    cols = ["user_id", "n_events", "session_start", "session_end"]
    assert _rows(result, cols) == _rows(batch.select(*cols), cols)


def test_running_totals_stateful(spark):
    from uda_spark.streaming.stateful import running_totals_stream

    stream = events_file_stream(spark, SF_SMOKE)
    result = run_stream_to_memory(running_totals_stream(stream), "t_totals", mode="update")
    # state accumulates across the whole (availableNow) input: final rows
    # per user must equal the batch aggregate
    batch = (
        all_specs()["kv_reduce_by_key"].fn(spark, SF_SMOKE)
        .groupBy("user_id")
        .agg(F.sum("n_events").alias("n_events"))
    )
    got = {r["user_id"]: r["n_events"] for r in result.collect()}
    want = {r["user_id"]: r["n_events"] for r in batch.collect()}
    assert got == want
