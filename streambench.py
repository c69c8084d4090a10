#!/usr/bin/env python
"""Streaming micro-bench: end-to-end latency/throughput for the
Structured Streaming surface, as a tracked number alongside bench.py.

Each pipeline reads the events table as a file stream (availableNow
trigger — process everything currently available, then stop), writes to
the noop sink (full pipeline executes, nothing collects on the driver),
and records per-batch durations and input rows from the streaming
progress events.  Prints ONE JSON line:

  {"metric": "streaming_availablenow", "queries": {name:
      {"batches": n, "rows": n, "total_sec": s, "rows_per_sec": r}}, ...}

Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python streambench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from uda_spark.session import get_spark
from uda_spark.streaming.stateful import running_totals_stream
from uda_spark.streaming.windows import (
    cms_sketch_stream,
    events_file_stream,
    hourly_counts_stream,
    sessionize_stream,
    sliding_counts_stream,
)

PIPELINES = {
    # name -> (builder(events) -> DataFrame, outputMode)
    "hourly_counts": (hourly_counts_stream, "update"),
    "sliding_counts": (sliding_counts_stream, "update"),
    # session-window aggregation only supports append output
    "sessionize": (sessionize_stream, "append"),
    "running_totals": (running_totals_stream, "update"),
    # bounded-state sketch: d x w counters forever, any key cardinality
    "cms_sketch": (cms_sketch_stream, "update"),
}


def batch_latency_probe(spark, sf_dir: str, n_chunks: int = 8) -> dict:
    """Per-micro-batch latency distribution: re-chunk the events table
    into ``n_chunks`` files and stream them one file per trigger, so the
    run produces ``n_chunks`` real micro-batches instead of one — the
    latency profile a continuous deployment would see, measured from the
    streaming progress events (min/median/max triggerExecution)."""
    import pyspark.sql.functions as F

    from uda_spark.sources.tables import load_table
    from uda_spark.streaming.windows import hourly_counts_stream

    src_dir = tempfile.mkdtemp(prefix="streambench_chunks_")
    ckpt = tempfile.mkdtemp(prefix="streambench_lat_")
    try:
        ev = load_table(spark, sf_dir, "events")
        ev.repartition(n_chunks).write.mode("overwrite").parquet(src_dir)
        schema = spark.read.parquet(src_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        from uda_spark.sources.tables import event_micros

        stream = stream.withColumn("ts_us", event_micros(stream)).withColumn(
            "event_time", F.timestamp_micros(F.col("ts_us"))
        )
        t0 = time.perf_counter()
        query = (
            hourly_counts_stream(stream)
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        wall = time.perf_counter() - t0
        progress = [json.loads(p.json) for p in query.recentProgress]
        batches = [p for p in progress if p.get("numInputRows", 0) > 0]
        lat = sorted(
            p.get("durationMs", {}).get("triggerExecution", 0) / 1000.0
            for p in batches
        )
        rows = sum(p["numInputRows"] for p in batches)
        return {
            "batches": len(batches),
            "rows": rows,
            "total_sec": round(wall, 3),
            "batch_sec_min": round(lat[0], 3) if lat else None,
            "batch_sec_med": round(lat[len(lat) // 2], 3) if lat else None,
            "batch_sec_max": round(lat[-1], 3) if lat else None,
        }
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def kv_source_ingest_probe(spark, sf_dir: str) -> dict:
    """Throughput of the uda_kv Python DataSource streaming reader: the
    orders table framed as VInt segments, drained in one availableNow
    pass through the custom source into the noop sink.  This prices the
    connector's honest Python-decode cost next to the JVM file-source
    pipelines above (the interchange fast path stays SequenceFile)."""
    from pyspark.sql import functions as F

    from uda_spark.sources import pyds
    from uda_spark.sources.tables import load_table

    pyds.register(spark)
    src = tempfile.mkdtemp(prefix="streambench_kv_")
    ckpt = tempfile.mkdtemp(prefix="streambench_kvckpt_")
    try:
        o = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").cast("string").cast("binary").alias("key"),
            F.col("o_orderstatus").cast("binary").alias("value"),
        )
        o.write.format("uda_kv").mode("overwrite").save(src)
        t0 = time.perf_counter()
        query = (
            spark.readStream.format("uda_kv")
            .load(src)
            .groupBy()
            .count()
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        wall = time.perf_counter() - t0
        progress = [json.loads(p.json) for p in query.recentProgress]
        batches = [p for p in progress if p.get("numInputRows", 0) > 0]
        rows = sum(p["numInputRows"] for p in batches)
        exec_ms = sum(
            p.get("durationMs", {}).get("triggerExecution", 0) for p in batches
        )
        return {
            "batches": len(batches),
            "rows": rows,
            "total_sec": round(wall, 3),
            "exec_sec": round(exec_ms / 1000.0, 3),
            "rows_per_sec": round(rows / (exec_ms / 1000.0), 1) if exec_ms else None,
        }
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    results: dict[str, dict] = {}
    for name, (builder, mode) in PIPELINES.items():
        ckpt = tempfile.mkdtemp(prefix=f"streambench_{name}_")
        try:
            events = events_file_stream(spark, sf_dir)
            t0 = time.perf_counter()
            query = (
                builder(events)
                .writeStream.format("noop")
                .outputMode(mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            query.awaitTermination()
            wall = time.perf_counter() - t0
            progress = [json.loads(p.json) for p in query.recentProgress]
            batches = [p for p in progress if p.get("numInputRows", 0) > 0]
            rows = sum(p["numInputRows"] for p in batches)
            # triggerExecution covers the whole micro-batch: source scan,
            # state-store update, sink commit
            exec_ms = sum(
                p.get("durationMs", {}).get("triggerExecution", 0) for p in batches
            )
            results[name] = {
                "batches": len(batches),
                "rows": rows,
                "total_sec": round(wall, 3),
                "exec_sec": round(exec_ms / 1000.0, 3),
                "rows_per_sec": round(rows / (exec_ms / 1000.0), 1) if exec_ms else None,
            }
            print(f"# {name}: {results[name]}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": f"{type(exc).__name__}: {exc}"}
            print(f"# {name}: FAILED {results[name]['error']}", file=sys.stderr)
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)
    try:
        results["hourly_counts_8batch_latency"] = batch_latency_probe(spark, sf_dir)
        print(
            f"# hourly_counts_8batch_latency: {results['hourly_counts_8batch_latency']}",
            file=sys.stderr,
        )
    except Exception as exc:  # noqa: BLE001
        results["hourly_counts_8batch_latency"] = {
            "error": f"{type(exc).__name__}: {exc}"
        }
    try:
        results["kv_pyds_stream_ingest"] = kv_source_ingest_probe(spark, sf_dir)
        print(
            f"# kv_pyds_stream_ingest: {results['kv_pyds_stream_ingest']}",
            file=sys.stderr,
        )
    except Exception as exc:  # noqa: BLE001
        results["kv_pyds_stream_ingest"] = {"error": f"{type(exc).__name__}: {exc}"}
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "streaming_availablenow",
                "unit": "sec",
                "queries": results,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
