"""Streaming and multimodal pipeline queries — first-class registry
entries for the non-batch-relational modules.

Streaming queries execute a real Structured Streaming graph (readStream →
watermark → windowed/session agg → memory sink, availableNow trigger) and
return the sink table; because one availableNow pass over a static input
must equal the batch computation, the *batch* oracle SQL checks the
*streaming* result — the strongest correctness statement available for a
stream.

Multimodal queries run the blob plumbing end-to-end (binary column +
typed metadata struct → Arrow-batched mapInPandas decode / feature
extraction → downstream relational or similarity ops).  The codec seam is
deterministic-stub by design (no image libs in this environment, see
uda_spark/multimodal/blob.py), and sha512/crc32 are not expressible in
the oracle dialect, so these are rows-only checks; their numeric
properties are asserted in tests/test_multimodal.py instead.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uda_spark import multimodal as MM
from uda_spark import streaming as ST
from uda_spark.queries.common import t
from uda_spark.queries.events import _DUCK_US, SESSION_GAP_S
from uda_spark.registry import register

_SINK_IDS = itertools.count()


def _sink_name(prefix: str) -> str:
    return f"{prefix}_{next(_SINK_IDS)}"


@register(
    "streaming_hourly_rollup",
    oracle=f"""
SELECT ({_DUCK_US} // 3600000000) * 3600 AS bucket_epoch,
       event_type,
       COUNT(*)::BIGINT AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("streaming", "window", "aggregation"),
)
def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed counts over the event *stream* — executed
    as a real streaming query (watermarked state store, availableNow) and
    checked against the batch SQL oracle.

    Scale shape: state is O(open windows × types); the watermark closes
    and evicts windows 2 h behind the max event time, so an unbounded
    stream runs in bounded memory.
    """
    ev = ST.events_file_stream(spark, sf_dir)
    result = ST.hourly_counts_stream(ev)
    return ST.run_stream_to_memory(result, _sink_name("hourly_sink"))


@register(
    "streaming_sessionize",
    oracle=f"""
WITH base AS (
  SELECT user_id, event_id, {_DUCK_US} AS ts_us FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w >= {SESSION_GAP_S} * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, ts_us,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       COUNT(*)::BIGINT AS n_events,
       min(ts_us) // 1000000 AS session_start,
       max(ts_us) // 1000000 AS session_end
FROM sess GROUP BY user_id, session_id
""",
    tags=("streaming", "session", "window"),
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-min gap) over the event stream,
    checked against the batch gap-sessionization oracle.

    Note the boundary rule: ``session_window`` starts a new session when
    the gap is >= the gap duration (window end is exclusive), so the
    oracle uses >= — the batch events_sessionize query documents the
    strict-> variant of the same rule.
    """
    ev = ST.events_file_stream(spark, sf_dir)
    result = ST.sessionize_stream(ev, gap_seconds=SESSION_GAP_S)
    return ST.run_stream_to_memory(result, _sink_name("session_sink"))


@register(
    "streaming_running_totals",
    oracle=None,
    tags=("streaming", "stateful"),
)
def streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    (count, value-total) across triggers — the arbitrary-state escape
    hatch for operators session/tumbling windows can't express.  Float
    accumulation order inside the state update is partition-dependent, so
    this is a rows-only check; exact totals are covered by the batch
    aggregate tests.
    """
    from uda_spark.streaming.stateful import running_totals_stream

    ev = ST.events_file_stream(spark, sf_dir)
    result = running_totals_stream(ev)
    return ST.run_stream_to_memory(
        result, _sink_name("running_sink"), mode="update"
    )


@register(
    "multimodal_decode_stats",
    oracle=None,
    tags=("multimodal", "north-star"),
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob decode pipeline: documents → synthesized binary blobs + typed
    metadata → Arrow-batched mapInPandas decode → per-dimension-bucket
    stats.  Map-only until the final tiny aggregation; blobs never shuffle.
    """
    docs = t(spark, sf_dir, "documents")
    blobs = MM.attach_blob_column(docs, "text", "doc_id")
    decoded = MM.decode_images(blobs, id_col="doc_id")
    return (
        decoded.groupBy((F.col("width") % 16).alias("width_bucket"))
        .agg(
            F.count("*").alias("n_images"),
            F.sum(F.col("width").cast("long") * F.col("height")).alias("total_pixels"),
            F.countDistinct("pixels_crc").alias("distinct_payloads"),
        )
    )


@register(
    "multimodal_feature_knn",
    oracle=None,
    tags=("multimodal", "similarity", "north-star"),
)
def multimodal_feature_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal similarity: blobs → feature vectors (stubbed
    vision encoder via mapInPandas) → exact cosine top-3 neighbors for the
    first 10 items.  Demonstrates the binary-column → embedding-column →
    similarity-operator composition on real Spark plumbing.
    """
    from uda_spark.operators import similarity as SIM

    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    blobs = MM.attach_blob_column(docs, "text", "doc_id")
    feats = MM.extract_features(blobs, id_col="doc_id").select(
        F.col("id").alias("doc_id"), "embedding"
    )
    queries = feats.where(F.col("doc_id") < 10)
    return SIM.knn_bruteforce(feats, queries, "doc_id", "embedding", top_k=3)


@register(
    "streaming_distinct_users",
    oracle="SELECT DISTINCT user_id FROM events",
    tags=("streaming", "dedup"),
)
def streaming_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: dropDuplicates over the event stream —
    first arrival wins, later duplicates are suppressed by keyed state.
    The emitted SET is order-independent, so the batch DISTINCT oracle
    checks it exactly.  Production streams bound the dedup state with
    dropDuplicatesWithinWatermark; one availableNow pass has no late
    data, so the unbounded variant is exact here.
    """
    ev = ST.events_file_stream(spark, sf_dir)
    result = ev.select("user_id").dropDuplicates(["user_id"])
    return ST.run_stream_to_memory(result, _sink_name("distinct_sink"), mode="append")


@register(
    "streaming_stream_stream_join",
    oracle=f"""
WITH purchases AS (
  SELECT event_id AS purchase_id, user_id, {_DUCK_US} AS p_ts_us
  FROM events WHERE event_type = 'purchase'
),
signups AS (
  SELECT event_id AS signup_id, user_id, {_DUCK_US} AS s_ts_us
  FROM events WHERE event_type = 'signup'
)
SELECT p.purchase_id, p.user_id, s.signup_id,
       (p.p_ts_us - s.s_ts_us) // 1000000 AS lag_seconds
FROM purchases p JOIN signups s
  ON p.user_id = s.user_id
 AND s.s_ts_us <= p.p_ts_us
 AND p.p_ts_us <= s.s_ts_us + 3600000000::BIGINT
""",
    tags=("streaming", "join"),
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks on both sides and a
    time-bounded condition (purchases × signups of the same user within
    the preceding hour) — state on both sides is expirable, the required
    shape for unbounded streams.  One availableNow pass equals the batch
    range join, which is the oracle.
    """
    ev1 = ST.events_file_stream(spark, sf_dir)
    ev2 = ST.events_file_stream(spark, sf_dir)
    result = ST.purchase_after_signup_stream(ev1, ev2, window_s=3600)
    return ST.run_stream_to_memory(result, _sink_name("ssj_sink"), mode="append")
