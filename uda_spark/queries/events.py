"""Event-stream (time-series) queries: tumbling windows, sessionization,
as-of join, semi-structured extraction.  Batch formulations; the streaming
module mirrors the same semantics with watermarks.

Timestamp discipline: the events table's ``ts`` column has shipped in two
physical layouts (int64 nanoseconds, parquet ``timestamp[us]``), so both
engines normalize to exact BIGINT *microseconds* before any time logic:
Spark via the schema-adaptive ``sources.tables.event_micros`` and DuckDB
via ``epoch_us(ts)`` (exact for both layouts).  All derived times are
integer arithmetic — no floating-point epoch, no precision skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from uda_spark.operators import join as J
from uda_spark.operators import window as W
from uda_spark.queries.common import t
from uda_spark.registry import register

SESSION_GAP_S = 1800

# exact microsecond accessor, oracle side (Spark side is schema-adaptive:
# sources.tables.event_micros)
_DUCK_US = "epoch_us(ts)"


def _with_us(ev: DataFrame) -> DataFrame:
    from uda_spark.sources.tables import event_micros

    return ev.withColumn("ts_us", event_micros(ev))


@register(
    "events_hourly_rollup",
    oracle=f"""
SELECT ({_DUCK_US} // 3600000000) * 3600 AS bucket_epoch,
       event_type,
       COUNT(*)::BIGINT AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("events", "window", "aggregation"),
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation (batch twin of the streaming
    version).  Group key is tiny; shuffle is O(buckets × types)."""
    ev = _with_us(t(spark, sf_dir, "events"))
    return ev.groupBy(
        F.expr("(ts_us div 3600000000) * 3600").alias("bucket_epoch"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


@register(
    "events_daily_from_hourly",
    oracle=f"""
SELECT ((epoch_us(ts) // 3600000000) * 3600 // 86400) * 86400 AS day_epoch,
       event_type,
       COUNT(*)::BIGINT AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("events", "rollup", "aggregation"),
)
def events_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup: the DAILY aggregate is computed FROM the
    hourly partials, not from raw events — the continuous-aggregate
    pattern (hypertable-style): at 100 TB the hourly layer is
    materialized once and every coarser granularity re-aggregates
    O(buckets) rows instead of re-scanning the fact.

    Exactness caveat: the hourly layer emits total_value as DOUBLE, so
    the decimal recast here is exact only while each hourly sum's cents
    fit a double's 53-bit mantissa (~$90 trillion/bucket — ample here; a
    production continuous aggregate stores the DECIMAL partial itself).
    Within that range the oracle can aggregate straight from raw events
    and still hash-match.
    """
    hourly = events_hourly_rollup(spark, sf_dir)
    return (
        hourly.groupBy(
            F.expr("(bucket_epoch div 86400) * 86400").alias("day_epoch"), "event_type"
        )
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum(F.col("total_value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


@register(
    "events_sessionize",
    oracle=f"""
WITH base AS (
  SELECT user_id, event_id, {_DUCK_US} AS ts_us FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_S} * 1000000
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
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*)::BIGINT AS n_events,
       min(ts_us) // 1000000 AS session_start,
       max(ts_us) // 1000000 AS session_end
FROM sess GROUP BY user_id, session_id
""",
    tags=("events", "window", "session"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) + per-session stats.

    One exchange on user_id, ordered passes within — the scalable batch
    sessionization shape; ties broken by event_id for determinism.
    """
    ev = _with_us(t(spark, sf_dir, "events")).select("user_id", "event_id", "ts_us")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    new_s = F.when(prev.isNull() | ((F.col("ts_us") - prev) > SESSION_GAP_S * 1_000_000), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.expr("min(ts_us) div 1000000").alias("session_start"),
        F.expr("max(ts_us) div 1000000").alias("session_end"),
    )


@register(
    "events_asof_signup",
    oracle=f"""
WITH signups AS (
  SELECT user_id, {_DUCK_US} AS ts_us, max(event_id) AS signup_event_id
  FROM events WHERE event_type = 'signup'
  GROUP BY user_id, ts_us
),
purchases AS (
  SELECT event_id, user_id, {_DUCK_US} AS ts_us FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id,
       p.ts_us // 1000000 AS purchase_epoch,
       s.signup_event_id AS asof_signup_event_id,
       (p.ts_us - s.ts_us) // 1000000 AS seconds_since_signup
FROM purchases p ASOF JOIN signups s
  ON p.user_id = s.user_id AND p.ts_us >= s.ts_us
""",
    tags=("events", "join", "asof"),
)
def events_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior signup.

    Spark lacks a native as-of join; ours is the union + ordered-window
    carry-forward (operators/join.py) — one exchange, linear scaling.
    The right side is deduped per (user, ts) so ties are deterministic.
    """
    ev = _with_us(t(spark, sf_dir, "events"))
    signups = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("signup_event_id"))
        .withColumnRenamed("ts_us", "signup_ts_us")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    joined = J.asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="ts_us",
        right_ts="signup_ts_us",
        right_values=["signup_event_id", "signup_ts_us"],
    )
    return joined.where(F.col("asof_signup_event_id").isNotNull()).select(
        "event_id",
        "user_id",
        F.expr("ts_us div 1000000").alias("purchase_epoch"),
        "asof_signup_event_id",
        F.expr("(ts_us - asof_signup_ts_us) div 1000000").alias("seconds_since_signup"),
    )


@register(
    "events_props_extract",
    oracle=r"""
SELECT event_type,
       COUNT(*)::BIGINT AS n_events,
       SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT))::BIGINT AS sum_k,
       MAX(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT))::BIGINT AS max_k
FROM events
GROUP BY event_type
""",
    tags=("events", "scalar", "json"),
)
def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props extraction (regex — RE2-compatible in both
    engines) + aggregation; integer sums are engine-exact."""
    ev = t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "events_user_activity",
    oracle=f"""
WITH base AS (
  SELECT user_id, event_id, {_DUCK_US} AS ts_us FROM events
),
sess AS (
  SELECT user_id, ts_us,
         CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
                OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                   > {SESSION_GAP_S} * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM base
)
SELECT user_id,
       COUNT(*)::BIGINT AS n_events,
       CAST(SUM(new_s) AS BIGINT) AS n_sessions,
       (max(ts_us) - min(ts_us)) // 1000000 AS active_span_s
FROM sess GROUP BY user_id
""",
    tags=("events", "window", "aggregation"),
)
def events_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity profile built on the sessionize operator."""
    ev = _with_us(t(spark, sf_dir, "events")).select("user_id", "event_id", "ts_us")
    sess = W.sessionize(ev, "user_id", "ts_us", SESSION_GAP_S * 1_000_000)
    return sess.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max("session_id").cast("long").alias("n_sessions"),
        F.expr("(max(ts_us) - min(ts_us)) div 1000000").alias("active_span_s"),
    )


@register(
    "events_gap_fill",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, {_DUCK_US} // 3600000000 AS h,
         COUNT(*)::BIGINT AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM hourly),
spine AS (
  SELECT t.event_type, unnest(generate_series(b.lo, b.hi)) AS h
  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN bounds b
),
joined AS (
  SELECT s.event_type, s.h, hourly.n, hourly.cents
  FROM spine s LEFT JOIN hourly ON s.event_type = hourly.event_type AND s.h = hourly.h
),
grouped AS (
  SELECT *, COUNT(cents) OVER (PARTITION BY event_type ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM joined
)
SELECT event_type, h * 3600 AS hour_epoch,
       COALESCE(n, 0)::BIGINT AS n_events,
       MAX(cents) OVER (PARTITION BY event_type, grp) AS locf_cents
FROM grouped
""",
    tags=("events", "window", "timeseries"),
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: a dense hourly spine per event type (every
    hour between the corpus min and max), missing hours filled with
    count 0 and the value total carried forward (LOCF — the
    hypertable/continuous-aggregate interpolation shape).

    LOCF uses the portable count-over/max-per-group trick (COUNT skips
    NULLs, so each observation opens a group) instead of IGNORE NULLS,
    which not every engine spells identically.  Totals are integer cents
    — exact in both engines.  Scale: the spine is |types| × |hours| rows
    (tiny relative to events); one exchange for the hourly rollup, one
    broadcast-able spine join, one window per type.
    """
    ev = _with_us(t(spark, sf_dir, "events"))
    hourly = ev.groupBy(
        "event_type", F.expr("ts_us div 3600000000").alias("h")
    ).agg(
        F.count("*").alias("n"),
        F.expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS LONG)").alias("cents"),
    )
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.expr("sequence(lo, hi)")).alias("h")
    )
    joined = spine.join(hourly, on=["event_type", "h"], how="left")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = joined.withColumn("grp", F.count("cents").over(w_run))
    w_grp = Window.partitionBy("event_type", "grp")
    return grouped.select(
        "event_type",
        (F.col("h") * 3600).alias("hour_epoch"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.max("cents").over(w_grp).alias("locf_cents"),
    )


ASOF_TOLERANCE_S = 7 * 24 * 3600


@register(
    "events_asof_tolerance",
    oracle=f"""
WITH signups AS (
  SELECT user_id, {_DUCK_US} AS ts_us, max(event_id) AS signup_event_id
  FROM events WHERE event_type = 'signup'
  GROUP BY user_id, ts_us
),
purchases AS (
  SELECT event_id, user_id, {_DUCK_US} AS ts_us FROM events WHERE event_type = 'purchase'
),
matched AS (
  SELECT p.event_id, p.user_id,
         p.ts_us // 1000000 AS purchase_epoch,
         s.signup_event_id AS asof_signup_event_id,
         (p.ts_us - s.ts_us) // 1000000 AS seconds_since_signup
  FROM purchases p ASOF JOIN signups s
    ON p.user_id = s.user_id AND p.ts_us >= s.ts_us
)
SELECT * FROM matched WHERE seconds_since_signup <= {ASOF_TOLERANCE_S}
""",
    tags=("events", "join", "asof"),
)
def events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 7-day tolerance window: a purchase matches its
    latest prior signup only if it happened within the window.

    For an inner as-of join, tolerance ≡ post-filtering the nearest
    match (any other candidate is strictly farther), so the operator is
    the same union + carry-forward window with one extra predicate — no
    new shuffle.
    """
    base = events_asof_signup(spark, sf_dir)
    return base.where(F.col("seconds_since_signup") <= ASOF_TOLERANCE_S)


_DUCK_ASOF_CTES = f"""
signups AS (
  SELECT user_id, {_DUCK_US} AS ts_us, max(event_id) AS signup_event_id
  FROM events WHERE event_type = 'signup'
  GROUP BY user_id, ts_us
),
purchases AS (
  SELECT event_id, user_id, {_DUCK_US} AS ts_us FROM events WHERE event_type = 'purchase'
)"""


def _signups_purchases(spark: SparkSession, sf_dir: str):
    ev = _with_us(t(spark, sf_dir, "events"))
    signups = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("signup_event_id"))
        .withColumnRenamed("ts_us", "signup_ts_us")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    return signups, purchases


@register(
    "events_asof_forward",
    oracle=f"""
WITH {_DUCK_ASOF_CTES}
SELECT p.event_id, p.user_id,
       p.ts_us // 1000000 AS purchase_epoch,
       s.signup_event_id AS next_signup_event_id,
       (s.ts_us - p.ts_us) // 1000000 AS seconds_until_signup
FROM purchases p ASOF JOIN signups s
  ON p.user_id = s.user_id AND p.ts_us <= s.ts_us
""",
    tags=("events", "join", "asof"),
)
def events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each purchase matched to the user's EARLIEST
    signup at-or-after the purchase (operators/join.py direction='forward'
    — the leading-frame mirror of the carry-forward window; still one
    exchange on user_id)."""
    signups, purchases = _signups_purchases(spark, sf_dir)
    joined = J.asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="ts_us",
        right_ts="signup_ts_us",
        right_values=["signup_event_id", "signup_ts_us"],
        direction="forward",
    )
    return joined.where(F.col("asof_signup_event_id").isNotNull()).select(
        "event_id",
        "user_id",
        F.expr("ts_us div 1000000").alias("purchase_epoch"),
        F.col("asof_signup_event_id").alias("next_signup_event_id"),
        F.expr("(asof_signup_ts_us - ts_us) div 1000000").alias("seconds_until_signup"),
    )


@register(
    "events_asof_nearest",
    oracle=f"""
WITH {_DUCK_ASOF_CTES},
b AS (
  SELECT p.event_id, p.user_id, p.ts_us,
         s.signup_event_id AS b_id, s.ts_us AS b_ts
  FROM purchases p ASOF LEFT JOIN signups s
    ON p.user_id = s.user_id AND p.ts_us >= s.ts_us
),
f AS (
  SELECT p.event_id, s.signup_event_id AS f_id, s.ts_us AS f_ts
  FROM purchases p ASOF LEFT JOIN signups s
    ON p.user_id = s.user_id AND p.ts_us <= s.ts_us
),
pick AS (
  SELECT b.event_id, b.user_id, b.ts_us,
         CASE WHEN b_id IS NULL THEN f_id
              WHEN f_id IS NULL THEN b_id
              WHEN (b.ts_us - b_ts) <= (f_ts - b.ts_us) THEN b_id
              ELSE f_id END AS nearest_signup_event_id,
         CASE WHEN b_id IS NULL THEN f_ts - b.ts_us
              WHEN f_id IS NULL THEN b.ts_us - b_ts
              WHEN (b.ts_us - b_ts) <= (f_ts - b.ts_us) THEN b.ts_us - b_ts
              ELSE f_ts - b.ts_us END AS dist_us
  FROM b JOIN f USING (event_id)
)
SELECT event_id, user_id, ts_us // 1000000 AS purchase_epoch,
       nearest_signup_event_id, dist_us // 1000000 AS seconds_to_signup
FROM pick WHERE nearest_signup_event_id IS NOT NULL
""",
    tags=("events", "join", "asof"),
)
def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: each purchase matched to the signup closest in
    time, either direction; exact ties resolve backward (pandas
    merge_asof semantics).  Still one exchange on user_id — the nearest
    pick compares the backward and forward window results in place."""
    signups, purchases = _signups_purchases(spark, sf_dir)
    joined = J.asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="ts_us",
        right_ts="signup_ts_us",
        right_values=["signup_event_id", "signup_ts_us"],
        direction="nearest",
    )
    return joined.where(F.col("asof_signup_event_id").isNotNull()).select(
        "event_id",
        "user_id",
        F.expr("ts_us div 1000000").alias("purchase_epoch"),
        F.col("asof_signup_event_id").alias("nearest_signup_event_id"),
        F.expr("abs(asof_signup_ts_us - ts_us) div 1000000").alias("seconds_to_signup"),
    )


@register(
    "events_props_variant",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS distinct_k,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT) % 97) AS BIGINT) AS sum_k_mod
FROM events
GROUP BY event_type
""",
    tags=("events", "variant", "json"),
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via the VARIANT type: props parsed ONCE
    into a variant, fields read with typed variant_get — the
    shred-at-read path for JSON at scale (parse cost paid once per row,
    not once per extraction; Parquet variant shredding materializes
    common paths columnar).  Integer aggregates keep the oracle exact
    (DuckDB reads the same values with json_extract).
    """
    ev = t(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k")
    )
    return v.groupBy("event_type").agg(
        F.countDistinct("k").alias("distinct_k"),
        F.sum(F.col("k") % 97).alias("sum_k_mod"),
    )


_SCD2_W = "PARTITION BY user_id ORDER BY ts_us, event_id"


@register(
    "events_scd2_user_type",
    oracle=f"""
WITH e AS (SELECT user_id, event_id, {_DUCK_US} AS ts_us, event_type FROM events),
ch AS (
  SELECT * FROM (
    SELECT user_id, event_id, ts_us, event_type,
           LAG(event_type) OVER ({_SCD2_W}) AS prev
    FROM e
  ) WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type AS attr, ts_us AS valid_from_us,
       LEAD(ts_us) OVER ({_SCD2_W}) AS valid_to_us,
       CAST(ROW_NUMBER() OVER ({_SCD2_W}) AS INT) AS version,
       (LEAD(ts_us) OVER ({_SCD2_W}) IS NULL) AS is_current
FROM ch
""",
    tags=("events", "scd", "window"),
)
def events_scd2_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: collapse each user's event
    stream into attribute versions with [valid_from, valid_to) validity
    intervals and an is_current flag — the warehouse dimension-history
    operator, derived from a change stream with two window passes.

    Scale: both passes share one (user_id)-partitioned sort — Catalyst
    plans a single exchange; per-user state is the window frame, never
    driver-side.  Run-length collapse happens before the second pass, so
    the interval assembly sees only change rows (~|versions|, not
    |events|).
    """
    ev = _with_us(t(spark, sf_dir, "events")).select(
        "user_id", "event_id", "ts_us", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ch = ev.withColumn("prev", F.lag("event_type").over(w)).where(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    return (
        ch.withColumn("valid_to_us", F.lead("ts_us").over(w))
        .withColumn("version", F.row_number().over(w).cast("int"))
        .select(
            "user_id",
            F.col("event_type").alias("attr"),
            F.col("ts_us").alias("valid_from_us"),
            "valid_to_us",
            "version",
            F.col("valid_to_us").isNull().alias("is_current"),
        )
    )


@register(
    "events_ewma_value",
    oracle=f"""
WITH e AS (SELECT user_id, {_DUCK_US} AS ts_us, event_id, value FROM events),
s AS (SELECT user_id, list(value ORDER BY ts_us, event_id) AS vs FROM e GROUP BY user_id)
SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
       round(list_reduce(vs, (acc, x) -> (x + 3 * acc) / 4), 6) AS ewma_value
FROM s
""",
    tags=("events", "timeseries", "fold"),
)
def events_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average (alpha = 1/4) of
    event values — an inherently sequential recurrence (s' = alpha*x +
    (1-alpha)*s) computed WITHOUT Python: collect each key's series into
    a time-ordered array and left-fold it with a codegen'd lambda
    (Spark ``aggregate`` == DuckDB ``list_reduce``, both fold left in
    array order).  alpha = 1/4 keeps every intermediate an exact binary
    operation, so the fold is bit-identical across engines.

    This is the per-key ordered-recursion pattern for anything a window
    function can't express (compound interest, state machines): one
    shuffle on the key, per-key state bounded by that key's row count —
    the same bound sessionization already carries.
    """
    ev = _with_us(t(spark, sf_dir, "events")).select(
        "user_id", "ts_us", "event_id", "value"
    )
    fold = (
        "round(aggregate(slice(vs, 2, size(vs) - 1), "
        "CAST(element_at(vs, 1) AS DOUBLE), "
        "(acc, x) -> (x + 3 * acc) / 4), 6)"
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(ts_us, event_id, value))), "
                "e -> e.value)"
            ).alias("vs")
        )
        .select(
            "user_id",
            F.size("vs").cast("long").alias("n_events"),
            F.expr(fold).alias("ewma_value"),
        )
    )


FUNNEL_STEPS = ("signup", "view", "click", "purchase")


@register(
    "events_funnel_steps",
    oracle=f"""
WITH e AS (SELECT user_id, {_DUCK_US} AS ts_us, event_type FROM events),
s1 AS (SELECT user_id, MIN(ts_us) AS t FROM e WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.ts_us) AS t FROM e JOIN s1 ON e.user_id = s1.user_id
       AND e.ts_us > s1.t WHERE e.event_type = 'view' GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts_us) AS t FROM e JOIN s2 ON e.user_id = s2.user_id
       AND e.ts_us > s2.t WHERE e.event_type = 'click' GROUP BY e.user_id),
s4 AS (SELECT e.user_id, MIN(e.ts_us) AS t FROM e JOIN s3 ON e.user_id = s3.user_id
       AND e.ts_us > s3.t WHERE e.event_type = 'purchase' GROUP BY e.user_id),
counts AS (
  SELECT CAST(1 AS INT) AS step, 'signup' AS step_name, COUNT(*)::BIGINT AS n_users FROM s1
  UNION ALL SELECT 2, 'view', COUNT(*)::BIGINT FROM s2
  UNION ALL SELECT 3, 'click', COUNT(*)::BIGINT FROM s3
  UNION ALL SELECT 4, 'purchase', COUNT(*)::BIGINT FROM s4
)
SELECT step, step_name, n_users,
       round(CAST(n_users AS DOUBLE) /
             MAX(CASE WHEN step = 1 THEN n_users END) OVER (), 6) AS conversion
FROM counts
""",
    tags=("events", "funnel", "join"),
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: users completing signup -> view -> click
    -> purchase IN ORDER, each step strictly after the previous step's
    first completion — the product-analytics sequence-match operator.

    ONE fact scan, ONE exchange: per-user step timestamps are folded
    from a (user_id)-grouped collect of only the funnel-typed events —
    each frontier is "min step-i timestamp strictly after frontier
    i-1", computed as chained array expressions in a single projection.
    Per-user state is bounded by that user's funnel-event count (the
    sessionization bound); the final counts are a 1-row aggregate
    unpivoted to step rows.  This replaces the naive per-step
    join-against-frontier plan, which re-scans the fact once per step.
    """
    ev = _with_us(t(spark, sf_dir, "events")).select("user_id", "ts_us", "event_type")
    per_user = (
        ev.where(F.col("event_type").isin(*FUNNEL_STEPS))
        .groupBy("user_id")
        .agg(F.collect_list(F.struct("ts_us", "event_type")).alias("evs"))
    )
    step_ts = "array_min(transform(filter(evs, e -> e.event_type = '{s}'), e -> e.ts_us))"
    after = (
        "array_min(filter(transform(filter(evs, e -> e.event_type = '{s}'), "
        "e -> e.ts_us), x -> x > {prev}))"
    )
    cols = per_user.withColumn("t1", F.expr(step_ts.format(s=FUNNEL_STEPS[0])))
    for i, s in enumerate(FUNNEL_STEPS[1:], 2):
        cols = cols.withColumn(f"t{i}", F.expr(after.format(s=s, prev=f"t{i - 1}")))
    one = cols.agg(
        *[
            F.count(f"t{i}").alias(f"n{i}")
            for i in range(1, len(FUNNEL_STEPS) + 1)
        ]
    )
    # conversion is computed on the single aggregate row BEFORE the
    # unpivot — no global window needed
    stack = ", ".join(
        f"{i}, '{s}', n{i}, round(CAST(n{i} AS DOUBLE) / n1, 6)"
        for i, s in enumerate(FUNNEL_STEPS, 1)
    )
    return one.select(
        F.expr(
            f"stack({len(FUNNEL_STEPS)}, {stack}) "
            "AS (step, step_name, n_users, conversion)"
        )
    ).select(
        F.col("step").cast("int").alias("step"), "step_name", "n_users", "conversion"
    )


@register(
    "events_concurrency_curve",
    oracle=f"""
WITH base AS (
  SELECT user_id, event_id, {_DUCK_US} AS ts_us FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_S} * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, ts_us,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
iv AS (
  SELECT user_id, session_id,
         min(ts_us) // 1000000 AS s, max(ts_us) // 1000000 AS e
  FROM sess GROUP BY user_id, session_id
),
hours AS (
  SELECT CAST(h AS BIGINT) * 3600 AS bucket_epoch
  FROM iv, LATERAL unnest(range(s // 3600, e // 3600 + 1)) u(h)
)
SELECT bucket_epoch, COUNT(*)::BIGINT AS n_active_sessions
FROM hours GROUP BY bucket_epoch
""",
    tags=("events", "session", "interval"),
)
def events_concurrency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrency curve: how many sessions are active in each hour —
    the interval-overlap aggregation (capacity planning, peak load).

    Built ON TOP of the sessionize output: each session interval
    explodes to its covered hour buckets (bounded by session duration,
    not corpus size) and a tiny (bucket) aggregate counts overlaps —
    the scalable alternative to an interval self-join, whose output
    would be quadratic in concurrent sessions.
    """
    sess = events_sessionize(spark, sf_dir)
    hours = sess.select(
        F.explode(
            F.expr("sequence(session_start div 3600, session_end div 3600)")
        ).alias("h")
    )
    return hours.groupBy((F.col("h") * 3600).alias("bucket_epoch")).agg(
        F.count("*").alias("n_active_sessions")
    )


@register(
    "events_user_entropy",
    oracle=f"""
WITH c AS (
  SELECT user_id, event_type, COUNT(*)::BIGINT AS n
  FROM events GROUP BY user_id, event_type
),
g AS (
  SELECT user_id, SUM(n)::BIGINT AS t, COUNT(*)::BIGINT AS k,
         list(n ORDER BY event_type) AS ns
  FROM c GROUP BY user_id
)
SELECT user_id, t AS n_events, k AS n_types,
       round(-list_sum(list_transform(ns,
         n -> (CAST(n AS DOUBLE) / t) * log2(CAST(n AS DOUBLE) / t))), 6)
         AS type_entropy_bits
FROM g
""",
    tags=("events", "scoring", "aggregation"),
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type Shannon entropy — the behavioral-diversity
    score (bots cluster at the extremes: single-type spam near 0 bits,
    uniform randomness near log2(|types|)).

    Exactness: counts stay integer; the entropy terms are doubles, so
    they are summed via an ORDERED fold over the type-sorted count
    array (the EWMA pattern) — a bare SUM's merge order varies with
    partitioning, and float addition order must never depend on the
    physical plan.
    """
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    g = c.groupBy("user_id").agg(
        F.sum("n").alias("t"),
        F.count("*").alias("k"),
        F.expr(
            "transform(array_sort(collect_list(struct(event_type, n))), e -> e.n)"
        ).alias("ns"),
    )
    ent = (
        "round(-aggregate(ns, CAST(0 AS DOUBLE), (acc, n) -> "
        "acc + (CAST(n AS DOUBLE) / t) * log2(CAST(n AS DOUBLE) / t)), 6)"
    )
    return g.select(
        "user_id",
        F.col("t").alias("n_events"),
        F.col("k").alias("n_types"),
        F.expr(ent).alias("type_entropy_bits"),
    )


@register(
    "events_dow_hour_heatmap",
    oracle=f"""
SELECT CAST((({_DUCK_US} // 86400000000) + 4) % 7 AS INT) AS dow,
       CAST(({_DUCK_US} // 3600000000) % 24 AS INT) AS hour_of_day,
       COUNT(*)::BIGINT AS n_events,
       CAST(SUM(user_id % 97) AS BIGINT) AS user_checksum
FROM events
GROUP BY 1, 2
""",
    tags=("events", "calendar", "aggregation"),
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity matrix (the ops-dashboard
    heatmap).  Calendar buckets derive from pure integer epoch
    arithmetic (1970-01-01 was a Thursday, hence the +4) — no timezone
    or calendar library in the data path, identical in both engines.
    One partial-aggregated exchange onto a 7×24 grid.
    """
    ev = _with_us(t(spark, sf_dir, "events"))
    return ev.groupBy(
        F.expr("CAST(((ts_us div 86400000000) + 4) % 7 AS INT)").alias("dow"),
        F.expr("CAST((ts_us div 3600000000) % 24 AS INT)").alias("hour_of_day"),
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("user_id") % 97).cast("long").alias("user_checksum"),
    )


@register(
    "events_interarrival_stats",
    oracle=f"""
WITH seq AS (
  SELECT user_id,
         {_DUCK_US} - LAG({_DUCK_US}) OVER (PARTITION BY user_id ORDER BY {_DUCK_US}, event_id)
           AS gap_us
  FROM events
)
SELECT user_id, COUNT(*)::BIGINT AS n_gaps,
       CAST(floor(quantile_cont(gap_us, 0.5) + CAST(1 AS DOUBLE) / 2) AS BIGINT) AS median_gap_us,
       CAST(floor(quantile_cont(gap_us, 0.9) + CAST(1 AS DOUBLE) / 2) AS BIGINT) AS p90_gap_us,
       MAX(gap_us) AS max_gap_us
FROM seq WHERE gap_us IS NOT NULL
GROUP BY user_id
""",
    tags=("events", "timeseries", "aggregation"),
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gap distribution (median/p90/max) — the
    traffic-shape metric behind rate limiting, bot detection, and
    session-gap tuning (the 30-minute sessionization gap should sit far
    above typical p90 gaps; this query is how you check).

    One (user_id) window pass emits integer microsecond gaps; exact
    interpolated percentiles on integers round deterministically via
    the floor(x + 1/2) trick (same discipline as
    percentile_order_values).
    """
    ev = _with_us(t(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(w)).where(
        F.col("gap_us").isNotNull()
    )
    return seq.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.expr(
            "CAST(floor(percentile(gap_us, CAST(1 AS DOUBLE)/2) + CAST(1 AS DOUBLE)/2) AS BIGINT)"
        ).alias("median_gap_us"),
        F.expr(
            "CAST(floor(percentile(gap_us, CAST(9 AS DOUBLE)/10) + CAST(1 AS DOUBLE)/2) AS BIGINT)"
        ).alias("p90_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


@register(
    "events_props_map_stats",
    oracle="""
WITH entries AS (
  SELECT k AS prop_key, json_extract_string(props, '$.' || k) AS val
  FROM events, LATERAL unnest(json_keys(props)) u(k)
)
SELECT prop_key,
       COUNT(*)::BIGINT AS n_rows,
       COUNT(DISTINCT val)::BIGINT AS n_distinct_values,
       CAST(SUM(CAST(val AS BIGINT)) AS BIGINT) AS sum_int_values
FROM entries GROUP BY prop_key
""",
    tags=("events", "map", "semi-structured"),
)
def events_props_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props parsed as a MAP column and exploded to
    (key, value) entries — the MapType surface (schema-free property
    bags where the key set is unknown at write time, unlike the typed
    variant_get path of events_props_variant).  Per-key statistics are
    the profiling step that decides which hot keys deserve shredding
    into real columns.

    Map parse + explode are one map-side pass; the aggregate is
    |distinct keys| groups.
    """
    ev = t(spark, sf_dir, "events")
    entries = ev.select(
        F.explode(F.expr("from_json(props, 'map<string,string>')")).alias(
            "prop_key", "val"
        )
    )
    return entries.groupBy("prop_key").agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("val").alias("n_distinct_values"),
        F.sum(F.col("val").cast("bigint")).alias("sum_int_values"),
    )


TRIGRAM_TOP = 15


@register(
    "events_top_trigrams",
    oracle=f"""
WITH seq AS (
  SELECT user_id, list(event_type ORDER BY {_DUCK_US}, event_id) AS types
  FROM events GROUP BY user_id
),
grams AS (
  SELECT array_to_string(list_slice(types, i, i + 2), '>') AS trigram
  FROM seq, LATERAL unnest(range(1, len(types) - 1)) u(i)
)
SELECT trigram, COUNT(*)::BIGINT AS n
FROM grams GROUP BY trigram
ORDER BY n DESC, trigram LIMIT {TRIGRAM_TOP}
""",
    tags=("events", "sequence", "aggregation"),
)
def events_top_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent 3-step behavior sequences — the n-gram idea applied
    to event streams (the third-order refinement of the Markov
    transition matrix): per-user type sequences are collected in time
    order, sliced into overlapping trigrams map-side, and counted.

    Per-user state is that user's event count (the sessionize bound);
    the trigram aggregate partial-reduces to |types|^3 groups at most.
    """
    ev = _with_us(t(spark, sf_dir, "events"))
    seq = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts_us, event_id, event_type))), "
            "e -> e.event_type)"
        ).alias("types")
    )
    grams = seq.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(types) - 2, 0)), "
                "i -> array_join(slice(types, i, 3), '>'))"
            )
        ).alias("trigram")
    )
    return (
        grams.groupBy("trigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "trigram")
        .limit(TRIGRAM_TOP)
    )


@register(
    "events_purchase_session_lookup",
    oracle=f"""
WITH base AS (
  SELECT user_id, event_id, event_type, {_DUCK_US} AS ts_us FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_S} * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, ts_us,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
iv AS (
  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         min(ts_us) AS s_us, max(ts_us) AS e_us, COUNT(*)::BIGINT AS session_events
  FROM sess GROUP BY user_id, session_id
)
SELECT p.event_id, p.user_id, iv.session_id, iv.session_events,
       (p.ts_us - iv.s_us) // 1000000 AS seconds_into_session
FROM base p JOIN iv ON p.user_id = iv.user_id
  AND p.ts_us BETWEEN iv.s_us AND iv.e_us
WHERE p.event_type = 'purchase'
""",
    tags=("events", "join", "interval"),
)
def events_purchase_session_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join: each purchase matched to its CONTAINING
    session (a data-derived interval dimension) — the enrichment join
    behind "which session produced this conversion".

    Mechanics: the session intervals per user are disjoint, so the
    containment join is an equi-join on user_id with a range residual —
    co-partitioned, no interval explosion, at most one match per
    purchase.  At scale the session relation is the already-shrunk
    sessionize output, not the fact.
    """
    ev = _with_us(t(spark, sf_dir, "events"))
    # exact-microsecond session intervals (the registered sessionize
    # query rounds its start/end to seconds for display; containment
    # needs the exact bounds)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    new_s = F.when(
        prev.isNull() | ((F.col("ts_us") - prev) > SESSION_GAP_S * 1_000_000), 1
    ).otherwise(0)
    sess = ev.select("user_id", "event_id", "ts_us").withColumn(
        "session_id",
        F.sum(new_s)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    iv = sess.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("s_us"),
        F.max("ts_us").alias("e_us"),
        F.count("*").alias("session_events"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    return (
        p.join(iv, on="user_id")
        .where(F.col("ts_us").between(F.col("s_us"), F.col("e_us")))
        .select(
            "event_id",
            "user_id",
            "session_id",
            "session_events",
            F.expr("(ts_us - s_us) div 1000000").alias("seconds_into_session"),
        )
    )


RAU_WINDOW_DAYS = 7
_DAY_US = 86400 * 1_000_000


@register(
    "events_rolling_active_users",
    oracle=f"""
WITH act AS (
  SELECT DISTINCT user_id, {_DUCK_US} // {_DAY_US} AS day FROM events
),
days AS (SELECT DISTINCT day FROM act),
contrib AS (
  SELECT a.user_id, a.day + o AS target_day
  FROM act a, LATERAL unnest(range(0, {RAU_WINDOW_DAYS})) u(o)
)
SELECT d.day::BIGINT AS day,
       COUNT(DISTINCT c.user_id)::BIGINT AS rolling_users,
       (SELECT COUNT(DISTINCT user_id) FROM act WHERE act.day = d.day)::BIGINT
         AS day_users
FROM days d JOIN contrib c ON c.target_day = d.day
GROUP BY d.day
""",
    tags=("events", "window", "analytics"),
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {RAU_WINDOW_DAYS}-day active users per day (the WAU
    product metric) — sliding-window DISTINCT, which no window function
    computes directly (COUNT(DISTINCT) OVER a frame is unsupported in
    both engines, and for good reason: naive per-frame distincts
    re-scan the window per row).

    The scalable formulation: distinct-reduce the fact to (user, day)
    once, then each activity day CONTRIBUTES itself to the next
    {RAU_WINDOW_DAYS} target days (a bounded explode — x7 rows of two
    integers), and one distinct-count per target day finishes it.  The
    shuffle carries (user, day) pairs only; window growth multiplies
    the tiny contribution relation, never the fact.  Per-day actives
    ride along for the WAU/DAU stickiness ratio.
    """
    from uda_spark.sources.tables import event_micros

    ev = t(spark, sf_dir, "events")
    act = (
        ev.withColumn("ts_us", event_micros(ev))
        .select("user_id", F.expr(f"ts_us div {_DAY_US}").alias("day"))
        .distinct()
    )
    days = act.select("day").distinct()
    contrib = act.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + (RAU_WINDOW_DAYS - 1))
        ).alias("target_day"),
    )
    rolled = (
        days.join(contrib, on=days["day"] == contrib["target_day"])
        .groupBy(days["day"].alias("day"))
        .agg(F.count_distinct("user_id").cast("long").alias("rolling_users"))
    )
    daily = act.groupBy("day").agg(
        F.count_distinct("user_id").cast("long").alias("day_users")
    )
    return rolled.join(daily, on="day").select(
        F.col("day").cast("long").alias("day"), "rolling_users", "day_users"
    )


@register(
    "events_scd2_temporal_join",
    oracle=f"""
WITH e AS (SELECT user_id, event_id, {_DUCK_US} AS ts_us, event_type FROM events),
ch AS (
  SELECT * FROM (
    SELECT user_id, event_id, ts_us, event_type,
           LAG(event_type) OVER ({_SCD2_W}) AS prev
    FROM e
  ) WHERE prev IS NULL OR prev <> event_type
),
dim AS (
  SELECT user_id, event_type AS attr, ts_us AS valid_from_us,
         LEAD(ts_us) OVER ({_SCD2_W}) AS valid_to_us,
         CAST(ROW_NUMBER() OVER ({_SCD2_W}) AS INT) AS version
  FROM ch
),
fact AS (
  SELECT user_id, event_id, {_DUCK_US} AS ts_us, value
  FROM events WHERE event_type = 'purchase'
),
joined AS (
  SELECT f.user_id, f.event_id, f.value, d.attr, d.version
  FROM fact f JOIN dim d
    ON f.user_id = d.user_id
   AND d.valid_from_us <= f.ts_us
   AND (d.valid_to_us IS NULL OR f.ts_us < d.valid_to_us)
)
SELECT attr,
       COUNT(*)::BIGINT AS n_purchases,
       COUNT(DISTINCT user_id)::BIGINT AS n_users,
       SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT))::BIGINT AS sum_value_micros,
       CAST(MAX(version) AS INT) AS max_version_seen
FROM joined GROUP BY attr
""",
    tags=("events", "scd", "join", "temporal"),
)
def events_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (SCD2) enrichment join: each purchase event joined to
    the dimension VERSION whose [valid_from, valid_to) interval covers
    the purchase time — the canonical warehouse "what was true when the
    fact happened" join (joining is_current instead silently rewrites
    history, the classic SCD mistake this operator exists to prevent).

    The validity intervals come from the same change-collapse build as
    `events_scd2_user_type`; the join is an equi join on user_id with
    the interval containment as residual conditions, so it co-partitions
    both sides on the user key and never degenerates to a cross
    product — per user, intervals are disjoint, so each purchase
    matches at most one version.

    Scale shape: dimension build = one (user_id) exchange + windows
    over change rows; the temporal join = one sort-merge join keyed
    user_id; value sums quantized to integer micros (exact,
    order-independent).
    """
    ev = _with_us(t(spark, sf_dir, "events")).select(
        "user_id", "event_id", "ts_us", "event_type", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ch = ev.withColumn("prev", F.lag("event_type").over(w)).where(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    dim = ch.select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("attr"),
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w).alias("valid_to_us"),
        F.row_number().over(w).cast("int").alias("version"),
    )
    fact = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_us", "value"
    )
    joined = fact.join(
        dim,
        (fact["user_id"] == dim["d_user"])
        & (dim["valid_from_us"] <= fact["ts_us"])
        & (dim["valid_to_us"].isNull() | (fact["ts_us"] < dim["valid_to_us"])),
    )
    return joined.groupBy("attr").agg(
        F.count("*").cast("long").alias("n_purchases"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.sum(F.floor(F.col("value") * 1000000 + 0.5).cast("long"))
        .cast("long")
        .alias("sum_value_micros"),
        F.max("version").cast("int").alias("max_version_seen"),
    )


BUSY_HOUR_MIN_EVENTS = 20
_HOUR_US = 3600 * 1_000_000


@register(
    "events_session_busy_overlap",
    oracle=f"""
WITH base AS (
  SELECT user_id, event_id, {_DUCK_US} AS ts_us FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_S} * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id,
         ts_us
  FROM flagged
),
iv AS (
  SELECT user_id, session_id,
         MIN(ts_us) // {_HOUR_US} AS h_start,
         MAX(ts_us) // {_HOUR_US} AS h_end
  FROM sess GROUP BY user_id, session_id
),
busy AS (
  SELECT {_DUCK_US} // {_HOUR_US} AS hour, COUNT(*)::BIGINT AS n
  FROM events GROUP BY 1 HAVING COUNT(*) >= {BUSY_HOUR_MIN_EVENTS}
),
covered AS (
  SELECT user_id, session_id, h_start + o AS hour
  FROM iv, LATERAL unnest(range(0, h_end - h_start + 1)) u(o)
),
hits AS (
  SELECT c.user_id, c.session_id, COUNT(*)::BIGINT AS n_busy_hours
  FROM covered c JOIN busy b ON b.hour = c.hour
  GROUP BY c.user_id, c.session_id
)
SELECT iv.user_id,
       COUNT(*)::BIGINT AS n_sessions,
       SUM(CASE WHEN h.n_busy_hours IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_sessions_in_busy,
       COALESCE(SUM(h.n_busy_hours), 0)::BIGINT AS total_busy_hours
FROM iv LEFT JOIN hits h
  ON h.user_id = iv.user_id AND h.session_id = iv.session_id
GROUP BY iv.user_id
""",
    tags=("events", "join", "interval"),
)
def events_session_busy_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join, interval x interval: user sessions (gap-
    based intervals) joined against system-wide BUSY HOURS (hours with
    >= {BUSY_HOUR_MIN_EVENTS} events — themselves hour-long intervals),
    answering "which of each user's sessions ran during load peaks".

    The join technique is the scalable one for range x range: each
    session EXPLODES into the hour buckets it covers (bounded fan-out —
    session length / hour + 1 rows of three integers), turning interval
    overlap into an equi join on the bucket key; no inequality-only
    join, no cross product, and the busy-hour relation is tiny and
    broadcastable.  Same bucketing family as `range_join_value_buckets`
    (numeric ranges) and the SCD2 temporal join (point-in-interval) —
    this completes the interval-join triple.

    Scale shape: sessionization = one (user_id) exchange; bucket
    explode is map-side; the overlap join broadcasts busy hours; final
    rollup keys on user_id (already co-partitioned).
    """
    from uda_spark.sources.tables import event_micros

    ev0 = t(spark, sf_dir, "events")
    ev = ev0.withColumn("ts_us", event_micros(ev0)).select(
        "user_id", "event_id", "ts_us"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_S * 1_000_000),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    iv = sess.groupBy("user_id", "session_id").agg(
        F.expr(f"min(ts_us) div {_HOUR_US}").alias("h_start"),
        F.expr(f"max(ts_us) div {_HOUR_US}").alias("h_end"),
    )
    busy = (
        ev.groupBy(F.expr(f"ts_us div {_HOUR_US}").alias("hour"))
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= BUSY_HOUR_MIN_EVENTS)
        .select("hour")
    )
    covered = iv.select(
        "user_id",
        "session_id",
        F.explode(F.sequence(F.col("h_start"), F.col("h_end"))).alias("hour"),
    )
    hits = (
        covered.join(F.broadcast(busy), on="hour")
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_busy_hours"))
    )
    return (
        iv.join(hits, on=["user_id", "session_id"], how="left")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("n_busy_hours").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_sessions_in_busy"),
            F.coalesce(F.sum("n_busy_hours"), F.lit(0))
            .cast("long")
            .alias("total_busy_hours"),
        )
    )


BOT_MIN_EVENTS = 40          # users below this are unclassifiable
BOT_REGULARITY_PPM = 400_000  # MAD(gap)/median(gap) below this => automated
BOT_ENTROPY_MILLIBITS = 1500  # type entropy below this => single-purpose


@register(
    "events_bot_score",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, event_type, {_DUCK_US} AS ts_us FROM events
),
gaps AS (
  SELECT user_id, ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS gap_us
  FROM e
),
g AS (SELECT user_id, gap_us FROM gaps WHERE gap_us IS NOT NULL),
granked AS (
  SELECT user_id, gap_us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY gap_us) AS rk,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM g
),
gmed AS (
  SELECT user_id, MAX(CASE WHEN rk = 1 + (n - 1) // 2 THEN gap_us END) AS med_gap
  FROM granked GROUP BY user_id
),
adev AS (
  SELECT g.user_id, abs(g.gap_us - m.med_gap) AS ad
  FROM g JOIN gmed m USING (user_id)
),
aranked AS (
  SELECT user_id, ad,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ad) AS rk,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM adev
),
gmad AS (
  SELECT user_id, MAX(CASE WHEN rk = 1 + (n - 1) // 2 THEN ad END) AS mad_gap
  FROM aranked GROUP BY user_id
),
tc AS (
  SELECT user_id, event_type, COUNT(*)::BIGINT AS c FROM e GROUP BY user_id, event_type
),
tot AS (SELECT user_id, SUM(c)::BIGINT AS n_events FROM tc GROUP BY user_id),
ent AS (
  SELECT tc.user_id,
         CAST(floor(SUM(-(CAST(tc.c AS DOUBLE) / t.n_events)
                         * log2(CAST(tc.c AS DOUBLE) / t.n_events)) * 1000 + 0.5)
              AS BIGINT) AS entropy_millibits
  FROM tc JOIN tot t USING (user_id) GROUP BY tc.user_id, t.n_events
)
SELECT t.user_id, t.n_events,
       CAST(m.med_gap AS BIGINT) AS med_gap_us,
       CAST(d.mad_gap AS BIGINT) AS mad_gap_us,
       CAST(d.mad_gap * 1000000 // m.med_gap AS BIGINT) AS regularity_ppm,
       e.entropy_millibits,
       (d.mad_gap * 1000000 // m.med_gap < {BOT_REGULARITY_PPM}
        OR e.entropy_millibits < {BOT_ENTROPY_MILLIBITS}) AS bot_suspect
FROM tot t
JOIN gmed m USING (user_id) JOIN gmad d USING (user_id) JOIN ent e USING (user_id)
WHERE t.n_events >= {BOT_MIN_EVENTS} AND m.med_gap > 0
""",
    tags=("events", "quality", "robust"),
)
def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation scoring per user — the abuse-filtering stage a
    training-data pipeline runs before user-generated content enters a
    corpus.  Two robust signals: interarrival REGULARITY (MAD of gaps
    over the median gap — scripted clients fire on timers, humans are
    bursty; a robust coefficient of variation that outlier gaps can't
    wash out) and behavioral ENTROPY (single-purpose scrapers do one
    thing; both thresholds are integer ppm/millibit constants).

    All statistics are exact order statistics or quantized
    deterministic doubles over exact integers, so the suspect SET —
    not just the scores — is engine-exact.

    Scale shape: everything keys on user_id and shares that exchange
    (gaps window, both ranking passes, type counts); no corpus-scale
    relation survives past the first aggregation.
    """
    from uda_spark.sources.tables import event_micros

    ev0 = t(spark, sf_dir, "events")
    e = ev0.withColumn("ts_us", event_micros(ev0)).select(
        "user_id", "event_id", "event_type", "ts_us"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    g = (
        e.withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(w))
        .where(F.col("gap_us").isNotNull())
        .select("user_id", "gap_us")
    )
    wg = Window.partitionBy("user_id").orderBy("gap_us")
    granked = g.select(
        "user_id",
        "gap_us",
        F.row_number().over(wg).alias("rk"),
        F.count("*").over(Window.partitionBy("user_id")).alias("n"),
    )
    gmed = granked.groupBy("user_id").agg(
        F.max(
            F.when(F.col("rk") == 1 + F.expr("(n - 1) div 2"), F.col("gap_us"))
        ).alias("med_gap")
    )
    adev = g.join(gmed, on="user_id").select(
        "user_id", F.abs(F.col("gap_us") - F.col("med_gap")).alias("ad")
    )
    wa = Window.partitionBy("user_id").orderBy("ad")
    aranked = adev.select(
        "user_id",
        "ad",
        F.row_number().over(wa).alias("rk"),
        F.count("*").over(Window.partitionBy("user_id")).alias("n"),
    )
    gmad = aranked.groupBy("user_id").agg(
        F.max(F.when(F.col("rk") == 1 + F.expr("(n - 1) div 2"), F.col("ad"))).alias(
            "mad_gap"
        )
    )
    tc = e.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    tot = tc.groupBy("user_id").agg(F.sum("c").alias("n_events"))
    ent = (
        tc.join(tot, on="user_id")
        .groupBy("user_id", "n_events")
        .agg(
            F.expr(
                "CAST(floor(sum(-(CAST(c AS DOUBLE) / n_events)"
                " * log2(CAST(c AS DOUBLE) / n_events)) * 1000 + 0.5) AS BIGINT)"
            ).alias("entropy_millibits")
        )
        .select("user_id", "entropy_millibits")
    )
    reg = F.expr("CAST(mad_gap * 1000000 div med_gap AS BIGINT)")
    return (
        tot.join(gmed, on="user_id")
        .join(gmad, on="user_id")
        .join(ent, on="user_id")
        .where((F.col("n_events") >= BOT_MIN_EVENTS) & (F.col("med_gap") > 0))
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("med_gap").cast("long").alias("med_gap_us"),
            F.col("mad_gap").cast("long").alias("mad_gap_us"),
            reg.alias("regularity_ppm"),
            "entropy_millibits",
            (
                (reg < BOT_REGULARITY_PPM)
                | (F.col("entropy_millibits") < BOT_ENTROPY_MILLIBITS)
            ).alias("bot_suspect"),
        )
    )


@register(
    "events_time_to_convert",
    oracle=f"""
WITH e AS (SELECT user_id, event_id, event_type, {_DUCK_US} AS ts_us FROM events),
first_signup AS (
  SELECT user_id, MIN(ts_us) AS s_us FROM e WHERE event_type = 'signup' GROUP BY user_id
),
first_purchase AS (
  SELECT e.user_id, MIN(e.ts_us) AS p_us
  FROM e JOIN first_signup f USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts_us >= f.s_us
  GROUP BY e.user_id
),
lat AS (
  SELECT f.user_id, p.p_us - f.s_us AS latency_us
  FROM first_signup f JOIN first_purchase p USING (user_id)
),
ranked AS (
  SELECT latency_us,
         ROW_NUMBER() OVER (ORDER BY latency_us, user_id) AS rk,
         COUNT(*) OVER () AS n
  FROM lat
)
SELECT (SELECT COUNT(*) FROM first_signup)::BIGINT AS n_signup_users,
       MAX(n)::BIGINT AS n_converted,
       CAST(MAX(n) * 1000000 // (SELECT COUNT(*) FROM first_signup) AS BIGINT)
         AS conversion_ppm,
       CAST(MAX(CASE WHEN rk = 1 + (n - 1) // 2 THEN latency_us END) // 1000000 AS BIGINT)
         AS median_latency_s,
       CAST(MAX(CASE WHEN rk = 1 + (9 * (n - 1)) // 10 THEN latency_us END) // 1000000 AS BIGINT)
         AS p90_latency_s
FROM ranked
""",
    tags=("events", "funnel", "analytics"),
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: latency from each user's FIRST
    signup to their first subsequent purchase, summarized as conversion
    rate plus exact median and p90 latency — the funnel-velocity metric
    that complements step counts (`events_funnel_steps` says how many
    convert; this says how long conversion takes, and the p90 tail is
    what an activation team actually works).

    Both latency cuts are exact nearest-lower order statistics over
    integer microseconds (reported in whole seconds by integer
    division); the conversion rate is integer ppm — one row out, every
    value engine-exact.

    Scale shape: two per-user MIN aggregates co-partitioned on
    user_id, a same-key join, then order statistics over the
    CONVERTED-users relation (users-sized, not events-sized) — ranked
    with the two-pass range-partitioned ``global_rank`` (round 8), so
    no single-partition window remains even at full user cardinality.
    """
    from uda_spark.sources.tables import event_micros

    ev0 = t(spark, sf_dir, "events")
    e = ev0.withColumn("ts_us", event_micros(ev0)).select(
        "user_id", "event_type", "ts_us"
    )
    fs = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("s_us"))
    )
    fp = (
        e.where(F.col("event_type") == "purchase")
        .join(fs, on="user_id")
        .where(F.col("ts_us") >= F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("p_us"))
    )
    lat = fs.join(fp, on="user_id").select(
        "user_id", (F.col("p_us") - F.col("s_us")).alias("latency_us")
    )
    from uda_spark.operators.sort import global_rank

    n_signup = fs.agg(F.count("*").alias("n_signup_users"))
    ranked0 = global_rank(lat, ["latency_us", "user_id"], alias="rk")
    nrow = ranked0.agg(F.count("*").alias("n"))
    ranked = ranked0.crossJoin(F.broadcast(nrow))
    summary = ranked.agg(
        F.max("n").cast("long").alias("n_converted"),
        F.expr(
            "CAST(max(CASE WHEN rk = 1 + (n - 1) div 2 THEN latency_us END)"
            " div 1000000 AS BIGINT)"
        ).alias("median_latency_s"),
        F.expr(
            "CAST(max(CASE WHEN rk = 1 + (9 * (n - 1)) div 10 THEN latency_us END)"
            " div 1000000 AS BIGINT)"
        ).alias("p90_latency_s"),
    )
    return (
        summary.crossJoin(F.broadcast(n_signup))
        .select(
            F.col("n_signup_users").cast("long").alias("n_signup_users"),
            "n_converted",
            F.expr("CAST(n_converted * 1000000 div n_signup_users AS BIGINT)").alias(
                "conversion_ppm"
            ),
            "median_latency_s",
            "p90_latency_s",
        )
    )


@register(
    "events_attribution_touchpoints",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_id, event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         {_DUCK_US} AS ts_us
  FROM events
),
attributed AS (
  SELECT user_id, event_type, cents,
         COALESCE(first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                              IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  '(direct)') AS first_touch,
         COALESCE(last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                             IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  '(direct)') AS last_touch
  FROM seq
),
purchases AS (SELECT * FROM attributed WHERE event_type = 'purchase')
SELECT channel,
       SUM(n_first)::BIGINT AS n_first,
       SUM(first_cents)::BIGINT AS first_touch_cents,
       SUM(n_last)::BIGINT AS n_last,
       SUM(last_cents)::BIGINT AS last_touch_cents
FROM (
  SELECT first_touch AS channel, 1 AS n_first, cents AS first_cents,
         0 AS n_last, 0 AS last_cents
  FROM purchases
  UNION ALL
  SELECT last_touch, 0, 0, 1, cents FROM purchases
) GROUP BY channel
""",
    tags=("events", "analytics", "north-star"),
)
def events_attribution_touchpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style conversion attribution: every purchase credits its
    user's FIRST preceding non-purchase event (first-touch) and LAST
    preceding one (last-touch); per-channel totals of both models side
    by side — the revenue-attribution report whose first/last split is
    the standard sanity check on a channel mix (a channel strong on
    first-touch but absent on last-touch acquires, one with the reverse
    closes).  Purchases with no preceding event fall into '(direct)'.

    Exactness: credits are integer cents; the preceding-touch choice is
    a deterministic IGNORE NULLS window frame ordered by exact
    microseconds with event_id tiebreak.

    Scale shape: ONE exchange keyed by user feeds both window passes
    (same partitioning, same ordering frame); the two attribution
    models then reduce over the purchases-only relation (tiny) via a
    2x-unioned rollup keyed by channel.
    """
    ev = _with_us(t(spark, sf_dir, "events"))
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("cents"),
        "ts_us",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    attributed = seq.select(
        "event_type",
        "cents",
        F.coalesce(F.first(touch, ignorenulls=True).over(w), F.lit("(direct)")).alias(
            "first_touch"
        ),
        F.coalesce(F.last(touch, ignorenulls=True).over(w), F.lit("(direct)")).alias(
            "last_touch"
        ),
    )
    purchases = attributed.where(F.col("event_type") == "purchase")
    first_side = purchases.select(
        F.col("first_touch").alias("channel"),
        F.lit(1).alias("n_first"),
        F.col("cents").alias("first_cents"),
        F.lit(0).alias("n_last"),
        F.lit(0).alias("last_cents"),
    )
    last_side = purchases.select(
        F.col("last_touch").alias("channel"),
        F.lit(0).alias("n_first"),
        F.lit(0).alias("first_cents"),
        F.lit(1).alias("n_last"),
        F.col("cents").alias("last_cents"),
    )
    return first_side.unionByName(last_side).groupBy("channel").agg(
        F.sum("n_first").cast("long").alias("n_first"),
        F.sum("first_cents").cast("long").alias("first_touch_cents"),
        F.sum("n_last").cast("long").alias("n_last"),
        F.sum("last_cents").cast("long").alias("last_touch_cents"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation of the daily event-count series

ACF_MAX_LAG = 7


@register(
    "events_acf_daily",
    oracle=f"""
WITH daily AS (
  SELECT {_DUCK_US} // {_DAY_US} AS day, COUNT(*)::BIGINT AS x
  FROM events GROUP BY 1
),
tot AS (SELECT COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS s FROM daily),
den AS (
  SELECT SUM((tot.n::HUGEINT * x - tot.s) * (tot.n::HUGEINT * x - tot.s))::HUGEINT AS d
  FROM daily, tot
),
pairs AS (
  SELECT b.day - a.day AS lag,
         COUNT(*)::BIGINT AS n_pairs,
         SUM((tot.n::HUGEINT * a.x - tot.s) * (tot.n::HUGEINT * b.x - tot.s))::HUGEINT AS num
  FROM daily a JOIN daily b ON b.day - a.day BETWEEN 1 AND {ACF_MAX_LAG}
  CROSS JOIN tot
  GROUP BY 1
)
SELECT CAST(lag AS INT) AS lag, n_pairs,
       CAST(CASE WHEN num >= 0 THEN (num * 1000000) // NULLIF(den.d, 0)
                 ELSE -((-num * 1000000) // NULLIF(den.d, 0)) END AS BIGINT) AS acf_ppm
FROM pairs, den ORDER BY lag
""",
    tags=("events", "timeseries", "statistics"),
)
def events_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-count series at lags
    1..7 — the seasonality/changepoint screen run before
    trusting any forecast (a strong lag-7 spike means weekly structure;
    all-lags-near-zero means the Holt/seasonality models are fitting
    noise).

    Exactness: the standard ACF r_h = Σ(x_t−m)(x_{{t+h}}−m) / Σ(x_t−m)²
    shares one denominator, so multiplying both sums by n² clears the
    rational mean m = S/n: numerator terms become (n·x_t − S)(n·x_{{t+h}}
    − S) — pure integers, carried in DECIMAL(38,0)/HUGEINT (n·x can
    reach ~4e11 at 100 TB; its square times the day count stays ~1e26,
    well inside 38 digits).  The final ppm division truncates toward
    zero via explicit sign decomposition, because DuckDB's `//` floors
    while Spark's `div` truncates — they disagree exactly when the
    numerator is negative, which a negative autocorrelation makes real.

    Scale shape: ONE pass over the fact builds the daily rollup (tiny:
    bounded by calendar days, not data volume, forever); it is persisted
    so the totals row, the denominator, and the lag self-join all read
    the O(days) relation instead of re-scanning events.  The lag join
    explodes each day into ACF_MAX_LAG=7 (day+h) probes — an equi-join
    on the broadcast-sized daily relation — and every aggregate
    downstream is O(days).
    """
    from uda_spark.cache import tracked_persist

    ev = _with_us(t(spark, sf_dir, "events"))
    daily = tracked_persist(
        ev.groupBy(F.expr(f"ts_us div {_DAY_US}").alias("day")).agg(
            F.count("*").alias("x")
        )
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("s")
    )
    dev = "(CAST(n AS DECIMAL(38,0)) * {x} - s)"
    den = (
        daily.crossJoin(F.broadcast(tot))
        .agg(F.expr(f"SUM({dev.format(x='x')} * {dev.format(x='x')})").alias("d"))
    )
    probes = daily.select(
        F.explode(F.expr(f"sequence(day + 1, day + {ACF_MAX_LAG})")).alias("day"),
        F.col("day").alias("a_day"),
        F.col("x").alias("a_x"),
    )
    pairs = (
        probes.join(daily, on="day")
        .crossJoin(F.broadcast(tot))
        .groupBy((F.col("day") - F.col("a_day")).cast("int").alias("lag"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.expr(f"SUM({dev.format(x='a_x')} * {dev.format(x='x')})").alias("num"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_pairs",
            F.expr(
                "CAST(CASE WHEN num >= 0 THEN (num * 1000000) div NULLIF(d, 0)"
                " ELSE -((-num * 1000000) div NULLIF(d, 0)) END AS BIGINT)"
            ).alias("acf_ppm"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# Pareto front (skyline) of users: spend vs activity

_PARETO_CENTS = (
    "SUM(CASE WHEN event_type = 'purchase' "
    "THEN CAST(COALESCE(CAST(value AS DECIMAL(18,2)), 0) * 100 AS BIGINT) "
    "ELSE 0 END)"
)


@register(
    "events_pareto_front",
    oracle=f"""
WITH u AS (
  SELECT user_id, {_PARETO_CENTS} AS score_cents, COUNT(*)::BIGINT AS n_events
  FROM events GROUP BY user_id
),
g AS (SELECT score_cents, MAX(n_events) AS best FROM u GROUP BY score_cents),
cm AS (
  SELECT score_cents, best,
         MAX(best) OVER (ORDER BY score_cents DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_higher
  FROM g
)
SELECT u.user_id, CAST(u.score_cents AS BIGINT) AS score_cents, u.n_events
FROM u JOIN cm USING (score_cents)
WHERE u.n_events = cm.best
  AND (cm.best_higher IS NULL OR u.n_events > cm.best_higher)
""",
    tags=("events", "analytics", "skyline"),
)
def events_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto front) of users on two maximize dimensions —
    purchase spend (exact cents) and event count: a user survives iff no
    other user is >= on both and strictly better on one.  The classic
    multi-criteria "best customers" readout, and the 2-D skyline
    operator the reference's relational surface lacks.

    Algorithm: the sort-based skyline — per-distinct-spend best activity,
    then an EXCLUSIVE running max over spend DESCENDING: a user is on
    the front iff they hold their spend level's best activity AND beat
    the best activity of every strictly-higher spend level.  Ties on
    both dimensions survive together (neither strictly dominates).

    Scale shape: spend is user-cardinality, so the running max uses
    :func:`uda_spark.operators.sort.global_cumulative_extreme` — the
    range-partitioned two-pass cumulative with O(partitions) collected
    extremes, never a single-partition ``ORDER BY score`` window.  One
    exchange to the per-user relation (persisted, reused by both the
    level rollup and the final join), one range exchange over the
    distinct-spend levels, one shuffle join back.  No pairwise
    dominance comparison ever happens — the naive skyline is O(n²).
    """
    from uda_spark.cache import tracked_persist
    from uda_spark.operators.sort import global_cumulative_extreme

    ev = t(spark, sf_dir, "events")
    u = tracked_persist(
        ev.groupBy("user_id").agg(
            F.expr(_PARETO_CENTS).alias("score_cents"),
            F.count("*").cast("long").alias("n_events"),
        )
    )
    g = (
        u.groupBy("score_cents")
        .agg(F.max("n_events").alias("best"))
        .withColumn("neg_score", -F.col("score_cents"))
    )
    cm = global_cumulative_extreme(g, ["neg_score"], "best", "best_higher", agg="max")
    return (
        u.join(cm.select("score_cents", "best", "best_higher"), on="score_cents")
        .where(
            (F.col("n_events") == F.col("best"))
            & (F.col("best_higher").isNull() | (F.col("n_events") > F.col("best_higher")))
        )
        .select("user_id", "score_cents", "n_events")
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test on the daily event-count series


@register(
    "events_trend_mk",
    oracle=f"""
WITH daily AS (
  SELECT {_DUCK_US} // {_DAY_US} AS day, COUNT(*)::BIGINT AS x
  FROM events GROUP BY 1
),
pairs AS (
  SELECT SUM(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)::BIGINT AS s,
         COUNT(*)::BIGINT AS n_pairs
  FROM daily a JOIN daily b ON b.day > a.day
),
n AS (SELECT COUNT(*)::BIGINT AS n_days FROM daily)
SELECT n.n_days, pairs.s AS mk_s, pairs.n_pairs,
       CAST(CASE WHEN pairs.s >= 0 THEN (pairs.s::HUGEINT * 1000000) // pairs.n_pairs
                 ELSE -((-pairs.s::HUGEINT * 1000000) // pairs.n_pairs)
            END AS BIGINT) AS tau_ppm
FROM n, pairs
""",
    tags=("events", "timeseries", "statistics"),
)
def events_trend_mk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend statistic on the daily event-count series —
    the distribution-free monotone-trend screen (is traffic structurally
    growing or decaying, independent of its distribution?): S = Σ_{{i<j}}
    sign(x_j − x_i) over all day pairs, with Kendall's tau-a = S /
    (n(n−1)/2) as integer ppm (sign-decomposed division — S goes
    negative for decaying series, and DuckDB floors where Spark
    truncates).

    Complement to :func:`events_acf_daily` (which measures periodic
    structure; this measures monotone drift) and to the parametric
    Holt/OLS fits (this one is rank-based, immune to spikes).

    Scale shape: one pass over the fact to the persisted daily rollup —
    bounded by calendar days, not data volume — then the all-pairs
    comparison is O(days²) on that tiny relation (a 10-year series is
    ~6.7M sign evaluations, one broadcast join task group); every
    aggregate downstream is a single bounded row.  The fact is never
    self-joined.
    """
    from uda_spark.cache import tracked_persist

    ev = _with_us(t(spark, sf_dir, "events"))
    daily = tracked_persist(
        ev.groupBy(F.expr(f"ts_us div {_DAY_US}").alias("day")).agg(
            F.count("*").alias("x")
        )
    )
    b = daily.select(F.col("day").alias("b_day"), F.col("x").alias("b_x"))
    pairs = (
        daily.join(F.broadcast(b), F.col("b_day") > F.col("day"))
        .agg(
            F.sum(
                F.when(F.col("b_x") > F.col("x"), 1)
                .when(F.col("b_x") < F.col("x"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s"),
            F.count("*").cast("long").alias("n_pairs"),
        )
    )
    n = daily.agg(F.count("*").cast("long").alias("n_days"))
    return n.crossJoin(F.broadcast(pairs)).selectExpr(
        "n_days",
        "s AS mk_s",
        "n_pairs",
        "CAST(CASE WHEN s >= 0 THEN (CAST(s AS DECIMAL(38,0)) * 1000000) div n_pairs"
        " ELSE -((CAST(-s AS DECIMAL(38,0)) * 1000000) div n_pairs) END AS BIGINT)"
        " AS tau_ppm",
    )


# ---------------------------------------------------------------------------
# Burstiness (Fano factor) of each event stream's daily volume


@register(
    "events_burstiness_fano",
    oracle=f"""
WITH daily AS (
  SELECT event_type, {_DUCK_US} // {_DAY_US} AS day, COUNT(*)::BIGINT AS x
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, COUNT(*)::BIGINT AS n, SUM(x)::HUGEINT AS sx,
         SUM(x::HUGEINT * x)::HUGEINT AS sxx
  FROM daily GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days, CAST(sx AS BIGINT) AS n_events,
       CAST((n * sxx - sx * sx) * 1000000 // NULLIF((n - 1) * sx, 0) AS BIGINT)
         AS fano_ppm
FROM s
""",
    tags=("events", "timeseries", "statistics", "quality"),
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion) of each event stream's daily
    volume — variance-to-mean of the daily counts, the burstiness
    classifier: ≈1e6 ppm is Poisson-like arrivals, well above is bursty
    (campaign spikes, bot storms), well below is throttled/metronomic.
    The per-stream companion to the global CUSUM/trend screens.

    Exactness: F = s²/x̄ clears every division —
    (n·Σx² − (Σx)²)·1e6 div ((n−1)·Σx) — one exact integer expression
    in DECIMAL(38,0)/HUGEINT (numerator non-negative by Cauchy-Schwarz,
    so truncation needs no sign handling; NULL for single-day streams
    where the sample variance is undefined).

    Scale shape: one pass over the fact to the (stream, day) rollup —
    bounded by streams × calendar days — then one bounded aggregate per
    stream.  Nothing downstream ever touches the fact again.
    """
    ev = _with_us(t(spark, sf_dir, "events"))
    daily = ev.groupBy(
        "event_type", F.expr(f"ts_us div {_DAY_US}").alias("day")
    ).agg(F.count("*").alias("x"))
    s = daily.groupBy("event_type").agg(
        F.expr("COUNT(*)").alias("n"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)))").alias("sx"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)) * x)").alias("sxx"),
    )
    return s.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n_days",
        "CAST(sx AS BIGINT) AS n_events",
        "CAST((n * sxx - sx * sx) * 1000000 div NULLIF((n - 1) * sx, 0) AS BIGINT)"
        " AS fano_ppm",
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on daily up/down moves


@register(
    "events_runs_test",
    oracle=f"""
WITH daily AS (
  SELECT {_DUCK_US} // {_DAY_US} AS day, COUNT(*)::BIGINT AS x
  FROM events GROUP BY 1
),
moves AS (
  SELECT b.day,
         CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
  FROM daily a JOIN daily b ON b.day = a.day + 1
),
nz AS (SELECT day, sgn FROM moves WHERE sgn <> 0),
runs AS (
  SELECT SUM(CASE WHEN prev IS NULL OR sgn <> prev THEN 1 ELSE 0 END)::BIGINT AS n_runs,
         SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_up,
         SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)::BIGINT AS n_down
  FROM (SELECT sgn, LAG(sgn) OVER (ORDER BY day) AS prev FROM nz)
)
SELECT n_up, n_down, n_runs,
       CAST(((n_up + n_down) + 2 * n_up * n_down) * 1000
            // NULLIF(n_up + n_down, 0) AS BIGINT) AS expected_runs_milli
FROM runs
""",
    tags=("events", "timeseries", "statistics"),
)
def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily series' up/down moves — the
    randomness screen that complements Mann-Kendall: far FEWER runs than
    expected means momentum/trending, far MORE means oscillation
    (day-of-week sawtooth); ties (flat days) are dropped per the
    standard treatment.  Expected runs E[R] = 1 + 2ab/(a+b) is the
    exact integer rational ((a+b) + 2ab)/(a+b), reported in milli-units.

    Scale shape: one pass over the fact to the persisted daily rollup;
    moves are a lag-1 equi-join on the O(days) relation, and the runs
    count is one LAG window over the calendar-bounded move sequence —
    the same bounded-by-construction window class as the 10-row decile
    table (a century of days is 36k rows), explicitly NOT a
    data-volume-scaling window.
    """
    from uda_spark.cache import tracked_persist

    ev = _with_us(t(spark, sf_dir, "events"))
    daily = tracked_persist(
        ev.groupBy(F.expr(f"ts_us div {_DAY_US}").alias("day")).agg(
            F.count("*").alias("x")
        )
    )
    nxt = daily.select((F.col("day") - 1).alias("day"), F.col("x").alias("x_next"))
    moves = (
        daily.join(nxt, on="day")
        .select(
            (F.col("day") + 1).alias("day"),
            F.when(F.col("x_next") > F.col("x"), 1)
            .when(F.col("x_next") < F.col("x"), -1)
            .otherwise(0)
            .alias("sgn"),
        )
        .where(F.col("sgn") != 0)
    )
    w = Window.orderBy("day")
    flagged = moves.withColumn("prev", F.lag("sgn").over(w))
    return flagged.agg(
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0)).cast("long").alias("n_up"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0)).cast("long").alias("n_down"),
        F.sum(
            F.when(F.col("prev").isNull() | (F.col("sgn") != F.col("prev")), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_runs"),
    ).selectExpr(
        "n_up",
        "n_down",
        "n_runs",
        "CAST(((n_up + n_down) + 2 * n_up * n_down) * 1000"
        " div NULLIF(n_up + n_down, 0) AS BIGINT) AS expected_runs_milli",
    )


@register(
    "events_poisson_dispersion",
    oracle=f"""
WITH daily AS (
  SELECT {_DUCK_US} // {_DAY_US} AS day, COUNT(*)::BIGINT AS x
  FROM events GROUP BY 1
),
m AS (
  SELECT COUNT(*)::BIGINT AS d, SUM(x)::BIGINT AS s,
         SUM(x::HUGEINT * x) AS sxx
  FROM daily
)
SELECT d AS n_days, s AS n_events,
       CAST(s * 1000 // d AS BIGINT) AS mean_milli,
       CAST((d * sxx - s::HUGEINT * s) * 1000 // (d::HUGEINT * d)
            AS BIGINT) AS var_milli,
       CAST((d * sxx - s::HUGEINT * s) * 1000 // NULLIF(d::HUGEINT * s, 0)
            AS BIGINT) AS dispersion_milli
FROM m
""",
    tags=("events", "timeseries", "statistics"),
)
def events_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) of the daily event
    counts — the first screen for whether arrivals are Poisson-like
    (ratio ~ 1), clumped/bursty (>> 1, e.g. bot storms or batch
    ingestion) or over-regular (<< 1, e.g. rate-limited pipelines);
    companion to events_burstiness_fano's windowed view, here as a
    single exact whole-series statistic.  Population variance and mean
    come from the exact integer moments (D·Σx² − S²)/D² and S/D,
    reported in milli-units via integer division; Σx² and the moment
    products ride DECIMAL(38,0)/HUGEINT (daily counts at corpus scale
    put D·Σx² past int64).

    Scale shape: one partial-aggregated pass over the fact to the
    O(days) daily rollup, then a 1-row exact-moments aggregate — no
    window, no join, nothing driver-side.
    """
    ev = _with_us(t(spark, sf_dir, "events"))
    daily = ev.groupBy(F.expr(f"ts_us div {_DAY_US}").alias("day")).agg(
        F.count("*").alias("x")
    )
    m = daily.agg(
        F.count("*").cast("long").alias("d"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.expr("CAST(x AS DECIMAL(19,0)) * x")).cast("decimal(38,0)").alias("sxx"),
    )
    return m.selectExpr(
        "d AS n_days",
        "s AS n_events",
        "CAST(s * 1000 div d AS BIGINT) AS mean_milli",
        "CAST((d * sxx - CAST(s AS DECIMAL(38,0)) * s) * 1000"
        " div (CAST(d AS DECIMAL(38,0)) * d) AS BIGINT) AS var_milli",
        "CAST((d * sxx - CAST(s AS DECIMAL(38,0)) * s) * 1000"
        " div NULLIF(CAST(d AS DECIMAL(38,0)) * s, 0) AS BIGINT)"
        " AS dispersion_milli",
    )


@register(
    "events_peak_days",
    oracle=f"""
WITH daily AS (
  SELECT {_DUCK_US} // {_DAY_US} AS day, COUNT(*)::BIGINT AS x
  FROM events GROUP BY 1
),
tot AS (SELECT COUNT(*)::BIGINT AS d, SUM(x)::BIGINT AS s FROM daily),
ctx AS (
  SELECT day, x,
         LAG(x)  OVER (ORDER BY day) AS prev_x,
         LEAD(x) OVER (ORDER BY day) AS next_x
  FROM daily
)
SELECT c.day, c.x AS n_events, c.prev_x, c.next_x
FROM ctx c, tot
WHERE c.prev_x IS NOT NULL AND c.next_x IS NOT NULL
  AND c.x > c.prev_x AND c.x > c.next_x
  AND c.x::HUGEINT * tot.d > tot.s
""",
    tags=("events", "timeseries"),
)
def events_peak_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-day detection on the daily series: strict local maxima
    (above both calendar neighbors) that also exceed the whole-series
    mean — the spike shortlist an on-call engineer or a capacity planner
    reads first, and the discrete sibling of events_cusum_changepoint's
    level-shift view.  The above-mean test is the exact integer cross
    product x·D > S (no float mean), carried in DECIMAL/HUGEINT.

    Scale shape: one pass to the O(days) daily rollup; lag/lead run in
    one window over the calendar-bounded day sequence (the same
    provably bounded window class as events_runs_test — 36k rows per
    century, never data-volume-scaling), and the 1-row totals broadcast.
    """
    ev = _with_us(t(spark, sf_dir, "events"))
    from uda_spark.cache import tracked_persist

    daily = tracked_persist(
        ev.groupBy(F.expr(f"ts_us div {_DAY_US}").alias("day")).agg(
            F.count("*").alias("x")
        )
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("d"), F.sum("x").cast("long").alias("s")
    )
    w = Window.orderBy("day")
    ctx = daily.withColumn("prev_x", F.lag("x").over(w)).withColumn(
        "next_x", F.lead("x").over(w)
    )
    return (
        ctx.crossJoin(F.broadcast(tot))
        .where(
            F.col("prev_x").isNotNull()
            & F.col("next_x").isNotNull()
            & (F.col("x") > F.col("prev_x"))
            & (F.col("x") > F.col("next_x"))
            & (F.expr("CAST(x AS DECIMAL(38,0)) * d > CAST(s AS DECIMAL(38,0))"))
        )
        .select(
            "day",
            F.col("x").cast("long").alias("n_events"),
            F.col("prev_x").cast("long").alias("prev_x"),
            F.col("next_x").cast("long").alias("next_x"),
        )
    )


@register(
    "events_entropy_rate",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
           AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*)::BIGINT AS c
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
outdeg AS (SELECT prev_type, SUM(c)::BIGINT AS tot FROM pairs GROUP BY prev_type),
n AS (SELECT SUM(c)::BIGINT AS total FROM pairs),
cells AS (
  SELECT CAST(round(p.c * ln(CAST(o.tot AS DOUBLE) / p.c) * 1000000) AS BIGINT)
           AS cell_unorm
  FROM pairs p JOIN outdeg o ON p.prev_type = o.prev_type
)
SELECT n.total AS n_transitions,
       (SELECT COUNT(*) FROM pairs)::BIGINT AS n_cells,
       CAST(SUM(cell_unorm) // n.total AS BIGINT) AS entropy_rate_micronats
FROM cells, n GROUP BY n.total
""",
    tags=("events", "sequence", "statistics"),
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the first-order user-behavior Markov chain:
    H = Σ_st (c_st/N)·ln(tot_s/c_st) in micro-nats — one number for how
    predictable the NEXT event is given the current one (0 = fully
    deterministic flows, ln|types| = uniform chaos).  The sequencing
    readout next to events_markov_transitions' full matrix and
    events_user_entropy's per-user marginal view.

    Exactness: each |types|²-bounded cell contributes
    round(c·ln(tot/c)·1e6) — a deterministic double on exact integers
    rounded PER CELL so the sum is an order-independent integer — and
    the normalization by N is integer division at the end.

    Scale shape: one per-user window pass emits transitions (same
    exchange as events_markov_transitions), then everything is
    |types|²-bounded: the cell relation, the broadcast out-degrees, and
    the 1-row total.
    """
    from uda_spark.sources.tables import event_micros

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = (
        ev.withColumn("ts_us", event_micros(ev))
        .select("user_id", "event_type", "event_id", "ts_us")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
    )
    pairs = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").cast("long").alias("c")
    )
    from uda_spark.cache import tracked_persist

    pairs = tracked_persist(pairs)
    outdeg = pairs.groupBy("prev_type").agg(F.sum("c").cast("long").alias("tot"))
    n_cells, total = pairs.agg(F.count("*"), F.sum("c").cast("long")).first()
    cells = pairs.join(F.broadcast(outdeg), on="prev_type").selectExpr(
        "CAST(round(c * ln(CAST(tot AS DOUBLE) / c) * 1000000) AS BIGINT)"
        " AS cell_unorm"
    )
    return cells.agg(F.sum("cell_unorm").alias("su")).selectExpr(
        f"CAST({total}L AS BIGINT) AS n_transitions",
        f"CAST({n_cells} AS BIGINT) AS n_cells",
        f"CAST(su div {total}L AS BIGINT) AS entropy_rate_micronats",
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend slope over the daily series


@register(
    "events_theil_sen_trend",
    oracle=f"""
WITH daily AS (
  SELECT {_DUCK_US} // {_DAY_US} AS day, COUNT(*)::BIGINT AS x
  FROM events GROUP BY 1
),
pairs AS (
  SELECT a.day AS d1, b.day AS d2,
         (b.x - a.x) / CAST(b.day - a.day AS DOUBLE) AS slope
  FROM daily a JOIN daily b ON b.day > a.day
),
ranked AS (
  SELECT slope, ROW_NUMBER() OVER (ORDER BY slope, d1, d2) AS rn,
         COUNT(*) OVER () AS p
  FROM pairs
)
SELECT (SELECT COUNT(*)::BIGINT FROM daily) AS n_days,
       MAX(p)::BIGINT AS n_pairs,
       CAST(floor(AVG(slope) * 1000000 + 0.5) AS BIGINT)
         AS theil_sen_slope_micro
FROM ranked
WHERE rn IN ((p + 1) // 2, (p + 2) // 2)
""",
    tags=("events", "timeseries", "statistics"),
)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend slope of the daily event counts — the
    magnitude companion to events_trend_mk (Mann-Kendall answers "is
    there a monotone trend?"; Theil–Sen answers "how steep?") and the
    estimator of choice when level shifts and outlier days would wreck
    an OLS slope: it is the MEDIAN of all pairwise day-to-day slopes,
    with a 29.3% breakdown point.

    Exactness: each pairwise slope is ONE IEEE division of two exact
    integers (bit-identical across engines); the median picks the
    middle element(s) by exact rank (average of the two middles when
    the pair count is even — one deterministic add/halve), then
    quantizes once to integer micro-units with the repo's
    floor(x·1e6 + 1/2) convention.  No float accumulation anywhere.

    Scale shape: one partial-aggregated pass over the fact to the
    O(days) daily rollup; the pair self-join and the rank window are
    over the CALENDAR-bounded pair relation (a decade of days is ~6.6M
    pairs — kilobytes per day of history, never data-scaling), the same
    boundedness class as events_trend_mk's sign pairs.
    """
    ev = _with_us(t(spark, sf_dir, "events"))
    daily = ev.groupBy(F.expr(f"ts_us div {_DAY_US}").alias("day")).agg(
        F.count("*").alias("x")
    )
    a = daily.selectExpr("day AS d1", "x AS x1")
    b = daily.selectExpr("day AS d2", "x AS x2")
    pairs = a.join(b, F.col("d2") > F.col("d1")).selectExpr(
        "d1", "d2", "(x2 - x1) / CAST(d2 - d1 AS DOUBLE) AS slope"
    )
    w = Window.orderBy("slope", "d1", "d2")
    ranked = pairs.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("p"),
    )
    n_days = daily.agg(F.count("*").cast("long").alias("n_days"))
    mid = ranked.where(
        F.expr("rn IN ((p + 1) div 2, (p + 2) div 2)")
    ).agg(
        F.max("p").cast("long").alias("n_pairs"),
        F.expr(
            "CAST(floor(AVG(slope) * 1000000 + 0.5) AS BIGINT)"
        ).alias("theil_sen_slope_micro"),
    )
    return n_days.crossJoin(F.broadcast(mid)).select(
        "n_days", "n_pairs", "theil_sen_slope_micro"
    )


@register(
    "events_seasonal_strength",
    oracle=f"""
WITH daily AS (
  SELECT {_DUCK_US} // {_DAY_US} AS day, COUNT(*)::BIGINT AS x
  FROM events GROUP BY 1
),
tot AS (SELECT COUNT(*)::HUGEINT AS d, SUM(x)::HUGEINT AS t FROM daily),
grp AS (
  SELECT day % 7 AS dow, COUNT(*)::HUGEINT AS n_g, SUM(x)::HUGEINT AS s_g
  FROM daily GROUP BY day % 7
),
ssb AS (
  SELECT SUM(((grp.s_g * tot.d - tot.t * grp.n_g)
              * (grp.s_g * tot.d - tot.t * grp.n_g)) // grp.n_g)::HUGEINT AS b
  FROM grp, tot
),
sst AS (
  SELECT SUM((daily.x * tot.d - tot.t) * (daily.x * tot.d - tot.t))::HUGEINT AS s
  FROM daily, tot
)
SELECT CAST(tot.d AS BIGINT) AS n_days,
       CAST(tot.t AS BIGINT) AS n_events,
       CAST(ssb.b AS BIGINT) AS ssb_scaled,
       CAST(sst.s AS BIGINT) AS sst_scaled,
       CAST(ssb.b * 1000000 // NULLIF(sst.s, 0) AS BIGINT) AS eta2_ppm
FROM tot, ssb, sst
""",
    tags=("events", "timeseries", "statistics"),
)
def events_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality STRENGTH as the one-way variance
    decomposition eta² = SS_between / SS_total over the daily count
    series — the scalar that says how much of daily traffic variance
    the weekly cycle explains (the chi-square sibling tests
    significance; this measures magnitude, the forecasting-relevant
    number).  Exact integers via cross-multiplication by the day count
    D: SST_scaled = Σ(x_i·D − T)² and SSB_scaled =
    Σ_g (S_g·D − T·n_g)² // n_g share the same D² scale, so eta²_ppm is
    their direct integer ratio.

    Scale shape: one pass over the fact to the calendar-bounded daily
    relation; the 7-row day-of-week aggregate, totals, and the ratio
    all operate on bounded relations (1-row cross joins are scalar).
    """
    daily = (
        _with_us(t(spark, sf_dir, "events"))
        .selectExpr(f"ts_us div {_DAY_US} AS day")
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("x"))
    )
    daily.createOrReplaceTempView("_ss_daily")
    return spark.sql(
        """
WITH tot AS (SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS d,
                    CAST(SUM(x) AS DECIMAL(38,0)) AS t FROM _ss_daily),
grp AS (
  SELECT day % 7 AS dow, CAST(COUNT(*) AS DECIMAL(38,0)) AS n_g,
         CAST(SUM(x) AS DECIMAL(38,0)) AS s_g
  FROM _ss_daily GROUP BY day % 7
),
ssb AS (
  SELECT CAST(SUM(CAST((
           (grp.s_g * tot.d - tot.t * grp.n_g)
           * (grp.s_g * tot.d - tot.t * grp.n_g)
           - ((grp.s_g * tot.d - tot.t * grp.n_g)
              * (grp.s_g * tot.d - tot.t * grp.n_g)) % grp.n_g
         ) / grp.n_g AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS b
  FROM grp CROSS JOIN tot
),
sst AS (
  SELECT CAST(SUM((d2.x * tot.d - tot.t) * (d2.x * tot.d - tot.t))
              AS DECIMAL(38,0)) AS s
  FROM _ss_daily d2 CROSS JOIN tot
)
SELECT CAST(tot.d AS BIGINT) AS n_days,
       CAST(tot.t AS BIGINT) AS n_events,
       CAST(ssb.b AS BIGINT) AS ssb_scaled,
       CAST(sst.s AS BIGINT) AS sst_scaled,
       CAST(ssb.b * 1000000 div NULLIF(sst.s, 0) AS BIGINT) AS eta2_ppm
FROM tot, ssb, sst
"""
    )


@register(
    "ml_friedman_test",
    oracle=f"""
WITH daily AS (
  SELECT {_DUCK_US} // {_DAY_US} AS day, event_type AS typ, COUNT(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT d.day, t.typ, COALESCE(daily.cnt, 0) AS cnt
  FROM (SELECT DISTINCT day FROM daily) d
  CROSS JOIN (SELECT DISTINCT typ FROM daily) t
  LEFT JOIN daily ON daily.day = d.day AND daily.typ = t.typ
),
tie AS (
  SELECT day, cnt, COUNT(*)::BIGINT AS c FROM grid GROUP BY day, cnt
),
rk AS (
  SELECT day, cnt, c,
         COALESCE(SUM(c) OVER (PARTITION BY day ORDER BY cnt
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM tie
),
r2 AS (
  SELECT grid.typ, SUM(2 * rk.cum_before + rk.c + 1)::HUGEINT AS r2_sum
  FROM grid JOIN rk ON rk.day = grid.day AND rk.cnt = grid.cnt
  GROUP BY grid.typ
),
dims AS (
  SELECT (SELECT COUNT(DISTINCT day)::HUGEINT FROM daily) AS n,
         (SELECT COUNT(DISTINCT typ)::HUGEINT FROM daily) AS k
),
s AS (SELECT SUM(r2_sum * r2_sum)::HUGEINT AS sr2 FROM r2)
SELECT CAST(dims.n AS BIGINT) AS n_blocks,
       CAST(dims.k AS INT) AS k_treatments,
       CAST(dims.k - 1 AS INT) AS dof,
       CAST((3000000 * s.sr2) // (dims.n * dims.k * (dims.k + 1))
            - 3000000 * dims.n * (dims.k + 1) AS BIGINT) AS chi2_micro
FROM dims, s
""",
    tags=("ml", "events", "statistics"),
)
def ml_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test: do the event types' daily volumes carry a
    consistent ordering across days?  The repeated-measures member of
    the rank-test family (rank-sum = 2 independent groups,
    Kruskal-Wallis = k independent, signed-rank = 2 paired, Friedman =
    k paired): treatments are event types, blocks are calendar days
    (absent cells filled with 0 on the bounded day × type grid), ranks
    are within-block with the 2×rank average-tie identity, and
    χ²_F = 12/(nk(k+1))·ΣR_j² − 3n(k+1) is exact integer micro via
    3e6·ΣR2² = 12e6·ΣR²  (R2 = 2R).

    Scale shape: one fact pass to the calendar-bounded (day, type)
    relation; the within-block tie window partitions by day over ≤k
    rows each; rank sums reduce to |types| rows; all remaining
    arithmetic is 1-row.
    """
    daily = (
        _with_us(t(spark, sf_dir, "events"))
        .selectExpr(f"ts_us div {_DAY_US} AS day", "event_type AS typ")
        .groupBy("day", "typ")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    daily.createOrReplaceTempView("_fr_daily")
    return spark.sql(
        """
WITH grid AS (
  SELECT d.day, t.typ, COALESCE(dl.cnt, 0) AS cnt
  FROM (SELECT DISTINCT day FROM _fr_daily) d
  CROSS JOIN (SELECT DISTINCT typ FROM _fr_daily) t
  LEFT JOIN _fr_daily dl ON dl.day = d.day AND dl.typ = t.typ
),
tie AS (
  SELECT day, cnt, CAST(COUNT(*) AS BIGINT) AS c FROM grid GROUP BY day, cnt
),
rk AS (
  SELECT day, cnt, c,
         COALESCE(SUM(c) OVER (PARTITION BY day ORDER BY cnt
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM tie
),
r2 AS (
  SELECT grid.typ,
         CAST(SUM(2 * rk.cum_before + rk.c + 1) AS DECIMAL(38,0)) AS r2_sum
  FROM grid JOIN rk ON rk.day = grid.day AND rk.cnt = grid.cnt
  GROUP BY grid.typ
),
dims AS (
  SELECT (SELECT CAST(COUNT(DISTINCT day) AS DECIMAL(38,0)) FROM _fr_daily) AS n,
         (SELECT CAST(COUNT(DISTINCT typ) AS DECIMAL(38,0)) FROM _fr_daily) AS k
),
s AS (SELECT CAST(SUM(r2_sum * r2_sum) AS DECIMAL(38,0)) AS sr2 FROM r2)
SELECT CAST(dims.n AS BIGINT) AS n_blocks,
       CAST(dims.k AS INT) AS k_treatments,
       CAST(dims.k - 1 AS INT) AS dof,
       CAST((3000000 * s.sr2) div (dims.n * dims.k * (dims.k + 1))
            - 3000000 * dims.n * (dims.k + 1) AS BIGINT) AS chi2_micro
FROM dims, s
"""
    )


# ---------------------------------------------------------------------------
# Round 11 — lifecycle analytics: RFM segment migration between halves
# of the observation window, and a power-law fit of the retention curve.

_RFM_CENTS = "CAST(COALESCE(CAST(value AS DECIMAL(18,2)), 0) * 100 AS BIGINT)"
# fixed, deterministic segment rule over (purchase count, purchase cents)
_RFM_SEG = (
    "CASE WHEN {f} = 0 THEN 'none' WHEN {f} < 3 THEN 'light' "
    "WHEN {m} < 500000 THEN 'mid' ELSE 'heavy' END"
)


@register(
    "events_rfm_migration",
    oracle=f"""
WITH b AS (SELECT (MIN({_DUCK_US}) + MAX({_DUCK_US})) // 2 AS mid FROM events),
pu AS (
  SELECT user_id,
         SUM(CASE WHEN {_DUCK_US} < b.mid AND event_type = 'purchase'
                  THEN 1 ELSE 0 END)::BIGINT AS f1,
         SUM(CASE WHEN {_DUCK_US} < b.mid AND event_type = 'purchase'
                  THEN {_RFM_CENTS} ELSE 0 END)::BIGINT AS m1,
         SUM(CASE WHEN {_DUCK_US} >= b.mid AND event_type = 'purchase'
                  THEN 1 ELSE 0 END)::BIGINT AS f2,
         SUM(CASE WHEN {_DUCK_US} >= b.mid AND event_type = 'purchase'
                  THEN {_RFM_CENTS} ELSE 0 END)::BIGINT AS m2
  FROM events, b GROUP BY user_id, b.mid
),
seg AS (
  SELECT {_RFM_SEG.format(f='f1', m='m1')} AS seg_from,
         {_RFM_SEG.format(f='f2', m='m2')} AS seg_to
  FROM pu
),
n AS (SELECT COUNT(*)::BIGINT AS n FROM seg)
SELECT seg_from, seg_to, COUNT(*)::BIGINT AS n_users,
       (COUNT(*) * 1000000 // n.n)::BIGINT AS share_ppm
FROM seg, n GROUP BY seg_from, seg_to, n.n
""",
    tags=("events", "cohort", "aggregation"),
)
def events_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segment-migration matrix: classify every user's purchase
    behavior (frequency + monetary, fixed deterministic thresholds) in
    the FIRST half of the observation window and again in the SECOND
    half, then count users per (from, to) transition — the lifecycle
    readout behind churn/upsell dashboards ('how many heavy users
    decayed to light?').  A user inactive in one half classifies as
    'none' for it, so the matrix is complete over all observed users.

    Exactness: the split point is the integer midpoint of the event
    time range (exact microseconds); frequencies and cents are exact
    integers; shares are integer ppm.

    Scale shape: one O(1) min/max scalar, ONE map-side-combined
    groupBy(user_id) computing both halves' moments with conditional
    aggregation (the fact table is scanned once, not once per half),
    then a <=16-row matrix aggregation.
    """
    ev = _with_us(t(spark, sf_dir, "events"))
    mn, mx = ev.agg(F.min("ts_us"), F.max("ts_us")).first()
    mid = (mn + mx) // 2
    pu = ev.groupBy("user_id").agg(
        F.expr(
            f"SUM(CASE WHEN ts_us < {mid}L AND event_type = 'purchase'"
            " THEN 1 ELSE 0 END)"
        ).cast("long").alias("f1"),
        F.expr(
            f"SUM(CASE WHEN ts_us < {mid}L AND event_type = 'purchase'"
            f" THEN {_RFM_CENTS} ELSE 0 END)"
        ).cast("long").alias("m1"),
        F.expr(
            f"SUM(CASE WHEN ts_us >= {mid}L AND event_type = 'purchase'"
            " THEN 1 ELSE 0 END)"
        ).cast("long").alias("f2"),
        F.expr(
            f"SUM(CASE WHEN ts_us >= {mid}L AND event_type = 'purchase'"
            f" THEN {_RFM_CENTS} ELSE 0 END)"
        ).cast("long").alias("m2"),
    )
    seg = pu.select(
        F.expr(_RFM_SEG.format(f="f1", m="m1")).alias("seg_from"),
        F.expr(_RFM_SEG.format(f="f2", m="m2")).alias("seg_to"),
    )
    n = seg.count()
    return seg.groupBy("seg_from", "seg_to").agg(
        F.count("*").cast("long").alias("n_users"),
        F.expr(f"CAST(COUNT(*) * 1000000 div {n}L AS BIGINT)").alias("share_ppm"),
    )


RETENTION_FIT_OFFSETS = 8


@register(
    "events_retention_curve_fit",
    oracle=f"""
WITH act AS (
  SELECT DISTINCT user_id, {_DUCK_US} // {7 * 86400 * 1_000_000} AS week
  FROM events
),
mw AS (SELECT MAX(week) AS maxw FROM act),
cohort AS (
  SELECT user_id, MIN(week) AS cw FROM act GROUP BY user_id
),
elig AS (
  SELECT c.user_id, c.cw FROM cohort c, mw
  WHERE c.cw + {RETENTION_FIT_OFFSETS} <= mw.maxw
),
base AS (SELECT COUNT(*)::BIGINT AS b FROM elig),
ret AS (
  SELECT CAST(a.week - e.cw AS BIGINT) AS o,
         COUNT(DISTINCT a.user_id)::BIGINT AS active
  FROM act a JOIN elig e ON a.user_id = e.user_id
  WHERE a.week - e.cw BETWEEN 1 AND {RETENTION_FIT_OFFSETS}
  GROUP BY 1
),
pts AS (
  SELECT CAST(round(ln(CAST(o AS DOUBLE)) * 1000000, 0) AS BIGINT) AS x,
         CAST(round(ln(CAST(active AS DOUBLE) / base.b) * 1000000, 0) AS BIGINT) AS y
  FROM ret, base WHERE active > 0
),
s AS (
  SELECT COUNT(*)::BIGINT AS np, SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
         SUM(x::HUGEINT * y)::HUGEINT AS sxy, SUM(x::HUGEINT * x)::HUGEINT AS sxx
  FROM pts
)
SELECT CAST(np AS INT) AS n_points,
       (SELECT b FROM base) AS base_users,
       CAST((np * sxy - sx::HUGEINT * sy) * 1000000
            // NULLIF(np * sxx - sx::HUGEINT * sx, 0) AS BIGINT) AS slope_micro,
       CAST((sy - ((np * sxy - sx::HUGEINT * sy) * 1000000
                   // NULLIF(np * sxx - sx::HUGEINT * sx, 0)) * sx // 1000000)
            // NULLIF(np, 0) AS BIGINT) AS intercept_micro
FROM s
""",
    tags=("events", "cohort", "statistics"),
)
def events_retention_curve_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law fit of the pooled retention curve: for weekly offsets
    1..{RETENTION_FIT_OFFSETS}, the retention rate of fully-observed
    cohorts (cohort week + window <= max week, so no right-censoring
    bias), fitted as ln(rate) = a + b·ln(offset) by closed-form OLS —
    the decay exponent b is THE growth-analytics summary of how fast
    engagement decays (b ≈ -1 is the classic power-law forgetting
    curve; events_cohort_retention shows the raw triangle, this query
    reduces it to the number a forecast uses).

    Exactness: activity/cohort counts are exact integers; ln() runs
    once per curve POINT (<= {RETENTION_FIT_OFFSETS} of them) on
    identical exact ratios in both engines and is immediately rounded
    to integer micro-units, so the OLS normal equations run in EXACT
    integer arithmetic (DECIMAL(38,0)/HUGEINT for the cross products —
    the micro-scaled slope numerator passes int64); zero-active
    offsets are excluded before the log (stated contract), and a
    degenerate single-point curve NULLs via NULLIF.

    Scale shape: the (user, week) distinct-reduce is the only
    corpus-scale exchange (shared shape with events_cohort_retention);
    the retention join co-partitions on user_id; everything past the
    8-row offset relation is O(1).
    """
    from uda_spark.sources.tables import event_micros

    from uda_spark.cache import tracked_persist

    week_us = 7 * 86400 * 1_000_000
    ev = t(spark, sf_dir, "events")
    act = tracked_persist(
        ev.withColumn("ts_us", event_micros(ev))
        .select("user_id", F.expr(f"ts_us div {week_us}").alias("week"))
        .distinct()
    )
    maxw = act.agg(F.max("week")).first()[0]
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cw"))
    elig = cohort.where(F.col("cw") + RETENTION_FIT_OFFSETS <= maxw)
    b = elig.count()
    ret = (
        act.join(elig, on="user_id")
        .withColumn("o", (F.col("week") - F.col("cw")).cast("long"))
        .where(F.col("o").between(1, RETENTION_FIT_OFFSETS))
        .groupBy("o")
        .agg(F.count_distinct("user_id").cast("long").alias("active"))
    )
    pts = ret.where(F.col("active") > 0).select(
        F.expr(
            "CAST(round(ln(CAST(o AS DOUBLE)) * 1000000, 0) AS BIGINT)"
        ).alias("x"),
        F.expr(
            f"CAST(round(ln(CAST(active AS DOUBLE) / {b}L) * 1000000, 0)"
            " AS BIGINT)"
        ).alias("y"),
    )
    s = pts.agg(
        F.count("*").cast("long").alias("np"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(19,0)) * y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(19,0)) * x")).cast("decimal(38,0)").alias("sxx"),
    )
    return s.selectExpr(
        "CAST(np AS INT) AS n_points",
        f"CAST({b}L AS BIGINT) AS base_users",
        "CAST((np * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000"
        " div NULLIF(np * sxx - CAST(sx AS DECIMAL(38,0)) * sx, 0) AS BIGINT)"
        " AS slope_micro",
        "CAST((sy - ((np * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000"
        " div NULLIF(np * sxx - CAST(sx AS DECIMAL(38,0)) * sx, 0)) * sx"
        " div 1000000) div NULLIF(np, 0) AS BIGINT) AS intercept_micro",
    )
