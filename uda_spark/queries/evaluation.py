"""Model-evaluation readouts (round 7, north-star): the queries a
training pipeline runs AFTER a model exists — ranking quality (AUC via
the exact rank-sum statistic), calibration (reliability bins), and the
thresholded confusion report.  A 100 TB pipeline evaluates on the full
holdout, not a sample, so each readout is a one/two-pass exact
aggregation with no per-row floats: scores are integer cents, ranks are
exact integers with the standard average-rank tie treatment carried as
2×rank to stay integral, and every ratio is an integer ppm.

The per-user label/score relation is shared by all three queries:
label = "user made more purchases than errors" (a behavioral target),
score = total purchase value in cents (the model-score stand-in —
deterministic, correlated with the label, with a genuine tie mass at 0).

Reference parity: the reference ships no model-eval tier; these extend
the engine the way its acceptance workloads (terasort/wordcount,
src/test/regression) extend Hadoop — domain workloads over the same
operator substrate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uda_spark.operators.sort import global_cumulative_sum
from uda_spark.queries.common import t
from uda_spark.registry import register

# Shared per-user label/score base (engine-identical in both dialects).
_BASE_SPARK = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >
            SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS INT) AS label,
       SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(COALESCE(CAST(value AS DECIMAL(18,2)), 0) * 100 AS BIGINT)
                ELSE 0 END) AS score
FROM {events} GROUP BY user_id
"""

_BASE_DUCK = _BASE_SPARK.format(events="events")

CONFUSION_THRESHOLD_CENTS = 50_000


def _user_label_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "events").createOrReplaceTempView("_eval_events")
    return spark.sql(_BASE_SPARK.format(events="_eval_events"))


def rank_sum_stats(grp: DataFrame) -> DataFrame:
    """One-row exact Mann-Whitney statistics from the distinct-score
    group relation ``(score, c, p)``: ``n_pos``, ``n_neg``, ``u2``
    (doubled U), ``auc_ppm``.

    Scale shape: ``cum_before`` uses the two-pass range-partitioned
    cumulative sum (:func:`uda_spark.operators.sort.global_cumulative_sum`)
    — per-partition windows plus O(num_partitions) broadcast offsets —
    so NO single-partition window exists even when the score is
    user-cardinality (round-7's formulation bounded the window input by
    distinct scores but still ran it through one task).  The rank-sum
    ``s2_pos`` and the ppm step are carried in DECIMAL(38,0) (HUGEINT on
    the oracle side): ``(s2_pos - n_pos*(n_pos+1)) * 1e6`` exceeds int64
    once ``n_pos*n_neg > ~4.6e12`` (~4M balanced users), where non-ANSI
    Spark would wrap silently.  ``u2`` itself is returned as BIGINT —
    exact up to ~6e9 balanced users (u2 <= n^2/2 < 2^63), stated here as
    the contract bound.
    """
    ranked = global_cumulative_sum(grp, ["score"], "c", "cum_before")
    s = ranked.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum(F.col("c") - F.col("p")).cast("long").alias("n_neg"),
        F.sum(
            F.col("p").cast("decimal(38,0)")
            * (2 * (F.col("cum_before") + 1) + F.col("c") - 1)
        ).alias("s2_raw"),
    )
    return s.select(
        "n_pos",
        "n_neg",
        F.expr(
            "CAST(s2_raw - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1) AS BIGINT)"
        ).alias("u2"),
        F.expr(
            "CAST((s2_raw - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)) * 1000000"
            " div NULLIF(2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg, 0) AS BIGINT)"
        ).alias("auc_ppm"),
    )


# The DuckDB twin of rank_sum_stats' final arithmetic (HUGEINT = the
# oracle-side DECIMAL(38,0) stand-in, same exactness class).
_RANK_SUM_ORACLE_TAIL = """
ranked AS (
  SELECT score, c, p,
         COALESCE(SUM(c) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM grp
),
s AS (
  SELECT SUM(p)::BIGINT AS n_pos,
         SUM(c - p)::BIGINT AS n_neg,
         SUM(p::HUGEINT * (2 * (cum_before + 1) + c - 1))::HUGEINT AS s2_raw
  FROM ranked
)
"""


@register(
    "ml_auc_rank_sum",
    oracle=f"""
WITH base AS ({_BASE_DUCK}),
grp AS (
  SELECT score, COUNT(*)::BIGINT AS c, SUM(label)::BIGINT AS p
  FROM base GROUP BY score
),
{_RANK_SUM_ORACLE_TAIL}
SELECT n_pos, n_neg,
       CAST(s2_raw - n_pos::HUGEINT * (n_pos + 1) AS BIGINT) AS u2,
       CAST((s2_raw - n_pos::HUGEINT * (n_pos + 1)) * 1000000
            // NULLIF(2 * n_pos::HUGEINT * n_neg, 0) AS BIGINT) AS auc_ppm
FROM s
""",
    tags=("ml", "evaluation", "north-star"),
)
def ml_auc_rank_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC as the exact Mann-Whitney rank-sum statistic — the
    standard identity AUC = U / (n_pos * n_neg), computed without a
    single float: ranks use the average-rank tie treatment carried as
    2×rank (always integral: a tie group of size c starting at min-rank
    r contributes average 2r + c - 1 per member), U is doubled to u2,
    and the final AUC is integer ppm.

    Scale shape: one groupBy(score) over the per-user relation, then the
    range-partitioned two-pass cumulative count over the distinct-score
    groups (see :func:`rank_sum_stats` — no single-partition window
    anywhere, so a user-cardinality score is fine, not just a quantized
    one), then a one-row reduction.  The naive formulation ranks every
    user in one global window; this one never materializes a per-user
    rank, which is what makes exact AUC viable on a billion-user
    holdout.
    """
    base = _user_label_score(spark, sf_dir)
    grp = base.groupBy("score").agg(
        F.count("*").cast("long").alias("c"),
        F.sum("label").cast("long").alias("p"),
    )
    return rank_sum_stats(grp)


@register(
    "ml_calibration_bins",
    oracle=f"""
WITH base AS ({_BASE_DUCK}),
scored AS (
  SELECT label,
         LEAST(999999, score * 1000000 // 200000) AS score_ppm
  FROM base
)
SELECT CAST(score_ppm // 100000 AS INT) AS bin,
       COUNT(*)::BIGINT AS n_users,
       CAST(SUM(score_ppm) // COUNT(*) AS BIGINT) AS mean_score_ppm,
       CAST(SUM(label) * 1000000 // COUNT(*) AS BIGINT) AS pos_rate_ppm
FROM scored GROUP BY score_ppm // 100000
""",
    tags=("ml", "evaluation", "north-star"),
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability (calibration) bins: map the cent score onto a ppm
    pseudo-probability (score/$2000, capped at 1), decile-bin it, and compare the mean
    predicted ppm against the observed positive rate per bin — the
    standard calibration-curve input, exact in integers end to end.

    Scale shape: one grouped aggregation over the per-user relation;
    bins are bounded (10), so the output is O(1).
    """
    base = _user_label_score(spark, sf_dir)
    scored = base.select(
        "label",
        F.expr("LEAST(999999L, score * 1000000 div 200000)").alias("score_ppm"),
    )
    return (
        scored.groupBy(F.expr("score_ppm div 100000").cast("int").alias("bin"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.expr("CAST(SUM(score_ppm) div COUNT(*) AS BIGINT)").alias(
                "mean_score_ppm"
            ),
            F.expr("CAST(SUM(label) * 1000000 div COUNT(*) AS BIGINT)").alias(
                "pos_rate_ppm"
            ),
        )
    )


@register(
    "ml_confusion_report",
    oracle=f"""
WITH base AS ({_BASE_DUCK}),
conf AS (
  SELECT
    SUM(CASE WHEN score >= {CONFUSION_THRESHOLD_CENTS} AND label = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
    SUM(CASE WHEN score >= {CONFUSION_THRESHOLD_CENTS} AND label = 0 THEN 1 ELSE 0 END)::BIGINT AS fp,
    SUM(CASE WHEN score <  {CONFUSION_THRESHOLD_CENTS} AND label = 0 THEN 1 ELSE 0 END)::BIGINT AS tn,
    SUM(CASE WHEN score <  {CONFUSION_THRESHOLD_CENTS} AND label = 1 THEN 1 ELSE 0 END)::BIGINT AS fn
  FROM base
)
SELECT tp, fp, tn, fn,
       CAST(tp * 1000000 // NULLIF(tp + fp, 0) AS BIGINT) AS precision_ppm,
       CAST(tp * 1000000 // NULLIF(tp + fn, 0) AS BIGINT) AS recall_ppm,
       CAST(2 * tp * 1000000 // NULLIF(2 * tp + fp + fn, 0) AS BIGINT) AS f1_ppm
FROM conf
""",
    tags=("ml", "evaluation", "north-star"),
)
def ml_confusion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded confusion matrix + precision/recall/F1 (integer ppm;
    the F1 identity 2tp/(2tp+fp+fn) stays in one integer division) in a
    single conditional-aggregation pass over the per-user relation —
    the readout printed next to every trained classifier.
    """
    thr = CONFUSION_THRESHOLD_CENTS
    base = _user_label_score(spark, sf_dir)
    conf = base.agg(
        F.sum(F.expr(f"CASE WHEN score >= {thr} AND label = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("tp"),
        F.sum(F.expr(f"CASE WHEN score >= {thr} AND label = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("fp"),
        F.sum(F.expr(f"CASE WHEN score < {thr} AND label = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("tn"),
        F.sum(F.expr(f"CASE WHEN score < {thr} AND label = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("fn"),
    )
    return conf.select(
        "tp",
        "fp",
        "tn",
        "fn",
        F.expr("CAST(tp * 1000000 div NULLIF(tp + fp, 0) AS BIGINT)").alias(
            "precision_ppm"
        ),
        F.expr("CAST(tp * 1000000 div NULLIF(tp + fn, 0) AS BIGINT)").alias(
            "recall_ppm"
        ),
        F.expr(
            "CAST(2 * tp * 1000000 div NULLIF(2 * tp + fp + fn, 0) AS BIGINT)"
        ).alias("f1_ppm"),
    )


@register(
    "pipeline_dataset_card",
    oracle="""
SELECT CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source,
       COUNT(*)::BIGINT AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS mean_chars,
       COUNT(DISTINCT lang)::BIGINT AS n_langs,
       COUNT(DISTINCT md5(text))::BIGINT AS n_distinct_texts,
       CAST((COUNT(*) - COUNT(DISTINCT md5(text))) * 1000000
            // COUNT(*) AS BIGINT) AS dup_rate_ppm
FROM documents
GROUP BY GROUPING SETS ((source), ())
""",
    tags=("pipeline", "evaluation", "north-star"),
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card: per-source and corpus-total composition stats
    (volume, length, language spread, exact duplicate rate) in one
    GROUPING SETS pass — the summary table published next to every
    released training corpus.

    Scale shape: one Expand + one exchange for both grouping shapes;
    the distinct-text count groups 16-byte md5 digests, never bodies
    (the same shuffle discipline as dedup_exact).  At extreme scale the
    exact COUNT(DISTINCT) tier swaps for the HLL sketch queries the
    module already provides — this card is the exact-tier readout.
    """
    t(spark, sf_dir, "documents").createOrReplaceTempView("_card_documents")
    return spark.sql(
        """
SELECT CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source,
       COUNT(*) AS n_docs,
       SUM(n_chars) AS total_chars,
       CAST(SUM(n_chars) div COUNT(*) AS BIGINT) AS mean_chars,
       COUNT(DISTINCT lang) AS n_langs,
       COUNT(DISTINCT md5(text)) AS n_distinct_texts,
       CAST((COUNT(*) - COUNT(DISTINCT md5(text))) * 1000000
            div COUNT(*) AS BIGINT) AS dup_rate_ppm
FROM _card_documents
GROUP BY GROUPING SETS ((source), ())
"""
    )


PR_SWEEP_STEP_CENTS = 20_000
PR_SWEEP_POINTS = 10


@register(
    "ml_pr_threshold_sweep",
    oracle=f"""
WITH base AS ({_BASE_DUCK}),
grp AS (
  SELECT score, COUNT(*)::BIGINT AS c, SUM(label)::BIGINT AS p
  FROM base GROUP BY score
),
thr AS (SELECT t * {PR_SWEEP_STEP_CENTS} AS threshold
        FROM range(0, {PR_SWEEP_POINTS}) r(t)),
agg AS (
  SELECT thr.threshold,
         SUM(CASE WHEN g.score >= thr.threshold THEN g.p ELSE 0 END)::BIGINT AS tp,
         SUM(CASE WHEN g.score >= thr.threshold THEN g.c - g.p ELSE 0 END)::BIGINT AS fp,
         SUM(g.p)::BIGINT AS n_pos
  FROM thr CROSS JOIN grp g GROUP BY thr.threshold
)
SELECT CAST(threshold AS BIGINT) AS threshold_cents, tp, fp,
       CAST(tp * 1000000 // NULLIF(tp + fp, 0) AS BIGINT) AS precision_ppm,
       CAST(tp * 1000000 // NULLIF(n_pos, 0) AS BIGINT) AS recall_ppm
FROM agg
""",
    tags=("ml", "evaluation", "north-star"),
)
def ml_pr_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The precision-recall curve at a fixed threshold grid — the sweep
    behind threshold selection, computed WITHOUT re-scanning the corpus
    per threshold: one groupBy(score) pass builds the distinct-score
    groups (the same relation `ml_auc_rank_sum` ranks), and the
    10-threshold sweep is a broadcast cross against that tiny grouped
    relation.  Exact integer counts and ppm ratios throughout.

    Scale shape: corpus-sized work is the single per-user aggregation;
    the sweep itself touches |thresholds| x |distinct scores| rows —
    independent of user count.
    """
    base = _user_label_score(spark, sf_dir)
    grp = base.groupBy("score").agg(
        F.count("*").cast("long").alias("c"),
        F.sum("label").cast("long").alias("p"),
    )
    thr = spark.range(PR_SWEEP_POINTS).select(
        (F.col("id") * PR_SWEEP_STEP_CENTS).alias("threshold")
    )
    agg = (
        grp.crossJoin(F.broadcast(thr))
        .groupBy("threshold")
        .agg(
            F.sum(F.expr("CASE WHEN score >= threshold THEN p ELSE 0 END"))
            .cast("long")
            .alias("tp"),
            F.sum(F.expr("CASE WHEN score >= threshold THEN c - p ELSE 0 END"))
            .cast("long")
            .alias("fp"),
            F.sum("p").cast("long").alias("n_pos"),
        )
    )
    return agg.select(
        F.col("threshold").cast("long").alias("threshold_cents"),
        "tp",
        "fp",
        F.expr("CAST(tp * 1000000 div NULLIF(tp + fp, 0) AS BIGINT)").alias(
            "precision_ppm"
        ),
        F.expr("CAST(tp * 1000000 div NULLIF(n_pos, 0) AS BIGINT)").alias(
            "recall_ppm"
        ),
    )


@register(
    "pipeline_model_eval_e2e",
    oracle=f"""
WITH base AS ({_BASE_DUCK}),
grp AS (
  SELECT score, COUNT(*)::BIGINT AS c, SUM(label)::BIGINT AS p
  FROM base GROUP BY score
),
ranked AS (
  SELECT score, c, p,
         COALESCE(SUM(c) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM grp
),
auc AS (
  SELECT SUM(p)::BIGINT AS n_pos,
         SUM(c - p)::BIGINT AS n_neg,
         SUM(p::HUGEINT * (2 * (cum_before + 1) + c - 1))::HUGEINT AS s2_raw
  FROM ranked
),
conf AS (
  SELECT
    SUM(CASE WHEN score >= {CONFUSION_THRESHOLD_CENTS} AND label = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
    SUM(CASE WHEN score >= {CONFUSION_THRESHOLD_CENTS} AND label = 0 THEN 1 ELSE 0 END)::BIGINT AS fp,
    SUM(CASE WHEN score <  {CONFUSION_THRESHOLD_CENTS} AND label = 0 THEN 1 ELSE 0 END)::BIGINT AS tn,
    SUM(CASE WHEN score <  {CONFUSION_THRESHOLD_CENTS} AND label = 1 THEN 1 ELSE 0 END)::BIGINT AS fn
  FROM base
)
SELECT 'n_pos' AS metric, n_pos AS value FROM auc
UNION ALL SELECT 'n_neg', n_neg FROM auc
UNION ALL SELECT 'auc_ppm',
  CAST((s2_raw - n_pos::HUGEINT * (n_pos + 1)) * 1000000
       // NULLIF(2 * n_pos::HUGEINT * n_neg, 0) AS BIGINT) FROM auc
UNION ALL SELECT 'tp', tp FROM conf
UNION ALL SELECT 'fp', fp FROM conf
UNION ALL SELECT 'tn', tn FROM conf
UNION ALL SELECT 'fn', fn FROM conf
UNION ALL SELECT 'precision_ppm',
  CAST(tp * 1000000 // NULLIF(tp + fp, 0) AS BIGINT) FROM conf
UNION ALL SELECT 'recall_ppm',
  CAST(tp * 1000000 // NULLIF(tp + fn, 0) AS BIGINT) FROM conf
UNION ALL SELECT 'f1_ppm',
  CAST(2 * tp * 1000000 // NULLIF(2 * tp + fp + fn, 0) AS BIGINT) FROM conf
""",
    tags=("ml", "evaluation", "pipeline", "north-star"),
)
def pipeline_model_eval_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full model report from ONE materialized label/score pass:
    the per-user relation is built and persisted once, and every
    readout (AUC rank-sum, confusion counts, ppm metrics) derives from
    it — the composed twin of the individual `ml_*` queries, shaped the
    way a 100 TB evaluation actually runs (score the holdout once,
    persist the per-unit relation, read every metric off it; the
    corpus-sized scan happens exactly once).

    Output is long-form (metric, value) so adding a readout never
    changes the schema.
    """
    from uda_spark.cache import tracked_persist

    base = tracked_persist(_user_label_score(spark, sf_dir))
    grp = base.groupBy("score").agg(
        F.count("*").cast("long").alias("c"),
        F.sum("label").cast("long").alias("p"),
    )
    stats = rank_sum_stats(grp)
    thr = CONFUSION_THRESHOLD_CENTS
    conf = base.agg(
        F.sum(F.expr(f"CASE WHEN score >= {thr} AND label = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("tp"),
        F.sum(F.expr(f"CASE WHEN score >= {thr} AND label = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("fp"),
        F.sum(F.expr(f"CASE WHEN score < {thr} AND label = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("tn"),
        F.sum(F.expr(f"CASE WHEN score < {thr} AND label = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("fn"),
    )
    auc_rows = stats.selectExpr(
        "stack(3, 'n_pos', n_pos, 'n_neg', n_neg, 'auc_ppm', auc_ppm)"
        " AS (metric, value)"
    )
    conf_rows = conf.selectExpr(
        "stack(7, 'tp', tp, 'fp', fp, 'tn', tn, 'fn', fn, "
        "'precision_ppm', CAST(tp * 1000000 div NULLIF(tp + fp, 0) AS BIGINT), "
        "'recall_ppm', CAST(tp * 1000000 div NULLIF(tp + fn, 0) AS BIGINT), "
        "'f1_ppm', CAST(2 * tp * 1000000 div NULLIF(2 * tp + fp + fn, 0) AS BIGINT)"
        ") AS (metric, value)"
    )
    return auc_rows.unionByName(conf_rows)
