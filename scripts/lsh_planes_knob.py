#!/usr/bin/env python
"""n_planes knob proof for the SRP-LSH pair stage (round 12).

The 4th-decade probe measured `dedup_threshold_sweep_lsh` at 3.42x for
sf0.1 -> sf1_synth.  That is the FIXED-parameterization cost curve: the
registered query pins n_planes = 4 (so its DuckDB oracle can embed the
sign matrix), which means 2^4 buckets per table — per-bucket population
grows linearly with n and candidate work grows ~ sum(bucket^2).  The
documented production knob is n_planes ~ log2(n / target_bucket): each
extra plane halves expected bucket size, so a 10x corpus with +3 planes
(or ~3.3 for exactly 10x) keeps per-bucket population — and therefore
per-task GEMM work — roughly constant.

This probe MEASURES that claim instead of leaving it prose: it runs the
operator-level LSH pair stage (embedding_near_dup_pairs(use_lsh=True),
the same code path the registered query calls) on the sf0.1 tier with
n_planes=4 and on a synthesized 10x tier with BOTH n_planes=4 (the
fixed-parameterization cost the curve shows) and n_planes=7 (the knob
applied: 4 + ceil(log2(10)) ≈ 7).  For each run it records wall time
and the candidate-pair count (the sum-of-bucket-squares work the knob
is supposed to bound).  If the knob thesis is right, candidates at
(10x, planes=7) land near the (1x, planes=4) level rather than ~100x —
wall-clock follows, minus the fixed scan/shuffle floor.

Recall caveat, stated plainly: more planes = lower per-table collision
probability at equal cosine, so production pairs +planes with more
tables (the L knob) to hold recall; this probe holds L=8 fixed because
it measures the COST side.  The quality side is graded by the
registered recall audits (dedup_lsh_recall_eval, sim_recall_at_k_curve).

Writes LSHKNOB.json at the repo root.

Run:  python scripts/lsh_planes_knob.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from uda_spark.cache import release_persisted  # noqa: E402
from uda_spark.operators import similarity as S  # noqa: E402
from uda_spark.queries.common import t  # noqa: E402
from uda_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
COPIES = 10
ITERS = 2
THRESHOLD = 0.20  # the sweep's lowest cutoff — the expensive end


def _inflate_embeddings(spark, out_dir: str) -> None:
    """10x embeddings tier: vec_id offsets + per-copy perturbation so the
    tier has distinct vectors (same scheme as scale_extra_decade)."""
    emb = t(spark, BASE_SF, "embeddings")
    vid_span = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    copies = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * vid_span))
        .withColumn(
            "embedding",
            F.expr(f"transform(embedding, x -> CAST(x + {i} * 0.0011 AS FLOAT))"),
        )
        for i in range(COPIES)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))


def _measure(spark, sf_dir: str, n_planes: int) -> dict:
    emb = t(spark, sf_dir, "embeddings")
    best_sec, pairs, cands = None, None, None
    for _ in range(ITERS):
        t0 = time.monotonic()
        scored = S.embedding_near_dup_pairs(
            emb, "vec_id", "embedding",
            threshold=THRESHOLD, use_lsh=True, n_planes=n_planes,
        )
        pairs = scored.count()
        dt = time.monotonic() - t0
        release_persisted()
        best_sec = dt if best_sec is None else min(best_sec, dt)
    # candidate volume = sum over (table, bucket) of c*(c-1)/2 — the
    # pre-filter work the planes knob bounds (independent of threshold)
    buckets = S.srp_buckets(emb, "vec_id", "embedding", n_planes, 8)
    cands = (
        buckets.groupBy("table", "bucket")
        .count()
        .agg(F.sum(F.expr("count * (count - 1) div 2")))
        .first()[0]
    )
    return {"n_planes": n_planes, "sec": round(best_sec, 3),
            "candidate_pairs": int(cands), "scored_pairs": int(pairs)}


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        "uda_lsh_planes_knob", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    synth_dir = os.path.join(tempfile.gettempdir(), "uda_lshknob_synth")
    _inflate_embeddings(spark, synth_dir)

    rows = {
        "sf0.1_planes4": _measure(spark, BASE_SF, 4),
        "sf1_synth_planes4": _measure(spark, synth_dir, 4),
        "sf1_synth_planes7": _measure(spark, synth_dir, 7),
    }
    fixed = rows["sf1_synth_planes4"]["candidate_pairs"]
    knob = rows["sf1_synth_planes7"]["candidate_pairs"]
    base = rows["sf0.1_planes4"]["candidate_pairs"]

    # Recall side at the SAME 10x tier (VERDICT r12 #6: the knob is now
    # the production default, so its recall trade must be measured, not
    # delegated as prose).  Ground truth = the exact O(n²) blocked GEMM
    # at the same threshold (n=20k is within deliberate-exact range);
    # recall = |lsh ∩ exact| / |exact| for the frozen 4-plane baseline,
    # the scaled 7-plane knob alone, and the knob with the L (tables)
    # compensation doubled.
    # Recall is threshold-dependent (per-table SRP collision probability
    # rises with cosine), so measure BOTH the sweep's expensive low end
    # (0.2) and the production near-dup cutoff (0.35) from one exact
    # pass — the 0.35 row is what the "milder at the production
    # threshold" guidance rests on.
    PROD_T = 0.35
    emb10 = t(spark, synth_dir, "embeddings")
    n10 = emb10.count()
    exact = (
        S.embedding_near_dup_pairs(
            emb10, "vec_id", "embedding", threshold=THRESHOLD,
            max_exact_rows=n10, n_rows=n10,
        )
        .select("id_a", "id_b", "score")
        .persist()
    )
    n_truth = {thr: exact.where(F.col("score") >= thr).count()
               for thr in (THRESHOLD, PROD_T)}
    recall = {}
    for planes, tables in [(4, 8), (7, 8), (7, 16)]:
        lsh = S.embedding_near_dup_pairs(
            emb10, "vec_id", "embedding", threshold=THRESHOLD,
            use_lsh=True, n_planes=planes, n_tables=tables,
        ).select("id_a", "id_b", F.col("score").alias("lscore")).persist()
        row = {}
        for thr in (THRESHOLD, PROD_T):
            found = (
                exact.where(F.col("score") >= thr)
                .join(lsh.where(F.col("lscore") >= thr),
                      on=["id_a", "id_b"], how="left_semi")
                .count()
            )
            row[f"t{thr}"] = {
                "n_found": int(found),
                "recall": round(found / n_truth[thr], 4)
                if n_truth[thr] else None,
            }
        lsh.unpersist()
        release_persisted()
        recall[f"planes{planes}_tables{tables}"] = row
    exact.unpersist()

    out = {
        "probe": "lsh_planes_knob",
        "threshold": THRESHOLD,
        "n_tables": 8,
        "rows": rows,
        "candidate_growth_fixed_planes": round(fixed / base, 2),
        "candidate_growth_with_knob": round(knob / base, 2),
        "recall_10x_tier": {
            "thresholds": [THRESHOLD, PROD_T],
            "n_rows": int(n10),
            "n_exact_pairs": {f"t{thr}": int(v) for thr, v in n_truth.items()},
            **recall,
        },
        "note": (
            "10x corpus: fixed n_planes=4 grows candidates "
            f"{fixed / base:.1f}x (the 3.42x wall-clock decade in "
            "SCALECURVE); n_planes=7 (the log2-scaling knob, now the "
            "production default via similarity.scaled_n_planes) holds "
            f"them to {knob / base:.1f}x of the 1x-tier volume. "
            "recall_10x_tier measures the trade against the exact "
            "blocked-GEMM ground truth at BOTH thresholds: at the "
            f"sweep's low end (t={THRESHOLD}) the knob costs recall "
            f"{recall['planes4_tables8'][f't{THRESHOLD}']['recall']} -> "
            f"{recall['planes7_tables8'][f't{THRESHOLD}']['recall']} at "
            "fixed L=8 (per-table collision probability decays "
            "exponentially in planes at low similarity) and doubling L "
            f"recovers {recall['planes7_tables16'][f't{THRESHOLD}']['recall']}; "
            f"at the production near-dup cutoff (t={PROD_T}) the same "
            "moves read "
            f"{recall['planes4_tables8'][f't{PROD_T}']['recall']} -> "
            f"{recall['planes7_tables8'][f't{PROD_T}']['recall']} -> "
            f"{recall['planes7_tables16'][f't{PROD_T}']['recall']} (L=16). "
            "The honest production pairing: scaled planes bound COST; "
            "to hold recall scale L multiplicatively with added planes, "
            "or keep low-threshold sweeps on the banded-MinHash / "
            "prefix-filter exact paths, which are complete by "
            "construction (dedup_lsh_recall_eval grades that family)."
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "LSHKNOB.json"
    )
    line = json.dumps(out)
    print(line)
    with open(path, "w") as fh:
        fh.write(line + "\n")
    shutil.rmtree(synth_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
