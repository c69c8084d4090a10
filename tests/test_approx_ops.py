"""Accuracy bounds for the approximate operators (no SQL oracle by
design): HLL cardinality error, LSH/IVF recall vs exact brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from uda_spark.registry import all_specs
from uda_spark.sources.tables import load_table


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_approx_distinct_within_bound(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in all_specs()["approx_distinct_users"].fn(spark, SF_SMOKE).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(0.1 * n, 2), (k, approx[k], n)


def test_lsh_knn_recall(spark):
    exact = _topk_sets(all_specs()["sim_knn_bruteforce"].fn(spark, SF_SMOKE))
    lsh = _topk_sets(all_specs()["sim_lsh_knn"].fn(spark, SF_SMOKE))
    recalls = [
        len(exact[q] & lsh.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_ivf_knn_recall(spark):
    exact = _topk_sets(all_specs()["sim_knn_bruteforce"].fn(spark, SF_SMOKE))
    ivf = _topk_sets(all_specs()["sim_ivf_knn"].fn(spark, SF_SMOKE))
    # these embeddings are near-uniform (labels are NOT cosine clusters),
    # so expected recall is ~ nprobe/k = 0.3; assert a safe floor
    recalls = [len(exact[q] & ivf.get(q, set())) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.15, recalls


def test_embedding_near_dup_lsh_subset_and_recall(spark):
    specs = all_specs()
    exact = {
        (r["id_a"], r["id_b"])
        for r in specs["dedup_embedding_near_pairs"].fn(spark, SF_SMOKE).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in specs["dedup_embedding_near_pairs_lsh"].fn(spark, SF_SMOKE).collect()
    }
    assert lsh <= exact  # LSH candidates pass the same exact filter
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.4
