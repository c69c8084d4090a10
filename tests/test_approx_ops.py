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
    # the query carries its own bound check (within_bound column vs the
    # exact count it also computes); assert it holds and the exact count
    # matches an independent computation
    rows = all_specs()["approx_distinct_users"].fn(spark, SF_SMOKE).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert rows
    for r in rows:
        assert r["within_bound"], r
        assert r["exact_users"] == exact[r["event_type"]], r


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


def test_embedding_exact_mode_gated_by_row_cap(spark):
    import pytest
    from pyspark.sql import functions as F
    from uda_spark.operators.similarity import embedding_near_dup_pairs

    big = spark.range(101).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.5)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="use_lsh=True"):
        embedding_near_dup_pairs(
            big, "vec_id", "embedding", threshold=0.9, max_exact_rows=100
        )


def test_scaled_n_planes_knob():
    """VERDICT r12 #6: the data-scaled plane count is the production
    default.  Pin the formula to the two MEASURED LSHKNOB.json points
    (sf0.1 tier n=2000 -> 4 planes; 10x synth tier n=20000 -> 7 planes,
    which held candidate growth to 14.7x vs 100.8x frozen), plus the
    floor/monotonicity/target-bucket invariants the formula promises."""
    from uda_spark.operators.similarity import (
        LSH_TARGET_BUCKET_ROWS,
        scaled_n_planes,
    )

    # the two measured knob points
    assert scaled_n_planes(2_000) == 4
    assert scaled_n_planes(20_000) == 7
    # floor: tiny corpora keep the oracle-era 4 planes
    for n in (0, 1, 100, LSH_TARGET_BUCKET_ROWS):
        assert scaled_n_planes(n) == 4
    # expected bucket population stays within [target/2, target] once
    # past the floor: 2^planes >= n/target > 2^(planes-1)
    for n in (10_001, 123_456, 10**7, 10**9):
        p = scaled_n_planes(n)
        assert n / (1 << p) <= LSH_TARGET_BUCKET_ROWS
        assert n / (1 << (p - 1)) > LSH_TARGET_BUCKET_ROWS
    # monotone non-decreasing in n
    vals = [scaled_n_planes(n) for n in range(1, 50_000, 997)]
    assert vals == sorted(vals)


def test_scaled_planes_is_the_lsh_default(spark):
    """The operator applies scaled_n_planes when n_planes is omitted:
    at a corpus size where the knob picks MORE planes than the frozen 4,
    the default run's pair set must equal an explicit n_planes=
    scaled_n_planes(n) run (and both remain subsets of the 4-plane
    superset, since fewer planes = coarser buckets = more candidates)."""
    from pyspark.sql import functions as F

    from uda_spark.operators.similarity import (
        embedding_near_dup_pairs,
        scaled_n_planes,
    )

    n = 5000  # n/target = 20 in (2^4, 2^5]: the knob picks 5 planes
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 15), "
            "j -> CAST(((id * (j * 2654435761 + 40503)) % 997) - 498 AS DOUBLE) / 100.0)"
        ).alias("embedding"),
    )
    p = scaled_n_planes(n)
    assert p == 5
    got_default = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            df, "vec_id", "embedding", threshold=0.6, use_lsh=True
        ).collect()
    }
    got_explicit = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            df, "vec_id", "embedding", threshold=0.6, use_lsh=True, n_planes=p
        ).collect()
    }
    got_frozen4 = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            df, "vec_id", "embedding", threshold=0.6, use_lsh=True, n_planes=4
        ).collect()
    }
    assert got_default == got_explicit
    assert got_default <= got_frozen4


def test_connected_components_matches_union_find(spark):
    from uda_spark.operators.dedup import connected_components

    edges = [(1, 2), (2, 3), (10, 11), (5, 6), (6, 7), (7, 5), (3, 10)]
    # plain union-find reference
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    expect = {n: find(n) for n in parent}
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == expect


def test_approx_percentile_within_bound(spark):
    # the query emits GK rank-contract checks per priority; assert they
    # hold for every group
    rows = all_specs()["approx_percentile_prices"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["p50_ok"] and r["p95_ok"], r


def test_hll_two_level_matches_exact_within_bound(spark):
    from pyspark.sql import functions as F3

    rows = all_specs()["hll_sketch_two_level"].fn(spark, SF_SMOKE).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F3.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert rows
    for r in rows:
        assert r["within_bound"], r
        assert r["exact_users"] == exact[r["event_type"]], r


def test_quantized_knn_recall(spark):
    # int8 codes keep ~7 bits of per-dim precision; on the synthetic
    # near-uniform embeddings the ranking stays close to the exact one
    exact = _topk_sets(all_specs()["sim_knn_bruteforce"].fn(spark, SF_SMOKE))
    quant = _topk_sets(all_specs()["sim_quantized_knn"].fn(spark, SF_SMOKE))
    recalls = [
        len(exact[q] & quant.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_pq_knn_recall(spark):
    # PQ ranks by approximate L2; compare against the exact L2 ranking
    # computed inline (the registered brute-force query ranks by cosine,
    # a different metric).  These embeddings are near-uniform — the
    # worst case for PQ (m=8, k=16, 1 Lloyd iter) — so the floor is
    # conservative, same rationale as the IVF floor above.
    from collections import defaultdict

    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    rows = emb.collect()
    vecs = {r["vec_id"]: r["embedding"] for r in rows}
    exact = {}
    for q in range(10):
        d2 = sorted(
            (sum((a - b) ** 2 for a, b in zip(vecs[q], v)), i)
            for i, v in vecs.items()
            if i != q
        )
        exact[q] = {i for _, i in d2[:5]}
    pq = defaultdict(set)
    for r in all_specs()["sim_pq_knn"].fn(spark, SF_SMOKE).collect():
        pq[r["query_id"]].add(r["neighbor_id"])
    recalls = [len(exact[q] & pq[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.15, recalls


def test_ivfpq_knn_recall(spark):
    # Composed approximations multiply: IVF probe recall (~nprobe/k on
    # these near-uniform embeddings) x PQ ranking recall, so expected
    # recall vs exact L2 is ~0.1-0.2 here (measured 0.14/0.20 at
    # sf0.001/sf0.01).  The floor only guards against catastrophic
    # breakage — exactness is pinned by the value-hash oracle.
    from collections import defaultdict

    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    exact = {}
    for q in range(10):
        d2 = sorted(
            (sum((a - b) ** 2 for a, b in zip(vecs[q], v)), i)
            for i, v in vecs.items()
            if i != q
        )
        exact[q] = {i for _, i in d2[:5]}
    got = defaultdict(set)
    for r in all_specs()["sim_ivfpq_knn"].fn(spark, SF_SMOKE).collect():
        got[r["query_id"]].add(r["neighbor_id"])
    recalls = [len(exact[q] & got[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.05, recalls


def test_cms_one_sided_error(spark):
    # CMS never undercounts (every occurrence increments every row's
    # bucket), and with w=256 >> 20 heavy hitters the top tokens should
    # estimate close to exact: overcount bounded by corpus_tokens / w
    # in expectation per colliding bucket.
    rows = all_specs()["text_cms_heavy_hitters"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["overcount"] >= 0, r
        assert r["cms_n"] >= r["exact_n"], r


def test_exact_embedding_pairs_blocked_gemm_complete(spark):
    """The blocked-GEMM exact path must reproduce the naive all-pairs
    computation EXACTLY: every block-pair routing case (same-block strict
    mask, cross-block swap), the conservative in-task prefilter, and the
    fixed-point arithmetic are all covered by comparing against a pure
    python reference over vectors that hash into every block."""
    import math
    import random

    import numpy as np

    from uda_spark.operators.similarity import embedding_near_dup_pairs

    rnd = random.Random(7)
    n, d, thr = 80, 8, 0.2
    rows = [(i, [rnd.uniform(-1.0, 1.0) for _ in range(d)]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in embedding_near_dup_pairs(
            df, "vec_id", "embedding", threshold=thr
        ).collect()
    }
    assert all(a < b for a, b in got)

    # pure-python reference of the registered fixed-point semantics:
    # float32 storage -> round-half-up(x * 1e6) int64 -> exact dot ->
    # double cosine -> 6 dp
    def half_up(x: float) -> int:
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    iv = {
        i: [half_up(float(np.float32(x)) * 1_000_000) for x in v]
        for i, v in rows
    }
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            dot = sum(x * y for x, y in zip(iv[a], iv[b]))
            na = sum(x * x for x in iv[a])
            nb = sum(x * x for x in iv[b])
            score = round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)
            if score >= thr:
                want[(a, b)] = score
    assert got == want


import pytest


@pytest.mark.slow
def test_blocked_gemm_scale_stress(spark):
    """Blocked-GEMM exact pairs at ~15x the bench corpus: 30k vectors
    (dim 32) of deterministic near-orthogonal noise plus 500 planted
    exact-duplicate twins.  At threshold 0.9 (≈5σ of the random-cosine
    distribution at dim 32) the expected background pair count is ~0,
    so the output must be EXACTLY the planted set — completeness (every
    twin found, across whatever blocks the ids hash into) and soundness
    (no phantom pairs from the prefilter/mask logic) in one assertion.
    Also pins the memory contract: no task materializes more than
    _GEMM_CHUNK_CELLS dot cells even though a full block-pair here is
    (30k/8)^2 ≈ 14M pairs."""
    from pyspark.sql import functions as F

    from uda_spark.operators.similarity import embedding_near_dup_pairs

    n, d, twins = 30_000, 32, 500
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            # deterministic pseudo-noise in [-1, 1): md5-seeded per (id, dim)
            f"transform(sequence(0, {d - 1}), j -> CAST("
            "  (CAST(conv(substring(md5(concat(CAST(id AS STRING), '|', CAST(j AS STRING))), 1, 8), 16, 10) AS DOUBLE)"
            "   / 2147483648.0) - 1.0 AS FLOAT))"
        ).alias("embedding"),
    )
    dups = base.where(F.col("vec_id") < twins).select(
        (F.col("vec_id") + n).alias("vec_id"), "embedding"
    )
    corpus = base.unionByName(dups)
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            corpus, "vec_id", "embedding", threshold=0.9,
            max_exact_rows=n + twins,
        ).collect()
    }
    want = {(i, i + n) for i in range(twins)}
    assert got == want
