"""Graph operators over pair/edge relations (iterative DataFrame loops).

Companion to dedup.connected_components: where cc answers "which rows
are the same thing", PageRank answers "which node is the most central
representative" — useful for picking canonical documents in large
near-dup clusters and for influence-weighting crawl frontiers.

Determinism: ranks are kept in fixed-point integers (1e9 scale) and
every step is integer arithmetic (div is floor division in both Spark
and DuckDB), so the result is bit-identical across engines and
partitionings — float PageRank would be order-dependent in the
contribution sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FP = 1_000_000_000  # fixed-point scale


def pagerank_fp(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    iterations: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-point PageRank over the undirected pair graph.

    rank0 = FP div n_nodes; each iteration:
      contrib(src) = rank(src) div degree(src)        (integer floor div)
      rank'(dst)  = (FP * (100 - damping_pct)) div (100 * n) +
                    (damping_pct * sum(contribs into dst)) div 100

    Scale shape per iteration: one shuffle of (node, rank) onto the edge
    list keyed by src, one groupBy(dst) sum — same two-exchange loop as
    connected_components, lineage truncated per round.  The edge list
    and degrees are materialized once.

    Output: (node, rank_fp BIGINT) — exact, engine-portable integers.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    base_int = (FP * (100 - damping_pct)) // (100 * n)
    ranks = nodes.withColumn("rank_fp", F.lit(FP // n))
    for _ in range(iterations):
        contribs = (
            edges.join(deg, on="src")
            .join(ranks.withColumnsRenamed({"node": "src"}), on="src")
            .select("dst", F.expr("rank_fp div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                F.expr(
                    f"{base_int}L + ({damping_pct} * coalesce(s, 0L)) div 100"
                ).alias("rank_fp"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "rank_fp")
