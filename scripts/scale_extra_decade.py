#!/usr/bin/env python
"""Fourth scale-curve decade for the floor-exit queries (VERDICT r09 #7).

``kv_partition_merge`` (7.6x), ``udf_cogroup_order_lines`` (8.5x) and the
two multimodal blob queries (7.4x / 8.0x) exit the session-overhead floor
only in their LAST measured decade (sf0.01 -> sf0.1), so their final
ratio conflates floor-exit with real growth.  This probe synthesizes a
10x tier ("sf1_synth") from sf0.1 — the same trick the stress harness
uses for terasort/cumulative — and records a 4th curve point per query,
merged into SCALECURVE.json under ``sec.sf1_synth`` plus an extended
``ratio_per_10x``.

Synthesis preserves what each plan is sensitive to:
  * lineitem/orders: 10 copies with key offsets (l_orderkey/o_orderkey
    += i * (max_key + 1)) — key cardinality grows 10x like a real SF
    bump, so exchanges, cogroups and per-key group counts scale honestly
    (plain duplication would deepen groups instead of widening them);
  * documents: 10 copies with doc_id offsets and per-copy text salt —
    blob bytes (md5-derived from text) stay distinct, so the multimodal
    decode work and payload-distinct counts scale like real data.

NOTE: a full ``scripts/scale_curve.py`` re-run rewrites these rows with
3-point curves; re-run this probe afterwards to restore the 4th point.

Run:  python scripts/scale_extra_decade.py            (all four)
      python scripts/scale_extra_decade.py NAME ...   (subset)
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
from uda_spark.registry import all_specs  # noqa: E402
from uda_spark.queries.common import t  # noqa: E402
from uda_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
COPIES = 10
ITERS = 2
TARGETS = (
    "kv_partition_merge",
    "udf_cogroup_order_lines",
    "multimodal_decode_stats",
    "multimodal_resize_stats",
    # round-11 additions (VERDICT r10 #6): the remaining 3-decade tails
    # whose last ratio was still floor-exit-shaped (4.9–6.6x), plus the
    # re-parameterized SemDeDup so the k ∝ n contract has a 4th point
    "text_ngram_jaccard_pairs",
    "text_decontaminate",
    "text_repetition_stats",
    "text_cms_heavy_hitters",
    "dedup_semdedup_clusters",
    # round-12 additions: the two new dedup queries' last measured decade
    # (sf0.01 -> sf0.1) is floor-exit-shaped (1.21x / 1.34x), so pin a
    # genuine 4th point; the hierarchical quantizer also gets its
    # multi-partition cogroup exercised at 10x here
    "dedup_semdedup_hier_clusters",
    "dedup_threshold_sweep_lsh",
)
# tables the target plans actually read — only these are synthesized
NEEDED = ("lineitem", "orders", "documents", "embeddings")

# Multimodal blob queries are CPU-bound on the synthesized pixel-buffer
# volume, not the row count — their honest scale claim is "seconds per
# decoded GB is ~constant" (VERDICT r11 #6), so their SCALECURVE rows
# carry the decoded byte volume per tier (bytes = Σ 2·w·h hex chars the
# stub codec materializes, + the fixed 2·64·64 resize target buffer for
# the resize query) and the derived sec_per_gb series.
BYTE_TRACKED = {
    "multimodal_decode_stats": 0,
    "multimodal_resize_stats": 2 * 64 * 64,
}


def _decoded_bytes(spark, sf_dir: str, extra_per_img: int) -> int:
    """Decoded pixel-buffer bytes for one tier: Σ (2·w·h + extra) over
    the attached-blob relation — the exact buffer sizes the stub codec
    materializes (multimodal/blob.py:_fake_decode_hex)."""
    from uda_spark.multimodal import blob as MM

    docs = t(spark, sf_dir, "documents")
    blobs = MM.attach_blob_column(docs, "text", "doc_id")
    return int(
        blobs.agg(
            F.sum(
                F.expr(
                    "2 * CAST(meta.width AS BIGINT) * meta.height"
                    f" + {int(extra_per_img)}"
                )
            )
        ).first()[0]
    )


def _inflate(spark, out_dir: str) -> None:
    """Write the 10x tier: i-indexed unions with key offsets.  One job
    per table; each copy is a map-only projection of the sf0.1 scan, so
    synthesis itself is linear and parallel."""
    li = t(spark, BASE_SF, "lineitem")
    ok_span = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    copies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * ok_span))
        for i in range(COPIES)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))

    orders = t(spark, BASE_SF, "orders")
    copies = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * ok_span))
        for i in range(COPIES)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))

    docs = t(spark, BASE_SF, "documents")
    did_span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * did_span)).withColumn(
            "text", F.concat(F.col("text"), F.lit(f" r{i}"))
        )
        for i in range(COPIES)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    # embeddings: vec_id offsets + a tiny per-copy float perturbation so
    # the 10x tier has DISTINCT vectors (plain duplication would plant
    # 10-way exact-dup clusters and measure a dup-pathology workload
    # instead of a bigger corpus); labels unchanged.
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


def main() -> None:
    only = set(sys.argv[1:]) or set(TARGETS)
    unknown = only - set(TARGETS)
    if unknown:
        sys.exit(f"not a floor-exit target: {sorted(unknown)}")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        "uda_scale_extra_decade", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    synth_dir = os.path.join(tempfile.gettempdir(), "uda_sf1_synth")
    _inflate(spark, synth_dir)
    print(f"# synthesized {COPIES}x tier at {synth_dir}", file=sys.stderr)

    specs = all_specs()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALECURVE.json"
    )
    with open(path) as fh:
        curve = json.load(fh)
    for name in TARGETS:
        if name not in only:
            continue
        best = None
        for _ in range(ITERS):
            t0 = time.monotonic()
            specs[name].fn(spark, synth_dir).collect()
            dt = time.monotonic() - t0
            release_persisted()
            best = dt if best is None else min(best, dt)
        row = curve["queries"][name]
        row["sec"]["sf1_synth"] = round(best, 3)
        base = row["sec"]["sf0.1"]
        ratios = row["ratio_per_10x"][:2]
        ratios.append(round(best / base, 2))
        row["ratio_per_10x"] = ratios
        print(f"# {name}: sf1_synth {best:.3f}s (4th-decade ratio "
              f"{best / base:.2f}x)", file=sys.stderr)
        if name in BYTE_TRACKED:
            extra = BYTE_TRACKED[name]
            tier_dirs = {
                "sf0.001": "/root/testdata/sf0.001",
                "sf0.01": "/root/testdata/sf0.01",
                "sf0.1": BASE_SF,
                "sf1_synth": synth_dir,
            }
            row["bytes"] = {
                tier: _decoded_bytes(spark, d, extra)
                for tier, d in tier_dirs.items()
                if tier in row["sec"]
            }
            row["sec_per_gb"] = {
                tier: round(row["sec"][tier] / (b / 1e9), 2)
                for tier, b in row["bytes"].items()
            }
            print(f"# {name}: sec/GB {row['sec_per_gb']}", file=sys.stderr)
    with open(path, "w") as fh:
        fh.write(json.dumps(curve) + "\n")
    print(json.dumps({
        k: curve["queries"][k]["ratio_per_10x"] for k in TARGETS if k in only
    }))
    shutil.rmtree(synth_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
