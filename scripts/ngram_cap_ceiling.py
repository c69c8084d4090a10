#!/usr/bin/env python
"""Fifth-decade probe for text_ngram_jaccard_pairs (round 11).

The 4th-decade probe (scripts/scale_extra_decade.py) measured a 26.99x
ratio at sf0.1 -> sf1_synth.  That decade is the TRANSITION into the
block cap: at sf0.1 every (lang, source) block is ~a few hundred docs
(under NGRAM_BLOCK_CAP = 1000, so pair work still grows ~quadratically
with block size); at sf1_synth blocks pass the cap and the pair stage
saturates at #blocks x CAP^2 pairs BY DESIGN (gram arrays are built
only for cap survivors; everything else is a slim-column scan).

This probe synthesizes a 100x documents tier (same salt scheme as the
4th decade) and measures the 5th decade.  If the cap thesis is right,
the ratio collapses to ~1x: the pair stage is identical to the 10x
tier and only the slim scan + cap ranking grow (linearly).

Writes the sf10_synth point + ratio into SCALECURVE.json's
text_ngram_jaccard_pairs row.

Run:  python scripts/ngram_cap_ceiling.py
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
COPIES = 100
ITERS = 2


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        "uda_ngram_cap_ceiling", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    synth_dir = os.path.join(tempfile.gettempdir(), "uda_sf10_synth")
    docs = t(spark, BASE_SF, "documents")
    did_span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    out = None
    for i in range(COPIES):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * did_span)).withColumn(
            "text", F.concat(F.col("text"), F.lit(f" r{i}"))
        )
        out = c if out is None else out.unionByName(c)
    out.write.mode("overwrite").parquet(os.path.join(synth_dir, "documents.parquet"))
    print(f"# synthesized {COPIES}x documents at {synth_dir}", file=sys.stderr)

    spec = all_specs()["text_ngram_jaccard_pairs"]
    best = None
    for _ in range(ITERS):
        t0 = time.monotonic()
        spec.fn(spark, synth_dir).collect()
        dt = time.monotonic() - t0
        release_persisted()
        best = dt if best is None else min(best, dt)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALECURVE.json"
    )
    with open(path) as fh:
        curve = json.load(fh)
    row = curve["queries"]["text_ngram_jaccard_pairs"]
    row["sec"]["sf10_synth"] = round(best, 3)
    base = row["sec"]["sf1_synth"]
    row["ratio_per_10x"] = row["ratio_per_10x"][:3] + [round(best / base, 2)]
    with open(path, "w") as fh:
        fh.write(json.dumps(curve) + "\n")
    print(f"# text_ngram_jaccard_pairs: sf10_synth {best:.3f}s "
          f"(5th-decade ratio {best / base:.2f}x)", file=sys.stderr)
    print(json.dumps({"sf10_synth_sec": round(best, 3),
                      "ratio_vs_sf1_synth": round(best / base, 2)}))
    shutil.rmtree(synth_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
