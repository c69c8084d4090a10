"""Multimodal column plumbing: schemas, Arrow batch shapes, determinism,
and downstream composition with the similarity operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from uda_spark.multimodal import (
    attach_blob_column,
    decode_images,
    extract_features,
    sample_frames,
)
from uda_spark.sources.tables import load_table


def _blobs(spark, n=50):
    # filter, not limit: GlobalLimit inserts an Exchange SinglePartition,
    # which would make the map-only plan assertions below vacuously fail
    docs = load_table(spark, SF_SMOKE, "documents").where(F.col("doc_id") < n)
    return attach_blob_column(docs, "text", "doc_id")


def test_blob_schema(spark):
    blobs = _blobs(spark)
    assert dict(blobs.dtypes)["data"] == "binary"
    meta_fields = [f.name for f in blobs.schema["meta"].dataType.fields]
    assert meta_fields == ["mime", "width", "height", "duration_ms", "n_bytes"]


def test_decode_deterministic_and_complete(spark):
    blobs = _blobs(spark)
    a = {r["id"]: r["pixels_fp"] for r in decode_images(blobs, "doc_id").collect()}
    b = {r["id"]: r["pixels_fp"] for r in decode_images(blobs, "doc_id").collect()}
    assert a == b
    assert len(a) == blobs.count()


def test_decode_is_map_only(spark):
    from uda_spark.plans.explain import count_exchanges

    decoded = decode_images(_blobs(spark), "doc_id")
    assert count_exchanges(decoded) == 0


def test_features_feed_similarity(spark):
    from uda_spark.operators.similarity import knn_bruteforce

    feats = extract_features(_blobs(spark), "doc_id")
    row = feats.first()
    assert len(row["embedding"]) == 8
    queries = feats.where(F.col("id") < 3)
    knn = knn_bruteforce(feats, queries, "id", "embedding", top_k=3)
    got = knn.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in got)


def test_frame_sampling_fanout(spark):
    frames = sample_frames(_blobs(spark, n=10), n_frames=4, id_col="doc_id")
    counts = frames.groupBy("id").count().collect()
    assert len(counts) == 10 and all(r["count"] == 4 for r in counts)
