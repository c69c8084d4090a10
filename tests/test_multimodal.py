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


class TestRealCodecSeam:
    """The use_real_codec=True branch is fully wired to PIL; this build
    environment ships no pillow (and installs are not permitted), so these
    run wherever pillow exists and skip here — the seam itself (the
    ImportError guard) is exercised unconditionally."""

    def test_real_codec_raises_without_pillow(self, spark):
        from uda_spark.multimodal.blob import _have_pil

        if _have_pil():
            import pytest

            pytest.skip("pillow present — covered by the roundtrip tests below")
        import pytest
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PySparkException

        with pytest.raises((Py4JJavaError, PySparkException, ImportError)):
            decode_images(_blobs(spark, n=2), "doc_id", use_real_codec=True).collect()

    def test_real_decode_dimensions_match_png(self, spark):
        import pytest

        from uda_spark.multimodal.blob import _have_pil

        if not _have_pil():
            pytest.skip("pillow not installed in this environment")
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (17, 9), (250, 10, 10)).save(buf, format="PNG")
        png = buf.getvalue()
        df = spark.createDataFrame([(1, png)], "doc_id long, payload binary").select(
            "doc_id",
            F.col("payload").alias("data"),
            F.expr(
                "named_struct('mime', 'image/png', 'width', 17, 'height', 9, "
                "'duration_ms', 0, 'n_bytes', CAST(length(payload) AS BIGINT))"
            ).alias("meta"),
        )
        row = decode_images(df, "doc_id", use_real_codec=True).first()
        assert (row["width"], row["height"]) == (17, 9)

    def test_real_resize_targets_dimensions(self, spark):
        import pytest

        from uda_spark.multimodal.blob import _have_pil

        if not _have_pil():
            pytest.skip("pillow not installed in this environment")
        import io

        from PIL import Image

        from uda_spark.multimodal import resize_images

        buf = io.BytesIO()
        Image.new("RGB", (31, 13), (0, 128, 255)).save(buf, format="PNG")
        png = buf.getvalue()
        df = spark.createDataFrame([(7, png)], "doc_id long, payload binary").select(
            "doc_id",
            F.col("payload").alias("data"),
            F.expr(
                "named_struct('mime', 'image/png', 'width', 31, 'height', 13, "
                "'duration_ms', 0, 'n_bytes', CAST(length(payload) AS BIGINT))"
            ).alias("meta"),
        )
        row = resize_images(df, 8, 8, "doc_id", use_real_codec=True).first()
        assert (row["src_width"], row["src_height"]) == (31, 13)
        assert (row["width"], row["height"]) == (8, 8)


def test_ahash_arrow_matches_pandas(spark):
    """The mapInArrow and mapInPandas aHash paths must be bit-identical
    — same codec seam, different Python batch transport."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from uda_spark import multimodal as MM
    from uda_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    blobs = MM.attach_blob_column(docs, "text", "doc_id")
    a = sorted((r.id, r.ahash) for r in MM.ahash_images(blobs, "doc_id").collect())
    b = sorted(
        (r.id, r.ahash) for r in MM.ahash_images_arrow(blobs, "doc_id").collect()
    )
    assert a == b and len(a) > 0


class TestAudioFrames:
    def test_frame_shape_and_amp_bounds(self, spark):
        from tests.conftest import SF_SMOKE
        from uda_spark import multimodal as MM
        from uda_spark.multimodal.blob import AUDIO_FRAME_LEN, AUDIO_N_SAMPLES
        from uda_spark.sources.tables import load_table

        import pyspark.sql.functions as F

        docs = load_table(spark, SF_SMOKE, "documents").limit(50)
        blobs = MM.attach_blob_column(docs, "text", "doc_id", mime="audio/pcm")
        frames = MM.decode_audio_frames(blobs, id_col="doc_id")
        per_clip = frames.groupBy("id").agg(
            F.count("*").alias("n"), F.min("amp").alias("lo"), F.max("amp").alias("hi")
        )
        rows = per_clip.collect()
        assert len(rows) == 50
        for r in rows:
            assert r["n"] == AUDIO_N_SAMPLES // AUDIO_FRAME_LEN
            assert 0 <= r["lo"] <= r["hi"] <= 255 * AUDIO_FRAME_LEN

    def test_real_codec_seam_raises(self, spark):
        import pytest as _pt

        from tests.conftest import SF_SMOKE
        from uda_spark import multimodal as MM
        from uda_spark.sources.tables import load_table

        docs = load_table(spark, SF_SMOKE, "documents").limit(2)
        blobs = MM.attach_blob_column(docs, "text", "doc_id", mime="audio/pcm")
        out = MM.decode_audio_frames(blobs, id_col="doc_id", use_real_codec=True)
        with _pt.raises(Exception, match="soundfile|PythonException"):
            out.collect()
