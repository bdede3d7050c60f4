"""Multimodal plumbing: schema, UDF signatures, batch shape (decode stubbed)."""

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.operators import extract as ex
from kernel_memory_spark.operators import multimodal as MM
from kernel_memory_spark.synth import synth_corpus


@pytest.fixture(scope="module")
def media(spark):
    corpus = synth_corpus(spark, 60)
    return MM.synth_media_for_corpus(ex.spans_view(corpus))


class TestMediaPlumbing:
    def test_media_rows_match_media_spans(self, spark, media):
        corpus = synth_corpus(spark, 60)
        n_media_spans = (
            ex.spans_view(corpus).filter(F.col("kind") == "media").count()
        )
        assert media.count() == n_media_spans

    def test_schema_and_payloads(self, media):
        row = media.first()
        assert row.mime_type == "image/png"
        assert row.byte_size == len(row.content) == 256

    def test_feature_extraction_shape(self, media):
        feats = MM.extract_image_features(media, dim=16)
        row = feats.first()
        assert len(row.feature) == 16
        assert "content" not in feats.columns  # binary dropped early

    def test_feature_extraction_deterministic(self, media):
        a = {r.media_ref: r.feature for r in MM.extract_image_features(media).collect()}
        b = {r.media_ref: r.feature for r in MM.extract_image_features(media).collect()}
        assert a == b

    def test_resize_plumbing(self, media):
        out = MM.resize_images(media, 32, 32)
        row = out.first()
        assert row.width == 32 and row.height == 32

    def test_frame_sampling(self, media):
        frames = MM.sample_video_frames(media.limit(3), every_ms=1000)
        got = frames.groupBy("media_ref").count().collect()
        assert all(r["count"] == 3 for r in got)  # default duration 3000ms

    def test_unstubbed_decode_raises(self):
        with pytest.raises(NotImplementedError):
            MM.decode_image_stub(b"bytes", use_stub=False)
