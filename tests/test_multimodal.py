"""Multimodal pipeline: schema, UDF signatures, batch shape — with REAL
decode for dependency-free formats (binary PPM/PGM, uncompressed 24-bit
BMP) and the stub fallback for formats needing PIL/ffmpeg."""

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
        assert row.mime_type == "image/x-portable-pixmap"
        assert row.byte_size == len(row.content)
        # the payload is a REAL decodable image with matching dims
        img = MM.decode_image(bytes(row.content))
        assert img.shape == (row.height, row.width, 3)

    def test_feature_extraction_shape(self, media):
        feats = MM.extract_image_features(media, dim=16)
        row = feats.first()
        assert len(row.feature) == 16
        assert "content" not in feats.columns  # binary dropped early

    def test_feature_extraction_deterministic(self, media):
        a = {r.media_ref: r.feature for r in MM.extract_image_features(media).collect()}
        b = {r.media_ref: r.feature for r in MM.extract_image_features(media).collect()}
        assert a == b

    def test_resize_real(self, media):
        out = MM.resize_images(media, 32, 32)
        row = out.first()
        assert row.width == 32 and row.height == 32
        # output is a real 32x32 PPM, decodable
        img = MM.decode_image(bytes(row.content))
        assert img.shape == (32, 32, 3)

    def test_frame_sampling(self, media):
        frames = MM.sample_video_frames(media.limit(3), every_ms=1000)
        got = frames.groupBy("media_ref").count().collect()
        assert all(r["count"] == 3 for r in got)  # default duration 3000ms

    def test_unstubbed_decode_raises(self):
        with pytest.raises(NotImplementedError):
            MM.decode_image_stub(b"bytes", use_stub=False)


class TestRealDecoders:
    def test_ppm_roundtrip(self):
        import numpy as np

        img = np.arange(2 * 3 * 3, dtype="uint8").reshape(2, 3, 3)
        assert (MM.decode_ppm(MM.encode_ppm(img)) == img).all()

    def test_ppm_comment_and_whitespace_header(self):
        import numpy as np

        raw = b"P6 # comment\n# another\n 3\t2 255\n" + bytes(range(18))
        img = MM.decode_ppm(raw)
        assert img.shape == (2, 3, 3)
        assert img.ravel().tolist() == list(range(18))

    def test_bmp_24bit_golden(self):
        # hand-built 2x2 24-bit BMP (bottom-up rows, BGR, 2-byte row pad)
        # pixels (RGB): top-left RED, top-right GREEN, bottom-left BLUE,
        # bottom-right WHITE
        header = (
            b"BM" + (70).to_bytes(4, "little") + b"\x00\x00\x00\x00"
            + (54).to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + (2).to_bytes(4, "little") + (2).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little") + (16).to_bytes(4, "little")
            + b"\x00" * 16
        )
        bottom_row = b"\xff\x00\x00" + b"\xff\xff\xff" + b"\x00\x00"  # BLUE, WHITE
        top_row = b"\x00\x00\xff" + b"\x00\xff\x00" + b"\x00\x00"     # RED, GREEN
        img = MM.decode_bmp(header + bottom_row + top_row)
        assert img.shape == (2, 2, 3)
        assert img[0, 0].tolist() == [255, 0, 0]      # red
        assert img[0, 1].tolist() == [0, 255, 0]      # green
        assert img[1, 0].tolist() == [0, 0, 255]      # blue
        assert img[1, 1].tolist() == [255, 255, 255]  # white

    def test_resize_nearest_known_pattern(self):
        import numpy as np

        img = np.zeros((2, 2, 3), dtype="uint8")
        img[0, 0] = 10; img[0, 1] = 20; img[1, 0] = 30; img[1, 1] = 40
        up = MM.resize_nearest(img, 4, 4)
        assert up.shape == (4, 4, 3)
        assert up[0, 0, 0] == 10 and up[0, 3, 0] == 20
        assert up[3, 0, 0] == 30 and up[3, 3, 0] == 40

    def test_dispatch_falls_back_to_stub(self):
        out = MM.decode_image(b"\x89PNG....", use_stub=True)
        assert out.shape == (8, 8)


class TestRealAudioVideo:
    def test_wav_roundtrip(self):
        import numpy as np

        samples = (np.sin(np.linspace(0, 20, 800)) * 10000).astype("<i2")
        raw = MM.encode_wav(samples.reshape(-1, 2), 16000)
        got, rate = MM.decode_wav(raw)
        assert rate == 16000
        assert got.shape == (400, 2)
        assert (got.ravel() == samples).all()

    def test_audio_features_real(self, spark):
        import numpy as np

        quiet = np.zeros(1600, dtype="<i2")
        loud = (np.ones(1600) * 20000).astype("<i2")
        samples = np.concatenate([quiet, loud])
        df = spark.createDataFrame(
            [("a1", "d1", bytearray(MM.encode_wav(samples, 8000)))],
            "media_ref string, doc_id string, content binary",
        )
        row = MM.extract_audio_features(df, n_windows=4).first()
        assert row.sample_rate == 8000
        f = row.feature
        # first half silent, second half loud
        assert f[0] < 1e-6 and f[1] < 1e-6
        assert f[2] > 0.5 and f[3] > 0.5

    def test_y4m_roundtrip_and_real_frame_sampling(self, spark):
        import numpy as np

        frames = [np.full((4, 6), i * 40, dtype="uint8") for i in range(5)]
        raw = MM.encode_y4m(frames, fps_num=2, fps_den=1)  # 2 fps, 2500ms
        dec, w, h, fps = MM.decode_y4m_frames(raw)
        assert (w, h, fps) == (6, 4, 2.0)
        assert len(dec) == 5 and (dec[3] == frames[3]).all()

        df = spark.createDataFrame(
            [("v1", "d1", bytearray(raw), 2500)],
            "media_ref string, doc_id string, content binary, duration_ms long",
        )
        got = MM.sample_video_frames(df, every_ms=1000).collect()
        # 2500ms at 1s cadence -> frames at 0, 1000, 2000ms = indexes 0,2,4
        assert [(r.frame_idx, r.ts_ms) for r in got] == [
            (0, 0), (1, 1000), (2, 2000)
        ]
        luma = MM.decode_image(bytes(got[2].frame))
        assert (luma[:, :, 0] == frames[4]).all()  # ts 2000ms * 2fps = frame 4

    def test_unstubbed_audio_raises(self, spark):
        df = spark.createDataFrame(
            [("a1", "d1", bytearray(b"ID3mp3bytes"))],
            "media_ref string, doc_id string, content binary",
        )
        import pytest as _pytest

        with _pytest.raises(Exception):
            MM.extract_audio_features(df, use_stub=False).collect()

    def test_short_wav_has_no_nan_features(self, spark):
        # clip shorter than n_windows samples: trailing windows are empty;
        # np.mean([]) is NaN and `or 0.0` does NOT catch NaN (ADVICE r3)
        import math

        import numpy as np

        samples = (np.ones(5) * 1000).astype("<i2")  # 5 samples, 16 windows
        df = spark.createDataFrame(
            [("a1", "d1", bytearray(MM.encode_wav(samples, 8000)))],
            "media_ref string, doc_id string, content binary",
        )
        feat = MM.extract_audio_features(df, n_windows=16).first().feature
        assert len(feat) == 16
        assert all(not math.isnan(x) for x in feat)
        assert feat[0] > 0  # the non-empty window carries signal
