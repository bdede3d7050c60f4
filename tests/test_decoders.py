"""Content-decoder registry (IContentDecoder dispatch: last registered
wins; unsupported mimes skip with a reason)."""

import numpy as np

from kernel_memory_spark.operators import multimodal as MM
from kernel_memory_spark.operators.decoders import DecoderRegistry


def files_df(spark, rows):
    return spark.createDataFrame(
        rows, "name string, mime_type string, content binary"
    )


class TestDecoderRegistry:
    def test_dispatch_by_mime(self, spark):
        img = np.full((2, 2, 3), 100, dtype="uint8")
        df = files_df(spark, [
            ("a.txt", "text/plain", bytearray(b"hello")),
            ("b.html", "text/html", bytearray(b"<p>hi &amp; bye</p>")),
            ("c.ppm", "image/x-portable-pixmap", bytearray(MM.encode_ppm(img))),
            ("d.bin", "application/octet-stream", bytearray(b"\x00")),
        ])
        got = {r.name: r for r in DecoderRegistry().decode_df(df).collect()}
        assert got["a.txt"].text == "hello" and got["a.txt"].decoder == "text"
        assert got["b.html"].text == "hi & bye" and got["b.html"].decoder == "html"
        assert got["c.ppm"].text == "[image 2x2 mean=100.0]"
        assert got["d.bin"].text is None
        assert "unsupported mime" in got["d.bin"].decode_error

    def test_last_registered_wins(self, spark):
        # TextExtractionHandler.cs:201-203: a redefined decoder overrides
        reg = DecoderRegistry().register(
            lambda m: m.startswith("text/plain"),
            lambda b: "OVERRIDDEN", "custom",
        )
        df = files_df(spark, [("a.txt", "text/plain", bytearray(b"x"))])
        row = reg.decode_df(df).first()
        assert row.text == "OVERRIDDEN" and row.decoder == "custom"

    def test_poison_payload_yields_row_error(self, spark):
        df = files_df(spark, [
            ("bad.ppm", "image/x-portable-pixmap", bytearray(b"nope")),
            ("ok.txt", "text/plain", bytearray(b"fine")),
        ])
        got = {r.name: r for r in DecoderRegistry().decode_df(df).collect()}
        assert got["bad.ppm"].text is None
        assert got["bad.ppm"].decode_error  # row-level, stage completes
        assert got["ok.txt"].text == "fine"


class TestCorpusFromFiles:
    def test_files_to_spans_via_registry(self, spark):
        from kernel_memory_spark.sources.corpus import corpus_from_files

        files = spark.createDataFrame(
            [
                (1, "a.txt", "text/plain", bytearray(b"one two three four")),
                (2, "b.html", "text/html",
                 bytearray(b"<p>alpha beta</p><!-- x -->")),
                (3, "c.bin", "application/pdf", bytearray(b"%PDF")),
            ],
            "doc_id long, name string, mime_type string, content binary",
        )
        corpus = corpus_from_files(files)
        rows = {r.doc_id: r.spans for r in corpus.collect()}
        # unsupported pdf dropped; text + html decoded into spans
        assert set(rows) == {"doc-000000001", "doc-000000002"}
        assert rows["doc-000000001"][0].text == "one two three four"
        assert rows["doc-000000002"][0].text == "alpha beta"
