"""Content-decoder registry (IContentDecoder dispatch, S3).

TextExtractionHandler keeps a list of IContentDecoder and picks the LAST
registered decoder whose SupportsMimeType matches the file's mime (a
redefined decoder overrides the built-in —
archived/km-v1/service/Core/Handlers/TextExtractionHandler.cs:201-208).
This registry reproduces that contract over binary payload rows and runs
the chosen decoder inside one Arrow-batched pass, emitting the decoded
text per row (unsupported mimes yield null text + a reason, the analog of
the handler logging-and-skipping).

Built-ins registered here: text/plain + text/markdown (passthrough,
TextDecoder.cs/MarkDownDecoder.cs are byte->string reads), text/html
(functions/html.decode_html), image/x-portable-pixmap + image/bmp (real
decode -> OCR-stand-in text of image stats). PDFs/Office formats would
register the same way when their libraries exist.
"""

from __future__ import annotations

from typing import Callable, Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame

Decoder = Tuple[Callable[[str], bool], Callable[[bytes], str], str]


def _text_passthrough(b: bytes) -> str:
    return (b or b"").decode("utf-8", errors="replace")


def _html_decode(b: bytes) -> str:
    from kernel_memory_spark.functions.html import decode_html

    return decode_html(_text_passthrough(b))


def _image_decode(b: bytes) -> str:
    """OCR stand-in: decode the real image and emit its stats line (the
    IOcrEngine seam — a real OCR engine registers over this)."""
    from kernel_memory_spark.operators.multimodal import decode_image

    img = decode_image(b, use_stub=False)
    h, w = img.shape[:2]
    return f"[image {w}x{h} mean={float(img.mean()):.1f}]"


class DecoderRegistry:
    def __init__(self, with_builtins: bool = True):
        self._decoders: List[Decoder] = []
        if with_builtins:
            self.register(
                lambda m: m.startswith("text/plain")
                or m.startswith("text/markdown"),
                _text_passthrough, "text",
            )
            self.register(lambda m: m.startswith("text/html"), _html_decode,
                          "html")
            self.register(
                lambda m: m in ("image/x-portable-pixmap", "image/bmp",
                                "image/x-portable-graymap"),
                _image_decode, "image",
            )

    def register(self, supports: Callable[[str], bool],
                 decode: Callable[[bytes], str], name: str) -> "DecoderRegistry":
        """Later registrations OVERRIDE earlier ones for overlapping mimes
        (LastOrDefault, TextExtractionHandler.cs:201-203)."""
        self._decoders.append((supports, decode, name))
        return self

    def find(self, mime: str) -> Optional[Decoder]:
        for d in reversed(self._decoders):  # last registered wins
            if d[0](mime or ""):
                return d
        return None

    def decode_df(self, files: DataFrame,
                  mime_col: str = "mime_type",
                  content_col: str = "content") -> DataFrame:
        """(.., mime, binary content) -> + (text, decoder, decode_error):
        one Arrow pass, dispatch per row; unsupported mime -> null text +
        reason (the handler's skip-with-log path)."""
        decoders = self._decoders

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            def pick(mime):
                for sup, dec, name in reversed(decoders):
                    if sup(mime or ""):
                        return dec, name
                return None, None

            for pdf in batches:
                texts, names, errs = [], [], []
                for mime, content in zip(pdf[mime_col], pdf[content_col]):
                    dec, name = pick(mime)
                    if dec is None:
                        texts.append(None)
                        names.append(None)
                        errs.append(f"unsupported mime: {mime}")
                        continue
                    try:
                        texts.append(dec(bytes(content or b"")))
                        names.append(name)
                        errs.append(None)
                    except Exception as ex:  # poison payload -> row error
                        texts.append(None)
                        names.append(name)
                        errs.append(str(ex)[:200])
                out = pdf.drop(columns=[content_col]).copy()
                out["text"] = texts
                out["decoder"] = names
                out["decode_error"] = errs
                yield out

        from pyspark.sql.types import StringType, StructField, StructType

        out_schema = StructType(
            [f for f in files.schema.fields if f.name != content_col]
            + [
                StructField("text", StringType(), True),
                StructField("decoder", StringType(), True),
                StructField("decode_error", StringType(), True),
            ]
        )
        return files.mapInPandas(run, schema=out_schema)
