"""HTML -> text decoding (HtmlDecoder semantics, S2's decoder half)."""

from kernel_memory_spark.functions import html as H
from kernel_memory_spark.functions.chunker import normalize_newlines


class TestInnerText:
    def test_tags_stripped_entities_decoded(self):
        assert H.html_inner_text(
            "<p>a &amp; b &lt;c&gt;</p>"
        ) == "a & b <c>"

    def test_comments_dropped(self):
        assert H.html_inner_text("x<!-- hidden -->y") == "xy"

    def test_reference_inner_text_includes_script(self):
        # HtmlAgilityPack InnerText concatenates ALL text nodes, including
        # <script>/<style> bodies — the reference's faithful default
        assert H.html_inner_text(
            "<script>var x;</script>hi"
        ) == "var x;hi"
        assert H.html_inner_text(
            "<script>var x;</script>hi", include_script=False
        ) == "hi"

    def test_charrefs(self):
        assert H.html_inner_text("&#65;&#x42;") == "AB"

    def test_decode_html_normalizes_newlines(self):
        assert H.decode_html("  <p>a\r\nb\rc</p>\n") == "a\nb\nc"


class TestHtmlToTextExpr:
    def test_column_pipeline_matches_parser_on_simple_html(self, spark):
        cases = [
            "<html><body><h1>T</h1><p>a &amp; b</p></body></html>",
            "x<!-- c -->y<br/>z",
            '<div class="k">nested <b>bold</b> text</div>',
        ]
        df = spark.createDataFrame([(c,) for c in cases], "html string")
        got = [r.t for r in df.select(
            H.html_to_text_expr("html").alias("t")
        ).collect()]
        want = [
            normalize_newlines(
                H.html_inner_text(c, include_script=False), trim=True
            )
            for c in cases
        ]
        assert got == want

    def test_script_and_style_blocks_removed(self, spark):
        df = spark.createDataFrame(
            [("<style>p{}</style>A<script>var x='<b>';</script>B",)],
            "html string",
        )
        got = df.select(H.html_to_text_expr("html").alias("t")).first().t
        assert got == "AB"


class TestUrlHost:
    def test_authority_extraction(self, spark):
        from kernel_memory_spark.functions import html as HT
        from pyspark.sql import functions as F

        cases = [
            ("http://A.Example.com/x", "a.example.com"),
            ("HTTPS://h2.Ex.com:8443/b?q=1", "h2.ex.com:8443"),
            ("//proto.rel/x#frag", "proto.rel"),
            ("ftp://files.site/dir", "files.site"),
            ("/relative/p", ""),
            ("mailto:a@b.c", ""),
            ("doc.html?x=//nothost", ""),
            ("", ""),
        ]
        df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
        got = {
            r.u: r.h
            for r in df.select(
                "u", HT.url_host_expr("u").alias("h")
            ).collect()
        }
        for u, want in cases:
            assert got[u] == want, u
