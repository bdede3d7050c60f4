"""HTML -> text decoding (the web-page source's decoder half, S2).

Re-expresses km-v1's HtmlDecoder (archived/km-v1/service/Core/DataFormats/
WebPages/HtmlDecoder.cs:48-59): HtmlAgilityPack `DocumentNode.InnerText`
normalized with NormalizeNewlines(trim) into ONE complete-sentences chunk.
The fetch half (WebScraper) is out of scope (no network in the engine);
the decoder is the part ingestion needs.

Two implementations with matching simple-case behavior:

- `html_inner_text` — stdlib html.parser walk (entity/charref decoding,
  comments dropped). NOTE the reference's InnerText quirk: HtmlAgilityPack
  concatenates ALL text nodes INCLUDING <script>/<style> contents;
  `include_script=True` (default) reproduces that faithfully, False gives
  the generally-wanted behavior.
- `html_to_text_expr` — a pure Column pipeline (comment strip, optional
  script/style block strip, tag strip, common-entity decode) that any SQL
  engine replays — the oracle-checkable path for distributed decode.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List

from pyspark.sql import Column
from pyspark.sql import functions as F

from kernel_memory_spark.functions.text import normalize_newlines_col


class _TextExtractor(HTMLParser):
    def __init__(self, include_script: bool):
        super().__init__(convert_charrefs=True)
        self.include_script = include_script
        self._skip_depth = 0
        self.parts: List[str] = []

    def handle_starttag(self, tag, attrs):
        if not self.include_script and tag in ("script", "style"):
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if not self.include_script and tag in ("script", "style"):
            self._skip_depth = max(0, self._skip_depth - 1)

    def handle_data(self, data):
        if self._skip_depth == 0:
            self.parts.append(data)


def html_inner_text(html: str, include_script: bool = True) -> str:
    """HtmlAgilityPack InnerText analog: text nodes concatenated, entities
    decoded, comments dropped."""
    p = _TextExtractor(include_script)
    p.feed(html or "")
    p.close()
    return "".join(p.parts)


def decode_html(html: str) -> str:
    """HtmlDecoder.DecodeAsync: InnerText + NormalizeNewlines(trim) as one
    complete-sentences section (HtmlDecoder.cs:55-57)."""
    from kernel_memory_spark.functions.chunker import normalize_newlines

    return normalize_newlines(html_inner_text(html), trim=True)


_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST: '&amp;lt;' must become '&lt;' literally
]


def html_to_text_expr(col, strip_script: bool = True) -> Column:
    """Column pipeline: comments out, optional <script>/<style> blocks out,
    tags out, common entities decoded, newlines normalized + trimmed.
    Deliberately regex-only so a SQL oracle replays it 1:1. (For the
    reference's exact InnerText quirks use the html_inner_text UDF path.)"""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", "")
    if strip_script:
        c = F.regexp_replace(c, r"(?is)<script\b.*?</script>", "")
        c = F.regexp_replace(c, r"(?is)<style\b.*?</style>", "")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", "")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return normalize_newlines_col(c, trim=True)


def html_links_expr(col) -> Column:
    """Outgoing hyperlinks of an HTML column as
    array<struct<href:string, anchor:string>> — the web-link-graph
    extraction step (a web-scale KG's richest edge source: link graphs
    feed pagerank/personalized_pagerank in operators/graph.py).

    Regex-only on purpose (like html_to_text_expr) so a SQL oracle
    replays it 1:1: two regexp_extract_all passes over the SAME anchor
    pattern (group 1 = href, group 2 = inner text), zipped positionally —
    both passes see identical matches, so the zip is always aligned.
    Matches double-quoted hrefs in <a> tags; anchor inner text is taken
    raw (tags inside the anchor end the match, same both engines)."""
    c = F.col(col) if isinstance(col, str) else col
    pat = r'(?i)<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)'
    return F.arrays_zip(
        F.regexp_extract_all(c, F.lit(pat), 1).alias("href"),
        F.regexp_extract_all(c, F.lit(pat), 2).alias("anchor"),
    )


def url_host_expr(col) -> Column:
    """Lowercased URL authority (host[:port]) -> string column; '' for
    relative/fragment/mailto-style URLs with no '//' authority part.

    The web-scale KG normalization step between raw hrefs
    (html_links_expr) and a host-level link graph: page-level edges are
    too fine at 10^11 pages, host rollup is the standard first
    aggregation (host-graph pagerank a la Common Crawl host ranks).
    RFC 3986's authority = the segment after the first '//' up to the
    next '/', '?' or '#'; the scheme prefix is optional so
    protocol-relative '//host/x' URLs resolve too. Pure regexp_extract +
    lower, identical in the DuckDB mirror."""
    c = F.col(col) if isinstance(col, str) else col
    pat = r"^(?:[A-Za-z][A-Za-z0-9+.\-]*:)?//([^/?#]+)"
    return F.lower(F.regexp_extract(c, pat, 1))
