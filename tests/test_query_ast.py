"""KM² query AST: infix parsing + Column compilation (Query/Parsers,
QueryLinqBuilder.cs semantics)."""

import pytest

from pyspark.sql import Row

from kernel_memory_spark.plans.ast import (
    Comparison,
    Logical,
    TextSearch,
    compile_node,
    parse_infix,
)


@pytest.fixture(scope="module")
def content(spark):
    rows = [
        Row(id="c1", title="Spark Guide", description="intro to spark",
            content="spark is a distributed engine", mimeType="text/plain",
            tags=["eng", "docs"], metadata={"team": "data"}, createdAt="2024-01-01"),
        Row(id="c2", title="Cooking 101", description="pasta basics",
            content="boil water and add salt", mimeType="text/html",
            tags=["food"], metadata={"team": "kitchen"}, createdAt="2024-06-01"),
        Row(id="c3", title="Spark Internals", description="catalyst deep dive",
            content="catalyst optimizes plans", mimeType="text/plain",
            tags=["eng"], metadata={"team": "data"}, createdAt="2025-01-01"),
    ]
    return spark.createDataFrame(rows)


def run(content, node):
    return {r.id for r in content.filter(compile_node(node)).collect()}


class TestCompile:
    def test_eq_and_text(self, content):
        node = Logical("and", [
            Comparison("mimeType", "eq", "text/plain"),
            TextSearch("catalyst"),
        ])
        assert run(content, node) == {"c3"}

    def test_or_not(self, content):
        node = Logical("or", [
            Comparison("id", "eq", "c2"),
            Logical("not", [TextSearch("spark")]),
        ])
        assert run(content, node) == {"c2"}

    def test_tags_contains(self, content):
        assert run(content, Comparison("tags", "eq", "food")) == {"c2"}
        assert run(content, Comparison("tags", "ne", "eng")) == {"c2"}

    def test_metadata_field(self, content):
        node = Comparison("metadata.team", "eq", "data")
        assert run(content, node) == {"c1", "c3"}

    def test_comparisons(self, content):
        assert run(content, Comparison("createdAt", "gte", "2024-06-01")) == {"c2", "c3"}
        assert run(content, Comparison("createdAt", "lt", "2024-06-01")) == {"c1"}
        assert run(content, Comparison("id", "in", ["c1", "c2"])) == {"c1", "c2"}
        assert run(content, Comparison("id", "nin", ["c1", "c2"])) == {"c3"}
        assert run(content, Comparison("title", "contains", "SPARK")) == {"c1", "c3"}
        assert run(content, Comparison("title", "regex", "^Spark.*s$")) == {"c3"}

    def test_nor(self, content):
        node = Logical("nor", [TextSearch("spark"), TextSearch("catalyst")])
        assert run(content, node) == {"c2"}

    def test_negated_text_search(self, content):
        # F6: NOT-term evaluated in the same scan (no post-filter pass)
        node = Logical("and", [TextSearch("spark"), TextSearch("catalyst", negated=True)])
        assert run(content, node) == {"c1"}


class TestInfixParser:
    def test_field_term(self, content):
        assert run(content, parse_infix('mimeType == "text/html"')) == {"c2"}

    def test_implicit_and_of_terms(self, content):
        assert run(content, parse_infix("spark catalyst")) == {"c3"}

    def test_or_and_parens(self, content):
        node = parse_infix('(title ~= "cooking") OR (metadata.team == "data")')
        assert run(content, node) == {"c1", "c2", "c3"}

    def test_not_and_negated_term(self, content):
        assert run(content, parse_infix("spark NOT catalyst")) == {"c1"}
        assert run(content, parse_infix("spark -catalyst")) == {"c1"}

    def test_quoted_phrase(self, content):
        assert run(content, parse_infix('"boil water"')) == {"c2"}

    def test_parser_equivalence(self):
        # same AST from equivalent spellings (parser-equivalence analog of
        # Query/QueryParserEquivalenceTests.cs)
        a = parse_infix("spark AND catalyst")
        b = parse_infix("spark catalyst")
        assert a == b
