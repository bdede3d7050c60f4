"""MongoJSON query parser + infix/mongo AST equivalence.

Ports tests/Core.Tests/Search/Query/QueryParserEquivalenceTests.cs: both
parsers must produce the same logical structure for equivalent queries
(field comparison is case-insensitive on the field path — both the
reference and this repo lowercase the field at parse time:
InfixQueryParser.cs:362, MongoJsonQueryParser ParseFieldComparison).
Plus MongoJsonQueryParser error cases and factory dispatch
(QueryParserFactory.cs:30-48).
"""

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.plans.ast import (
    Comparison,
    Logical,
    QuerySyntaxError,
    TextSearch,
    compile_node,
    parse_infix,
    parse_mongo,
    parse_query,
    validate_query,
)


def assert_equivalent(n1, n2):
    assert type(n1) is type(n2), (n1, n2)
    if isinstance(n1, Comparison):
        assert n1.field.lower() == n2.field.lower()
        assert n1.op == n2.op
        if isinstance(n1.value, list) and isinstance(n2.value, list):
            assert list(n1.value) == list(n2.value)
        else:
            assert str(n1.value) == str(n2.value)
    elif isinstance(n1, Logical):
        assert n1.op == n2.op
        assert len(n1.children) == len(n2.children)
        for c1, c2 in zip(n1.children, n2.children):
            assert_equivalent(c1, c2)
    elif isinstance(n1, TextSearch):
        assert n1.term == n2.term
        assert n1.negated == n2.negated


class TestEquivalence:
    """One test per QueryParserEquivalenceTests case."""

    def test_simple_equality(self):
        assert_equivalent(
            parse_infix("content:kubernetes"),
            parse_mongo('{"content": "kubernetes"}'),
        )

    def test_not_equal(self):
        assert_equivalent(
            parse_infix("mimeType!=image/png"),
            parse_mongo('{"mimeType": {"$ne": "image/png"}}'),
        )

    def test_greater_than_or_equal(self):
        assert_equivalent(
            parse_infix("createdAt>=2024-01-01"),
            parse_mongo('{"createdAt": {"$gte": "2024-01-01"}}'),
        )

    def test_less_than(self):
        assert_equivalent(
            parse_infix("createdAt<2024-02-01"),
            parse_mongo('{"createdAt": {"$lt": "2024-02-01"}}'),
        )

    def test_contains(self):
        assert_equivalent(
            parse_infix('content:~"machine learning"'),
            parse_mongo('{"content": {"$regex": "machine learning"}}'),
        )

    def test_array_in(self):
        assert_equivalent(
            parse_infix("tags:[AI,ML]"),
            parse_mongo('{"tags": {"$in": ["AI", "ML"]}}'),
        )

    def test_simple_and(self):
        infix = parse_infix("kubernetes AND docker")
        mongo = parse_mongo(
            '{"$and": [{"$text": {"$search": "kubernetes"}},'
            ' {"$text": {"$search": "docker"}}]}'
        )
        assert isinstance(infix, Logical) and infix.op == "and"
        assert isinstance(mongo, Logical) and mongo.op == "and"
        assert len(infix.children) == 2 and len(mongo.children) == 2

    def test_simple_or(self):
        assert_equivalent(
            parse_infix("tags:AI OR tags:ML"),
            parse_mongo('{"$or": [{"tags": "AI"}, {"tags": "ML"}]}'),
        )

    def test_not(self):
        assert_equivalent(
            parse_infix("NOT mimeType:image/png"),
            parse_mongo('{"$not": {"mimeType": "image/png"}}'),
        )

    def test_complex_boolean_expression(self):
        infix = parse_infix("(tags:AI OR tags:ML) AND NOT mimeType:image/png")
        mongo = parse_mongo(
            '{"$and": [{"$or": [{"tags": "AI"}, {"tags": "ML"}]},'
            ' {"$not": {"mimeType": "image/png"}}]}'
        )
        assert_equivalent(infix, mongo)

    def test_date_range(self):
        infix = parse_infix("createdAt>=2024-01-01 AND createdAt<2024-02-01")
        mongo = parse_mongo(
            '{"createdAt": {"$gte": "2024-01-01", "$lt": "2024-02-01"}}'
        )
        assert_equivalent(infix, mongo)

    def test_metadata_fields(self):
        assert_equivalent(
            parse_infix("metadata.author:John"),
            parse_mongo('{"metadata.author": "John"}'),
        )


class TestMongoSemantics:
    def test_root_implicit_and(self):
        node = parse_mongo('{"lang": "en", "source": "src1"}')
        assert isinstance(node, Logical) and node.op == "and"
        assert [c.field for c in node.children] == ["lang", "source"]

    def test_nor(self):
        node = parse_mongo('{"$nor": [{"a": 1}, {"b": 2}]}')
        assert isinstance(node, Logical) and node.op == "nor"

    def test_exists_true_false(self):
        t = parse_mongo('{"f": {"$exists": true}}')
        assert isinstance(t, Comparison) and t.op == "exists" and t.value is True
        f = parse_mongo('{"f": {"$exists": false}}')
        assert isinstance(f, Logical) and f.op == "not"
        assert f.children[0].op == "exists"

    def test_numeric_array_stringified(self):
        node = parse_mongo('{"f": {"$in": [1, "x"]}}')
        assert node.value == ["1", "x"]

    def test_errors(self):
        for bad in [
            "", "   ", "{not json", '{"$bogus": []}', '{"f": {"$bad": 1}}',
            '{"$and": "no-array"}', '{"$or": []}', '{"$text": {"nope": 1}}',
            '{"f": {"noprefix": 1}}', "{}",
        ]:
            with pytest.raises((QuerySyntaxError, ValueError)):
                parse_mongo(bad)
            assert not validate_query(bad) or not bad.lstrip().startswith("{")

    def test_factory_dispatch(self):
        assert isinstance(parse_query('  {"a": 1}'), Comparison)
        assert isinstance(parse_query("content:kubernetes"), Comparison)
        assert validate_query('{"a": 1}')
        assert not validate_query("{broken")


class TestMongoCompile:
    def test_compiles_and_filters(self, spark):
        df = spark.createDataFrame(
            [
                ("1", "en", "src1", 500),
                ("2", "en", "src2", 500),
                ("3", "de", "src1", 100),
            ],
            "id string, lang string, source string, n_chars int",
        )
        node = parse_mongo(
            '{"$and": [{"lang": "en"}, {"n_chars": {"$gte": 300}},'
            ' {"$not": {"source": "src2"}}]}'
        )
        got = {r.id for r in df.filter(compile_node(node)).collect()}
        assert got == {"1"}

    def test_in_filter(self, spark):
        df = spark.createDataFrame(
            [("1", "ai"), ("2", "ml"), ("3", "db")], "id string, topic string"
        )
        node = parse_query('{"topic": {"$in": ["ai", "ml"]}}')
        got = {r.id for r in df.filter(compile_node(node)).collect()}
        assert got == {"1", "2"}


class TestFieldCaseInsensitivity:
    """The reference lowercases field paths in both parsers; {"Lang": "en"}
    and lang:en must target the same column."""

    def test_mongo_field_lowercased(self):
        node = parse_mongo('{"Lang": "en"}')
        assert node.field == "lang"
        node = parse_mongo('{"MimeType": {"$ne": "pdf"}}')
        assert node.field == "mimetype"

    def test_infix_field_lowercased(self):
        node = parse_infix("Lang:en")
        assert node.field == "lang"
        node = parse_infix("Topic:[ai,ml]")
        assert node.field == "topic"


class TestInScalarRejected:
    """A scalar $in/$nin value must be a syntax error, not a silent
    character-wise isin (list('en') == ['e','n'])."""

    def test_in_scalar_raises(self):
        with pytest.raises(QuerySyntaxError):
            parse_mongo('{"lang": {"$in": "en"}}')

    def test_nin_scalar_raises(self):
        with pytest.raises(QuerySyntaxError):
            parse_mongo('{"lang": {"$nin": "en"}}')
