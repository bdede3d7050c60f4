"""KM² query AST -> Spark Column compiler.

The reference parses user queries into a QueryNode tree — logical nodes
(AND/OR/NOT/NOR), comparison nodes (==, !=, >, >=, <, <=, contains, regex,
in, nin, exists) over fields id/title/description/content/tags/metadata.*/
mimeType/createdAt, and free-text search nodes
(src/Core/Search/Query/Ast/ComparisonOperator.cs:8-40; evaluation via LINQ
expression trees in Query/QueryLinqBuilder.cs:31-158). FTS5 handles the
text part with NOT terms post-filtered in LINQ
(NodeSearchService.cs:14-26, 117-122).

Here the whole tree — text terms included — compiles to ONE boolean Column,
so Catalyst evaluates everything in the same scan with pushdown; there is no
FTS-string intermediate representation and no post-filter pass.

A small infix parser covers the InfixQueryParser surface
(Query/Parsers/InfixQueryParser.cs): `field op value` terms, AND/OR/NOT,
parentheses, quoted strings, bare text terms.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

Node = Union["Logical", "Comparison", "TextSearch"]


@dataclass
class Comparison:
    field: str
    op: str  # eq ne gt gte lt lte contains regex in nin exists
    value: object


@dataclass
class Logical:
    op: str  # and or not nor
    children: List[Node]


@dataclass
class TextSearch:
    term: str
    negated: bool = False
    fields: Sequence[str] = ("title", "description", "content")


_TEXT_DEFAULT_FIELDS = ("title", "description", "content")


def _field_col(field: str) -> Column:
    if field.startswith("metadata."):
        return F.col("metadata").getItem(field[len("metadata."):])
    if field == "tags":
        return F.col("tags")
    return F.col(field)


def compile_node(node: Node) -> Column:
    if isinstance(node, Logical):
        kids = [compile_node(c) for c in node.children]
        if node.op == "and":
            out = kids[0]
            for k in kids[1:]:
                out = out & k
            return out
        if node.op == "or":
            out = kids[0]
            for k in kids[1:]:
                out = out | k
            return out
        if node.op == "not":
            return ~kids[0]
        if node.op == "nor":
            out = kids[0]
            for k in kids[1:]:
                out = out | k
            return ~out
        raise ValueError(f"unknown logical op {node.op}")

    if isinstance(node, Comparison):
        col = _field_col(node.field)
        v = node.value
        if node.op == "eq":
            if node.field == "tags":
                return F.coalesce(
                    F.array_contains(F.col("tags"), v), F.lit(False)
                )
            return col == F.lit(v)
        if node.op == "ne":
            if node.field == "tags":
                return ~F.coalesce(
                    F.array_contains(F.col("tags"), v), F.lit(False)
                )
            return col != F.lit(v)
        if node.op == "gt":
            return col > F.lit(v)
        if node.op == "gte":
            return col >= F.lit(v)
        if node.op == "lt":
            return col < F.lit(v)
        if node.op == "lte":
            return col <= F.lit(v)
        if node.op == "contains":
            # case-insensitive substring (NodeSearchService.cs:152-211)
            return F.contains(F.lower(col), F.lower(F.lit(v)))
        if node.op == "regex":
            return col.rlike(v)
        if node.op == "in":
            return col.isin(list(v))
        if node.op == "nin":
            return ~col.isin(list(v))
        if node.op == "exists":
            return col.isNotNull() if v else col.isNull()
        raise ValueError(f"unknown comparison op {node.op}")

    if isinstance(node, TextSearch):
        term = F.lit(node.term.lower())
        cond = None
        for f_name in node.fields:
            c = F.coalesce(
                F.contains(F.lower(_field_col(f_name)), term), F.lit(False)
            )
            cond = c if cond is None else (cond | c)
        return ~cond if node.negated else cond

    raise TypeError(f"not a query node: {node!r}")


# ---------------------------------------------------------------------------
# Infix parser: `field OP value`, AND/OR/NOT, parentheses, quoted phrases,
# bare terms -> TextSearch.
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<op>==|!=|>=|<=|>|<|~=) |
        (?P<quoted>"(?:[^"\\]|\\.)*") |
        (?P<word>[^\s()"]+)
    )""",
    re.VERBOSE,
)

_OP_MAP = {"==": "eq", "!=": "ne", ">": "gt", ">=": "gte", "<": "lt",
           "<=": "lte", "~=": "contains"}

_FIELDS = {"id", "title", "description", "content", "mimeType", "createdAt",
           "tags"}


def _tokenize(q: str) -> List[str]:
    out = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m:
            raise ValueError(f"bad query at {q[pos:]!r}")
        pos = m.end()
        for k in ("lparen", "rparen", "op", "quoted", "word"):
            if m.group(k):
                out.append(m.group(k))
                break
    return out


def parse_infix(query: str) -> Node:
    tokens = _tokenize(query)
    pos = 0

    def peek():
        return tokens[pos] if pos < len(tokens) else None

    def take():
        nonlocal pos
        t = tokens[pos]
        pos += 1
        return t

    def unquote(t: str) -> str:
        if t.startswith('"'):
            return t[1:-1].replace('\\"', '"')
        return t

    def parse_or():
        left = parse_and()
        while peek() and peek().upper() == "OR":
            take()
            left = Logical("or", [left, parse_and()])
        return left

    def parse_and():
        left = parse_unary()
        while peek() and (
            peek().upper() == "AND"
            or (peek() not in (None, ")") and peek().upper() != "OR")
        ):
            if peek().upper() == "AND":
                take()
            left = Logical("and", [left, parse_unary()])
        return left

    def parse_unary():
        t = peek()
        if t is None:
            raise ValueError("unexpected end of query")
        if t.upper() == "NOT" or t == "-":
            take()
            return Logical("not", [parse_unary()])
        if t == "(":
            take()
            node = parse_or()
            if peek() != ")":
                raise ValueError("missing )")
            take()
            return node
        word = take()
        if (
            word in _FIELDS or word.startswith("metadata.")
        ) and peek() in _OP_MAP:
            op = _OP_MAP[take()]
            value = unquote(take())
            return Comparison(word, op, value)
        term = unquote(word)
        if term.startswith("-") and len(term) > 1:
            return TextSearch(term[1:], negated=True)
        return TextSearch(term)

    node = parse_or()
    if pos != len(tokens):
        raise ValueError(f"trailing tokens: {tokens[pos:]}")
    return node
