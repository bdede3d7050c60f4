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
(Query/Parsers/InfixQueryParser.cs): `field op value` terms (`:` `==` `!=`
`>` `>=` `<` `<=` `:~` contains, `:[a,b]` in), AND/OR/NOT, parentheses,
quoted strings, bare text terms.

`parse_mongo` covers the MongoJsonQueryParser surface
(Query/Parsers/MongoJsonQueryParser.cs:19-334): the MongoDB operator subset
$and/$or/$not/$nor, $eq/$ne/$gt/$gte/$lt/$lte/$in/$nin/$regex/$exists and
$text:{$search}. `parse_query` is the QueryParserFactory dispatch: a query
whose first non-space char is '{' is MongoJSON, anything else is infix
(QueryParserFactory.cs:30-48). Both parsers must produce equivalent ASTs for
equivalent queries (tests/Core.Tests/Search/Query/
QueryParserEquivalenceTests.cs — ported to tests/test_mongo_parser.py).
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
        (?P<op>==|!=|>=|<=|>|<|~=|:~|:) |
        (?P<quoted>"(?:[^"\\]|\\.)*") |
        (?P<word>[^\s()":<>!=]+|!|=)
    )""",
    re.VERBOSE,
)

_OP_MAP = {"==": "eq", "!=": "ne", ">": "gt", ">=": "gte", "<": "lt",
           "<=": "lte", "~=": "contains", ":": "eq", ":~": "contains"}

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
        # `:[a, b, c]` — the In operator's array literal
        # (InfixQueryParser.cs:104-143): capture through the closing bracket
        # as one ARRAY token.
        if m.group("op") == ":" and pos < len(q) and q[pos] == "[":
            end = q.find("]", pos)
            if end < 0:
                raise ValueError("missing ] in array value")
            items = [v.strip() for v in q[pos + 1 : end].split(",")]
            out.append(":[")
            out.append("\x00ARRAY\x00" + ",".join(v for v in items if v))
            pos = end + 1
            continue
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
        # Any identifier followed by an operator token is a comparison
        # (InfixQueryParser.cs:330-360 — no field whitelist).
        if not word.startswith('"') and peek() in _OP_MAP:
            op = _OP_MAP[take()]
            value = unquote(take())
            # field paths are case-insensitive (InfixQueryParser.cs:362
            # ToLowerInvariant): {Lang: en} and {lang: en} hit column 'lang'
            return Comparison(word.lower(), op, value)
        if not word.startswith('"') and peek() == ":[":
            take()
            arr = take()
            if not arr.startswith("\x00ARRAY\x00"):
                raise ValueError("expected array value after :[")
            values = [v for v in arr[len("\x00ARRAY\x00"):].split(",") if v]
            return Comparison(word.lower(), "in", values)
        term = unquote(word)
        if term.startswith("-") and len(term) > 1:
            return TextSearch(term[1:], negated=True)
        return TextSearch(term)

    node = parse_or()
    if pos != len(tokens):
        raise ValueError(f"trailing tokens: {tokens[pos:]}")
    return node


# ---------------------------------------------------------------------------
# MongoJSON parser (MongoJsonQueryParser.cs:19-334) + factory dispatch
# ---------------------------------------------------------------------------

class QuerySyntaxError(ValueError):
    """Malformed query (QuerySyntaxException.cs analog)."""


_MONGO_COMPARISONS = {
    "$eq": "eq", "$ne": "ne", "$gt": "gt", "$gte": "gte", "$lt": "lt",
    "$lte": "lte", "$in": "in", "$nin": "nin",
    # the reference maps $regex onto its Contains operator (:241)
    "$regex": "contains",
}


def _mongo_literal(v: object) -> object:
    """LiteralNode parsing (:298-334): numbers stay numeric, arrays become
    string lists (numbers stringified)."""
    if isinstance(v, list):
        return [x if isinstance(x, str) else str(x) for x in v]
    if isinstance(v, (str, bool, int, float)):
        return v
    raise QuerySyntaxError(f"unsupported value type: {type(v).__name__}")


def _mongo_element(obj: object) -> Node:
    if not isinstance(obj, dict):
        raise QuerySyntaxError("query must be a JSON object")
    conditions: List[Node] = []
    for name, value in obj.items():
        if name == "$text":
            # $text: {$search: "..."} (:171-198)
            if not isinstance(value, dict):
                raise QuerySyntaxError("$text requires an object")
            term = value.get("$search")
            if not term:
                raise QuerySyntaxError("$text requires a $search property")
            conditions.append(TextSearch(term))
        elif name.startswith("$"):
            conditions.append(_mongo_logical(name, value))
        else:
            conditions.append(_mongo_comparison(name, value))
    if not conditions:
        raise QuerySyntaxError("query cannot be empty")
    if len(conditions) == 1:
        return conditions[0]
    # multiple root-level conditions are implicitly AND'ed (:95-110)
    return Logical("and", conditions)


def _mongo_logical(name: str, value: object) -> Node:
    if name == "$not":
        return Logical("not", [_mongo_element(value)])
    ops = {"$and": "and", "$or": "or", "$nor": "nor"}
    if name not in ops:
        raise QuerySyntaxError(f"unknown logical operator: {name}")
    if not isinstance(value, list):
        raise QuerySyntaxError(f"{name} requires an array of conditions")
    children = [_mongo_element(e) for e in value]
    if not children:
        raise QuerySyntaxError(f"{name} requires at least one condition")
    return Logical(ops[name], children)


def _mongo_comparison(field: str, value: object) -> Node:
    # field paths are case-insensitive (MongoJsonQueryParser
    # ParseFieldComparison's ToLowerInvariant): {"Lang": "en"} -> 'lang'
    field = field.lower()
    # simple equality: {"field": literal} (:207-216)
    if not isinstance(value, dict):
        return Comparison(field, "eq", _mongo_literal(value))
    conditions: List[Node] = []
    for op_name, op_value in value.items():
        if not op_name.startswith("$"):
            raise QuerySyntaxError(
                f"expected operator (starting with $), got: {op_name}"
            )
        if op_name == "$exists":
            # exists:false wraps NOT around the exists test (:246-270)
            node = Comparison(field, "exists", True)
            conditions.append(
                node if op_value else Logical("not", [node])
            )
            continue
        if op_name not in _MONGO_COMPARISONS:
            raise QuerySyntaxError(f"unknown comparison operator: {op_name}")
        if op_name in ("$in", "$nin") and not isinstance(op_value, list):
            # a scalar would reach compile_node's list(v) and iterate a
            # string character-wise — reject it as malformed instead
            raise QuerySyntaxError(f"{op_name} requires an array value")
        conditions.append(
            Comparison(field, _MONGO_COMPARISONS[op_name], _mongo_literal(op_value))
        )
    if len(conditions) == 1:
        return conditions[0]
    # multiple operators on the same field are implicitly AND'ed (:282-292)
    return Logical("and", conditions)


def parse_mongo(query: str) -> Node:
    """MongoDB-JSON query string -> AST (MongoJsonQueryParser.Parse)."""
    import json

    if not query or not query.strip():
        raise QuerySyntaxError("query cannot be empty")
    try:
        obj = json.loads(query)
    except json.JSONDecodeError as ex:
        raise QuerySyntaxError("invalid JSON format") from ex
    return _mongo_element(obj)


def parse_query(query: str) -> Node:
    """QueryParserFactory.Parse (QueryParserFactory.cs:30-48): a query whose
    first non-space char is '{' is MongoJSON, anything else is infix."""
    if not query or not query.strip():
        raise QuerySyntaxError("query cannot be empty")
    if query.lstrip().startswith("{"):
        return parse_mongo(query)
    return parse_infix(query)


def validate_query(query: str) -> bool:
    """IQueryParser.Validate: parse, swallowing syntax errors."""
    try:
        parse_query(query)
        return True
    except (QuerySyntaxError, ValueError):
        return False
