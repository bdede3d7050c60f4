"""Basic-graph-pattern matching: compile a conjunctive triple pattern into
a DataFrame join plan.

The SPARQL BGP is THE query primitive of a triple-modelled KG (the
reference never gets this far — its graph config stops at storage; a KG
engine must answer "find all ?x with lang 'en' whose source is ?s").
Spark-first compilation: each triple pattern is a filtered, projected scan
of the triples relation (constants become pushed-down predicates; Catalyst
sees plain equi-filters), and shared variables become inner equi-joins —
so join ORDER, broadcast choice, and filter pushdown are all left to the
optimizer, exactly as a declarative engine should.

Scale notes: the generated plan is |pattern| - 1 equi-joins over
pre-filtered scans; selective constants prune at the parquet scan
(PushedFilters), and AQE picks broadcast vs shuffle per pattern
selectivity at runtime. Cartesian products (patterns with no shared
variable) are rejected by default — at 10^10 triples an accidental cross
is an outage, not a query.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bgp_match(
    triples,
    pattern: Sequence[Tuple[str, str, str]],
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    allow_cartesian: bool = False,
) -> DataFrame:
    """Match a conjunctive triple pattern -> one column per variable,
    distinct rows (set semantics).

    Each pattern element is (s, p, o); a term starting with '?' is a
    variable, anything else is a constant filter. A variable repeated
    WITHIN one element (e.g. (?x, 'knows', ?x)) becomes an equality
    filter; repeated ACROSS elements becomes the join key. Patterns are
    joined left-to-right; an element sharing no variable with the
    accumulated result raises unless allow_cartesian=True.

    `triples` may be ONE relation, or a list with one relation PER
    pattern element (same shape) — the hook plans/rules.py uses for
    semi-naive delta evaluation (atom i reads the delta, the rest read
    the accumulated closure).
    """
    if not pattern:
        raise ValueError("empty pattern")
    rels = (
        list(triples)
        if isinstance(triples, (list, tuple))
        else [triples] * len(pattern)
    )
    if len(rels) != len(pattern):
        raise ValueError("one relation per pattern element required")
    acc = None
    for (s, p, o), t in zip(pattern, rels):
        var_cols = {}  # var name -> source column (first occurrence)
        for term, col in ((s, subj), (p, pred), (o, obj)):
            if term.startswith("?"):
                v = term[1:]
                if not v:
                    raise ValueError("bare '?' variable")
                if v in var_cols:  # repeated within the element
                    t = t.filter(F.col(var_cols[v]) == F.col(col))
                else:
                    var_cols[v] = col
            else:
                t = t.filter(F.col(col) == F.lit(term))
        if not var_cols:
            # fully-ground pattern: acts as an existence filter; keep a
            # 1-row marker relation so the semantics stay relational
            step = t.select(F.lit(1).alias("__exists")).limit(1)
        else:
            step = t.select(
                *[F.col(c).alias(v) for v, c in var_cols.items()]
            ).distinct()
        if acc is None:
            acc = step
        else:
            shared = [
                c
                for c in step.columns
                if c in acc.columns and c != "__exists"
            ]
            if shared:
                acc = acc.join(step, on=shared, how="inner")
            elif "__exists" in step.columns or "__exists" in acc.columns:
                # ground-pattern existence filter: 0-or-1-row side, the
                # cross is a broadcast against a bounded relation
                acc = acc.drop("__exists").crossJoin(step.drop(*[
                    c for c in step.columns if c != "__exists"
                ]) if "__exists" in step.columns else step)
            elif allow_cartesian:
                acc = acc.crossJoin(step)
            else:
                raise ValueError(
                    "pattern element shares no variable with the "
                    "accumulated result (cartesian product); pass "
                    "allow_cartesian=True to force"
                )
    drop = [c for c in acc.columns if c == "__exists"]
    return (acc.drop(*drop) if drop else acc).distinct()
