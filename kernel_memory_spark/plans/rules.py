"""Datalog-style rule inference over the triple store: derive new facts
from horn rules until fixpoint (bounded rounds) — ontology closure /
KG completion by rules (type propagation, inverse predicates, relation
composition), the inference step between raw extraction and publishing.

A rule is (body, head): body is a conjunctive triple pattern (same
syntax as plans/bgp.py — '?x' terms are variables), head is one (s, p, o)
template over the body's variables (constants allowed).

Evaluation is SEMI-NAIVE (the standard Datalog optimization): round r
only derives facts with at least one body atom matching the PREVIOUS
round's delta — rule bodies are compiled |body| times per round, atom i
bound to the delta relation and the rest to the accumulated closure, so
work per round is proportional to what's NEW, not to the whole closure
(naive re-evaluation re-derives every old fact every round, which at
10^10 triples turns a 3-round closure into 3 full recomputes). The delta
is localCheckpoint-ed per round to stop lineage growth, and the loop
exits early when a round derives nothing (one bounded count job per
round — the same early-exit contract as operators/graph.k_hop).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kernel_memory_spark.plans.bgp import bgp_match

Rule = Tuple[Sequence[Tuple[str, str, str]], Tuple[str, str, str]]


def _project_head(matched: DataFrame, head: Tuple[str, str, str]) -> DataFrame:
    cols = []
    for term, name in zip(head, ("subj", "pred", "obj")):
        if term.startswith("?"):
            v = term[1:]
            if v not in matched.columns:
                raise ValueError(
                    f"head variable ?{v} not bound by the rule body"
                )
            cols.append(F.col(v).alias(name))
        else:
            cols.append(F.lit(term).alias(name))
    return matched.select(*cols)


def infer(
    triples: DataFrame,
    rules: List[Rule],
    max_rounds: int = 3,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Closure of `triples` under `rules` after at most `max_rounds`
    semi-naive rounds -> distinct (subj, pred, obj) including the base
    facts. Non-recursive (stratified) rule sets reach fixpoint in
    depth-of-dependency rounds; recursive ones are truncated at
    max_rounds (bounded-depth inference, stated not silent)."""
    base = (
        triples.select(
            F.col(subj).alias("subj"),
            F.col(pred).alias("pred"),
            F.col(obj).alias("obj"),
        )
        .distinct()
    )
    closure = base.localCheckpoint(eager=True)
    delta = closure
    for _ in range(max_rounds):
        parts = []
        for body, head in rules:
            for i in range(len(body)):
                rels = [
                    delta if j == i else closure
                    for j in range(len(body))
                ]
                parts.append(_project_head(bgp_match(rels, body), head))
        derived = parts[0]
        for p in parts[1:]:
            derived = derived.unionByName(p)
        new = (
            derived.distinct()
            .join(closure, ["subj", "pred", "obj"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if new.limit(1).count() == 0:
            break
        closure = closure.unionByName(new).localCheckpoint(eager=True)
        delta = new
    return closure
