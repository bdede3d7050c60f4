"""Deterministic mention detection + (subj, pred, obj) pattern extraction.

These are the fixed KG-construction rules (SURVEY.md §2.11: "the
mention/pattern rules are fixed by us — they're the KG-construction payload,
not present in the C# reference"). Both the distributed pandas UDFs
(operators/triples.py) and the single-node oracle (oracle.py) call these
exact functions, so any P/R loss measures distribution effects only.

Rules:
- sentence split: on whitespace following [.!?]
- mention: a maximal capitalized phrase within one sentence
  ([A-Z][A-Za-z.'-]* words joined by single spaces), trailing '.' stripped
- triple: a sentence of the exact shape "<mention> <predicate> <mention>."
  with predicate drawn from the closed predicate vocabulary
- normalization: lowercase, non-alphanumerics collapsed to single spaces
"""

from __future__ import annotations

import re
from typing import List, Tuple

PREDICATE_VOCAB = [
    "works at",
    "leads",
    "founded",
    "studied at",
    "visited",
    "lives in",
    "acquired",
    "partnered with",
    "located in",
]

# split after sentence enders, but not after single-letter initials ("M.")
_SENTENCE_RE = re.compile(r"(?<! [A-Z]\.)(?<=[.!?])\s+")
# A mention word starts capitalized and may end in a caps run (PhD, LLC,
# NASA) — but a lower->Upper transition into a LOWERCASE continuation ends
# the word, so span-concatenation artifacts ("...Maria GarciaRobert Chen...")
# cannot weld two entities into one mention and bridge their components
# during linking.
_WORD = r"[A-Z][a-z.'-]*(?:[A-Z](?![a-z]))*"
_MENTION_RE = re.compile(rf"{_WORD}(?: {_WORD})*")
_PRED_ALT = "|".join(re.escape(p) for p in PREDICATE_VOCAB)
_TRIPLE_RE = re.compile(
    rf"({_WORD}(?: {_WORD})*)"
    rf" ({_PRED_ALT}) "
    rf"({_WORD}(?: {_WORD})*)"
)

_NORM_RE = re.compile(r"[^a-z0-9]+")


def normalize_mention(mention: str) -> str:
    return _NORM_RE.sub(" ", mention.lower()).strip()


def _clean(m: str) -> str:
    return m.rstrip(".")


def sentences(text: str) -> List[str]:
    return [s for s in _SENTENCE_RE.split(text) if s]


MIN_NORM_LEN = 3  # drop sub-3-char normalized mentions (chunk-split noise)


def extract_mentions(text: str) -> List[str]:
    """All capitalized phrases, per sentence, trailing '.' stripped.
    Mentions whose normalized form is shorter than MIN_NORM_LEN are dropped —
    they are chunk-boundary fragments, and at scale their near-empty shingle
    sets turn into LSH mega-buckets."""
    out: List[str] = []
    for sent in sentences(text):
        for m in _MENTION_RE.findall(sent):
            c = _clean(m)
            if c and len(normalize_mention(c)) >= MIN_NORM_LEN:
                out.append(c)
    return out


def extract_triples(text: str) -> List[Tuple[str, str, str]]:
    """(subj, pred, obj) per pattern sentence."""
    out: List[Tuple[str, str, str]] = []
    for sent in sentences(text):
        for m in _TRIPLE_RE.finditer(sent):
            subj = _clean(m.group(1))
            obj = _clean(m.group(3))
            if (
                len(normalize_mention(subj)) >= MIN_NORM_LEN
                and len(normalize_mention(obj)) >= MIN_NORM_LEN
            ):
                out.append((subj, m.group(2), obj))
    return out
