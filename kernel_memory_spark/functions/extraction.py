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
# during linking. The optional caps tail uses one bounded backtrack
# (`[A-Z]+(?![a-z])`) instead of a per-character lookahead — this regex runs
# over every byte of the corpus, so its constant factor matters.
_WORD = r"[A-Z][a-z.'-]*(?:[A-Z]+(?![a-z]))?"
_MENTION_RE = re.compile(rf"{_WORD}(?: {_WORD})*")
_PRED_SET = frozenset(PREDICATE_VOCAB)

_NORM_RE = re.compile(r"[^a-z0-9]+")


def normalize_mention(mention: str) -> str:
    return _NORM_RE.sub(" ", mention.lower()).strip()


# surface vocabulary is small relative to mention volume; memoize the
# normalization regex (bounded: reset if an adversarial open vocabulary
# would grow it without limit)
_NORM_MEMO: dict = {}
_NORM_MEMO_MAX = 1_000_000


def _norm_cached(mention: str) -> str:
    v = _NORM_MEMO.get(mention)
    if v is None:
        if len(_NORM_MEMO) >= _NORM_MEMO_MAX:
            _NORM_MEMO.clear()
        v = normalize_mention(mention)
        _NORM_MEMO[mention] = v
    return v


def _clean(m: str) -> str:
    return m.rstrip(".")


def sentences(text: str) -> List[str]:
    return [s for s in _SENTENCE_RE.split(text) if s]


MIN_NORM_LEN = 3  # drop sub-3-char normalized mentions (chunk-split noise)


def extract_all(text: str) -> Tuple[List[str], List[Tuple[str, str, str]]]:
    """One pass over the sentences: (mentions, triples).

    Mentions are maximal capitalized phrases (trailing '.' stripped, min
    normalized length MIN_NORM_LEN — shorter ones are chunk-boundary
    fragments whose near-empty shingle sets become LSH mega-buckets).
    A triple is two ADJACENT phrases whose gap is exactly one predicate from
    the closed vocabulary (" pred ") — equivalent to the phrase-pred-phrase
    pattern, but reusing the mention scan instead of a second regex pass,
    and it also catches chained facts ("A works at B located in C").
    """
    mentions: List[str] = []
    triples: List[Tuple[str, str, str]] = []
    for sent in sentences(text):
        spans = list(_MENTION_RE.finditer(sent))
        cleaned = []
        for m in spans:
            c = _clean(m.group())
            ok = bool(c) and len(_norm_cached(c)) >= MIN_NORM_LEN
            cleaned.append((c, ok))
            if ok:
                mentions.append(c)
        for i in range(len(spans) - 1):
            gap = sent[spans[i].end(): spans[i + 1].start()]
            if (
                len(gap) >= 3
                and gap[0] == " "
                and gap[-1] == " "
                and gap[1:-1] in _PRED_SET
            ):
                (s, s_ok), (o, o_ok) = cleaned[i], cleaned[i + 1]
                if s_ok and o_ok:
                    triples.append((s, gap[1:-1], o))
    return mentions, triples


def extract_mentions(text: str) -> List[str]:
    """All capitalized phrases, per sentence (see extract_all)."""
    return extract_all(text)[0]


def extract_triples(text: str) -> List[Tuple[str, str, str]]:
    """(subj, pred, obj) per pattern sentence (see extract_all)."""
    return extract_all(text)[1]
