"""Single-node pandas oracle: the reference implementation of the pipeline's
rules, run without Spark.

BASELINE.md's triple-quality gate: the distributed pipeline's (subj, pred,
obj) output must match this oracle at P/R >= 0.95. The oracle applies the
IDENTICAL leaf rules (chunker, extraction regexes, minhash seeds, thresholds
— all imported from functions/) but drives them with plain Python/pandas and
exact union-find connected components, so any divergence isolates
distribution effects (partitioning, join order, iterative CC) rather than
rule differences. Tag/lineage triples additionally follow PrepareRecord
semantics exactly (SaveRecordsHandler.cs:375-441).
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterable, List, Set, Tuple

from kernel_memory_spark.functions.chunker import PlainTextChunker, PlainTextChunkerOptions
from kernel_memory_spark.functions.extraction import (
    extract_all,
    normalize_mention,
)
from kernel_memory_spark.functions.minhash import band_keys, jaccard, minhash_signature
from kernel_memory_spark.functions.tokenizers import NCharTokenizer
from kernel_memory_spark.functions.vectors import cosine, hash_embed
from kernel_memory_spark.operators.linking import (
    BAND_BUCKET_CAP,
    COSINE_THRESHOLD,
    JACCARD_THRESHOLD,
)

Triple = Tuple[str, str, str, str]  # subj, pred, obj, doc_id


def _extract_text(spans: List[dict]) -> str:
    parts: List[str] = []
    for s in sorted(spans, key=lambda x: x["offset"]):
        t = (s["text"] or "").strip()
        if not t:
            continue
        parts.append(t)
        complete = s["kind"] == "media" or s["offset"] % 3 == 0
        if complete:
            parts.append("\n\n")
    return "".join(parts).strip()


def _file_id(doc_id: str) -> str:
    return hashlib.sha256(f"{doc_id}/extract".encode()).hexdigest()[:32]


class _UnionFind:
    def __init__(self):
        self.parent: Dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = self.find(p)
        return self.parent[x]

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id wins
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


def link_surfaces(norms: Iterable[str]) -> Dict[str, str]:
    """Identical MinHash-LSH blocking + dual-threshold verification as the
    distributed stage, then exact union-find; canonical = min member."""
    norms = sorted(set(norms))
    buckets: Dict[str, List[str]] = {}
    for n in norms:
        for k in band_keys(minhash_signature(n)):
            buckets.setdefault(k, []).append(n)

    pairs: Set[Tuple[str, str]] = set()
    for members in buckets.values():
        members = sorted(set(members))
        if len(members) > BAND_BUCKET_CAP:  # identical hot-bucket guard
            continue
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))

    uf = _UnionFind()
    for n in norms:
        uf.find(n)
    for a, b in sorted(pairs):
        if jaccard(a, b) >= JACCARD_THRESHOLD and cosine(
            hash_embed(a), hash_embed(b)
        ) >= COSINE_THRESHOLD:
            uf.union(a, b)

    # path-compress all, canonical = component min (union keeps min as root)
    return {n: uf.find(n) for n in norms}


def oracle_triples(
    docs: List[dict],
    doc_tags: Dict[str, Dict[str, List[str]]] | None = None,
    max_tokens: int = 1000,
    overlap: int = 100,
    tokenizer_n: int = 4,
) -> Set[Triple]:
    """Full-pipeline oracle: corpus rows -> the exact triple set."""
    chunker = PlainTextChunker(NCharTokenizer(tokenizer_n))
    opts = PlainTextChunkerOptions(max_tokens_per_chunk=max_tokens, overlap=overlap)

    triples: Set[Triple] = set()
    all_norms: Set[str] = set()
    mention_rows: List[Tuple[str, str, str]] = []  # (doc, part, norm)
    pattern_rows: List[Tuple[str, str, str, str]] = []  # (doc, subjn, pred, objn)

    for doc in docs:
        doc_id = doc["doc_id"]
        fid = _file_id(doc_id)
        text = _extract_text(doc["spans"])

        triples.add((doc_id, "has_file", fid, doc_id))
        triples.add((fid, "file_type", "text/plain", doc_id))

        tags = (doc_tags or {}).get(doc_id) or doc.get("tags") or {}
        for k, vs in tags.items():
            for v in vs:
                triples.add((doc_id, f"tag:{k}", v, doc_id))

        for n, chunk in enumerate(chunker.split(text, opts)):
            pid = f"{fid}.partition.{n}"
            triples.add((fid, "has_part", pid, doc_id))
            triples.add((pid, "part_n", str(n), doc_id))
            triples.add((pid, "sect_n", "0", doc_id))
            ments, trips = extract_all(chunk)
            for m in ments:
                norm = normalize_mention(m)
                all_norms.add(norm)
                mention_rows.append((doc_id, pid, norm))
            for s, p, o in trips:
                sn, on = normalize_mention(s), normalize_mention(o)
                all_norms.update((sn, on))
                pattern_rows.append((doc_id, sn, p, on))

    canon = link_surfaces(all_norms)

    for doc_id, pid, norm in mention_rows:
        triples.add((pid, "mentions", norm, doc_id))
    for doc_id, sn, p, on in pattern_rows:
        triples.add((canon.get(sn, sn), p, canon.get(on, on), doc_id))

    return triples


def precision_recall(
    predicted: Set[Triple], expected: Set[Triple]
) -> Tuple[float, float]:
    if not predicted and not expected:
        return 1.0, 1.0
    tp = len(predicted & expected)
    precision = tp / len(predicted) if predicted else 0.0
    recall = tp / len(expected) if expected else 0.0
    return precision, recall
