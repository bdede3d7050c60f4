"""Deterministic feature-hash embeddings + vector math.

Mirrors the reference's embedding surface (Abstractions/AI/Embedding.cs:22-122,
src/Core/Search/VectorMath.cs:20-80): float32 vectors, L2-normalized at write
time so query-time similarity is a plain dot product
(SqliteVectorIndex.cs:143-147).

The default generator is a hermetic char-3-gram feature-hash embedding —
a stand-in for ITextEmbeddingBatchGenerator that keeps tests and benches
deterministic with no model dependency. It is shared verbatim by the Spark
pandas UDF (operators/embeddings.py) and the single-node oracle (oracle.py),
so both sides produce bit-identical vectors.
"""

from __future__ import annotations

import zlib
from typing import Iterable, List

import numpy as np

DEFAULT_DIM = 64
PROVIDER = "feature-hash"
GENERATOR = "char3-v1"


def _char_ngrams(text: str, n: int = 3) -> List[str]:
    t = " " + text.lower() + " "
    if len(t) < n:
        return [t]
    return [t[i : i + n] for i in range(len(t) - n + 1)]


def hash_embed(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Unit-normalized float32 embedding of one string (deterministic)."""
    vec = np.zeros(dim, dtype=np.float64)
    for g in _char_ngrams(text):
        h = zlib.crc32(g.encode("utf-8"))
        idx = h % dim
        sign = 1.0 if (h >> 16) & 1 else -1.0
        vec[idx] += sign
    norm = np.linalg.norm(vec)
    if norm > 0:
        vec /= norm
    return vec.astype(np.float32)


def hash_embed_batch(texts: Iterable[str], dim: int = DEFAULT_DIM) -> List[np.ndarray]:
    return [hash_embed(t if t is not None else "", dim) for t in texts]


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    """Embedding.CosineSimilarity (Embedding.cs:63-75)."""
    na = np.linalg.norm(a)
    nb = np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


def l2_normalize(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v)
    return v if n == 0 else v / n
