"""MinHash signatures + LSH banding for entity-linking blocking and near-dup
detection.

Standard construction (Broder '97; banding per Leskovec/Rajaraman/Ullman,
"Mining of Massive Datasets" ch.3): shingle the normalized string into char
3-grams, apply K universal-hash permutations h_k(g) = (a_k*crc32(g)+b_k) mod p,
keep the per-permutation minimum, then group the K values into B bands of R
rows; two strings become a candidate pair iff they agree on at least one band.

Seeds are fixed so the distributed Spark pipeline and the single-node pandas
oracle generate identical signatures — required for the P/R gate to measure
distribution effects only.
"""

from __future__ import annotations

import zlib
from typing import List, Set, Tuple

import numpy as np

MERSENNE_P = (1 << 61) - 1
NUM_PERM = 64
BANDS = 32
ROWS = NUM_PERM // BANDS
_MAX = np.uint64(MERSENNE_P)

_rs = np.random.RandomState(42)
_A = _rs.randint(1, MERSENNE_P, size=NUM_PERM, dtype=np.int64).astype(np.uint64)
_B = _rs.randint(0, MERSENNE_P, size=NUM_PERM, dtype=np.int64).astype(np.uint64)


def shingles(text: str, n: int = 3) -> Set[str]:
    t = " " + text.lower() + " "
    if len(t) < n:
        return {t}
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def minhash_signature(text: str) -> np.ndarray:
    """K-permutation minhash signature (uint64[NUM_PERM])."""
    grams = shingles(text)
    if not grams:
        return np.full(NUM_PERM, _MAX, dtype=np.uint64)
    gh = np.array(
        [zlib.crc32(g.encode("utf-8")) for g in grams], dtype=np.uint64
    )
    # (K, n_grams) universal hash, min over grams
    vals = (_A[:, None] * gh[None, :] + _B[:, None]) % _MAX
    return vals.min(axis=1)


def band_keys(sig: np.ndarray) -> List[str]:
    """LSH band keys: 'band_index:hash(band rows)'."""
    keys = []
    for b in range(BANDS):
        chunk = sig[b * ROWS : (b + 1) * ROWS].tobytes()
        keys.append(f"{b}:{zlib.crc32(chunk):08x}")
    return keys


def jaccard(a: str, b: str) -> float:
    sa, sb = shingles(a), shingles(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


def candidate_band_prob(j: float, bands: int = BANDS, rows: int = ROWS) -> float:
    """P(candidate | jaccard=j) for the configured banding — doc/test helper."""
    return 1.0 - (1.0 - j**rows) ** bands
