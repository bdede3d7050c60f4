"""Driver-side mirror of Spark's shuffle hash, used to pick bucket
PREIMAGES so a bucketed write fills exactly one shuffle partition per
bucket.

Why: `df.repartition(n, "__bucket")` places a row by
`pmod(murmur3(bucket_value, seed=42), n)`. With n distinct bucket values
hashed into n partitions this is balls-in-bins: ~1/e of the partitions
come out EMPTY and the most-collided partition carries O(log n / log
log n) whole buckets, so the write's makespan is a multiple of a single
bucket's cost — on local[24] it showed up as a 1.67x (not 4x) speedup
for save_records, and on a 1000-executor cluster with 4096 buckets the
most-loaded executor would write ~4 buckets while a third sit idle.

Fix: for each target partition p find an int c (a preimage) with
`pmod(murmur3_int(c, 42), n) == p`, and repartition on a column that
maps bucket b -> preimage[b]. Spark's own hash then places bucket b in
partition b exactly: every partition holds exactly one bucket, the
write is one balanced wave, and the one-file-per-bucket invariant (the
manifest/merge cost model) is preserved.

The mirror implements the exact function Spark's HashPartitioning
applies to a single int32 column — Murmur3_x86_32 of the 4-byte value
with seed 42 (`Murmur3Hash` over `IntegerType`, the same function
`F.hash` exposes) — and is pinned against `F.hash` by a property test,
so a Spark upgrade that changed the hash would turn the suite red
rather than silently degrade placement back to random.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List

_MASK = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def murmur3_int32(value: int, seed: int = 42) -> int:
    """Murmur3_x86_32 of a single int32, exactly as Spark's
    `Murmur3Hash` (and `F.hash`) computes it for an IntegerType column.
    Returns a SIGNED int32, matching Spark's return value."""
    k1 = (value & _MASK) * 0xCC9E2D51 & _MASK
    k1 = _rotl32(k1, 15)
    k1 = k1 * 0x1B873593 & _MASK
    h1 = (seed & _MASK) ^ k1
    h1 = _rotl32(h1, 13)
    h1 = (h1 * 5 + 0xE6546B64) & _MASK
    # finalization mix, input length = 4 bytes
    h1 ^= 4
    h1 ^= h1 >> 16
    h1 = h1 * 0x85EBCA6B & _MASK
    h1 ^= h1 >> 13
    h1 = h1 * 0xC2B2AE35 & _MASK
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def pmod(h: int, n: int) -> int:
    """Spark's Pmod: non-negative remainder."""
    return h % n if h % n >= 0 else h % n + n


@lru_cache(maxsize=32)
def bucket_preimages(n_buckets: int) -> List[int]:
    """preimages[b] = the smallest non-negative int c with
    `pmod(murmur3_int32(c), n_buckets) == b`. Expected search cost is
    n ln n hash evaluations (coupon collector) — microseconds for any
    realistic bucket count, and cached per n."""
    out: List[int] = [-1] * n_buckets
    found = 0
    c = 0
    while found < n_buckets:
        b = pmod(murmur3_int32(c), n_buckets)
        if out[b] < 0:
            out[b] = c
            found += 1
        c += 1
    return out
