"""Deterministic scale-up of a driver-generated sf directory.

Replicates every table `factor` times with consistent key remapping
(replica r shifts every join key by r*OFFSET, so referential integrity —
and therefore join cardinality — scales exactly linearly), dimension
tables (region, nation) stay single-copy, and text/embeddings are
perturbed per replica so SIMILARITY workloads also scale linearly:

- documents: every word gets a replica-specific letter suffix. Within a
  replica the transformation is uniform, so intra-replica near-duplicate
  structure is preserved exactly; across replicas every shingle differs,
  so cross-replica Jaccard ~ 0 and the duplicate-pair count scales with
  the factor instead of quadratically (10 identical copies of each doc
  would make every LSH bucket a clique — a data artifact, not an engine
  property).
- embeddings: vectors are rolled by r positions — norms preserved,
  directions decorrelated across replicas.

Usage:
    python scripts/make_scaled_sf.py --src /root/testdata/sf0.1 \
        --dst /dev/shm/sf1.0 --factor 10
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OFFSET = 10_000_000  # > any base key; replica r adds r*OFFSET

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]
WORD = re.compile(r"\w+")


def suffix_words(text: str, suf: str) -> str:
    return WORD.sub(lambda m: m.group(0) + suf, text)


def scale_table(src: str, dst: str, name: str, factor: int) -> int:
    table = pq.read_table(os.path.join(src, name + ".parquet"))
    if name in DIMS:
        pq.write_table(table, os.path.join(dst, name + ".parquet"))
        return table.num_rows

    replicas = []
    for r in range(factor):
        cols = {c: table.column(c) for c in table.column_names}
        for k in KEY_COLS[name]:
            cols[k] = pa.compute.add(cols[k], r * OFFSET)
        if name == "documents" and r > 0:
            suf = chr(ord("a") + (r % 26)) * 2
            texts = [suffix_words(t.as_py(), suf) for t in cols["text"]]
            cols["text"] = pa.array(texts, pa.string())
            cols["n_chars"] = pa.array(
                [len(t) for t in texts], table.schema.field("n_chars").type
            )
        if name == "embeddings" and r > 0:
            mats = np.stack(
                [np.asarray(v.as_py(), dtype=np.float32)
                 for v in cols["embedding"]]
            )
            rolled = np.roll(mats, r, axis=1)
            cols["embedding"] = pa.array(
                [row.tolist() for row in rolled],
                table.schema.field("embedding").type,
            )
        replicas.append(
            pa.table({c: cols[c] for c in table.column_names})
            .cast(table.schema)
        )
    out = pa.concat_tables(replicas)
    pq.write_table(out, os.path.join(dst, name + ".parquet"))
    return out.num_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    for name in DIMS + list(KEY_COLS):
        n = scale_table(args.src, args.dst, name, args.factor)
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
