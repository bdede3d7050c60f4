#!/usr/bin/env python
"""PPJoin cost-scaling measurement on a near-dup-SPARSE corpus (round-6
deliverable; r5 verdict item #5).

The declared `ppjoin_docs` entry runs over the deliberately self-similar
sf fixture where the OUTPUT pair set is ~quadratic (7.1M pairs from 5k
docs at sf0.1), so its wall says nothing about the join's cost scaling.
This probe generates a high-entropy corpus (40 unique + 20 shared-vocab
tokens per doc) with a ~1% exact-clone rate — the regime real dedup
corpora live in — at several sizes and reports, per size:

  n_docs, total tokens, PREFIX tokens, candidate pairs (prefix equi-join
  + length filter, reconstructed with the operator's own definitions),
  output pairs, and the wall of the full exact operator
  (prefix_jaccard_join, noop sink).

Linear-ish growth of candidates and wall with n_docs validates the
"the corpus was the bottleneck, not the algorithm" claim in PERF.md.

Usage: python scripts/bench_ppjoin_sparse.py [sizes ...] (default 10000 50000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kernel_memory_spark.operators import dedup as D  # noqa: E402

from kernel_memory_spark.session import get_spark  # noqa: E402


THRESHOLD = 0.6
CLONE_RATE = 0.01


def corpus(spark, n_docs: int):
    """Near-dup-SPARSE corpus: each doc carries 40 high-entropy unique
    tokens (md5 of (doc, position) — df=1 across the corpus) plus 20
    tokens from a shared 20k vocabulary (df ~ n/1000), so cross-doc
    Jaccard tops out around 0.2 << the 0.6 threshold and the only true
    pairs are the ~1% exact clones. NOTE (measured, kept as a negative
    result): the synth GRAMMAR corpus is unusable here — at 10k docs it
    yields 119,550 true pairs and 25.9M prefix candidates (its templated
    sentences share most of a small vocabulary), i.e. it is near-dup-DENSE
    by construction, which is exactly why ppjoin_docs' sf-fixture wall
    says nothing about join-cost scaling."""
    base = spark.range(n_docs).select(
        F.col("id"), F.format_string("doc-%09d", F.col("id")).alias("doc_id")
    )
    uniq = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.substring(
            F.md5(F.concat(F.col("id").cast("string"), F.lit("u"),
                           i.cast("string"))), 1, 12),
    )
    shared = F.transform(
        F.sequence(F.lit(1), F.lit(20)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(
                F.conv(F.substring(
                    F.md5(F.concat(F.col("id").cast("string"), F.lit("s"),
                                   i.cast("string"))), 1, 8), 16, 10
                ).cast("long"),
                F.lit(20000),
            ).cast("string"),
        ),
    )
    docs = base.select(
        "doc_id", F.array_join(F.concat(uniq, shared), " ").alias("text")
    )
    clones = docs.filter(
        F.pmod(F.crc32(F.col("doc_id")), 100) == 0
    ).select(
        F.concat(F.lit("zclone-"), F.col("doc_id")).alias("doc_id"), "text"
    )
    return docs.unionByName(clones)


def candidate_count(df, threshold: float) -> tuple:
    """Reconstruct the operator's candidate relation (prefix equi-join +
    length filter) to count candidates BEFORE exact verification."""
    toks = (
        df.select(
            F.col("doc_id").alias("id"),
            F.explode(F.array_distinct(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            )).alias("token"),
        )
        .filter(F.length("token") >= 1)
        .localCheckpoint()
    )
    n_tokens_total = toks.count()
    tdf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("token_df"))
    w = Window.partitionBy("id").orderBy(
        F.col("token_df").asc(), F.col("token").asc()
    )
    ranked = toks.join(tdf, "token").select(
        "id", "token",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy("id")).alias("n_tokens"),
    )
    prefix = ranked.filter(
        F.col("pos") <= F.col("n_tokens")
        - F.ceil(F.lit(threshold) * F.col("n_tokens")) + 1
    ).localCheckpoint()
    n_prefix = prefix.count()
    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(b, (F.col("a.token") == F.col("b.token"))
               & (F.col("a.id") < F.col("b.id")))
        .filter(
            (F.col("b.n_tokens") >= threshold * F.col("a.n_tokens"))
            & (F.col("a.n_tokens") >= threshold * F.col("b.n_tokens"))
        )
        .select("a.id", "b.id").distinct().count()
    )
    return n_tokens_total, n_prefix, cands


def main():
    sizes = [int(x) for x in (sys.argv[1:] or ["10000", "50000"])]
    spark = get_spark(master="local[%s]" % os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    rows = []
    for n in sizes:
        df = corpus(spark, n).localCheckpoint()
        n_rows = df.count()
        n_tok, n_prefix, n_cand = candidate_count(df, THRESHOLD)
        spark.sparkContext.setJobDescription(f"ppjoin sparse n={n}")
        t0 = time.time()
        out = D.prefix_jaccard_join(df, threshold=THRESHOLD)
        out.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        n_pairs = out.count()
        rows.append({
            "n_docs": n_rows, "tokens": n_tok, "prefix_tokens": n_prefix,
            "candidate_pairs": n_cand, "output_pairs": n_pairs,
            "wall_sec": round(wall, 2),
            "load_1m": round(os.getloadavg()[0], 2),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)
    print(json.dumps({"threshold": THRESHOLD, "clone_rate": CLONE_RATE,
                      "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
