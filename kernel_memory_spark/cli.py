"""spark-submit entry point.

Package and run on a cluster:

    cd /root/repo && zip -r kms.zip kernel_memory_spark
    spark-submit --py-files kms.zip kernel_memory_spark/cli.py \
        --catalog /data/kms --docs 1000000 --execution-id exec-42

    # resume after a crash (completed steps are skipped via the step ledger):
    spark-submit --py-files kms.zip kernel_memory_spark/cli.py \
        --catalog /data/kms --execution-id exec-42 --resume

The master/parallelism comes from spark-submit (--master yarn/k8s,
--num-executors N); this module never hardcodes a master, so the same
artifact runs at N and 4N executors for the scaling protocol.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# spark-submit runs this file as a bare script: make the package importable
# without requiring PYTHONPATH (the --py-files zip covers the executors).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="kernel-memory-spark KG pipeline")
    p.add_argument("--catalog", required=True, help="table catalog root path")
    p.add_argument("--docs", type=int, default=0,
                   help="synthesize N interleaved docs as input (fresh runs)")
    p.add_argument("--corpus", default=None,
                   help="parquet path of an existing corpus (doc_id, spans)")
    p.add_argument("--execution-id", default="exec-0001")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max-tokens", type=int, default=1000)
    p.add_argument("--overlap", type=int, default=100)
    p.add_argument("--tokenizer", default="4char")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from kernel_memory_spark.sources.tables import TableCatalog
    from kernel_memory_spark.streaming.pipeline import Pipeline, PipelineConfig
    from kernel_memory_spark.synth import synth_corpus, synth_doc_tags

    spark = (
        SparkSession.builder.appName("kernel-memory-spark")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    corpus = tags = None
    if not args.resume:
        if args.corpus:
            corpus = spark.read.parquet(args.corpus)
        elif args.docs > 0:
            corpus = synth_corpus(spark, args.docs)
            tags = synth_doc_tags(spark, args.docs)
        else:
            p.error("fresh runs need --corpus or --docs")

    cfg = PipelineConfig(
        execution_id=args.execution_id,
        max_tokens=args.max_tokens,
        overlap=args.overlap,
        tokenizer=args.tokenizer,
    )
    pipe = Pipeline(spark, TableCatalog(args.catalog), cfg)
    metrics = pipe.run(corpus, tags, resume=args.resume)
    print(json.dumps({"execution_id": args.execution_id, "steps": metrics}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
