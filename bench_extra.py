#!/usr/bin/env python
"""Extra benchmarks for the optimization round (bench.py is FROZEN).

Modes:
  python bench_extra.py queries [name ...]   -- per-query noop-sink timing
      (best of N) + .explain("formatted") dump for the headline queries (or
      the named entries), written to plans/<tag>/<name>_<suffix>.txt.
  python bench_extra.py pipeline             -- one warm KG-pipeline run with
      per-step walls (same synth input as bench.py default mode).

Env:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default 32)
  BE_RUNS              repeats per query (default 3)
  BE_PLAN_DIR          plan dump dir (default plans/r06)
  BE_PLAN_SUFFIX       file suffix, e.g. "before"/"after" (default none = no dump)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BE_RUNS", "3"))
PLAN_DIR = os.environ.get("BE_PLAN_DIR", os.path.join(REPO, "plans", "r06"))
SUFFIX = os.environ.get("BE_PLAN_SUFFIX", "")

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_revenue_by_nation",
    "knn_topk", "minhash_lsh_dedup", "connected_components_star",
    "latest_event_per_user", "rerank_events", "salted_supplier_counts",
    "kg_triples_sf",
]


def _spark():
    from kernel_memory_spark.session import get_spark

    return get_spark(master=f"local[{CPUS}]",
                     shuffle_partitions=max(32, CPUS))


def mode_queries(names):
    import __spark_entry__ as entrymod

    spark = _spark()
    # warmup identical to bench.py default mode
    warm = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite").save()
    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        if SUFFIX:
            os.makedirs(PLAN_DIR, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(PLAN_DIR, f"{name}_{SUFFIX}.txt"),
                      "w") as f:
                f.write(plan)
        samples = []
        for _ in range(RUNS):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"mode": "queries", "sf_dir": SF_DIR, "cpus": CPUS,
                      "load_1m": round(os.getloadavg()[0], 2),
                      "queries": out}))
    spark.stop()


def mode_pipeline():
    import bench

    spark = _spark()
    # warmup: a small pipeline run primes codegen/Python workers
    bench.run_pipeline(spark, 2000)
    sf = bench.sf_value(SF_DIR)
    r = bench.run_pipeline(spark, bench.bench_docs(sf))
    r["load_1m"] = round(os.getloadavg()[0], 2)
    print(json.dumps({"mode": "pipeline", **r}))
    spark.stop()


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "pipeline":
        mode_pipeline()
    else:
        names = args[1:] if len(args) > 1 else HEADLINE
        mode_queries(names)
