"""Scale-up wall-clock check for the graph/PMI operator family (round-4
verdict item #4): run the join-heavy iterative entries at a given SF
directory and print one JSON line of per-query walls.

Usage:
    python scripts/bench_graph_sf.py /root/testdata/sf0.1
    python scripts/bench_graph_sf.py /dev/shm/sf1.0
    python scripts/bench_graph_sf.py /dev/shm/sf1.0 scd2_orders bgp_match_docs
    (extra args override the default graph-family query list)

Same protocol as bench.py: local[$SPARK_GRAFT_CPUS] (default 32), walls
measured around a .count() that forces full execution, loadavg recorded
so a contaminated window is visible in the artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from kernel_memory_spark.session import get_spark

QUERIES = [
    "pagerank_copurchase",
    "triangle_counts_parts",
    "clustering_coeff_parts",
    "hits_parts",
    "adamic_adar_parts",
    "sssp_parts",
    "pmi_copurchase_edges",
    "pmi_index_edges",
    "lpa_communities_parts",
    "kcore_parts",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    queries = sys.argv[2:] or QUERIES
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=max(32, cpus)
    )
    qmap = entry.queries()
    load_before = os.getloadavg()[0]
    walls, rows = {}, {}
    for name in queries:
        t0 = time.monotonic()
        rows[name] = qmap[name](spark, sf_dir).count()
        walls[name] = round(time.monotonic() - t0, 2)
        print(f"{name}: {walls[name]}s ({rows[name]} rows)",
              file=sys.stderr)
    print(json.dumps({
        "metric": "graph_family_walls",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "queries": walls,
        "rows": rows,
        "total_sec": round(sum(walls.values()), 2),
        "load_1m_before": round(load_before, 2),
        "load_1m_after": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
