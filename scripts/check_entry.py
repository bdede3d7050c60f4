"""Local mimic of the driver's correctness gate: run each __spark_entry__
query on Spark and its oracle on DuckDB at sf0.01; compare row count, column
names, and an order-insensitive value hash.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from kernel_memory_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    only = sys.argv[1:] or None
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            if len(srows) == 0:
                failures.append(name + " (0 rows)")
            continue
        try:
            ocur = con.sql(oracles[name])
            ocols = [d[0] for d in ocur.description]
            orows = ocur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failures.append(name)
            continue

        srows_t = [tuple(r) for r in srows]
        problems = []
        if len(srows_t) != len(orows):
            problems.append(f"rows {len(srows_t)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {scols} vs {ocols}")
        else:
            hs = table_hash(srows_t, scols)
            ho = table_hash(orows, ocols)
            if hs != ho:
                problems.append(f"hash {hs} vs {ho}")
        if problems:
            print(f"FAIL {name}: {', '.join(problems)}")
            failures.append(name)
        else:
            print(f"PASS {name} ({len(srows_t)} rows, {time.time()-t0:.1f}s)")

    print("=" * 60)
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
