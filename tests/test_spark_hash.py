"""Murmur3 mirror + preimage bucket placement: the bucketed write must
fill exactly one shuffle partition per bucket (a balanced single wave),
not the ~1/e-empty balls-in-bins layout `repartition(n, bucket)` gives.
"""

import glob
import os

from pyspark.sql import functions as F

from kernel_memory_spark.functions.spark_hash import (
    bucket_preimages,
    murmur3_int32,
    pmod,
)
from kernel_memory_spark.sources.tables import TableCatalog


class TestMurmurMirror:
    def test_matches_spark_hash(self, spark):
        # pin the driver-side mirror against Spark's own Murmur3Hash —
        # a Spark upgrade that changed the shuffle hash turns this red
        vals = (list(range(-50, 200))
                + [2**31 - 1, -(2**31), 123456789, -987654321])
        df = spark.createDataFrame([(v,) for v in vals], "v int")
        got = {r.v: r.h
               for r in df.select("v", F.hash("v").alias("h")).collect()}
        for v in vals:
            assert got[v] == murmur3_int32(v), v

    def test_preimages_cover_and_invert(self):
        for n in (8, 32, 200):
            pre = bucket_preimages(n)
            assert len(pre) == n
            for b, c in enumerate(pre):
                assert pmod(murmur3_int32(c), n) == b


class TestPreimagePlacement:
    def test_each_bucket_own_partition(self, spark):
        n = 32
        pre = bucket_preimages(n)
        df = spark.createDataFrame(
            [(b,) for b in range(n) for _ in range(5)], "b int"
        )
        inv = spark.createDataFrame(list(enumerate(pre)), "b int, p int")
        placed = (
            df.join(F.broadcast(inv), "b")
            .repartition(n, "p")
            .withColumn("pid", F.spark_partition_id())
        )
        pid_of = {r.b: r.pid
                  for r in placed.select("b", "pid").distinct().collect()}
        # exact identity: bucket b lands in partition b, nothing shared
        assert pid_of == {b: b for b in range(n)}

    def test_write_bucketed_one_file_per_bucket(self, spark, tmp_path):
        cat = TableCatalog(str(tmp_path))
        df = spark.createDataFrame(
            [(f"d{i}", i) for i in range(400)], "doc_id string, x int"
        )
        cat.merge_bucketed(
            spark, "t", df, ["doc_id"], bucket_col="doc_id", n_buckets=16
        )
        bdirs = glob.glob(str(tmp_path / "t" / "data" / "*" / "__bucket=*"))
        assert len(bdirs) == 16  # 400 docs over 16 crc buckets: all hit
        for bdir in bdirs:
            files = [f for f in os.listdir(bdir) if f.endswith(".parquet")]
            assert len(files) == 1, bdir
        # round-trip intact
        assert cat.read(spark, "t").count() == 400
