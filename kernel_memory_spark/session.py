"""SparkSession factory with the scale-oriented defaults this engine assumes.

AQE (runtime re-planning + skew-join splitting) is always on; shuffle
partitions default to the local core count but are meant to be overridden to
~2-3x total cores on a real cluster. Arrow is enabled for every pandas UDF
stage (chunker, embeddings, minhash) with a bounded batch size so executor
memory stays flat regardless of document size distribution.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kernel-memory-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of shuffle partitions + skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas UDFs; bounded batches keep UDF memory flat.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # Keep broadcast joins for dimension-sized sides (default 10MB is
        # fine locally; raise on a real cluster).
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Shuffle/Arrow scratch on tmpfs when available: the sandbox's single
    # shared disk is a non-scaling resource co-tenants contend on (observed
    # 2-3x wall inflation at LOW cpu load — I/O wait, not compute), while a
    # real cluster's executor-local NVMe scales with executors; /dev/shm is
    # the closest local analog. Override with SPARK_GRAFT_LOCAL_DIR.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR") or (
        "/dev/shm/kms-spark-local" if os.path.isdir("/dev/shm") else None
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if os.environ.get("SPARK_GRAFT_PREWARM", "1") != "0":
        _prewarm_python_workers(spark)
    return spark


_PREWARMED: set = set()


def _prewarm_python_workers(spark) -> None:
    """Fork the Python worker pool once at session creation: the first
    pandas-UDF/mapInPandas stage otherwise absorbs one worker fork plus a
    pandas+pyarrow import per core (~1-2s on 32 cores), charged to whatever
    operator happens to run Python first. Workers are reused
    (spark.python.worker.reuse default), so this is per-session setup cost
    moved out of the first query — no data is touched, nothing is cached.
    Disable with SPARK_GRAFT_PREWARM=0."""
    key = id(spark)
    if key in _PREWARMED:
        return
    _PREWARMED.add(key)
    try:
        n = spark.sparkContext.defaultParallelism
        (
            spark.range(n, numPartitions=n)
            .mapInPandas(lambda it: it, schema="id long")
            .write.format("noop").mode("overwrite").save()
        )
    except Exception:  # prewarm is best-effort, never fail session creation
        pass
