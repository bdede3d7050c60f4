"""Stateful Structured-Streaming operators.

Two canonical stream-processing shapes the engine needs beyond foreachBatch
ingestion (streaming/ingest.py):

- `streaming_exact_dedup` — cross-batch exact deduplication with
  `applyInPandasWithState`: the stream partitions by a hash bucket of the
  dedup key; each bucket's state is the set of keys already seen across
  ALL previous micro-batches, and only first-seen rows are emitted. This is
  the streaming analog of the batch exact-dedup groupBy (operators/dedup
  D1) and of the reference's CachedEmbeddingGenerator dedupe-before-embed:
  at 100TB the state shards across buckets (state store per partition) and
  each batch's work is O(batch).

- `windowed_event_counts` — watermarked tumbling-window aggregation:
  event-time windows with late-data tolerance via `withWatermark`. The
  streaming analog of the `events_hourly` batch query; watermarking bounds
  state (closed windows age out) so it runs forever.

Both use Spark's built-in state store — no external service; on a real
cluster the state shards with `spark.sql.shuffle.partitions` and lives in
the checkpoint, surviving restarts exactly like the ingest ledger.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

DEDUP_BUCKETS = 32


def streaming_exact_dedup(
    stream: DataFrame,
    key_col: str = "text_sha256",
    id_col: str = "doc_id",
    n_buckets: int = DEDUP_BUCKETS,
) -> DataFrame:
    """First-seen filter across micro-batches.

    Rows whose key_col was seen in ANY earlier batch (or earlier in the
    same batch, first by id_col order within the Arrow batch) are dropped.
    State per hash bucket = the seen-key set; output rows keep (id, key).
    """
    out_schema = StructType([
        StructField("id", StringType()),
        StructField("key", StringType()),
    ])
    state_schema = StructType([
        StructField("seen", ArrayType(StringType())),
    ])

    def dedup(
        bucket: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            pdf = pdf.sort_values("id", kind="stable")
            fresh_mask = []
            for k in pdf["key"]:
                if k in seen:
                    fresh_mask.append(False)
                else:
                    seen.add(k)
                    fresh_mask.append(True)
            out = pdf[fresh_mask]
            if len(out):
                yield out[["id", "key"]]
        state.update((sorted(seen),))

    keyed = stream.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(key_col).cast("string").alias("key"),
    ).withColumn(
        "bucket", F.pmod(F.crc32(F.col("key")), F.lit(n_buckets)).cast("int")
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time windows with late-data tolerance: counts per
    (window, group). The watermark lets the engine drop state for windows
    older than max(event_time) - watermark, so state is bounded however
    long the stream runs."""
    # event-time columns must be TIMESTAMP (parquet often stores NTZ)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration), F.col(group_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            group_col,
            "n",
        )
    )


def streaming_sessions(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time SESSION windows per user (dynamic-gap sibling of
    windowed_event_counts's tumbling windows): a session extends while
    consecutive events arrive within `gap`, closes `gap` after the last
    one — Structured Streaming's session_window keeps per-(user, open
    session) state, merges on overlap, and the watermark bounds state by
    evicting sessions no late event can still extend. The streaming
    equivalent of operators/sessions.sessionize for a live event feed.

    Emits one row per CLOSED session (append mode): user, session
    start/end, n_events, sum of `value` when present."""
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    aggs = [F.count("*").alias("n_events")]
    if "value" in stream.columns:
        aggs.append(F.sum("value").alias("sum_value"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap),
        )
        .agg(*aggs)
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *(
                ["n_events", "sum_value"]
                if "value" in stream.columns
                else ["n_events"]
            ),
        )
    )
