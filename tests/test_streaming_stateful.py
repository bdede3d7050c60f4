"""Stateful streaming: cross-batch dedup state + watermarked windows."""

import glob
import os
import shutil

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.streaming import stateful as sf_ops


def drop_file(df, source_dir, name):
    tmp = os.path.join(os.path.dirname(source_dir.rstrip("/")), f"_tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(tmp + "/part-*.parquet")[0]
    os.makedirs(source_dir, exist_ok=True)
    shutil.move(part, os.path.join(source_dir, f"{name}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


def run_dedup(spark, src, checkpoint, out_dir):
    """File sink (fault-tolerant, unlike memory): restarting the
    availableNow query from the same checkpoint restores the dedup state.
    Returns the CUMULATIVE emitted set."""
    stream = spark.readStream.schema(
        "doc_id string, text_sha256 string"
    ).parquet(src)
    q = (
        sf_ops.streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {(r.id, r.key) for r in spark.read.parquet(out_dir).collect()}


class TestStreamingExactDedup:
    def test_state_survives_across_batches(self, spark, tmp_path):
        src = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        b1 = spark.createDataFrame(
            [("d1", "hashA"), ("d2", "hashA"), ("d3", "hashB")],
            "doc_id string, text_sha256 string",
        )
        out = str(tmp_path / "out")
        drop_file(b1, src, "b1")
        got1 = run_dedup(spark, src, ckpt, out)
        # within-batch dupes collapse to the first id
        assert got1 == {("d1", "hashA"), ("d3", "hashB")}

        # second delivery: hashB already in STATE from batch 1; only C is new
        b2 = spark.createDataFrame(
            [("d4", "hashB"), ("d5", "hashC")],
            "doc_id string, text_sha256 string",
        )
        drop_file(b2, src, "b2")
        got2 = run_dedup(spark, src, ckpt, out)
        assert got2 == {("d1", "hashA"), ("d3", "hashB"), ("d5", "hashC")}


class TestWindowedEventCounts:
    def test_counts_match_batch_aggregation(self, spark, tmp_path):
        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        src = str(tmp_path / "ev")
        drop_file(events, src, "events")
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            sf_ops.windowed_event_counts(stream)
            .writeStream.format("memory")
            .queryName("ev_counts")
            .option("checkpointLocation", str(tmp_path / "evck"))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.window_start, r.event_type): r.n
            for r in spark.table("ev_counts").collect()
        }
        expected = {
            (r.ws, r.event_type): r.n
            for r in events.groupBy(
                F.date_trunc("hour", "ts").alias("ws"), "event_type"
            ).agg(F.count("*").alias("n")).collect()
        }
        assert got == expected
        assert len(got) > 10


class TestStreamingSessions:
    def test_sessions_match_reference(self, spark, tmp_path):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
        m = dt.timedelta(minutes=1)
        rows = [
            # u1: two sessions (40-min silence splits at 30-min gap)
            (1, t0), (1, t0 + 5 * m), (1, t0 + 20 * m),
            (1, t0 + 60 * m), (1, t0 + 65 * m),
            # u2: one session, single event
            (2, t0 + 10 * m),
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
        src = str(tmp_path / "sess_in")
        drop_file(ev, src, "b1")
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            sf_ops.streaming_sessions(stream, gap="30 minutes")
            .writeStream.format("memory")
            .queryName("sessions_out")
            .option("checkpointLocation", str(tmp_path / "sessck"))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.user_id, r.session_start, r.session_end): r.n_events
            for r in spark.table("sessions_out").collect()
        }
        gap = dt.timedelta(minutes=30)
        assert got == {
            (1, t0, t0 + 20 * m + gap): 3,
            (1, t0 + 60 * m, t0 + 65 * m + gap): 2,
            (2, t0 + 10 * m, t0 + 40 * m): 1,
        }

    def test_value_column_summed(self, spark, tmp_path):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [(1, t0, 2.0), (1, t0 + dt.timedelta(minutes=1), 3.0)],
            "user_id long, ts timestamp, value double",
        )
        src = str(tmp_path / "sess_in2")
        drop_file(ev, src, "b1")
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            sf_ops.streaming_sessions(stream)
            .writeStream.format("memory")
            .queryName("sessions_out2")
            .option("checkpointLocation", str(tmp_path / "sessck2"))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.table("sessions_out2").collect()
        assert len(rows) == 1
        assert rows[0].n_events == 2 and rows[0].sum_value == 5.0
