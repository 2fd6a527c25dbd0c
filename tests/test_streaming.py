"""Streaming equivalence tests (SURVEY §7 phase 5): micro-batched event
ingest must reproduce the batch operators' results."""

import glob
import os
import shutil
import tempfile

import pyspark.sql.functions as F

from predicting_hospital_readmission_using_mimic_database_spark.plans.readmission import readmit_labels
from predicting_hospital_readmission_using_mimic_database_spark.sources.io import read_table
from predicting_hospital_readmission_using_mimic_database_spark.streaming import ingest as ING

SF = "/root/testdata/sf0.001"


def _chunked_event_files(spark, tmp, n_chunks=3):
    """Split events into ts-ordered parquet chunks (arrival order = event
    order per user, the streaming contract)."""
    from predicting_hospital_readmission_using_mimic_database_spark.session import tune_session

    tune_session(spark)  # nanosAsLong so the raw int64-ts read succeeds
    raw = spark.read.parquet(f"{SF}/events.parquet")  # keep int64 nanos ts
    n = raw.count()
    per = (n + n_chunks - 1) // n_chunks
    pdf = raw.orderBy("ts", "event_id").toPandas()
    paths = []
    for i in range(n_chunks):
        chunk = pdf.iloc[i * per : (i + 1) * per]
        p = os.path.join(tmp, f"staging_{i}.parquet")
        chunk.to_parquet(p)
        paths.append(p)
    return paths


def test_stateful_labels_match_batch(spark):
    tmp = tempfile.mkdtemp(prefix="stream_labels_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    try:
        chunks = _chunked_event_files(spark, tmp, n_chunks=3)
        stream = ING.stream_events(spark, src)
        labels = ING.readmit_labels_stream(stream)
        q = (
            labels.writeStream.format("memory")
            .queryName("labels_out")
            .outputMode("append")
            .start()
        )
        try:
            for i, c in enumerate(chunks):
                shutil.copy(c, os.path.join(src, f"chunk_{i}.parquet"))
                q.processAllAvailable()
        finally:
            q.stop()

        got = {
            r["event_id"]: (r["next_unplanned_us"], round(r["gap_days"], 9), r["readmit_30d"])
            for r in spark.sql("SELECT * FROM labels_out").collect()
        }

        batch = readmit_labels(read_table(spark, SF, "events"))
        want_rows = (
            batch.filter(F.col("next_unplanned_ts").isNotNull())
            .select(
                "event_id",
                F.unix_micros("next_unplanned_ts").alias("nus"),
                "gap_days",
                "readmit_30d",
            )
            .collect()
        )
        want = {
            r["event_id"]: (r["nus"], round(r["gap_days"], 9), r["readmit_30d"])
            for r in want_rows
        }
        # every batch-resolvable event was emitted by the stream, identically
        assert got == want
        assert len(got) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_windowed_counts_match_batch(spark):
    tmp = tempfile.mkdtemp(prefix="stream_win_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    try:
        chunks = _chunked_event_files(spark, tmp, n_chunks=2)
        for i, c in enumerate(chunks):
            shutil.copy(c, os.path.join(src, f"chunk_{i}.parquet"))
        stream = ING.stream_events(spark, src)
        counts = ING.windowed_event_counts(stream, window="1 day", watermark="2 days")
        q = (
            counts.writeStream.format("memory")
            .queryName("win_out")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["window_start"], r["event_type"]): r["n"]
            for r in spark.sql("SELECT * FROM win_out").collect()
        }

        batch = read_table(spark, SF, "events")
        want = {
            (r["ws"], r["event_type"]): r["n"]
            for r in batch.groupBy(
                F.window("ts", "1 day").alias("win"), "event_type"
            )
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").alias("ws"), "event_type", "n")
            .collect()
        }
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_session_windows_match_batch(spark):
    tmp = tempfile.mkdtemp(prefix="stream_sess_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    try:
        chunks = _chunked_event_files(spark, tmp, n_chunks=2)
        for i, c in enumerate(chunks):
            shutil.copy(c, os.path.join(src, f"chunk_{i}.parquet"))
        stream = ING.stream_events(spark, src)
        sess = ING.sessionized_counts(stream, gap="30 minutes", watermark="2 days")
        q = (
            sess.writeStream.format("memory")
            .queryName("sess_out")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["user_id"], r["session_start"], r["n_events"])
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
        batch = read_table(spark, SF, "events")
        want = {
            (r["user_id"], r["ss"], r["n_events"])
            for r in batch.groupBy(
                F.session_window("ts", "30 minutes").alias("sess"), "user_id"
            )
            .agg(F.count("*").alias("n_events"))
            .select("user_id", F.col("sess.start").alias("ss"), "n_events")
            .collect()
        }
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
