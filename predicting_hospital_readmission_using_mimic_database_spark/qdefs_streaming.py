"""Streaming query definitions (rows-only: streams aren't SQL-expressible
for the DuckDB oracle; the equivalence contract is asserted in-engine and
emitted as an invariant row — tests/test_streaming.py drives the same
check as a pytest)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from .plans.readmission import readmit_labels
from .registry import query
from .sources.io import read_table
from .streaming import ingest as ING


@query("st1_stream_labels_equivalence")
def q_st1(spark, sf):
    """Incremental readmission labels over micro-batches == batch labels
    for every batch-resolvable event (custom stateful operator,
    applyInPandasWithState keyed by user)."""
    tmp = tempfile.mkdtemp(prefix="st1_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    qname = "st1_out"
    try:
        from .session import tune_session

        tune_session(spark)  # nanosAsLong for the raw int64-ts read
        raw = spark.read.parquet(os.path.join(sf, "events.parquet"))
        pdf = raw.orderBy("ts", "event_id").toPandas()
        n_chunks = 3
        per = (len(pdf) + n_chunks - 1) // n_chunks
        stream = ING.stream_events(spark, src)
        q = (
            ING.readmit_labels_stream(stream)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .start()
        )
        try:
            for i in range(n_chunks):
                pdf.iloc[i * per : (i + 1) * per].to_parquet(
                    os.path.join(src, f"chunk_{i}.parquet")
                )
                q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["event_id"], r["next_unplanned_us"], r["readmit_30d"])
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }
        batch = readmit_labels(read_table(spark, sf, "events"))
        want = {
            (r["event_id"], r["nus"], r["readmit_30d"])
            for r in batch.filter(F.col("next_unplanned_ts").isNotNull())
            .select(
                "event_id",
                F.unix_micros("next_unplanned_ts").alias("nus"),
                "readmit_30d",
            )
            .collect()
        }
        return spark.createDataFrame(
            [(len(got), len(want), bool(got == want))],
            "n_stream long, n_batch_resolvable long, exact_match boolean",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
