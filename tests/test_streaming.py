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
    if str(pdf["ts"].dtype) != "int64":
        import pandas as pd

        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64")
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


class _FakeState:
    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None
        self.removed = False
        self.timeout_ms = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def remove(self):
        self.removed = True
        self.exists = False

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _mk_pdf(rows):
    import pandas as pd

    return pd.DataFrame(
        [
            {
                "event_id": eid,
                "ts": pd.Timestamp(us * 1000),
                "user_id": 1,
                "event_type": t,
                "value": 0.0,
                "props": "",
            }
            for eid, us, t in rows
        ]
    )


def test_state_fn_out_of_order_late_event_finds_pending_successor():
    """A late planned event whose unplanned successor is ALREADY pending
    resolves immediately instead of waiting forever (out-of-order path)."""
    fn = ING._make_label_state_fn(None)
    st = _FakeState()
    day_us = 86_400_000_000
    # batch 1: planned@d0 then (out of order) unplanned@d10 arrives first —
    # micro-batch sort fixes intra-batch order, so run them in two batches
    out1 = list(fn((1,), iter([_mk_pdf([(10, 10 * day_us, "purchase")])]), st))
    assert out1 == []  # unplanned event has no pending predecessor yet
    out2 = list(fn((1,), iter([_mk_pdf([(1, 0, ING.PLANNED_TYPE)])]), st))
    rows = out2[0].to_dict("records")
    assert len(rows) == 1
    assert rows[0]["event_id"] == 1
    assert rows[0]["next_unplanned_us"] == 10 * day_us
    assert rows[0]["gap_days"] == 10.0 and rows[0]["readmit_30d"] == 1


def test_state_fn_unplanned_resolves_only_older_pending():
    """An unplanned arrival must not resolve pending events NEWER than it
    (they arrived early, out of order)."""
    fn = ING._make_label_state_fn(None)
    st = _FakeState()
    day_us = 86_400_000_000
    # batch 1: event@d20 arrives early (pending)
    assert list(fn((1,), iter([_mk_pdf([(2, 20 * day_us, "view")])]), st)) == []
    # batch 2: late unplanned@d5 — resolves nothing (no pending <= d5),
    # and itself stays pending (its successor hasn't arrived)
    # note event 2 ("view", unplanned) IS at-or-after d5, so event 3
    # resolves against it immediately
    out = list(fn((1,), iter([_mk_pdf([(3, 5 * day_us, "view")])]), st))
    rows = out[0].to_dict("records")
    assert [r["event_id"] for r in rows] == [3]
    assert rows[0]["next_unplanned_us"] == 20 * day_us
    assert rows[0]["gap_days"] == 15.0 and rows[0]["readmit_30d"] == 1
    # event 2 still pending, untouched
    assert 2 in st.get[0]


def test_state_fn_late_planned_after_successor_resolved():
    """ADVICE r3: a planned event arriving AFTER its true successor was
    already resolved out of pending must still match that successor (from
    the retained unplanned history), not a later pending unplanned."""
    fn = ING._make_label_state_fn(None)
    st = _FakeState()
    day_us = 86_400_000_000
    # batch 1: view@d25 pends; batch 2: view@d40 resolves it (and pends)
    assert list(fn((1,), iter([_mk_pdf([(2, 25 * day_us, "view")])]), st)) == []
    out2 = list(fn((1,), iter([_mk_pdf([(3, 40 * day_us, "view")])]), st))
    assert [r["event_id"] for r in out2[0].to_dict("records")] == [2]
    # batch 3: planned@d5 arrives very late — its true successor is the
    # RESOLVED view@d25 (gap 20, readmit 1), not the pending view@d40
    out3 = list(fn((1,), iter([_mk_pdf([(1, 5 * day_us, ING.PLANNED_TYPE)])]), st))
    rows = out3[0].to_dict("records")
    assert len(rows) == 1 and rows[0]["event_id"] == 1
    assert rows[0]["next_unplanned_us"] == 25 * day_us
    assert rows[0]["gap_days"] == 20.0 and rows[0]["readmit_30d"] == 1


def test_parse_interval_us():
    import pytest

    assert ING.parse_interval_us("90 days") == 90 * 86_400_000_000
    assert ING.parse_interval_us("90days") == 90 * 86_400_000_000
    assert ING.parse_interval_us("1 week") == 7 * 86_400_000_000
    assert (
        ING.parse_interval_us("2 hours 30 minutes")
        == 2 * 3_600_000_000 + 30 * 60_000_000
    )
    with pytest.raises(ValueError, match="supported"):
        ING.parse_interval_us("3 fortnights")
    with pytest.raises(ValueError, match="supported"):
        ING.parse_interval_us("soon")


def test_state_fn_event_time_eviction():
    day_us = 86_400_000_000
    fn = ING._make_label_state_fn(day_us)  # 1 day
    st = _FakeState()
    list(fn((1,), iter([_mk_pdf([(1, day_us, ING.PLANNED_TYPE)])]), st))
    assert st.timeout_ms == 2 * day_us // 1000  # max ts + gap, in ms
    st.hasTimedOut = True
    assert list(fn((1,), iter([]), st)) == []
    assert st.removed


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


def test_stream_static_enrichment_matches_batch(spark):
    tmp = tempfile.mkdtemp(prefix="stream_enrich_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    try:
        chunks = _chunked_event_files(spark, tmp, n_chunks=2)
        for i, c in enumerate(chunks):
            shutil.copy(c, os.path.join(src, f"chunk_{i}.parquet"))
        # static dim: event_type -> severity score
        dim = spark.createDataFrame(
            [("purchase", 3), ("error", 5), ("login", 1)],
            "event_type string, severity int",
        )
        stream = ING.stream_events(spark, src)
        enriched = ING.enrich_stream(stream, dim, "event_type").groupBy("severity").count()
        q = (
            enriched.writeStream.format("memory")
            .queryName("enrich_out")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            r["severity"]: r["count"]
            for r in spark.sql("SELECT * FROM enrich_out").collect()
        }
        batch = read_table(spark, SF, "events")
        want = {
            r["severity"]: r["count"]
            for r in batch.join(dim, "event_type", "left").groupBy("severity").count().collect()
        }
        assert got == want and len(got) > 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_dedup_drops_redeliveries(spark):
    tmp = tempfile.mkdtemp(prefix="stream_dedup_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    try:
        chunks = _chunked_event_files(spark, tmp, n_chunks=2)
        # deliver chunk 0 TWICE (as separate files/micro-batches), then 1
        shutil.copy(chunks[0], os.path.join(src, "a.parquet"))
        shutil.copy(chunks[0], os.path.join(src, "a_redelivery.parquet"))
        shutil.copy(chunks[1], os.path.join(src, "b.parquet"))
        stream = ING.stream_events(spark, src)
        deduped = ING.dedup_stream(stream, ["event_id"], watermark="7 days")
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql("SELECT event_id FROM dedup_out").collect()
        ids = [r["event_id"] for r in got]
        assert len(ids) == len(set(ids))  # no duplicate made it through
        assert len(ids) == read_table(spark, SF, "events").count()
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


def test_snapshot_append_sink_exactly_once(spark, tmp_path):
    """A full stream replay (fresh checkpoint, same app) must commit ZERO
    new rows: every batch's txn is already in the table log."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import SnapshotTable
    from predicting_hospital_readmission_using_mimic_database_spark.streaming import ingest as ING

    src = tmp_path / "src"
    src.mkdir()
    tbl = str(tmp_path / "tbl")
    SnapshotTable.create(spark, tbl, "event_id long, event_type string, value double")
    import pandas as pd

    for i in range(3):
        pd.DataFrame(
            {
                "event_id": range(i * 10, i * 10 + 10),
                "ts": [1_700_000_000_000_000_000 + j for j in range(10)],
                "user_id": [1] * 10,
                "event_type": ["a"] * 10,
                "value": [float(i)] * 10,
                "props": ["{}"] * 10,
            }
        ).to_parquet(src / f"c{i}.parquet")

    def run(ck):
        s = ING.stream_events(spark, str(src)).select("event_id", "event_type", "value")
        q = ING.snapshot_append_sink(s, tbl, str(tmp_path / ck), app_id="t")
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run("ck1")
    t = SnapshotTable(spark, tbl)
    assert t.read().count() == 30
    n_commits = t.version
    run("ck2")  # worst-case replay: all batches re-delivered
    t2 = SnapshotTable(spark, tbl)
    assert t2.read().count() == 30  # no duplicates
    assert t2.version == n_commits  # zero new commits
    assert t2.read().agg(F.countDistinct("event_id")).collect()[0][0] == 30
