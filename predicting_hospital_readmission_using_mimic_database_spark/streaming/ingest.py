"""Structured Streaming ingest of the ``events`` table (SURVEY.md §7
phase 5; north-star streaming surface).

Two streaming operators:

- :func:`windowed_event_counts` — tumbling/sliding event-time windows with
  a watermark (late data beyond the watermark is dropped, state is
  finalized and evicted — bounded state at any input rate);
- :func:`readmit_labels_stream` — the flagship readmission label computed
  INCREMENTALLY as a custom stateful operator (``applyInPandasWithState``
  keyed by user): batch semantics are "next event with an unplanned type
  at-or-after each event" (lead -> elective-null-out -> backfill,
  plans/readmission.py); the streaming form holds each user's
  not-yet-resolved events in state and resolves them the moment a later
  unplanned event arrives. Emitted rows match the batch operator exactly
  for every event whose successor has arrived (the tail stays pending —
  exactly the rows whose label the batch can't know either).

Scale posture: state is per-user and shrinks on every unplanned arrival;
the shuffle key is ``user_id`` (same key as the batch window — co-located
with the batch plan's partitioning). Arrow-batched pandas state handler,
no driver-side loops.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.io import read_table

#: planned-readmission event type excluded from labels (plans/readmission.py
#: maps the reference's ELECTIVE admissions to 'signup' on harness data)
PLANNED_TYPE = "signup"

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", LongType(), True),  # TIMESTAMP(NANOS) as int64
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def stream_events(spark: SparkSession, dir_path: str) -> DataFrame:
    """File-source stream over a directory of event parquet files (each new
    file = a micro-batch). Converts the nanosecond int64 ``ts`` exactly as
    the batch reader does."""
    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir_path)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` differs) event-time window
    counts per event type, watermarked so late rows beyond ``watermark``
    are dropped and window state is evicted."""
    w = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def sessionized_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Session windows per user: events within ``gap`` of each other merge
    into one session (dynamic windows — the streaming analogue of a
    per-user visit). Watermarked so closed sessions finalize and evict."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def enrich_stream(
    events: DataFrame, dim: DataFrame, on, how: str = "left", broadcast: bool = True
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against the
    current snapshot of a batch dimension table — no streaming state at
    all (the planner re-reads the static side per trigger, so a dim
    REFRESHED in place is picked up without restarting the query).

    ``broadcast=True`` hints the static side below the broadcast
    threshold semantics — dims are small by definition; a stream-static
    join that shuffles the stream side per micro-batch is the trap this
    wrapper exists to avoid.
    """
    d = F.broadcast(dim) if broadcast else dim
    return events.join(d, on, how)


def dedup_stream(
    events: DataFrame,
    keys,
    watermark: str = "1 day",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key arriving
    within the watermark horizon (``dropDuplicatesWithinWatermark`` —
    state for a key is EVICTED once the watermark passes it, so state is
    bounded by arrival rate x horizon, never the full history; plain
    ``dropDuplicates`` on a stream keeps every key forever)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


LABEL_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("ts_us", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("next_unplanned_us", LongType(), False),
        StructField("gap_days", DoubleType(), False),
        StructField("readmit_30d", IntegerType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("ev_ids", ArrayType(LongType()), True),
        StructField("ts_us", ArrayType(LongType()), True),
        StructField("types", ArrayType(StringType()), True),
        # every unplanned event time seen (incl. ALREADY-RESOLVED ones):
        # a planned event arriving after its true successor was resolved
        # out of pending must still find that successor here, not a later
        # pending one. Pruned to the eviction horizon when one is set.
        StructField("unpl_us", ArrayType(LongType()), True),
    ]
)


_INTERVAL_UNIT_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
}


def parse_interval_us(interval: str) -> int:
    """Microseconds for the interval forms Spark's ``withWatermark``
    accepts — ``"90 days"``, ``"1 week"``, ``"90days"``, ``"2 hours 30
    minutes"`` — so the same string can never be valid for the watermark
    but crash the timeout computation."""
    import re

    total = 0
    matched = re.findall(r"(\d+)\s*([a-zA-Z]+)", interval)
    rest = re.sub(r"(\d+)\s*([a-zA-Z]+)", "", interval).strip()
    if not matched or rest:
        raise ValueError(
            f"unsupported interval {interval!r}: expected one or more "
            f"'<n> <unit>' groups with unit in "
            f"{sorted(_INTERVAL_UNIT_US)} (plural accepted)"
        )
    for qty, unit in matched:
        u = unit.lower().rstrip("s") if unit.lower() != "s" else unit.lower()
        if u not in _INTERVAL_UNIT_US:
            raise ValueError(
                f"unsupported interval unit {unit!r} in {interval!r}: "
                f"supported units are {sorted(_INTERVAL_UNIT_US)} "
                "(plural accepted)"
            )
        total += int(qty) * _INTERVAL_UNIT_US[u]
    return total


def _make_label_state_fn(evict_gap_us: int | None):
    """Build the per-user state handler. ``evict_gap_us`` non-None enables
    event-time eviction: a user with no arrivals for that long (by
    watermark) has their pending state dropped — those events have no
    successor yet, exactly the rows the batch plan labels unresolved, so
    evicting without emitting keeps emitted rows a subset of
    batch-resolved rows while bounding state on unbounded streams."""

    def _label_state_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        """Per-user state handler: pending = events awaiting their next
        unplanned successor, in event-time order.

        Out-of-order arrival contract: every emitted label equals the batch
        label ("earliest unplanned event at-or-after mine") PROVIDED the
        unplanned events of a user arrive in event-time order relative to
        each other. Planned events may arrive arbitrarily late: a late
        arrival searches the FULL unplanned history (``unpl_us`` — kept in
        state even after those events resolve out of pending, pruned only
        to the eviction horizon), so a planned event whose true successor
        was already resolved still gets the earliest at-or-after
        successor, not a later pending one. An unplanned arrival resolves
        only pending events at-or-before its event time — never the
        out-of-order newer ones. What append mode cannot do is retract:
        an unplanned event arriving BEFORE an already-emitted successor
        cannot shrink those emitted gaps.
        """
        (user_id,) = key
        if evict_gap_us is not None and state.hasTimedOut:
            state.remove()
            return

        if state.exists:
            ev_ids, ts_us, types, unpl_us = state.get
            pending = list(zip(ev_ids, ts_us, types))
            unpl_hist = list(unpl_us or [])
        else:
            pending = []
            unpl_hist = []

        out_rows = []
        max_ts_us = max((p[1] for p in pending), default=0)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for r in pdf.itertuples(index=False):
                ts_us_new = int(r.ts.value // 1000)  # pandas ns -> µs
                typ = str(r.event_type)
                max_ts_us = max(max_ts_us, ts_us_new)
                if typ != PLANNED_TYPE:
                    if pending:
                        for pid, pus, ptype in pending:
                            if pus > ts_us_new:
                                continue  # out-of-order newer event: not ours
                            gap = (ts_us_new - pus) / 86400.0e6
                            out_rows.append(
                                (pid, user_id, pus, ptype, ts_us_new, gap, int(gap < 30))
                            )
                        pending = [p for p in pending if p[1] > ts_us_new]
                # a late arrival may find its successor already seen — the
                # earliest unplanned event at-or-after it, RESOLVED OR
                # PENDING (unpl_hist holds both; under the in-order
                # contract any future unplanned arrival is later than
                # everything here, so a history hit is the true earliest).
                # An unplanned event's own successor is strictly AFTER it
                # (batch lead semantics — never an equal-ts sibling).
                succ = [
                    u for u in unpl_hist
                    if (u >= ts_us_new if typ == PLANNED_TYPE else u > ts_us_new)
                ]
                if succ:
                    nus = min(succ)
                    gap = (nus - ts_us_new) / 86400.0e6
                    out_rows.append(
                        (int(r.event_id), user_id, ts_us_new, typ, nus, gap, int(gap < 30))
                    )
                else:
                    pending.append((int(r.event_id), ts_us_new, typ))
                if typ != PLANNED_TYPE:
                    unpl_hist.append(ts_us_new)

        pending.sort(key=lambda p: (p[1], p[0]))
        unpl_hist.sort()
        if evict_gap_us is not None and max_ts_us:
            # keep only the eviction horizon of unplanned history: a
            # planned event older than that is itself evictable, so the
            # successors it could still need are all inside the horizon
            horizon = max_ts_us - evict_gap_us
            unpl_hist = [u for u in unpl_hist if u >= horizon]
        state.update(
            (
                [p[0] for p in pending],
                [p[1] for p in pending],
                [p[2] for p in pending],
                unpl_hist,
            )
        )
        if evict_gap_us is not None and max_ts_us:
            state.setTimeoutTimestamp((max_ts_us + evict_gap_us) // 1000)  # ms
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "event_id", "user_id", "ts_us", "event_type",
                    "next_unplanned_us", "gap_days", "readmit_30d",
                ],
            )

    return _label_state_fn


def readmit_labels_stream(
    events: DataFrame, evict_after: str | None = None
) -> DataFrame:
    """Incremental readmission labels (custom stateful operator).

    Emits one row per event as soon as its next unplanned successor
    arrives; events still waiting stay in per-user state (the batch plan
    labels those NULL/0 only because it sees the end of input). See
    ``_make_label_state_fn`` for the out-of-order arrival contract.

    ``evict_after`` (e.g. ``"90 days"``): watermark + event-time timeout —
    users idle that long have their pending state evicted un-emitted,
    bounding state on unbounded streams. Default keeps everything
    (NoTimeout), matching batch exactly on finite replays.
    """
    if evict_after is None:
        return events.groupBy("user_id").applyInPandasWithState(
            _make_label_state_fn(None),
            outputStructType=LABEL_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    evict_us = parse_interval_us(evict_after)  # validate BEFORE the stream starts
    return (
        events.withWatermark("ts", evict_after)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_label_state_fn(evict_us),
            outputStructType=LABEL_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def interval_join_stream(
    events: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """Stream-stream event-time INTERVAL JOIN: each 'purchase' event joins
    the same user's 'view' events from the preceding ``lookback`` window.

    The canonical Structured Streaming range join: BOTH sides are
    watermarked and the join carries an event-time constraint
    (``view_ts BETWEEN purchase_ts - lookback AND purchase_ts``), which
    is what lets Spark bound the buffered state — a view row is evicted
    once the watermark guarantees no future purchase can still reach
    back to it. Inner joins emit eagerly (no watermark wait), so results
    stream out as matches arrive.

    Self-join of one source: two filtered branches of the same stream —
    no second scan of the input.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    return purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("view_ts") <= F.col("purchase_ts")),
        "inner",
    ).select("purchase_id", "view_id", "purchase_ts", "view_ts")


def upsert_counts_sink(
    events: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key: str = "event_type",
):
    """Streaming MATERIALIZED VIEW maintenance: per-key cumulative counts
    upserted into a parquet state table via ``foreachBatch`` +
    :func:`~..operators.relational.merge_upsert`.

    Update-mode aggregation emits each key's NEW cumulative count
    whenever it changes; the batch function merges those rows into the
    state table by key (matched -> overwrite, new -> insert). Because
    the emitted value is the cumulative total (not a delta), the merge
    is IDEMPOTENT — a replayed micro-batch (foreachBatch is
    at-least-once) rewrites the same value instead of double-counting.
    State versions are written to a fresh directory and atomically
    renamed over the old one, so a concurrent reader never sees a
    half-written table.

    Returns the started StreamingQuery.
    """
    import os
    import shutil as _sh

    from ..operators.relational import merge_upsert

    counts = events.groupBy(key).count()

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = batch_df.persist()
        try:
            if delta.isEmpty():
                return
            if os.path.exists(state_dir):
                cur = spark.read.parquet(state_dir)
                merged = merge_upsert(cur, delta, key)
            else:
                merged = delta
            staging = f"{state_dir}.v{batch_id}"
            merged.write.mode("overwrite").parquet(staging)
            old = f"{state_dir}.old{batch_id}"
            if os.path.exists(state_dir):
                os.rename(state_dir, old)
            os.rename(staging, state_dir)
            _sh.rmtree(old, ignore_errors=True)
        finally:
            delta.unpersist()

    return (
        counts.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def snapshot_append_sink(
    stream_df: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    app_id: str = "stream",
):
    """EXACTLY-ONCE streaming ingestion into a
    :class:`~..sources.table.SnapshotTable`: append-mode rows land as
    atomic table commits via ``foreachBatch``, with the micro-batch id as
    the table-level transaction version.

    foreachBatch is at-least-once — after a crash, Spark replays the last
    unacknowledged batch. The table's ``txn=(app_id, batch_id)`` append
    dedupes that replay inside the COMMIT protocol itself (the txn
    high-water mark is part of the log, re-checked after every lost
    commit race), so the sink is exactly-once end-to-end without
    cumulative-value tricks: readers see each input row exactly once, and
    every commit is atomic — a concurrent reader sees batch N fully or
    not at all, never partially. This is the streaming half of the ACID
    story; the batch half (MERGE/time travel) is sources/table.py.

    Returns the started StreamingQuery. The table must already exist
    (create it with the stream's schema first).
    """
    from ..sources.table import SnapshotTable

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        t = SnapshotTable(batch_df.sparkSession, table_root)
        t.append(batch_df, txn=(app_id, int(batch_id)))

    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def windowed_bin_counts(
    events: DataFrame,
    lo: float,
    hi: float,
    n_bins: int = 10,
    window: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming half of a WINDOWED DRIFT MONITOR: per event-time window,
    per fixed-bin counts of ``value`` (equal-width bins over the
    reference range [lo, hi], out-of-range clamped to the edge bins —
    where serving drift shows up). Watermarked incremental counting; the
    tiny PSI fold over (windows x bins) rows is a batch step
    (:func:`~..ml.metrics.psi_bins` arithmetic) — the stream does the
    unbounded work, the fold is bounded."""
    if hi <= lo:
        raise ValueError(f"windowed_bin_counts: need lo < hi, got [{lo}, {hi}]")
    width = (hi - lo) / n_bins
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col("value") - F.lit(lo)) / F.lit(width)).cast("int")),
    )
    return (
        events.filter(F.col("value").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), bin_.alias("bin"))
        .agg(F.count("*").cast("long").alias("n_act"))
        .select(
            F.unix_timestamp("win.start").cast("long").alias("win_sec"),
            "bin",
            "n_act",
        )
    )


def snapshot_merge_sink(
    counts: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    app_id: str = "mv",
    update_cols=None,
):
    """EXACTLY-ONCE streaming MATERIALIZED VIEW into a SnapshotTable:
    update-mode aggregate rows MERGE into the bucketed table via
    ``foreachBatch``, with the micro-batch id as the table txn — so a
    replayed batch is skipped inside the commit protocol rather than
    re-applied. Unlike :func:`upsert_counts_sink` (idempotent only
    because its values are cumulative), the txn makes ANY merge payload
    replay-safe, and every refresh is an atomic versioned commit a
    concurrent reader can time-travel. The table must exist, bucketed
    on the aggregate key."""
    from ..sources.table import SnapshotTable

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        t = SnapshotTable(batch_df.sparkSession, table_root)
        t.merge(batch_df, update_cols=update_cols, txn=(app_id, int(batch_id)))

    return (
        counts.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
