"""The flagship plan: "readmitted within 30 days" (SURVEY.md §7 phase 0).

Reference semantics (Hap880_Final_Project.py:39-86) transposed onto the
harness ``events`` table (user_id≈SUBJECT_ID, ts≈ADMITTIME,
event_type≈ADMISSION_TYPE):

1. W6  sort within patient            — absorbed into the window spec
2. W1  next admission time            — ``lead(ts)``
3. W2  next admission type            — ``lead(event_type)``
4. W3  elective null-out              — planned next visits don't count
5. W4  backward-fill                  — gap to the next *unplanned* visit
       (``first(ignorenulls)`` over a current-row..unbounded-following frame)
6. C5  gap in fractional days
7. C1  label: gap < 30 days
8. A1/A10 prevalence per admission type

One Catalyst plan, exactly ONE shuffle (hash partition on user_id for the
window) plus the aggregation exchange — at 100 TB the window shuffle is the
only wide dependency and it partitions on the natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import days_between_frac
from ..sources.io import read_table

#: event_type treated like the reference's ELECTIVE admissions (py:48-50)
PLANNED_TYPE = "signup"
READMIT_DAYS = 30.0


def readmit_labels(
    events: DataFrame,
    planned_type: str = PLANNED_TYPE,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-event readmission label (reference py:39-86, W1-W4 + C1 + C5).

    Deterministic ordering: (ts, event_id) — the reference relies on file
    order; we pin an explicit tiebreaker (SURVEY §2.4 W5 note).

    ``keep``: extra input columns carried through the window projection so
    a downstream same-key aggregate (e.g. the per-user feature table) can
    ride the label shuffle instead of re-scanning + re-shuffling the
    input for its value stats.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    labeled = (
        events
        .withColumn("next_ts", F.lead("ts").over(w))                      # W1
        .withColumn("next_type", F.lead("event_type").over(w))            # W2
        .withColumn(                                                      # W3
            "next_ts",
            F.when(F.col("next_type") == planned_type, F.lit(None)).otherwise(F.col("next_ts")),
        )
        .withColumn(                                                      # W4
            "next_unplanned_ts", F.first("next_ts", ignorenulls=True).over(wf)
        )
        .withColumn("gap_days", days_between_frac("next_unplanned_ts", "ts"))  # C5
        .withColumn(                                                      # C1
            "readmit_30d",
            F.when(F.col("gap_days") < F.lit(READMIT_DAYS), F.lit(1)).otherwise(F.lit(0)),
        )
    )
    return labeled.select(
        "event_id", "user_id", "ts", "event_type",
        "next_unplanned_ts", "gap_days", "readmit_30d", *keep,
    )


def readmit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query: label every event, then prevalence by type (A1/A10)."""
    labeled = readmit_labels(read_table(spark, sf_dir, "events"))
    return (
        labeled.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("readmit_30d").alias("n_readmit"),
            F.round(F.avg("readmit_30d"), 4).alias("readmit_rate"),
        )
        .orderBy("event_type")
    )
