"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the package; this module only adapts the
registry to the driver's contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from predicting_hospital_readmission_using_mimic_database_spark.registry import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query ("readmitted within 30 days") on sf0.001."""
    from predicting_hospital_readmission_using_mimic_database_spark.plans.readmission import (
        readmit_events,
    )

    return readmit_events(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in load_all().items() if qd.oracle is not None}
