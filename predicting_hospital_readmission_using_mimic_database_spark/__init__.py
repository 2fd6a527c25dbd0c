"""PySpark-native analytics engine with the query & data-processing
capabilities of akhilanto/Predicting-Hospital-Readmission-Using-Mimic-Database.

The reference (/root/reference/Hap880_Final_Project.py) is a single-machine
pandas + sqlite3 + scikit-learn pipeline; this package re-expresses every
capability as composable, lazy, distributed Spark operators:

- ``sources``    — parquet/CSV/JDBC readers with fixed schemas (SURVEY §2.1)
- ``functions``  — scalar/date/text expression builders (SURVEY §2.6-2.7)
- ``operators``  — relational ops, sampling/rebalancing, dedup, similarity,
                   text-stats, multimodal plumbing (SURVEY §2.2-2.5, §2.8)
- ``ml``         — MLlib feature/model/metric surface (SURVEY §2.9-2.10)
- ``plans``      — full pipeline compositions (the readmission flagship)
- ``streaming``  — Structured Streaming ingest + windowed aggregation

Everything is DataFrame-first: operators take and return DataFrames so
Catalyst sees one logical plan end-to-end (predicate pushdown, column
pruning, broadcast joins, AQE all apply).
"""

from .session import get_spark, tune_session

__version__ = "0.1.0"

__all__ = ["get_spark", "tune_session", "__version__"]
