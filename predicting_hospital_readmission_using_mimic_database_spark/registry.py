"""Query registry backing ``__spark_entry__.queries()`` / ``oracle_sql()``.

Each SURVEY.md §2 operator registers here as a named query: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
ANSI-SQL oracle DuckDB runs over the same parquet tables. Column names and
types are aligned on both sides — the driver sorts columns by name and
hash-compares values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None -> driver does the weaker rows-only check


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is the DuckDB-equivalent SQL."""

    def deco(fn):
        REGISTRY[name] = QueryDef(fn, oracle)
        return fn

    return deco


_LOADED = False


def load_all() -> dict[str, QueryDef]:
    """Import every qdefs module (side-effect: registration)."""
    global _LOADED
    if not _LOADED:
        import importlib
        import importlib.util

        from . import qdefs_core  # noqa: F401

        # Optional modules: skip only when genuinely absent. An ImportError
        # raised INSIDE an existing module propagates loudly rather than
        # silently dropping a whole query family from CORRECTNESS.
        for mod in ("qdefs_text", "qdefs_ml", "qdefs_llm", "qdefs_streaming"):
            if importlib.util.find_spec(f"{__package__}.{mod}") is not None:
                importlib.import_module(f"{__package__}.{mod}")
        _LOADED = True
    return REGISTRY
