"""Sources & sinks (SURVEY.md §2.1, S1-S5).

The reference scans four SQLite tables with ``pd.read_sql("select * from T")``
(Hap880_Final_Project.py:18-19,115,183,237) — full scans, no pushdown, all
columns materialized. Here every table is a Parquet source read lazily:
Catalyst prunes columns and pushes predicates into the scan
(FileSourceScanExec ReadSchema/PushedFilters), which is the scale-out
replacement for S1-S4. S5 (``df.to_csv``, py:265) maps to the csv/parquet
sink helpers.

Scale note: readers never infer schemas from data (no extra file-listing
jobs beyond the footer read) and never collect. The one quirk handled here
is the driver's ``events.parquet`` storing TIMESTAMP(NANOS), which Spark's
parquet reader only accepts as int64 (``nanosAsLong``); we convert to a
proper TimestampType column at microsecond precision (same truncation
DuckDB applies), so downstream operators see a normal timestamp.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune_session

#: harness tables (FIXTURES.md §B) — name -> columns that must come back
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: columns stored as TIMESTAMP(NANOS) per table (read as long, converted)
_NANOS_TS_COLS = {"events": ("ts",)}


def decoded_file_path(col):
    """Spark file-path column (``input_file_name()`` /
    ``_metadata.file_path`` — a URI with %XX escapes, e.g.
    ``file:///a/b%20c.parquet``) -> the on-disk absolute path.

    ``F.url_decode`` alone uses FORM-urlencoded semantics and turns a
    literal ``+`` in a file or partition-dir name into a space, so keys
    built from it never match driver-side ``os.path`` keys; pre-escaping
    ``+`` to ``%2B`` restricts the decode to the %XX escapes Spark
    actually wrote. The local ``file:`` scheme prefix is stripped."""
    return F.regexp_replace(
        F.url_decode(F.regexp_replace(col, r"\+", "%2B")),
        r"^file:/+",
        "/",
    )


#: predicate ops understood by file-level data skipping (Delta stats
#: JSON in sources/delta.py, Hudi metadata-table column_stats in
#: sources/hudi.py — both prune through :func:`bounds_may_match`)
SKIP_OPS = ("<", "<=", "=", "==", ">=", ">")


def bounds_may_match(lo, hi, op, value) -> bool:
    """May a file whose column spans ``[lo, hi]`` contain a row
    satisfying ``col op value``? The shared file-level data-skipping
    bound test: CONSERVATIVE by construction — a missing bound (None)
    or an incomparable value type answers True (keep the file), so
    pruning only ever shrinks the candidate list, never the result."""

    def _cmp(a, b):
        try:
            if a < b:
                return -1
            if a > b:
                return 1
            return 0
        except TypeError:
            return None  # incomparable -> cannot prune

    if op in (">", ">="):
        c = None if hi is None else _cmp(hi, value)
        return not (c is not None and (c < 0 or (c == 0 and op == ">")))
    if op in ("<", "<="):
        c = None if lo is None else _cmp(lo, value)
        return not (c is not None and (c > 0 or (c == 0 and op == "<")))
    # equality: value must fall inside [lo, hi]
    c = None if lo is None else _cmp(lo, value)
    if c is not None and c > 0:
        return False
    c = None if hi is None else _cmp(hi, value)
    return not (c is not None and c < 0)


def zorder_value(df: DataFrame, cols, bits: int = 12):
    """Morton (Z-order) curve value over ``cols`` as a Spark Column —
    the shared clustering expression behind ``SnapshotTable.
    optimize_zorder`` and the Delta-log OPTIMIZE ZORDER
    (sources/delta_optimize.py).

    Each column is quantized to ``2**bits`` uniform buckets over its
    [min, max] (ONE agg job for the bounds, collected driver-side as
    2*len(cols) scalars), and the z-value interleaves the bucket bits
    as a shiftleft/or expression tree — pure JVM whole-stage-codegen
    arithmetic, no UDF, no second pass over the data. Uniform buckets
    trade skew-optimality for the fixed two-job plan; skew only
    dilutes downstream file skipping, never correctness (stats pruning
    stays conservative). NULLs land in bucket 0."""
    if not cols or not (1 <= bits <= 20):
        raise ValueError("zorder_value: need >=1 column and 1<=bits<=20")
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    nb = 1 << bits
    zparts = []
    for ci, c in enumerate(cols):
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        if mn is None or mx is None or mx <= mn:
            bucket = F.lit(0)
        else:
            # uniform bucket in [0, nb-1]; NULLs to bucket 0
            bucket = F.least(
                F.lit(nb - 1),
                F.floor(
                    (F.coalesce(F.col(c).cast("double"), F.lit(mn)) - F.lit(mn))
                    / F.lit((mx - mn) / nb)
                ).cast("long"),
            )
        # interleave: bit b of this column lands at position
        # b * n_cols + ci of the z-value
        for b in range(bits):
            zparts.append(
                F.shiftleft(
                    F.shiftright(bucket, b).bitwiseAND(F.lit(1)),
                    b * len(cols) + ci,
                )
            )
    z = zparts[0]
    for p in zparts[1:]:
        z = z.bitwiseOR(p)
    return z


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one harness table (S1-S4).

    Column pruning / predicate pushdown happen automatically once callers
    ``.select``/``.filter`` — nothing is materialized here.
    """
    tune_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for c in _NANOS_TS_COLS.get(name, ()):
        if c in df.columns and dtypes.get(c) == "bigint":
            # ns -> µs truncation matches DuckDB's TIMESTAMP_NS -> TIMESTAMP cast
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    # Parquet TIMESTAMP without tz annotation (isAdjustedToUTC=false) reads as
    # TIMESTAMP_NTZ on newer Sparks; functions like unix_micros and streaming
    # watermarks require TIMESTAMP. tune_session pins the session tz to UTC,
    # so the cast is identity on the stored microsecond value.
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def read_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view so ``spark.sql`` queries run
    against the same sources (SURVEY §3.1 Spark design)."""
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV ingest (SURVEY §1.2's schema-on-read path). Pass an explicit
    DDL ``schema`` whenever the layout is known — inference costs an extra
    full pass over the files and guesses types from a sample."""
    r = spark.read.option("header", str(header).lower())
    if schema:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC ingest (built-in columnar alternative; same pushdown/pruning
    machinery as parquet — FileSourceScanExec with PushedFilters)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None) -> None:
    """ORC sink — for downstream stacks standardized on ORC (Hive/Trino
    warehouses); parquet stays the engine default."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    predicates=None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC ingest (S1's live-DB parity path — the reference reads its
    tables with ``pd.read_sql`` over one connection, py:18-19).

    A bare ``spark.read.jdbc(url, table)`` reads THE WHOLE TABLE THROUGH
    ONE CONNECTION on one task — the single-reader trap. Always pass
    either:

    - ``partition_column`` (+ ``lower_bound``/``upper_bound``/
      ``num_partitions``): Spark issues ``num_partitions`` range-bounded
      queries in parallel, one per task — the JDBC analogue of a
      partitioned scan; or
    - ``predicates``: one arbitrary WHERE clause per partition (for
      non-numeric or skewed keys).

    ``table`` may be a subquery alias (``"(select ...) t"``) — pushdown
    for engines the Spark dialect can't push into. ``fetch_size`` tunes
    the per-roundtrip row batch (drivers default absurdly low; e.g.
    MySQL's streams row-by-row).
    """
    props = dict(properties or {})
    props.setdefault("fetchsize", str(fetch_size))
    reader = spark.read
    if predicates is not None:
        return reader.jdbc(url, table, predicates=list(predicates), properties=props)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "read_jdbc: partition_column requires lower_bound, "
                "upper_bound and num_partitions (they bound the per-task "
                "range queries; without them the read is single-task)"
            )
        return reader.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=int(num_partitions),
            properties=props,
        )
    return reader.jdbc(url, table, properties=props)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None) -> None:
    """Default engine sink: columnar, splittable, stats-bearing."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols,
    n_buckets: int = 32,
    sort_cols=None,
    path: str | None = None,
) -> None:
    """Bucketed managed-table sink: joins/aggs on ``bucket_cols`` between
    tables bucketed the same way need NO shuffle (co-located by bucket id).
    The scale-out prep step for repeatedly-joined fact tables."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """S5 parity sink (reference py:265 ``to_csv``). Distributed writers;
    use parquet for anything that will be re-read."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema=None,
    multiline: bool = False,
    corrupt_col: str | None = None,
):
    """JSON-lines source (the raw-event / API-export format every ingest
    layer meets before parquet). An explicit ``schema`` skips Spark's
    full-scan schema inference (which reads the whole dataset TWICE at
    100 TB) and is required for a stable contract.

    ``corrupt_col``: enable PERMISSIVE bad-record capture — malformed
    lines land whole in that extra string column instead of poisoning
    the job (the production alternative to FAILFAST dying on one bad
    byte in a terabyte feed). The column must be present in ``schema``.
    """
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if multiline:
        r = r.option("multiLine", "true")
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col requires an explicit schema")
        r = r.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    return r.json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (interchange with non-columnar consumers);
    distributed writers, one file per partition."""
    df.write.mode(mode).json(path)


def localize_naive_timestamps(table):
    """pyarrow Table/batch with tz-NAIVE timestamp columns -> the same
    data localized to UTC. Spark writes parquet timestamps naive
    (INT96 / UTC session); the Python Data Source serializer calls
    ``tz_convert`` on every timestamp value it ships, which RAISES on
    naive ones — so every stream/datasource ``read()`` that hands
    pyarrow values to Spark goes through this first. Nested types are
    untouched (the engine's stream tables carry top-level
    timestamps)."""
    import pyarrow as pa

    fields = []
    changed = False
    for f in table.schema:
        if pa.types.is_timestamp(f.type) and f.type.tz is None:
            fields.append(pa.field(f.name, pa.timestamp(f.type.unit, "UTC")))
            changed = True
        else:
            fields.append(f)
    if not changed:
        return table
    return table.cast(pa.schema(fields))


# ---------------------------------------------------------------------------
# broadcast sizing (optimization guide §3.1: gate broadcasts on BYTES,
# not rows — 1M rows of a wide table is a multi-GB relation)
# ---------------------------------------------------------------------------

#: parquet->JVM inflation for broadcast estimates: on-disk bytes are
#: column-encoded and compressed; the built hash relation holds decoded
#: rows plus the hash table. 4x is the conservative middle of the
#: commonly observed 2-8x range.
BROADCAST_INFLATION = 4


def schema_row_bytes(schema) -> int:
    """Static per-row width estimate for ``schema`` mirroring Spark's
    own ``DataType.defaultSize`` (what the planner uses when no stats
    exist): primitives by width, strings 20, binary 100, containers
    recursive. A floor, not a truth — long strings blow past it, which
    is why callers combine it with observed disk bytes/row."""
    from pyspark.sql import types as T

    def sz(dt) -> int:
        if isinstance(dt, (T.ByteType, T.BooleanType, T.NullType)):
            return 1
        if isinstance(dt, T.ShortType):
            return 2
        if isinstance(dt, (T.IntegerType, T.FloatType, T.DateType)):
            return 4
        if isinstance(dt, T.DecimalType):
            return 8 if dt.precision <= 18 else 16
        if isinstance(dt, T.StringType):
            return 20
        if isinstance(dt, T.BinaryType):
            return 100
        if isinstance(dt, T.ArrayType):
            return sz(dt.elementType)
        if isinstance(dt, T.MapType):
            return sz(dt.keyType) + sz(dt.valueType)
        if isinstance(dt, T.StructType):
            return sum(sz(f.dataType) for f in dt.fields)
        return 8  # long/double/timestamp/ymd-dt intervals and the rest

    return max(1, sum(sz(f.dataType) for f in schema.fields))


def est_broadcast_bytes(
    n_rows: int, schema_est: int, total_disk_bytes: int, total_rows: int
) -> int:
    """Estimated in-memory bytes of broadcasting ``n_rows`` rows of a
    table whose live files hold ``total_disk_bytes`` over
    ``total_rows`` rows (either may be 0 = unknown). Deliberately
    conservative: the observed disk width (inflated) wins over the
    schema floor, and with no row count at all the whole table's
    inflated bytes bound the estimate — OVER-estimating falls back to
    a delta-sized shuffled join (mild), UNDER-estimating is a driver/
    executor OOM."""
    if total_rows > 0:
        width = max(
            schema_est, BROADCAST_INFLATION * total_disk_bytes // total_rows
        )
        return min(n_rows, total_rows) * width
    if total_disk_bytes > 0:
        return max(
            n_rows * schema_est, BROADCAST_INFLATION * total_disk_bytes
        )
    return n_rows * schema_est
