"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark AND its ``oracle_sql()``
on DuckDB, then compares row count, column names, and an order-insensitive
value multiset (columns sorted by name, values normalized to strings).

Usage:  python tools/verify_oracle.py [name_substring ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def _multiset(rows, cols_sorted, colidx) -> dict:
    out: dict[tuple, int] = {}
    for r in rows:
        key = tuple(_norm_cell(r[colidx[c]]) for c in cols_sorted)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify-oracle")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from predicting_hospital_readmission_using_mimic_database_spark.sources.io import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_pass = n_fail = n_rowsonly = 0
    failures: list[str] = []
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            # rows-only entries carry their invariants as boolean columns —
            # a False is a real failure, not a pass-by-default
            bad = [
                (c, r[i])
                for i, c in enumerate(scols)
                if isinstance(sdf.schema[c].dataType.simpleString(), str)
                and sdf.schema[c].dataType.simpleString() == "boolean"
                for r in srows
                if r[i] is not True
            ]
            if bad:
                print(f"FAIL  {name}: invariant columns not all True: {bad[:3]}")
                n_fail += 1
                failures.append(name)
            else:
                print(f"rows  {name}: {len(srows)} rows (rows-only, {time.time()-t0:.1f}s)")
                n_rowsonly += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        dcols = list(ddf.columns)
        ok = True
        msgs = []
        if len(srows) != len(ddf):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duck={len(ddf)}")
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if ok:
            cols_sorted = sorted(scols)
            sidx = {c: scols.index(c) for c in cols_sorted}
            sms = _multiset(srows, cols_sorted, sidx)
            drecs = ddf.to_records(index=False)
            didx = {c: dcols.index(c) for c in cols_sorted}
            # pandas NaT/NaN -> None-ish normalization
            import pandas as pd

            def dcell(rec, c):
                v = rec[didx[c]]
                if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                    return None
                if hasattr(v, "item") and not isinstance(v, (str, bytes)):
                    try:
                        v = v.item()
                    except Exception:
                        pass
                if isinstance(v, pd.Timestamp):
                    v = v.to_pydatetime()
                return v

            dms: dict[tuple, int] = {}
            for rec in drecs:
                key = tuple(_norm_cell(dcell(rec, c)) for c in cols_sorted)
                dms[key] = dms.get(key, 0) + 1
            if sms != dms:
                ok = False
                only_s = [k for k in sms if sms[k] != dms.get(k, 0)][:3]
                only_d = [k for k in dms if dms[k] != sms.get(k, 0)][:3]
                msgs.append(f"values differ; spark-side e.g. {only_s} duck-side e.g. {only_d}")
        if ok:
            print(f"PASS  {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {'; '.join(msgs)}")
            n_fail += 1
            failures.append(name)

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if failures:
        print("failed:", " ".join(failures))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
