"""Publish a :class:`~.table.SnapshotTable` as a real COPY_ON_WRITE
Apache Hudi table — the EXPORT direction of the Hudi interop,
completing the read/export/stream matrix next to ``export_delta_log``
and ``export_iceberg``.

Unlike those two, a Hudi publish can never be zero-copy: the format
requires the five ``_hoodie_*`` meta columns INSIDE every data file
and ``{fileId}_{writeToken}_{instant}.parquet`` file names, so each
export REWRITES the changed buckets' rows (one write per touched file
group — the same unit a real COW writer rewrites). Layout written:

* one FILE GROUP per table bucket (``b0000`` …). Non-partitioned by
  default (partition path ``""``, files at the table root);
  ``partition_by=`` publishes a HIVE-STYLE partitioned layout instead
  (``col=value/`` dirs, multi-column nested), with the partition path
  in every row's ``_hoodie_partition_path`` and the partition columns
  kept INSIDE the data files (Hudi readers resolve values from the
  files, not the dir names) — a bucket's file group then exists once
  per partition it has rows in (same fileId across partitions, the
  layout real partitioned Hudi tables have). ``read_hudi(
  partitions=["col=value"])`` prunes the export at the listing level;
* per-row ``_hoodie_commit_time`` preserved across rewrites: a row
  byte-identical to the previous export keeps its original instant, a
  changed/new row is stamped with the new one — exactly what a real
  COW upsert produces, so ``read_hudi_incremental`` /
  ``hudi_stream`` emit true net changes, never a full-table re-stamp
  (the carry-forward join reads ONLY each touched group's previous
  base file, so incremental cost scales with the touched buckets'
  rows, never the table);
* untouched buckets keep their existing base files (incremental
  queries prune them at the file-group level);
* a ``.hoodie/{instant}.commit`` completed-instant marker with
  write-stats JSON, ``hoodie.properties`` with the record-key fields,
  and superseded slices left in place (time travel reads them).

The record key is the table's ``bucket_key`` (colon-joined) — Hudi
has no keyless tables, so an unbucketed SnapshotTable refuses with
guidance. Export state (last published table version) lives in
``.hoodie/.export-state.json``, a writer-private dotfile every reader
ignores.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import functions as F

from .hudi import HOODIE_DIR

__all__ = ["export_hudi"]

_STATE_FILE = ".export-state.json"


def _instant(version: int) -> str:
    return f"{version:014d}"


def export_hudi(
    table, dest: str, partition_by: list[str] | None = None
) -> str:
    """Export ``table``'s current snapshot to ``dest`` as a COW Hudi
    table (see module docstring). Incremental: buckets unchanged since
    the last export are not rewritten; a no-change export is a no-op.
    ``partition_by`` publishes hive-style ``col=value`` partition dirs
    (must name schema columns with no NULL values — Hudi partition
    paths are strings, not a NULL encoding — and must match the
    table's previous exports). Returns the commit instant of the
    published (or already-current) state."""
    if not table.bucket_key:
        raise ValueError(
            "export_hudi needs a bucketed SnapshotTable: the bucket key "
            "becomes the Hudi record key (Hudi has no keyless tables) "
            "and the bucket is the rewrite unit"
        )
    schema_names = [f.name for f in table.schema.fields]
    partition_by = list(partition_by or [])
    unknown = [c for c in partition_by if c not in schema_names]
    if unknown:
        raise ValueError(
            f"partition_by names unknown columns {unknown} "
            f"(schema: {schema_names})"
        )
    spark = table.spark
    table._refresh()
    version = table.version
    inst = _instant(version)
    hdir = os.path.join(dest, HOODIE_DIR)
    state_path = os.path.join(hdir, _STATE_FILE)
    prev_version = None
    if os.path.exists(state_path):
        with open(state_path) as f:
            st = json.load(f)
        prev_version = int(st["table_version"])
        prev_parts = st.get("partition_by", [])
        if prev_parts != partition_by:
            raise ValueError(
                f"export_hudi: this table was published with "
                f"partition_by={prev_parts}; re-exporting with "
                f"{partition_by} would mix layouts in one table"
            )
        if prev_version == version:
            return _instant(prev_version)  # nothing new to publish
    os.makedirs(hdir, exist_ok=True)
    props = os.path.join(hdir, "hoodie.properties")
    if not os.path.exists(props):
        with open(props, "w") as f:
            f.write(
                f"hoodie.table.name={os.path.basename(dest.rstrip(os.sep))}\n"
                "hoodie.table.type=COPY_ON_WRITE\n"
                "hoodie.table.recordkey.fields="
                + ",".join(table.bucket_key) + "\n"
            )
            if partition_by:
                f.write(
                    "hoodie.table.partition.fields="
                    + ",".join(partition_by) + "\n"
                )

    # buckets to rewrite: all on first export, else the buckets of
    # files the table added or removed since the published version
    if prev_version is None:
        touched = set(range(table.num_buckets))
    else:
        old_live = table._state_at(prev_version)
        new_live = table._live
        touched = {
            a.bucket
            for p in set(old_live) ^ set(new_live)
            for a in (old_live.get(p) or new_live.get(p),)
            if a is not None and a.bucket is not None
        }
        if not touched:
            # version moved without row changes (compact/zorder):
            # publish nothing new, just advance the marker
            with open(state_path, "w") as f:
                json.dump(
                    {"table_version": version, "instant": inst,
                     "partition_by": partition_by}, f,
                )
            return inst

    data_cols = [f.name for f in table.schema.fields]
    key_expr = F.concat_ws(
        ":", *[F.col(c).cast("string") for c in table.bucket_key]
    )
    if partition_by:
        # hive-style partition path; NULL partition values have no
        # string path and refuse (same posture as real Hudi's
        # hive-style keygen without a null fallback configured)
        pp_expr = F.concat_ws(
            "/",
            *[
                F.concat(F.lit(f"{c}="), F.col(c).cast("string"))
                for c in partition_by
            ],
        )
    else:
        pp_expr = F.lit("")

    def _row_hash(df):
        # null-fill columns the frame lacks (a merge_schema append adds
        # columns; older export slices don't carry them — to_json omits
        # null fields, so a null-filled old row hashes equal to a new
        # row whose added column is null, and restamps otherwise)
        have = set(df.columns)
        parts = [
            (
                F.col(f.name)
                if f.name in have
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in table.schema.fields
        ]
        return F.md5(F.to_json(F.struct(*parts)))

    cur = table.read().withColumn("__b", table._bucket_expr())
    if partition_by:
        from functools import reduce
        from operator import or_

        bad = cur.filter(
            reduce(or_, [F.col(c).isNull() for c in partition_by])
        ).limit(1)
        if bad.count():
            raise ValueError(
                f"export_hudi: NULL value in partition column(s) "
                f"{partition_by}; Hudi partition paths are strings — "
                "fill or drop NULL partition values before exporting"
            )

    # previous export's file slices, for per-row commit-time
    # carry-forward: each touched group reads ONLY its own previous
    # base file — never a scan of the whole prior export (at scale the
    # incremental cost is the touched buckets' rows, not the table)
    prev_slices = None
    if prev_version is not None:
        from .hudi import _latest_slices

        prev_slices = _latest_slices(dest, None, None)

    written: dict[str, list[dict]] = {}
    for b in sorted(touched):
        fid = f"b{b:04d}"
        fname = f"{fid}_0-1-0_{inst}.parquet"
        rows = (
            cur.filter(F.col("__b") == b)
            .drop("__b")
            .withColumn("__k", key_expr)
        )
        rows = rows.withColumn("__h", _row_hash(rows))
        prev_ct = None
        if prev_slices is not None:
            paths = [
                p for (_part, g), (_i, p) in prev_slices.items() if g == fid
            ]
            if paths:
                old = spark.read.parquet(*paths)
                prev_ct = (
                    old.select(
                        F.col("_hoodie_record_key").alias("__k"),
                        F.col("_hoodie_commit_time").alias("__old_ct"),
                        _row_hash(old).alias("__h"),
                    )
                    # one entry per (key, content): exact-duplicate
                    # rows collapse, so the join can never fan out
                    .groupBy("__k", "__h")
                    .agg(F.min("__old_ct").alias("__old_ct"))
                )
        if prev_ct is not None:
            rows = rows.join(prev_ct, ["__k", "__h"], "left").withColumn(
                "__ct", F.coalesce(F.col("__old_ct"), F.lit(inst))
            )
        else:
            rows = rows.withColumn("__ct", F.lit(inst))
        out = rows.select(
            F.col("__ct").alias("_hoodie_commit_time"),
            F.concat_ws(
                "_", F.col("__ct"), F.lit(str(b)),
                F.col("__k"),
            ).alias("_hoodie_commit_seqno"),
            F.col("__k").alias("_hoodie_record_key"),
            pp_expr.alias("_hoodie_partition_path"),
            F.lit(fname).alias("_hoodie_file_name"),
            *data_cols,
        )
        stage = os.path.join(dest, f".stage-{fid}-{inst}")
        if partition_by:
            # ONE job per bucket whatever the partition count: stage
            # with partitionBy on a DUPLICATE of the partition path
            # (partitionBy strips its column; the real partition
            # columns and _hoodie_partition_path stay in the data,
            # where Hudi readers resolve them), then place each
            # partition's file under its col=value dir
            (
                out.withColumn("__pp", F.col("_hoodie_partition_path"))
                .coalesce(1)
                .write.partitionBy("__pp")
                .parquet(stage, mode="overwrite")
            )
            from urllib.parse import unquote

            placed: set[str] = set()
            for d in sorted(glob.glob(os.path.join(stage, "__pp=*"))):
                rel = unquote(os.path.basename(d)[len("__pp="):])
                part = glob.glob(os.path.join(d, "part-*.parquet"))[0]
                pdir = os.path.join(dest, rel)
                os.makedirs(pdir, exist_ok=True)
                shutil.move(part, os.path.join(pdir, fname))
                written.setdefault(rel, []).append(
                    {"fileId": fid, "path": f"{rel}/{fname}"}
                )
                placed.add(os.path.normpath(rel))
            # a partition this bucket previously had rows in but no
            # longer does must still get a NEW (empty) slice: group
            # identity is (partition, fileId), so without the rewrite
            # the stale slice would keep serving the deleted rows
            if prev_slices is not None:
                gone = sorted(
                    p
                    for (p, g) in prev_slices
                    if g == fid and p not in placed and p != "."
                )
                if gone:
                    empty = out.limit(0)
                    stage2 = os.path.join(dest, f".stage-{fid}-{inst}-empty")
                    empty.coalesce(1).write.parquet(stage2, mode="overwrite")
                    src = glob.glob(os.path.join(stage2, "part-*.parquet"))[0]
                    for rel in gone:
                        pdir = os.path.join(dest, rel)
                        os.makedirs(pdir, exist_ok=True)
                        shutil.copy(src, os.path.join(pdir, fname))
                        written.setdefault(rel, []).append(
                            {"fileId": fid, "path": f"{rel}/{fname}"}
                        )
                    shutil.rmtree(stage2)
        else:
            out.coalesce(1).write.parquet(stage, mode="overwrite")
            part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
            shutil.move(part, os.path.join(dest, fname))
            written.setdefault("", []).append({"fileId": fid, "path": fname})
        shutil.rmtree(stage)

    # completed-instant marker with write stats (readers gate on the
    # file's presence; the stats body is the writer-shaped content)
    tmp = os.path.join(hdir, f".{inst}.commit.tmp")
    with open(tmp, "w") as f:
        json.dump({"partitionToWriteStats": written}, f)
    os.replace(tmp, os.path.join(hdir, f"{inst}.commit"))
    with open(state_path, "w") as f:
        json.dump(
            {"table_version": version, "instant": inst,
             "partition_by": partition_by}, f,
        )
    return inst
