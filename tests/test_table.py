"""SnapshotTable (sources/table.py): ACID commit log, time travel, bucketed
copy-on-write MERGE, data skipping, compaction, vacuum, and the optimistic
concurrency protocol."""

import os
import threading

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
    ConcurrentWriteError,
    SnapshotTable,
    VacuumedVersionError,
)

SCHEMA = "k bigint, v double, tag string"


def _rows(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.lit(tag).alias("tag"),
    )


@pytest.fixture
def troot(tmp_path):
    return str(tmp_path / "tbl")


def test_create_append_read(spark, troot):
    t = SnapshotTable.create(spark, troot, SCHEMA)
    assert t.version == 0
    assert t.read().count() == 0  # empty snapshot has the declared schema
    assert t.read().schema == t.schema
    t.append(_rows(spark, 0, 100))
    t.append(_rows(spark, 100, 150, tag="b"))
    assert t.version == 2
    df = t.read()
    assert df.count() == 150
    assert df.schema == t.schema
    assert df.filter("tag = 'b'").count() == 50


def test_time_travel_and_history(spark, troot):
    t = SnapshotTable.create(spark, troot, SCHEMA)
    t.append(_rows(spark, 0, 10))
    t.append(_rows(spark, 10, 30))
    t.overwrite(_rows(spark, 0, 5))
    assert [t.read(version=v).count() for v in (0, 1, 2, 3)] == [0, 10, 30, 5]
    hist = t.history()
    assert [h["op"] for h in hist] == ["create", "append", "append", "overwrite"]
    assert hist[3]["n_removed"] > 0
    # a reopened handle sees the same state (pure log replay)
    t2 = SnapshotTable(spark, troot)
    assert t2.version == 3 and t2.read().count() == 5


def test_schema_enforcement(spark, troot):
    t = SnapshotTable.create(spark, troot, SCHEMA)
    bad = spark.range(3).select(F.col("id").alias("k"))  # missing v, tag
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(bad)
    extra = _rows(spark, 0, 3).withColumn("zzz", F.lit(1))
    with pytest.raises(ValueError, match="unexpected"):
        t.append(extra)


def test_bucketed_merge_rewrites_only_touched_buckets(spark, troot):
    t = SnapshotTable.create(
        spark, troot, SCHEMA, bucket_key=["k"], num_buckets=8
    )
    t.append(_rows(spark, 0, 1000))
    files_before = {a.path: a for a in t.files()}
    buckets_before = {a.bucket for a in files_before.values()}
    assert buckets_before == set(range(8))
    # delta: update 3 keys, insert 2 new ones
    upd = spark.createDataFrame(
        [Row(k=1, v=-1.0, tag="upd"), Row(k=2, v=-2.0, tag="upd"),
         Row(k=500, v=-500.0, tag="upd"), Row(k=5000, v=1.0, tag="new"),
         Row(k=5001, v=2.0, tag="new")],
        schema=SCHEMA,
    )
    touched = {
        r["b"]
        for r in upd.select(
            F.pmod(F.xxhash64("k"), F.lit(8)).cast("int").alias("b")
        ).distinct().collect()
    }
    t.merge(upd)
    files_after = {a.path: a for a in t.files()}
    survivors = set(files_before) & set(files_after)
    # every untouched bucket's files survived the merge untouched
    untouched = {p for p, a in files_before.items() if a.bucket not in touched}
    assert untouched <= survivors
    # and no file of a touched bucket survived
    assert all(files_after[p].bucket not in touched for p in survivors)
    df = t.read()
    assert df.count() == 1002
    got = {r["k"]: (r["v"], r["tag"]) for r in df.filter("tag = 'upd' OR tag = 'new'").collect()}
    assert got == {1: (-1.0, "upd"), 2: (-2.0, "upd"), 500: (-500.0, "upd"),
                   5000: (1.0, "new"), 5001: (2.0, "new")}


def test_merge_update_cols_subset(spark, troot):
    t = SnapshotTable.create(spark, troot, SCHEMA, bucket_key=["k"], num_buckets=4)
    t.append(_rows(spark, 0, 10, tag="keep"))
    upd = spark.createDataFrame([Row(k=3, v=99.0, tag="IGNORED")], schema=SCHEMA)
    t.merge(upd, update_cols=["v"])
    row = t.read().filter("k = 3").collect()[0]
    assert row["v"] == 99.0 and row["tag"] == "keep"


def test_unbucketed_merge_requires_key(spark, troot):
    t = SnapshotTable.create(spark, troot, SCHEMA)
    t.append(_rows(spark, 0, 10))
    upd = spark.createDataFrame([Row(k=1, v=5.0, tag="u")], schema=SCHEMA)
    with pytest.raises(ValueError, match="explicit key"):
        t.merge(upd)
    t.merge(upd, key=["k"])
    assert t.read().filter("k = 1").collect()[0]["v"] == 5.0


def test_delete_with_pruning(spark, troot):
    t = SnapshotTable.create(spark, troot, SCHEMA, stats_cols=["k"])
    for lo in range(0, 100, 20):  # 5 disjoint-range commits
        t.append(_rows(spark, lo, lo + 20).coalesce(1))
    before = {a.path for a in t.files()}
    t.delete(F.col("k") >= 90, prune=[("k", 90, None)])
    after = {a.path for a in t.files()}
    # only files that can contain k>=90 were rewritten
    rewritten_src = before - after
    assert all(
        a.stats["k"][1] >= 90
        for a in SnapshotTable(spark, troot).files(version=5)
        if a.path in rewritten_src
    )
    assert t.read().count() == 90
    assert t.read().agg(F.max("k")).collect()[0][0] == 89


def test_data_skipping_read(spark, troot):
    t = SnapshotTable.create(spark, troot, SCHEMA, stats_cols=["k"])
    for lo in range(0, 100, 20):
        t.append(_rows(spark, lo, lo + 20).coalesce(1))
    live = t.files()
    pruned = t._prune_files({a.path: a for a in live}, [("k", 45, 55)])
    assert 0 < len(pruned) < len(live)  # skipped most files
    df = t.read(prune=[("k", 45, 55)])
    assert df.count() == 11
    assert df.agg(F.min("k"), F.max("k")).collect()[0] == Row(**{"min(k)": 45, "max(k)": 55})


def test_compact_and_vacuum(spark, troot):
    t = SnapshotTable.create(spark, troot, SCHEMA)
    for lo in range(0, 40, 10):
        t.append(_rows(spark, lo, lo + 10))
    n_files = len(t.files())
    assert n_files >= 4
    t.compact()
    assert len(t.files()) < n_files
    assert t.read().count() == 40  # row set unchanged
    v_compact = t.version
    assert t.vacuum(retain_versions=1) == 0  # young files: grace window protects in-flight writers
    deleted = t.vacuum(retain_versions=1, min_age_seconds=0)
    assert deleted > 0
    assert t.read().count() == 40  # current snapshot intact
    with pytest.raises(VacuumedVersionError):
        t.read(version=1).count()
    # history survives vacuum
    assert len(t.history()) == v_compact + 1


def test_checkpoint_replay(spark, troot):
    t = SnapshotTable.create(
        spark, troot, SCHEMA, checkpoint_interval=3
    )
    for lo in range(0, 70, 10):
        t.append(_rows(spark, lo, lo + 10).coalesce(1))
    assert os.path.exists(os.path.join(troot, "_log", "_last_checkpoint"))
    t2 = SnapshotTable(spark, troot)
    assert t2.version == 7
    assert t2.read().count() == 70
    # time travel across the checkpoint boundary still exact
    assert t2.read(version=2).count() == 20


def test_concurrent_appends_both_land(spark, troot):
    t1 = SnapshotTable.create(spark, troot, SCHEMA)
    t2 = SnapshotTable(spark, troot)
    # stage both, then race the commits: the loser must rebase, not fail
    errs = []

    def go(t, lo):
        try:
            t.append(_rows(spark, lo, lo + 50).coalesce(1))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th1 = threading.Thread(target=go, args=(t1, 0))
    th2 = threading.Thread(target=go, args=(t2, 1000))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert errs == []
    t3 = SnapshotTable(spark, troot)
    assert t3.version == 2
    assert t3.read().count() == 100


def test_concurrent_remove_conflict_raises(spark, troot):
    t1 = SnapshotTable.create(spark, troot, SCHEMA, bucket_key=["k"], num_buckets=2)
    t1.append(_rows(spark, 0, 100))
    t2 = SnapshotTable(spark, troot)
    upd = spark.createDataFrame([Row(k=1, v=0.0, tag="u")], schema=SCHEMA)
    # t2 merges first; t1's staged merge then sees a taken version AND a
    # removed read-set -> must raise, not silently clobber
    t2.merge(upd)
    with pytest.raises(ConcurrentWriteError):
        # stage against stale state by skipping refresh: simulate the race
        # window between stage and commit
        from predicting_hospital_readmission_using_mimic_database_spark.operators.relational import merge_upsert
        old_files = list(t1._live)
        base = t1._read_files(old_files)
        merged = merge_upsert(base, upd, key=["k"])
        t1._commit("merge", t1._stage(t1._check_schema(merged)), old_files)


def test_merge_casts_bucket_key_dtype(spark, troot):
    """ADVICE r6: an updates frame whose bucket-key dtype differs from the
    declared schema (int vs bigint) must hash to the SAME touched-bucket
    set as the stored files — otherwise matching base rows are never
    removed and the table ends up with duplicate keys."""
    t = SnapshotTable.create(spark, troot, SCHEMA, bucket_key=["k"], num_buckets=8)
    t.append(_rows(spark, 0, 200))
    # int32 key column: xxhash64(int) != xxhash64(bigint) for the same value
    upd = spark.createDataFrame(
        [(7, -7.0, "upd"), (10_000, 1.0, "new")], "k int, v double, tag string"
    )
    t.merge(upd)
    df = t.read()
    assert df.count() == 201  # 200 base + 1 insert, update replaced in place
    assert df.filter("k = 7").count() == 1  # NOT duplicated
    row = df.filter("k = 7").collect()[0]
    assert row["v"] == -7.0 and row["tag"] == "upd"
    assert df.filter("k = 10000").collect()[0]["tag"] == "new"


def test_empty_remove_set_ops_still_conflict(spark, troot):
    """ADVICE r6: overwrite/merge losing a commit race must raise EVEN
    WHEN their remove list is empty (overwrite of an empty table, merge
    whose touched buckets hold no files) — op intent, not remove-set
    size, decides WriteSerializable conflicts."""
    t1 = SnapshotTable.create(spark, troot, SCHEMA)
    t2 = SnapshotTable(spark, troot)
    # t1 stages an overwrite of the EMPTY table (removes == []); t2's
    # append lands first; t1's commit must not silently degrade to append
    staged = t1._stage(t1._check_schema(_rows(spark, 0, 5)))
    t2.append(_rows(spark, 1000, 1010).coalesce(1))
    with pytest.raises(ConcurrentWriteError):
        t1._commit("overwrite", staged, [])
    # the table still holds exactly t2's rows — nothing was clobbered
    assert SnapshotTable(spark, troot).read().count() == 10


def test_vacuum_table_rooted_under_log_like_path(spark, tmp_path):
    """ADVICE r6: a table whose ROOT path contains '_log/' as a component
    must still vacuum its dead data files — the log-subtree skip is
    relative to the table root, not a substring of the absolute path."""
    root = str(tmp_path / "_log" / "tbl")
    t = SnapshotTable.create(spark, root, SCHEMA)
    t.append(_rows(spark, 0, 10).coalesce(1))
    t.overwrite(_rows(spark, 0, 5).coalesce(1))
    deleted = t.vacuum(retain_versions=1, min_age_seconds=0)
    assert deleted > 0  # the overwritten files are physically gone
    assert t.read().count() == 5
    assert t.version == 2  # commit log untouched


def test_concurrent_mixed_ops_serializable(spark, troot):
    """Stress the optimistic protocol with racing appends and merges
    (retry-on-conflict): every worker's ops eventually land, appends
    rebase, merges serialize, and the final state satisfies the
    serializable invariants — unique keys, exact row accounting, and a
    contiguous commit history."""
    import random

    t0 = SnapshotTable.create(
        spark, troot, SCHEMA, bucket_key=["k"], num_buckets=4
    )
    t0.append(_rows(spark, 0, 100))
    errs, done = [], []
    lock = threading.Lock()

    def worker(wid):
        t = SnapshotTable(spark, troot)
        rng = random.Random(wid)
        for i in range(2):
            lo = 1000 * (wid + 1) + i * 10
            is_append = rng.random() < 0.5
            for _attempt in range(20):
                try:
                    if is_append:
                        t.append(_rows(spark, lo, lo + 5).coalesce(1))
                    else:
                        t.merge(
                            spark.createDataFrame(
                                [Row(k=wid * 2, v=-float(wid), tag=f"w{wid}.{i}")],
                                schema=SCHEMA,
                            )
                        )
                    with lock:
                        done.append((wid, i, "append" if is_append else "merge", lo))
                    break
                except ConcurrentWriteError:
                    continue
            else:
                errs.append((wid, i))

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []
    assert len(done) == 6
    t = SnapshotTable(spark, troot)
    df = t.read().cache()
    # unique keys survive every interleaving (the bucketed upsert invariant)
    assert df.count() == df.select("k").distinct().count()
    # exact row accounting: base 100 + 5 per append (merges upsert existing)
    n_appends = sum(1 for d in done if d[2] == "append")
    assert df.count() == 100 + 5 * n_appends
    for _wid, _i, op, lo in done:
        if op == "append":
            assert df.filter(f"k >= {lo} AND k < {lo + 5}").count() == 5
    # each worker's LAST merge won its key (per-key last-writer-wins)
    for wid in range(3):
        merges = [d for d in done if d[2] == "merge" and d[0] == wid]
        if merges:
            last_tag = f"w{wid}.{max(d[1] for d in merges)}"
            assert df.filter(f"k = {wid * 2}").collect()[0]["tag"] == last_tag
    # contiguous committed history: create + seed + one commit per op
    assert t.version == 1 + len(done)
    df.unpersist()


def test_double_create_raises(spark, troot):
    SnapshotTable.create(spark, troot, SCHEMA)
    with pytest.raises(FileExistsError):
        SnapshotTable.create(spark, troot, SCHEMA)


def test_date_stats_harvest_and_prune(spark, tmp_path):
    """Date-typed stats store as ISO strings (JSON-safe, order-preserving);
    prune ranges are passed as ISO strings. String columns must have NO
    stored stats (parquet writers may truncate string min/max)."""
    root = str(tmp_path / "dt")
    t = SnapshotTable.create(
        spark, root, "d date, s string", stats_cols=["d", "s"]
    )
    df = spark.sql(
        "SELECT date_add(DATE'2024-01-01', CAST(id AS INT)) AS d, "
        "concat('row', id) AS s FROM range(100)"
    ).repartitionByRange(4, "d")
    t.append(df)
    for a in t.files():
        assert "s" not in a.stats
        assert isinstance(a.stats["d"][0], str)
    pruned = t.pruned_paths([("d", "2024-02-01", "2024-02-10")])
    assert 0 < len(pruned) < len(t.files())
    got = t.read(prune=[("d", "2024-02-01", "2024-02-10")])
    assert got.count() == 10


def test_zorder_multi_dim_skipping(spark, tmp_path):
    """After OPTIMIZE ZORDER BY (a, b), file-level stats must be selective
    on BOTH dimensions — the property a linear sort only gives its leading
    column — and the row set must be unchanged."""
    root = str(tmp_path / "z")
    t = SnapshotTable.create(
        spark, root, "a bigint, b bigint, v double", stats_cols=["a", "b"]
    )
    # 64x64 grid: every (a, b) combination — worst case for 1-d layouts
    grid = spark.sql(
        "SELECT CAST(id % 64 AS BIGINT) AS a, CAST(id DIV 64 AS BIGINT) AS b, "
        "CAST(id AS DOUBLE) AS v FROM range(4096)"
    )
    t.append(grid.repartition(8))  # layout uncorrelated with (a, b)
    n_live = len(t.files())
    # before zorder: random layout -> narrow range on either dim skips nothing
    assert len(t.pruned_paths([("a", 10, 13)])) == n_live
    t.optimize_zorder(["a", "b"], n_files=16)
    n_after = len(t.files())
    assert t.read().count() == 4096
    assert t.read().agg(F.sum("v")).collect()[0][0] == sum(range(4096))
    # after: a narrow slice in EITHER dimension skips most files
    pa = t.pruned_paths([("a", 10, 13)])
    pb = t.pruned_paths([("b", 50, 53)])
    assert len(pa) < n_after / 2, (len(pa), n_after)
    assert len(pb) < n_after / 2, (len(pb), n_after)
    # and the combined 2-d box prunes harder than either alone
    pab = t.pruned_paths([("a", 10, 13), ("b", 50, 53)])
    assert len(pab) <= min(len(pa), len(pb))
    got = t.read(prune=[("a", 10, 13), ("b", 50, 53)])
    assert got.count() == 16  # 4 x 4 box


def test_zorder_guards(spark, tmp_path):
    root = str(tmp_path / "zg")
    t = SnapshotTable.create(spark, root, "a bigint, v double")
    with pytest.raises(ValueError, match="unknown column"):
        t.optimize_zorder(["nope"])
    with pytest.raises(ValueError, match="bits"):
        t.optimize_zorder(["a"], bits=0)


def test_txn_append_idempotent(spark, troot):
    t = SnapshotTable.create(spark, troot, SCHEMA)
    v1 = t.append(_rows(spark, 0, 10), txn=("app", 0))
    v2 = t.append(_rows(spark, 10, 20), txn=("app", 1))
    assert (v1, v2) == (1, 2)
    # replay of batch 1: skipped entirely, no rows added, version unchanged
    v3 = t.append(_rows(spark, 10, 20), txn=("app", 1))
    assert v3 == 2
    assert t.read().count() == 20
    # a replay seen only through a FRESH handle (post-restart) also skips
    t2 = SnapshotTable(spark, troot)
    assert t2.last_txn_version("app") == 1
    t2.append(_rows(spark, 0, 10), txn=("app", 0))
    assert t2.read().count() == 20
    # a different app's txn 1 is independent
    t2.append(_rows(spark, 100, 105), txn=("other", 1))
    assert t2.read().count() == 25


def test_txn_survives_checkpoint(spark, troot):
    t = SnapshotTable.create(spark, troot, SCHEMA, checkpoint_interval=2)
    for i in range(5):
        t.append(_rows(spark, i * 10, i * 10 + 10), txn=("app", i))
    t2 = SnapshotTable(spark, troot)  # replays from the checkpoint
    assert t2.last_txn_version("app") == 4
    t2.append(_rows(spark, 0, 10), txn=("app", 3))  # stale replay
    assert t2.read().count() == 50


def test_read_changes_feed(spark, troot):
    """CDC between versions: appends emit inserts; a bucketed merge emits
    only true row changes (delete pre-image + insert post-image; rewritten
    unchanged rows cancel); compact emits nothing."""
    t = SnapshotTable.create(spark, troot, SCHEMA, bucket_key=["k"], num_buckets=4)
    t.append(_rows(spark, 0, 100))                       # v1
    upd = spark.createDataFrame(
        [Row(k=5, v=-5.0, tag="upd"), Row(k=999, v=1.0, tag="new")], schema=SCHEMA
    )
    t.merge(upd)                                         # v2
    t.compact()                                          # v3
    t.append(_rows(spark, 200, 210, tag="late"))         # v4

    ch = t.read_changes(0).collect()
    by = {}
    for r in ch:
        by.setdefault((r["_commit_version"], r["_change_type"]), []).append(r)
    assert len(by[(1, "insert")]) == 100
    # merge: exactly one delete (pre-image of k=5) and two inserts
    assert [(r["k"], r["v"]) for r in by[(2, "delete")]] == [(5, 5.0)]
    assert sorted((r["k"], r["v"], r["tag"]) for r in by[(2, "insert")]) == [
        (5, -5.0, "upd"), (999, 1.0, "new")
    ]
    assert (3, "insert") not in by and (3, "delete") not in by  # compact: silent
    assert len(by[(4, "insert")]) == 10
    # incremental consumer: changes since the merge = only v4's rows
    since = t.read_changes(3)
    assert since.count() == 10
    assert since.agg(F.min("_commit_version")).collect()[0][0] == 4
    with pytest.raises(ValueError, match="read_changes"):
        t.read_changes(99)


def test_apply_agg_changes_incremental_equals_recompute(spark, troot):
    from predicting_hospital_readmission_using_mimic_database_spark.operators.relational import apply_agg_changes

    t = SnapshotTable.create(spark, troot, SCHEMA, bucket_key=["k"], num_buckets=4)
    t.append(_rows(spark, 0, 50, tag="a"))
    t.append(_rows(spark, 50, 60, tag="b"))              # v2
    view = (
        t.read(version=2).groupBy("tag")
        .agg(F.count("*").cast("long").alias("n"), F.sum("k").alias("total"))
    )
    # v3: merge updates one 'a' row to tag 'b' and inserts a new 'c' row
    upd = spark.createDataFrame(
        [Row(k=3, v=3.0, tag="b"), Row(k=900, v=0.0, tag="c")], schema=SCHEMA
    )
    t.merge(upd)
    maintained = apply_agg_changes(
        view, t.read_changes(2, 3), keys=["tag"], value_col="k"
    )
    recomputed = (
        t.read().groupBy("tag")
        .agg(F.count("*").cast("long").alias("n"), F.sum("k").alias("total"))
    )
    assert sorted(maintained.collect()) == sorted(recomputed.collect())
    # a group whose count reaches zero disappears
    t.delete(F.col("tag") == "c")
    m2 = apply_agg_changes(
        maintained, t.read_changes(3, 4), keys=["tag"], value_col="k"
    )
    assert sorted(r["tag"] for r in m2.collect()) == ["a", "b"]


def test_apply_agg_changes_rejects_bad_change_type(spark):
    from predicting_hospital_readmission_using_mimic_database_spark.operators.relational import apply_agg_changes

    view = spark.createDataFrame([("a", 1, 10)], "g string, n long, total long")
    ch = spark.createDataFrame(
        [("a", 5, "update_preimage")], "g string, x long, _change_type string"
    )
    with pytest.raises(Exception, match="bad _change_type"):
        apply_agg_changes(view, ch, keys=["g"], value_col="x").collect()


def test_schema_evolution_append(spark, troot):
    t = SnapshotTable.create(spark, troot, SCHEMA)
    t.append(_rows(spark, 0, 10))
    # extra column without the flag: still a hard error (typo guard)
    widened = _rows(spark, 10, 20).withColumn("score", F.col("k") * 2.0)
    with pytest.raises(ValueError, match="merge_schema"):
        t.append(widened)
    t.append(widened, merge_schema=True)
    assert [f.name for f in t.schema.fields] == ["k", "v", "tag", "score"]
    df = t.read()
    assert df.count() == 20
    # pre-evolution files project the new column as NULL
    assert df.filter("k < 10 AND score IS NULL").count() == 10
    assert df.filter("k >= 10").agg(F.sum("score")).collect()[0][0] == sum(
        i * 2.0 for i in range(10, 20)
    )
    # a reopened handle sees the evolved schema (meta rides the log)
    t2 = SnapshotTable(spark, troot)
    assert "score" in [f.name for f in t2.schema.fields]
    # strict appends now require the full evolved column set
    with pytest.raises(ValueError, match="missing"):
        t2.append(_rows(spark, 30, 40))


def test_txn_merge_idempotent(spark, troot):
    t = SnapshotTable.create(spark, troot, SCHEMA, bucket_key=["k"], num_buckets=4)
    t.append(_rows(spark, 0, 10))
    upd = spark.createDataFrame([Row(k=1, v=100.0, tag="u")], schema=SCHEMA)
    v = t.merge(upd, txn=("mv", 0))
    assert t.read().filter("k = 1").collect()[0]["v"] == 100.0
    # replayed merge batch: version unchanged, no double-apply
    assert t.merge(upd, txn=("mv", 0)) == v
    assert t.version == v
    assert t.read().count() == 10


def test_restore_rolls_back_as_new_commit(spark, troot):
    t = SnapshotTable.create(spark, troot, SCHEMA)
    t.append(_rows(spark, 0, 10))          # v1
    t.overwrite(_rows(spark, 100, 103))    # v2
    t.append(_rows(spark, 200, 205))       # v3
    v = t.restore(1)
    assert v == 4
    assert {r["k"] for r in t.read().collect()} == set(range(10))
    # both timelines remain addressable
    assert t.read(version=3).count() == 8
    assert [h["op"] for h in t.history()][-1] == "restore"
    # restoring v0 (empty) empties the table
    t.restore(0)
    assert t.read().count() == 0
