"""Property tests on the pandas<->Spark semantic edges (SURVEY.md §5.2):
C1 NULL handling, W4 frame boundaries, W5 tie-breaking, A8 pivot fill."""

import datetime as dt

import pyspark.sql.functions as F

from predicting_hospital_readmission_using_mimic_database_spark.functions import scalar as SC
from predicting_hospital_readmission_using_mimic_database_spark.operators import relational as R


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_c1_null_lt_goes_to_otherwise(spark):
    # numpy: NaN < 30 is False -> label '0'; Spark: NULL < 30 -> NULL -> otherwise
    df = spark.createDataFrame([(1, 5.0), (2, 45.0), (3, None)], "id int, gap double")
    out = {r["id"]: r["lab"] for r in df.select("id", SC.label_lt("gap", 30).alias("lab")).collect()}
    assert out == {1: "1", 2: "0", 3: "0"}


def test_w4_backfill_frame_includes_current_row(spark):
    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, "b"), (1, 3, None), (2, 1, None)],
        "g int, o int, v string",
    )
    out = R.backfill(df, "v", ["g"], ["o"], out="f")
    got = {(r["g"], r["o"]): r["f"] for r in out.collect()}
    # bfill: next non-null at-or-after each row; trailing/empty groups stay NULL
    assert got == {(1, 1): "b", (1, 2): "b", (1, 3): None, (2, 1): None}


def test_w5_last_per_group_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, _ts("2024-01-01"), 10), (1, _ts("2024-01-01"), 11), (1, _ts("2023-12-01"), 99)],
        "g int, ts timestamp, rid int",
    )
    out = R.last_per_group(df, ["g"], ["ts", "rid"]).collect()
    assert len(out) == 1 and out[0]["rid"] == 11  # same ts -> highest tiebreaker wins


def test_a8_pivot_fills_absent_combos_with_zero(spark):
    df = spark.createDataFrame([(1, "A"), (1, "A"), (2, "R")], "k int, f string")
    out = {r["k"]: (r["A"], r["N"], r["R"]) for r in R.pivot_count(df, "k", "f", ["A", "N", "R"]).collect()}
    assert out == {1: (2, 0, 0), 2: (0, 0, 1)}


def test_range_recode_boundaries(spark):
    df = spark.createDataFrame([(0,), (1,), (9,), (10,), (50,), (51,)], "v int")
    ranges = [(1, 9, "lo"), (10, 50, "hi")]
    out = [r["c"] for r in df.select(SC.range_recode("v", ranges, "other").alias("c")).orderBy("v").collect()]
    assert out == ["other", "lo", "lo", "hi", "hi", "other"]


def test_positional_join_alignment(spark):
    a = spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], "k int, v string")
    b = spark.createDataFrame([(30, "z"), (10, "x"), (20, "y")], "k2 int, w string")
    out = R.positional_join(a.select("k", "v"), b.select("k2", "w"), ["k"], ["k2"])
    got = sorted((r["v"], r["w"]) for r in out.collect())
    assert got == [("a", "x"), ("b", "y"), ("c", "z")]


def test_anti_join_complement(spark):
    full = spark.createDataFrame([(i,) for i in range(10)], "id int")
    sub = spark.createDataFrame([(2,), (5,)], "id int")
    out = sorted(r["id"] for r in R.anti_join(full, sub, "id").collect())
    assert out == [0, 1, 3, 4, 6, 7, 8, 9]


def test_icd9_ranges_first_match_wins_boundaries(spark):
    # reference py:131-145: sequential inclusive between() -> boundary values
    # map to the EARLIER chapter; 780-800 misc, 800-1000 injury, 1000-2000 misc
    cases = {
        1: "infectious", 139: "infectious", 140: "infectious",
        141: "neoplasms", 240: "neoplasms", 780: "prenatal",
        781: "misc", 800: "misc", 801: "injury", 1000: "injury",
        1001: "misc", 2000: "misc", 2001: "default", 0: "default",
    }
    df = spark.createDataFrame([(v,) for v in cases], "v int")
    out = {
        r["v"]: r["c"]
        for r in df.select("v", SC.range_recode("v", SC.ICD9_RANGES, "default").alias("c")).collect()
    }
    assert out == cases


def test_split_by_routes_null_condition_to_neg(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, 5.0), (2, 15.0), (3, None)], "id int, v double")
    pos, neg = R.split_by(df, F.col("v") >= 10)
    assert sorted(r["id"] for r in pos.collect()) == [2]
    assert sorted(r["id"] for r in neg.collect()) == [1, 3]


def test_global_index_is_dense_and_ordered(spark):
    import random

    vals = list(range(1, 201))
    random.Random(7).shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "k int").repartition(8)
    out = R.global_index(df, ["k"], out="pos").collect()
    assert sorted(r["pos"] for r in out) == list(range(1, 201))
    assert all(r["pos"] == r["k"] for r in out)  # order matches sort key


def test_positional_join_suffixes(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    b = spark.createDataFrame([(10, "p"), (20, "q")], "k int, w string")
    out = R.positional_join(a, b, ["k"], ["k"])
    assert set(out.columns) == {"k_caller", "v", "k_other", "w"}
    got = sorted((r["k_caller"], r["k_other"]) for r in out.collect())
    assert got == [(1, 10), (2, 20)]


def test_sinks_roundtrip(tmp_path, spark):
    from predicting_hospital_readmission_using_mimic_database_spark.sources.io import write_csv, write_parquet

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    pq = str(tmp_path / "pq")
    cv = str(tmp_path / "cv")
    write_parquet(df, pq)
    write_csv(df, cv)
    assert sorted(r["id"] for r in spark.read.parquet(pq).collect()) == [1, 2]
    back = spark.read.option("header", True).csv(cv)
    assert sorted(r["id"] for r in back.collect()) == ["1", "2"]


def test_orc_roundtrip_with_pushdown(tmp_path, spark):
    from predicting_hospital_readmission_using_mimic_database_spark.sources.io import read_orc, write_orc

    df = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "id int, s string")
    path = str(tmp_path / "orc")
    write_orc(df, path)
    back = read_orc(spark, path).filter(F.col("id") > 90).select("id")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(id,90)" in plan
    assert back.count() == 9


def test_read_jdbc_option_plumbing():
    """No live DB in the harness — assert the reader receives the exact
    partitioning/fetch options (the single-reader trap guards)."""
    import pytest

    from predicting_hospital_readmission_using_mimic_database_spark.sources.io import read_jdbc

    class FakeReader:
        def __init__(self, calls):
            self.calls = calls

        def jdbc(self, url, table, **kw):
            self.calls.append((url, table, kw))
            return "DF"

    class FakeSpark:
        def __init__(self):
            self.calls = []

        @property
        def read(self):
            return FakeReader(self.calls)

    fs = FakeSpark()
    read_jdbc(
        fs, "jdbc:postgresql://h/db", "events",
        partition_column="event_id", lower_bound=0, upper_bound=10_000,
        num_partitions=16, fetch_size=5000,
    )
    url, table, kw = fs.calls[0]
    assert (kw["column"], kw["lowerBound"], kw["upperBound"], kw["numPartitions"]) == (
        "event_id", 0, 10_000, 16
    )
    assert kw["properties"]["fetchsize"] == "5000"

    read_jdbc(fs, "jdbc:mysql://h/db", "t", predicates=["k < 10", "k >= 10"])
    _, _, kw2 = fs.calls[1]
    assert kw2["predicates"] == ["k < 10", "k >= 10"]

    with pytest.raises(ValueError, match="partition_column requires"):
        read_jdbc(fs, "jdbc:x://h/d", "t", partition_column="k")


def test_read_jdbc_live_derby_roundtrip(tmp_path, spark):
    """LIVE JDBC validation against the Derby engine Spark bundles for
    its metastore (embedded, in-process — no external service): write a
    table through Spark's JDBC sink, read it back through `read_jdbc`'s
    partitioned path AND its predicates path, and confirm (a) exact row
    parity and (b) the range-partitioned read really fans out into
    num_partitions tasks (the single-reader-trap guard, observed live
    rather than asserted on option plumbing)."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.io import read_jdbc

    url = f"jdbc:derby:{tmp_path}/livedb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    # Derby uppercases unquoted identifiers; uppercase names keep the
    # writer's quoted DDL and the reader's generated WHERE clauses agreeing
    src = spark.range(0, 1000).selectExpr(
        "id AS K", "CAST(id % 7 AS INT) AS GRP", "CAST(id * 1.5 AS DOUBLE) AS V"
    )
    src.write.jdbc(url, "events_live", mode="overwrite", properties=props)

    part = read_jdbc(
        spark, url, "events_live",
        partition_column="K", lower_bound=0, upper_bound=1000,
        num_partitions=4, properties=props,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 1000
    got = part.agg(
        F.sum("K").alias("sk"), F.round(F.sum("V"), 3).alias("sv")
    ).collect()[0]
    assert (got["sk"], got["sv"]) == (499500, 749250.0)

    pred = read_jdbc(
        spark, url, "events_live",
        predicates=["K < 500", "K >= 500"], properties=props,
    )
    assert pred.rdd.getNumPartitions() == 2
    assert pred.count() == 1000

    # subquery-alias pushdown form
    sub = read_jdbc(
        spark, url, "(SELECT K, GRP FROM events_live WHERE GRP = 3) t",
        properties=props,
    )
    assert sub.count() == len([i for i in range(1000) if i % 7 == 3])


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame([(1, i) for i in range(50)] + [(2, 99)], "k int, v int")
    right = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], "k int, w string")
    plain = R.join(left, right, "k").select("k", "v", "w")
    salted = R.salted_join(left, right, "k").select("k", "v", "w")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # outer semantics preserved too
    lo = R.join(left, right, "k", how="left").count()
    ls = R.salted_join(left, right, "k", how="left").count()
    assert lo == ls


def test_csv_json_ingest_roundtrip(tmp_path, spark):
    from predicting_hospital_readmission_using_mimic_database_spark.sources.io import (
        read_csv, read_json, write_csv,
    )

    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "id int, s string, v double")
    cpath, jpath = str(tmp_path / "c"), str(tmp_path / "j")
    write_csv(df, cpath)
    df.write.mode("overwrite").json(jpath)
    back_c = read_csv(spark, cpath, schema="id int, s string, v double")
    back_j = read_json(spark, jpath, schema="id int, s string, v double")
    assert sorted(map(tuple, back_c.collect())) == sorted(map(tuple, df.collect()))
    assert sorted(map(tuple, back_j.collect())) == sorted(map(tuple, df.collect()))


def test_asof_join_backward_exact_and_strict(spark):
    from datetime import datetime as DT

    from predicting_hospital_readmission_using_mimic_database_spark.operators import relational as R2

    left = spark.createDataFrame(
        [(1, 1, DT(2024, 1, 1, 10, 0)), (2, 1, DT(2024, 1, 1, 12, 0)), (3, 2, DT(2024, 1, 1, 9, 0))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, DT(2024, 1, 1, 9, 30), 10.0), (1, DT(2024, 1, 1, 12, 0), 20.0), (2, DT(2024, 1, 1, 9, 30), 30.0)],
        "k long, ts timestamp, v double",
    )
    got = {
        r["id"]: (r["ts_asof"], r["v_asof"])
        for r in R2.asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    }
    assert got[1] == (DT(2024, 1, 1, 9, 30), 10.0)
    # exact-ts right row IS visible with allow_exact=True
    assert got[2] == (DT(2024, 1, 1, 12, 0), 20.0)
    # key 2: right row is in the future -> no match
    assert got[3] == (None, None)
    strict = {
        r["id"]: r["v_asof"]
        for r in R2.asof_join(left, right, ["k"], "ts", "ts", ["v"], allow_exact=False).collect()
    }
    # strict: the 12:00 right row is hidden from the 12:00 left row
    assert strict[2] == 10.0


def test_asof_join_forward(spark):
    from datetime import datetime as DT

    from predicting_hospital_readmission_using_mimic_database_spark.operators import relational as R2

    left = spark.createDataFrame([(1, 1, DT(2024, 1, 1, 10, 0))], "id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, DT(2024, 1, 1, 9, 0), 1.0), (1, DT(2024, 1, 1, 11, 0), 2.0), (1, DT(2024, 1, 1, 12, 0), 3.0)],
        "k long, ts timestamp, v double",
    )
    row = R2.asof_join(left, right, ["k"], "ts", "ts", ["v"], direction="forward").collect()[0]
    # forward: the NEXT right row at/after left ts, i.e. 11:00 not 9:00/12:00
    assert row["v_asof"] == 2.0


def test_asof_join_plan_has_no_cartesian_or_range_join(spark):
    from predicting_hospital_readmission_using_mimic_database_spark.operators import relational as R2
    from predicting_hospital_readmission_using_mimic_database_spark.sources.io import read_table
    from pyspark.sql import functions as F

    e = read_table(spark, "/root/testdata/sf0.001", "events")
    p = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    v = e.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    plan = R2.asof_join(p, v, ["user_id"], "ts", "ts", ["value"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # the whole operator is one exchange on the key (union feeds a single window sort)
    assert plan.count("Exchange hashpartitioning") == 1


def test_sessionize_gap_semantics(spark):
    from datetime import datetime as DT

    from predicting_hospital_readmission_using_mimic_database_spark.operators import relational as R2

    df = spark.createDataFrame(
        [
            (1, DT(2024, 1, 1, 0, 0)),
            (1, DT(2024, 1, 1, 1, 0)),   # 1h gap -> same session
            (1, DT(2024, 1, 1, 9, 0)),   # 8h gap -> new session
            (2, DT(2024, 1, 2, 0, 0)),
        ],
        "user_id long, ts timestamp",
    )
    stats = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in R2.session_stats(df, "user_id", "ts", gap="6 hours").collect()
    }
    assert stats == {(1, 1): 2, (1, 2): 1, (2, 1): 1}
    # boundary: a gap of EXACTLY the threshold stays in-session (> not >=)
    df2 = spark.createDataFrame(
        [(1, DT(2024, 1, 1, 0, 0)), (1, DT(2024, 1, 1, 6, 0))], "user_id long, ts timestamp"
    )
    s2 = R2.session_stats(df2, "user_id", "ts", gap="6 hours").collect()
    assert len(s2) == 1 and s2[0]["n_events"] == 2


def test_tfidf_exact_tiny_corpus(spark):
    import math

    from predicting_hospital_readmission_using_mimic_database_spark.ml import features as FE2

    docs = spark.createDataFrame(
        [(1, ["a", "a", "b"]), (2, ["a", "c"]), (3, ["c"])],
        "doc_id long, tokens array<string>",
    )
    rows = {(r["doc_id"], r["token"]): r for r in FE2.tfidf(docs, "doc_id", "tokens").collect()}
    idf = lambda df: math.log((1 + 3) / (1 + df)) + 1.0
    assert rows[(1, "a")]["tf"] == 2 and rows[(1, "a")]["df"] == 2
    assert abs(rows[(1, "a")]["tfidf"] - 2 * idf(2)) < 1e-12
    assert abs(rows[(3, "c")]["tfidf"] - 1 * idf(2)) < 1e-12
    top1 = FE2.tfidf(docs, "doc_id", "tokens", top_n=1).collect()
    best = {r["doc_id"]: r["token"] for r in top1}
    assert best[1] == "a" and best[2] in ("a", "c") and best[3] == "c"


def test_ntile_global_matches_sql_ntile_and_handles_small_n(spark):
    from predicting_hospital_readmission_using_mimic_database_spark.operators import relational as R2

    # N=10, n=4 -> NTILE sizes 3,3,2,2 (first N%n buckets get the extra row)
    df = spark.createDataFrame([(i,) for i in range(10)], "v long")
    got = {r["v"]: r["bucket"] for r in R2.ntile_global(df, ["v"], 4).collect()}
    expect = {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 2, 6: 3, 7: 3, 8: 4, 9: 4}
    assert got == expect
    # fewer rows than buckets: one row per leading bucket, like SQL NTILE
    df2 = spark.createDataFrame([(1,), (2,)], "v long")
    got2 = {r["v"]: r["bucket"] for r in R2.ntile_global(df2, ["v"], 5).collect()}
    assert got2 == {1: 1, 2: 2}


def test_ntile_global_plan_has_no_unpartitioned_row_window(spark):
    from predicting_hospital_readmission_using_mimic_database_spark.operators import relational as R2
    from predicting_hospital_readmission_using_mimic_database_spark.sources.io import read_table

    li = read_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    plan = (
        R2.ntile_global(li, ["l_extendedprice", "l_orderkey", "l_linenumber"], 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only Exchange SinglePartition allowed is the per-partition-count
    # offsets frame (rows == #partitions); the data path must range-partition
    assert "rangepartitioning" in plan.lower()


def test_rolling_time_agg_boundary_inclusive(spark):
    from datetime import datetime as DT

    from predicting_hospital_readmission_using_mimic_database_spark.operators import relational as R2

    df = spark.createDataFrame(
        [
            (1, 1, DT(2024, 1, 1, 0, 0), 10.0),
            (2, 1, DT(2024, 1, 2, 0, 0), 20.0),   # exactly 1 day later -> includes row 1
            (3, 1, DT(2024, 1, 3, 0, 0, 0, 1), 30.0),  # 1 day + 1µs after row 2 -> row 2 falls out
        ],
        "id long, k long, ts timestamp, v double",
    )
    got = {
        r["id"]: r["roll_avg"]
        for r in R2.rolling_time_agg(df, "k", "ts", "v", window="1 day").collect()
    }
    assert got[1] == 10.0
    assert got[2] == 15.0  # (10+20)/2 — boundary ts-1d inclusive
    assert got[3] == 30.0  # row 2 is 1µs OUTSIDE the trailing window


def test_grouping_sets_rollup_levels_and_gid(spark):
    from predicting_hospital_readmission_using_mimic_database_spark.operators import relational as R2

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0)],
        "g1 string, g2 string, v double",
    )
    out = R2.grouping_sets_agg(df, ["g1", "g2"], [F.sum("v").alias("s")])
    rows = {(r["g1"], r["g2"], r["gid"]): r["s"] for r in out.collect()}
    # leaf level (gid=0), per-g1 subtotals (gid=1), grand total (gid=3)
    assert rows[("a", "x", 0)] == 1.0 and rows[("b", "x", 0)] == 4.0
    assert rows[("a", None, 1)] == 3.0 and rows[("b", None, 1)] == 4.0
    assert rows[(None, None, 3)] == 7.0
    assert len(rows) == 3 + 2 + 1


def test_grouping_sets_cube_adds_g2_marginals(spark):
    from predicting_hospital_readmission_using_mimic_database_spark.operators import relational as R2

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0)],
        "g1 string, g2 string, v double",
    )
    out = R2.grouping_sets_agg(df, ["g1", "g2"], [F.sum("v").alias("s")], kind="cube")
    rows = {(r["g1"], r["g2"], r["gid"]): r["s"] for r in out.collect()}
    # cube = rollup + per-g2 marginals (gid=2: g1 aggregated away)
    assert rows[(None, "x", 2)] == 5.0 and rows[(None, "y", 2)] == 2.0
    assert len(rows) == 6 + 2

    import pytest as _pt
    with _pt.raises(ValueError, match="rollup|cube"):
        R2.grouping_sets_agg(df, ["g1"], [F.count("*").alias("n")], kind="nope")


def test_grouping_sets_null_key_vs_subtotal_disambiguated(spark):
    from predicting_hospital_readmission_using_mimic_database_spark.operators import relational as R2

    # a REAL null group key must not be conflated with the rollup subtotal row
    df = spark.createDataFrame([(None, 1.0), (None, 2.0), ("a", 4.0)], "g string, v double")
    out = R2.grouping_sets_agg(df, ["g"], [F.sum("v").alias("s")])
    rows = {(r["g"], r["gid"]): r["s"] for r in out.collect()}
    assert rows[(None, 0)] == 3.0   # genuine null key, leaf level
    assert rows[(None, 1)] == 7.0   # grand total
    assert rows[("a", 0)] == 4.0


def test_band_join_matches_nested_loop(spark):
    """Grid-bucket band join == the naive theta-join, including values
    exactly ON the band boundary (the BETWEEN floating-point contract)."""
    import random

    rng = random.Random(7)
    vals = [round(rng.uniform(0, 10), 2) for _ in range(120)]
    a = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "a_id long, a_v double")
    b = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "b_id long, b_v double")
    got = {
        (r["a_id"], r["b_id"])
        for r in R.band_join(a, b, "a_v", "b_v", band=0.25).collect()
    }
    lo, hi = F.col("a_v") - F.lit(0.25), F.col("a_v") + F.lit(0.25)
    want = {
        (r["a_id"], r["b_id"])
        for r in a.crossJoin(b)
        .filter((F.col("b_v") >= lo) & (F.col("b_v") <= hi))
        .collect()
    }
    assert got == want and len(want) > 120  # self pairs + real matches


def test_band_join_extra_keys_and_guard(spark):
    import pytest

    a = spark.createDataFrame([(1, "g", 1.0), (2, "h", 1.0)], "a_id long, k string, a_v double")
    b = spark.createDataFrame([(3, "g", 1.2), (4, "h", 5.0)], "b_id long, k string, b_v double")
    out = R.band_join(a, b, "a_v", "b_v", band=0.5, keys=["k"]).collect()
    assert [(r["a_id"], r["b_id"]) for r in out] == [(1, 3)]  # same-key, in band
    with pytest.raises(ValueError, match="bucket_width"):
        R.band_join(a, b, "a_v", "b_v", band=1.0, bucket_width=0.5)
    with pytest.raises(ValueError, match="bucket_width"):
        R.band_join(a, b, "a_v", "b_v", band=1.0, bucket_width=0.0)
    with pytest.raises(ValueError, match="how"):
        R.band_join(a, b, "a_v", "b_v", band=0.5, how="right")


def test_band_join_zero_band_is_exact_equality(spark):
    """band=0 with the default bucket_width must behave as BETWEEN with a
    zero-width band (exact equality), not return an empty frame (the old
    default width was band*17/16 == 0 and floor(v/0) is NULL)."""
    a = spark.createDataFrame([(1, 2.0), (2, 3.5), (3, 7.0)], "a_id long, a_v double")
    b = spark.createDataFrame([(10, 2.0), (11, 3.5), (12, 9.0)], "b_id long, b_v double")
    got = {
        (r["a_id"], r["b_id"])
        for r in R.band_join(a, b, "a_v", "b_v", band=0.0).collect()
    }
    assert got == {(1, 10), (2, 11)}


def test_band_join_outer_keeps_unmatched(spark):
    """how='left'/'full' must null-extend unmatched rows exactly once
    (multiplicity preserved), not drop them through the band filter."""
    a = spark.createDataFrame(
        [(1, 1.0), (2, 50.0), (3, 50.0)], "a_id long, a_v double"
    )  # 2 and 3: identical unmatched rows -> both must survive
    b = spark.createDataFrame([(10, 1.1), (11, 99.0)], "b_id long, b_v double")
    left = R.band_join(a, b, "a_v", "b_v", band=0.5, how="left").collect()
    pairs = sorted((r["a_id"], r["b_id"]) for r in left)
    assert pairs == [(1, 10), (2, None), (3, None)]
    full = R.band_join(a, b, "a_v", "b_v", band=0.5, how="full").collect()
    fpairs = sorted(
        ((r["a_id"], r["b_id"]) for r in full),
        key=lambda p: (p[0] is None, p[0] or 0, p[1] is None, p[1] or 0),
    )
    assert fpairs == [(1, 10), (2, None), (3, None), (None, 11)]
    # oracle parity: matches DuckDB/ANSI FULL JOIN ON BETWEEN shape
    want = {
        (r["a_id"], r["b_id"])
        for r in a.join(
            b,
            (F.col("b_v") >= F.col("a_v") - 0.5) & (F.col("b_v") <= F.col("a_v") + 0.5),
            "full",
        ).collect()
    }
    assert {(r["a_id"], r["b_id"]) for r in full} == want


def test_band_join_full_ulp_orientation(spark):
    """The right-side unmatched probe must evaluate BETWEEN anchored on
    the LEFT value (the inner filter's orientation). 0.13 <= 0.12+0.01
    holds in doubles but 0.12 >= 0.13-0.01 does NOT — a flipped probe
    classified this matched right row as unmatched and emitted a
    spurious (NULL, b) row alongside the genuine pair."""
    a = spark.createDataFrame([(1, 0.12)], "a_id long, a_v double")
    b = spark.createDataFrame([(10, 0.13)], "b_id long, b_v double")
    full = R.band_join(a, b, "a_v", "b_v", band=0.01, how="full").collect()
    assert [(r["a_id"], r["b_id"]) for r in full] == [(1, 10)]


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold") for i in range(200)], "id long, k string"
    )
    dim = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, v int")
    got = sorted(
        (r["id"], r["v"]) for r in R.salted_join(fact, dim, "k", salt=4).collect()
    )
    want = sorted((r["id"], r["v"]) for r in fact.join(dim, "k").collect())
    assert got == want and len(want) == 200


def test_merge_upsert_update_insert_passthrough(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    upd = spark.createDataFrame([(2, 99.0), (9, 1.0)], "k long, bal double")
    rows = {r["k"]: r for r in R.merge_upsert(base, upd, "k").collect()}
    assert rows[2]["bal"] == 99.0 and rows[2]["name"] == "b"   # updated
    assert rows[9]["bal"] == 1.0 and rows[9]["name"] is None   # inserted
    assert rows[1]["bal"] == 10.0 and rows[3]["bal"] == 30.0   # passthrough
    assert len(rows) == 4


def test_merge_upsert_adds_new_update_columns(spark):
    base = spark.createDataFrame([(1, 10.0)], "k long, bal double")
    upd = spark.createDataFrame([(1, 11.0, "x")], "k long, bal double, tag string")
    r = R.merge_upsert(base, upd, "k").collect()[0]
    assert r["bal"] == 11.0 and r["tag"] == "x"


def test_salted_join_left_outer_keeps_unmatched(spark):
    fact = spark.createDataFrame(
        [(1, "hot"), (2, "hot"), (3, "missing")], "id long, k string"
    )
    dim = spark.createDataFrame([("hot", 9)], "k string, v int")
    rows = {r["id"]: r["v"] for r in R.salted_join(fact, dim, "k", salt=4, how="left").collect()}
    assert rows == {1: 9, 2: 9, 3: None}  # one row per left row, no salt dups


def test_interval_join_matches_nested_loop(spark):
    import random

    rnd = random.Random(7)
    pts = spark.createDataFrame(
        [(i, float(rnd.randint(0, 100))) for i in range(120)], "pid long, d double"
    )
    iv = spark.createDataFrame(
        [
            (j, float(rnd.randint(0, 95)), 0.0)
            for j in range(40)
        ],
        "iid long, s double, e double",
    ).withColumn("e", F.col("s") + 1 + F.col("iid") % 9)
    got = sorted(
        (r["iid"], r["pid"])
        for r in R.interval_join(pts, iv, "d", "s", "e", cell_width=3.0).collect()
    )
    want = sorted(
        (r["iid"], r["pid"])
        for r in iv.crossJoin(pts.withColumnRenamed("d", "pd"))
        .filter((F.col("pd") >= F.col("s")) & (F.col("pd") < F.col("e")))
        .withColumnRenamed("pd", "d")
        .collect()
    )
    assert got == want and len(got) > 0


def test_interval_join_left_keeps_empty_intervals(spark):
    pts = spark.createDataFrame([(1, 5.0)], "pid long, d double")
    iv = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 20.0, 30.0), (3, 7.0, 7.0)],  # 3 is empty
        "iid long, s double, e double",
    )
    out = R.interval_join(pts, iv, "d", "s", "e", cell_width=4.0, how="left")
    rows = {r["iid"]: r["pid"] for r in out.collect()}
    assert rows == {1: 1, 2: None, 3: None}


def test_interval_join_half_open_and_guards(spark):
    import pytest

    pts = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "pid long, d double"
    )
    iv = spark.createDataFrame([(1, 10.0, 20.0)], "iid long, s double, e double")
    got = [r["pid"] for r in R.interval_join(pts, iv, "d", "s", "e", 5.0).collect()]
    assert got == [1]  # start inclusive, end exclusive
    with pytest.raises(ValueError):
        R.interval_join(pts, iv, "d", "s", "e", cell_width=0.0)
    with pytest.raises(ValueError):
        R.interval_join(pts, iv, "d", "s", "e", 5.0, how="full")
    # runaway interval trips the max_cells execution guard
    wide = spark.createDataFrame([(1, 0.0, 1e9)], "iid long, s double, e double")
    with pytest.raises(Exception, match="cells"):
        R.interval_join(pts, wide, "d", "s", "e", 1.0, max_cells=100).collect()


def test_interval_join_no_nested_loop_in_plan(spark):
    pts = spark.createDataFrame([(1, 5.0)], "pid long, d double")
    iv = spark.createDataFrame([(1, 0.0, 10.0)], "iid long, s double, e double")
    plan = R.interval_join(pts, iv, "d", "s", "e", 4.0)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_fuzzy_join_matches_naive_theta_join(spark):
    names = [
        "Customer#000000001", "Customer#000000002", "Customer#000000011",
        "Customr#000000001",   # deletion of 'e'
        "XCustomer#000000001", # insertion
        "totally different",
        "ab", "ba", "a", "",
    ]
    a = spark.createDataFrame(
        [(i, s) for i, s in enumerate(names)], "a_id long, a_s string"
    )
    b = spark.createDataFrame(
        [(i, s) for i, s in enumerate(names)], "b_id long, b_s string"
    )
    for k in (1, 2):
        got = sorted(
            (r["a_id"], r["b_id"], r["dist"])
            for r in R.fuzzy_join(a, b, "a_s", "b_s", max_dist=k).collect()
        )
        want = sorted(
            (r["a_id"], r["b_id"], r["d"])
            for r in a.crossJoin(b)
            .withColumn("d", F.levenshtein("a_s", "b_s"))
            .filter(F.col("d") <= k)
            .collect()
        )
        assert got == want, f"k={k}"


def test_fuzzy_join_guards_and_no_hot_block_cross_product(spark):
    import pytest

    a = spark.createDataFrame([(1, "x")], "a_id long, a_s string")
    b = spark.createDataFrame([(1, "y")], "b_id long, b_s string")
    with pytest.raises(ValueError):
        R.fuzzy_join(a, b, "a_s", "b_s", max_dist=0)
    with pytest.raises(ValueError):
        R.fuzzy_join(a, b, "a_s", "b_s", max_dist=4)
    plan = (
        R.fuzzy_join(a, b, "a_s", "b_s")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_interval_join_with_equi_keys_single_key_column(spark):
    pts = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 25.0), (3, "b", 5.0)], "pid long, k string, d double"
    )
    iv = spark.createDataFrame(
        [(10, "a", 0.0, 10.0), (20, "b", 20.0, 30.0)],
        "iid long, k string, s double, e double",
    )
    out = R.interval_join(pts, iv, "d", "s", "e", 4.0, keys=("k",), how="left")
    # the equi-key appears exactly once in the output schema
    assert out.columns.count("k") == 1
    rows = sorted((r["iid"], r["k"], r["pid"]) for r in out.collect())
    # iid 10 matches only point 1 (same key 'a', in range); point 3 has key
    # 'b' and is out of iid 20's range -> iid 20 null-extended
    assert rows == [(10, "a", 1), (20, "b", None)]


def test_rolling_median_exact_frames(spark):
    rows = [(1, i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7])]
    df = spark.createDataFrame(rows, "g int, o int, v double")
    out = {
        r["o"]: r["m"]
        for r in R.rolling_median(df, "v", ["g"], ["o"], preceding=2, out="m").collect()
    }
    # frames: [5] [5,1] [5,1,9] [1,9,3] [9,3,7] -> medians 5, 3, 5, 3, 7
    assert out == {0: 5.0, 1: 3.0, 2: 5.0, 3: 3.0, 4: 7.0}


def test_rolling_median_skips_nulls_and_guards(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, 0, 2.0), (1, 1, None), (1, 2, 4.0)], "g int, o int, v double"
    )
    out = {
        r["o"]: r["m"]
        for r in R.rolling_median(df, "v", ["g"], ["o"], preceding=2, out="m").collect()
    }
    # null is skipped: frame at o=1 is [2] -> 2.0; at o=2 it's [2,4] -> 3.0
    assert out == {0: 2.0, 1: 2.0, 2: 3.0}
    with pytest.raises(ValueError):
        R.rolling_median(df, "v", ["g"], ["o"], preceding=-1)


def test_read_json_corrupt_record_capture(tmp_path, spark):
    from predicting_hospital_readmission_using_mimic_database_spark.sources.io import read_json

    import pytest

    p = tmp_path / "feed"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"id": 1, "v": 10.0}\n'
        'THIS IS NOT JSON\n'
        '{"id": 2, "v": 20.0}\n'
    )
    df = read_json(
        spark, str(p),
        schema="id long, v double, _bad string",
        corrupt_col="_bad",
    )
    rows = df.collect()
    good = sorted((r["id"], r["v"]) for r in rows if r["_bad"] is None)
    bad = [r["_bad"] for r in rows if r["_bad"] is not None]
    assert good == [(1, 10.0), (2, 20.0)]
    assert bad == ["THIS IS NOT JSON"]
    with pytest.raises(ValueError, match="explicit schema"):
        read_json(spark, str(p), corrupt_col="_bad")


def test_ohlc_bars_semantics(spark):
    rows = [
        # one bar (0-300s): open=v@t10, close=v@t200; tie at t200 broken by id
        (1, dt.datetime(2024, 1, 1, 0, 0, 10), "a", 5.0),
        (2, dt.datetime(2024, 1, 1, 0, 3, 20), "a", 1.0),
        (3, dt.datetime(2024, 1, 1, 0, 3, 20), "a", 9.0),
        # next bar
        (4, dt.datetime(2024, 1, 1, 0, 6, 0), "a", 7.0),
        # other key
        (5, dt.datetime(2024, 1, 1, 0, 1, 0), "b", 2.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, k string, v double")
    out = {
        (r["k"], r["bar_start"].minute): (r["open"], r["high"], r["low"], r["close"], r["n"])
        for r in R.ohlc_bars(df, "ts", "v", keys=("k",), bar="5 minutes",
                             tiebreak_col="event_id").collect()
    }
    # close at tied ts picks the HIGHER event_id (max_by on struct)
    assert out[("a", 0)] == (5.0, 9.0, 1.0, 9.0, 3)
    assert out[("a", 5)] == (7.0, 7.0, 7.0, 7.0, 1)
    assert out[("b", 0)] == (2.0, 2.0, 2.0, 2.0, 1)


def test_ohlc_bars_null_values_dropped(spark):
    """NULL-valued rows must not win open/close (min_by/max_by would
    happily return the NULL) — they're filtered before aggregation, and
    an all-NULL bar vanishes entirely."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 1), "a", None),  # earliest — must NOT be open
        (2, dt.datetime(2024, 1, 1, 0, 1, 0), "a", 4.0),
        (3, dt.datetime(2024, 1, 1, 0, 4, 59), "a", None),  # latest — must NOT be close
        (4, dt.datetime(2024, 1, 1, 0, 3, 0), "a", 6.0),
        # a bar where every value is NULL → no output row
        (5, dt.datetime(2024, 1, 1, 0, 6, 0), "a", None),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, k string, v double")
    out = {
        (r["k"], r["bar_start"].minute): (r["open"], r["high"], r["low"], r["close"], r["n"])
        for r in R.ohlc_bars(df, "ts", "v", keys=("k",), bar="5 minutes",
                             tiebreak_col="event_id").collect()
    }
    assert out == {("a", 0): (4.0, 6.0, 4.0, 6.0, 2)}


def test_resample_ffill_gaps_and_means(spark):
    """Hand-checkable grid: key 'a' observes buckets 0 and 7200 (gap at
    3600 forward-filled), bucket 0 averages two rows; key 'b' has a
    single bucket — a 1-point grid, nothing filled."""
    from predicting_hospital_readmission_using_mimic_database_spark.operators.relational import resample_ffill

    rows = [
        ("a", 10, 1.0), ("a", 50, 3.0),      # bucket 0 -> mean 2.0
        ("a", 7300, 9.0),                     # bucket 7200
        ("b", 4000, 5.0),                     # bucket 3600 only
    ]
    df = spark.createDataFrame(rows, "k string, sec long, value double").select(
        "k", F.timestamp_seconds("sec").alias("ts"), "value"
    )
    out = resample_ffill(df, "ts", "value", keys=["k"], step_sec=3600)
    got = {(r["k"], r["bucket"]): r["value"] for r in out.collect()}
    assert got == {
        ("a", 0): 2.0, ("a", 3600): 2.0, ("a", 7200): 9.0,
        ("b", 3600): 5.0,
    }


def test_resample_ffill_guards(spark):
    import pytest

    from predicting_hospital_readmission_using_mimic_database_spark.operators.relational import resample_ffill

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 10_000_000, 2.0)], "k string, sec long, value double"
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "value")
    with pytest.raises(ValueError, match="step_sec"):
        resample_ffill(df, "ts", "value", keys=["k"], step_sec=0)
    with pytest.raises(Exception, match="buckets"):
        resample_ffill(
            df, "ts", "value", keys=["k"], step_sec=1, max_buckets_per_key=100
        ).collect()
