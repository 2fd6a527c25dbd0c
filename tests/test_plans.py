"""Physical-plan assertions: pushdown, pruning, and partition pruning must
survive refactors — the 100 TB posture, structurally enforced."""

import pyspark.sql.functions as F

from predicting_hospital_readmission_using_mimic_database_spark.sources.io import read_table

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushed_to_parquet_scan(spark):
    df = read_table(spark, SF, "customer").filter(F.col("c_acctbal") > 0).select("c_custkey")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal,0.0)" in plan


def test_projection_prunes_read_schema(spark):
    df = read_table(spark, SF, "customer").select("c_custkey", "c_name")
    plan = _plan(df)
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string>" in plan


def test_partition_pruning_on_partitioned_write(tmp_path, spark):
    src = read_table(spark, SF, "events").select("event_id", "event_type", "value")
    path = str(tmp_path / "ev_part")
    src.write.mode("overwrite").partitionBy("event_type").parquet(path)
    df = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = _plan(df)
    # partition filter prunes directories; no data filter on event_type needed
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    assert df.count() == src.filter(F.col("event_type") == "purchase").count()


def test_broadcast_join_for_dim(spark):
    fact = read_table(spark, SF, "orders")
    dim = read_table(spark, SF, "nation")
    j = fact.join(F.broadcast(dim), fact.o_custkey % 25 == dim.n_nationkey)
    assert "BroadcastHashJoin" in _plan(j)
