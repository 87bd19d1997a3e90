"""Bucketed (pre-shuffled) storage: the at-scale pattern for repeated
co-located joins — both tables bucketed by the join key join WITHOUT any
Exchange (shuffle) in the physical plan."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse_tables(spark, sf_dir, tmp_path_factory):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (orders.write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders"))
    (li.write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, warehouse_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the join reads bucketed scans directly: no Exchange below the join
        assert "Exchange" not in join_section, join_section[:2000]
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


class TestPublishBucketed:
    def test_api_join_has_no_shuffle_and_appends(self, spark, sf_dir, tmp_path):
        from s3parq_spark.publish import publish_bucketed

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderpriority"
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice"
        )
        name_o = publish_bucketed(
            spark, str(tmp_path / "o"), orders, "o_orderkey", 4, "pb_orders"
        )
        name_l = publish_bucketed(
            spark, str(tmp_path / "l"), li, "l_orderkey", 4, "pb_lineitem"
        )
        assert name_o == "default.pb_orders"
        try:
            lt = spark.table(name_l)
            ot = spark.table(name_o).hint("merge")
            j = (
                lt.join(ot, lt.l_orderkey == ot.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            join_section = plan.split("HashAggregate")[-1]
            assert "SortMergeJoin" in plan
            assert "Exchange" not in join_section, join_section[:2000]
            assert j.count() > 0

            # append preserves the bucket layout (Spark validates the spec)
            n0 = spark.table(name_o).count()
            publish_bucketed(
                spark, str(tmp_path / "o"), orders.limit(10), "o_orderkey", 4,
                "pb_orders", mode="append",
            )
            assert spark.table(name_o).count() == n0 + 10
        finally:
            spark.sql("DROP TABLE IF EXISTS default.pb_orders")
            spark.sql("DROP TABLE IF EXISTS default.pb_lineitem")

    def test_validation(self, spark, tmp_path):
        import pandas as pd

        from s3parq_spark.publish import publish_bucketed

        df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
        with pytest.raises(ValueError, match="not in dataframe"):
            publish_bucketed(spark, str(tmp_path / "t"), df, "zzz", 4, "t1")
        with pytest.raises(ValueError, match="n_buckets"):
            publish_bucketed(spark, str(tmp_path / "t"), df, "a", 0, "t1")
        with pytest.raises(ValueError, match="unsupported mode"):
            publish_bucketed(
                spark, str(tmp_path / "t"), df, "a", 4, "t1", mode="ignore"
            )
