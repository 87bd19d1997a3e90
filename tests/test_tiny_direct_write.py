"""The r16 tiny-input rebalance skip (publish.py): provably one-task
unpartitioned inputs write directly (no AQE rebalance stage) with
identical output geometry; everything unprovable keeps the rebalance."""

import glob
import importlib

from pyspark.sql import functions as F

from s3parq_spark.local_frames import local_rows_df

pub = importlib.import_module("s3parq_spark.publish")


def test_detection(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    local = local_rows_df(spark, [(1, 2)], "a long, b long")
    # tiny single-file scans and local frames qualify
    assert pub._tiny_single_task_input(orders) is True
    assert pub._tiny_single_task_input(local) is True
    # a file over the size bound keeps the rebalance (sf0.1 lineitem,
    # ~21 MB — the bound is ~7.5 MB)
    li_big = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    assert pub._tiny_single_task_input(li_big) is False
    # a join could explode rows: never qualifies
    joined = orders.join(orders.select("o_orderkey"), "o_orderkey")
    assert pub._tiny_single_task_input(joined) is False


def test_unpartitioned_tiny_publish_single_file(spark, tmp_path):
    stats = local_rows_df(spark, [(5, 10, None)],
                          "n_docs long, total_len long, max_df long")
    p = str(tmp_path / "stats_ds")
    pub.publish_path(spark, p, stats, [], mode="overwrite")
    files = glob.glob(p + "/**/*.parquet", recursive=True)
    assert len(files) == 1
    got = spark.read.parquet(p).collect()
    assert [(r["n_docs"], r["total_len"], r["max_df"]) for r in got] == [
        (5, 10, None)
    ]


def test_partitioned_tiny_publish_keeps_per_value_files(spark, sf_dir, tmp_path):
    # partitioned tiny inputs keep the rebalance; geometry unchanged
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    p = str(tmp_path / "orders_ds")
    pub.publish_path(spark, p, orders, ["o_orderpriority"], mode="overwrite")
    vals = orders.select("o_orderpriority").distinct().count()
    files = glob.glob(p + "/**/*.parquet", recursive=True)
    assert len(files) == vals
