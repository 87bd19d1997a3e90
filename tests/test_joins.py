"""asof_join and salted_join operator tests."""

import datetime

from pyspark.sql import functions as F

from s3parq_spark.operators.joins import asof_join, salted_join


def _dt(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, _dt(10), "p1"), (1, _dt(12), "p2"), (2, _dt(10), "p3")],
        ["k", "lt", "lp"],
    )
    right = spark.createDataFrame(
        [(1, _dt(9), "c1"), (1, _dt(11), "c2"), (1, _dt(13), "c3")],
        ["k", "rt", "rp"],
    )
    got = {
        (r.k, r.lp, r.rp)
        for r in asof_join(left, right, ["k"], "lt", "rt").collect()
    }
    # p1 matches c1 (9<=10), p2 matches c2 (11<=12, not 13), p3 no match
    assert got == {(1, "p1", "c1"), (1, "p2", "c2"), (2, "p3", None)}


def test_asof_join_inclusive_at_equal_ts(spark):
    left = spark.createDataFrame([(1, _dt(10), "p")], ["k", "lt", "lp"])
    right = spark.createDataFrame([(1, _dt(10), "c")], ["k", "rt", "rp"])
    row = asof_join(left, right, ["k"], "lt", "rt").first()
    assert row.rp == "c"  # rt <= lt is inclusive


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, _dt(12), "p")], ["k", "lt", "lp"])
    right = spark.createDataFrame([(1, _dt(9), "c")], ["k", "rt", "rp"])
    row = asof_join(left, right, ["k"], "lt", "rt", tolerance="1 HOUR").first()
    assert row.rp is None  # 3h-old match dropped
    row2 = asof_join(left, right, ["k"], "lt", "rt", tolerance="4 HOUR").first()
    assert row2.rp == "c"


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey").agg(
        F.count(F.lit(1)), F.sum("l_quantity").cast("decimal(18,2)")
    ).collect()
    salted = salted_join(li, orders, ["l_orderkey"]).agg(
        F.count(F.lit(1)), F.sum("l_quantity").cast("decimal(18,2)")
    ).collect()
    assert plain == salted


def test_stream_publish_ingestion(spark, sf_dir, tmp_path):
    from s3parq_spark.fetch import fetch_path
    from s3parq_spark.streaming import stream_publish

    ds = str(tmp_path / "ingested")
    stream_publish(spark, f"{sf_dir}/events.parquet", ds, ["event_type"])
    got = fetch_path(
        spark,
        ds,
        filters=[{"partition": "event_type", "comparison": "==", "values": ["click"]}],
    )
    from s3parq_spark.workload import _events

    expected = _events(spark, sf_dir).filter(F.col("event_type") == "click").count()
    assert got.count() == expected


def test_interval_join_equals_theta_join(spark, sf_dir):
    """Bucketed big-big interval join must equal the naive theta join, with
    no duplicate pairs, and plan as an equi-join (hash/sort-merge), never a
    nested-loop cartesian."""
    from s3parq_spark.operators.joins import interval_join
    from s3parq_spark.workload import _events

    ev = _events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"))
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"))
    got = interval_join(p, c, on=["user_id"], left_ts="purchase_ts",
                        right_ts="click_ts", lower="30 minutes", upper="15 minutes")
    naive = p.join(
        c.withColumnRenamed("user_id", "c_user"),
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 minutes"))
        & (F.col("click_ts") <= F.col("purchase_ts") + F.expr("INTERVAL 15 minutes")),
    ).drop("c_user")
    g = sorted(tuple(r) for r in got.select(*naive.columns).collect())
    n = sorted(tuple(r) for r in naive.collect())
    assert g == n and len(g) > 0

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "SortMergeJoin" in plan or "HashJoin" in plan


class TestJoinsReviewFixes:
    def test_asof_matched_row_travels_wholesale(self, spark):
        """A NULL inside the matched right row's payload must STAY NULL —
        per-column carry stitched columns from different right rows into
        one that never existed (r6 review)."""
        import datetime

        from s3parq_spark.operators import asof_join

        t = datetime.datetime
        right = spark.createDataFrame(
            [("k", t(2024, 1, 1, 1), 1.0, 2.0),
             ("k", t(2024, 1, 1, 2), None, 3.0)],
            "k string, rts timestamp, a double, b double",
        )
        left = spark.createDataFrame(
            [("k", t(2024, 1, 1, 3))], "k string, lts timestamp"
        )
        r = asof_join(left, right, ["k"], "lts", "rts").collect()[0]
        assert r["b"] == 3.0
        assert r["a"] is None, "a must come from the ts=2 row (NULL), not ts=1"
        assert r["rts"] == t(2024, 1, 1, 2)

    def test_asof_null_timestamps(self, spark):
        import datetime

        from s3parq_spark.operators import asof_join

        t = datetime.datetime
        right = spark.createDataFrame(
            [("k", None, 9.0)], "k string, rts timestamp, x double"
        )
        left = spark.createDataFrame(
            [("k", t(2024, 1, 1))], "k string, lts timestamp"
        )
        r = asof_join(left, right, ["k"], "lts", "rts").collect()[0]
        # a right row with no position in as-of order can never match
        assert r["x"] is None and r["rts"] is None

    def test_asof_tolerance_nulls_whole_match(self, spark):
        import datetime

        from s3parq_spark.operators import asof_join

        t = datetime.datetime
        right = spark.createDataFrame(
            [("k", t(2024, 1, 1, 0), 7.0)], "k string, rts timestamp, x double"
        )
        left = spark.createDataFrame(
            [("k", t(2024, 1, 1, 5))], "k string, lts timestamp"
        )
        r = asof_join(
            left, right, ["k"], "lts", "rts", tolerance="30 minutes"
        ).collect()[0]
        assert r["x"] is None and r["rts"] is None

    def test_interval_and_salted_reject_ambiguous_columns(self, spark):
        import pytest

        from s3parq_spark.operators import interval_join, salted_join

        a = spark.createDataFrame([(1, 2)], ["k", "v"])
        b = spark.createDataFrame([(1, 3)], ["k", "v"])
        with pytest.raises(ValueError, match="rename first"):
            salted_join(a, b, ["k"])
        import datetime
        t = datetime.datetime
        c = spark.createDataFrame([(1, t(2024, 1, 1), 2)], ["k", "ts", "v"])
        d = spark.createDataFrame([(1, t(2024, 1, 1), 3)], ["k", "ts", "v"])
        with pytest.raises(ValueError, match="rename first"):
            interval_join(c, d, ["k"], "ts", "ts", "1 hour", "1 hour")

    def test_salted_join_handles_map_columns_and_duplicates(self, spark):
        from s3parq_spark.operators import salted_join

        left = spark.createDataFrame(
            [(1, {"a": "b"})] * 6, "k int, attrs map<string,string>"
        )
        right = spark.createDataFrame([(1, "dim")], ["k", "d"])
        out = salted_join(left, right, ["k"], salt_buckets=4)
        assert out.count() == 6  # identical duplicate rows all join
        assert set(out.columns) == {"k", "attrs", "d"}
