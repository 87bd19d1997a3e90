"""funnel_stages (multi-stage ordered funnel) and rrf_fuse (reciprocal-
rank fusion) operator semantics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from s3parq_spark.operators import funnel_stages, rrf_fuse


def _ts(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


def _funnel(spark, rows, stages=("a", "b", "c")):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, step string")
    out = funnel_stages(df, "user_id", "ts", "step", list(stages))
    return {r["stage"]: r["users"] for r in out.collect()}


def test_funnel_strict_order(spark):
    rows = [
        # u1 completes a -> b -> c in order
        (1, _ts(0), "a"), (1, _ts(1), "b"), (1, _ts(2), "c"),
        # u2 does b BEFORE a: b must not count, c (after nothing) neither
        (2, _ts(0), "b"), (2, _ts(1), "a"), (2, _ts(2), "x"),
        # u3 reaches b only
        (3, _ts(0), "a"), (3, _ts(5), "b"),
        # u4 never starts
        (4, _ts(0), "c"), (4, _ts(1), "b"),
    ]
    got = _funnel(spark, rows)
    assert got == {"a": 3, "b": 2, "c": 1}


def test_funnel_equal_timestamps_not_after(spark):
    # b at the SAME instant as a is not strictly after it
    rows = [
        (1, _ts(0), "a"), (1, _ts(0), "b"),
        (2, _ts(0), "a"), (2, _ts(1), "b"),
    ]
    got = _funnel(spark, rows, stages=("a", "b"))
    assert got == {"a": 2, "b": 1}


def test_funnel_uses_earliest_qualifying_stage(spark):
    # u1's FIRST a is at t0; a b at t1 counts even though a later a exists
    rows = [
        (1, _ts(0), "a"), (1, _ts(1), "b"), (1, _ts(9), "a"),
    ]
    got = _funnel(spark, rows, stages=("a", "b"))
    assert got == {"a": 1, "b": 1}


def test_funnel_empty_and_validation(spark):
    df = spark.createDataFrame([], "user_id long, ts timestamp, step string")
    out = funnel_stages(df, "user_id", "ts", "step", ["a", "b"])
    assert {r["stage"]: r["users"] for r in out.collect()} == {"a": 0, "b": 0}
    with pytest.raises(ValueError, match="at least one stage"):
        funnel_stages(df, "user_id", "ts", "step", [])


def test_funnel_single_exchange_plan(spark):
    """All window phases and the per-user aggregate ride ONE shuffle on
    user_id (the melt/global fold is a single-row side show)."""
    rows = [(i % 7, _ts(i), "abc"[i % 3]) for i in range(50)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, step string")
    plan = (
        funnel_stages(df, "user_id", "ts", "step", ["a", "b", "c"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("hashpartitioning(user_id") <= 1, plan


def _rank_df(spark, pairs):
    return spark.createDataFrame(pairs, "id long, s double")


def test_rrf_fuse_scores_and_overlap(spark):
    a = _rank_df(spark, [(10, 0.9), (11, 0.8), (12, 0.7)])
    b = _rank_df(spark, [(11, 5.0), (13, 4.0)])
    out = rrf_fuse([(a, "s"), (b, "s")], "id", k=60, top_k=10).collect()
    got = {r["id"]: (r["n_lists"], round(r["rrf_score"], 9)) for r in out}
    assert got[11] == (2, round(1 / 62 + 1 / 61, 9))
    assert got[10] == (1, round(1 / 61, 9))
    assert got[13] == (1, round(1 / 62, 9))
    assert got[12] == (1, round(1 / 63, 9))
    # overlap ranks first
    assert out[0]["id"] == 11


def test_rrf_fuse_tiebreak_and_topk(spark):
    # identical scores: rank by id ascending; top_k truncates
    a = _rank_df(spark, [(i, 1.0) for i in range(5)])
    out = rrf_fuse([(a, "s")], "id", k=60, top_k=3).collect()
    assert [r["id"] for r in out] == [0, 1, 2]
    assert out[0]["rrf_score"] > out[1]["rrf_score"] > out[2]["rrf_score"]
    with pytest.raises(ValueError, match="at least one ranking"):
        rrf_fuse([], "id")


def test_rrf_fuse_three_lists_order_independent(spark):
    lists = [
        _rank_df(spark, [(1, 3.0), (2, 2.0)]),
        _rank_df(spark, [(2, 9.0), (3, 8.0)]),
        _rank_df(spark, [(1, 0.5), (3, 0.4), (2, 0.3)]),
    ]
    base = {
        r["id"]: r["rrf_score"]
        for r in rrf_fuse([(d, "s") for d in lists], "id").collect()
    }
    perm = {
        r["id"]: r["rrf_score"]
        for r in rrf_fuse([(d, "s") for d in lists[::-1]], "id").collect()
    }
    assert base == perm  # decimal fold: list order cannot move the sum
    assert max(base, key=lambda i: (base[i], -i)) == 2
