"""Unit tests for the time-series operators (rolling window / changelog
compaction / funnel), the one-pass column profiler, percentile-band
trimming, and dynamic partition overwrite.

Each test pins exact values on a hand-computed frame, including the
boundary semantics (window-edge inclusion, horizon equality, tie-break
winners) the oracle gate can't isolate."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from s3parq_spark.operators import (
    funnel_next_within,
    latest_state,
    percentile_band_filter,
    profile_columns,
    rolling_window_agg,
)
from s3parq_spark.publish import overwrite_partitions, publish_path


def _ts(minutes):
    return datetime.datetime(2024, 1, 1, 0, 0) + datetime.timedelta(minutes=minutes)


@pytest.fixture()
def events_df(spark):
    rows = [
        # user 1: events at t=0, 30, 59, 60, 120 minutes
        (1, 1, _ts(0), "click", 1.0),
        (2, 1, _ts(30), "click", 2.0),
        (3, 1, _ts(59), "purchase", 4.0),
        (4, 1, _ts(60), "click", 8.0),
        (5, 1, _ts(120), "purchase", 16.0),
        # user 2: single event
        (6, 2, _ts(10), "click", 32.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_rolling_window_boundaries(spark, events_df):
    out = rolling_window_agg(
        events_df, "user_id", "ts", "1 hour", sum_col="value"
    )
    got = {r["event_id"]: (r["__n_window"], r["__sum_window"]) for r in out.collect()}
    # frame is (t - 1h, t]: at t=60min the t=0 event is EXCLUDED (3600s ago,
    # outside the 3599s range), t=30/59/60 are in
    assert got[1] == (1, 1.0)
    assert got[2] == (2, 3.0)
    assert got[3] == (3, 7.0)
    assert got[4] == (3, 14.0)
    assert got[5] == (1, 16.0)  # t=120: t=60 is exactly 1h earlier -> excluded
    assert got[6] == (1, 32.0)


def test_latest_state_winner_and_schema(spark, events_df):
    out = latest_state(
        events_df, ["user_id"], "ts", "event_id", ["event_type", "value"]
    )
    assert out.columns == ["user_id", "ts", "event_id", "event_type", "value"]
    got = {r["user_id"]: r for r in out.collect()}
    assert got[1]["event_id"] == 5 and got[1]["event_type"] == "purchase"
    assert got[2]["event_id"] == 6

    # tie on ts -> tiebreak (higher event_id) wins
    tied = spark.createDataFrame(
        [(1, 9, _ts(0), "a", 0.0), (2, 9, _ts(0), "b", 0.0)],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    w = latest_state(tied, ["user_id"], "ts", "event_id", ["event_type"]).collect()
    assert len(w) == 1 and w[0]["event_id"] == 2 and w[0]["event_type"] == "b"


def test_latest_state_is_single_aggregate(spark, events_df):
    out = latest_state(
        events_df, ["user_id"], "ts", "event_id", ["event_type", "value"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # aggregate-winner, not window-winner: map-side partial_max combines
    # before the single shuffle; no Window operator, no join-back
    assert "Window" not in plan and "Join" not in plan
    assert "partial_max" in plan
    assert plan.count("Exchange") == 1


def test_funnel_horizon_inclusive(spark, events_df):
    out = funnel_next_within(
        events_df, "user_id", "ts", "event_type", "click", "purchase",
        "1 hour", "event_id",
    )
    got = {r["event_id"]: r for r in out.collect()}
    assert set(got) == {1, 2, 4, 6}  # click rows only
    # click at t=0 -> purchase at t=59 within the hour
    assert got[1]["converted"] and got[1]["next_purchase_ts"] == _ts(59)
    assert got[2]["converted"]
    # click at t=60 -> purchase at t=120: exactly the horizon -> inclusive
    assert got[4]["converted"] and got[4]["next_purchase_ts"] == _ts(120)
    # user 2 never purchases
    assert not got[6]["converted"] and got[6]["next_purchase_ts"] is None


def test_profile_columns_nulls_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (3, "a")], "k long, s string"
    )
    got = {r["column_name"]: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert got["k"]["n_rows"] == 4 and got["k"]["n_nulls"] == 0
    assert got["k"]["n_distinct"] == 3
    assert (got["k"]["min_value"], got["k"]["max_value"]) == ("1", "3")
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert (got["s"]["min_value"], got["s"]["max_value"]) == ("a", "c")


def test_percentile_band_trims_tails(spark):
    # 100 rows with values 1..100, one each: cume_dist(v) = v/100
    df = spark.createDataFrame([(i, i) for i in range(1, 101)], "id long, v long")
    out = percentile_band_filter(df, "v", 0.05, 0.95)
    vals = sorted(r["v"] for r in out.collect())
    assert vals == list(range(5, 96))  # cd(5)=0.05 and cd(95)=0.95 inclusive
    assert out.columns == ["id", "v"]


def test_percentile_band_duplicate_values_are_peers(spark):
    # 4x10 + 4x20: cd(10)=0.5, cd(20)=1.0 -> lo=0.6 drops ALL the 10s
    df = spark.createDataFrame(
        [(i, 10) for i in range(4)] + [(i, 20) for i in range(4)], "id long, v long"
    )
    vals = [r["v"] for r in percentile_band_filter(df, "v", 0.6, 1.0).collect()]
    assert vals == [20, 20, 20, 20]


def test_overwrite_partitions_replaces_only_touched(spark, tmp_dataset_dir):
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], i * 1.0) for i in range(30)],
        "id long, part string, x double",
    )
    publish_path(spark, tmp_dataset_dir, df, ["part"], mode="overwrite")
    before_b = sorted(os.listdir(os.path.join(tmp_dataset_dir, "part=b")))
    before_c = sorted(os.listdir(os.path.join(tmp_dataset_dir, "part=c")))

    repl = spark.createDataFrame([(100, "a", -1.0)], "id long, part string, x double")
    new_files = overwrite_partitions(spark, tmp_dataset_dir, repl, ["part"])
    assert new_files and all(f.startswith("part=a/") for f in new_files)

    # untouched partitions keep their exact files
    assert sorted(os.listdir(os.path.join(tmp_dataset_dir, "part=b"))) == before_b
    assert sorted(os.listdir(os.path.join(tmp_dataset_dir, "part=c"))) == before_c

    got = spark.read.parquet(tmp_dataset_dir)
    assert got.filter(F.col("part") == "a").count() == 1
    assert got.filter(F.col("part") == "a").first()["id"] == 100
    assert got.filter(F.col("part") != "a").count() == 20


def test_overwrite_partitions_rejects_mismatch(spark, tmp_dataset_dir):
    df = spark.createDataFrame([(1, "a", 1.0)], "id long, part string, x double")
    publish_path(spark, tmp_dataset_dir, df, ["part"], mode="overwrite")
    with pytest.raises(ValueError, match="do not match"):
        overwrite_partitions(spark, tmp_dataset_dir, df, ["id"])
    with pytest.raises(ValueError, match="at least one partition"):
        overwrite_partitions(spark, tmp_dataset_dir, df.drop("part"), [])


class TestDatasetCard:
    def test_card_numbers(self, spark):
        from s3parq_spark.operators.profile import dataset_card
        from pyspark.sql import functions as F

        rows = [
            ("A", "one two three", "en"),
            ("A", "vier funf", "de"),
            ("A", "six seven eight nine", "en"),
            ("B", "x", "fr"),
        ]
        df = spark.createDataFrame(rows, ["source", "text", "lang"])
        out = {r["source"]: r for r in
               dataset_card(df, "source", "text", lang_col="lang").collect()}
        a = out["A"]
        assert a["n_docs"] == 3 and a["n_tokens"] == 9
        assert a["min_tokens"] == 2 and a["max_tokens"] == 4
        assert abs(a["mean_tokens"] - 3.0) < 1e-12
        assert a["n_langs"] == 2
        assert a["top_lang"] == "en" and a["top_lang_docs"] == 2
        assert abs(a["docs_share"] - 0.75) < 1e-12
        assert out["B"]["top_lang"] == "fr" and out["B"]["n_docs"] == 1

    def test_top_lang_tie_breaks_lexicographically(self, spark):
        from s3parq_spark.operators.profile import dataset_card

        df = spark.createDataFrame(
            [("A", "t", "zz"), ("A", "t", "aa")], ["source", "text", "lang"]
        )
        r = dataset_card(df, "source", "text", lang_col="lang").collect()[0]
        assert r["top_lang"] == "aa"

    def test_no_lang_col_defaults_single_lang(self, spark):
        from s3parq_spark.operators.profile import dataset_card

        df = spark.createDataFrame([("A", "a b")], ["source", "text"])
        r = dataset_card(df, "source", "text").collect()[0]
        assert r["n_langs"] == 1 and r["top_lang"] == "und"


class TestClipOutliers:
    def test_clip_and_drop_modes(self, spark):
        from s3parq_spark.operators.profile import clip_outliers
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 101)], ["k", "v"]
        )
        clipped = clip_outliers(df, ["v"], 0.10, 0.90)
        r = clipped.agg(F.min("v"), F.max("v")).collect()[0]
        # percentile_cont on 1..100 at 0.10/0.90 = 10.9 / 90.1
        assert abs(r[0] - 10.9) < 1e-9 and abs(r[1] - 90.1) < 1e-9
        assert clipped.count() == 100  # clip keeps every row
        dropped = clip_outliers(df, ["v"], 0.10, 0.90, mode="drop")
        assert dropped.count() == 80  # 11..90 survive
        assert clipped.columns == df.columns

    def test_bad_mode_rejected(self, spark):
        from s3parq_spark.operators.profile import clip_outliers

        df = spark.createDataFrame([(1, 1.0)], ["k", "v"])
        with pytest.raises(ValueError, match="mode"):
            clip_outliers(df, ["v"], mode="nope")


class TestNormalizeByGroup:
    def test_zscore_values_and_edges(self, spark):
        from s3parq_spark.operators.profile import normalize_by_group
        from pyspark.sql import functions as F

        rows = [("A", 1.0), ("A", 2.0), ("A", 3.0),
                ("B", 5.0), ("B", 5.0),   # constant group -> z = 0
                ("C", 9.0)]               # single row -> z = 0
        df = spark.createDataFrame(rows, ["g", "v"])
        out = normalize_by_group(df, "g", ["v"])
        got = {(r["g"], r["v"]): r["v_z"] for r in out.collect()}
        # A: mean 2, sample std 1
        assert abs(got[("A", 1.0)] + 1.0) < 1e-12
        assert abs(got[("A", 2.0)]) < 1e-12
        assert abs(got[("A", 3.0)] - 1.0) < 1e-12
        assert got[("B", 5.0)] == 0.0 and got[("C", 9.0)] == 0.0
        # per-group mean of z is 0, sample std is 1 for non-degenerate
        stats = (out.filter(F.col("g") == "A")
                 .agg(F.avg("v_z"), F.stddev_samp("v_z")).collect()[0])
        assert abs(stats[0]) < 1e-12 and abs(stats[1] - 1.0) < 1e-12

    def test_nulls_pass_through_both_modes(self, spark):
        from s3parq_spark.operators.profile import clip_outliers

        df = spark.createDataFrame(
            [(1, 1.0), (2, 50.0), (3, None), (4, 100.0)], "k INT, v DOUBLE"
        )
        clipped = {r["k"]: r["v"] for r in
                   clip_outliers(df, ["v"], 0.1, 0.9).collect()}
        assert clipped[3] is None          # NULL stays NULL, never a bound
        assert clipped[2] == 50.0
        dropped = clip_outliers(df, ["v"], 0.1, 0.9, mode="drop")
        assert {r["k"] for r in dropped.collect()} == {2, 3}  # NULL row kept

    def test_null_group_rows_survive(self, spark):
        from s3parq_spark.operators.profile import normalize_by_group

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), (None, 5.0)], "g STRING, v DOUBLE"
        )
        out = normalize_by_group(df, "g", ["v"])
        assert out.count() == 3
        nullrow = [r for r in out.collect() if r["g"] is None][0]
        assert nullrow["v_z"] == 0.0  # single-member NULL group


class TestProfileReviewFixes:
    def test_validate_expectations_accepts_generator(self, spark):
        # a generator rules argument must not be silently exhausted into a
        # zero-row report (which would vacuously pass publish gates)
        from s3parq_spark.operators import validate_expectations

        df = spark.createDataFrame([(1,), (None,)], "a int")
        rules = ({"rule": "a_nn", "type": "not_null", "col": "a"}
                 for _ in range(1))
        out = validate_expectations(df, rules).collect()
        assert len(out) == 1 and out[0]["n_violations"] == 1

    def test_correlation_matrix_refuses_out_of_domain_values(self, spark):
        import pytest

        from s3parq_spark.operators import correlation_matrix

        ok = spark.createDataFrame(
            [(1, 2), (2, 4), (3, 7)], "x long, y long"
        )
        rows = correlation_matrix(ok, ["x", "y"]).collect()
        assert abs(rows[0]["corr"] - 0.9934) < 1e-3
        # snowflake-style ids blow past decimal(18,0): loud, not corrupt
        huge = spark.createDataFrame(
            [(4_000_000_000_000_000_000, 1),
             (4_100_000_000_000_000_000, 2),
             (4_200_000_000_000_000_000, 3)],
            "x long, y long",
        )
        with pytest.raises(Exception, match="correlation_matrix"):
            correlation_matrix(huge, ["x", "y"]).collect()

    def test_numeric_histogram_survives_full_bigint_range(self, spark):
        from s3parq_spark.operators import numeric_histogram

        df = spark.createDataFrame(
            [(-4_000_000_000_000_000_000,), (0,),
             (4_000_000_000_000_000_000,)],
            "v long",
        )
        rows = numeric_histogram(df, "v", nbins=4).collect()
        assert sum(r["n_rows"] for r in rows) == 3
        assert all(0 <= r["bin_id"] <= 3 for r in rows), rows

    def test_dataset_card_empty_text_and_null_group(self, spark):
        from s3parq_spark.operators import dataset_card

        df = spark.createDataFrame(
            [("a", "one two", "en"), ("a", "", "en"),
             ("a", None, "en"), (None, "x y z", "de")],
            "src string, text string, lang string",
        )
        rows = {r["src"]: r for r in
                dataset_card(df, "src", "text", lang_col="lang").collect()}
        # the NULL group keeps its row (null-safe join)...
        assert set(rows) == {"a", None}
        # ...empty/NULL text counts zero tokens...
        assert rows["a"]["n_tokens"] == 2 and rows["a"]["min_tokens"] == 0
        assert rows[None]["n_tokens"] == 3
        # ...and shares sum to 1 again
        assert abs(sum(r["docs_share"] for r in rows.values()) - 1.0) < 1e-12

    def test_percentile_band_ignores_null_mass(self, spark):
        from s3parq_spark.operators import percentile_band_filter

        rows = [(i, float(i)) for i in range(1, 11)] + [
            (100 + i, None) for i in range(10)
        ]
        df = spark.createDataFrame(rows, "k int, v double")
        got = sorted(
            r["k"] for r in
            percentile_band_filter(df, "v", 0.15, 0.85).collect()
        )
        # 10 non-null values: cume_dist i/10; band [0.15, 0.85] keeps 2..8
        # — the 10 NULL rows must not shift the boundaries (or appear)
        assert got == [2, 3, 4, 5, 6, 7, 8]
