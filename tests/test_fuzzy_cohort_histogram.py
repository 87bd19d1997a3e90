"""Unit tests for edit-distance pair generation (FastSS deletion
neighborhoods), weekly cohort retention, and the integer-exact histogram.

Each test pins exact values on hand-computed inputs, including the edge
cases the oracle gate can't isolate: substitution vs insert vs delete
meeting points, the empty string, cross-week cohort offsets, and the
top-bin clamp."""

import datetime

import pytest
from pyspark.sql import functions as F

from s3parq_spark.operators import (
    cohort_retention,
    edit_distance_pairs,
    numeric_histogram,
)


class TestEditDistancePairs:
    def test_exact_pair_set(self, spark):
        # cat~cot (substitution), cat~cats (insertion), cat~at (deletion),
        # dog isolated, xylophone isolated
        df = spark.createDataFrame(
            [("cat",), ("cot",), ("cats",), ("at",), ("dog",), ("xylophone",)],
            ["s"],
        )
        got = {
            tuple(r)
            for r in edit_distance_pairs(df, "s", 1).collect()
        }
        assert got == {
            ("cat", "cot"),
            ("cat", "cats"),
            ("at", "cat"),
        }

    def test_matches_brute_force(self, spark):
        import itertools

        words = [
            "ring", "rings", "ting", "rang", "wing", "win", "wink",
            "blue", "glue", "clue", "flue", "flu", "",  "a", "b", "ab",
        ]
        df = spark.createDataFrame([(w,) for w in words], ["s"])
        got = {tuple(r) for r in edit_distance_pairs(df, "s", 1).collect()}

        def lev(a, b):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(
                        min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                    )
                prev = cur
            return prev[-1]

        want = {
            (a, b)
            for a, b in itertools.combinations(sorted(words), 2)
            if lev(a, b) <= 1
        }
        assert got == want

    def test_duplicates_collapse(self, spark):
        df = spark.createDataFrame([("cat",), ("cat",), ("cot",)], ["s"])
        assert edit_distance_pairs(df, "s", 1).count() == 1

    def test_depth_two_rejected(self, spark):
        df = spark.createDataFrame([("cat",)], ["s"])
        with pytest.raises(NotImplementedError):
            edit_distance_pairs(df, "s", 2)

    def test_no_cartesian_in_plan(self, spark):
        df = spark.createDataFrame([("cat",), ("cot",)], ["s"])
        plan = edit_distance_pairs(df, "s", 1)._jdf.queryExecution().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan


class TestCohortRetention:
    def test_matrix(self, spark):
        mon1 = datetime.datetime(2024, 1, 1, 12, 0)  # Monday, week of Jan 1
        mon2 = mon1 + datetime.timedelta(weeks=1)
        mon3 = mon1 + datetime.timedelta(weeks=2)
        rows = [
            (1, mon1), (1, mon2),            # cohort w1, active w1+w2
            (2, mon1), (2, mon3),            # cohort w1, active w1+w3
            (3, mon2),                        # cohort w2, active w2 only
            (1, mon1 + datetime.timedelta(days=3)),  # same week, no new cell
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts"])
        got = {
            (r["cohort_week"].isoformat(), r["week_offset"]): r["n_users"]
            for r in cohort_retention(df, "user_id", "ts").collect()
        }
        assert got == {
            ("2024-01-01", 0): 2,
            ("2024-01-01", 1): 1,
            ("2024-01-01", 2): 1,
            ("2024-01-08", 0): 1,
        }

    def test_sunday_belongs_to_prior_iso_week(self, spark):
        sun = datetime.datetime(2024, 1, 7, 23, 0)  # Sunday
        df = spark.createDataFrame([(1, sun)], ["user_id", "ts"])
        [r] = cohort_retention(df, "user_id", "ts").collect()
        assert r["cohort_week"].isoformat() == "2024-01-01"


class TestNumericHistogram:
    def test_bins_and_clamp(self, spark):
        df = spark.createDataFrame([(v,) for v in [0, 1, 2, 3, 4, 5, 9, 10]], ["v"])
        # lo=0 hi=10 nbins=2: bin = least(1, v*2 div 11) -> 0 for v<=5, 1 for v>=6
        got = {
            r["bin_id"]: (r["n_rows"], r["bin_min"], r["bin_max"])
            for r in numeric_histogram(df, "v", 2).collect()
        }
        assert got == {0: (6, 0, 5), 1: (2, 9, 10)}

    def test_max_lands_in_last_bin(self, spark):
        df = spark.createDataFrame([(v,) for v in range(100)], ["v"])
        hist = numeric_histogram(df, "v", 7)
        rows = hist.collect()
        assert sum(r["n_rows"] for r in rows) == 100
        assert max(r["bin_id"] for r in rows) == 6

    def test_constant_column_single_bin(self, spark):
        df = spark.createDataFrame([(42,), (42,), (None,)], ["v"])
        [r] = numeric_histogram(df, "v", 10).collect()
        assert (r["bin_id"], r["n_rows"], r["bin_min"], r["bin_max"]) == (
            0, 2, 42, 42,
        )
