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

    def test_distance_two_matches_brute_force(self, spark):
        import itertools

        words = [
            "ring", "rings", "ting", "rang", "wing", "win", "wink",
            "blue", "glue", "clue", "flue", "flu", "", "a", "b", "ab",
            "ringses", "tank", "tonka",
        ]
        df = spark.createDataFrame([(w,) for w in words], ["s"])
        got = {tuple(r) for r in edit_distance_pairs(df, "s", 2).collect()}

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
            if lev(a, b) <= 2
        }
        assert got == want

    def test_depth_three_rejected(self, spark):
        df = spark.createDataFrame([("cat",)], ["s"])
        with pytest.raises(NotImplementedError):
            edit_distance_pairs(df, "s", 3)

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


class TestSkewProfile:
    def test_counts_share_and_tiebreak(self, spark):
        from s3parq_spark.operators import skew_profile

        rows = [("a",)] * 4 + [("b",)] * 2 + [("c",)] * 2 + [("d",)] * 1
        df = spark.createDataFrame(rows, ["k"])
        got = skew_profile(df, ["k"], 3).collect()
        assert [(r["k"], r["n_rows"]) for r in got] == [
            ("a", 4), ("b", 2), ("c", 2),  # b before c: key tie-break
        ]
        assert got[0]["share"] == 4 / 9

    def test_topk_plan_avoids_global_sort(self, spark):
        from s3parq_spark.operators import skew_profile

        df = spark.createDataFrame([("a",), ("b",)], ["k"])
        plan = skew_profile(df, ["k"], 5)._jdf.queryExecution().toString()
        assert "TakeOrderedAndProject" in plan


class TestCorrelationMatrix:
    def test_perfect_and_anti_correlation(self, spark):
        from s3parq_spark.operators import correlation_matrix

        rows = [(i, 2 * i + 1, 10 - i) for i in range(8)]
        df = spark.createDataFrame(rows, ["x", "y", "z"])
        got = {(r["col_x"], r["col_y"]): r for r in correlation_matrix(
            df, ["x", "y", "z"]).collect()}
        assert got[("x", "y")]["corr"] == pytest.approx(1.0)
        assert got[("x", "z")]["corr"] == pytest.approx(-1.0)
        assert got[("y", "z")]["corr"] == pytest.approx(-1.0)
        assert all(r["n_pairs"] == 8 for r in got.values())

    def test_pairwise_nulls_and_constant(self, spark):
        from s3parq_spark.operators import correlation_matrix

        rows = [(1, 5, None), (2, 5, 7), (3, 5, 9), (None, 5, 11)]
        df = spark.createDataFrame(rows, ["x", "c", "z"])
        got = {(r["col_x"], r["col_y"]): r for r in correlation_matrix(
            df, ["x", "c", "z"]).collect()}
        assert got[("x", "c")]["corr"] is None          # zero variance
        assert got[("x", "z")]["n_pairs"] == 2          # pairwise-complete
        assert got[("x", "z")]["corr"] == pytest.approx(1.0)

    def test_known_value(self, spark):
        from s3parq_spark.operators import correlation_matrix

        xs = [1, 2, 4, 5]
        ys = [1, 3, 2, 6]
        import math

        n = len(xs)
        num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
        den = math.sqrt(n * sum(a * a for a in xs) - sum(xs) ** 2) * math.sqrt(
            n * sum(b * b for b in ys) - sum(ys) ** 2
        )
        df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
        [r] = correlation_matrix(df, ["x", "y"]).collect()
        assert r["corr"] == pytest.approx(num / den, abs=1e-12)


class TestInvertedIndex:
    def test_postings_and_df_band(self, spark):
        from s3parq_spark.operators import inverted_index

        docs = [
            (1, "a b c a b c"),   # shingle "a b c" twice in one doc
            (2, "a b c d"),
            (3, "x y z"),
            (4, "x y z"),
            (5, "q"),             # too short for k=3
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            r["term"]: (r["n_docs"], r["postings"])
            for r in inverted_index(df, "doc_id", "text", k=3, min_df=2).collect()
        }
        # "a b c" appears twice in doc 1 but counts once (per-doc distinct)
        assert got["a b c"] == (2, [1, 2])
        assert got["x y z"] == (2, [3, 4])
        # df-1 shingles ("b c a", "c a b", "b c d") fall below min_df
        assert set(got) == {"a b c", "x y z"}

    def test_max_df_drops_stop_shingles(self, spark):
        from s3parq_spark.operators import inverted_index

        docs = [(i, "s t o p") for i in range(6)] + [(10, "r a r e"), (11, "r a r e")]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {r["term"] for r in inverted_index(
            df, "doc_id", "text", k=4, min_df=2, max_df=5).collect()}
        assert got == {"r a r e"}


class TestResampleCounts:
    def test_gaps_become_zero(self, spark):
        from s3parq_spark.operators import resample_counts

        rows = [
            (1, datetime.datetime(2024, 1, 1, 0, 10)),
            (1, datetime.datetime(2024, 1, 1, 0, 50)),   # same hour
            (1, datetime.datetime(2024, 1, 1, 3, 0)),    # 2-hour gap
            (2, datetime.datetime(2024, 1, 1, 5, 0)),    # single event
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts"])
        got = {
            (r["user_id"], r["bucket"].hour): r["n_events"]
            for r in resample_counts(df, "user_id", "ts", "hour").collect()
        }
        assert got == {
            (1, 0): 2, (1, 1): 0, (1, 2): 0, (1, 3): 1,
            (2, 5): 1,
        }

    def test_grid_spans_each_key_independently(self, spark):
        from s3parq_spark.operators import resample_counts

        rows = [
            (1, datetime.datetime(2024, 1, 1, 0, 0)),
            (1, datetime.datetime(2024, 1, 1, 9, 0)),
            (2, datetime.datetime(2024, 1, 1, 4, 0)),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts"])
        out = resample_counts(df, "user_id", "ts", "hour")
        n_by_user = {
            r["user_id"]: r["n"]
            for r in out.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n")).collect()
        }
        assert n_by_user == {1: 10, 2: 1}  # 0..9 inclusive for user 1
