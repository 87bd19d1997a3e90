"""Round-5 curation operators: split assignment, token budgeting,
line-level dedup, decontamination, full fuzzy dedup, dataset restore."""

import pytest
from pyspark.sql import functions as F

from s3parq_spark.fetch import fetch_path, fetch_at, list_versions
from s3parq_spark.publish import publish_path, restore_dataset
from s3parq_spark.operators.sampling import assign_splits, token_budget_select
from s3parq_spark.operators.text import remove_duplicated_lines
from s3parq_spark.operators.dedup import decontaminate, fuzzy_dedup_corpus


class TestAssignSplits:
    def test_partitions_complete_and_deterministic(self, spark):
        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        out = assign_splits(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}
        assert sum(counts.values()) == 2000
        assert counts["train"] > counts["val"]
        # pure function of id: same assignment under a different layout
        again = assign_splits(
            df.repartition(7), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        )
        assert out.exceptAll(again).count() == 0

    def test_membership_stable_under_corpus_growth(self, spark):
        small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        big = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
        s = assign_splits(small, "doc_id", {"train": 0.9, "val": 0.1})
        b = assign_splits(big, "doc_id", {"train": 0.9, "val": 0.1})
        joined = s.alias("s").join(b.alias("b"), "doc_id").filter(
            F.col("s.split") != F.col("b.split")
        )
        assert joined.count() == 0

    def test_remainder_is_null_and_overflow_rejected(self, spark):
        df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
        out = assign_splits(df, "doc_id", {"train": 0.5})
        n_null = out.filter(F.col("split").isNull()).count()
        assert 0 < n_null < 1000
        with pytest.raises(ValueError, match="sum"):
            assign_splits(df, "doc_id", {"a": 0.8, "b": 0.4})


class TestTokenBudgetSelect:
    def test_prefix_within_budget_best_first(self, spark):
        rows = [
            ("a", 1, 100, 0.9), ("a", 2, 100, 0.8), ("a", 3, 100, 0.7),
            ("b", 4, 150, 0.5), ("b", 5, 150, 0.6),
        ]
        df = spark.createDataFrame(rows, ["src", "doc_id", "n_tok", "q"])
        out = token_budget_select(
            df, id_col="doc_id", group_col="src", order_col="q",
            tokens_col="n_tok", budget=250,
        )
        got = {(r["src"], r["doc_id"]): r["cum_tokens"] for r in out.collect()}
        # a: best-first 1 (100), 2 (200); 3 would cross 250
        # b: best-first 5 (150); 4 would cross
        assert got == {("a", 1): 100, ("a", 2): 200, ("b", 5): 150}

    def test_row_crossing_budget_excluded_strictly(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 300, 1.0), ("a", 2, 10, 0.5)], ["src", "doc_id", "n_tok", "q"]
        )
        out = token_budget_select(
            df, id_col="doc_id", group_col="src", order_col="q",
            tokens_col="n_tok", budget=200,
        )
        # best doc alone exceeds the budget -> nothing from its prefix
        assert out.count() == 0


class TestRemoveDuplicatedLines:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "header\nunique one\nfooter"),
                (2, "header\nunique two"),
                (3, "unique three\nfooter"),
                (4, "  \nonly unique"),
            ],
            ["doc_id", "text"],
        )

    def test_boilerplate_removed_order_kept(self, spark):
        out = remove_duplicated_lines(
            self._docs(spark), "doc_id", "text", min_doc_freq=2
        )
        got = {r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_kept"])
               for r in out.collect()}
        assert got[1] == ("unique one", 3, 1)
        assert got[2] == ("unique two", 2, 1)
        assert got[3] == ("unique three", 2, 1)
        # blank line dropped unconditionally, not counted
        assert got[4] == ("only unique", 1, 1)

    def test_fully_boilerplate_doc_becomes_empty(self, spark):
        df = spark.createDataFrame(
            [(1, "same"), (2, "same"), (3, "same\nsame")], ["doc_id", "text"]
        )
        out = remove_duplicated_lines(df, "doc_id", "text", min_doc_freq=2)
        got = {r["doc_id"]: r["text_clean"] for r in out.collect()}
        assert got == {1: "", 2: "", 3: ""}
        # repeated WITHIN one doc only does not count as cross-doc dup
        df2 = spark.createDataFrame([(1, "x\nx"), (2, "y")], ["doc_id", "text"])
        out2 = remove_duplicated_lines(df2, "doc_id", "text", min_doc_freq=2)
        got2 = {r["doc_id"]: r["text_clean"] for r in out2.collect()}
        assert got2[1] == "x\nx"

    def test_line_order_preserved_many_lines(self, spark):
        text = "\n".join(f"line {i}" for i in range(50))
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        out = remove_duplicated_lines(df, "doc_id", "text", min_doc_freq=2)
        assert out.collect()[0]["text_clean"] == text


class TestDecontaminate:
    def test_overlapping_docs_dropped(self, spark):
        train = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps"),
                (2, "completely different words here now"),
            ],
            ["doc_id", "text"],
        )
        bench = spark.createDataFrame(
            [(100, "quick brown fox appears again")], ["doc_id", "text"]
        )
        out = decontaminate(train, bench, "doc_id", "text", n=3)
        assert [r["doc_id"] for r in out.collect()] == [2]

    def test_min_hits_threshold(self, spark):
        train = spark.createDataFrame(
            [(1, "a b c x y z")], ["doc_id", "text"]
        )
        bench = spark.createDataFrame([(9, "a b c")], ["doc_id", "text"])
        # exactly one shared 3-gram: survives min_hits=2, dies at 1
        assert decontaminate(train, bench, "doc_id", "text", 3, min_hits=2).count() == 1
        assert decontaminate(train, bench, "doc_id", "text", 3, min_hits=1).count() == 0

    def test_short_docs_pass_through(self, spark):
        train = spark.createDataFrame([(1, "too short")], ["doc_id", "text"])
        bench = spark.createDataFrame([(9, "too short")], ["doc_id", "text"])
        # no 13-grams on either side -> nothing to match -> kept
        assert decontaminate(train, bench, "doc_id", "text", n=13).count() == 1


class TestFuzzyDedupCorpus:
    def test_near_dupes_collapse_to_min_id(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        df = spark.createDataFrame(
            [
                (10, base),
                (20, base + " lambda"),   # near-dup of 10
                (30, "entirely different text with no overlap at all ok"),
            ],
            ["doc_id", "text"],
        )
        kept = fuzzy_dedup_corpus(df, "doc_id", "text", threshold=0.5)
        assert sorted(r["doc_id"] for r in kept.collect()) == [10, 30]

    def test_no_dupes_keeps_everything(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
        kept = fuzzy_dedup_corpus(docs, "doc_id", "text", threshold=0.99)
        assert kept.count() == 30
        assert kept.columns == docs.columns


class TestRestoreDataset:
    def _publish_versions(self, spark, path):
        df1 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "p"])
        df2 = spark.createDataFrame([(3, "a")], ["k", "p"])
        df3 = spark.createDataFrame([(4, "b"), (5, "a")], ["k", "p"])
        publish_path(spark, path, df1, ["p"])
        publish_path(spark, path, df2, ["p"], mode="append")
        v3 = publish_path(spark, path, df3, ["p"], mode="append")
        return v3

    def test_restore_removes_later_versions(self, spark, tmp_dataset_dir):
        v3_files = self._publish_versions(spark, tmp_dataset_dir)
        assert fetch_path(spark, tmp_dataset_dir).count() == 5
        removed = restore_dataset(spark, tmp_dataset_dir, 2)
        assert sorted(removed) == sorted(v3_files)
        assert fetch_path(spark, tmp_dataset_dir).count() == 3
        assert [v["version"] for v in list_versions(spark, tmp_dataset_dir)] == [1, 2]
        # time travel within the kept prefix still works
        assert fetch_at(spark, tmp_dataset_dir, 1).count() == 2

    def test_dry_run_reports_without_deleting(self, spark, tmp_dataset_dir):
        v3_files = self._publish_versions(spark, tmp_dataset_dir)
        planned = restore_dataset(spark, tmp_dataset_dir, 2, dry_run=True)
        assert sorted(planned) == sorted(v3_files)
        assert fetch_path(spark, tmp_dataset_dir).count() == 5
        assert [v["version"] for v in list_versions(spark, tmp_dataset_dir)] == [1, 2, 3]

    def test_append_after_restore_continues_versioning(self, spark, tmp_dataset_dir):
        self._publish_versions(spark, tmp_dataset_dir)
        restore_dataset(spark, tmp_dataset_dir, 2)
        df = spark.createDataFrame([(9, "b")], ["k", "p"])
        publish_path(spark, tmp_dataset_dir, df, ["p"], mode="append")
        assert [v["version"] for v in list_versions(spark, tmp_dataset_dir)] == [1, 2, 3]
        assert fetch_path(spark, tmp_dataset_dir).count() == 4

    def test_bad_args_rejected(self, spark, tmp_dataset_dir):
        with pytest.raises(ValueError, match="no snapshot history"):
            restore_dataset(spark, tmp_dataset_dir, 1)
        self._publish_versions(spark, tmp_dataset_dir)
        with pytest.raises(ValueError, match="not in history"):
            restore_dataset(spark, tmp_dataset_dir, 7)


class TestRepartitionDataset:
    def test_layout_migration_and_pruning(self, spark, tmp_dataset_dir, sf_dir):
        import re

        from s3parq_spark.publish import repartition_dataset
        from s3parq_spark.metadata import read_sidecar

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        publish_path(spark, tmp_dataset_dir, docs, ["source"])
        n = docs.count()
        repartition_dataset(spark, tmp_dataset_dir, ["lang"])
        meta = read_sidecar(spark, tmp_dataset_dir)
        assert meta.partitions == ["lang"]
        out = fetch_path(
            spark, tmp_dataset_dir,
            filters=[{"partition": "lang", "comparison": "==", "values": ["en"]}],
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "lang" in m.group(1)
        assert fetch_path(spark, tmp_dataset_dir).count() == n
        # all input columns survive the migration (source is data now)
        assert set(out.columns) == set(docs.columns)

    def test_ledger_and_aggregate_survive_the_migration(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        """REGRESSION (r12): the layout rewrite's overwrite publish used
        to reset the idempotent-writer txn ledger (and would drop a
        continuous-aggregate definition) — a streaming sink's replay
        after a repartition re-applied committed batches."""
        from s3parq_spark.metadata import read_sidecar
        from s3parq_spark.publish import repartition_dataset

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        publish_path(spark, tmp_dataset_dir, docs.filter("doc_id % 2 = 0"),
                     ["source"])
        publish_path(spark, tmp_dataset_dir, docs.filter("doc_id % 2 = 1"),
                     ["source"], mode="append",
                     _txn={"app": "mirror", "version": 7})
        repartition_dataset(spark, tmp_dataset_dir, ["lang"])
        meta = read_sidecar(spark, tmp_dataset_dir)
        assert meta.txns == {"mirror": 7}
        # provable from history too (squash-base stamp on the v1
        # snapshot): a restore recompute keeps the claim
        assert meta.snapshots[-1].get("txns") == {"mirror": 7}

    def test_same_layout_and_missing_column_rejected(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        import pytest as _pytest

        from s3parq_spark.publish import repartition_dataset

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        publish_path(spark, tmp_dataset_dir, docs, ["source"])
        with _pytest.raises(ValueError, match="already partitioned"):
            repartition_dataset(spark, tmp_dataset_dir, ["source"])
        with _pytest.raises(ValueError, match="not in dataset"):
            repartition_dataset(spark, tmp_dataset_dir, ["nope"])


class TestDerivedPartitions:
    def test_transform_recorded_and_appends_rederive(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        from s3parq_spark.metadata import read_sidecar

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        publish_path(
            spark, tmp_dataset_dir, li.filter(F.col("l_linenumber") <= 2), [],
            derived_partitions={"ship_month": "date_format(l_shipdate, 'yyyy-MM')"},
        )
        meta = read_sidecar(spark, tmp_dataset_dir)
        assert meta.partitions == ["ship_month"]
        assert meta.derived_partitions == {
            "ship_month": "date_format(l_shipdate, 'yyyy-MM')"
        }
        # append without restating the transform: re-derived from sidecar
        publish_path(
            spark, tmp_dataset_dir, li.filter(F.col("l_linenumber") > 2), [],
            mode="append",
        )
        got = fetch_path(spark, tmp_dataset_dir)
        assert got.count() == li.count()
        assert "ship_month" in got.columns
        # derived value equals the transform applied to the source column
        bad = got.filter(
            F.col("ship_month") != F.date_format("l_shipdate", "yyyy-MM")
        ).count()
        assert bad == 0

    def test_conflicting_transform_and_collision_rejected(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(100)
        publish_path(
            spark, tmp_dataset_dir, li, [],
            derived_partitions={"ship_month": "date_format(l_shipdate, 'yyyy-MM')"},
        )
        with pytest.raises(ValueError, match="derived-partition mismatch"):
            publish_path(
                spark, tmp_dataset_dir, li, [], mode="append",
                derived_partitions={"ship_month": "year(l_shipdate)"},
            )
        with pytest.raises(ValueError, match="collides"):
            publish_path(
                spark, str(tmp_dataset_dir) + "2", li, [],
                derived_partitions={"l_quantity": "l_orderkey % 5"},
            )


class TestDeleteWhere:
    def test_partition_scoped_delete(self, spark, tmp_dataset_dir, sf_dir):
        import os

        from s3parq_spark.publish import delete_where
        from s3parq_spark import fs

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        publish_path(spark, tmp_dataset_dir, li, ["l_returnflag"])
        before_n_files = fs.list_files(spark, tmp_dataset_dir)
        n_a_small = li.filter("l_returnflag = 'A' AND l_quantity < 3").count()
        assert n_a_small > 0
        # delete only from the A partition: N and R partition files untouched
        n = delete_where(spark, tmp_dataset_dir, "l_returnflag = 'A' AND l_quantity < 3")
        assert n == n_a_small
        survivors = fetch_path(spark, tmp_dataset_dir)
        assert survivors.count() == li.count() - n_a_small
        assert survivors.filter("l_returnflag = 'A' AND l_quantity < 3").count() == 0
        untouched = [f for f in before_n_files if not f.startswith("l_returnflag=A")]
        after = set(fs.list_files(spark, tmp_dataset_dir))
        assert all(f in after for f in untouched), "untouched partitions rewritten"

    def test_emptied_partition_removed(self, spark, tmp_dataset_dir, sf_dir):
        import os

        from s3parq_spark.publish import delete_where

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        publish_path(spark, tmp_dataset_dir, li, ["l_returnflag"])
        n_r = li.filter("l_returnflag = 'R'").count()
        assert delete_where(spark, tmp_dataset_dir, "l_returnflag = 'R'") == n_r
        assert not os.path.isdir(
            os.path.join(tmp_dataset_dir, "l_returnflag=R")
        )
        assert fetch_path(spark, tmp_dataset_dir).filter(
            "l_returnflag = 'R'"
        ).count() == 0

    def test_null_predicate_rows_kept_and_dry_run(self, spark, tmp_dataset_dir):
        from s3parq_spark.publish import delete_where

        df = spark.createDataFrame(
            [(1, 10, "a"), (2, None, "a"), (3, 99, "b")], ["k", "v", "p"]
        )
        publish_path(spark, tmp_dataset_dir, df, ["p"])
        assert delete_where(spark, tmp_dataset_dir, "v < 50", dry_run=True) == 1
        assert fetch_path(spark, tmp_dataset_dir).count() == 3
        assert delete_where(spark, tmp_dataset_dir, "v < 50") == 1
        rows = {r["k"] for r in fetch_path(spark, tmp_dataset_dir).collect()}
        # NULL predicate row survives (SQL DELETE semantics)
        assert rows == {2, 3}


class TestStatsPlane:
    def test_collect_and_read_roundtrip(self, spark, tmp_dataset_dir, sf_dir):
        from s3parq_spark.stats import collect_stats, read_stats

        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
        assert read_stats(spark, tmp_dataset_dir) is None  # never analyzed
        got = collect_stats(spark, tmp_dataset_dir)
        assert got["row_count"] == nation.count()
        assert got["as_of_version"] == 1
        ks = got["columns"]["n_nationkey"]
        assert ks["min"] == "0" and ks["n_nulls"] == 0
        assert ks["n_distinct"] == nation.count()
        # partition column excluded by default
        assert "n_regionkey" not in got["columns"]
        # read path answers from the sidecar alone
        assert read_stats(spark, tmp_dataset_dir) == got

    def test_stats_survive_append_with_version_stamp(
        self, spark, tmp_dataset_dir
    ):
        from s3parq_spark.stats import collect_stats, read_stats
        from s3parq_spark.fetch import list_versions

        df1 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "p"])
        publish_path(spark, tmp_dataset_dir, df1, ["p"])
        collect_stats(spark, tmp_dataset_dir)
        publish_path(
            spark, tmp_dataset_dir,
            spark.createDataFrame([(9, "a")], ["k", "p"]), ["p"], mode="append",
        )
        s = read_stats(spark, tmp_dataset_dir)
        assert s is not None and s["as_of_version"] == 1  # stale, stamped
        assert [v["version"] for v in list_versions(spark, tmp_dataset_dir)] == [1, 2]
        s2 = collect_stats(spark, tmp_dataset_dir)  # re-ANALYZE refreshes
        assert s2["as_of_version"] == 2 and s2["row_count"] == 3

    def test_stats_survive_maintenance_rewrites(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        """r12: a layout-preserving compaction does not change content,
        so the ANALYZE record carries through the rewrite re-stamped to
        the fresh v1 head (it used to be silently discarded with the
        rebuilt sidecar). Repartition keeps the table/column sections
        (content-level) but drops the per-PARTITION section — it
        described the old layout's value combinations."""
        from s3parq_spark.publish import compact_dataset, repartition_dataset
        from s3parq_spark.stats import (
            collect_partition_stats,
            collect_stats,
            read_stats,
        )

        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
        full = collect_stats(spark, tmp_dataset_dir)
        collect_partition_stats(spark, tmp_dataset_dir)

        compact_dataset(spark, tmp_dataset_dir)
        s = read_stats(spark, tmp_dataset_dir)
        assert s is not None
        assert s["row_count"] == full["row_count"]
        assert s["columns"] == full["columns"]
        assert s["as_of_version"] == 1  # re-stamped to the rewritten head
        assert s["partitions_as_of_version"] == 1
        assert sum(p["n_rows"] for p in s["partitions"]) == nation.count()

        repartition_dataset(spark, tmp_dataset_dir, ["n_nationkey"])
        s2 = read_stats(spark, tmp_dataset_dir)
        assert s2 is not None and s2["columns"] == full["columns"]
        assert "partitions" not in s2  # old layout's combinations: dropped
        assert "partitions_as_of_version" not in s2

    def test_incremental_analyze_folds_the_delta(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        """r12: incremental ANALYZE scans only the appended delta and
        folds — row_count/n_nulls add, min/max compare typed, NDV folds
        through the stored HLL sketch (ndv_mode flips exact -> hll with
        a tight estimate). Non-append deltas and baseline mismatches
        fall back to the full scan, reported."""
        from s3parq_spark.publish import delete_where
        from s3parq_spark.stats import collect_stats, read_stats

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity", "l_returnflag"
        )
        publish_path(spark, tmp_dataset_dir, li.filter("l_orderkey < 400"),
                     [])
        full = collect_stats(spark, tmp_dataset_dir)
        assert full["last_analyze_mode"] == "full"
        assert full["columns"]["l_orderkey"]["ndv_mode"] == "exact"

        # noop at head: the stored record comes back unchanged
        again = collect_stats(spark, tmp_dataset_dir, incremental=True)
        assert again["as_of_version"] == full["as_of_version"]

        publish_path(
            spark, tmp_dataset_dir,
            li.filter("l_orderkey >= 400 and l_orderkey < 900"), [],
            mode="append",
        )
        inc = collect_stats(spark, tmp_dataset_dir, incremental=True)
        assert inc["last_analyze_mode"] == "incremental"
        # the fold must equal a fresh full scan on everything exact
        truth = {
            r: dict(v) for r, v in collect_stats(
                spark, tmp_dataset_dir
            )["columns"].items()
        }
        assert inc["row_count"] == li.filter("l_orderkey < 900").count()
        for c in ("l_orderkey", "l_quantity", "l_returnflag"):
            assert inc["columns"][c]["min"] == truth[c]["min"], c
            assert inc["columns"][c]["max"] == truth[c]["max"], c
            assert inc["columns"][c]["n_nulls"] == truth[c]["n_nulls"], c
            assert inc["columns"][c]["ndv_mode"] == "hll"
            # HLL at this cardinality: within 5% of the exact NDV
            exact = truth[c]["n_distinct"]
            assert abs(inc["columns"][c]["n_distinct"] - exact) <= max(
                2, exact * 0.05
            ), (c, inc["columns"][c]["n_distinct"], exact)

        # the full re-scan above re-stamped the record as exact again;
        # a tombstone in the range forces the next incremental to full
        publish_path(
            spark, tmp_dataset_dir,
            li.filter("l_orderkey >= 900 and l_orderkey < 1000"), [],
            mode="append",
        )
        delete_where(spark, tmp_dataset_dir, "l_orderkey < 10",
                     mode="merge-on-read")
        out = collect_stats(spark, tmp_dataset_dir, incremental=True)
        assert out["last_analyze_mode"] == "full"

    def test_incremental_analyze_survives_compaction(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        """The maintenance carry re-stamps as_of_version AND as_of_ts to
        the rewritten head, so an incremental ANALYZE after compaction
        still folds instead of rescanning the world."""
        from s3parq_spark.publish import compact_dataset
        from s3parq_spark.stats import collect_stats

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        publish_path(spark, tmp_dataset_dir, li.filter("l_orderkey < 500"),
                     [])
        collect_stats(spark, tmp_dataset_dir)
        compact_dataset(spark, tmp_dataset_dir)
        publish_path(
            spark, tmp_dataset_dir,
            li.filter("l_orderkey >= 500 and l_orderkey < 800"), [],
            mode="append",
        )
        inc = collect_stats(spark, tmp_dataset_dir, incremental=True)
        assert inc["last_analyze_mode"] == "incremental"
        assert inc["row_count"] == li.filter("l_orderkey < 800").count()
        truth = collect_stats(spark, tmp_dataset_dir)  # full rescan
        assert inc["columns"]["l_orderkey"]["max"] == (
            truth["columns"]["l_orderkey"]["max"]
        )

    def test_incremental_partition_stats_fold_touched_partitions_only(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        """r13: incremental partition-stats scans ONLY the appended
        delta — an append to one partition re-reads that append's
        files, untouched partitions' stored counts carry verbatim, and
        the merged record equals a full recollect."""
        from unittest.mock import patch

        from s3parq_spark import stats as stats_mod
        from s3parq_spark.stats import (
            collect_partition_stats,
            read_stats,
        )

        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
        full = collect_partition_stats(spark, tmp_dataset_dir)
        s = read_stats(spark, tmp_dataset_dir)
        assert s["last_partitions_analyze_mode"] == "full"
        assert s["partitions_as_of_ts"] is not None

        # noop at head: stored record back, no scan needed
        assert collect_partition_stats(
            spark, tmp_dataset_dir, incremental=True
        ) == full

        # one appended delta hitting region 0 plus a brand-new combo
        extra = nation.filter("n_regionkey = 0").limit(3).selectExpr(
            "n_nationkey + 100 as n_nationkey", "n_name", "n_regionkey",
        )
        novel = nation.limit(2).selectExpr(
            "n_nationkey + 200 as n_nationkey", "n_name",
            "cast(9 as int) as n_regionkey",
        )
        publish_path(
            spark, tmp_dataset_dir, extra.unionByName(novel),
            ["n_regionkey"], mode="append",
        )
        # the fold must read the DELTA, never the full dataset
        with patch.object(
            stats_mod, "_fold_partition_stats_forward",
            wraps=stats_mod._fold_partition_stats_forward,
        ) as fold:
            inc = collect_partition_stats(
                spark, tmp_dataset_dir, incremental=True
            )
            assert fold.called
        assert read_stats(spark, tmp_dataset_dir)[
            "last_partitions_analyze_mode"] == "incremental"
        # ≡ a full recollect of the final corpus
        truth = collect_partition_stats(spark, tmp_dataset_dir)
        assert inc == truth
        by_region = {r["values"]["n_regionkey"]: r["n_rows"] for r in inc}
        assert by_region["9"] == 2  # the new combo appeared
        assert sum(by_region.values()) == nation.count() + 5

    def test_incremental_partition_stats_bails_honestly(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        """Non-foldable situations fall back to the full recollect:
        a merge-on-read tombstone in the range, and a partition-spec
        evolution since the record."""
        from s3parq_spark.publish import delete_where, repartition_dataset
        from s3parq_spark.stats import collect_partition_stats, read_stats

        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
        collect_partition_stats(spark, tmp_dataset_dir)
        delete_where(spark, tmp_dataset_dir, "n_nationkey = 3",
                     mode="merge-on-read")
        inc = collect_partition_stats(
            spark, tmp_dataset_dir, incremental=True
        )
        assert read_stats(spark, tmp_dataset_dir)[
            "last_partitions_analyze_mode"] == "full"
        assert sum(r["n_rows"] for r in inc) == nation.count() - 1

        # spec evolution: old combos describe a different layout
        repartition_dataset(spark, tmp_dataset_dir, ["n_nationkey"])
        # (repartition drops the partition section wholesale; recollect
        # under the new layout, then append and fold)
        collect_partition_stats(spark, tmp_dataset_dir)
        publish_path(
            spark, tmp_dataset_dir,
            nation.limit(1).selectExpr(
                "n_nationkey + 500 as n_nationkey", "n_name",
                "n_regionkey",
            ),
            ["n_nationkey"], mode="append",
        )
        inc2 = collect_partition_stats(
            spark, tmp_dataset_dir, incremental=True
        )
        assert read_stats(spark, tmp_dataset_dir)[
            "last_partitions_analyze_mode"] == "incremental"
        assert sum(r["n_rows"] for r in inc2) == nation.count()

    def test_incremental_partition_stats_survive_compaction(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        """The maintenance carry restamps partitions_as_of_version AND
        partitions_as_of_ts when the record was current, so the fold
        keeps working across a compaction instead of rescanning."""
        from s3parq_spark.publish import compact_dataset
        from s3parq_spark.stats import collect_partition_stats, read_stats

        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
        collect_partition_stats(spark, tmp_dataset_dir)
        compact_dataset(spark, tmp_dataset_dir)
        publish_path(
            spark, tmp_dataset_dir,
            nation.limit(2).selectExpr(
                "n_nationkey + 70 as n_nationkey", "n_name", "n_regionkey",
            ),
            ["n_regionkey"], mode="append",
        )
        inc = collect_partition_stats(
            spark, tmp_dataset_dir, incremental=True
        )
        s = read_stats(spark, tmp_dataset_dir)
        assert s["last_partitions_analyze_mode"] == "incremental"
        assert sum(r["n_rows"] for r in inc) == nation.count() + 2

    def test_stale_stats_lose_stamp_through_compaction(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        """r13 (advice): a record that was STALE at compaction time
        (appends landed after the ANALYZE) must NOT be re-stamped to
        the rewritten v1 head — the rewrite squashes the un-analyzed
        delta into the new baseline, so a re-stamp manufactures a false
        identity the fold's guards can never catch and the delta is
        permanently lost from row_count/min/max/NDV. The carry keeps
        the record but drops the as_of fields; the next incremental
        ANALYZE bails to an honest full scan and self-corrects."""
        from s3parq_spark.publish import compact_dataset
        from s3parq_spark.stats import collect_stats, read_stats

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        publish_path(spark, tmp_dataset_dir, li.filter("l_orderkey < 300"),
                     [])
        collect_stats(spark, tmp_dataset_dir)
        # two appends AFTER the ANALYZE: the record is now stale
        publish_path(
            spark, tmp_dataset_dir,
            li.filter("l_orderkey >= 300 and l_orderkey < 600"), [],
            mode="append",
        )
        publish_path(
            spark, tmp_dataset_dir,
            li.filter("l_orderkey >= 600 and l_orderkey < 900"), [],
            mode="append",
        )
        compact_dataset(spark, tmp_dataset_dir)
        s = read_stats(spark, tmp_dataset_dir)
        assert s is not None and "columns" in s  # record carried...
        assert "as_of_version" not in s  # ...but visibly stale
        assert "as_of_ts" not in s
        publish_path(
            spark, tmp_dataset_dir,
            li.filter("l_orderkey >= 900 and l_orderkey < 1000"), [],
            mode="append",
        )
        out = collect_stats(spark, tmp_dataset_dir, incremental=True)
        assert out["last_analyze_mode"] == "full"  # fold refused, honest
        assert out["row_count"] == li.filter("l_orderkey < 1000").count()

    def test_stale_partition_stats_lose_stamp_through_compaction(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        """Same rule for the per-partition section: a stale
        partitions_as_of_version must not be re-stamped to the
        rewritten head (the un-analyzed partitions' rows would read as
        analyzed)."""
        from s3parq_spark.publish import compact_dataset
        from s3parq_spark.stats import collect_partition_stats, read_stats

        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        publish_path(
            spark, tmp_dataset_dir,
            nation.filter("n_regionkey < 3"), ["n_regionkey"],
        )
        collect_partition_stats(spark, tmp_dataset_dir)
        publish_path(
            spark, tmp_dataset_dir,
            nation.filter("n_regionkey >= 3"), ["n_regionkey"],
            mode="append",
        )
        compact_dataset(spark, tmp_dataset_dir)
        s = read_stats(spark, tmp_dataset_dir)
        assert s is not None and "partitions" in s  # record carried
        assert "partitions_as_of_version" not in s  # stamp dropped

    def test_stale_stats_lose_stamp_through_repartition(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        """repartition_dataset shares the carry; a stale record loses
        its stamp through the layout migration too."""
        from s3parq_spark.publish import repartition_dataset
        from s3parq_spark.stats import collect_stats, read_stats

        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        publish_path(
            spark, tmp_dataset_dir,
            nation.filter("n_nationkey < 10"), ["n_regionkey"],
        )
        collect_stats(spark, tmp_dataset_dir)
        publish_path(
            spark, tmp_dataset_dir,
            nation.filter("n_nationkey >= 10"), ["n_regionkey"],
            mode="append",
        )
        repartition_dataset(spark, tmp_dataset_dir, ["n_nationkey"])
        s = read_stats(spark, tmp_dataset_dir)
        assert s is not None and "columns" in s
        assert "as_of_version" not in s and "as_of_ts" not in s

    def test_restore_makes_newer_stats_visibly_stale(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        """A restore rewinds the head BELOW the ANALYZE stamp: the
        record must read as stale (its as_of_version is no longer in
        history) and the incremental fold must bail to an honest full
        scan — never fold from a baseline describing rolled-back rows.
        The restore+re-append lookalike (same version NUMBER, different
        snapshot) is caught by the as_of_ts identity."""
        import time as _time

        from s3parq_spark.fetch import list_versions
        from s3parq_spark.publish import restore_dataset
        from s3parq_spark.stats import collect_stats, read_stats

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        publish_path(spark, tmp_dataset_dir, li.filter("l_orderkey < 300"),
                     [])
        publish_path(
            spark, tmp_dataset_dir,
            li.filter("l_orderkey >= 300 and l_orderkey < 600"), [],
            mode="append",
        )
        s2 = collect_stats(spark, tmp_dataset_dir)  # stamped at v2
        assert s2["as_of_version"] == 2
        restore_dataset(spark, tmp_dataset_dir, 1)
        s = read_stats(spark, tmp_dataset_dir)
        # record survives but its stamp is outside the retained history
        assert s["as_of_version"] not in [
            v["version"] for v in list_versions(spark, tmp_dataset_dir)
        ]
        # re-append: the head version NUMBER is 2 again, but a different
        # snapshot — the ts identity must still refuse the fold
        _time.sleep(0.05)
        publish_path(
            spark, tmp_dataset_dir,
            li.filter("l_orderkey >= 600 and l_orderkey < 900"), [],
            mode="append",
        )
        out = collect_stats(spark, tmp_dataset_dir, incremental=True)
        assert out["last_analyze_mode"] == "full"
        assert out["row_count"] == (
            li.filter("l_orderkey < 300").count()
            + li.filter("l_orderkey >= 600 and l_orderkey < 900").count()
        )

    def test_bad_columns_rejected(self, spark, tmp_dataset_dir):
        from s3parq_spark.stats import collect_stats

        df = spark.createDataFrame([(1, "a")], ["k", "p"])
        publish_path(spark, tmp_dataset_dir, df, ["p"])
        import pytest as _pytest

        with _pytest.raises(ValueError, match="not in dataset"):
            collect_stats(spark, tmp_dataset_dir, columns=["nope"])

    def test_partition_stats_spill_and_fold(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        """r14 (verdict #7): past the combo threshold the partitions
        section spills to a columnar manifest and the sidecar keeps an
        O(1) pointer — the sidecar must stay flat however many value
        combinations the layout has. read_partition_stats lazy-loads;
        the incremental fold still scans only the delta and re-spills;
        vacuum GCs the superseded manifest but never the live one."""
        import json
        import os

        from s3parq_spark.stats import (
            collect_partition_stats,
            read_partition_stats,
            read_stats,
        )

        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
        full = collect_partition_stats(
            spark, tmp_dataset_dir, spill_threshold=2
        )
        side = json.load(
            open(os.path.join(tmp_dataset_dir, "_s3parq_metadata.json"))
        )
        assert "partitions" not in side["stats"]  # sidecar stays flat
        ptr = side["stats"]["partitions_manifest"]
        assert ptr["n"] == len(full) and ptr["path"].startswith(
            "_s3parq_stats/"
        )
        assert os.path.exists(os.path.join(tmp_dataset_dir, ptr["path"]))
        # lazy-load round-trips the exact record
        assert read_partition_stats(spark, tmp_dataset_dir) == full

        # the fold works against the spilled representation: delta-only
        # scan, merged result re-spills to a NEW immutable manifest
        extra = nation.limit(2).selectExpr(
            "n_nationkey + 300 as n_nationkey", "n_name",
            "cast(9 as int) as n_regionkey",
        )
        publish_path(
            spark, tmp_dataset_dir, extra, ["n_regionkey"], mode="append",
        )
        inc = collect_partition_stats(
            spark, tmp_dataset_dir, incremental=True, spill_threshold=2
        )
        s = read_stats(spark, tmp_dataset_dir)
        assert s["last_partitions_analyze_mode"] == "incremental"
        ptr2 = s["partitions_manifest"]
        assert ptr2["path"] != ptr["path"]
        by_region = {r["values"]["n_regionkey"]: r["n_rows"] for r in inc}
        assert by_region["9"] == 2
        assert sum(by_region.values()) == nation.count() + 2
        assert read_partition_stats(spark, tmp_dataset_dir) == inc

        # vacuum: the superseded manifest is an orphan, the live one is
        # pointer-referenced and survives
        from s3parq_spark.publish import vacuum_dataset

        removed = vacuum_dataset(
            spark, tmp_dataset_dir, retention_hours=0.0
        )
        assert ptr["path"] in removed
        assert os.path.exists(os.path.join(tmp_dataset_dir, ptr2["path"]))
        assert read_partition_stats(spark, tmp_dataset_dir) == inc

    def test_spilled_partition_stats_survive_compaction(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        """r14: a spilled partitions section lives INSIDE the dataset dir
        the compaction rewrite replaces — the carry must re-materialize
        the manifest into the rewrite target (a dangling pointer would
        silently lose the record), with the usual current-at-rewrite
        restamp rules."""
        import os

        from s3parq_spark.publish import compact_dataset
        from s3parq_spark.stats import (
            collect_partition_stats,
            read_partition_stats,
            read_stats,
        )

        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
        before = collect_partition_stats(
            spark, tmp_dataset_dir, spill_threshold=2
        )
        compact_dataset(spark, tmp_dataset_dir)
        s = read_stats(spark, tmp_dataset_dir)
        ptr = s["partitions_manifest"]
        assert os.path.exists(os.path.join(tmp_dataset_dir, ptr["path"]))
        assert read_partition_stats(spark, tmp_dataset_dir) == before
        # the record was current at the rewrite: identity restamped to v1
        assert s["partitions_as_of_version"] == 1


class TestUpdateWhere:
    def test_partition_scoped_update_preupdate_semantics(
        self, spark, tmp_dataset_dir, sf_dir
    ):
        from s3parq_spark.publish import update_where
        from s3parq_spark import fs

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        publish_path(spark, tmp_dataset_dir, li, ["l_returnflag"])
        before_files = fs.list_files(spark, tmp_dataset_dir)
        pred = "l_returnflag = 'A' AND l_quantity < 3"
        n_exp = li.filter(pred).count()
        assert n_exp > 0
        n = update_where(
            spark, tmp_dataset_dir,
            {"l_quantity": "l_quantity * 10", "l_tax": "l_quantity"},
            pred,
        )
        assert n == n_exp
        got = fetch_path(spark, tmp_dataset_dir)
        assert got.count() == li.count()  # UPDATE never changes row count
        hit = got.filter("l_returnflag = 'A' AND l_tax = 1.0 AND l_quantity = 10.0")
        # l_tax was set from the PRE-update l_quantity (simultaneous assign)
        assert hit.count() == li.filter(pred + " AND l_quantity = 1").count()
        # untouched partitions' files not rewritten
        untouched = [f for f in before_files if not f.startswith("l_returnflag=A")]
        after = set(fs.list_files(spark, tmp_dataset_dir))
        assert all(f in after for f in untouched)

    def test_null_predicate_rows_untouched_and_dry_run(
        self, spark, tmp_dataset_dir
    ):
        from s3parq_spark.publish import update_where

        df = spark.createDataFrame(
            [(1, 10, "a"), (2, None, "a"), (3, 99, "b")], ["k", "v", "p"]
        )
        publish_path(spark, tmp_dataset_dir, df, ["p"])
        assert update_where(
            spark, tmp_dataset_dir, {"v": "0"}, "v < 50", dry_run=True
        ) == 1
        assert update_where(spark, tmp_dataset_dir, {"v": "0"}, "v < 50") == 1
        got = {r["k"]: r["v"] for r in fetch_path(spark, tmp_dataset_dir).collect()}
        assert got == {1: 0, 2: None, 3: 99}

    def test_partition_and_unknown_columns_rejected(self, spark, tmp_dataset_dir):
        from s3parq_spark.publish import update_where

        df = spark.createDataFrame([(1, "a")], ["k", "p"])
        publish_path(spark, tmp_dataset_dir, df, ["p"])
        with pytest.raises(ValueError, match="partition columns"):
            update_where(spark, tmp_dataset_dir, {"p": "'b'"}, "k = 1")
        with pytest.raises(ValueError, match="not in dataset"):
            update_where(spark, tmp_dataset_dir, {"zz": "1"}, "k = 1")


class TestPublishWithExpectations:
    RULES = [
        {"name": "v_positive", "constraint": "v > 0"},
        {"name": "p_known", "constraint": "p IN ('a', 'b')"},
    ]

    def test_split_tagging_and_null_passes(self, spark, tmp_dataset_dir):
        from s3parq_spark.publish import publish_with_expectations

        df = spark.createDataFrame(
            [(1, 5, "a"), (2, -1, "a"), (3, None, "b"), (4, -2, "z")],
            ["k", "v", "p"],
        )
        main = tmp_dataset_dir + "/main"
        quar = tmp_dataset_dir + "/quar"
        counts = publish_with_expectations(
            spark, main, df, ["p"], self.RULES, quarantine_path=quar
        )
        # NULL v passes CHECK (SQL semantics): rows 1 and 3 are clean
        assert counts == {"published": 2, "quarantined": 2}
        good = {r["k"] for r in fetch_path(spark, main).collect()}
        assert good == {1, 3}
        bad = {r["k"]: r["violated"] for r in fetch_path(spark, quar).collect()}
        assert bad == {2: "v_positive", 4: "v_positive,p_known"}

    def test_all_or_nothing_without_quarantine(self, spark, tmp_dataset_dir):
        import os

        from s3parq_spark.publish import publish_with_expectations

        df = spark.createDataFrame([(1, -5, "a")], ["k", "v", "p"])
        with pytest.raises(ValueError, match="violate"):
            publish_with_expectations(
                spark, tmp_dataset_dir + "/m", df, ["p"], self.RULES
            )
        assert not os.path.exists(tmp_dataset_dir + "/m")
        # a clean batch publishes fine without a quarantine path
        clean = spark.createDataFrame([(1, 5, "a")], ["k", "v", "p"])
        counts = publish_with_expectations(
            spark, tmp_dataset_dir + "/m", clean, ["p"], self.RULES
        )
        assert counts == {"published": 1, "quarantined": 0}

    def test_bad_rules_rejected(self, spark, tmp_dataset_dir):
        from s3parq_spark.publish import publish_with_expectations

        df = spark.createDataFrame([(1, 5, "a")], ["k", "v", "p"])
        with pytest.raises(ValueError, match="non-empty"):
            publish_with_expectations(spark, tmp_dataset_dir, df, ["p"], [])
        with pytest.raises(ValueError, match="name"):
            publish_with_expectations(
                spark, tmp_dataset_dir, df, ["p"], [{"constraint": "v > 0"}]
            )


class TestOptimisticConcurrency:
    def test_cas_publish_success_and_conflict(self, spark, tmp_dataset_dir):
        from s3parq_spark.fetch import list_versions
        from s3parq_spark.publish import ConcurrentWriteError

        df = spark.createDataFrame([(1, "a")], ["k", "p"])
        # first publish onto an empty dataset: head is 0
        publish_path(spark, tmp_dataset_dir, df, ["p"], expected_version=0)
        assert [v["version"] for v in list_versions(spark, tmp_dataset_dir)] == [1]
        # append expecting v1 succeeds
        publish_path(
            spark, tmp_dataset_dir, df, ["p"], mode="append", expected_version=1
        )
        # appending again with a STALE expectation fails before writing
        from s3parq_spark import fs

        before = fs.list_files(spark, tmp_dataset_dir)
        with pytest.raises(ConcurrentWriteError, match="head is 2"):
            publish_path(
                spark, tmp_dataset_dir, df, ["p"], mode="append",
                expected_version=1,
            )
        assert fs.list_files(spark, tmp_dataset_dir) == before, (
            "conflicting publish wrote files"
        )
        assert [v["version"] for v in list_versions(spark, tmp_dataset_dir)] == [1, 2]

    def test_unversioned_publish_unaffected(self, spark, tmp_dataset_dir):
        df = spark.createDataFrame([(1, "a")], ["k", "p"])
        publish_path(spark, tmp_dataset_dir, df, ["p"])
        publish_path(spark, tmp_dataset_dir, df, ["p"], mode="append")
        assert fetch_path(spark, tmp_dataset_dir).count() == 2


class TestFuzzyDedupAtRest:
    def test_incremental_equals_batch_semantics(self, spark, sf_dir, tmp_dataset_dir):
        from s3parq_spark.operators.dedup import (
            build_minhash_index,
            fuzzy_dedup_incremental,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        corpus = docs.filter(F.col("doc_id") < 100)
        idx = build_minhash_index(corpus, "doc_id", "text")
        row = idx.first()
        assert len(row["signature"]) == 64 and len(row["shingle_hashes"]) > 0
        # index round-trips through the engine's array-typed publish
        publish_path(spark, tmp_dataset_dir, idx, [])
        stored = fetch_path(spark, tmp_dataset_dir)

        planted = corpus.limit(3).select(
            (F.col("doc_id") + 5000).alias("doc_id"),
            F.concat("text", F.lit(" zz")).alias("text"),
        )
        new = docs.filter(
            (F.col("doc_id") >= 100) & (F.col("doc_id") < 150)
        ).unionByName(planted)
        kept = fuzzy_dedup_incremental(new, stored, "doc_id", "text")
        kept_ids = {r["doc_id"] for r in kept.collect()}
        # every planted near-copy is caught
        assert not any(i >= 5000 for i in kept_ids)
        # an unrelated doc survives
        assert len(kept_ids) > 0
        # disjoint corpora: nothing is dropped
        clean = fuzzy_dedup_incremental(
            docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 410)),
            stored, "doc_id", "text",
        )
        nd = docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 410))
        # allow natural near-dups across halves; clean must be a subset
        assert clean.count() <= nd.count()

class TestDsirImportanceWeights:
    def _docs(self, spark):
        rows = [
            # target distribution: "spark sql" flavored
            (1, "spark sql engine spark sql", True),
            (2, "spark sql query engine", True),
            (3, "spark engine sql plans", True),
            # raw pool: one target-like, one off-distribution
            (10, "spark sql engine at scale", False),
            (11, "cats and dogs and birds", False),
        ]
        return spark.createDataFrame(rows, ["doc_id", "text", "is_t"])

    def test_target_like_raw_doc_ranks_first(self, spark):
        from s3parq_spark.operators.sampling import dsir_importance_weights

        out = dsir_importance_weights(
            self._docs(spark), "doc_id", "text", "is_t"
        )
        rows = {r["doc_id"]: r for r in out.collect()}
        assert set(rows) == {10, 11}  # target docs are never scored
        assert rows[10]["logw"] > rows[11]["logw"]
        # unigrams + bigrams: 5 tokens -> 9 n-grams
        assert rows[10]["n_ngrams"] == 9

    def test_deterministic_under_repartition(self, spark):
        from s3parq_spark.operators.sampling import dsir_importance_weights

        docs = self._docs(spark)
        a = dsir_importance_weights(docs, "doc_id", "text", "is_t")
        b = dsir_importance_weights(
            docs.repartition(5), "doc_id", "text", "is_t"
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestQuantizedRescoreTopk:
    def test_rescore_full_width_equals_exact_topk(self, spark):
        from s3parq_spark.operators.similarity import (
            batch_cosine_topk, quantized_rescore_topk,
        )

        rows = [
            (i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)])
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        q = df.filter(F.col("vec_id") < 3)
        # rescore >= corpus: stage 2 sees everything -> must equal exact
        two = quantized_rescore_topk(
            df, "vec_id", "embedding", q, k=5, rescore=100
        ).select("query_id", "vec_id", F.round("cosine", 9).alias("c"))
        exact = batch_cosine_topk(df, "vec_id", "embedding", q, k=5).select(
            "query_id", "vec_id", F.round("cosine", 9).alias("c")
        )
        assert sorted(map(tuple, two.collect())) == sorted(
            map(tuple, exact.collect())
        )

    def test_candidate_count_bounded_by_rescore(self, spark):
        from s3parq_spark.operators.similarity import quantized_rescore_topk

        rows = [
            (i, [float((i * 5 + j) % 7) for j in range(6)]) for i in range(30)
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        q = df.filter(F.col("vec_id") == 0)
        out = quantized_rescore_topk(
            df, "vec_id", "embedding", q, k=50, rescore=4
        )
        # k > rescore: output is capped by the candidate stage
        assert out.count() == 4


class TestExpireSnapshots:
    def _publish_n(self, spark, path, n):
        for i in range(n):
            df = spark.createDataFrame([(i * 10 + 1, "a"), (i * 10 + 2, "b")], ["k", "p"])
            publish_path(spark, path, df, ["p"],
                         mode="append" if i else "error")

    def test_squash_preserves_data_and_head_history(self, spark, tmp_dataset_dir):
        from s3parq_spark.fetch import get_all_files_list
        from s3parq_spark.publish import expire_snapshots

        self._publish_n(spark, tmp_dataset_dir, 5)
        files_before = sorted(get_all_files_list(tmp_dataset_dir, spark=spark))
        rows_before = sorted(
            map(tuple, fetch_path(spark, tmp_dataset_dir).collect())
        )
        expired = expire_snapshots(spark, tmp_dataset_dir, keep_last=2)
        assert expired == [1, 2]
        # metadata-only: same files, same rows, manifest plane intact
        assert sorted(get_all_files_list(tmp_dataset_dir, spark=spark)) == files_before
        assert sorted(
            map(tuple, fetch_path(spark, tmp_dataset_dir).collect())
        ) == rows_before
        assert [v["version"] for v in list_versions(spark, tmp_dataset_dir)] == [3, 4, 5]
        # base version reads exactly; expired versions are loudly gone
        assert fetch_at(spark, tmp_dataset_dir, 3).count() == 6
        with pytest.raises(ValueError, match="not in"):
            fetch_at(spark, tmp_dataset_dir, 2)

    def test_noop_when_history_within_keep(self, spark, tmp_dataset_dir):
        from s3parq_spark.publish import expire_snapshots

        self._publish_n(spark, tmp_dataset_dir, 3)
        assert expire_snapshots(spark, tmp_dataset_dir, keep_last=3) == []
        # cut==1 squashes nothing either: base-to-be has nothing below it
        assert expire_snapshots(spark, tmp_dataset_dir, keep_last=2) == []
        assert [v["version"] for v in list_versions(spark, tmp_dataset_dir)] == [1, 2, 3]

    def test_dry_run_and_appends_continue(self, spark, tmp_dataset_dir):
        from s3parq_spark.publish import expire_snapshots

        self._publish_n(spark, tmp_dataset_dir, 4)
        # the newest squashed snapshot (v3) survives as the base entry
        assert expire_snapshots(spark, tmp_dataset_dir, keep_last=1, dry_run=True) == [1, 2]
        assert [v["version"] for v in list_versions(spark, tmp_dataset_dir)] == [1, 2, 3, 4]
        expire_snapshots(spark, tmp_dataset_dir, keep_last=1)
        assert [v["version"] for v in list_versions(spark, tmp_dataset_dir)] == [3, 4]
        df = spark.createDataFrame([(99, "a")], ["k", "p"])
        publish_path(spark, tmp_dataset_dir, df, ["p"], mode="append")
        assert [v["version"] for v in list_versions(spark, tmp_dataset_dir)] == [3, 4, 5]
        assert fetch_path(spark, tmp_dataset_dir).count() == 9

    def test_bad_args(self, spark, tmp_dataset_dir):
        from s3parq_spark.publish import expire_snapshots

        with pytest.raises(ValueError, match="no snapshot history"):
            expire_snapshots(spark, tmp_dataset_dir)
        self._publish_n(spark, tmp_dataset_dir, 2)
        with pytest.raises(ValueError, match="keep_last"):
            expire_snapshots(spark, tmp_dataset_dir, keep_last=0)


class TestRemoveDuplicatedSpans:
    def test_shared_kgram_removed_both_sides(self, spark):
        from s3parq_spark.operators.text import remove_duplicated_spans

        rows = [
            (1, "a b c d e f g h"),
            (2, "x y a b c d e z"),
            (3, "p q r s t"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in
               remove_duplicated_spans(df, "doc_id", "text", k=5).collect()}
        # "a b c d e" occurs in docs 1 and 2: its 5 tokens go on both sides
        assert out[1]["text_clean"] == "f g h" and out[1]["n_removed"] == 5
        assert out[2]["text_clean"] == "x y z" and out[2]["n_removed"] == 5
        # no duplicated gram touches doc 3; shorter-than-k docs pass intact
        assert out[3]["text_clean"] == "p q r s t" and out[3]["n_removed"] == 0

    def test_within_doc_repeat_and_overlap_coverage(self, spark):
        from s3parq_spark.operators.text import remove_duplicated_spans

        # "a b c" repeats INSIDE one doc; k=3 -> both occurrences removed,
        # and the overlapping middle tokens are not double-counted
        df = spark.createDataFrame([(1, "a b c q a b c")], ["doc_id", "text"])
        r = remove_duplicated_spans(df, "doc_id", "text", k=3).collect()[0]
        assert r["text_clean"] == "q"
        assert r["n_tokens"] == 7 and r["n_removed"] == 6

    def test_fully_duplicated_doc_empties(self, spark):
        from s3parq_spark.operators.text import remove_duplicated_spans

        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c d")], ["doc_id", "text"]
        )
        out = remove_duplicated_spans(df, "doc_id", "text", k=4).collect()
        assert all(r["text_clean"] == "" and r["n_removed"] == 4 for r in out)
        assert {r["doc_id"] for r in out} == {1, 2}

    def test_null_text_doc_passes_through(self, spark):
        # NULL text must NOT drop the document from the output (the
        # one-row-per-input-document contract, r5 ADVICE): it behaves
        # like an empty document
        from s3parq_spark.operators.text import remove_duplicated_spans

        df = spark.createDataFrame(
            [(1, "a b c d"), (2, None), (3, "a b c d")],
            "doc_id int, text string",
        )
        out = {r["doc_id"]: r for r in
               remove_duplicated_spans(df, "doc_id", "text", k=4).collect()}
        assert sorted(out) == [1, 2, 3]
        assert out[2]["text_clean"] == "" and out[2]["n_removed"] == 0
        assert out[1]["text_clean"] == "" and out[1]["n_removed"] == 4


class TestCorpusOverlap:
    def test_exact_jaccard_and_estimate(self, spark):
        from s3parq_spark.operators.dedup import corpus_overlap

        rows = [
            ("A", "w1 w2 w3 w4 w5"),       # shingles: 3
            ("B", "w1 w2 w3 w4 w5"),       # identical corpus -> J = 1
            ("C", "x1 x2 x3 x4 x5"),       # disjoint -> J = 0
        ]
        df = spark.createDataFrame(rows, ["source", "text"])
        out = {(r["src_a"], r["src_b"]): r for r in
               corpus_overlap(df, "source", "text").collect()}
        assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
        ab = out[("A", "B")]
        assert ab["exact_jaccard"] == 1.0 and ab["est_jaccard"] == 1.0
        assert ab["n_a"] == ab["n_b"] == ab["n_common"] == 3
        # zero-overlap pairs still reported
        assert out[("A", "C")]["exact_jaccard"] == 0.0
        assert out[("A", "C")]["n_common"] == 0

    def test_partial_overlap_value(self, spark):
        from s3parq_spark.operators.dedup import corpus_overlap

        # A: shingles {a b c, b c d}; B: {b c d, c d e} -> J = 1/3
        df = spark.createDataFrame(
            [("A", "a b c d"), ("B", "b c d e")], ["source", "text"]
        )
        r = corpus_overlap(df, "source", "text").collect()[0]
        assert r["n_common"] == 1 and abs(r["exact_jaccard"] - 1 / 3) < 1e-12
        assert 0.0 <= r["est_jaccard"] <= 1.0


class TestContainmentPairs:
    def test_subdocument_found_where_jaccard_misses(self, spark):
        from s3parq_spark.operators.dedup import (
            containment_pairs, ngram_jaccard_pairs,
        )

        rows = [
            (1, "a b c d e"),                                  # 3 shingles
            (2, "z z a b c d e y y w w q r s t u v k m"),      # superset
            (3, "p p2 q2 r2 s2"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = containment_pairs(df, "doc_id", "text", n=3, threshold=0.9)
        r = got.collect()
        assert len(r) == 1
        assert (r[0]["doc_small"], r[0]["doc_big"]) == (1, 2)
        assert r[0]["containment"] == 1.0 and r[0]["n_common"] == 3
        # symmetric Jaccard misses the same pair at any usable threshold
        assert ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.8
        ).count() == 0

    def test_equal_size_pairs_orient_by_id(self, spark):
        from s3parq_spark.operators.dedup import containment_pairs

        df = spark.createDataFrame(
            [(7, "a b c d"), (4, "a b c d")], ["doc_id", "text"]
        )
        r = containment_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
        assert len(r) == 1
        assert (r[0]["doc_small"], r[0]["doc_big"]) == (4, 7)

    def test_below_threshold_excluded(self, spark):
        from s3parq_spark.operators.dedup import containment_pairs

        # 4 shingles in small doc, 2 shared -> containment 0.5
        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d x1 x2 x3 x4 x5 x6")],
            ["doc_id", "text"],
        )
        out = containment_pairs(df, "doc_id", "text", n=3, threshold=0.6)
        assert out.count() == 0
        out2 = containment_pairs(df, "doc_id", "text", n=3, threshold=0.5)
        assert out2.collect()[0]["containment"] == 0.5

    def test_shingleless_group_still_reported(self, spark):
        from s3parq_spark.operators.dedup import corpus_overlap

        # source C's only doc is shorter than the shingle width: it has no
        # shingles, but the report must still carry its pairs as zero rows
        df = spark.createDataFrame(
            [("A", "a b c d"), ("B", "a b c d"), ("C", "xy")],
            ["source", "text"],
        )
        out = {(r["src_a"], r["src_b"]): r for r in
               corpus_overlap(df, "source", "text").collect()}
        assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
        ac = out[("A", "C")]
        assert ac["n_b"] == 0 and ac["n_common"] == 0
        assert ac["exact_jaccard"] == 0.0 and ac["est_jaccard"] == 0.0


class TestExpireSnapshotsConcurrency:
    def test_concurrent_history_change_aborts_squash(self, spark, tmp_dataset_dir, monkeypatch):
        from s3parq_spark import metadata as md
        from s3parq_spark.publish import ConcurrentWriteError, expire_snapshots, publish_path

        for i in range(4):
            df = spark.createDataFrame([(i, "a")], ["k", "p"])
            publish_path(spark, tmp_dataset_dir, df, ["p"],
                         mode="append" if i else "error")

        real_read = md.read_sidecar
        calls = {"n": 0}

        def racy_read(spark_, path_):
            calls["n"] += 1
            if calls["n"] == 2:
                # a publish lands between the squash's first read and its
                # pre-write re-check: commit it BEFORE serving the re-read
                monkeypatch.undo()
                df = spark.createDataFrame([(99, "a")], ["k", "p"])
                publish_path(spark, tmp_dataset_dir, df, ["p"], mode="append")
            return real_read(spark_, path_)

        monkeypatch.setattr(md, "read_sidecar", racy_read)
        with pytest.raises(ConcurrentWriteError, match="changed during"):
            expire_snapshots(spark, tmp_dataset_dir, keep_last=1)
        # nothing was lost: all five snapshots (4 + the racing one) intact
        from s3parq_spark.fetch import list_versions
        assert [v["version"] for v in list_versions(spark, tmp_dataset_dir)] \
            == [1, 2, 3, 4, 5]


class TestDmlChangeFeed:
    def test_update_and_delete_log_changes(self, spark, tmp_dataset_dir):
        from s3parq_spark.fetch import fetch_path, list_versions
        from s3parq_spark.publish import (
            changes_path, delete_where, update_where,
        )

        df = spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)], ["k", "p", "v"]
        )
        publish_path(spark, tmp_dataset_dir, df, ["p"])
        assert update_where(
            spark, tmp_dataset_dir, {"v": "v + 1"}, "k = 2", change_log=True
        ) == 1
        assert delete_where(
            spark, tmp_dataset_dir, "k = 3", change_log=True
        ) == 1
        ch = fetch_path(spark, changes_path(tmp_dataset_dir))
        rows = {(r["_change_type"], r["k"]): r for r in ch.collect()}
        assert set(rows) == {
            ("update_preimage", 2), ("update_postimage", 2), ("delete", 3)
        }
        assert rows[("update_preimage", 2)]["v"] == 20.0
        assert rows[("update_postimage", 2)]["v"] == 21.0
        assert rows[("delete", 3)]["v"] == 30.0
        # the feed's own history orders the commits: one append per DML
        assert [v["version"] for v in
                list_versions(spark, changes_path(tmp_dataset_dir))] == [1, 2]
        # the main table is unaffected by logging
        got = sorted(map(tuple, fetch_path(spark, tmp_dataset_dir)
                         .select("k", "v").collect()))
        assert got == [(1, 10.0), (2, 21.0)]

    def test_no_log_without_flag_and_no_log_on_noop(self, spark, tmp_dataset_dir):
        import os

        from s3parq_spark.publish import changes_path, delete_where, update_where

        df = spark.createDataFrame([(1, "a", 10.0)], ["k", "p", "v"])
        publish_path(spark, tmp_dataset_dir, df, ["p"])
        update_where(spark, tmp_dataset_dir, {"v": "0.0"}, "k = 1")
        assert not os.path.exists(changes_path(tmp_dataset_dir))
        # matched-nothing DML logs nothing even with the flag
        delete_where(spark, tmp_dataset_dir, "k = 99", change_log=True)
        assert not os.path.exists(changes_path(tmp_dataset_dir))

    def test_merge_upsert_change_log(self, spark, tmp_dataset_dir):
        from s3parq_spark.fetch import fetch_path
        from s3parq_spark.publish import changes_path, merge_upsert

        df = spark.createDataFrame(
            [(1, "a", 10.0, 0), (2, "a", 20.0, 0)], ["k", "p", "v", "seq"]
        )
        publish_path(spark, tmp_dataset_dir, df, ["p"])
        batch = spark.createDataFrame(
            [(2, "a", 99.0, 1),    # wins on seq -> update pair
             (3, "a", 30.0, 1),    # new key -> insert
             (1, "a", 5.0, -1)],   # loses on seq -> no change rows
            ["k", "p", "v", "seq"],
        )
        merge_upsert(spark, tmp_dataset_dir, batch, ["k"], "seq",
                     change_log=True)
        ch = sorted(map(tuple, fetch_path(
            spark, changes_path(tmp_dataset_dir)
        ).select("k", "v", "_change_type").collect()))
        assert ch == [
            (2, 20.0, "update_preimage"),
            (2, 99.0, "update_postimage"),
            (3, 30.0, "insert"),
        ]

    def test_apply_change_feed_mirrors_source(self, spark, tmp_path):
        from s3parq_spark.fetch import fetch_path
        from s3parq_spark.publish import (
            apply_change_feed, changes_path, delete_where, update_where,
        )

        src, mir = str(tmp_path / "src"), str(tmp_path / "mir")
        df = spark.createDataFrame(
            [(i, "a" if i % 2 else "b", float(i)) for i in range(10)],
            ["k", "p", "v"],
        )
        publish_path(spark, src, df, ["p"])
        publish_path(spark, mir, df, ["p"])
        update_where(spark, src, {"v": "v * 10"}, "k < 3", change_log=True)
        delete_where(spark, src, "k >= 8", change_log=True)
        n = apply_change_feed(spark, mir, changes_path(src), ["k"])
        assert n == 5  # 3 update pairs -> 3 postimages, 2 deletes
        a = sorted(map(tuple, fetch_path(spark, src).collect()))
        b = sorted(map(tuple, fetch_path(spark, mir).collect()))
        assert a == b
        # idempotent: re-applying the same range converges
        apply_change_feed(spark, mir, changes_path(src), ["k"])
        assert sorted(map(tuple, fetch_path(spark, mir).collect())) == b

    def test_apply_change_feed_incremental_ranges(self, spark, tmp_path):
        from s3parq_spark.fetch import fetch_path, list_versions
        from s3parq_spark.publish import (
            apply_change_feed, changes_path, delete_where, update_where,
        )

        src, mir = str(tmp_path / "s2"), str(tmp_path / "m2")
        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0)], ["k", "p", "v"]
        )
        publish_path(spark, src, df, ["p"])
        publish_path(spark, mir, df, ["p"])
        update_where(spark, src, {"v": "99.0"}, "k = 1", change_log=True)
        # apply only commit 1, then the rest
        assert apply_change_feed(
            spark, mir, changes_path(src), ["k"], from_version=0, to_version=1
        ) == 1
        delete_where(spark, src, "k = 2", change_log=True)
        assert apply_change_feed(
            spark, mir, changes_path(src), ["k"], from_version=1
        ) == 1
        a = sorted(map(tuple, fetch_path(spark, src).collect()))
        b = sorted(map(tuple, fetch_path(spark, mir).collect()))
        assert a == b == [(1, "a", 99.0)]
        assert [v["version"] for v in list_versions(spark, changes_path(src))] == [1, 2]

    def test_apply_change_feed_empties_partition(self, spark, tmp_path):
        import os

        from s3parq_spark.fetch import fetch_path
        from s3parq_spark.publish import (
            apply_change_feed, changes_path, delete_where,
        )

        src, mir = str(tmp_path / "s3"), str(tmp_path / "m3")
        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], ["k", "p", "v"]
        )
        publish_path(spark, src, df, ["p"])
        publish_path(spark, mir, df, ["p"])
        # the delete removes EVERY row of partition b: the replay must
        # remove the partition dir on the mirror, not crash on an empty
        # overwrite (and here survivors are entirely empty)
        delete_where(spark, src, "p = 'b'", change_log=True)
        n = apply_change_feed(spark, mir, changes_path(src), ["k"])
        assert n == 1
        assert sorted(map(tuple, fetch_path(spark, mir).collect())) ==             sorted(map(tuple, fetch_path(spark, src).collect()))
        assert not os.path.exists(os.path.join(mir, "p=b"))

    def test_apply_change_feed_refuses_same_type_squash(self, spark, tmp_path):
        # expire_snapshots on the FEED can squash two commits that each
        # update the same key: two update_postimage rows then share one
        # version, and intra-version ordering is unrecoverable — the apply
        # must refuse (a tiebreak could replay the OLDER postimage), even
        # though the change types are identical (r5 ADVICE: the distinct-
        # types guard alone missed this)
        import pytest

        from s3parq_spark.publish import (
            apply_change_feed, changes_path, expire_snapshots, update_where,
        )

        src, mir = str(tmp_path / "s5"), str(tmp_path / "m5")
        df = spark.createDataFrame([(1, "a", 1.0)], ["k", "p", "v"])
        publish_path(spark, src, df, ["p"])
        publish_path(spark, mir, df, ["p"])
        for v in ("10.0", "20.0", "30.0"):
            update_where(spark, src, {"v": v}, "k = 1", change_log=True)
        expire_snapshots(spark, changes_path(src), keep_last=1)
        with pytest.raises(ValueError, match="more than one op"):
            apply_change_feed(spark, mir, changes_path(src), ["k"])

    def test_merge_upsert_null_partition(self, spark, tmp_path):
        # rows in the __HIVE_DEFAULT_PARTITION__ partition: the touched-
        # partition predicate must be null-safe or the NULL-partition
        # upsert/insert is silently lost (r5 ADVICE)
        from s3parq_spark.fetch import fetch_path
        from s3parq_spark.publish import merge_upsert

        path = str(tmp_path / "nullpart")
        df = spark.createDataFrame(
            [(1, None, 1.0, 0), (2, "a", 2.0, 0), (3, None, 3.0, 0)],
            "k int, p string, v double, seq int",
        )
        publish_path(spark, path, df, ["p"])
        batch = spark.createDataFrame(
            [(1, None, 99.0, 1),   # update in the NULL partition
             (4, None, 4.0, 1),    # insert into the NULL partition
             (2, "a", 22.0, 1)],   # update in a regular partition
            "k int, p string, v double, seq int",
        )
        merge_upsert(spark, path, batch, ["k"], "seq")
        got = sorted(
            (r["k"], r["p"], r["v"]) for r in fetch_path(spark, path).collect()
        )
        assert got == [
            (1, None, 99.0), (2, "a", 22.0), (3, None, 3.0), (4, None, 4.0)
        ]

    def test_merge_change_log_noop_redelivery(self, spark, tmp_dataset_dir):
        import os

        from s3parq_spark.fetch import fetch_path
        from s3parq_spark.publish import changes_path, merge_upsert

        df = spark.createDataFrame(
            [(1, "a", 10.0, 5)], ["k", "p", "v", "seq"]
        )
        publish_path(spark, tmp_dataset_dir, df, ["p"])
        # redelivered batch: every row loses the seq tie-break -> zero
        # change rows; the merge must no-op, not abort on an empty publish
        stale = spark.createDataFrame(
            [(1, "a", 0.0, 1)], ["k", "p", "v", "seq"]
        )
        merge_upsert(spark, tmp_dataset_dir, stale, ["k"], "seq",
                     change_log=True)
        assert not os.path.exists(changes_path(tmp_dataset_dir))
        assert fetch_path(spark, tmp_dataset_dir).collect()[0]["v"] == 10.0
        # fully-empty batch no-ops too
        empty = spark.createDataFrame([], df.schema)
        assert merge_upsert(
            spark, tmp_dataset_dir, empty, ["k"], "seq", change_log=True
        ) == []


class TestGumbelTopkSample:
    def test_deterministic_and_score_sensitive(self, spark):
        from s3parq_spark.operators.sampling import gumbel_topk_sample

        df = spark.createDataFrame(
            [(i, float(i % 7)) for i in range(200)], ["doc_id", "score"]
        )
        a = gumbel_topk_sample(df, "doc_id", "score", n=30)
        b = gumbel_topk_sample(df.repartition(11), "doc_id", "score", n=30)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        assert a.count() == 30
        # high scores should be overrepresented in the draw
        mean_sel = a.agg({"score": "avg"}).collect()[0][0]
        mean_all = df.agg({"score": "avg"}).collect()[0][0]
        assert mean_sel > mean_all

    def test_low_temperature_approaches_plain_topk(self, spark):
        from s3parq_spark.operators.sampling import gumbel_topk_sample

        # scores well separated vs the Gumbel noise scale at T=1e-3:
        # selection must equal the plain top-n by score
        df = spark.createDataFrame(
            [(i, float(i * 100)) for i in range(50)], ["doc_id", "score"]
        )
        got = sorted(
            r["doc_id"] for r in
            gumbel_topk_sample(df, "doc_id", "score", n=10,
                               temperature=1e-3).collect()
        )
        assert got == list(range(40, 50))

    def test_bad_temperature_rejected(self, spark):
        import pytest as _pytest

        from s3parq_spark.operators.sampling import gumbel_topk_sample

        df = spark.createDataFrame([(1, 1.0)], ["doc_id", "score"])
        with _pytest.raises(ValueError, match="temperature"):
            gumbel_topk_sample(df, "doc_id", "score", n=1, temperature=0)


class TestSplitLeakageReport:
    def test_only_cross_split_neardups_reported(self, spark):
        from s3parq_spark.operators.dedup import split_leakage_report

        base = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            (1, base, "train"),
            (2, base + " iota", "val"),      # near-dup across splits
            (3, base + " kappa", "train"),   # near-dup of 1 WITHIN train
            (4, "totally different words here with no overlap at all x y",
             "val"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text", "split"])
        got = split_leakage_report(
            df, "doc_id", "text", "split", n=3, threshold=0.5
        ).collect()
        pairs = {(r["doc_a"], r["doc_b"]): (r["split_a"], r["split_b"])
                 for r in got}
        # the within-train pair (1,3) must NOT appear; cross pairs must
        assert (1, 3) not in pairs
        assert pairs[(1, 2)] == ("train", "val")
        assert pairs[(2, 3)] == ("val", "train")

    def test_clean_split_reports_nothing(self, spark):
        from s3parq_spark.operators.dedup import split_leakage_report

        df = spark.createDataFrame(
            [(1, "a b c d e f", "train"), (2, "u v w x y z", "val")],
            ["doc_id", "text", "split"],
        )
        assert split_leakage_report(
            df, "doc_id", "text", "split", threshold=0.5
        ).count() == 0


class TestPartitionStats:
    def test_counts_staleness_and_unpartitioned(self, spark, tmp_dataset_dir):
        from s3parq_spark.fetch import list_versions
        from s3parq_spark.stats import (
            collect_partition_stats, read_partition_stats,
        )

        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], ["k", "p"]
        )
        publish_path(spark, tmp_dataset_dir, df, ["p"])
        assert read_partition_stats(spark, tmp_dataset_dir) is None
        recs = collect_partition_stats(spark, tmp_dataset_dir)
        assert recs == [
            {"values": {"p": "a"}, "n_rows": 2},
            {"values": {"p": "b"}, "n_rows": 1},
        ]
        # stored record survives an append, with staleness visible
        publish_path(
            spark, tmp_dataset_dir,
            spark.createDataFrame([(9, "b")], ["k", "p"]),
            ["p"], mode="append",
        )
        stored = read_partition_stats(spark, tmp_dataset_dir)
        assert stored == recs  # still the v1 snapshot's numbers
        from s3parq_spark.metadata import read_sidecar
        meta = read_sidecar(spark, tmp_dataset_dir)
        assert meta.stats["partitions_as_of_version"] == 1
        assert [v["version"] for v in
                list_versions(spark, tmp_dataset_dir)] == [1, 2]

    def test_unpartitioned_single_entry(self, spark, tmp_path):
        from s3parq_spark.stats import collect_partition_stats

        p = str(tmp_path / "np")
        publish_path(
            spark, p, spark.createDataFrame([(1,), (2,)], ["k"]), []
        )
        assert collect_partition_stats(spark, p) == [
            {"values": {}, "n_rows": 2}
        ]


class TestClusterExemplars:
    def test_central_member_wins_over_min_id(self, spark):
        from s3parq_spark.operators.dedup import cluster_exemplars

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [
            (1, base),
            (2, base + " extra1"),          # central: similar to 1 AND 3
            (3, base + " extra1 extra2"),
            (9, "unrelated words entirely different from everything here"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = cluster_exemplars(df, "doc_id", "text", threshold=0.5).collect()
        assert len(out) == 1
        r = out[0]
        assert r["exemplar"] == 2  # NOT the min-id member
        assert r["cluster"] == 1 and r["n_members"] == 3
        assert r["centrality"] > 1.0  # two strong edges

    def test_tie_breaks_to_lowest_id(self, spark):
        from s3parq_spark.operators.dedup import cluster_exemplars

        # two identical docs: equal centrality, exemplar = lower id
        df = spark.createDataFrame(
            [(7, "a b c d e f g h"), (4, "a b c d e f g h")],
            ["doc_id", "text"],
        )
        r = cluster_exemplars(df, "doc_id", "text", threshold=0.9).collect()[0]
        assert r["exemplar"] == 4 and r["n_members"] == 2

    def test_stats_and_partition_stats_coexist(self, spark, tmp_dataset_dir):
        from s3parq_spark.stats import (
            collect_partition_stats, collect_stats,
            read_partition_stats, read_stats,
        )

        df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "p"])
        publish_path(spark, tmp_dataset_dir, df, ["p"])
        collect_partition_stats(spark, tmp_dataset_dir)
        collect_stats(spark, tmp_dataset_dir)   # must NOT erase partitions
        assert read_partition_stats(spark, tmp_dataset_dir) is not None
        assert read_stats(spark, tmp_dataset_dir)["row_count"] == 2

    def test_null_partition_value_sorts(self, spark, tmp_dataset_dir):
        from s3parq_spark.stats import collect_partition_stats

        df = spark.createDataFrame(
            [(1, "a"), (2, None)], "k INT, p STRING"
        )
        publish_path(spark, tmp_dataset_dir, df, ["p"])
        recs = collect_partition_stats(spark, tmp_dataset_dir)
        assert sum(r["n_rows"] for r in recs) == 2  # no TypeError on None


class TestTextReviewFixes:
    def test_winnow_short_docs_do_not_crash(self, spark):
        # k=5, window=4: a 6-word doc has 2 k-grams (< window) -> ONE
        # fingerprint (the degenerate single window); a 3-word doc has no
        # k-grams -> no rows; neither may abort the job (r6 review: the
        # old floor of -1 made slice() raise on any short doc)
        from s3parq_spark.operators.text import winnow_fingerprints

        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "x y z"),
             (3, "one two three four five six seven eight nine ten"),
             (4, None)],
            "doc_id int, text string",
        )
        rows = winnow_fingerprints(df, "doc_id", "text").collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
        assert len(by_doc.get(1, set())) == 1
        assert 2 not in by_doc and 4 not in by_doc
        assert len(by_doc.get(3, set())) >= 1

    def test_winnow_is_positional_shared_run_shares_fingerprint(self, spark):
        # winnowing guarantee: any shared run of k+window-1 tokens shares
        # a fingerprint — requires the POSITIONAL k-gram sequence (the old
        # distinct-shingle input broke this for docs with repeated k-grams)
        from s3parq_spark.operators.text import winnow_fingerprints

        run = "q w e r t y u i"  # 8 tokens = k+window-1 for k=5, window=4
        df = spark.createDataFrame(
            [(1, f"a a a a a a {run} b b"),   # repeated prefix k-grams
             (2, f"c d e f g h {run} j k")],
            "doc_id int, text string",
        )
        rows = winnow_fingerprints(df, "doc_id", "text", k=5, window=4)
        by_doc = {}
        for r in rows.collect():
            by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
        assert by_doc[1] & by_doc[2], "shared run must share a fingerprint"

    def test_quality_scores_empty_text_no_ansi_crash(self, spark):
        from s3parq_spark.operators import quality_scores

        df = spark.createDataFrame(
            [(1, "Hello, world."), (2, "")], "doc_id int, text string"
        )
        rows = {r["doc_id"]: r for r in quality_scores(df, "text").collect()}
        assert rows[2]["punct_ratio"] == 0.0 and rows[2]["n_chars"] == 0
        assert rows[1]["n_punct"] == 2

    def test_remove_duplicated_lines_keeps_blank_and_null_docs(self, spark):
        from s3parq_spark.operators.text import remove_duplicated_lines

        df = spark.createDataFrame(
            [(1, "keep me\nshared"), (2, "other\nshared"),
             (3, "   \n  "), (4, None)],
            "doc_id int, text string",
        )
        out = {r["doc_id"]: r for r in
               remove_duplicated_lines(df, "doc_id", "text").collect()}
        assert sorted(out) == [1, 2, 3, 4]
        assert out[3]["text_clean"] == "" and out[3]["n_lines"] == 0
        assert out[4]["text_clean"] == "" and out[4]["n_lines"] == 0
        assert out[1]["text_clean"] == "keep me"

    def test_minhash_bands_must_divide_num_hashes(self, spark):
        import pytest

        from s3parq_spark.operators import minhash_candidate_pairs

        df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="multiple of"):
            minhash_candidate_pairs(
                df, "doc_id", "text", num_hashes=64, bands=10
            )

    def test_multimodal_null_payload_no_crash(self, spark):
        from s3parq_spark.operators import (
            attach_binary_payload, audio_window_features,
            extract_binary_features, sample_video_frames,
        )

        df = spark.createDataFrame(
            [(1, "some text"), (2, None)], "doc_id long, src string"
        )
        p = attach_binary_payload(df, "src")
        feats = {r["doc_id"]: r for r in
                 extract_binary_features(p, "doc_id").collect()}
        assert feats[2]["byte_len"] == 0 and feats[2]["first_byte"] == -1
        assert audio_window_features(p, "doc_id").filter(
            "doc_id = 2").count() == 0
        assert sample_video_frames(p, "doc_id").count() >= 1


class TestPublishReviewFixes:
    def test_delete_where_null_partition_keeps_survivors(self, spark, tmp_path):
        # r6 review: the null-unsafe semi-join classified the NULL
        # partition as emptied and DELETED its surviving rows' directory
        from s3parq_spark.fetch import fetch_path
        from s3parq_spark.publish import delete_where, publish_path

        ds = str(tmp_path / "delnull")
        df = spark.createDataFrame(
            [(1, None, 1.0), (2, None, 2.0), (3, "a", 3.0)],
            "k int, p string, v double",
        )
        publish_path(spark, ds, df, ["p"])
        n = delete_where(spark, ds, "k = 1")
        assert n == 1
        got = sorted((r["k"], r["p"]) for r in fetch_path(spark, ds).collect())
        assert got == [(2, None), (3, "a")]

    def test_update_where_null_partition_applies(self, spark, tmp_path):
        from s3parq_spark.fetch import fetch_path
        from s3parq_spark.publish import publish_path, update_where

        ds = str(tmp_path / "updnull")
        df = spark.createDataFrame(
            [(1, None, 5.0), (2, "a", 5.0)], "k int, p string, v double"
        )
        publish_path(spark, ds, df, ["p"])
        n = update_where(spark, ds, {"v": "v + 1"}, "v = 5")
        assert n == 2
        got = sorted((r["k"], r["v"]) for r in fetch_path(spark, ds).collect())
        assert got == [(1, 6.0), (2, 6.0)]

    def test_compact_preserves_derived_partitions(self, spark, tmp_path):
        import datetime

        from s3parq_spark.fetch import fetch_path
        from s3parq_spark.publish import compact_dataset, publish_path

        ds = str(tmp_path / "compact_hidden")
        rows = [(i, datetime.datetime(2024, 1, 1 + i % 2), float(i))
                for i in range(6)]
        df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
        publish_path(
            spark, ds, df, [],
            derived_partitions={"d": "date_format(ts, 'yyyy-MM-dd')"},
        )
        compact_dataset(spark, ds)
        # the append relies on the sidecar still carrying the transform
        more = spark.createDataFrame(
            [(100, datetime.datetime(2024, 1, 5), 9.0)],
            "k int, ts timestamp, v double",
        )
        publish_path(spark, ds, more, [])
        assert fetch_path(spark, ds).count() == 7

    def test_publish_restores_caller_timestamp_conf(self, spark, tmp_path):
        from s3parq_spark.publish import publish_path

        key = "spark.sql.parquet.outputTimestampType"
        prev = spark.conf.get(key, None)
        try:
            spark.conf.set(key, "TIMESTAMP_MICROS")
            df = spark.createDataFrame([(1, "a")], ["k", "p"])
            publish_path(spark, str(tmp_path / "conf_ds"), df, ["p"])
            assert spark.conf.get(key) == "TIMESTAMP_MICROS"
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    def test_mixed_object_coercion_preserves_missing_values(self, spark):
        import numpy as np
        import pandas as pd

        from s3parq_spark.publish import _to_spark_df

        pdf = pd.DataFrame(
            {"k": [1, 2, 3],
             "m": [pd.Timestamp("2024-01-01"), "x", np.nan]}
        )
        out = _to_spark_df(spark, pdf)
        vals = {r["k"]: r["m"] for r in out.collect()}
        assert vals[3] is None  # NaN must stay missing, never the str 'nan'
        assert vals[2] == "x"

    def test_df_equal_by_set_detects_long_array_diffs(self, spark):
        import numpy as np
        import pandas as pd

        from s3parq_spark.testing import df_equal_by_set

        a = np.zeros(1500)
        b = np.zeros(1500)
        b[700] = 1.0  # hidden inside numpy's elided '...' repr
        p1 = pd.DataFrame({"v": [a]})
        p2 = pd.DataFrame({"v": [b]})
        assert not df_equal_by_set(p1, p2)
        assert df_equal_by_set(p1, pd.DataFrame({"v": [a.copy()]}))

    def test_stream_publish_is_incremental_across_invocations(self, spark, tmp_path):
        import datetime

        from s3parq_spark.fetch import fetch_path
        from s3parq_spark.streaming.events import stream_publish

        landing = tmp_path / "landing"
        landing.mkdir()
        ds = str(tmp_path / "stream_ds")

        def drop_file(name, ids):
            rows = [
                (i, datetime.datetime(2024, 1, 1, 0, 0, i), i, "click",
                 1.0, "{}")
                for i in ids
            ]
            sdf = spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string",
            )
            sdf.coalesce(1).write.mode("overwrite").parquet(
                str(tmp_path / "mk" / name)
            )
            import glob as g
            import shutil

            src = g.glob(str(tmp_path / "mk" / name / "*.parquet"))[0]
            shutil.copy(src, str(landing / f"{name}.parquet"))

        drop_file("a", [1, 2, 3])
        stream_publish(spark, str(landing), ds, ["event_date"])
        assert fetch_path(spark, ds).count() == 3
        drop_file("b", [4, 5])
        # second invocation must ingest ONLY the new file (the old
        # per-call uuid checkpoint replayed everything and doubled rows)
        stream_publish(spark, str(landing), ds, ["event_date"])
        got = sorted(
            r["event_id"] for r in fetch_path(spark, ds).collect()
        )
        assert got == [1, 2, 3, 4, 5]


class TestStatsReviewFixes:
    def test_subset_analyze_merges_not_replaces(self, spark, tmp_path):
        from s3parq_spark.publish import publish_path
        from s3parq_spark.stats import collect_stats, read_stats

        ds = str(tmp_path / "stats_merge")
        df = spark.createDataFrame(
            [(1, "x", 1.0), (2, "y", 2.0)], "a int, b string, c double"
        )
        publish_path(spark, ds, df, [])
        collect_stats(spark, ds, columns=["a", "b"])
        collect_stats(spark, ds, columns=["c"])
        s = read_stats(spark, ds)
        # the second (subset) ANALYZE must not erase a/b's stored stats
        assert set(s["columns"]) == {"a", "b", "c"}
        assert s["columns"]["a"]["n_distinct"] == 2

    def test_analyze_does_not_clobber_concurrent_publish(self, spark, tmp_path, monkeypatch):
        # simulate a publish landing DURING the ANALYZE scan: the stats
        # write must merge into the FRESH sidecar, never write back the
        # pre-scan snapshot (which would erase the new commit's snapshot
        # entries — orphaning its files)
        import importlib

        from s3parq_spark import stats as stats_mod
        from s3parq_spark.fetch import list_versions
        from s3parq_spark.publish import publish_path

        ds = str(tmp_path / "stats_race")
        df = spark.createDataFrame([(1, "x")], "a int, b string")
        publish_path(spark, ds, df, [])

        fetch_mod = importlib.import_module("s3parq_spark.fetch")
        fetch_real = fetch_mod.fetch_path
        calls = {"n": 0}

        def fetch_path_with_concurrent_publish(spark_, path_, *a, **kw):
            out = fetch_real(spark_, path_, *a, **kw)
            if not calls["n"]:
                calls["n"] = 1
                publish_path(
                    spark, ds,
                    spark.createDataFrame([(2, "y")], "a int, b string"), [],
                )
            return out

        monkeypatch.setattr(
            fetch_mod, "fetch_path", fetch_path_with_concurrent_publish
        )
        stats_mod.collect_stats(spark, ds)
        versions = [v["version"] for v in list_versions(spark, ds)]
        assert versions == [1, 2], "the mid-ANALYZE commit must survive"
