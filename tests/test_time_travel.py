"""Time-travel tests: snapshot bookkeeping in the sidecar, prefix-union
reads at a version, schema-evolution nulls, pruning at old versions, and
history clearing on destructive rewrites."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from s3parq_spark.fetch import fetch_at, fetch_path, list_versions
from s3parq_spark.publish import overwrite_partitions, publish_path


def batch(lo, hi, grp="a"):
    return pd.DataFrame(
        {
            "grp": [grp] * (hi - lo),
            "v": list(range(lo, hi)),
        }
    )


class TestTimeTravel:
    def test_prefix_union_per_version(self, spark, tmp_dataset_dir):
        publish_path(spark, tmp_dataset_dir, batch(0, 10), ["grp"])
        publish_path(spark, tmp_dataset_dir, batch(10, 25), ["grp"], mode="append")
        publish_path(spark, tmp_dataset_dir, batch(25, 30), ["grp"], mode="append")
        assert [v["version"] for v in list_versions(spark, tmp_dataset_dir)] == [
            1, 2, 3,
        ]
        got = lambda v: sorted(  # noqa: E731
            r["v"] for r in fetch_at(spark, tmp_dataset_dir, v).collect()
        )
        assert got(1) == list(range(10))
        assert got(2) == list(range(25))
        assert got(3) == list(range(30))
        latest = sorted(r["v"] for r in fetch_path(spark, tmp_dataset_dir).collect())
        assert latest == got(3)

    def test_filters_and_columns_at_version(self, spark, tmp_dataset_dir):
        publish_path(spark, tmp_dataset_dir, batch(0, 5, "a"), ["grp"])
        publish_path(
            spark, tmp_dataset_dir, batch(5, 9, "b"), ["grp"], mode="append"
        )
        df = fetch_at(
            spark,
            tmp_dataset_dir,
            2,
            filters=[{"partition": "grp", "comparison": "==", "values": ["b"]}],
            columns=["v"],
        )
        assert df.columns == ["v"]
        assert sorted(r["v"] for r in df.collect()) == [5, 6, 7, 8]
        plan = df._jdf.queryExecution().toString()
        assert "PartitionFilters" in plan

    def test_unknown_version_rejected(self, spark, tmp_dataset_dir):
        publish_path(spark, tmp_dataset_dir, batch(0, 5), ["grp"])
        with pytest.raises(ValueError, match="not in history"):
            fetch_at(spark, tmp_dataset_dir, 7)

    def test_schema_evolution_reads_null_at_old_files(self, spark, tmp_dataset_dir):
        publish_path(spark, tmp_dataset_dir, batch(0, 4), ["grp"])
        widened = batch(4, 8).assign(extra=[10.5, 11.5, 12.5, 13.5])
        publish_path(spark, tmp_dataset_dir, widened, ["grp"], mode="append")
        at2 = fetch_at(spark, tmp_dataset_dir, 2)
        rows = {r["v"]: r["extra"] for r in at2.collect()}
        assert rows[0] is None and rows[5] == 11.5

    def test_overwrite_resets_history(self, spark, tmp_dataset_dir):
        publish_path(spark, tmp_dataset_dir, batch(0, 5), ["grp"])
        publish_path(spark, tmp_dataset_dir, batch(5, 9), ["grp"], mode="append")
        publish_path(spark, tmp_dataset_dir, batch(0, 3), ["grp"], mode="overwrite")
        vs = list_versions(spark, tmp_dataset_dir)
        assert [v["version"] for v in vs] == [1]
        assert sorted(
            r["v"] for r in fetch_at(spark, tmp_dataset_dir, 1).collect()
        ) == [0, 1, 2]

    def test_partition_overwrite_clears_history(self, spark, tmp_dataset_dir):
        publish_path(spark, tmp_dataset_dir, batch(0, 5, "a"), ["grp"])
        publish_path(
            spark, tmp_dataset_dir, batch(5, 9, "b"), ["grp"], mode="append"
        )
        overwrite_partitions(spark, tmp_dataset_dir, batch(1, 3, "a"), ["grp"])
        assert list_versions(spark, tmp_dataset_dir) == []
        with pytest.raises(ValueError, match="no version history"):
            fetch_at(spark, tmp_dataset_dir, 1)
        # next append bootstraps v1 from the live set, v2 = the append
        publish_path(
            spark, tmp_dataset_dir, batch(9, 12, "c"), ["grp"], mode="append"
        )
        vs = [v["version"] for v in list_versions(spark, tmp_dataset_dir)]
        assert vs == [1, 2]
        assert sorted(
            r["v"] for r in fetch_at(spark, tmp_dataset_dir, 1).collect()
        ) == [1, 2, 5, 6, 7, 8]

    def test_append_to_pre_snapshot_dataset_bootstraps(
        self, spark, tmp_dataset_dir
    ):
        from s3parq_spark import metadata

        publish_path(spark, tmp_dataset_dir, batch(0, 6), ["grp"])
        # simulate a dataset written before snapshot tracking existed
        meta = metadata.read_sidecar(spark, tmp_dataset_dir)
        meta.snapshots = []
        metadata.write_sidecar(spark, tmp_dataset_dir, meta)
        publish_path(spark, tmp_dataset_dir, batch(6, 9), ["grp"], mode="append")
        assert [v["version"] for v in list_versions(spark, tmp_dataset_dir)] == [
            1, 2,
        ]
        assert sorted(
            r["v"] for r in fetch_at(spark, tmp_dataset_dir, 1).collect()
        ) == list(range(6))


class TestFetchChanges:
    def test_delta_between_versions(self, spark, tmp_dataset_dir):
        from s3parq_spark.fetch import fetch_changes

        publish_path(spark, tmp_dataset_dir, batch(0, 10), ["grp"])
        publish_path(spark, tmp_dataset_dir, batch(10, 25), ["grp"], mode="append")
        publish_path(spark, tmp_dataset_dir, batch(25, 30), ["grp"], mode="append")
        got = lambda lo, hi: sorted(  # noqa: E731
            r["v"]
            for r in fetch_changes(spark, tmp_dataset_dir, lo, hi).collect()
        )
        assert got(1, 2) == list(range(10, 25))
        assert got(2, 3) == list(range(25, 30))
        assert got(1, 3) == list(range(10, 30))
        # from_version=0: everything up to the target version
        assert got(0, 3) == list(range(30))

    def test_filters_prune_and_columns_project(self, spark, tmp_dataset_dir):
        from s3parq_spark.fetch import fetch_changes

        publish_path(spark, tmp_dataset_dir, batch(0, 5, "a"), ["grp"])
        both = pd.concat([batch(5, 8, "a"), batch(8, 12, "b")])
        publish_path(spark, tmp_dataset_dir, both, ["grp"], mode="append")
        df = fetch_changes(
            spark,
            tmp_dataset_dir,
            1,
            2,
            filters=[{"partition": "grp", "comparison": "==", "values": ["b"]}],
            columns=["v"],
        )
        assert df.columns == ["v"]
        assert sorted(r["v"] for r in df.collect()) == [8, 9, 10, 11]
        plan = df._jdf.queryExecution().toString()
        assert "PartitionFilters" in plan

    def test_bad_version_args_rejected(self, spark, tmp_dataset_dir):
        from s3parq_spark.fetch import fetch_changes

        publish_path(spark, tmp_dataset_dir, batch(0, 5), ["grp"])
        publish_path(spark, tmp_dataset_dir, batch(5, 7), ["grp"], mode="append")
        with pytest.raises(ValueError, match="not in history"):
            fetch_changes(spark, tmp_dataset_dir, 1, 9)
        with pytest.raises(ValueError, match="must precede"):
            fetch_changes(spark, tmp_dataset_dir, 2, 2)
        with pytest.raises(ValueError, match="must precede"):
            fetch_changes(spark, tmp_dataset_dir, 2, 1)

    def test_empty_delta_keeps_schema(self, spark, tmp_dataset_dir):
        from s3parq_spark import metadata
        from s3parq_spark.fetch import fetch_changes

        publish_path(spark, tmp_dataset_dir, batch(0, 5), ["grp"])
        publish_path(spark, tmp_dataset_dir, batch(5, 7), ["grp"], mode="append")
        # simulate a snapshot that added no files (empty append)
        meta = metadata.read_sidecar(spark, tmp_dataset_dir)
        meta.snapshots.append({"version": 3, "added": []})
        metadata.write_sidecar(spark, tmp_dataset_dir, meta)
        df = fetch_changes(spark, tmp_dataset_dir, 2, 3)
        assert df.count() == 0
        assert set(df.columns) == {"grp", "v"}


class TestTimestampTimeTravel:
    def test_resolves_to_newest_at_or_before(self, spark, tmp_dataset_dir):
        import time

        from s3parq_spark.fetch import fetch_at_timestamp, list_versions
        from s3parq_spark.publish import publish_path

        publish_path(
            spark, tmp_dataset_dir,
            spark.createDataFrame([(1, "a"), (2, "b")], ["k", "p"]), ["p"],
        )
        t_mid = time.time()
        time.sleep(0.05)
        publish_path(
            spark, tmp_dataset_dir,
            spark.createDataFrame([(3, "a")], ["k", "p"]), ["p"], mode="append",
        )
        vs = list_versions(spark, tmp_dataset_dir)
        assert [v["version"] for v in vs] == [1, 2]
        assert all(v["ts"] is not None for v in vs)
        assert vs[0]["ts"] <= t_mid <= vs[1]["ts"]
        assert fetch_at_timestamp(spark, tmp_dataset_dir, t_mid).count() == 2
        assert fetch_at_timestamp(spark, tmp_dataset_dir, time.time()).count() == 3

    def test_before_first_commit_rejected(self, spark, tmp_dataset_dir):
        import pytest as _pytest

        from s3parq_spark.fetch import fetch_at_timestamp
        from s3parq_spark.publish import publish_path

        with _pytest.raises(ValueError, match="no version history"):
            fetch_at_timestamp(spark, tmp_dataset_dir, 0)
        publish_path(
            spark, tmp_dataset_dir,
            spark.createDataFrame([(1, "a")], ["k", "p"]), ["p"],
        )
        with _pytest.raises(ValueError, match="no snapshot at or before"):
            fetch_at_timestamp(spark, tmp_dataset_dir, 0)

    def test_filters_and_columns_pass_through(self, spark, tmp_dataset_dir):
        import time

        from s3parq_spark.fetch import fetch_at_timestamp
        from s3parq_spark.publish import publish_path

        publish_path(
            spark, tmp_dataset_dir,
            spark.createDataFrame([(1, "a"), (2, "b")], ["k", "p"]), ["p"],
        )
        out = fetch_at_timestamp(
            spark, tmp_dataset_dir, time.time(),
            filters=[{"partition": "p", "comparison": "==", "values": ["a"]}],
            columns=["k"],
        )
        assert [r["k"] for r in out.collect()] == [1]
        assert out.columns == ["k"]  # explicit projection, nothing extra


class TestAttachAt:
    def test_sql_version_as_of(self, spark, tmp_dataset_dir):
        import time

        from s3parq_spark.fetch import attach_at
        from s3parq_spark.publish import publish_path

        publish_path(
            spark, tmp_dataset_dir,
            spark.createDataFrame([(1, "a"), (2, "b")], ["k", "p"]), ["p"],
        )
        t_mid = time.time()
        publish_path(
            spark, tmp_dataset_dir,
            spark.createDataFrame([(3, "a")], ["k", "p"]), ["p"], mode="append",
        )
        attach_at(spark, tmp_dataset_dir, "snap_v1", version=1)
        assert spark.sql("SELECT count(*) c FROM snap_v1").first()["c"] == 2
        attach_at(spark, tmp_dataset_dir, "snap_ts", ts=t_mid)
        assert spark.sql("SELECT count(*) c FROM snap_ts").first()["c"] == 2
        # partition predicate in SQL still prunes the versioned file index
        df = spark.sql("SELECT * FROM snap_v1 WHERE p = 'a'")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "p#" in plan.split(
            "PartitionFilters", 1
        )[1][:120]
        import pytest as _pytest

        with _pytest.raises(ValueError, match="exactly one"):
            attach_at(spark, tmp_dataset_dir, "x", version=1, ts=t_mid)
        with _pytest.raises(ValueError, match="exactly one"):
            attach_at(spark, tmp_dataset_dir, "x")


class TestColumnRenameDrop:
    def _ds(self, spark, tmp_path):
        from s3parq_spark.publish import publish_path

        p = str(tmp_path / "ren")
        df = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], ["k", "p", "price"]
        )
        publish_path(spark, p, df, ["p"])
        return p

    def test_rename_maps_old_files_and_new_appends(self, spark, tmp_path):
        from s3parq_spark.fetch import fetch_at, fetch_path
        from s3parq_spark.publish import publish_path, rename_column

        p = self._ds(spark, tmp_path)
        rename_column(spark, p, "price", "unit_price")
        assert fetch_path(spark, p).columns == ["k", "p", "unit_price"]
        publish_path(
            spark, p,
            spark.createDataFrame([(3, "a", 30.0)], ["k", "p", "unit_price"]),
            ["p"], mode="append",
        )
        got = sorted(
            map(tuple, fetch_path(spark, p).select("k", "unit_price").collect())
        )
        assert got == [(1, 10.0), (2, 20.0), (3, 30.0)]
        # time travel to the pre-rename snapshot serves the mapped name too
        v1 = sorted(
            map(tuple, fetch_at(spark, p, 1).select("k", "unit_price").collect())
        )
        assert v1 == [(1, 10.0), (2, 20.0)]

    def test_old_name_append_rejected(self, spark, tmp_path):
        from s3parq_spark.publish import publish_path, rename_column

        p = self._ds(spark, tmp_path)
        rename_column(spark, p, "price", "unit_price")
        with pytest.raises(ValueError, match="prior physical names"):
            publish_path(
                spark, p,
                spark.createDataFrame([(9, "a", 1.0)], ["k", "p", "price"]),
                ["p"], mode="append",
            )

    def test_chained_rename_folds_history(self, spark, tmp_path):
        from s3parq_spark.fetch import fetch_path
        from s3parq_spark.metadata import read_sidecar
        from s3parq_spark.publish import rename_column

        p = self._ds(spark, tmp_path)
        rename_column(spark, p, "price", "unit_price")
        rename_column(spark, p, "unit_price", "cost")
        meta = read_sidecar(spark, p)
        assert meta.column_renames == {"cost": ["unit_price", "price"]}
        got = sorted(map(tuple, fetch_path(spark, p).select("k", "cost").collect()))
        assert got == [(1, 10.0), (2, 20.0)]

    def test_drop_hides_column_and_tombstones_names(self, spark, tmp_path):
        from s3parq_spark.fetch import fetch_path
        from s3parq_spark.publish import drop_column, publish_path, rename_column

        p = self._ds(spark, tmp_path)
        rename_column(spark, p, "price", "unit_price")
        drop_column(spark, p, "unit_price")
        assert fetch_path(spark, p).columns == ["k", "p"]
        # neither dead physical name may return as a new column
        for dead in ("price", "unit_price"):
            with pytest.raises(ValueError, match="prior physical names"):
                publish_path(
                    spark, p,
                    spark.createDataFrame([(8, "a", 5.0)], ["k", "p", dead]),
                    ["p"], mode="append",
                )

    def test_partition_and_name_guards(self, spark, tmp_path):
        from s3parq_spark.publish import drop_column, rename_column

        p = self._ds(spark, tmp_path)
        with pytest.raises(ValueError, match="partition column"):
            rename_column(spark, p, "p", "p2")
        with pytest.raises(ValueError, match="partition column"):
            drop_column(spark, p, "p")
        with pytest.raises(ValueError, match="already in use"):
            rename_column(spark, p, "price", "k")
        with pytest.raises(ValueError, match="no column"):
            rename_column(spark, p, "ghost", "g2")

    def test_cdf_postimage_when_update_leaves_predicate(self, spark, tmp_path):
        from s3parq_spark.fetch import fetch_path
        from s3parq_spark.publish import changes_path, publish_path, update_where

        p = str(tmp_path / "cdfpred")
        df = spark.createDataFrame([(1, "a", 120.0), (2, "a", 5.0)], ["k", "p", "v"])
        publish_path(spark, p, df, ["p"])
        # the update pushes the matched row OUT of the predicate: the
        # postimage must still be logged
        update_where(spark, p, {"v": "v - 100"}, "v > 10", change_log=True)
        ch = {(r["_change_type"]): r for r in
              fetch_path(spark, changes_path(p)).collect()}
        assert set(ch) == {"update_preimage", "update_postimage"}
        assert ch["update_preimage"]["v"] == 120.0
        assert ch["update_postimage"]["v"] == 20.0

    def test_tombstone_namespace_reserved(self, spark, tmp_path):
        from s3parq_spark.publish import drop_column, publish_path, rename_column

        p = self._ds(spark, tmp_path)
        drop_column(spark, p, "price")
        # a literal __dropped_price column cannot be appended
        with pytest.raises(ValueError, match="__dropped_"):
            publish_path(
                spark, p,
                spark.createDataFrame(
                    [(8, "a", 1.0)], ["k", "p", "__dropped_price"]
                ),
                ["p"], mode="append",
            )
        # and rename_column cannot target the reserved namespace
        with pytest.raises(ValueError, match="reserved"):
            rename_column(spark, p, "k", "__dropped_price")

    def test_drop_guard_for_derived_partitions(self, spark, tmp_path):
        from s3parq_spark.publish import drop_column, publish_path

        p = str(tmp_path / "dropderived")
        df = spark.createDataFrame(
            [(1, 10.0, "2024-01-02")], ["k", "v", "d"]
        ).withColumn("d", F.to_date("d"))
        publish_path(
            spark, p, df, [],
            derived_partitions={"month": "date_format(d, 'yyyy-MM')"},
        )
        with pytest.raises(ValueError, match="derived"):
            drop_column(spark, p, "d")


class TestTransformPredicatePushdown:
    def _ds(self, spark, tmp_path):
        import datetime

        from s3parq_spark.publish import publish_path

        p = str(tmp_path / "hp")
        rows = [
            (i, datetime.datetime(2024, 1, 1 + i % 10, 6, 0, 0), float(i))
            for i in range(100)
        ]
        df = spark.createDataFrame(rows, ["k", "ts", "v"])
        publish_path(
            spark, p, df, [],
            derived_partitions={"event_day": "date_format(ts, 'yyyy-MM-dd')"},
        )
        return p, rows

    def test_source_range_filter_prunes_and_stays_exact(self, spark, tmp_path):
        import datetime

        from s3parq_spark.fetch import fetch_path

        p, rows = self._ds(spark, tmp_path)
        out = fetch_path(spark, p, filters=[
            {"partition": "ts", "comparison": ">=",
             "values": ["2024-01-07 00:00:00"]},
        ])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "event_day" in plan.split("PartitionFilters", 1)[1][:250]
        assert out.count() == len(
            [r for r in rows if r[1] >= datetime.datetime(2024, 1, 7)]
        )

    def test_strict_boundary_trimmed_by_residual(self, spark, tmp_path):
        import datetime

        from s3parq_spark.fetch import fetch_path

        p, rows = self._ds(spark, tmp_path)
        # '>' widens to '>=' at the partition level; the residual row
        # filter must trim the boundary partition's equal rows
        out = fetch_path(spark, p, filters=[
            {"partition": "ts", "comparison": ">",
             "values": ["2024-01-07 06:00:00"]},
        ])
        assert out.count() == len(
            [r for r in rows if r[1] > datetime.datetime(2024, 1, 7, 6)]
        )

    def test_equality_and_nonmonotone_fallback(self, spark, tmp_path):
        import datetime

        from s3parq_spark.fetch import fetch_path
        from s3parq_spark.publish import publish_path

        p, rows = self._ds(spark, tmp_path)
        out = fetch_path(spark, p, filters=[
            {"partition": "ts", "comparison": "==",
             "values": ["2024-01-03 06:00:00"]},
        ])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "event_day" in plan.split("PartitionFilters", 1)[1][:250]
        assert out.count() == len(
            [r for r in rows if r[1] == datetime.datetime(2024, 1, 3, 6)]
        )
        # non-monotone pattern: range must NOT prune (wrong order), but
        # the residual keeps the result exact
        p2 = str(tmp_path / "hp2")
        df = spark.createDataFrame(rows, ["k", "ts", "v"])
        publish_path(
            spark, p2, df, [],
            derived_partitions={"odd_day": "date_format(ts, 'dd-MM')"},
        )
        out2 = fetch_path(spark, p2, filters=[
            {"partition": "ts", "comparison": ">=",
             "values": ["2024-01-07 00:00:00"]},
        ])
        plan2 = out2._jdf.queryExecution().executedPlan().toString()
        assert "odd_day" not in plan2.split("PartitionFilters", 1)[1][:250]
        assert out2.count() == len(
            [r for r in rows if r[1] >= datetime.datetime(2024, 1, 7)]
        )

    def test_multi_column_transform_falls_back_to_residual(self, spark, tmp_path):
        import datetime

        from s3parq_spark.fetch import fetch_path
        from s3parq_spark.publish import publish_path

        p = str(tmp_path / "hp3")
        rows = [
            (i, datetime.datetime(2024, 1, 1 + i % 5), f"s{i % 2}")
            for i in range(20)
        ]
        df = spark.createDataFrame(rows, ["k", "ts", "src"])
        publish_path(
            spark, p, df, [],
            derived_partitions={
                "d2": "concat(src, '_', date_format(ts, 'yyyy-MM-dd'))"
            },
        )
        # equality on ts alone cannot evaluate the two-column transform:
        # must fall back to residual-only, never crash
        out = fetch_path(spark, p, filters=[
            {"partition": "ts", "comparison": "==",
             "values": ["2024-01-03 00:00:00"]},
        ])
        assert out.count() == len(
            [r for r in rows if r[1] == datetime.datetime(2024, 1, 3)]
        )

    def test_first_filter_rule_applies_to_source_columns(self, spark, tmp_path):
        import datetime

        from s3parq_spark.fetch import fetch_path

        p, rows = self._ds(spark, tmp_path)
        # the reference contract: only the FIRST filter naming a column
        # applies — uniformly for hidden-partition source columns
        out = fetch_path(spark, p, filters=[
            {"partition": "ts", "comparison": ">=",
             "values": ["2024-01-07 00:00:00"]},
            {"partition": "ts", "comparison": "<",
             "values": ["2024-01-02 00:00:00"]},  # ignored
        ])
        assert out.count() == len(
            [r for r in rows if r[1] >= datetime.datetime(2024, 1, 7)]
        )


def test_dataset_history_reports_snapshots(spark, tmp_path):
    from s3parq_spark.fetch import dataset_history
    from s3parq_spark.publish import publish_path

    ds = str(tmp_path / "hist")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "p"])
    df2 = spark.createDataFrame([(3, "a")], ["k", "p"])
    publish_path(spark, ds, df1, ["p"])
    publish_path(spark, ds, df2, ["p"])
    rows = {r["version"]: r for r in dataset_history(spark, ds).collect()}
    assert sorted(rows) == [1, 2]
    assert rows[1]["partitions_touched"] == 2
    assert rows[2]["partitions_touched"] == 1
    assert rows[2]["total_files"] == (
        rows[1]["n_files_added"] + rows[2]["n_files_added"]
    )
    assert all(r["committed_at"] is not None for r in rows.values())
    import pytest

    with pytest.raises(ValueError, match="no snapshot history"):
        dataset_history(spark, str(tmp_path / "missing"))
