"""Merge-on-read DELETE (predicate tombstones): O(1) deletes, per-era
read application, time travel, lifecycle interplay, and the loud-refusal
surface for everything that requires materialization."""

import pytest
from pyspark.sql import functions as F

from s3parq_spark import metadata
from s3parq_spark.fetch import (
    dataset_rowcount,
    fetch_at,
    fetch_changes,
    fetch_path,
    get_all_partition_values,
    get_max_partition_value,
)
from s3parq_spark.publish import (
    compact_dataset,
    delete_where,
    expire_snapshots,
    merge_upsert,
    overwrite_partitions,
    publish_path,
    rename_column,
    restore_dataset,
    update_where,
)


@pytest.fixture()
def nation(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/nation.parquet")


@pytest.fixture()
def ds(spark, nation, tmp_dataset_dir):
    publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
    return tmp_dataset_dir


def test_tombstone_is_metadata_only_and_exact(spark, nation, ds):
    import os

    files_before = sorted(
        os.path.join(dp, f)
        for dp, _, fns in os.walk(ds) for f in fns if f.endswith(".parquet")
    )
    n = delete_where(spark, ds, "n_nationkey < 5", mode="merge-on-read")
    assert n == 5
    files_after = sorted(
        os.path.join(dp, f)
        for dp, _, fns in os.walk(ds) for f in fns if f.endswith(".parquet")
    )
    assert files_before == files_after  # ZERO data files touched
    got = fetch_path(spark, ds)
    assert got.count() == 20
    assert got.filter("n_nationkey < 5").count() == 0


def test_later_appends_survive_the_tombstone(spark, nation, ds):
    delete_where(spark, ds, "n_nationkey < 5", mode="merge-on-read")
    publish_path(
        spark, ds, nation.filter("n_nationkey < 5"), ["n_regionkey"]
    )
    assert fetch_path(spark, ds).count() == 25
    # the re-appended rows are the surviving copies
    assert fetch_path(spark, ds).filter("n_nationkey < 5").count() == 5


def test_null_predicate_rows_kept(spark, tmp_dataset_dir):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 99)], "id int, score int"
    )
    publish_path(spark, tmp_dataset_dir, df, [])
    n = delete_where(
        spark, tmp_dataset_dir, "score > 50", mode="merge-on-read"
    )
    assert n == 1
    kept = sorted(
        r["id"] for r in fetch_path(spark, tmp_dataset_dir).collect()
    )
    assert kept == [1, 2]  # NULL-predicate row kept (SQL DELETE rule)


def test_stacked_tombstones_and_time_travel(spark, nation, ds):
    delete_where(spark, ds, "n_nationkey < 5", mode="merge-on-read")   # v2
    publish_path(spark, ds, nation.filter("n_nationkey < 3"),
                 ["n_regionkey"])                                      # v3
    delete_where(spark, ds, "n_regionkey = 1", mode="merge-on-read")   # v4
    live = fetch_path(spark, ds)
    model = nation.filter("n_nationkey >= 5").unionByName(
        nation.filter("n_nationkey < 3")
    ).filter("n_regionkey != 1")
    assert live.count() == model.count()
    assert fetch_at(spark, ds, 1).count() == 25
    assert fetch_at(spark, ds, 2).count() == 20
    assert fetch_at(spark, ds, 3).count() == 23
    assert fetch_at(spark, ds, 4).count() == model.count()


def test_filtered_and_projected_reads_compose(spark, nation, ds):
    delete_where(spark, ds, "n_nationkey >= 10", mode="merge-on-read")
    got = fetch_path(
        spark, ds,
        filters=[{"partition": "n_regionkey", "comparison": "==",
                  "values": [1]}],
        columns=["n_nationkey", "n_name"],
    )
    exp = nation.filter("n_regionkey = 1 and n_nationkey < 10")
    assert got.columns == ["n_nationkey", "n_name"]
    assert got.count() == exp.count()


def test_metadata_plane_refuses_until_materialized(spark, nation, ds):
    delete_where(spark, ds, "n_regionkey = 2", mode="merge-on-read")
    with pytest.raises(ValueError, match="merge-on-read"):
        get_all_partition_values(ds, "", "n_regionkey", spark=spark)
    with pytest.raises(ValueError, match="merge-on-read"):
        get_max_partition_value(ds, "", "n_regionkey", spark=spark)
    with pytest.raises(ValueError, match="merge-on-read"):
        dataset_rowcounts_probe(spark, ds)
    compact_dataset(spark, ds)
    assert sorted(
        get_all_partition_values(ds, "", "n_regionkey", spark=spark)
    ) == [0, 1, 3, 4]


def dataset_rowcounts_probe(spark, path):
    from s3parq_spark.fetch import dataset_rowcount

    return dataset_rowcount(spark, path, strict=True)


def test_dml_and_ddl_refuse_until_materialized(spark, nation, ds):
    delete_where(spark, ds, "n_nationkey = 0", mode="merge-on-read")
    up = nation.limit(1)
    with pytest.raises(ValueError, match="merge-on-read"):
        delete_where(spark, ds, "n_nationkey = 1")  # CoW path
    with pytest.raises(ValueError, match="merge-on-read"):
        update_where(spark, ds, "n_nationkey = 1", {"n_name": "'X'"})
    with pytest.raises(ValueError, match="merge-on-read"):
        merge_upsert(spark, ds, up, ["n_nationkey"], "n_nationkey")
    with pytest.raises(ValueError, match="merge-on-read"):
        overwrite_partitions(spark, ds, up, ["n_regionkey"])
    with pytest.raises(ValueError, match="merge-on-read"):
        rename_column(spark, ds, "n_name", "nation_name")
    with pytest.raises(ValueError, match="merge-on-read"):
        publish_path(spark, ds, up, ["n_name"], evolve_partitions=True)
    # plain appends stay allowed
    publish_path(spark, ds, nation.limit(2), ["n_regionkey"])
    assert fetch_path(spark, ds).count() == 24 + 2


def test_cdc_across_tombstone_refused_elsewhere_fine(spark, nation, ds):
    delete_where(spark, ds, "n_nationkey < 5", mode="merge-on-read")   # v2
    publish_path(spark, ds, nation.limit(3), ["n_regionkey"])          # v3
    with pytest.raises(ValueError, match="not append-only"):
        fetch_changes(spark, ds, 1, 2)
    with pytest.raises(ValueError, match="not append-only"):
        fetch_changes(spark, ds, 1, 3)
    assert fetch_changes(spark, ds, 2, 3).count() == 3


def test_restore_rolls_back_the_delete(spark, nation, ds):
    delete_where(spark, ds, "n_regionkey = 0", mode="merge-on-read")
    assert fetch_path(spark, ds).count() == 20
    restore_dataset(spark, ds, version=1)
    assert fetch_path(spark, ds).count() == 25
    assert not metadata.read_sidecar(spark, ds).has_tombstones()


def test_expire_never_squashes_across_a_tombstone(spark, nation, ds):
    # v2 tombstone; v3..v6 appends; expire keep_last=2 squashes v3..v4
    delete_where(spark, ds, "n_nationkey < 5", mode="merge-on-read")
    for i in range(4):
        publish_path(spark, ds, nation.limit(i + 1), ["n_regionkey"])
    expired = expire_snapshots(spark, ds, keep_last=2)
    meta = metadata.read_sidecar(spark, ds)
    # the tombstone survives verbatim with its version
    assert meta.tombstones() == [(2, "n_nationkey < 5")]
    # v1's files must still be stamped BELOW the tombstone version
    vers = meta.file_commit_versions()
    v1_files = [f for f, v in vers.items() if v < 2]
    assert v1_files, "pre-tombstone files lost their pre-tombstone version"
    # and the read is unchanged
    assert fetch_path(spark, ds).count() == 20 + 1 + 2 + 3 + 4
    assert expired  # something actually squashed


def test_dry_run_and_zero_match(spark, nation, ds):
    before = metadata.read_sidecar(spark, ds).snapshots
    assert delete_where(
        spark, ds, "n_nationkey = 99", mode="merge-on-read"
    ) == 0
    assert delete_where(
        spark, ds, "n_nationkey < 5", mode="merge-on-read", dry_run=True
    ) == 5
    after = metadata.read_sidecar(spark, ds).snapshots
    assert before == after  # neither committed a tombstone
    with pytest.raises(ValueError, match="change_log"):
        delete_where(spark, ds, "n_nationkey < 5", mode="merge-on-read",
                     change_log=True)
    with pytest.raises(ValueError, match="unknown delete_where mode"):
        delete_where(spark, ds, "1=1", mode="typo")


def test_analyze_reflects_tombstones(spark, nation, ds):
    from s3parq_spark.stats import collect_stats

    delete_where(spark, ds, "n_nationkey >= 20", mode="merge-on-read")
    stats = collect_stats(spark, ds, columns=["n_nationkey"])
    assert int(stats["columns"]["n_nationkey"]["max"]) == 19


def test_count_matches_false_is_mor_only_and_loud(spark, sf_dir, tmp_path):
    """r10 third review: count_matches=False on copy-on-write would
    silently scan-and-rewrite anyway — reject loudly, like the adjacent
    change_log/merge-on-read combo."""
    import pytest

    from s3parq_spark.publish import delete_where, publish_path

    path = str(tmp_path / "ds")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(100)
    publish_path(spark, path, orders, [])
    with pytest.raises(ValueError, match="count_matches"):
        delete_where(
            spark, path, "o_orderkey < 5", count_matches=False
        )
    # the sanctioned combo commits without counting and returns -1
    n = delete_where(
        spark, path, "o_orderkey < 5", mode="merge-on-read",
        count_matches=False,
    )
    assert n == -1
    from s3parq_spark.fetch import fetch_path

    assert fetch_path(spark, path).filter("o_orderkey < 5").count() == 0
    # a malformed predicate is rejected BEFORE it could be committed
    with pytest.raises(Exception):
        delete_where(
            spark, path, "no_such_column = 1", mode="merge-on-read",
            count_matches=False,
        )
    assert fetch_path(spark, path).count() == orders.filter(
        "o_orderkey >= 5"
    ).count()
