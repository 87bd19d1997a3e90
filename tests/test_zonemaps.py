"""File-level zone maps (publish zone_map_columns + fetch value-column
filters): driver-side data skipping, metadata row counts, and the
superset-safety property."""

import pytest
from pyspark.sql import functions as F

from s3parq_spark import metadata
from s3parq_spark.fetch import (
    _prune_zone_files,
    dataset_rowcount,
    fetch_at,
    fetch_path,
    partition_rowcounts,
)
from s3parq_spark.publish import compact_dataset, publish_path


@pytest.fixture()
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice",
        "l_linestatus",
    )


@pytest.fixture()
def zoned(spark, li, tmp_dataset_dir):
    """lineitem partitioned by l_linestatus, globally range-sorted on
    l_orderkey into many small files, with zone maps on (l_orderkey,
    l_shipdate)."""
    publish_path(
        spark, tmp_dataset_dir,
        li.repartitionByRange(4, "l_orderkey")
          .sortWithinPartitions("l_orderkey"),
        ["l_linestatus"],
        max_records_per_file=400,
        rebalance=False,
        zone_map_columns=["l_orderkey", "l_shipdate"],
    )
    return tmp_dataset_dir


def test_sidecar_records_per_file_stats(spark, zoned, li):
    meta = metadata.read_sidecar(spark, zoned)
    assert meta.zone_map_columns() == ["l_orderkey", "l_shipdate"]
    files = meta.manifest_files()
    fm = meta.file_stats()
    assert set(fm) == set(files)
    total = sum(e["rows"] for e in fm.values())
    assert total == li.count()
    for e in fm.values():
        mn, mx, nulls = e["stats"]["l_orderkey"]
        assert mn <= mx and nulls == 0


def test_zone_filter_skips_files_and_matches(spark, zoned, li):
    meta = metadata.read_sidecar(spark, zoned)
    files = meta.manifest_files()
    flt = [{"partition": "l_orderkey", "comparison": "<", "values": [300]}]
    kept = _prune_zone_files(files, meta, flt)
    assert len(kept) < len(files)  # skipping actually happened
    got = fetch_path(spark, zoned, filters=flt)
    assert got.count() == li.filter("l_orderkey < 300").count()
    # point lookup
    eq = [{"partition": "l_orderkey", "comparison": "==", "values": [42]}]
    assert len(_prune_zone_files(files, meta, eq)) < len(files)
    assert (
        fetch_path(spark, zoned, filters=eq).count()
        == li.filter("l_orderkey = 42").count()
    )


def test_zone_and_partition_filters_compose(spark, zoned, li):
    flt = [
        {"partition": "l_linestatus", "comparison": "==", "values": ["O"]},
        {"partition": "l_shipdate", "comparison": ">=",
         "values": ["1999-01-01 00:00:00"]},
    ]
    got = fetch_path(spark, zoned, filters=flt)
    exp = li.filter("l_linestatus = 'O' and l_shipdate >= '1999-01-01'")
    assert got.count() == exp.count()


@pytest.mark.parametrize("cmp,vals", [
    ("==", [1, 700]),
    ("!=", [3]),
    (">", [900]),
    (">=", [900]),
    ("<", [5]),
    ("<=", [5]),
])
def test_zone_prune_superset_property(spark, zoned, li, cmp, vals):
    """Pruned fetch == the same predicate over the full scan, for every
    comparison shape (the skipping may only remove provably dead files)."""
    flt = [{"partition": "l_orderkey", "comparison": cmp, "values": vals}]
    got = fetch_path(spark, zoned, filters=flt).count()
    from s3parq_spark.filters import filters_to_predicate

    exp = (
        fetch_path(spark, zoned)
        .filter(filters_to_predicate(flt, {"l_orderkey": "integer"}))
        .count()
    )
    assert got == exp


def test_neq_single_value_drops_constant_file(spark, tmp_dataset_dir):
    df = spark.createDataFrame(
        [(7, "a")] * 10 + [(9, "b")] * 10, ["k", "v"]
    ).repartitionByRange(2, "k").sortWithinPartitions("k")
    publish_path(
        spark, tmp_dataset_dir, df, [], rebalance=False,
        zone_map_columns=["k"],
    )
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    files = meta.manifest_files()
    flt = [{"partition": "k", "comparison": "!=", "values": [7]}]
    kept = _prune_zone_files(files, meta, flt)
    # the all-7 file is provably dead under k != 7
    assert len(kept) < len(files)
    assert fetch_path(spark, tmp_dataset_dir, filters=flt).count() == 10


def test_null_semantics(spark, tmp_dataset_dir):
    df = spark.createDataFrame(
        [(None, "n1"), (None, "n2"), (5, "x"), (8, "y")],
        "k int, v string",
    )
    publish_path(spark, tmp_dataset_dir, df, [], zone_map_columns=["k"])
    # == None selects the NULL rows (module contract)
    got = fetch_path(
        spark, tmp_dataset_dir,
        filters=[{"partition": "k", "comparison": "==", "values": [None]}],
    )
    assert got.count() == 2
    # != never returns NULL rows
    got = fetch_path(
        spark, tmp_dataset_dir,
        filters=[{"partition": "k", "comparison": "!=", "values": [5]}],
    )
    assert [r["v"] for r in got.collect()] == ["y"]


def test_rowcount_queries(spark, zoned, li):
    assert dataset_rowcount(spark, zoned) == li.count()
    per = partition_rowcounts(spark, zoned, "l_linestatus")
    exp = {
        r["l_linestatus"]: r["n"]
        for r in li.groupBy("l_linestatus").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert per == exp


def test_rowcount_honesty_on_uncovered_files(spark, li, tmp_dataset_dir):
    # published WITHOUT zone maps: the metadata count is unknowable
    publish_path(spark, tmp_dataset_dir, li.limit(100), [])
    with pytest.raises(ValueError, match="no recorded row count"):
        dataset_rowcount(spark, tmp_dataset_dir)
    assert dataset_rowcount(spark, tmp_dataset_dir, strict=False) is None


def test_append_inherits_declaration(spark, li, tmp_dataset_dir):
    publish_path(
        spark, tmp_dataset_dir, li.limit(100), [], zone_map_columns=["l_orderkey"]
    )
    publish_path(spark, tmp_dataset_dir, li.limit(50), [])  # inherits
    assert dataset_rowcount(spark, tmp_dataset_dir) == 150
    with pytest.raises(ValueError, match="zone-map mismatch"):
        publish_path(
            spark, tmp_dataset_dir, li.limit(10), [],
            zone_map_columns=["l_extendedprice"],
        )


def test_partition_column_rejected(spark, li, tmp_dataset_dir):
    with pytest.raises(ValueError, match="partition columns"):
        publish_path(
            spark, tmp_dataset_dir, li, ["l_linestatus"],
            zone_map_columns=["l_linestatus"],
        )


def test_rows_only_mode(spark, li, tmp_dataset_dir):
    publish_path(spark, tmp_dataset_dir, li.limit(137), [], zone_map_columns=[])
    assert dataset_rowcount(spark, tmp_dataset_dir) == 137
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert all("stats" not in e for e in meta.file_stats().values())
    # no skipping surface declared: a value-column filter is still rejected
    with pytest.raises(ValueError, match="matching partition"):
        fetch_path(
            spark, tmp_dataset_dir,
            filters=[{"partition": "l_orderkey", "comparison": "==",
                      "values": [1]}],
        ).count()


def test_zone_filter_on_time_travel_read(spark, li, tmp_dataset_dir):
    publish_path(
        spark, tmp_dataset_dir, li.filter("l_orderkey < 500"), [],
        zone_map_columns=["l_orderkey"],
    )
    publish_path(spark, tmp_dataset_dir, li.filter("l_orderkey >= 500"), [])
    flt = [{"partition": "l_orderkey", "comparison": "<", "values": [100]}]
    got = fetch_at(spark, tmp_dataset_dir, 1, filters=flt)
    assert got.count() == li.filter("l_orderkey < 100").count()


def test_ordering_on_string_zone_column_rejected(spark, tmp_dataset_dir):
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    publish_path(spark, tmp_dataset_dir, df, [], zone_map_columns=["v"])
    with pytest.raises(ValueError, match="cannot be used on partition"):
        fetch_path(
            spark, tmp_dataset_dir,
            filters=[{"partition": "v", "comparison": ">", "values": ["a"]}],
        )
    # equality on strings is fine
    assert fetch_path(
        spark, tmp_dataset_dir,
        filters=[{"partition": "v", "comparison": "==", "values": ["a"]}],
    ).count() == 1


def test_compact_recollects_stats(spark, li, tmp_dataset_dir):
    publish_path(
        spark, tmp_dataset_dir, li.limit(100), [],
        zone_map_columns=["l_orderkey"],
    )
    publish_path(spark, tmp_dataset_dir, li.limit(60), [])
    compact_dataset(spark, tmp_dataset_dir)
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    # the declaration survives the rewrite and the stats are re-collected
    assert meta.zone_map_columns() == ["l_orderkey"]
    assert dataset_rowcount(spark, tmp_dataset_dir) == 160


def test_stale_entries_gc_on_publish_and_restore(spark, li, tmp_dataset_dir):
    from s3parq_spark.publish import restore_dataset

    publish_path(
        spark, tmp_dataset_dir, li.limit(100), [],
        zone_map_columns=["l_orderkey"],
    )
    publish_path(spark, tmp_dataset_dir, li.limit(40), [])
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert set(meta.file_stats()) == set(meta.manifest_files())
    restore_dataset(spark, tmp_dataset_dir, version=1)
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert set(meta.file_stats()) == set(meta.manifest_files())
    assert dataset_rowcount(spark, tmp_dataset_dir) == 100


def test_zone_filter_on_evolved_dataset(spark, li, tmp_dataset_dir):
    """Zone maps compose with partition evolution: the value filter skips
    files per spec slice and applies row-level across the union."""
    publish_path(
        spark, tmp_dataset_dir,
        li.filter("l_orderkey < 800")
          .repartitionByRange(3, "l_orderkey")
          .sortWithinPartitions("l_orderkey"),
        ["l_linestatus"],
        max_records_per_file=300, rebalance=False,
        zone_map_columns=["l_orderkey"],
    )
    publish_path(
        spark, tmp_dataset_dir,
        li.filter("l_orderkey >= 800"),
        [],  # evolved: unpartitioned era
        evolve_partitions=True,
    )
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert meta.is_multi_spec()
    flt = [{"partition": "l_orderkey", "comparison": "<", "values": [200]}]
    got = fetch_path(spark, tmp_dataset_dir, filters=flt)
    assert got.count() == li.filter("l_orderkey < 200").count()
    # the old-spec slice actually skipped files
    kept = _prune_zone_files(
        sorted(meta.file_stats()), meta, flt
    )
    assert len(kept) < len(meta.file_stats())
    # zone + cross-spec partition filter together
    both = fetch_path(
        spark, tmp_dataset_dir,
        filters=[
            {"partition": "l_linestatus", "comparison": "==", "values": ["O"]},
            {"partition": "l_orderkey", "comparison": "<", "values": [200]},
        ],
    )
    assert both.count() == li.filter(
        "l_linestatus = 'O' and l_orderkey < 200"
    ).count()


def test_nan_bounds_never_prune(spark, tmp_dataset_dir):
    """r8 review: Spark ranks NaN above everything, Python NaN compares
    False — a NaN bound (or NaN filter value) must keep the file and let
    the row-level residual decide."""
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "b"), (float("nan"), "c")], "x double, v string"
    )
    publish_path(spark, tmp_dataset_dir, df, [], zone_map_columns=["x"])
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    files = meta.manifest_files()
    for cmp, vals, exp in [
        ("==", [2.0], 1),
        (">", [1.5], 2),   # Spark: 2.0 and NaN both > 1.5
        (">=", [2.0], 2),
        ("<", [1.5], 1),
    ]:
        flt = [{"partition": "x", "comparison": cmp, "values": vals}]
        assert _prune_zone_files(files, meta, flt) == files  # NaN bound: keep
        got = fetch_path(spark, tmp_dataset_dir, filters=flt).count()
        assert got == exp, (cmp, vals)
    # NaN filter value: no driver pruning either
    flt = [{"partition": "x", "comparison": "==", "values": [float("nan")]}]
    assert _prune_zone_files(files, meta, flt) == files


def test_rename_and_drop_follow_zone_declaration(spark, li, tmp_dataset_dir):
    from s3parq_spark.publish import drop_column, rename_column

    publish_path(
        spark, tmp_dataset_dir,
        li.select("l_orderkey", "l_linenumber", "l_extendedprice").limit(100),
        [], zone_map_columns=["l_orderkey", "l_extendedprice"],
    )
    rename_column(spark, tmp_dataset_dir, "l_orderkey", "order_id")
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert meta.zone_map_columns() == ["order_id", "l_extendedprice"]
    # appends keep working (inherit the renamed declaration)
    publish_path(
        spark, tmp_dataset_dir,
        li.select(
            F.col("l_orderkey").alias("order_id"),
            "l_linenumber", "l_extendedprice",
        ).limit(10),
        [],
    )
    # zone filter on the NEW name skips and matches
    got = fetch_path(
        spark, tmp_dataset_dir,
        filters=[{"partition": "order_id", "comparison": "<", "values": [50]}],
    )
    assert got.count() > 0
    drop_column(spark, tmp_dataset_dir, "l_extendedprice")
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert meta.zone_map_columns() == ["order_id"]
    publish_path(
        spark, tmp_dataset_dir,
        li.select(
            F.col("l_orderkey").alias("order_id"), "l_linenumber"
        ).limit(5),
        [],
    )  # no wedge
    assert dataset_rowcount(spark, tmp_dataset_dir) == 115


def test_clustering_depth_signal(spark, li, tmp_dataset_dir):
    from s3parq_spark.maintenance import clustering_depth

    # globally range-sorted publish: pairwise-disjoint ranges, depth 1
    publish_path(
        spark, tmp_dataset_dir,
        li.repartitionByRange(6, "l_orderkey")
          .sortWithinPartitions("l_orderkey"),
        [], max_records_per_file=400, rebalance=False,
        zone_map_columns=["l_orderkey"],
    )
    d = clustering_depth(spark, tmp_dataset_dir, "l_orderkey")
    # sorted: adjacent files may share a boundary KEY (duplicate orderkeys
    # straddle a file split), so perfect clustering reads at most 2 files
    # per point, never the dataset
    assert d["n_covered"] >= 6 and d["max_depth"] <= 2.0
    # interleaving appends degrade the depth -- the recompact signal
    for i in range(3):
        publish_path(spark, tmp_dataset_dir, li.limit(200), [])
    d2 = clustering_depth(spark, tmp_dataset_dir, "l_orderkey")
    assert d2["max_depth"] > d["max_depth"]
    # re-sorting compaction restores depth 1
    from s3parq_spark.publish import compact_dataset

    compact_dataset(spark, tmp_dataset_dir, sort_by=["l_orderkey"],
                    max_records_per_file=500)
    d3 = clustering_depth(spark, tmp_dataset_dir, "l_orderkey")
    assert d3["max_depth"] <= 2.0 and d3["max_depth"] < d2["max_depth"]
    with pytest.raises(ValueError, match="not zone-mapped"):
        clustering_depth(spark, tmp_dataset_dir, "l_linenumber")


def test_evolve_append_promoting_zone_column_trims_declaration(
    spark, li, tmp_dataset_dir
):
    """An evolving append whose NEW spec promotes a declared zone-map
    column to a partition must carry the declaration through minus the
    promoted column (mirroring repartition_dataset) — before the r9 fix
    this publish was unrecoverable: inheriting failed the partition-column
    check and any trimmed list failed the mismatch check."""
    publish_path(
        spark, tmp_dataset_dir, li.limit(200), ["l_linestatus"],
        zone_map_columns=["l_orderkey", "l_linenumber"],
    )
    # promote l_linenumber to a partition in the new spec; declaration is
    # inherited (None) and must auto-trim
    publish_path(
        spark, tmp_dataset_dir,
        li.limit(300).filter("l_linenumber <= 2"),
        ["l_linenumber"],
        mode="append",
        evolve_partitions=True,
    )
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert meta.zone_map_columns() == ["l_orderkey"]
    # an explicit already-trimmed list is also accepted on the evolve path
    publish_path(
        spark, tmp_dataset_dir,
        li.limit(50).filter("l_linenumber = 3"),
        ["l_linenumber"],
        mode="append",
        evolve_partitions=True,
        zone_map_columns=["l_orderkey"],
    )
    total = 200 + li.limit(300).filter("l_linenumber <= 2").count() + \
        li.limit(50).filter("l_linenumber = 3").count()
    assert fetch_path(spark, tmp_dataset_dir).count() == total
    # zone skipping on the surviving declared column still works across specs
    got = fetch_path(
        spark, tmp_dataset_dir,
        filters=[{"partition": "l_orderkey", "comparison": "<",
                  "values": [50]}],
    )
    exp = fetch_path(spark, tmp_dataset_dir).filter("l_orderkey < 50")
    assert got.count() == exp.count()
    # row-count metadata plane stays consistent after the trim
    assert dataset_rowcount(spark, tmp_dataset_dir) == total


def test_plain_compaction_preserves_declared_clustering(
    spark, li, tmp_dataset_dir
):
    """r12: compact_dataset() with NO layout args re-applies the
    DECLARED sort — a policy-loop compaction used to silently rebalance
    a sorted dataset (physical clustering gone, declaration dropped),
    degrading every later zone-map prune. The declaration is part of
    the layout, like the hive partitions."""
    from s3parq_spark.maintenance import clustering_depth
    from s3parq_spark.publish import compact_dataset

    publish_path(
        spark, tmp_dataset_dir, li, [], max_records_per_file=400,
        zone_map_columns=["l_orderkey"],
    )
    compact_dataset(spark, tmp_dataset_dir, sort_by=["l_orderkey"],
                    max_records_per_file=500)  # declares the layout
    for _ in range(3):
        publish_path(spark, tmp_dataset_dir, li.limit(200), [])
    d_bad = clustering_depth(spark, tmp_dataset_dir, "l_orderkey")
    assert d_bad["max_depth"] > 2.0

    compact_dataset(spark, tmp_dataset_dir, max_records_per_file=500)
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert meta.sort_columns == ["l_orderkey"]  # declaration survives
    d = clustering_depth(spark, tmp_dataset_dir, "l_orderkey")
    assert d["max_depth"] <= 2.0  # physically re-clustered
