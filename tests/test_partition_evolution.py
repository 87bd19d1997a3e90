"""Partition-spec evolution: append onto a dataset whose earlier versions
used a different partition list (Iceberg's flagship metadata trick, restated
for the sidecar — reference analog: the reference rejects such appends
outright via its stamped-metadata agreement, ``publish_parq.py:211-267``;
this extends the lifecycle layer beyond it with zero data movement)."""

import pytest
from pyspark.sql import functions as F

from s3parq_spark import metadata
from s3parq_spark.fetch import (
    dataset_files,
    fetch_at,
    fetch_changes,
    fetch_path,
    get_all_partition_values,
    get_diff_partition_values,
    get_max_partition_value,
)
from s3parq_spark.publish import (
    compact_dataset,
    delete_where,
    expire_snapshots,
    merge_upsert,
    overwrite_partitions,
    publish_path,
    restore_dataset,
    update_where,
)


@pytest.fixture()
def nation(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/nation.parquet")


@pytest.fixture()
def evolved(spark, nation, tmp_dataset_dir):
    """v1: 10 rows partitioned on n_regionkey; v2: 15 rows partitioned on
    n_name (evolved append). Returns (path, full source frame)."""
    publish_path(spark, tmp_dataset_dir, nation.filter("n_nationkey < 10"), ["n_regionkey"])
    publish_path(
        spark,
        tmp_dataset_dir,
        nation.filter("n_nationkey >= 10"),
        ["n_name"],
        evolve_partitions=True,
    )
    return tmp_dataset_dir, nation


def test_mismatched_append_still_rejected_without_flag(spark, nation, tmp_dataset_dir):
    publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
    with pytest.raises(ValueError, match="partition mismatch"):
        publish_path(spark, tmp_dataset_dir, nation, ["n_name"])


def test_sidecar_records_specs_and_snapshot_stamps(spark, evolved):
    path, _ = evolved
    m = metadata.read_sidecar(spark, path)
    assert [sp["spec_id"] for sp in m.partition_specs] == [1, 2]
    assert m.partition_specs[0]["partitions"] == ["n_regionkey"]
    assert m.partition_specs[1]["partitions"] == ["n_name"]
    # current spec mirrored at top level (pre-evolution readers see it)
    assert m.partitions == ["n_name"]
    assert [s.get("spec") for s in m.snapshots] == [1, 2]
    assert m.is_multi_spec()


def test_full_fetch_unions_both_specs(spark, evolved):
    path, nation = evolved
    got = fetch_path(spark, path)
    assert got.count() == nation.count()
    # every column present with types intact, both the old and new
    # partition columns populated for ALL rows (old slice derives
    # n_regionkey from the path, new slice reads it from the file)
    assert got.filter(F.col("n_regionkey").isNull()).count() == 0
    assert got.filter(F.col("n_name").isNull()).count() == 0
    assert dict(got.dtypes)["n_regionkey"] == "bigint"


def test_filter_on_each_spec_column_is_exact(spark, evolved):
    path, nation = evolved
    for col, val, sql in (
        ("n_regionkey", 1, "n_regionkey = 1"),
        ("n_name", "JAPAN", "n_name = 'JAPAN'"),
    ):
        got = fetch_path(
            spark, path,
            filters=[{"partition": col, "comparison": "==", "values": [val]}],
        )
        assert got.count() == nation.filter(sql).count()


def test_old_spec_slice_prunes_at_its_file_index(spark, evolved):
    path, _ = evolved
    df = fetch_path(
        spark, path,
        filters=[{"partition": "n_regionkey", "comparison": "==", "values": [1]}],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the spec-1 slice carries the predicate as PartitionFilters (file
    # index prune), not only as a row filter
    assert "PartitionFilters" in plan
    assert plan.count("Scan parquet") >= 1


def test_range_filter_and_first_filter_rule(spark, evolved):
    path, nation = evolved
    got = fetch_path(
        spark, path,
        filters=[
            {"partition": "n_regionkey", "comparison": ">=", "values": [3]},
            # second filter on the same column must be ignored (reference rule)
            {"partition": "n_regionkey", "comparison": "==", "values": [0]},
        ],
    )
    assert got.count() == nation.filter("n_regionkey >= 3").count()


def test_filter_on_nonpartition_column_rejected(spark, evolved):
    path, _ = evolved
    with pytest.raises(ValueError, match="matching partition"):
        fetch_path(
            spark, path,
            filters=[{"partition": "n_comment", "comparison": "==", "values": ["x"]}],
        )


def test_range_on_string_rejected_even_cross_spec(spark, evolved):
    path, _ = evolved
    with pytest.raises(ValueError, match="cannot be used on partition types"):
        fetch_path(
            spark, path,
            filters=[{"partition": "n_name", "comparison": ">", "values": ["J"]}],
        )


def test_time_travel_and_changes_across_the_boundary(spark, evolved):
    path, nation = evolved
    assert fetch_at(spark, path, 1).count() == 10
    assert fetch_at(spark, path, 2).count() == nation.count()
    delta = fetch_changes(spark, path, 1, 2)
    assert delta.count() == 15
    # filtered CDC read on the OLD spec's column still works on the
    # new-spec delta (row-level there)
    f = fetch_changes(
        spark, path, 1, 2,
        filters=[{"partition": "n_regionkey", "comparison": "==", "values": [2]}],
    )
    assert f.count() == nation.filter("n_nationkey >= 10 and n_regionkey = 2").count()


def test_partition_value_queries_span_specs(spark, evolved):
    path, nation = evolved
    vals = sorted(get_all_partition_values(path, "", "n_regionkey", spark=spark))
    assert vals == [r[0] for r in nation.select("n_regionkey").distinct().orderBy("n_regionkey").collect()]
    assert get_max_partition_value(path, "", "n_regionkey", spark=spark) == 4
    # A3 string-compare set-diff over the union of path and data values
    diff = get_diff_partition_values(path, "", "n_regionkey", [0, 1, 2, 3, 4, 99], spark=spark)
    assert diff == []
    rev = get_diff_partition_values(
        path, "", "n_regionkey", [0, 1, 2, 3, 4, 99], reverse=True, spark=spark
    )
    assert rev == [99]


def test_partition_scoped_dml_rejected_until_normalized(spark, evolved, nation):
    path, _ = evolved
    up = nation.limit(1)
    with pytest.raises(ValueError, match="single partition spec"):
        merge_upsert(spark, path, up, ["n_nationkey"], "n_regionkey")
    with pytest.raises(ValueError, match="single partition spec"):
        overwrite_partitions(spark, path, up, ["n_name"])
    with pytest.raises(ValueError, match="single partition spec"):
        delete_where(spark, path, "n_nationkey = 0")
    with pytest.raises(ValueError, match="single partition spec"):
        update_where(spark, path, {"n_comment": "'x'"}, "n_nationkey = 0")


def test_compact_normalizes_to_single_spec(spark, evolved):
    path, nation = evolved
    compact_dataset(spark, path)
    m = metadata.read_sidecar(spark, path)
    assert m.partition_specs is None
    assert m.partitions == ["n_name"]
    got = fetch_path(spark, path)
    assert got.count() == nation.count()
    # DML unblocked after normalization
    assert delete_where(spark, path, "n_nationkey = 0") == 1
    assert fetch_path(spark, path).count() == nation.count() - 1


def test_restore_rolls_the_spec_back(spark, evolved):
    path, _ = evolved
    restore_dataset(spark, path, 1)
    m = metadata.read_sidecar(spark, path)
    assert m.partition_specs is None
    assert m.partitions == ["n_regionkey"]
    assert [s.get("spec") for s in m.snapshots] == [None]
    assert fetch_path(spark, path).count() == 10
    # a plain (non-evolving) append now targets the restored spec again
    publish_path(
        spark, path,
        fetch_path(spark, path).limit(1).withColumn("n_nationkey", F.lit(99)),
        ["n_regionkey"],
    )
    assert fetch_path(spark, path).count() == 11


def test_expire_never_squashes_across_the_spec_boundary(spark, nation, tmp_dataset_dir):
    publish_path(spark, tmp_dataset_dir, nation.filter("n_nationkey < 5"), ["n_regionkey"])
    publish_path(spark, tmp_dataset_dir, nation.filter("n_nationkey >= 5 and n_nationkey < 10"), ["n_regionkey"])
    publish_path(spark, tmp_dataset_dir, nation.filter("n_nationkey >= 10"), ["n_name"], evolve_partitions=True)
    # keep_last=1 would squash v1+v2+... but the squash must stop at the
    # spec change: v1+v2 (spec 1) squash into a base; v3 (spec 2) survives
    expired = expire_snapshots(spark, tmp_dataset_dir, keep_last=1)
    assert expired == [1]
    m = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert [(s["version"], s.get("spec")) for s in m.snapshots] == [(2, 1), (3, 2)]
    assert fetch_path(spark, tmp_dataset_dir).count() == nation.count()


def test_evolution_with_new_partition_column_unknown_to_old_files(
    spark, nation, tmp_dataset_dir
):
    """The new spec partitions on a column old files never had: old rows
    read it as NULL (parquet missing-column semantics)."""
    publish_path(spark, tmp_dataset_dir, nation.filter("n_nationkey < 10"), ["n_regionkey"])
    batch = nation.filter("n_nationkey >= 10").withColumn(
        "load_bucket", (F.col("n_nationkey") % 2).cast("long")
    )
    publish_path(spark, tmp_dataset_dir, batch, ["load_bucket"], evolve_partitions=True)
    got = fetch_path(spark, tmp_dataset_dir)
    assert got.count() == nation.count()
    assert got.filter(F.col("load_bucket").isNull()).count() == 10
    f = fetch_path(
        spark, tmp_dataset_dir,
        filters=[{"partition": "load_bucket", "comparison": "==", "values": [1]}],
    )
    assert f.count() == batch.filter("load_bucket = 1").count()
    # NULL-partition addressing reaches the old slice
    nulls = fetch_path(
        spark, tmp_dataset_dir,
        filters=[{"partition": "load_bucket", "comparison": "==", "values": [None]}],
    )
    assert nulls.count() == 10


def test_dataset_files_reports_both_layouts(spark, evolved):
    path, _ = evolved
    ft = dataset_files(spark, path)
    assert "n_regionkey" in ft.columns and "n_name" in ft.columns
    # each file carries exactly its own spec's path values
    both = ft.filter(
        F.col("n_regionkey").isNotNull() & F.col("n_name").isNotNull()
    )
    assert both.count() == 0


def test_evolved_dataset_with_derived_partitions(spark, sf_dir, tmp_dataset_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    old = orders.filter("o_orderkey % 2 = 0")
    new = orders.filter("o_orderkey % 2 = 1")
    publish_path(spark, tmp_dataset_dir, old, ["o_orderpriority"])
    publish_path(
        spark,
        tmp_dataset_dir,
        new,
        [],
        derived_partitions={"order_month": "date_format(o_orderdate, 'yyyy-MM')"},
        evolve_partitions=True,
    )
    got = fetch_path(spark, tmp_dataset_dir)
    assert got.count() == orders.count()
    # hidden-partition pushdown on the NEW spec composes with the union:
    # a filter on the source column stays exact across both slices
    f = fetch_path(
        spark,
        tmp_dataset_dir,
        filters=[
            {"partition": "o_orderdate", "comparison": ">=", "values": ["1997-01-01 00:00:00"]}
        ],
    )
    assert f.count() == orders.filter("o_orderdate >= '1997-01-01'").count()


# ---------------------------------------------------------------------------
# property: evolved-fetch filter routing ≡ post-hoc row filtering
# ---------------------------------------------------------------------------


def _truth_table_keep(row, filters):
    """The reference truth table (OR across a filter's values, AND across
    partitions, first filter per partition, SQL NULL semantics) evaluated
    driver-side on a collected row."""
    import operator

    OPS = {
        "==": operator.eq, "!=": operator.ne, ">": operator.gt,
        "<": operator.lt, ">=": operator.ge, "<=": operator.le,
    }
    seen = set()
    for f in filters:
        col = f["partition"]
        if col in seen:
            continue
        seen.add(col)
        x = row[col]
        if x is None:
            if not (f["comparison"] == "==" and any(v is None for v in f["values"])):
                return False
            continue
        op = OPS[f["comparison"]]
        if not any(v is not None and op(x, v) for v in f["values"]):
            return False
    return True


def test_evolved_filter_routing_matches_truth_table(spark, nation, tmp_dataset_dir):
    """Across a partition-evolved dataset, every filter combination must
    return exactly the rows the truth table admits — whichever spec each
    row's file lives under (partition prune in one slice, row predicate in
    the other). Sweeps a grid of filters over BOTH specs' columns."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    publish_path(spark, tmp_dataset_dir, nation.filter("n_nationkey < 10"), ["n_regionkey"])
    publish_path(
        spark, tmp_dataset_dir, nation.filter("n_nationkey >= 10"), ["n_name"],
        evolve_partitions=True,
    )
    all_rows = [r.asDict() for r in fetch_path(spark, tmp_dataset_dir).collect()]
    assert len(all_rows) == 25

    filter_st = st.lists(
        st.fixed_dictionaries(
            {
                "partition": st.sampled_from(["n_regionkey", "n_name"]),
                "comparison": st.sampled_from(["==", "!=", ">", "<", ">=", "<="]),
                "values": st.lists(
                    st.one_of(
                        st.integers(min_value=-1, max_value=5),
                        st.sampled_from(["JAPAN", "FRANCE", "NOPE"]),
                        st.none(),
                    ),
                    min_size=1, max_size=2,
                ),
            }
        ),
        min_size=0, max_size=2,
    )

    @given(filters=filter_st)
    @settings(
        max_examples=25, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(filters):
        # respect the API's own validation rules: skip combos fetch rejects
        # for BOTH engines identically (single-value inequalities, no
        # ranges on strings, type-compatible values)
        try:
            got = fetch_path(spark, tmp_dataset_dir, list(filters)).collect()
        except (ValueError, TypeError):
            return
        expected = [r for r in all_rows if _truth_table_keep(r, filters)]
        assert sorted(r["n_nationkey"] for r in got) == sorted(
            r["n_nationkey"] for r in expected
        ), filters

    run()


def test_cross_spec_filter_on_derived_column_rederives(spark, sf_dir, tmp_dataset_dir):
    """A filter naming spec-1's DERIVED partition column must match spec-2
    rows too: the column exists in neither spec-2's paths nor its data
    files, so the slice re-derives it from the recorded transform."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    old = orders.filter("o_orderkey % 2 = 0")
    new = orders.filter("o_orderkey % 2 = 1")
    publish_path(
        spark, tmp_dataset_dir, old, [],
        derived_partitions={"order_month": "date_format(o_orderdate, 'yyyy-MM')"},
    )
    publish_path(
        spark, tmp_dataset_dir, new, ["o_orderpriority"], evolve_partitions=True
    )
    got = fetch_path(
        spark, tmp_dataset_dir,
        filters=[{"partition": "order_month", "comparison": "==", "values": ["1997-03"]}],
    )
    exp = orders.filter("date_format(o_orderdate, 'yyyy-MM') = '1997-03'")
    assert got.count() == exp.count()
    # both parities present: the v2 slice contributed its rows
    assert got.filter("o_orderkey % 2 = 1").count() == exp.filter(
        "o_orderkey % 2 = 1"
    ).count()
    # the full fetch surfaces the derived column computed for v2 rows too
    full = fetch_path(spark, tmp_dataset_dir)
    assert full.filter(F.col("order_month").isNull()).count() == 0
    # and A1 sees the union of path values and re-derived values
    vals = get_all_partition_values(tmp_dataset_dir, "", "order_month", spark=spark)
    exp_vals = {
        r[0]
        for r in orders.selectExpr(
            "date_format(o_orderdate, 'yyyy-MM') m"
        ).distinct().collect()
    }
    assert set(vals) == exp_vals


def test_rename_drop_guard_archived_spec_partitions(spark, evolved):
    from s3parq_spark.publish import drop_column, rename_column

    path, _ = evolved  # spec1 on n_regionkey (archived), spec2 on n_name
    with pytest.raises(ValueError, match="partition column \\(spec 1\\)"):
        rename_column(spark, path, "n_regionkey", "region_id")
    with pytest.raises(ValueError, match="partition column \\(spec 1\\)"):
        drop_column(spark, path, "n_regionkey")
    # a plain value column still renames fine on an evolved dataset
    rename_column(spark, path, "n_nationkey", "nation_id")
    assert "nation_id" in fetch_path(spark, path).columns


def test_expire_squashes_per_spec_run(spark, nation, tmp_dataset_dir):
    """Expiry keeps bounding history after an evolution: one base per
    contiguous same-spec run, never a cross-spec merge, never a no-op."""
    publish_path(spark, tmp_dataset_dir, nation.filter("n_nationkey < 5"), ["n_regionkey"])
    publish_path(
        spark, tmp_dataset_dir,
        nation.filter("n_nationkey >= 5 and n_nationkey < 10"), ["n_name"],
        evolve_partitions=True,
    )
    publish_path(spark, tmp_dataset_dir, nation.filter("n_nationkey >= 10 and n_nationkey < 15"), ["n_name"])
    publish_path(spark, tmp_dataset_dir, nation.filter("n_nationkey >= 15"), ["n_name"])
    expired = expire_snapshots(spark, tmp_dataset_dir, keep_last=1)
    # squash range = v1(spec1), v2+v3(spec2): spec-1 run is a singleton
    # base, spec-2 run squashes v2 into the v3 base
    assert expired == [2]
    m = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert [(s["version"], s.get("spec")) for s in m.snapshots] == [
        (1, 1), (3, 2), (4, 2),
    ]
    assert fetch_path(spark, tmp_dataset_dir).count() == nation.count()
    assert fetch_at(spark, tmp_dataset_dir, 3).count() == 15

def test_diff_values_type_both_sides_on_mixed_renderings(
    spark, tmp_dataset_dir
):
    """r7 ADVICE (medium): on an evolved dataset the same float value
    arrives as a hive-path rendering ('1.0E-7') and a str() rendering
    ('1e-07'); get_diff_partition_values must type both sides before
    diffing — a raw string diff falsely reports the value as a diff and
    returns it twice on the empty-values_to_diff branch."""
    df = spark.createDataFrame(
        [(1, 1e-07, "a"), (2, 0.5, "b")], ["id", "rate", "tag"]
    )
    publish_path(spark, tmp_dataset_dir, df, ["rate"])
    df2 = spark.createDataFrame(
        [(3, 1e-07, "c"), (4, 2.5, "d")], ["id", "rate", "tag"]
    )
    # evolved append: rate moves from hive path to the data files
    publish_path(spark, tmp_dataset_dir, df2, ["tag"], evolve_partitions=True)
    # both renderings of 1e-07 are present; a string set-diff would
    # report one of them as "missing" from [1e-07, 0.5, 2.5]
    diff = get_diff_partition_values(
        tmp_dataset_dir, "", "rate", [1e-07, 0.5, 2.5], spark=spark
    )
    assert diff == []
    rev = get_diff_partition_values(
        tmp_dataset_dir, "", "rate", [1e-07, 0.5, 2.5, 9.0],
        reverse=True, spark=spark,
    )
    assert rev == [9.0]
    # empty values_to_diff: each value exactly once, typed
    all_vals = get_diff_partition_values(
        tmp_dataset_dir, "", "rate", [], spark=spark
    )
    assert sorted(all_vals) == [1e-07, 0.5, 2.5]


def test_unattributable_file_raises_not_misplans(spark, evolved):
    """r7 ADVICE: a multi-spec dataset whose snapshot history was cleared
    (listing fallback) has files with NO known hive layout; the per-spec
    union must raise loudly instead of guessing the newest spec."""
    path, _ = evolved
    meta = metadata.read_sidecar(spark, path)
    meta.snapshots = []
    metadata.write_sidecar(spark, path, meta)
    with pytest.raises(ValueError, match="not attributable"):
        fetch_path(spark, path).count()
