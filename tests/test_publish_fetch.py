"""Round-trip tests for publish/fetch — the reference's defining E2E check
(``/root/reference/tests/test_integration.py:14-49``): publish partitioned,
fetch back, values/columns/dtypes equal; row order is NOT part of the
contract."""

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from s3parq_spark import (
    fetch,
    fetch_diff,
    get_all_files_list,
    publish,
)
from s3parq_spark.fetch import MissingS3ParqMetadata, fetch_path
from s3parq_spark.publish import publish_path
from s3parq_spark.metadata import read_sidecar


def grouped_pdf(n=100):
    """FIXTURES.md F1-style mixed frame: low-cardinality typed columns."""
    base = datetime.datetime(2024, 1, 1)
    return pd.DataFrame(
        {
            "string_col": [f"s{i % 3}" for i in range(n)],
            "int_col": [i % 3 for i in range(n)],
            "float_col": [float(i % 3) + 0.5 for i in range(n)],
            "bool_col": [i % 2 == 0 for i in range(n)],
            "datetime_col": [base + datetime.timedelta(days=i % 3) for i in range(n)],
            "text_col": [f"text-{i}" for i in range(n)],
            "metrics": list(range(n)),
        }
    )


def assert_round_trip_equal(expected_pdf, got_pdf):
    cols = sorted(expected_pdf.columns)
    e = expected_pdf[cols].sort_values(cols).reset_index(drop=True)
    g = got_pdf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(e, g, check_dtype=False)


def test_round_trip_multi_partition(spark, tmp_dataset_dir):
    pdf = grouped_pdf(200)
    files = publish(tmp_dataset_dir, "", ["string_col", "int_col"], pdf, spark=spark)
    assert files and all(f.endswith(".parquet") for f in files)
    assert all("string_col=" in f and "int_col=" in f for f in files)

    got = fetch(tmp_dataset_dir, "", spark=spark, as_pandas=True)
    assert_round_trip_equal(pdf, got)
    # declared partition types round-trip via the sidecar
    meta = read_sidecar(spark, tmp_dataset_dir)
    assert meta.partition_data_types == {"string_col": "string", "int_col": "integer"}


def test_round_trip_all_partition_types(spark, tmp_dataset_dir):
    pdf = grouped_pdf(60)
    parts = ["string_col", "int_col", "float_col", "bool_col", "datetime_col"]
    publish(tmp_dataset_dir, "", parts, pdf, spark=spark)
    meta = read_sidecar(spark, tmp_dataset_dir)
    assert meta.partition_data_types == {
        "string_col": "string",
        "int_col": "integer",
        "float_col": "float",
        "bool_col": "boolean",
        "datetime_col": "datetime",
    }
    got = fetch(tmp_dataset_dir, "", spark=spark, as_pandas=True)
    assert_round_trip_equal(pdf, got)
    # partition dtypes restored, not inferred: bool stays bool, string stays str
    sdf = fetch(tmp_dataset_dir, "", spark=spark)
    dt = dict(sdf.dtypes)
    assert dt["bool_col"] == "boolean"
    assert dt["string_col"] == "string"
    assert dt["datetime_col"] == "timestamp"
    assert dt["int_col"] == "bigint"
    assert dt["float_col"] == "double"


def test_fetch_with_eq_filter(spark, tmp_dataset_dir):
    pdf = grouped_pdf(90)
    publish(tmp_dataset_dir, "", ["string_col"], pdf, spark=spark)
    got = fetch(
        tmp_dataset_dir,
        "",
        filters=[{"partition": "string_col", "comparison": "==", "values": ["s1"]}],
        spark=spark,
        as_pandas=True,
    )
    assert_round_trip_equal(pdf[pdf.string_col == "s1"], got)


def test_fetch_filter_or_across_values_and_across_partitions(spark, tmp_dataset_dir):
    pdf = grouped_pdf(90)
    publish(tmp_dataset_dir, "", ["string_col", "int_col"], pdf, spark=spark)
    got = fetch(
        tmp_dataset_dir,
        "",
        filters=[
            {"partition": "string_col", "comparison": "==", "values": ["s0", "s2"]},
            {"partition": "int_col", "comparison": ">", "values": [0]},
        ],
        spark=spark,
        as_pandas=True,
    )
    exp = pdf[pdf.string_col.isin(["s0", "s2"]) & (pdf.int_col > 0)]
    assert_round_trip_equal(exp, got)


def test_fetch_first_filter_per_partition_wins(spark, tmp_dataset_dir):
    # reference applies only the FIRST filter naming a partition
    # (fetch_parq.py:469)
    pdf = grouped_pdf(90)
    publish(tmp_dataset_dir, "", ["int_col"], pdf, spark=spark)
    got = fetch(
        tmp_dataset_dir,
        "",
        filters=[
            {"partition": "int_col", "comparison": "==", "values": [1]},
            {"partition": "int_col", "comparison": "==", "values": [2]},
        ],
        spark=spark,
        as_pandas=True,
    )
    assert_round_trip_equal(pdf[pdf.int_col == 1], got)


def test_fetch_datetime_partition_filter(spark, tmp_dataset_dir):
    pdf = grouped_pdf(60)
    publish(tmp_dataset_dir, "", ["datetime_col"], pdf, spark=spark)
    got = fetch(
        tmp_dataset_dir,
        "",
        filters=[
            {
                "partition": "datetime_col",
                "comparison": ">=",
                "values": ["2024-01-02 00:00:00"],
            }
        ],
        spark=spark,
        as_pandas=True,
    )
    exp = pdf[pdf.datetime_col >= datetime.datetime(2024, 1, 2)]
    assert_round_trip_equal(exp, got)


def test_empty_result_preserves_schema(spark, tmp_dataset_dir):
    # F7 (fetch_parq.py:220-227): pruning everything still returns the schema
    pdf = grouped_pdf(30)
    publish(tmp_dataset_dir, "", ["string_col"], pdf, spark=spark)
    got = fetch(
        tmp_dataset_dir,
        "",
        filters=[{"partition": "string_col", "comparison": "==", "values": ["nope"]}],
        spark=spark,
        as_pandas=True,
    )
    assert len(got) == 0
    assert sorted(got.columns) == sorted(pdf.columns)


def test_fetch_empty_dataset(spark, tmp_dataset_dir):
    got = fetch(tmp_dataset_dir, "missing", spark=spark, as_pandas=True)
    assert len(got) == 0


def test_append_publish_accumulates(spark, tmp_dataset_dir):
    pdf = grouped_pdf(30)
    publish(tmp_dataset_dir, "", ["string_col"], pdf, spark=spark)
    new_files = publish(tmp_dataset_dir, "", ["string_col"], pdf, spark=spark)
    assert new_files  # second publish reports only its own files
    got = fetch(tmp_dataset_dir, "", spark=spark, as_pandas=True)
    assert len(got) == 60


def test_append_partition_mismatch_rejected(spark, tmp_dataset_dir):
    pdf = grouped_pdf(30)
    publish(tmp_dataset_dir, "", ["string_col"], pdf, spark=spark)
    with pytest.raises(ValueError, match="partition mismatch"):
        publish(tmp_dataset_dir, "", ["int_col"], pdf, spark=spark)


def test_publish_empty_rejected(spark, tmp_dataset_dir):
    with pytest.raises(ValueError, match="empty"):
        publish(tmp_dataset_dir, "", ["string_col"], grouped_pdf(10).head(0), spark=spark)


def test_publish_reserved_partition_rejected(spark, tmp_dataset_dir):
    pdf = grouped_pdf(10).rename(columns={"string_col": "date"})
    with pytest.raises(ValueError, match="reserved"):
        publish(tmp_dataset_dir, "", ["date"], pdf, spark=spark)


def test_publish_new_files_scoped_listing_matches_full_diff(spark, tmp_path):
    """The partition-scoped new-file report equals a ground-truth full
    before/after diff, across partition value types (incl. escaping-needing
    strings, bools, floats, datetimes and nulls)."""
    from s3parq_spark.fs import list_files

    base = str(tmp_path / "ds")
    pdf = pd.DataFrame(
        {
            "s": ["a b", "x:y", "plain", None] * 6,
            "b": [True, False, True, False] * 6,
            "f": [0.5, 1.25, 0.5, 2.0] * 6,
            "d": [datetime.datetime(2024, 1, 1 + i % 2) for i in range(24)],
            "v": list(range(24)),
        }
    )
    publish_path(spark, base, pdf, ["s", "b"])
    snapshot = set(list_files(spark, base))
    add = pdf[pdf.s == "a b"]
    got = publish_path(spark, base, add, ["s", "b"])
    truth = sorted(set(list_files(spark, base)) - snapshot)
    assert sorted(got) == truth
    assert truth  # the append really added files
    assert all(f.startswith("s=a b/") or f.startswith("s=a%20b/") for f in got)
    # multi-type partitioning round #2: float + datetime + null dirs
    base2 = str(tmp_path / "ds2")
    publish_path(spark, base2, pdf, ["f", "d"])
    snapshot2 = set(list_files(spark, base2))
    got2 = publish_path(spark, base2, pdf[pdf.f == 1.25], ["f", "d"])
    truth2 = sorted(set(list_files(spark, base2)) - snapshot2)
    assert sorted(got2) == truth2 and truth2


def test_compact_dataset(spark, tmp_path):
    """Small-file compaction: file count collapses, data + sidecar typing
    survive, filtered fetch still prunes."""
    from s3parq_spark.fs import list_files
    from s3parq_spark.publish import compact_dataset

    base = str(tmp_path / "ds")
    pdf = grouped_pdf(300)
    # force lots of tiny files (micro-batch ingestion shape)
    publish_path(spark, base, pdf, ["string_col"], max_records_per_file=10)
    n_before = len(list_files(spark, base))
    assert n_before >= 30
    before = fetch(base, "", spark=spark, as_pandas=True)
    new_files = compact_dataset(spark, base)
    assert len(new_files) < n_before / 3
    got = fetch(base, "", spark=spark, as_pandas=True)
    assert_round_trip_equal(before, got)
    filtered = fetch(
        base, "",
        filters=[{"partition": "string_col", "comparison": "==", "values": ["s1"]}],
        spark=spark, as_pandas=True,
    )
    assert set(filtered["string_col"]) == {"s1"}


def test_publish_rejects_timedelta(spark, tmp_dataset_dir):
    # reference parity: publish_parq.py:33-50 + the dtype-mapper rejection
    # at :354-356 — timedelta columns raise NotImplementedError
    pdf = grouped_pdf(10)
    pdf["time_col"] = pd.Timedelta("1 days")
    with pytest.raises(NotImplementedError, match="timedelta"):
        publish(tmp_dataset_dir, "", ["string_col"], pdf, spark=spark)


def test_publish_rejects_interval_spark_df(spark, tmp_dataset_dir):
    df = spark.range(3).withColumn(
        "iv", F.expr("INTERVAL 1 DAY") + F.expr("make_dt_interval(0, 0, 0, id)")
    )
    with pytest.raises(NotImplementedError, match="interval"):
        publish_path(spark, tmp_dataset_dir, df, [])


def test_publish_mixed_object_column_coerced(spark, tmp_dataset_dir):
    # reference parity: publish_parq.py:185-202 — a mixed-type object column
    # fails the first conversion and retries with object→string coercion
    pdf = grouped_pdf(10)
    pdf["mixed"] = ["x"] * 9 + [5]  # object dtype, str + int
    publish(tmp_dataset_dir, "", ["string_col"], pdf, spark=spark)
    got = fetch(tmp_dataset_dir, "", spark=spark, as_pandas=True)
    assert set(got["mixed"]) == {"x", "5"}


def test_non_s3parq_dataset(spark, tmp_dataset_dir, sf_dir):
    # plain parquet (no sidecar): fetch whole is allowed by default,
    # rejected when accept_not_s3parq=False (fetch_parq.py:174-200,649-654)
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    df.write.parquet(tmp_dataset_dir)
    got = fetch(tmp_dataset_dir, "", spark=spark, as_pandas=True)
    assert len(got) == df.count()
    with pytest.raises(MissingS3ParqMetadata):
        fetch(tmp_dataset_dir, "", accept_not_s3parq=False, spark=spark)
    # filters against a non-s3parq dataset have no partitions to match
    with pytest.raises(ValueError, match="matching partition"):
        fetch(
            tmp_dataset_dir,
            "",
            filters=[{"partition": "r_name", "comparison": "==", "values": ["ASIA"]}],
            spark=spark,
        )


def test_fetch_diff(spark, tmp_path):
    inp, cmp = str(tmp_path / "inp"), str(tmp_path / "cmp")
    pdf = grouped_pdf(90)
    publish(inp, "", ["string_col"], pdf, spark=spark)
    publish(cmp, "", ["string_col"], pdf[pdf.string_col != "s1"], spark=spark)

    got = fetch_diff(inp, "", cmp, "", "string_col", spark=spark, as_pandas=True)
    assert_round_trip_equal(pdf[pdf.string_col == "s1"], got)

    # reverse: comparison minus input = nothing
    got_rev = fetch_diff(
        inp, "", cmp, "", "string_col", reverse=True, spark=spark, as_pandas=True
    )
    assert len(got_rev) == 0

    # empty comparison: everything differs
    got_all = fetch_diff(
        inp, "", str(tmp_path / "nope"), "", "string_col", spark=spark, as_pandas=True
    )
    assert len(got_all) == len(pdf)


def test_fetch_diff_fallback_branches(spark, tmp_path):
    """r15: fetch_diff's pruned-scan fast path must fall back — with
    identical results — when its preconditions fail: a comparison with
    pending MoR deletes (manifest values could over-subtract) keeps the
    legacy scan-side anti-join; a null input partition keeps the
    anti-join fed from manifest values (nulls always survive an equality
    anti-join); a declared-type mismatch keeps the anti-join with the
    legacy cast."""
    import numpy as np

    from s3parq_spark.publish import delete_where
    from s3parq_spark.fetch import fetch_diff_path

    # --- pending MoR tombstones on the comparison side
    inp, cmp = str(tmp_path / "inp"), str(tmp_path / "cmp")
    pdf = grouped_pdf(90)
    publish(inp, "", ["string_col"], pdf, spark=spark)
    publish(cmp, "", ["string_col"], pdf, spark=spark)
    # tombstone every s1 row in the comparison WITHOUT materializing:
    # manifest still lists s1, live rows do not — the diff must NOT
    # subtract s1 (the legacy scan sees no live s1 rows)
    delete_where(spark, cmp, "string_col = 's1'", mode="merge-on-read")
    got = fetch_diff_path(spark, inp, cmp, "string_col").toPandas()
    assert set(got["string_col"]) == {"s1"}
    assert len(got) == len(pdf[pdf.string_col == "s1"])

    # --- null partition value in the input: nulls always survive
    inp2, cmp2 = str(tmp_path / "inp2"), str(tmp_path / "cmp2")
    pdf2 = grouped_pdf(60)
    pdf2.loc[pdf2.index[:10], "string_col"] = None
    publish(inp2, "", ["string_col"], pdf2, spark=spark)
    publish(
        cmp2, "", ["string_col"],
        pdf2[pdf2.string_col.notna() & (pdf2.string_col != "s2")],
        spark=spark,
    )
    got2 = fetch_diff_path(spark, inp2, cmp2, "string_col").toPandas()
    assert len(got2) == len(
        pdf2[pdf2.string_col.isna() | (pdf2.string_col == "s2")]
    )
    assert got2["string_col"].isna().sum() == 10

    # --- declared-type mismatch: int input partition vs string comparison
    inp3, cmp3 = str(tmp_path / "inp3"), str(tmp_path / "cmp3")
    pdf3 = grouped_pdf(40).assign(
        num_col=lambda d: (np.arange(len(d)) % 4).astype("int64")
    )
    publish(inp3, "", ["num_col"], pdf3, spark=spark)
    publish(
        cmp3, "", ["num_col"],
        pdf3[pdf3.num_col < 2].assign(num_col=lambda d: d.num_col.astype(str)),
        spark=spark,
    )
    got3 = fetch_diff_path(spark, inp3, cmp3, "num_col").toPandas()
    assert sorted(got3["num_col"].unique()) == [2, 3]
    assert len(got3) == len(pdf3[pdf3.num_col >= 2])


def test_spark_native_publish(spark, tmp_dataset_dir, sf_dir):
    # Spark DataFrame in, no pandas round-trip
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    publish(tmp_dataset_dir, "", ["l_returnflag"], df, spark=spark)
    got = fetch_path(
        spark,
        tmp_dataset_dir,
        filters=[{"partition": "l_returnflag", "comparison": "==", "values": ["R"]}],
    )
    exp = df.filter(F.col("l_returnflag") == "R")
    assert got.count() == exp.count()
    assert set(got.columns) == set(df.columns)


def test_get_all_files_list(spark, tmp_dataset_dir):
    publish(tmp_dataset_dir, "", ["string_col"], grouped_pdf(30), spark=spark)
    files = get_all_files_list(tmp_dataset_dir, "", spark=spark)
    assert files and all(f.endswith(".parquet") for f in files)
    assert all(f.startswith("string_col=") for f in files)


def test_fetch_filter_prunes_at_file_index(spark, sf_dir, tmp_dataset_dir):
    """Plan-level guard: a partition filter must appear as PartitionFilters
    on the scan node (pruned at the file index, before any I/O — the
    reference's defining guarantee, fetch_parq.py:450-498), and the value
    predicate must NOT appear as a post-scan row Filter."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    publish_path(spark, tmp_dataset_dir, li, ["l_returnflag"])
    df = fetch_path(
        spark,
        tmp_dataset_dir,
        filters=[{"partition": "l_returnflag", "comparison": "==", "values": ["R"]}],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    scan_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "l_returnflag" in scan_line and "= R" in scan_line


def test_attach_sql_front_door(spark, sf_dir, tmp_dataset_dir):
    """attach() registers the dataset for spark.sql; partition predicates in
    the SQL still reach PartitionFilters (pruned scan, not a row filter)."""
    from s3parq_spark.fetch import attach

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    publish_path(spark, tmp_dataset_dir, li, ["l_returnflag"])
    attach(spark, tmp_dataset_dir, "li_ds")
    out = spark.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM li_ds "
        "WHERE l_returnflag = 'R' GROUP BY l_returnflag"
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].l_returnflag == "R" and rows[0].n > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "= R" in plan


def test_compact_dataset_sort_by_clusters_rows(spark, tmp_path):
    """sort_by compaction: rows inside each written file are clustered on
    the sort column (per-file min/max ranges are disjoint-ish, the row-group
    skipping precondition), and data + typing survive."""
    from s3parq_spark.fs import list_files
    from s3parq_spark.publish import compact_dataset

    base = str(tmp_path / "ds")
    pdf = grouped_pdf(300)
    publish_path(spark, base, pdf, ["string_col"], max_records_per_file=10)
    before = fetch(base, "", spark=spark, as_pandas=True)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sort_by"):
        compact_dataset(spark, base, sort_by=["not_a_col"])
    compact_dataset(spark, base, sort_by=["int_col"], max_records_per_file=25)
    got = fetch(base, "", spark=spark, as_pandas=True)
    assert_round_trip_equal(before, got)
    # EVERY parquet file is internally sorted on int_col (multiple files
    # per hive partition, so the writer's own partition-key sort would
    # scramble this if the sort prefix were wrong)
    files = list_files(spark, base)
    assert len(files) > 3
    for f in files:
        vals = [r.int_col for r in spark.read.parquet(f"{base}/{f}").collect()]
        assert vals == sorted(vals)


def test_append_schema_evolution_new_column(spark, tmp_path):
    """Appending a frame with an extra column widens the sidecar (union of
    columns, same types); the explicit read schema then fills the missing
    column with nulls for pre-evolution files."""
    base = str(tmp_path / "ds")
    pdf = grouped_pdf(40)
    publish_path(spark, base, pdf, ["string_col"])
    pdf2 = grouped_pdf(40)
    pdf2["extra_col"] = 7.5
    publish_path(spark, base, pdf2, ["string_col"])
    got = fetch(base, "", spark=spark, as_pandas=True)
    assert "extra_col" in got.columns
    assert len(got) == 80
    assert got["extra_col"].isna().sum() == 40
    assert (got["extra_col"].dropna() == 7.5).all()


def test_append_type_conflict_rejected(spark, tmp_path):
    base = str(tmp_path / "ds")
    pdf = grouped_pdf(20)
    publish_path(spark, base, pdf, ["string_col"])
    bad = grouped_pdf(20)
    bad["int_col"] = bad["int_col"].astype(str)  # int -> string conflict
    import pytest as _pytest

    with _pytest.raises(ValueError, match="type mismatch"):
        publish_path(spark, base, bad, ["string_col"])


def test_compact_dataset_zorder_clusters_2d(spark, tmp_path):
    """Z-order compaction: files cover tight 2-D bounding boxes (the
    multi-dimension row-group-skipping precondition), data survives."""
    import pandas as pd

    from s3parq_spark.fs import list_files
    from s3parq_spark.publish import compact_dataset

    base = str(tmp_path / "ds")
    grid = pd.DataFrame(
        [(x, y, "p") for x in range(64) for y in range(64)],
        columns=["x", "y", "part_col"],
    )
    publish_path(spark, base, grid, ["part_col"], max_records_per_file=111)
    before = fetch(base, "", spark=spark, as_pandas=True)
    compact_dataset(spark, base, zorder_by=["x", "y"], max_records_per_file=256)
    assert read_sidecar(spark, base).sort_columns == ["z(x, y)"]
    got = fetch(base, "", spark=spark, as_pandas=True)
    assert sorted(map(tuple, before[["x", "y"]].values.tolist())) == sorted(
        map(tuple, got[["x", "y"]].values.tolist())
    )
    files = list_files(spark, base)
    assert len(files) >= 8
    area = 0.0
    for f in files:
        pdf = spark.read.parquet(f"{base}/{f}").toPandas()
        area += (pdf.x.max() - pdf.x.min() + 1) * (pdf.y.max() - pdf.y.min() + 1)
    # random row order would give every file the full 64x64 box
    # (sum ~= nfiles * 4096); z-order keeps the union of boxes near the
    # domain size. Allow 3x for boundary-straddling boxes.
    assert area <= 3 * 64 * 64, area


def test_zorder_rejects_bad_args(spark, tmp_path):
    from s3parq_spark.publish import compact_dataset

    base = str(tmp_path / "ds")
    publish_path(spark, base, grouped_pdf(30), ["string_col"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not both"):
        compact_dataset(spark, base, sort_by=["int_col"], zorder_by=["int_col"])
    with _pytest.raises(ValueError, match="zorder_by columns"):
        compact_dataset(spark, base, zorder_by=["nope"])


class TestFetchColumnProjection:
    def test_columns_prune_read_schema(self, spark, tmp_dataset_dir):
        pdf = grouped_pdf()
        publish_path(spark, tmp_dataset_dir, pdf, ["string_col"])
        df = fetch_path(
            spark, tmp_dataset_dir, columns=["metrics", "string_col"]
        )
        assert df.columns == ["metrics", "string_col"]
        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(jmode)
        import re

        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        # partition col comes from the path, data schema must be metrics only
        assert m and m.group(1) == "metrics:bigint"

    def test_columns_with_filter_not_in_projection(self, spark, tmp_dataset_dir):
        pdf = grouped_pdf()
        publish_path(spark, tmp_dataset_dir, pdf, ["string_col"])
        df = fetch_path(
            spark,
            tmp_dataset_dir,
            filters=[
                {"partition": "string_col", "comparison": "==", "values": ["s1"]}
            ],
            columns=["metrics"],
        )
        assert df.columns == ["metrics"]
        got = sorted(r["metrics"] for r in df.collect())
        want = sorted(pdf[pdf.string_col == "s1"].metrics)
        assert got == want

    def test_unknown_column_rejected(self, spark, tmp_dataset_dir):
        publish_path(spark, tmp_dataset_dir, grouped_pdf(), ["string_col"])
        with pytest.raises(ValueError, match="unknown columns"):
            fetch_path(spark, tmp_dataset_dir, columns=["nope"])

def test_vacuum_dataset_removes_orphans_only(spark, tmp_path):
    """Vacuum deletes files on storage that no manifest acknowledges
    (failed-write orphans) and nothing else; dry_run reports without
    deleting; cleared history refuses to vacuum."""
    import os
    import shutil

    import pytest as _pytest

    from s3parq_spark.fs import list_files
    from s3parq_spark.publish import overwrite_partitions, vacuum_dataset
    from s3parq_spark import fetch, vacuum_dataset as exported

    assert exported is vacuum_dataset  # public surface

    base = str(tmp_path / "ds")
    publish_path(spark, base, grouped_pdf(60), ["string_col"])
    before_files = sorted(list_files(spark, base))
    before = fetch(base, "", spark=spark, as_pandas=True)

    # plant an orphan: copy a real data file to an unacknowledged name
    rel = before_files[0]
    src = os.path.join(base, rel)
    orphan_rel = rel.rsplit("/", 1)[0] + "/part-orphan.parquet"
    shutil.copy(src, os.path.join(base, orphan_rel))
    assert len(list_files(spark, base)) == len(before_files) + 1
    # metadata and data planes agree: fetch scans the manifest's file list,
    # so the orphan is invisible to it — but a raw directory read sees the
    # extra rows (the pollution vacuum physically removes)
    assert len(fetch(base, "", spark=spark, as_pandas=True)) == len(before)
    raw_rows = spark.read.parquet(base).count()
    assert raw_rows > len(before)

    # the retention window guards the in-flight-publish race: a
    # just-written file is never reported, even as an orphan
    assert vacuum_dataset(spark, base, dry_run=True) == []

    reported = vacuum_dataset(spark, base, dry_run=True, retention_hours=0)
    assert reported == [orphan_rel]
    assert len(list_files(spark, base)) == len(before_files) + 1  # not deleted

    deleted = vacuum_dataset(spark, base, retention_hours=0)
    assert deleted == [orphan_rel]
    assert sorted(list_files(spark, base)) == before_files
    after = fetch(base, "", spark=spark, as_pandas=True)
    assert_round_trip_equal(before, after)

    # destructive rewrite clears history -> vacuum refuses
    overwrite_partitions(spark, base, grouped_pdf(10), ["string_col"])
    with _pytest.raises(ValueError, match="no snapshot history"):
        vacuum_dataset(spark, base)


def test_array_value_columns_round_trip(spark, tmp_path):
    """array<...> value columns (embeddings, token-id lists) publish and
    fetch with full value fidelity: the sidecar records array<elem> vocab,
    the explicit read schema rebuilds ArrayType, element widths normalize
    exactly as scalars do (float32 data reads back as array<double>).
    Array columns are value-only — partitioning on one is rejected."""
    from pyspark.sql import types as T

    from s3parq_spark.metadata import spark_type_to_vocab, vocab_to_spark_type

    # vocab mapping both ways
    assert spark_type_to_vocab(T.ArrayType(T.FloatType())) == "array<float>"
    assert vocab_to_spark_type("array<float>") == T.ArrayType(T.DoubleType(), True)
    assert vocab_to_spark_type("array<integer>") == T.ArrayType(T.LongType(), True)

    base = str(tmp_path / "arr_ds")
    df = spark.createDataFrame(
        [(i, [float(i), float(i) + 0.5], [f"t{i}", "x"], i % 2) for i in range(20)],
        "id bigint, vec array<double>, toks array<string>, grp int",
    )
    publish_path(spark, base, df, ["grp"])

    meta = read_sidecar(spark, base)
    assert meta.column_types["vec"] == "array<float>"
    assert meta.column_types["toks"] == "array<string>"

    got = fetch_path(spark, base)
    assert dict(got.dtypes)["vec"] == "array<double>"
    assert dict(got.dtypes)["toks"] == "array<string>"
    rows = {r["id"]: r for r in got.collect()}
    assert len(rows) == 20
    assert rows[3]["vec"] == [3.0, 3.5]
    assert rows[3]["toks"] == ["t3", "x"]

    with pytest.raises(ValueError, match="array type"):
        publish_path(spark, str(tmp_path / "bad"), df, ["vec"])


def test_sort_within_files_clusters_row_groups(spark, tmp_path):
    """sort_within_files publishes each file as a contiguous sorted range:
    parquet footer min/max stats on the sort column are pairwise-disjoint
    across a partition's files (the data-skipping contract for range
    predicates on non-partition columns), the sidecar declares the
    clustering, and values are unaffected."""
    import os

    import pyarrow.parquet as pq

    base = str(tmp_path / "sorted_ds")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_returnflag"
    )
    publish_path(
        spark, base, li, ["l_returnflag"],
        sort_within_files=["l_orderkey"], max_records_per_file=500,
    )

    from s3parq_spark.fs import list_files

    meta = read_sidecar(spark, base)
    assert meta.sort_columns == ["l_orderkey"]

    by_part = {}
    for rel in list_files(spark, base):
        pf = pq.ParquetFile(os.path.join(base, rel))
        idx = pf.schema_arrow.names.index("l_orderkey")
        lo = min(pf.metadata.row_group(i).column(idx).statistics.min
                 for i in range(pf.metadata.num_row_groups))
        hi = max(pf.metadata.row_group(i).column(idx).statistics.max
                 for i in range(pf.metadata.num_row_groups))
        by_part.setdefault(rel.rsplit("/", 1)[0], []).append((lo, hi))
    assert any(len(v) > 1 for v in by_part.values())  # the split happened
    for ranges in by_part.values():
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, f"overlapping file ranges {(lo1,hi1)} {(lo2,hi2)}"

    # values unaffected by the sort
    got = fetch_path(spark, base)
    assert got.count() == li.count()
    assert got.filter(F.col("l_orderkey") <= 100).count() == \
        li.filter(F.col("l_orderkey") <= 100).count()

    with pytest.raises(ValueError, match="sort_within_files"):
        publish_path(spark, str(tmp_path / "bad"), li, [],
                     sort_within_files=["nope"])


def test_zorder_publish_clusters_both_dims(spark, tmp_path):
    """zorder_by clusters per-file parquet stats on EVERY listed column at
    once (a plain sort only clusters its leading column); values are
    unaffected, the sidecar declares z(cols), and invalid uses raise."""
    import os

    import pyarrow.parquet as pq

    from s3parq_spark.fs import list_files

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_returnflag"
    )

    base = str(tmp_path / "z_ds")
    publish_path(spark, base, li, [], max_records_per_file=4000,
                 zorder_by=["l_orderkey", "l_partkey"])
    meta = read_sidecar(spark, base)
    assert meta.sort_columns == ["z(l_orderkey, l_partkey)"]

    for col in ("l_orderkey", "l_partkey"):
        ranges = []
        for rel in list_files(spark, base):
            pf = pq.ParquetFile(os.path.join(base, rel))
            i = pf.schema_arrow.names.index(col)
            st = [pf.metadata.row_group(g).column(i).statistics
                  for g in range(pf.metadata.num_row_groups)]
            ranges.append((min(s.min for s in st), max(s.max for s in st)))
        assert len(ranges) > 4
        full = max(h for _, h in ranges) - min(l for l, _ in ranges)
        avg = sum(h - l for l, h in ranges) / len(ranges) / full
        # unclustered files each span ~the full domain (frac ~1.0)
        assert avg < 0.7, f"{col} avg per-file range fraction {avg:.3f}"

    got = fetch_path(spark, base)
    assert got.count() == li.count()
    assert got.agg(F.sum("l_quantity")).first()[0] == \
        li.agg(F.sum("l_quantity")).first()[0]

    with pytest.raises(ValueError, match="not both"):
        publish_path(spark, str(tmp_path / "bad1"), li, [],
                     sort_within_files=["l_orderkey"], zorder_by=["l_partkey"])
    with pytest.raises(ValueError, match="numeric/temporal"):
        publish_path(spark, str(tmp_path / "bad2"), li, [],
                     zorder_by=["l_returnflag"])


def test_bloom_filter_columns_written(spark, tmp_path):
    """bloom_filter_columns writes a parquet bloom filter on the flagged
    column — the row-group skipping mechanism for point lookups on
    unclustered, high-cardinality columns where min/max stats cannot
    prune. This pyarrow/duckdb can't surface bloom offsets from the
    footer, so the bloom's presence is asserted via the file-size delta
    of otherwise-identical publishes (parquet-mr appends the filter
    bitset before the footer)."""
    import os

    from s3parq_spark.fs import list_files

    # high-cardinality key: parquet-mr (correctly) skips the bloom when a
    # chunk is fully dictionary-encoded, so a low-NDV column shows none
    df = spark.range(100_000).selectExpr(
        "id", "id * 7 % 99991 AS k"
    ).coalesce(1)
    base = str(tmp_path / "bloom_ds")
    plain = str(tmp_path / "plain_ds")
    publish_path(spark, base, df, [], rebalance=False,
                 bloom_filter_columns=["k"])
    publish_path(spark, plain, df, [], rebalance=False)

    size = lambda root: sum(
        os.path.getsize(os.path.join(root, f)) for f in list_files(spark, root)
    )
    delta = size(base) - size(plain)
    assert delta > 100_000, f"bloom publish only {delta} bytes larger"

    got = fetch_path(spark, base)
    assert got.count() == df.count()
    assert got.filter(F.col("k") == 7).count() == \
        df.filter(F.col("k") == 7).count()

    with pytest.raises(ValueError, match="bloom_filter_columns"):
        publish_path(spark, str(tmp_path / "bad"), df, [],
                     bloom_filter_columns=["nope"])


def test_manifest_prune_matches_catalyst_on_typed_partitions(
    spark, tmp_dataset_dir, monkeypatch
):
    """End-to-end guarantee for the r6 driver-side manifest pruning: over
    datetime / float / bool / string / int partitions, a pruned fetch
    returns EXACTLY the rows a Catalyst-only fetch returns (pruning
    disabled), and the pruned plan's file index is strictly smaller for a
    selective filter."""
    import importlib

    fetch_mod = importlib.import_module("s3parq_spark.fetch")
    pdf = grouped_pdf(90)
    parts = ["string_col", "int_col", "float_col", "bool_col", "datetime_col"]
    publish(tmp_dataset_dir, "", parts, pdf, spark=spark)

    cases = [
        [{"partition": "string_col", "comparison": "==", "values": ["s1"]}],
        [{"partition": "int_col", "comparison": ">", "values": [0]}],
        [{"partition": "float_col", "comparison": "<=", "values": [1.5]}],
        [{"partition": "bool_col", "comparison": "==", "values": [True]}],
        [{"partition": "datetime_col", "comparison": ">=",
          "values": ["2024-01-02 00:00:00"]}],
        [  # AND across partitions, OR across values
            {"partition": "string_col", "comparison": "==",
             "values": ["s0", "s2"]},
            {"partition": "int_col", "comparison": "!=", "values": [1]},
        ],
        [{"partition": "string_col", "comparison": "==", "values": ["nope"]}],
    ]
    for filters in cases:
        pruned = fetch_mod.fetch_path(spark, tmp_dataset_dir, filters=filters)
        with monkeypatch.context() as m:
            m.setattr(
                fetch_mod, "_prune_manifest_files",
                lambda files, meta, flt: files,
            )
            unpruned = fetch_mod.fetch_path(
                spark, tmp_dataset_dir, filters=filters
            )
        a = sorted(map(tuple, pruned.collect()))
        b = sorted(map(tuple, unpruned.collect()))
        assert a == b, filters
    # the selective eq filter really did shrink what Spark sees
    sel = [{"partition": "string_col", "comparison": "==", "values": ["s1"]}]
    n_pruned = len(
        fetch_mod.fetch_path(spark, tmp_dataset_dir, filters=sel).inputFiles()
    )
    n_all = len(fetch_mod.fetch_path(spark, tmp_dataset_dir).inputFiles())
    assert 0 < n_pruned < n_all


def test_prune_keeps_type_mismatched_filter_values():
    """An int filter value against a STRING partition must NOT drop files
    driver-side ('12345' == 12345 is False in Python, but Catalyst matches
    via implicit cast) — such filters are left entirely to Catalyst."""
    from types import SimpleNamespace

    from s3parq_spark.fetch import _prune_manifest_files

    meta = SimpleNamespace(partition_data_types={"zip": "string"})
    files = ["zip=12345/a.parquet", "zip=99999/b.parquet"]
    flt = [{"partition": "zip", "comparison": "==", "values": [12345]}]
    assert _prune_manifest_files(files, meta, flt) == files
    # a correctly-typed string value still prunes
    flt2 = [{"partition": "zip", "comparison": "==", "values": ["12345"]}]
    assert _prune_manifest_files(files, meta, flt2) == ["zip=12345/a.parquet"]


def test_max_partition_value_ignores_null_partition(spark, tmp_path):
    from s3parq_spark.fetch import get_max_partition_value
    from s3parq_spark.publish import publish_path

    ds = str(tmp_path / "maxnull")
    df = spark.createDataFrame(
        [(1, 5, "x"), (2, None, "y"), (3, 9, "z")], "k int, i int, v string"
    )
    publish_path(spark, ds, df, ["i"])
    assert get_max_partition_value(ds, "", "i", spark=spark) == 9


def test_diff_partition_values_boolean(spark, tmp_path):
    # str(True)='True' vs Spark's written 'true' directory: booleans must
    # stringify the writer's way or every bool reports as missing
    from s3parq_spark.fetch import get_diff_partition_values
    from s3parq_spark.publish import publish_path

    ds = str(tmp_path / "booldiff")
    df = spark.createDataFrame([(1, True, "a")], "k int, b boolean, v string")
    publish_path(spark, ds, df, ["b"])
    assert get_diff_partition_values(ds, "", "b", [True], spark=spark) == []
    assert get_diff_partition_values(
        ds, "", "b", [True], reverse=True, spark=spark
    ) == []
    assert get_diff_partition_values(
        ds, "", "b", [False], reverse=True, spark=spark
    ) == [False]


def test_fetch_fileless_dataset_keeps_schema(spark, tmp_path):
    # delete every data file but keep the sidecar: fetch must return an
    # EMPTY frame with the declared schema (and still validate columns),
    # not a schema-less husk that breaks downstream selects
    import os
    import shutil

    from s3parq_spark.fetch import fetch_path
    from s3parq_spark.publish import publish_path

    ds = str(tmp_path / "fileless")
    df = spark.createDataFrame([(1, "a", 1.0)], "k int, p string, v double")
    publish_path(spark, ds, df, ["p"])
    for entry in os.listdir(ds):
        if entry.startswith("p="):
            shutil.rmtree(os.path.join(ds, entry))
    # destructive file removal invalidates snapshot history -> walk path
    from s3parq_spark import metadata

    side = metadata.read_sidecar(spark, ds)
    side.snapshots = []
    metadata.write_sidecar(spark, ds, side)
    got = fetch_path(spark, ds)
    assert got.count() == 0
    assert got.columns == ["k", "p", "v"]
    import pytest

    with pytest.raises(ValueError, match="unknown columns"):
        fetch_path(spark, ds, columns=["nope"])


def test_fetch_at_supports_derived_partition_filters(spark, tmp_path):
    # a hidden-partition source-column filter accepted by fetch_path must
    # also work on time-travel reads of the same dataset
    import datetime

    from s3parq_spark.fetch import fetch_at, fetch_path, list_versions
    from s3parq_spark.publish import publish_path

    ds = str(tmp_path / "hidden_tt")
    rows = [
        (i, datetime.datetime(2024, 1, 1 + (i % 3), 6), float(i))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    publish_path(
        spark, ds, df, [],
        derived_partitions={"event_day": "date_format(ts, 'yyyy-MM-dd')"},
    )
    flt = [{"partition": "ts", "comparison": ">=",
            "values": ["2024-01-03 00:00:00"]}]
    live = fetch_path(spark, ds, filters=flt)
    v = list_versions(spark, ds)[-1]["version"]
    at = fetch_at(spark, ds, v, filters=flt)
    assert sorted(map(tuple, at.collect())) == sorted(map(tuple, live.collect()))
    assert at.count() == 4


def test_read_csv_failfast_and_permissive(spark, tmp_path):
    """sources.read_csv: FAILFAST aborts on a corrupt row by default
    (corrupt extracts surface at ingest, never as silent NULLs); the
    permissive mode routes the bad row whole into the rescue column."""
    import pytest
    from pyspark.sql import types as T

    from s3parq_spark.sources import read_csv

    p = tmp_path / "in.csv"
    p.write_text("k,v\n1,alpha\nnot_an_int,beta\n")
    schema = T.StructType(
        [T.StructField("k", T.IntegerType()), T.StructField("v", T.StringType())]
    )
    with pytest.raises(Exception):
        read_csv(spark, str(p), schema).collect()
    rows = read_csv(spark, str(p), schema, permissive_col="_bad").collect()
    good = [r for r in rows if r["_bad"] is None]
    bad = [r for r in rows if r["_bad"] is not None]
    assert [(r["k"], r["v"]) for r in good] == [(1, "alpha")]
    assert len(bad) == 1 and "not_an_int" in bad[0]["_bad"]


def test_date_columns_round_trip(spark, tmp_dataset_dir):
    """r8: DATE value columns used to be stamped 'datetime' in the sidecar
    — the explicit TimestampType read schema then hard-crashed on the
    parquet DATE (INT32) encoding. Dates are a first-class vocab type now:
    value columns round-trip typed, date partitions prune, and zone maps
    record/skip on date bounds."""
    import datetime as dt

    from s3parq_spark import metadata
    from s3parq_spark.fetch import (
        _prune_zone_files,
        fetch_path,
        get_all_partition_values,
        get_max_partition_value,
    )
    from s3parq_spark.publish import publish_path

    rows = [
        (i, dt.date(2024, 1 + (i % 3), 1 + i), dt.date(2020 + i % 2, 6, 15))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "id long, d date, pd date")
    publish_path(
        spark, tmp_dataset_dir, df, ["pd"], zone_map_columns=["d"],
        max_records_per_file=3, sort_within_files=["d"],
    )
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert meta.column_types["d"] == "date"
    assert meta.partition_data_types["pd"] == "date"
    got = fetch_path(spark, tmp_dataset_dir)
    assert dict(got.dtypes)["d"] == "date" and dict(got.dtypes)["pd"] == "date"
    assert {r["d"] for r in got.collect()} == {r[1] for r in rows}
    # date partition pruning (typed path values + string filter values)
    pruned = fetch_path(
        spark, tmp_dataset_dir,
        filters=[{"partition": "pd", "comparison": "==",
                  "values": ["2020-06-15"]}],
    )
    assert pruned.count() == sum(1 for r in rows if r[2].year == 2020)
    # metadata-plane values come back as dates
    vals = get_all_partition_values(tmp_dataset_dir, "", "pd", spark=spark)
    assert sorted(vals) == [dt.date(2020, 6, 15), dt.date(2021, 6, 15)]
    assert get_max_partition_value(
        tmp_dataset_dir, "", "pd", spark=spark
    ) == dt.date(2021, 6, 15)
    # zone maps skip on date bounds
    flt = [{"partition": "d", "comparison": "<", "values": ["2024-02-01"]}]
    kept = _prune_zone_files(meta.manifest_files(), meta, flt)
    assert len(kept) < len(meta.manifest_files())
    assert fetch_path(spark, tmp_dataset_dir, filters=flt).count() == sum(
        1 for r in rows if r[1] < dt.date(2024, 2, 1)
    )


def test_legacy_datetime_stamped_date_dataset_still_appends(spark, tmp_dataset_dir):
    """r8 third review: pre-r8 sidecars stamp DATE columns 'datetime'
    (partitions worked — path strings — but the new 'date' vocab would
    wedge appends with a type mismatch). The dataset's declared contract
    wins: appends keep working, value-column DATE data is cast to
    timestamp at write so new files match the declared encoding."""
    import datetime as dt
    import json

    from s3parq_spark import metadata
    from s3parq_spark.fetch import fetch_path, get_all_partition_values
    from s3parq_spark.publish import publish_path

    rows = [(i, dt.date(2024, 1, 1 + i), dt.date(2020 + i % 2, 6, 15))
            for i in range(4)]
    df = spark.createDataFrame(rows, "id long, d date, pd date")
    publish_path(spark, tmp_dataset_dir, df, ["pd"])
    # simulate the pre-r8 sidecar: rewrite date -> datetime. The value
    # column's files hold DATE bytes under a 'datetime' declaration —
    # the historical broken-at-rest state this compat path targets; fix
    # the physical encoding too so the fixture is the PARTITION-only
    # legacy case that actually worked before r8.
    side = json.load(open(f"{tmp_dataset_dir}/_s3parq_metadata.json"))
    side["column_types"]["pd"] = "datetime"
    side["partition_data_types"]["pd"] = "datetime"
    side["column_types"]["d"] = "datetime"
    json.dump(side, open(f"{tmp_dataset_dir}/_s3parq_metadata.json", "w"))
    import shutil

    # rewrite data files with timestamp-encoded d (what a pre-r8 publish
    # of timestamp data produced)
    old = fetch_path  # noqa: F841  (documentation of intent)
    data = [(i, dt.datetime(2024, 1, 1 + i), dt.date(2020 + i % 2, 6, 15))
            for i in range(4)]
    shutil.rmtree(tmp_dataset_dir, ignore_errors=True)
    publish_path(
        spark, tmp_dataset_dir,
        spark.createDataFrame(data, "id long, d timestamp, pd date"),
        ["pd"],
    )
    side = json.load(open(f"{tmp_dataset_dir}/_s3parq_metadata.json"))
    side["partition_data_types"]["pd"] = "datetime"
    side["column_types"]["pd"] = "datetime"
    json.dump(side, open(f"{tmp_dataset_dir}/_s3parq_metadata.json", "w"))

    # the append arrives with today's natural types: d timestamp, pd DATE
    publish_path(
        spark, tmp_dataset_dir,
        spark.createDataFrame(
            [(9, dt.datetime(2024, 2, 1), dt.date(2022, 6, 15))],
            "id long, d timestamp, pd date",
        ),
        ["pd"],
    )
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert meta.partition_data_types["pd"] == "datetime"  # contract kept
    got = fetch_path(spark, tmp_dataset_dir)
    assert got.count() == 5
    assert dict(got.dtypes)["pd"] == "timestamp"
    vals = get_all_partition_values(tmp_dataset_dir, "", "pd", spark=spark)
    assert dt.datetime(2022, 6, 15) in vals


def test_legacy_append_casts_date_value_columns(spark, tmp_dataset_dir):
    """A DateType VALUE column appended onto a legacy 'datetime'
    declaration is cast to timestamp at write — the new file's bytes
    match the declared read schema instead of reproducing the scan crash."""
    import datetime as dt
    import json

    from s3parq_spark.fetch import fetch_path
    from s3parq_spark.publish import publish_path

    publish_path(
        spark, tmp_dataset_dir,
        spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1))], "id long, d timestamp"
        ),
        [],
    )
    side = json.load(open(f"{tmp_dataset_dir}/_s3parq_metadata.json"))
    assert side["column_types"]["d"] == "datetime"
    publish_path(
        spark, tmp_dataset_dir,
        spark.createDataFrame([(2, dt.date(2024, 2, 1))], "id long, d date"),
        [],
    )
    got = fetch_path(spark, tmp_dataset_dir).orderBy("id").collect()
    assert [r["d"] for r in got] == [
        dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)
    ]


def test_sidecar_write_is_atomic_on_local_fs(spark, tmp_path, monkeypatch):
    """r11: a crash mid-sidecar-write must leave the PREVIOUS sidecar
    readable — write_text goes through temp + os.replace on local
    paths, so a failure inside the write never truncates the live file
    (the sidecar is the dataset's single most important object)."""
    import builtins
    import os

    from s3parq_spark import fs as _fs

    p = str(tmp_path / "x" / "file.json")
    _fs.write_text(spark, p, '{"v": 1}')
    assert _fs.read_text(spark, p) == '{"v": 1}'

    real_open = builtins.open

    def exploding_open(f, *a, **kw):
        fh = real_open(f, *a, **kw)
        if str(f).endswith(f".tmp.{os.getpid()}") and "w" in str(a[:1]):
            class Boom:
                def __enter__(self):
                    return self
                def __exit__(self, *exc):
                    fh.close()
                    return False
                def write(self, _):
                    raise OSError("disk full")
            return Boom()
        return fh

    monkeypatch.setattr(builtins, "open", exploding_open)
    try:
        with __import__("pytest").raises(OSError, match="disk full"):
            _fs.write_text(spark, p, '{"v": 2}')
    finally:
        monkeypatch.undo()
    # the previous content survived the failed write; no temp debris
    assert _fs.read_text(spark, p) == '{"v": 1}'
    assert [f for f in os.listdir(os.path.dirname(p)) if ".tmp." in f] == []
