"""Metadata-only partition-value queries (SURVEY §2.3 A1-A3) — must answer
from the file listing with zero row I/O, with the reference's typing and
empty-side edge semantics (``/root/reference/s3parq/fetch_parq.py:49-149``)."""

import datetime

import pandas as pd
import pytest

from s3parq_spark import (
    get_all_partition_values,
    get_diff_partition_values,
    get_max_partition_value,
    publish,
)
from s3parq_spark.fetch import parse_partitions_and_values
from s3parq_spark.metadata import convert_type, strtobool


def frame(n=40):
    base = datetime.datetime(2024, 1, 1)
    return pd.DataFrame(
        {
            "s": [f"v{i % 4}" for i in range(n)],
            "i": [i % 5 for i in range(n)],
            "f": [(i % 3) + 0.25 for i in range(n)],
            "b": [i % 2 == 0 for i in range(n)],
            "dt": [base + datetime.timedelta(hours=12 * (i % 3)) for i in range(n)],
            "x": range(n),
        }
    )


def test_all_values_typed(spark, tmp_dataset_dir):
    publish(tmp_dataset_dir, "", ["i"], frame(), spark=spark)
    vals = get_all_partition_values(tmp_dataset_dir, "", "i", spark=spark)
    assert sorted(vals) == [0, 1, 2, 3, 4]
    assert all(isinstance(v, int) for v in vals)


def test_all_values_empty_dataset(spark, tmp_dataset_dir):
    assert get_all_partition_values(tmp_dataset_dir, "none", "i", spark=spark) == []


def test_max_numeric_and_datetime(spark, tmp_path):
    d1 = str(tmp_path / "a")
    publish(d1, "", ["i", "dt"], frame(), spark=spark)
    assert get_max_partition_value(d1, "", "i", spark=spark) == 4
    assert get_max_partition_value(d1, "", "dt", spark=spark) == datetime.datetime(
        2024, 1, 2
    )


def test_max_rejects_non_numeric(spark, tmp_dataset_dir):
    publish(tmp_dataset_dir, "", ["s", "b"], frame(), spark=spark)
    with pytest.raises(ValueError, match="Max cannot be used"):
        get_max_partition_value(tmp_dataset_dir, "", "s", spark=spark)
    with pytest.raises(ValueError, match="Max cannot be used"):
        get_max_partition_value(tmp_dataset_dir, "", "b", spark=spark)


def test_max_empty_dataset_none(spark, tmp_dataset_dir):
    assert get_max_partition_value(tmp_dataset_dir, "none", "i", spark=spark) is None


def test_diff_values(spark, tmp_dataset_dir):
    publish(tmp_dataset_dir, "", ["i"], frame(), spark=spark)
    got = get_diff_partition_values(tmp_dataset_dir, "", "i", [0, 1, 7], spark=spark)
    assert sorted(got) == [2, 3, 4]
    # reverse: values not present in the dataset
    got_rev = get_diff_partition_values(
        tmp_dataset_dir, "", "i", [0, 1, 7], reverse=True, spark=spark
    )
    assert got_rev == [7]


def test_diff_empty_inputs(spark, tmp_path):
    empty = str(tmp_path / "empty")
    # empty dataset: diff=[] ; reverse returns the deduped input values
    assert get_diff_partition_values(empty, "", "i", [1, 1, 2], spark=spark) == []
    assert sorted(
        get_diff_partition_values(empty, "", "i", [1, 1, 2], reverse=True, spark=spark)
    ) == [1, 2]
    # empty values_to_diff: all partition values ; reverse []
    d = str(tmp_path / "d")
    publish(d, "", ["i"], frame(), spark=spark)
    assert sorted(get_diff_partition_values(d, "", "i", [], spark=spark)) == [0, 1, 2, 3, 4]
    assert get_diff_partition_values(d, "", "i", [], reverse=True, spark=spark) == []


def test_metadata_plane_answers_from_manifest(spark, tmp_dataset_dir, monkeypatch):
    """With intact snapshot history, A1-A3 and get_all_files_list must be
    answered from the sidecar manifests — ZERO filesystem listings (the
    100 TB metadata-plane contract). Publishing twice exercises the
    multi-snapshot union."""
    import importlib

    fetch_mod = importlib.import_module("s3parq_spark.fetch")
    from s3parq_spark import get_all_files_list
    from s3parq_spark.fs import list_files

    publish(tmp_dataset_dir, "", ["i"], frame(), spark=spark)
    publish(tmp_dataset_dir, "", ["i"], frame(20), mode="append", spark=spark)
    walk = sorted(list_files(spark, tmp_dataset_dir))

    def _no_walk(*a, **k):
        raise AssertionError("fs.list_files called on the manifest path")

    monkeypatch.setattr(fetch_mod.fs, "list_files", _no_walk)

    assert sorted(get_all_files_list(tmp_dataset_dir, "", spark=spark)) == walk
    assert sorted(get_all_partition_values(tmp_dataset_dir, "", "i", spark=spark)) == [
        0, 1, 2, 3, 4,
    ]
    assert get_max_partition_value(tmp_dataset_dir, "", "i", spark=spark) == 4
    assert sorted(
        get_diff_partition_values(tmp_dataset_dir, "", "i", [0, 1], spark=spark)
    ) == [2, 3, 4]


def test_metadata_plane_falls_back_after_history_clear(spark, tmp_dataset_dir):
    """overwrite_partitions clears the version history; the metadata plane
    must then fall back to the filesystem walk and still be correct."""
    from s3parq_spark.metadata import read_sidecar
    from s3parq_spark.publish import overwrite_partitions

    publish(tmp_dataset_dir, "", ["i"], frame(), spark=spark)
    overwrite_partitions(
        spark, tmp_dataset_dir, frame(10).assign(i=9), ["i"]
    )
    assert read_sidecar(spark, tmp_dataset_dir).manifest_files() is None
    vals = get_all_partition_values(tmp_dataset_dir, "", "i", spark=spark)
    assert 9 in vals and all(isinstance(v, int) for v in vals)


def test_parse_partitions_and_values_unescapes():
    paths = [
        "dt=2024-01-01 00%3A00%3A00/f=0.25/part-0.parquet",
        "dt=2024-01-02 12%3A00%3A00/f=1.25/part-1.parquet",
    ]
    parts = parse_partitions_and_values(paths)
    assert parts["dt"] == {"2024-01-01 00:00:00", "2024-01-02 12:00:00"}
    assert parts["f"] == {"0.25", "1.25"}
    assert list(parts) == ["dt", "f"]


def test_convert_type_reference_semantics():
    # fetch_parq.py:283-305
    assert convert_type("12", "integer") == 12
    assert convert_type("1.5", "float") == 1.5
    assert convert_type("2024-01-02 12:00:00", "datetime") == datetime.datetime(
        2024, 1, 2, 12
    )
    assert convert_type("True", "boolean") is True
    assert convert_type("false", "boolean") is False  # strtobool, not bool()
    assert convert_type("00123", "string") == "00123"
    assert convert_type("__HIVE_DEFAULT_PARTITION__", "integer") is None
    with pytest.raises(ValueError):
        strtobool("maybe")


class TestDatasetFiles:
    def test_files_table_versions_and_partitions(self, spark, tmp_path):
        from s3parq_spark.fetch import dataset_files, get_all_files_list
        from s3parq_spark.publish import publish_path
        from pyspark.sql import functions as F

        path = str(tmp_path / "ft")
        df1 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "p"])
        df2 = spark.createDataFrame([(3, "a")], ["k", "p"])
        publish_path(spark, path, df1, ["p"])
        publish_path(spark, path, df2, ["p"], mode="append")
        ft = dataset_files(spark, path)
        assert ft.columns == ["file", "version", "p"]
        rows = ft.collect()
        # every manifest file appears exactly once with its commit version
        assert sorted(r["file"] for r in rows) == sorted(
            get_all_files_list(path, spark=spark)
        )
        assert {r["version"] for r in rows} == {1, 2}
        # v2 touched only partition a
        v2 = [r for r in rows if r["version"] == 2]
        assert {r["p"] for r in v2} == {"a"}
        # partition values parsed from the path as stored
        assert all(r["p"] in ("a", "b") for r in rows)

    def test_unpartitioned_dataset(self, spark, tmp_path):
        from s3parq_spark.fetch import dataset_files
        from s3parq_spark.publish import publish_path

        path = str(tmp_path / "ft2")
        publish_path(
            spark, path,
            spark.createDataFrame([(1,), (2,)], ["k"]), [],
        )
        ft = dataset_files(spark, path)
        assert ft.columns == ["file", "version"]
        assert ft.count() >= 1


def test_diff_untypeable_user_value_forward_tolerant(spark, tmp_dataset_dir):
    """r8 review: an untypeable candidate value ('unknown' vs an integer
    partition) can never match — the forward diff must report around it,
    not crash (reference parity: its forward path never typed the user
    side); reverse WOULD return it typed, so reverse raises like the
    reference's convert_type does."""
    from s3parq_spark.fetch import get_diff_partition_values
    from s3parq_spark.publish import publish_path

    df = spark.createDataFrame([(1, 2024, "a"), (2, 2025, "b")],
                               ["id", "year", "v"])
    publish_path(spark, tmp_dataset_dir, df, ["year"])
    diff = get_diff_partition_values(
        tmp_dataset_dir, "", "year", [2024, "unknown"], spark=spark
    )
    assert diff == [2025]
    with pytest.raises(ValueError):
        get_diff_partition_values(
            tmp_dataset_dir, "", "year", [2024, "unknown"],
            reverse=True, spark=spark,
        )
