"""Filter-shim unit tests — the reference's pruning truth table
(``/root/reference/tests/test_fetch_parq_internal.py:207-312`` semantics):
OR across values, AND across partitions, single-value inequalities, type
gating."""

import datetime

import pytest

from s3parq_spark.filters import (
    apply_filters_to_values,
    filters_to_predicate,
    first_filter_per_partition,
    validate_filter_rules,
    validate_matching_filter_data_type,
)


def test_requires_all_keys():
    with pytest.raises(ValueError, match="partition, comparison, and values"):
        validate_filter_rules([{"partition": "p", "comparison": "=="}])


def test_unsupported_comparison():
    with pytest.raises(ValueError, match="not supported"):
        validate_filter_rules([{"partition": "p", "comparison": "~=", "values": [1]}])


@pytest.mark.parametrize("cmp", [">", "<", ">=", "<="])
def test_inequality_single_value_rule(cmp):
    with pytest.raises(ValueError, match="one filter value"):
        validate_filter_rules([{"partition": "p", "comparison": cmp, "values": [1, 2]}])
    validate_filter_rules([{"partition": "p", "comparison": cmp, "values": [1]}])


def test_neq_allows_multiple_values():
    # != is NOT in the single-value list (fetch_parq.py:599-604)
    validate_filter_rules([{"partition": "p", "comparison": "!=", "values": [1, 2]}])


def test_filter_must_match_partition():
    with pytest.raises(ValueError, match="matching partition"):
        validate_matching_filter_data_type(
            {"a": "string"}, [{"partition": "b", "comparison": "==", "values": [1]}]
        )


@pytest.mark.parametrize("dtype", ["string", "category", "bool", "boolean"])
def test_inequality_rejected_on_non_numeric(dtype):
    with pytest.raises(ValueError, match="cannot be used on partition types"):
        validate_matching_filter_data_type(
            {"p": dtype}, [{"partition": "p", "comparison": ">", "values": [1]}]
        )


def test_inequality_allowed_on_datetime_and_numeric():
    for dtype in ("datetime", "integer", "float"):
        validate_matching_filter_data_type(
            {"p": dtype}, [{"partition": "p", "comparison": ">", "values": [1]}]
        )


def test_eq_allowed_on_any_type():
    for dtype in ("string", "boolean", "integer", "float", "datetime", "category"):
        validate_matching_filter_data_type(
            {"p": dtype}, [{"partition": "p", "comparison": "==", "values": [1]}]
        )


def test_first_filter_per_partition():
    fs = [
        {"partition": "a", "comparison": "==", "values": [1]},
        {"partition": "a", "comparison": "==", "values": [2]},
        {"partition": "b", "comparison": "==", "values": [3]},
    ]
    kept = first_filter_per_partition(fs)
    assert kept == [fs[0], fs[2]]


def test_truth_table_or_across_values():
    values = {1, 2, 3, 4}
    got = apply_filters_to_values(
        values, [{"partition": "p", "comparison": "==", "values": [1, 3]}], "p"
    )
    assert got == {1, 3}


def test_truth_table_inequality():
    values = {1.0, 2.0, 3.0}
    got = apply_filters_to_values(
        values, [{"partition": "p", "comparison": ">=", "values": [2.0]}], "p"
    )
    assert got == {2.0, 3.0}


def test_truth_table_neq_multi_value_is_or():
    # multi-value != under OR semantics matches everything that differs from
    # at least one value — i.e. all of them (reference quirk, SURVEY §7.4)
    values = {1, 2, 3}
    got = apply_filters_to_values(
        values, [{"partition": "p", "comparison": "!=", "values": [1, 2]}], "p"
    )
    assert got == {1, 2, 3}


def test_predicate_sql_round_trip(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], ["int_col", "string_col"]
    )
    pred = filters_to_predicate(
        [
            {"partition": "string_col", "comparison": "==", "values": ["s0", "s1"]},
            {"partition": "int_col", "comparison": "<", "values": [10]},
        ],
        {"string_col": "string", "int_col": "integer"},
    )
    got = {r[0] for r in df.filter(pred).select("int_col").collect()}
    assert got == {i for i in range(10) if i % 3 in (0, 1)}


def test_predicate_datetime_string_values(spark):
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, base + datetime.timedelta(days=i)) for i in range(5)], ["i", "dt"]
    )
    pred = filters_to_predicate(
        [{"partition": "dt", "comparison": ">", "values": ["2024-01-03 00:00:00"]}],
        {"dt": "datetime"},
    )
    assert df.filter(pred).count() == 2  # Jan 4 and Jan 5


def test_prune_manifest_files_superset_safe():
    """Driver-side manifest pruning (fetch._prune_manifest_files) drops
    ONLY files some filter provably rejects; unparseable or missing path
    components are kept (Catalyst re-applies the same predicate), NULL
    partitions (__HIVE_DEFAULT_PARTITION__) can't match any comparison."""
    from types import SimpleNamespace

    from s3parq_spark.fetch import _prune_manifest_files

    meta = SimpleNamespace(
        partition_data_types={"p": "integer", "s": "string"}
    )
    files = [
        "p=1/s=a/f1.parquet",
        "p=2/s=a/f2.parquet",
        "p=1/s=b/f3.parquet",
        "p=__HIVE_DEFAULT_PARTITION__/s=a/f4.parquet",
        "p=oops/s=a/f5.parquet",   # unparseable int: conservative keep
        "flat/f6.parquet",         # no hive component: conservative keep
    ]
    eq = [{"partition": "p", "comparison": "==", "values": [1]}]
    assert _prune_manifest_files(files, meta, eq) == [
        "p=1/s=a/f1.parquet",
        "p=1/s=b/f3.parquet",
        "p=oops/s=a/f5.parquet",
        "flat/f6.parquet",
    ]
    both = eq + [{"partition": "s", "comparison": "==", "values": ["b"]}]
    assert _prune_manifest_files(files, meta, both) == [
        "p=1/s=b/f3.parquet",
        "flat/f6.parquet",
    ]
    gt = [{"partition": "p", "comparison": ">", "values": [1]}]
    assert _prune_manifest_files(files, meta, gt) == [
        "p=2/s=a/f2.parquet",
        "p=oops/s=a/f5.parquet",
        "flat/f6.parquet",
    ]
    # no filters on known partitions: untouched
    assert _prune_manifest_files(files, meta, []) == files
    assert (
        _prune_manifest_files(
            files, meta,
            [{"partition": "zz", "comparison": "==", "values": [1]}],
        )
        == files
    )
