"""Directory-granular path shipping (fetch._dir_scan, r11 verdict #8):
when a pruned read's survivors cover whole hive dirs, the scan ships the
DIRS through py4j instead of one path per file — verified against the
manifest via the very InMemoryFileIndex the scan executes, so an
unacknowledged file (crashed-publish orphan) forces the per-file path."""

import os
import shutil

import pytest

import importlib

from s3parq_spark.fetch import fetch_path
from s3parq_spark.publish import publish_path

fetch_mod = importlib.import_module("s3parq_spark.fetch")


@pytest.fixture()
def wide_dataset(spark, tmp_path):
    """2 partitions x 260 files each — past _DIR_SCAN_MIN_FILES even for
    a single-partition read, comfortably above the compression ratio."""
    d = str(tmp_path / "wide")
    rows = [(i, i % 2, float(i)) for i in range(520)]
    df = spark.createDataFrame(rows, "id long, k int, v double")
    publish_path(
        spark, d, df.repartition(260), ["k"], max_records_per_file=1
    )
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _counts(spark, path, filters=None):
    df = fetch_path(spark, path, filters=filters)
    return df.count(), sorted(r["id"] for r in df.collect())


def test_dir_scan_used_and_equal(spark, wide_dataset):
    n, ids = _counts(spark, wide_dataset)
    assert fetch_mod._LAST_SCAN_USED_DIRS is True
    assert n == 520 and ids == list(range(520))
    # partition-filtered read: survivors still cover the whole kept dir
    n1, ids1 = _counts(
        spark, wide_dataset,
        [{"partition": "k", "comparison": "==", "values": [1]}],
    )
    assert fetch_mod._LAST_SCAN_USED_DIRS is True
    assert n1 == 260 and all(i % 2 == 1 for i in ids1)
    # the dir-granular scan keeps Catalyst's partition pruning: the
    # filter must still land as PartitionFilters at the Scan node
    df = fetch_path(
        spark, wide_dataset,
        filters=[{"partition": "k", "comparison": "==", "values": [1]}],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "k#" in plan


def test_dir_scan_refuses_unacknowledged_file(spark, wide_dataset):
    """An orphan parquet file inside a shipped dir (a crashed publish's
    leftovers) must force the fall-back to explicit per-file paths — the
    orphan's rows never appear."""
    victim_dir = os.path.join(wide_dataset, "k=0")
    orphan_src = os.path.join(
        victim_dir,
        sorted(
            f for f in os.listdir(victim_dir) if f.endswith(".parquet")
        )[0],
    )
    shutil.copy(orphan_src, os.path.join(victim_dir, "part-orphan.parquet"))
    n, ids = _counts(spark, wide_dataset)
    assert fetch_mod._LAST_SCAN_USED_DIRS is False
    assert n == 520 and ids == list(range(520))


def test_dir_scan_skips_small_or_sparse_reads(spark, tmp_path):
    """Below the survivor-count threshold (or when dirs don't compress
    the list) nothing changes — per-file paths as before."""
    d = str(tmp_path / "small")
    df = spark.createDataFrame(
        [(i, i % 2) for i in range(10)], "id long, k int"
    )
    publish_path(spark, d, df, ["k"])
    n, _ = _counts(spark, d)
    assert fetch_mod._LAST_SCAN_USED_DIRS is False
    assert n == 10
    shutil.rmtree(d, ignore_errors=True)


def test_dir_scan_partial_dir_survivors_fall_back(spark, tmp_path):
    """Zone-pruned (per-file) survivors inside a dir break dir coverage:
    those dirs ship per-file; fully-covered dirs may still ship whole.
    Result equality is the contract either way."""
    d = str(tmp_path / "zoned")
    rows = [(i, 0, float(i)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, k int, v double")
    publish_path(
        spark, d, df.repartition(300), ["k"],
        max_records_per_file=1, zone_map_columns=["v"],
    )
    got = fetch_path(
        spark, d,
        filters=[{"partition": "v", "comparison": "<", "values": [5.0]}],
    )
    assert sorted(r["id"] for r in got.collect()) == [0, 1, 2, 3, 4]
    shutil.rmtree(d, ignore_errors=True)


def test_dir_scan_composes_with_time_travel(spark, wide_dataset):
    """fetch_at flows through the same _scan_rel_files: a version whose
    file set no longer covers a dir's CURRENT live contents (later
    appends landed there) must fall back to loose per-file paths for
    that dir — never scan the newer files — while an untouched dir still
    ships whole. Either way the replayed version is exact."""
    from s3parq_spark.fetch import fetch_at

    # v2 touches ONLY k=0 (odd ids belong to k=1 dirs, untouched)
    extra = spark.createDataFrame(
        [(1000 + i, 0, 0.0) for i in range(4)], "id long, k int, v double"
    )
    publish_path(spark, wide_dataset, extra, ["k"], mode="append")

    v1 = fetch_at(spark, wide_dataset, version=1)
    ids = sorted(r["id"] for r in v1.collect())
    assert ids == list(range(520))  # v2's rows invisible at v1

    # current read still dir-ships and sees everything
    n, ids_now = _counts(spark, wide_dataset)
    assert fetch_mod._LAST_SCAN_USED_DIRS is True
    assert n == 524

    # a v1 read pruned to the UNTOUCHED partition covers its dir exactly
    # (v1 files == live files there): dir shipping applies and is exact
    df = fetch_at(
        spark, wide_dataset, version=1,
        filters=[{"partition": "k", "comparison": "==", "values": [1]}],
    )
    got = sorted(r["id"] for r in df.collect())
    assert fetch_mod._LAST_SCAN_USED_DIRS is True
    assert got == [i for i in range(520) if i % 2 == 1]

    # pruned to the TOUCHED partition: survivors no longer cover the
    # dir (v2 files live there too) — per-file fallback, still exact
    df0 = fetch_at(
        spark, wide_dataset, version=1,
        filters=[{"partition": "k", "comparison": "==", "values": [0]}],
    )
    got0 = sorted(r["id"] for r in df0.collect())
    assert fetch_mod._LAST_SCAN_USED_DIRS is False
    assert got0 == [i for i in range(520) if i % 2 == 0]
