"""Table statistics plane (ANALYZE): per-column stats collected in ONE
distributed aggregate and stored in the sidecar, then served metadata-only.

At 100 TB, stats answer the questions planners and humans ask constantly —
row count, per-column null fraction, cardinality, bounds — and answering
them with a scan per question is how clusters drown. The reference has no
stats story at all (its metadata is partition dtypes only); warehouses
(Delta ANALYZE, Iceberg table metrics) made this table infrastructure.
Here: ``collect_stats`` scans once, ``read_stats`` never scans.

Stats are stamped with the snapshot version they were computed at, so a
reader can tell stale stats from fresh ones (publishes after the ANALYZE
bump the head version; the stats record keeps its own).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import metadata


def collect_stats(
    spark: SparkSession,
    path: str,
    columns: Optional[List[str]] = None,
) -> Dict:
    """ANALYZE the dataset: one full scan computing, per column, exact
    ``min`` / ``max`` / ``n_nulls`` / ``n_distinct`` (plus the table row
    count), written into the sidecar and returned.

    ONE aggregate job for every column together — the single-pass shape of
    ``profile_columns`` — never a job per column. min/max are stored as
    strings (the sidecar is JSON; consumers re-type via the sidecar's
    column vocabulary). ``columns`` defaults to every non-partition data
    column; partition columns are answerable from the metadata plane
    already (``get_all_partition_values``).
    """
    from .fetch import fetch_path

    meta = metadata.read_sidecar(spark, path)
    if meta is None:
        raise ValueError(f"{path} is not an s3parq dataset (no sidecar)")
    df = fetch_path(spark, path)
    if columns is None:
        columns = [c for c in df.columns if c not in meta.partitions]
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"stats columns not in dataset: {missing}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.extend(
            [
                # F.col(c), never the bare string: a column literally
                # named 'a.b' would otherwise parse as a nested-field
                # reference despite passing the df.columns check
                F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
                # coalesce: sum() over an EMPTY dataset is NULL, which
                # would store n_nulls: null in the sidecar and break any
                # consumer doing arithmetic on it
                F.coalesce(
                    F.sum(F.col(c).isNull().cast("bigint")), F.lit(0)
                ).alias(f"__nulls_{c}"),
                F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            ]
        )
    row = df.agg(*aggs).collect()[0]

    # RE-READ the sidecar after the (potentially hours-long) scan and
    # merge ONLY the stats field into the fresh metadata: writing back the
    # pre-scan snapshot would clobber any publish committed meanwhile —
    # erasing its snapshot entries from the log (orphaning its files and
    # corrupting time travel)
    fresh = metadata.read_sidecar(spark, path)
    if fresh is None:
        raise ValueError(f"{path} disappeared during ANALYZE (no sidecar)")
    version = fresh.snapshots[-1]["version"] if fresh.snapshots else None
    # merge into any existing record: a table-level ANALYZE must not erase
    # stored partition stats, and a subset ANALYZE must not erase other
    # columns' stored stats
    stats = dict(fresh.stats or {})
    merged_cols = dict(stats.get("columns", {}))
    merged_cols.update(
        {
            c: {
                "min": row[f"__min_{c}"],
                "max": row[f"__max_{c}"],
                "n_nulls": row[f"__nulls_{c}"],
                "n_distinct": row[f"__nd_{c}"],
            }
            for c in columns
        }
    )
    stats.update({
        "row_count": row["__n"],
        "as_of_version": version,
        "columns": merged_cols,
    })
    fresh.stats = stats
    metadata.write_sidecar(spark, path, fresh)
    return stats


def read_stats(spark: SparkSession, path: str) -> Optional[Dict]:
    """The stored ANALYZE record — one sidecar JSON read, ZERO data scan.
    Returns None when NO analysis has ever run. The record contains the
    sections that have actually been collected: ``row_count`` /
    ``columns`` / ``as_of_version`` after ``collect_stats``, and/or
    ``partitions`` / ``partitions_as_of_version`` after
    ``collect_partition_stats`` — use ``.get`` and check the matching
    ``*_as_of_version`` against ``list_versions`` to detect staleness."""
    meta = metadata.read_sidecar(spark, path)
    if meta is None:
        raise ValueError(f"{path} is not an s3parq dataset (no sidecar)")
    return meta.stats or None


def collect_partition_stats(spark: SparkSession, path: str) -> List[Dict]:
    """ANALYZE at partition granularity (Iceberg's partition-stats files,
    restated for the sidecar): ONE aggregate computing each hive
    partition-value combination's row count, stored under
    ``meta.stats["partitions"]`` (alongside any table-level ANALYZE) and
    stamped with the snapshot version. Partition pruning tells a planner
    which directories survive a filter; partition stats tell it HOW MUCH
    survives — the input-size estimate joins and aggregations are sized
    by, served with zero scans after this one.

    Unpartitioned datasets store a single entry with an empty value map.
    Returns the recorded list of ``{"values": {...}, "n_rows": int}``.
    """
    from .fetch import fetch_path

    meta = metadata.read_sidecar(spark, path)
    if meta is None:
        raise ValueError(f"{path} is not an s3parq dataset (no sidecar)")
    df = fetch_path(spark, path)
    parts = list(meta.partitions)
    if parts:
        rows = (
            df.groupBy(*[F.col(p).cast("string").alias(p) for p in parts])
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        recs = [
            {"values": {p: r[p] for p in parts}, "n_rows": r["__n"]}
            for r in rows
        ]
    else:
        recs = [{"values": {}, "n_rows": df.count()}]
    recs.sort(
        key=lambda r: [
            (k, v is None, v or "") for k, v in sorted(r["values"].items())
        ]
    )
    # same fresh-merge discipline as collect_stats: never write back a
    # pre-scan snapshot of the sidecar
    fresh = metadata.read_sidecar(spark, path)
    if fresh is None:
        raise ValueError(f"{path} disappeared during ANALYZE (no sidecar)")
    version = fresh.snapshots[-1]["version"] if fresh.snapshots else None
    stats = dict(fresh.stats or {})
    stats["partitions"] = recs
    stats["partitions_as_of_version"] = version
    fresh.stats = stats
    metadata.write_sidecar(spark, path, fresh)
    return recs


def read_partition_stats(spark: SparkSession, path: str) -> Optional[List[Dict]]:
    """The stored partition-stats record — sidecar JSON only, zero scan.
    None when ``collect_partition_stats`` has never run."""
    meta = metadata.read_sidecar(spark, path)
    if meta is None:
        raise ValueError(f"{path} is not an s3parq dataset (no sidecar)")
    return (meta.stats or {}).get("partitions")
