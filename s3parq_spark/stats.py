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


def _snap_ts(meta, version):
    for s in meta.snapshots or []:
        if s.get("version") == version:
            return s.get("ts")
    return None


def _typed_for_fold(v, vocab: str):
    """Stored string bound → comparable typed value for the incremental
    min/max fold (stats store everything as strings; lexicographic
    compare would rank '9' above '10')."""
    if v is None:
        return None
    if vocab == "integer":
        return int(v)
    if vocab == "float":
        return float(v)
    if vocab == "boolean":
        return v == "true"
    return metadata.zone_stat_typed(v, vocab)


def _stat_aggs(columns) -> list:
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
                # mergeable NDV (Iceberg's puffin-sketch idea, via
                # Spark's Datasketches HLL): sketched over the CANONICAL
                # STRING cast so every vocabulary type folds through the
                # same sketch; nulls are ignored, matching count_distinct
                F.hll_sketch_agg(F.col(c).cast("string")).alias(
                    f"__hll_{c}"
                ),
            ]
        )
    return aggs


def collect_stats(
    spark: SparkSession,
    path: str,
    columns: Optional[List[str]] = None,
    incremental: bool = False,
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

    ``incremental=True`` (r12) folds the stored record forward by
    scanning ONLY the appended delta — at 100 TB a nightly ANALYZE that
    re-reads the whole table is how clusters drown, and everything in
    the record is foldable: row_count/n_nulls add, min/max compare
    typed, and NDV folds through the Datasketches HLL sketch every
    ANALYZE stores per column (``hll_union`` of the stored sketch and
    the delta's — the Iceberg puffin-sketch design). After a fold the
    per-column ``n_distinct`` is the sketch ESTIMATE and its
    ``ndv_mode`` flips from ``exact`` to ``hll`` (the record says which
    it is). Falls back to the full scan — reported via
    ``last_analyze_mode`` — when the delta is not replayable as appends
    (a merge-on-read tombstone or rewrite in the range), the recorded
    baseline snapshot is gone or identity-mismatched (restore +
    re-append lookalikes), a requested column has no stored sketch
    (pre-sketch record or schema evolution), or the column vocabulary
    does not fold (``array<...>`` min/max compare element-wise, not as
    strings). A noop (head unchanged) returns the stored record.
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

    if incremental:
        folded = _fold_stats_forward(spark, path, meta, columns)
        if folded is not None:
            return folded

    row = df.agg(*_stat_aggs(columns)).collect()[0]

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
    import base64 as _b64

    merged_cols.update(
        {
            c: {
                "min": row[f"__min_{c}"],
                "max": row[f"__max_{c}"],
                "n_nulls": row[f"__nulls_{c}"],
                "n_distinct": row[f"__nd_{c}"],
                "ndv_mode": "exact",
                **(
                    {
                        "ndv_hll": _b64.b64encode(
                            bytes(row[f"__hll_{c}"])
                        ).decode("ascii")
                    }
                    if row[f"__hll_{c}"] is not None
                    else {}
                ),
            }
            for c in columns
        }
    )
    stats.update({
        "row_count": row["__n"],
        "as_of_version": version,
        "as_of_ts": _snap_ts(fresh, version),
        "last_analyze_mode": "full",
        "columns": merged_cols,
    })
    fresh.stats = stats
    metadata.write_sidecar(spark, path, fresh)
    return stats


def _fold_stats_forward(
    spark: SparkSession, path: str, meta, columns: List[str]
) -> Optional[Dict]:
    """The incremental ANALYZE fold, or None when only the full scan is
    honest (every bail-out reason in the ``collect_stats`` docstring).
    One delta-only aggregate plus a 1-row union/estimate job."""
    import base64 as _b64

    from .fetch import fetch_changes

    prior = meta.stats or {}
    cols_rec = prior.get("columns", {})
    last, ts = prior.get("as_of_version"), prior.get("as_of_ts")
    if last is None or ts is None:
        return None
    versions = [
        s["version"] for s in meta.snapshots or [] if not s.get("staged")
    ]
    head = versions[-1] if versions else None
    if head is None or last not in versions or _snap_ts(meta, last) != ts:
        return None  # baseline gone or a restore+re-append lookalike
    for c in columns:
        rec = cols_rec.get(c)
        if not rec or "ndv_hll" not in rec:
            return None  # no sketch to fold (pre-sketch record / new col)
        vocab = meta.column_types.get(c, "string")
        if vocab.startswith("array<"):
            return None  # array min/max do not compare as strings
    if head == last:
        return prior  # noop: the record is already at the head
    try:
        delta = fetch_changes(spark, path, last, head)
    except ValueError:
        return None  # non-append delta (tombstone/rewrite in range)
    row = delta.agg(*_stat_aggs(columns)).collect()[0]

    # fold NDV sketches: one 1-row job unioning stored+delta per column
    # and estimating the union (hll_union is a scalar binary function)
    pairs = {}
    for c in columns:
        old_sk = _b64.b64decode(cols_rec[c]["ndv_hll"])
        new_sk = row[f"__hll_{c}"]
        if new_sk is not None:
            pairs[c] = (old_sk, bytes(new_sk))
    unions: Dict[str, tuple] = {}
    if pairs:
        exprs = []
        for c, (a, b) in pairs.items():
            u = F.hll_union(F.lit(bytearray(a)), F.lit(bytearray(b)))
            exprs.append(u.alias(f"__u_{c}"))
            exprs.append(
                F.hll_sketch_estimate(
                    F.hll_union(F.lit(bytearray(a)), F.lit(bytearray(b)))
                ).alias(f"__e_{c}")
            )
        urow = spark.range(1).select(*exprs).collect()[0]
        unions = {
            c: (bytes(urow[f"__u_{c}"]), int(urow[f"__e_{c}"]))
            for c in pairs
        }

    fresh = metadata.read_sidecar(spark, path)
    if fresh is None:
        raise ValueError(f"{path} disappeared during ANALYZE (no sidecar)")
    stats = dict(fresh.stats or {})
    merged_cols = dict(stats.get("columns", {}))
    for c in columns:
        rec = dict(cols_rec[c])
        vocab = meta.column_types.get(c, "string")
        for key, fn in (("min", min), ("max", max)):
            dv = row[f"__{key}_{c}"]
            if dv is None:
                continue  # all-NULL delta column: bounds unchanged
            if rec.get(key) is None:
                rec[key] = dv
            else:
                rec[key] = (
                    dv
                    if fn(
                        _typed_for_fold(dv, vocab),
                        _typed_for_fold(rec[key], vocab),
                    )
                    == _typed_for_fold(dv, vocab)
                    else rec[key]
                )
        rec["n_nulls"] = int(rec["n_nulls"]) + int(row[f"__nulls_{c}"])
        if c in unions:
            rec["ndv_hll"] = _b64.b64encode(unions[c][0]).decode("ascii")
            rec["n_distinct"] = unions[c][1]
            rec["ndv_mode"] = "hll"
        merged_cols[c] = rec
    stats.update({
        "row_count": int(prior["row_count"]) + int(row["__n"]),
        "as_of_version": head,
        "as_of_ts": _snap_ts(fresh, head),
        "last_analyze_mode": "incremental",
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


#: combo count at which the partitions section spills out of the sidecar
#: into a columnar manifest (r14): the sidecar is parsed by EVERY
#: metadata read, so it must stay O(versions + columns) — a date×domain
#: layout at 100 TB reaches 10^5-10^6 combos, and 10^4 inline JSON
#: records is where the record starts dominating sidecar bytes (the same
#: threshold discipline the per-file stats plane applies).
PARTITION_STATS_SPILL_THRESHOLD = 10_000


def _load_partition_recs(spark, path: str, stats: Dict) -> Optional[List[Dict]]:
    """The stored partition records, inline or spilled — the ONE place
    that knows both representations. None when never collected."""
    if stats.get("partitions") is not None:
        return stats["partitions"]
    ptr = stats.get("partitions_manifest")
    if ptr is None:
        return None
    return metadata.read_partition_stats_manifest(spark, path, ptr["path"])


def _store_partition_recs(
    spark,
    path: str,
    stats: Dict,
    recs: List[Dict],
    version,
    spill_threshold: Optional[int] = None,
) -> None:
    """Store the partition records inline (small layouts: zero extra I/O
    to read back) or as a spilled manifest pointer past the threshold.
    Exactly one representation survives in the record."""
    thr = (
        spill_threshold
        if spill_threshold is not None
        else PARTITION_STATS_SPILL_THRESHOLD
    )
    if len(recs) >= thr:
        rel = metadata.write_partition_stats_manifest(
            spark, path, version if version is not None else 0, recs
        )
        stats.pop("partitions", None)
        stats["partitions_manifest"] = {"path": rel, "n": len(recs)}
    else:
        stats.pop("partitions_manifest", None)
        stats["partitions"] = recs


def _partition_counts(df, parts: List[str]) -> List[Dict]:
    """One aggregate: per partition-value-combination row counts, values
    canonicalized to strings (the sidecar is JSON) — shared by the full
    collect and the incremental delta fold."""
    if parts:
        rows = (
            df.groupBy(*[F.col(p).cast("string").alias(p) for p in parts])
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        return [
            {"values": {p: r[p] for p in parts}, "n_rows": r["__n"]}
            for r in rows
        ]
    return [{"values": {}, "n_rows": df.count()}]


def _sort_partition_recs(recs: List[Dict]) -> None:
    recs.sort(
        key=lambda r: [
            (k, v is None, v or "") for k, v in sorted(r["values"].items())
        ]
    )


def collect_partition_stats(
    spark: SparkSession,
    path: str,
    incremental: bool = False,
    spill_threshold: Optional[int] = None,
) -> List[Dict]:
    """ANALYZE at partition granularity (Iceberg's partition-stats files,
    restated for the sidecar): ONE aggregate computing each hive
    partition-value combination's row count, stored under
    ``meta.stats["partitions"]`` (alongside any table-level ANALYZE) and
    stamped with the snapshot version. Partition pruning tells a planner
    which directories survive a filter; partition stats tell it HOW MUCH
    survives — the input-size estimate joins and aggregations are sized
    by, served with zero scans after this one.

    ``incremental=True`` (r13) folds the stored record forward by
    scanning ONLY the appended delta — the same design as
    ``collect_stats(incremental=True)``: per-partition row counts ADD,
    so an append touching one partition re-scans that append's files
    and every untouched partition's stored count carries verbatim.
    Falls back to the full scan — reported via
    ``last_partitions_analyze_mode`` — when the delta is not replayable
    as appends, the recorded baseline snapshot is gone or
    identity-mismatched, the stored record predates the identity stamp,
    or the partition SPEC evolved since the record (the stored value
    combinations describe a different layout). A noop (head unchanged)
    returns the stored record.

    Unpartitioned datasets store a single entry with an empty value map.
    Returns the recorded list of ``{"values": {...}, "n_rows": int}``.

    Past ``spill_threshold`` combos (default
    ``PARTITION_STATS_SPILL_THRESHOLD``) the section spills to an
    immutable columnar manifest under ``_s3parq_stats/`` and the sidecar
    keeps only an O(1) pointer (r14): the sidecar must stay flat however
    many value combinations the layout has — ``read_partition_stats``
    lazy-loads the manifest, and the fold keeps working incrementally
    against either representation.
    """
    from .fetch import fetch_path

    meta = metadata.read_sidecar(spark, path)
    if meta is None:
        raise ValueError(f"{path} is not an s3parq dataset (no sidecar)")
    if incremental:
        folded = _fold_partition_stats_forward(
            spark, path, meta, spill_threshold
        )
        if folded is not None:
            return folded
    df = fetch_path(spark, path)
    parts = list(meta.partitions)
    recs = _partition_counts(df, parts)
    _sort_partition_recs(recs)
    # same fresh-merge discipline as collect_stats: never write back a
    # pre-scan snapshot of the sidecar
    fresh = metadata.read_sidecar(spark, path)
    if fresh is None:
        raise ValueError(f"{path} disappeared during ANALYZE (no sidecar)")
    version = fresh.snapshots[-1]["version"] if fresh.snapshots else None
    stats = dict(fresh.stats or {})
    _store_partition_recs(spark, path, stats, recs, version, spill_threshold)
    stats["partitions_as_of_version"] = version
    stats["partitions_as_of_ts"] = _snap_ts(fresh, version)
    stats["last_partitions_analyze_mode"] = "full"
    fresh.stats = stats
    metadata.write_sidecar(spark, path, fresh)
    return recs


def _fold_partition_stats_forward(
    spark: SparkSession,
    path: str,
    meta,
    spill_threshold: Optional[int] = None,
) -> Optional[List[Dict]]:
    """The incremental partition-stats fold, or None when only the full
    scan is honest (every bail-out reason in the
    ``collect_partition_stats`` docstring). One delta-only aggregate;
    untouched partitions' stored counts carry verbatim. A spilled record
    folds the same way: the manifest hydrates once, the fold is
    in-memory, and the result re-spills to a NEW immutable manifest
    (the superseded one becomes a vacuum-collectable orphan)."""
    from .fetch import fetch_changes

    prior = meta.stats or {}
    last = prior.get("partitions_as_of_version")
    ts = prior.get("partitions_as_of_ts")
    if last is None or ts is None:
        return None  # never collected, or a pre-stamp record
    try:
        recs = _load_partition_recs(spark, path, prior)
    except Exception:  # noqa: BLE001 — unreadable spilled manifest
        return None  # only a full recollect is honest
    if recs is None:
        return None  # never collected
    versions = [
        s["version"] for s in meta.snapshots or [] if not s.get("staged")
    ]
    head = versions[-1] if versions else None
    if head is None or last not in versions or _snap_ts(meta, last) != ts:
        return None  # baseline gone or a restore+re-append lookalike
    parts = list(meta.partitions)
    if any(set(r["values"]) != set(parts) for r in recs):
        return None  # partition spec evolved: old combos describe a
        # different layout — only a full recollect is honest
    if head == last:
        return recs  # noop: the record is already at the head
    try:
        delta = fetch_changes(spark, path, last, head)
    except ValueError:
        return None  # non-append delta (tombstone/rewrite in range)
    delta_recs = _partition_counts(delta, parts)

    merged = {
        tuple(sorted(r["values"].items())): int(r["n_rows"]) for r in recs
    }
    for r in delta_recs:
        key = tuple(sorted(r["values"].items()))
        merged[key] = merged.get(key, 0) + int(r["n_rows"])
    out = [
        {"values": dict(key), "n_rows": n} for key, n in merged.items()
    ]
    _sort_partition_recs(out)

    fresh = metadata.read_sidecar(spark, path)
    if fresh is None:
        raise ValueError(f"{path} disappeared during ANALYZE (no sidecar)")
    stats = dict(fresh.stats or {})
    _store_partition_recs(spark, path, stats, out, head, spill_threshold)
    stats["partitions_as_of_version"] = head
    stats["partitions_as_of_ts"] = _snap_ts(fresh, head)
    stats["last_partitions_analyze_mode"] = "incremental"
    fresh.stats = stats
    metadata.write_sidecar(spark, path, fresh)
    return out


def read_partition_stats(spark: SparkSession, path: str) -> Optional[List[Dict]]:
    """The stored partition-stats record — sidecar JSON only for inline
    records, one lazy columnar-manifest read for spilled ones (r14);
    never a data scan. None when ``collect_partition_stats`` has never
    run."""
    meta = metadata.read_sidecar(spark, path)
    if meta is None:
        raise ValueError(f"{path} is not an s3parq dataset (no sidecar)")
    return _load_partition_recs(spark, path, meta.stats or {})
