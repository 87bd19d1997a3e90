"""Policy-driven dataset maintenance: one call that keeps a continuously
ingested dataset healthy.

Micro-batch appends (``stream_publish``, minute-cadence pipelines) degrade
a dataset in three independent ways, each with an existing remedy:

- snapshot history grows without bound        → ``expire_snapshots``
- files shrink far below the ~60 MB contract  → ``compact_dataset``
- failed writes leave unacknowledged orphans  → ``vacuum_dataset``

Each remedy is safe and idempotent on its own; what an operator actually
schedules is "look at the dataset, do whatever is due". ``maintain_dataset``
is that loop body: it inspects ONLY metadata (sidecar history, file count,
total bytes from a driver-side stat pass over the manifest) and triggers
each action behind an explicit threshold, returning a report of what ran
and why. Thresholds err on the side of doing nothing: compaction is the
one full-rewrite action, so it requires BOTH a file-count and an
average-size signal.

Reference analog: none — the reference's datasets are append-only and
maintained by hand; this is the operational glue the lifecycle layer
(ARCHITECTURE §10) implies.
"""

from __future__ import annotations

import posixpath
from typing import Dict, Optional

from pyspark.sql import SparkSession

from . import fs, metadata
from .publish import (
    PendingAuditError,
    TagPinnedError,
    compact_dataset,
    expire_snapshots,
    vacuum_dataset,
)

#: publish's file-size contract (bytes): files far below it signal
#: compaction; mirrors the ~60 MB target of ``_estimate_rows_per_file``
TARGET_FILE_BYTES = 60 * 1024 * 1024


def dataset_health(spark: SparkSession, path: str) -> Dict[str, float]:
    """Metadata-only health probe: snapshot count, manifest file count,
    average file size (driver-side ``stat`` per manifest file — O(files),
    the same cost class as the listing plane). Raises when the dataset has
    no sidecar; returns ``avg_file_bytes=0`` for an empty dataset."""
    meta = metadata.read_sidecar(spark, path)
    if meta is None:
        raise ValueError(f"{path} is not an s3parq dataset (no sidecar)")
    # all_files: staged (write-audit-publish) snapshots cost real storage
    # and must show in the health numbers even though main reads skip them
    manifest = meta.all_files() or []
    total = 0
    for rel in manifest:
        try:
            total += int(
                fs.file_size(spark, posixpath.join(path, rel))
            )
        except OSError:
            # a file the manifest acknowledges but storage lost: report
            # what exists; vacuum/restore are the repair tools. fs.file_size
            # normalizes the Hadoop-branch FileNotFoundException to
            # FileNotFoundError, so this covers remote filesystems too.
            continue
    n = len(manifest)
    return {
        "n_snapshots": float(len(meta.snapshots)),
        "n_files": float(n),
        "avg_file_bytes": float(total / n) if n else 0.0,
        "total_bytes": float(total),
        "n_specs": float(len(meta.specs())),
    }


def maintain_dataset(
    spark: SparkSession,
    path: str,
    max_snapshots: int = 64,
    keep_last: int = 16,
    compact_min_files: int = 64,
    compact_below_fraction: float = 0.25,
    vacuum_retention_hours: Optional[float] = None,
    dry_run: bool = False,
) -> Dict[str, object]:
    """Run whatever maintenance the dataset is due for; return a report.

    - ``expire_snapshots(keep_last)`` when history exceeds
      ``max_snapshots`` entries — bounds sidecar parse cost, never touches
      data files.
    - ``compact_dataset()`` when the dataset holds at least
      ``compact_min_files`` files AND their average size is below
      ``compact_below_fraction`` of the ~60 MB contract — the full-rewrite
      action, so both signals must agree. Compaction also normalizes a
      partition-evolved dataset back to a single spec.
    - ``vacuum_dataset(retention_hours=...)`` only when the caller passes
      ``vacuum_retention_hours`` explicitly — deleting files is opt-in per
      call, never something a generic policy loop silently starts doing.

    ``dry_run=True`` reports which actions WOULD run (and vacuum's orphan
    list) without changing anything. The report carries the health probe,
    the actions taken/skipped, and each action's return value.
    """
    health = dataset_health(spark, path)
    report: Dict[str, object] = {"health": health, "actions": []}

    if health["n_snapshots"] > max_snapshots:
        entry = {
            "action": "expire_snapshots",
            "reason": f"{int(health['n_snapshots'])} snapshots > "
                      f"max_snapshots={max_snapshots}",
        }
        try:
            entry["result"] = expire_snapshots(
                spark, path, keep_last=keep_last, dry_run=dry_run
            )
        except TagPinnedError as exc:
            # a pinned ref is an operator decision, not a fault: record
            # the skip and keep running the remaining remedies — one
            # long-lived tag must not wedge the whole maintenance loop
            entry["skipped"] = str(exc)
        report["actions"].append(entry)

    small = (
        health["n_files"] >= compact_min_files
        and health["avg_file_bytes"]
        < compact_below_fraction * TARGET_FILE_BYTES
    )
    if small:
        entry = {
            "action": "compact_dataset",
            "reason": (
                f"{int(health['n_files'])} files averaging "
                f"{health['avg_file_bytes'] / 1024:.0f} KiB < "
                f"{compact_below_fraction:.0%} of the "
                f"{TARGET_FILE_BYTES // (1024 * 1024)} MB contract"
            ),
        }
        if not dry_run:
            try:
                entry["result"] = compact_dataset(spark, path)
            except (TagPinnedError, PendingAuditError) as exc:
                entry["skipped"] = str(exc)  # operator decision, not a fault
        report["actions"].append(entry)

    if vacuum_retention_hours is not None:
        report["actions"].append(
            {
                "action": "vacuum_dataset",
                "reason": f"caller-enabled, retention="
                          f"{vacuum_retention_hours}h",
                "result": vacuum_dataset(
                    spark,
                    path,
                    dry_run=dry_run,
                    retention_hours=vacuum_retention_hours,
                ),
            }
        )
    return report
