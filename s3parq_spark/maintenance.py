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
total bytes from one recursive listing joined to the manifest) and triggers
each action behind an explicit threshold, returning a report of what ran
and why. Thresholds err on the side of doing nothing: compaction is the
one full-rewrite action, so it requires BOTH a file-count and an
average-size signal.

Reference analog: none — the reference's datasets are append-only and
maintained by hand; this is the operational glue the lifecycle layer
(ARCHITECTURE §10) implies.
"""

from __future__ import annotations

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
    average file size — sizes from ONE recursive listing
    (``fs.list_file_sizes``, r14), not a stat per file, so the probe is
    O(listing pages) driver work on any filesystem. Raises when the
    dataset has no sidecar; returns ``avg_file_bytes=0`` for an empty
    dataset."""
    meta = metadata.read_sidecar(spark, path)
    if meta is None:
        raise ValueError(f"{path} is not an s3parq dataset (no sidecar)")
    # all_files: staged (write-audit-publish) snapshots cost real storage
    # and must show in the health numbers even though main reads skip them
    manifest = meta.all_files() or []
    # ONE recursive listing for every size (r14): the old per-file
    # fs.file_size loop was O(files) driver round-trips — a HEAD per
    # file on object stores, hours at 10^6 files. Files the manifest
    # acknowledges but storage lost are simply absent from the listing
    # and contribute 0, exactly the old skip; vacuum/restore remain the
    # repair tools. suffix="" so non-.parquet acknowledged members
    # (eq-delete key files, spilled manifests) keep counting.
    sizes = fs.list_file_sizes(spark, path, suffix="")
    total = sum(sizes.get(rel, 0) for rel in manifest)
    n = len(manifest)
    sidecar_bytes = float(sizes.get(fs.SIDECAR_NAME, 0))
    return {
        "n_snapshots": float(len(meta.snapshots)),
        "n_files": float(n),
        "avg_file_bytes": float(total / n) if n else 0.0,
        "total_bytes": float(total),
        "n_specs": float(len(meta.specs())),
        # merge-on-read debt (r10): every pending commit adds a row filter
        # (predicate tombstone) or an era anti-join (eq key-delete) to
        # every read — the signal that schedules compaction on evidence
        "n_pending_tombstones": float(len(meta.tombstones())),
        "n_pending_eq_deletes": float(len(meta.eq_deletes())),
        # metadata-plane shape (r10): the sidecar must stay O(versions);
        # spilled state lives in the per-version manifests
        "sidecar_bytes": sidecar_bytes,
        "n_stats_manifests": float(len(meta.stats_manifests())),
        "n_spilled_snapshots": float(
            sum(1 for s in meta.snapshots if s.get("manifest"))
        ),
        # ANN drift (r11): present only when the dataset is an ANN index
        # (quantizer sidecar exists) — appended vectors quantize against
        # frozen centroids, so a rising error ratio is the retrain signal
        **_ann_drift(spark, path),
    }


def _ann_drift(spark: SparkSession, path: str) -> Dict[str, float]:
    from .ann_index import (
        QuantizerEpochError,
        _quantizers_path,
        index_drift,
    )

    qp = _quantizers_path(path)
    if not fs.exists(spark, qp):
        # the MISSING-quantizer crash sub-window (ADVICE r14): a rebuild
        # that crashed after parking the live quantizer JSON but before
        # renaming the fresh one in leaves no live quantizer file at
        # all. Index rows that pin an epoch (or a parked
        # ``.prerebuild`` quantizer copy) prove this WAS an ANN family
        # — surface the mismatch so the policy loop suspends the
        # residue sweep instead of deleting the only rollback copies.
        meta = metadata.read_sidecar(spark, path)
        if (meta is not None and meta.ann_epoch) or fs.exists(
            spark, qp + ".prerebuild"
        ):
            return {"ann_epoch_mismatch": 1.0}
        return {}
    try:
        d = index_drift(spark, path)
    except QuantizerEpochError:
        # the crash window between a rebuild's two renames: index rows
        # and quantizer JSON carry different epochs. The health probe
        # must still RETURN (maintain_dataset is how an operator learns
        # about and remedies this), so surface it as a health flag; the
        # policy loop suspends every quantizer-dependent remedy on it.
        return {"ann_epoch_mismatch": 1.0}
    out = {"ann_train_qerr": float(d["train_qerr"])}
    if d["appended_qerr"] is not None:
        out["ann_appended_qerr"] = float(d["appended_qerr"])
    if d["drift_ratio"] is not None:
        out["ann_drift_ratio"] = float(d["drift_ratio"])
    return out


def maintain_dataset(
    spark: SparkSession,
    path: str,
    max_snapshots: int = 64,
    keep_last: int = 16,
    compact_min_files: int = 64,
    compact_below_fraction: float = 0.25,
    max_pending_tombstones: int = 8,
    vacuum_retention_hours: Optional[float] = None,
    ann_drift_threshold: float = 1.5,
    rebuild_on_drift: bool = False,
    resort_depth_threshold: float = 8.0,
    analyze_stale_versions: Optional[int] = None,
    repair_text_on_epoch_mismatch: bool = False,
    dry_run: bool = False,
) -> Dict[str, object]:
    """Run whatever maintenance the dataset is due for; return a report.

    - ``expire_snapshots(keep_last)`` when history exceeds
      ``max_snapshots`` entries — bounds sidecar parse cost, never touches
      data files. Runs PER FAMILY MEMBER on an index dataset (each
      member's history grows at the same per-batch rate), as does the
      opt-in vacuum below.
    - ``compact_dataset()`` — or the family-aware variant when the
      dataset is an index: ``compact_ivf_index`` (quantizer sidecar
      present; covers the raw-vector companion) / ``compact_text_index``
      (bucket-derived postings with a stats sibling; covers doclens,
      stopped, fwd) — when the dataset holds at least
      ``compact_min_files`` files AND their average size is below
      ``compact_below_fraction`` of the ~60 MB contract — the full-rewrite
      action, so both signals must agree — OR when pending merge-on-read
      commits (predicate tombstones + eq key-deletes) reach
      ``max_pending_tombstones``: each pending commit taxes every read
      with a residual filter or era anti-join, and past the threshold the
      one-time materialization beats the recurring tax (the standard
      Hudi/Iceberg MOR compaction cadence, scheduled on evidence).
      Compaction also normalizes a partition-evolved dataset back to a
      single spec — and (r12) a THIRD trigger fires it on clustering
      decay: when the dataset declares a sort/z-order whose lead column
      is zone-mapped, ``clustering_depth`` is consulted (metadata-only)
      and an ``avg_depth`` at or past ``resort_depth_threshold`` with at
      least ``compact_min_files`` files schedules the rewrite —
      compaction re-applies the declared clustering by default, so the
      same action restores the zone-map locality appends interleaved
      away. This is the "schedule it when avg_depth crosses a policy
      threshold, not on a timer" loop ``clustering_depth`` documents.
    - ``vacuum_dataset(retention_hours=...)`` only when the caller passes
      ``vacuum_retention_hours`` explicitly — deleting files is opt-in per
      call, never something a generic policy loop silently starts doing.
      The same opt-in also sweeps PARKED REWRITE RESIDUE (r13): a crash
      between a rewrite's swap-in and its final cleanup leaves the old
      copy at ``<path>.precompact`` / ``.prerebuild`` / etc. — residue
      only when the live sidecar is valid (the swap completed), which
      holds here because the health probe raised otherwise. The sweep
      honors the SAME retention window as vacuum (r14): candidates
      whose mtime is inside ``vacuum_retention_hours`` are skipped —
      another process's in-flight compaction/rebuild temp state looks
      identical to abandoned residue until it ages past the window —
      and an ANN family whose index/quantizer epochs mismatch has its
      sweep suspended entirely (the parked state is the manual-restore
      path).
    - ``collect_stats(incremental=True)`` (r13) when the caller passes
      ``analyze_stale_versions`` and an EXISTING ANALYZE record lags the
      head by at least that many snapshots (or lost its identity stamp to
      a stale-at-rewrite carry). The loop only refreshes records an
      operator once collected — it never starts analyzing an unanalyzed
      dataset. Incremental-first: a delta scan when the history permits,
      an honest reported full scan when it does not; the per-partition
      section refreshes on its own staleness the same way. Runs BEFORE
      any compaction in the same pass (r14): refreshed while the append
      history is intact, the fold is O(delta), and the rewrite's
      stats carry then restamps a provably-current record — the other
      order would strip a stale record's identity stamp at the rewrite
      and pay a full ANALYZE rescan on every compacting pass.
    - Text-index commit-stamp mismatch (r15): when the dataset is a
      text-index family whose stamps disagree with its live heads (a
      crashed maintenance op — searches refuse loudly), the loop
      surfaces a ``text_epoch_mismatch`` advisory and suspends
      compaction; ``repair_text_on_epoch_mismatch=True`` runs the
      remedy pair (``repair_capped_index`` then ``repair_index_stats``,
      which re-stamps) — opt-in like ``rebuild_on_drift``, because the
      repair is a real data read (bounded: stop-term fetches + one
      O(docs) doclens scan).
    - ANN retrain when the dataset is an ANN index and its
      appended-vs-training quantization-error ratio reaches
      ``ann_drift_threshold``: appends encode against frozen quantizers,
      so distribution shift decays recall with no error anywhere. With
      ``rebuild_on_drift=True`` (r13) and the true vectors recoverable
      at rest (flat index, or PQ with its raw-vector companion), the
      loop runs ``rebuild_ivf_index`` — retrain-and-swap with the txn
      ledger carried. Otherwise the entry stays an ADVISORY naming the
      remedy (retraining is the one full-train action in the family,
      so it is opt-in like vacuum).

    ``dry_run=True`` reports which actions WOULD run (and vacuum's orphan
    list) without changing anything. The report carries the health probe,
    the actions taken/skipped, and each action's return value.
    """
    health = dataset_health(spark, path)
    report: Dict[str, object] = {"health": health, "actions": []}

    # family detection (r12): an index dataset's maintenance debt lives
    # across its companions too — the vectors side table / doclens /
    # stopped / fwd accrue their own snapshots, tombstones, and small
    # files from the same maintenance ops (a streaming upsert adds TWO
    # snapshots per batch on each side), and maintaining the
    # postings/cells alone would leave them taxing every search. Detect
    # the family FIRST so every remedy below sees the whole family.
    compact_fn, compact_name = compact_dataset, "compact_dataset"
    companions: list = []
    from .ann_index import _quantizers_path

    if fs.exists(spark, _quantizers_path(path)):
        from .ann_index import compact_ivf_index

        compact_fn, compact_name = compact_ivf_index, "compact_ivf_index"
        companions = [path.rstrip("/") + "_vectors"]
    else:
        m = metadata.read_sidecar(spark, path)
        if (
            m is not None
            and "bucket" in (m.derived_partitions or {})
            # require the POSTINGS schema, not just the bucket layout:
            # any bucket_by-published dataset with an unrelated sibling
            # named <path>_stats would otherwise be dispatched to
            # compact_text_index, which fails on a non-postings schema
            and all(c in m.column_types for c in ("term", "tf", "dl"))
            and metadata.read_sidecar(spark, path.rstrip("/") + "_stats")
            is not None
        ):
            from .text_index import compact_text_index

            compact_fn, compact_name = (
                compact_text_index, "compact_text_index",
            )
            companions = [
                path.rstrip("/") + s
                for s in ("_doclens", "_stopped", "_fwd")
            ]
    live_companions = [
        p for p in companions
        if metadata.read_sidecar(spark, p) is not None
    ]
    member_healths = [health] + [
        dataset_health(spark, p) for p in live_companions
    ]

    # text-index commit-stamp mismatch (r15 — the ANN epoch discipline
    # applied to the text family): a crashed maintenance op left live
    # heads the stamps no longer match — searches refuse loudly until
    # remedied. Surfaced like quantizer_epoch_mismatch; compaction is
    # suspended (the family op would refuse, and a raw rewrite would
    # launder the damage); with ``repair_text_on_epoch_mismatch=True``
    # the loop runs the documented remedy pair — residency first
    # (repair_capped_index, bounded by stop-term cardinality), then the
    # stats recompute from the doclens scan (repair_index_stats, which
    # re-stamps) — the same opt-in pattern as rebuild_on_drift.
    text_epoch_broken = False
    if compact_name == "compact_text_index":
        from .text_index import TextIndexEpochError, _check_family_epoch

        try:
            _check_family_epoch(
                spark, path, metadata.read_sidecar(spark, path),
                "maintain_dataset",
            )
        except TextIndexEpochError as exc:
            text_epoch_broken = True
            entry = {
                "action": "text_epoch_mismatch",
                "advisory": str(exc),
            }
            if repair_text_on_epoch_mismatch and dry_run:
                entry["would_run"] = True
            elif repair_text_on_epoch_mismatch:
                from .text_index import (
                    repair_capped_index,
                    repair_index_stats,
                )

                try:
                    moved = repair_capped_index(spark, path)
                    n_docs, total_len = repair_index_stats(spark, path)
                    entry["result"] = {
                        "moved_terms": moved,
                        "n_docs": n_docs,
                        "total_len": total_len,
                    }
                    text_epoch_broken = False  # repaired: remedies resume
                except Exception as exc2:  # noqa: BLE001
                    entry["failed"] = f"{type(exc2).__name__}: {exc2}"
            report["actions"].append(entry)

    # quantizer-epoch mismatch (r14): the index rows and the quantizer
    # JSON disagree about which quantizers the rows were encoded against
    # — the rebuild swap's crash window. Every quantizer-dependent remedy
    # (family compaction, drift/rebuild) AND the parked-residue sweep is
    # suspended: the parked ``.prerebuild`` family is the manual-restore
    # path the refusal names, and sweeping it would destroy the only
    # rollback while the live family serves refusals.
    epoch_broken = bool(health.get("ann_epoch_mismatch"))
    if epoch_broken:
        report["actions"].append(
            {
                "action": "quantizer_epoch_mismatch",
                "advisory": (
                    "index rows and quantizer sidecar carry different "
                    "epochs (crashed rebuild swap): searches refuse "
                    "loudly until remedied — re-run rebuild_ivf_index "
                    "to converge forward, or rollback_rebuild to "
                    "restore the parked "
                    f"{path.rstrip('/')}.prerebuild family. Compaction, "
                    "drift remedies, and the parked-residue sweep are "
                    "suspended for this family."
                ),
            }
        )

    # snapshot-history bounds apply PER MEMBER: expiry squashes history
    # without touching data (search-invisible), and a companion's
    # history grows at the same per-batch rate as the primary's
    for p, h in zip([path] + live_companions, member_healths):
        if h["n_snapshots"] > max_snapshots:
            entry = {
                "action": "expire_snapshots",
                "dataset": p,
                "reason": f"{int(h['n_snapshots'])} snapshots > "
                          f"max_snapshots={max_snapshots}",
            }
            try:
                entry["result"] = expire_snapshots(
                    spark, p, keep_last=keep_last, dry_run=dry_run
                )
            except TagPinnedError as exc:
                # a pinned ref is an operator decision, not a fault:
                # record the skip and keep running the remaining
                # remedies — one long-lived tag must not wedge the
                # whole maintenance loop
                entry["skipped"] = str(exc)
            report["actions"].append(entry)
    if analyze_stale_versions is not None:
        # opt-in ANALYZE refresh (r13): the loop only REFRESHES a record
        # an operator once collected — never starts analyzing a dataset
        # nobody asked stats for. Runs BEFORE any compaction below
        # (r14): the fold is an O(delta) scan while the append history
        # is intact, and the rewrite's carry then restamps a PROVABLY
        # CURRENT record to the rewritten head — refresh-after-rewrite
        # would find a stale record stripped of its identity stamp and
        # pay an honest full rescan every maintenance pass that
        # compacts. Incremental first: a delta scan when the history
        # permits, an honest reported full scan when it does not.
        m2 = metadata.read_sidecar(spark, path)
        rec = (m2.stats or {}) if m2 is not None else {}
        has_partitions = bool(
            rec.get("partitions") or rec.get("partitions_manifest")
        )
        if rec.get("columns") or has_partitions:
            versions = [
                s.get("version")
                for s in (m2.snapshots or [])
                if not s.get("staged")
            ]

            def _lag(stamp_key: str) -> int:
                stamp = rec.get(stamp_key)
                if stamp is None:
                    return len(versions)  # stampless record: refresh
                if stamp not in versions:
                    return len(versions)
                return len(versions) - 1 - versions.index(stamp)

            due = []
            if rec.get("columns") and (
                _lag("as_of_version") >= analyze_stale_versions
            ):
                due.append("table")
            if has_partitions and (
                _lag("partitions_as_of_version") >= analyze_stale_versions
            ):
                due.append("partitions")
            if due:
                entry = {
                    "action": "collect_stats",
                    "reason": (
                        f"ANALYZE record ({' + '.join(due)}) lags the "
                        f"head by >= analyze_stale_versions="
                        f"{analyze_stale_versions} snapshots"
                    ),
                }
                if not dry_run:
                    from .stats import (
                        collect_partition_stats,
                        collect_stats,
                    )

                    try:
                        result = {}
                        if "table" in due:
                            s = collect_stats(
                                spark, path, incremental=True
                            )
                            result["mode"] = s["last_analyze_mode"]
                            result["row_count"] = s["row_count"]
                        if "partitions" in due:
                            collect_partition_stats(
                                spark, path, incremental=True
                            )
                            result["partitions_mode"] = (
                                metadata.read_sidecar(spark, path)
                                .stats["last_partitions_analyze_mode"]
                            )
                        entry["result"] = result
                    except Exception as exc:  # noqa: BLE001
                        entry["failed"] = f"{type(exc).__name__}: {exc}"
                report["actions"].append(entry)

    # identify the TRIGGERING member, not just whether one exists: the
    # reason string must name whose files are small (the primary may be
    # perfectly healthy while a companion crossed the threshold)
    small = next(
        (
            (p, h)
            for p, h in zip([path] + live_companions, member_healths)
            if h["n_files"] >= compact_min_files
            and h["avg_file_bytes"]
            < compact_below_fraction * TARGET_FILE_BYTES
        ),
        None,
    )
    # merge-on-read debt (r10): each pending tombstone/eq-delete commit
    # taxes EVERY read (row filter / era anti-join); past the threshold
    # the one-time rewrite is cheaper than the recurring read tax
    mor_debt = sum(
        int(h["n_pending_tombstones"] + h["n_pending_eq_deletes"])
        for h in member_healths
    )
    # clustering decay (r12): a declared sort/z-order whose lead column
    # is zone-mapped gets its depth probed (metadata-only, O(n log n)
    # over per-file ranges) — appends interleave ranges over the sorted
    # base until zone maps stop skipping, and the rewrite that fixes it
    # is the same compaction (which re-applies the declared clustering
    # by default). Index families keep their own layouts; plain
    # datasets only.
    decayed = None
    if compact_name == "compact_dataset":
        m = metadata.read_sidecar(spark, path)
        decl = list(m.sort_columns or []) if m is not None else []
        import re as _re2

        zm = (
            _re2.fullmatch(r"z\((.+)\)", decl[0])
            if len(decl) == 1 else None
        )
        lead = (
            [c.strip() for c in zm.group(1).split(",")][0]
            if zm else (decl[0] if decl else None)
        )
        if (
            lead is not None
            and m is not None
            and lead in m.zone_map_columns()
            and health["n_files"] >= compact_min_files
        ):
            d = clustering_depth(spark, path, lead)
            if d["n_covered"] and d["avg_depth"] >= resort_depth_threshold:
                decayed = (lead, d["avg_depth"])
    if (small or decayed or mor_debt >= max_pending_tombstones) and (
        not epoch_broken and not text_epoch_broken
    ):
        entry = {
            "action": compact_name,
            "reason": (
                (
                    f"{small[0]} holds {int(small[1]['n_files'])} files "
                    f"averaging {small[1]['avg_file_bytes'] / 1024:.0f} "
                    f"KiB (>= {compact_min_files} files under "
                    f"{compact_below_fraction:.0%} of the "
                    f"{TARGET_FILE_BYTES // (1024 * 1024)} MB contract)"
                )
                if small
                else (
                    f"clustering decay on {decayed[0]!r}: avg_depth "
                    f"{decayed[1]:.1f} >= resort_depth_threshold="
                    f"{resort_depth_threshold} (rewrite re-applies the "
                    "declared clustering)"
                )
                if decayed
                else (
                    f"{mor_debt} pending merge-on-read commits across the "
                    f"family >= max_pending_tombstones="
                    f"{max_pending_tombstones}"
                )
            ),
        }
        if not dry_run:
            try:
                entry["result"] = compact_fn(spark, path)
            except (TagPinnedError, PendingAuditError) as exc:
                entry["skipped"] = str(exc)  # operator decision, not a fault
            except Exception as exc:  # noqa: BLE001
                # a compaction fault must not abort the whole policy
                # loop (the remaining remedies — advisory, vacuum —
                # still apply); record it so the scheduler's report
                # shows the failure instead of the loop dying mid-pass.
                # Compaction's sibling-temp + two-rename discipline
                # means a failed rewrite left the dataset untouched.
                entry["failed"] = f"{type(exc).__name__}: {exc}"
        report["actions"].append(entry)

    drift = health.get("ann_drift_ratio")
    if drift is not None and drift >= ann_drift_threshold:
        entry = {
            "action": "rebuild_ivf_index",
            "reason": f"ann_drift_ratio {drift:.2f} >= "
                      f"ann_drift_threshold={ann_drift_threshold}",
        }
        # the rebuild needs the true vectors, which are at rest only
        # for a flat index (rows carry vec) or a PQ index with its
        # raw-vector companion — opt-in because retraining is the one
        # full-train action in the family (r13: the drift advisory's
        # scheduled remedy)
        from .ann_index import _load_quantizers

        q = _load_quantizers(spark, path, "maintain_dataset")
        recoverable = q["m"] is None or bool(live_companions)
        if rebuild_on_drift and recoverable and dry_run:
            # the operator ALREADY opted in — the dry_run contract is
            # "report which actions WOULD run", not re-advise the flag
            # they passed (r13 ADVICE)
            entry["would_run"] = True
        elif rebuild_on_drift and recoverable:
            from .ann_index import rebuild_ivf_index

            try:
                entry["result"] = rebuild_ivf_index(spark, path)
            except (TagPinnedError, PendingAuditError) as exc:
                entry["skipped"] = str(exc)
            except Exception as exc:  # noqa: BLE001
                entry["failed"] = f"{type(exc).__name__}: {exc}"
        else:
            entry["advisory"] = (
                "appended vectors quantize markedly worse than the "
                "training corpus (frozen quantizers): recall is "
                "decaying silently — "
                + (
                    "pass rebuild_on_drift=True to retrain-and-swap "
                    "(rebuild_ivf_index)"
                    if recoverable
                    else "re-train with build_ivf_index over the "
                    "current vectors (no true vectors at rest: PQ "
                    "index without a companion)"
                )
            )
        report["actions"].append(entry)

    if vacuum_retention_hours is not None:
        # opt-in orphan sweep runs per family member: a crash between a
        # companion append and the primary commit leaves ITS orphans on
        # the companion side, where a primary-only vacuum never looks
        for p in [path] + live_companions:
            report["actions"].append(
                {
                    "action": "vacuum_dataset",
                    "dataset": p,
                    "reason": f"caller-enabled, retention="
                              f"{vacuum_retention_hours}h",
                    "result": vacuum_dataset(
                        spark,
                        p,
                        dry_run=dry_run,
                        retention_hours=vacuum_retention_hours,
                    ),
                }
            )
        # parked-rewrite residue (r13): the two-rename swap in compact/
        # repartition/rebuild deletes its parked ".pre*" sibling last, so
        # a crash in that window leaves a full old copy next to the live
        # dataset. It is residue ONLY when the live dataset has a valid
        # sidecar (the swap completed); the other crash window — live
        # path missing, parked dir the sole good copy — never reaches
        # here because the health probe raises first. Same opt-in as
        # vacuum: this deletes files — and (r14) the same RETENTION
        # WINDOW as vacuum: a candidate younger than
        # ``vacuum_retention_hours`` may be another process's IN-FLIGHT
        # compaction/rebuild temp dir (".compacting"/".rebuilding" exist
        # for the whole build, ".pre*" between a live swap's renames),
        # so only age past the window marks it abandoned. An ANN family
        # whose epochs mismatch never reaches here (sweep suspended
        # above): its parked ".prerebuild" state IS the manual-restore
        # path the refusal names.
        import time as _time

        residue_cutoff = _time.time() - vacuum_retention_hours * 3600.0
        residue_candidates = [
            p.rstrip("/") + suffix
            for p in [path] + live_companions
            for suffix in (
                ".precompact", ".prerepartition", ".prerebuild",
                ".compacting", ".repartitioning", ".rebuilding",
            )
        ]
        if compact_name == "compact_ivf_index":
            # the ANN rebuild additionally parks/builds the companion and
            # quantizer-sidecar members under the index's own temp names
            base = path.rstrip("/")
            residue_candidates += [
                base + ".rebuilding_vectors",
                base + ".rebuilding_quantizers.json",
                base + "_quantizers.json.prerebuild",
            ]
        if epoch_broken:
            residue_candidates = []
        for parked in residue_candidates:
            if not fs.exists(spark, parked):
                continue
            try:
                # newest write ANYWHERE in the tree (r14 review fix): a
                # top dir's own mtime reflects only direct-child
                # creation — an in-flight rewrite streaming leaf files
                # into partition subdirs for hours never bumps it, and
                # object stores can report 0 for synthetic dirs. Only a
                # tree whose newest write aged past the window is
                # abandoned residue. Parked ".pre*" DIRECTORIES carry a
                # park-time ``_PARKED_AT`` stamp (r15, ADVICE r14):
                # rename preserves every mtime in the tree, so the
                # stamp's own mtime is what actually records WHEN the
                # park happened — newest_mtime sees it with no special
                # casing here.
                if fs.newest_mtime(spark, parked) > residue_cutoff:
                    continue  # possibly in-flight in another process
            except OSError:
                continue  # raced away between exists and stat
            if parked.endswith(".json.prerebuild"):
                # a parked FILE takes no stamp (nothing to write inside
                # it) and rename preserved its mtime — gate on the LIVE
                # sibling instead: the swap that parked it rewrote the
                # live member at park time, so a fresh live file means
                # the park just happened (ADVICE r14). A MISSING live
                # sibling is the crashed-mid-swap state whose sweep the
                # epoch-mismatch suspension above already disabled.
                live_sibling = parked[: -len(".prerebuild")]
                try:
                    if fs.file_mtime(spark, live_sibling) > residue_cutoff:
                        continue
                except OSError:
                    pass
            entry = {
                "action": "remove_rewrite_residue",
                "reason": f"crashed rewrite left {parked} behind "
                          "(live sidecar is valid, so the swap "
                          "completed)",
                "result": parked,
            }
            if not dry_run:
                fs.delete(spark, parked)
            report["actions"].append(entry)
    return report


def clustering_depth(spark: SparkSession, path: str, column: str) -> Dict[str, float]:
    """Metadata-only clustering health for a zone-mapped column: how many
    files a point lookup on ``column`` must read ("depth"), computed from
    the per-file [min, max] ranges with ONE O(n log n) sweep over range
    endpoints — zero data or footer I/O.

    A freshly sorted/z-ordered dataset has near-disjoint ranges
    (``max_depth`` 1-2: adjacent files can share a boundary KEY when a
    duplicated value straddles a file split, so a point predicate reads
    one or two files); continued appends interleave new ranges over old
    ones and the depth climbs toward ``n_covered`` (every file overlaps
    every point — zone maps stop skipping). This is the signal that decides WHEN
    ``compact_dataset(sort_by=[column])`` is worth its rewrite: schedule
    it when ``avg_depth`` crosses a policy threshold, not on a timer.

    Returns ``n_files`` (manifest), ``n_covered`` (files with stats for
    the column; all-NULL files excluded — they have no range),
    ``max_depth``, ``avg_depth`` (depth averaged over distinct range
    starts, weighted by nothing — a planner-facing shape signal, not a
    row estimate). Raises if the column is not zone-mapped."""
    meta = metadata.read_sidecar(spark, path)
    if meta is None:
        raise ValueError(f"{path} is not an s3parq dataset (no sidecar)")
    if column not in meta.zone_map_columns():
        raise ValueError(
            f"clustering_depth: {column!r} is not zone-mapped at {path} "
            f"(declared: {meta.zone_map_columns()}) — publish with "
            "zone_map_columns to record per-file ranges"
        )
    manifest = meta.manifest_files() or []
    vocab = meta.column_types.get(column, "string")
    files_meta = meta.file_stats()
    ranges = []
    for rel in manifest:
        st = (files_meta.get(rel) or {}).get("stats", {}).get(column)
        if not st or st[0] is None:
            continue
        mn = metadata.zone_stat_typed(st[0], vocab)
        mx = metadata.zone_stat_typed(st[1], vocab)
        if (isinstance(mn, float) and mn != mn) or (
            isinstance(mx, float) and mx != mx
        ):
            continue  # NaN bound: no usable range
        ranges.append((mn, mx))
    if not ranges:
        return {
            "n_files": float(len(manifest)),
            "n_covered": 0.0,
            "max_depth": 0.0,
            "avg_depth": 0.0,
        }
    # sweep: +1 at each range start, -1 AFTER each range end (closed
    # intervals: [1,5] and [5,9] DO overlap at 5 -> end events sort
    # after start events at the same key)
    events = []
    for mn, mx in ranges:
        events.append((mn, 0))   # start (0 sorts before 1 at same key)
        events.append((mx, 1))   # end
    events.sort(key=lambda e: (e[0], e[1]))
    depth = 0
    depths = []
    for _, kind in events:
        if kind == 0:
            depth += 1
            depths.append(depth)  # depth at each range start
        else:
            depth -= 1
    return {
        "n_files": float(len(manifest)),
        "n_covered": float(len(ranges)),
        "max_depth": float(max(depths)),
        "avg_depth": float(sum(depths) / len(depths)),
    }
