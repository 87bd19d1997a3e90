"""Continuous aggregates: a materialized GROUP BY dataset maintained
INCREMENTALLY from the source's append-only version history.

The Timescale continuous-aggregate / Iceberg incremental-refresh story,
restated for the sidecar: ``create_aggregate`` materializes
``SELECT group_by..., aggs... FROM src GROUP BY group_by`` as a normal
published dataset and records the definition (plus the source version it
saw) in the destination's sidecar; ``refresh_aggregate`` then reads ONLY
the source versions committed since (``fetch_changes`` — O(delta), never
O(source)), aggregates the delta, and folds it into the existing
aggregate rows by each aggregate's MERGE function. At 100 TB of source
with a GB of aggregate, a refresh costs the new data plus a rewrite of
the (small) aggregate — the only geometry under which a dashboard-grade
rollup over a continuously ingested corpus stays affordable.

Only DECOMPOSABLE aggregates are accepted — ``count`` / ``sum`` /
``min`` / ``max`` — because the incremental fold must be exact:
``merge(agg(A), agg(B)) == agg(A ∪ B)``. ``avg`` is the caller's
``sum``/``count`` pair (exactness rule: use a DECIMAL cast inside sum so
the fold is order-independent). A source delta that is NOT append-only
(a merge-on-read tombstone in the refresh range, or history rewritten/
expired past the recorded version) falls back to a FULL recompute —
reported, never silent.

Reference analog: none (extension per SURVEY §7.4).
"""

from __future__ import annotations

import posixpath
import re
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import metadata
from .fetch import fetch_changes, fetch_path
from .publish import _guarded_sidecar_write, publish_path

__all__ = ["create_aggregate", "refresh_aggregate"]

#: merge function per decomposable aggregate: how two partial results of
#: the same aggregate fold into one (count partials fold by SUM)
_MERGE_FN = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}

_AGG_RE = re.compile(r"^\s*(count|sum|min|max)\s*\((.*)\)\s*$", re.I | re.S)


def _agg_fn(expr: str) -> str:
    """Validate that ``expr`` is EXACTLY one decomposable aggregate call.

    Prefix matching is not enough: ``min(a)+max(a)``, ``count(*) - 5``
    and ``count(distinct x)`` all start like a decomposable aggregate but
    none folds correctly under merge(agg(A), agg(B)) == agg(A ∪ B) —
    so the whole expression must be a single count/sum/min/max call
    (the closing paren is the last token and closes the opening one)
    with no DISTINCT inside."""
    m = _AGG_RE.match(expr)
    ok = bool(m)
    if ok:
        inner = m.group(2)
        depth = 0
        for ch in inner:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth < 0:  # the wrapping call closed early: min(a)+max(a)
                    ok = False
                    break
        ok = ok and depth == 0
        if ok and re.search(r"\bdistinct\b", inner, re.I):
            raise ValueError(
                f"aggregate {expr!r} is not decomposable — DISTINCT "
                "aggregates cannot be merged from partials (a value seen "
                "in two deltas would double-count)"
            )
    if not ok:
        raise ValueError(
            f"aggregate {expr!r} is not decomposable — only a single "
            "count/sum/min/max call can be refreshed incrementally "
            "(express avg as a sum + count pair)"
        )
    return m.group(1).lower()


def _src_head(src_meta: metadata.DatasetMetadata, src_path: str) -> int:
    """Newest MAIN-LINE source version. Staged (write-audit-publish)
    snapshots must not move the baseline: their data is invisible to the
    aggregate's own fetch, and their version number is REUSED after a
    promote/discard — stamping it as last_src_version would make the
    post-promote refresh a silent noop."""
    if src_meta is None:
        raise ValueError(f"no sidecar at {src_path}")
    main = [
        s["version"] for s in src_meta.snapshots if not s.get("staged")
    ]
    if not main:
        raise ValueError(
            f"create/refresh_aggregate: source {src_path} has no main-line "
            "snapshot history — the incremental contract needs versioned "
            "appends"
        )
    return main[-1]


def _snapshot_ts(src_meta: metadata.DatasetMetadata, version: int):
    """Commit timestamp of the main-line source snapshot at ``version``
    (``None`` for a bootstrap snapshot, which carries no truthful ts).
    Version numbers alone do not identify a snapshot: ``restore_dataset``
    drops history and subsequent appends REUSE the dropped numbers, so the
    refresh baseline is pinned by (version, ts) — a reused version gets a
    fresh wall-clock ts and the mismatch forces a reported full recompute
    instead of silently keeping rolled-back contributions."""
    for s in src_meta.snapshots:
        if not s.get("staged") and s["version"] == version:
            return s.get("ts")
    return None


def _aggregate(df: DataFrame, group_by: List[str], aggs: Dict[str, str]) -> DataFrame:
    return df.groupBy(*group_by).agg(
        *[F.expr(e).alias(name) for name, e in aggs.items()]
    )


def _merge_exprs(aggs: Dict[str, str]):
    return [
        getattr(F, _MERGE_FN[_agg_fn(e)])(name).alias(name)
        for name, e in aggs.items()
    ]


def _attach_definition(spark: SparkSession, dst_path: str, defn: dict) -> None:
    def mutate(meta):
        meta.aggregate = defn

    _guarded_sidecar_write(spark, dst_path, mutate)


def create_aggregate(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    group_by: List[str],
    aggs: Dict[str, str],
) -> dict:
    """Materialize ``SELECT group_by, aggs FROM src GROUP BY group_by``
    into ``dst_path`` and record the refresh contract. ``aggs`` maps
    output column name → a decomposable aggregate SQL expression
    (``{"n": "count(*)", "rev": "sum(cast(price as decimal(18,2)))"}``).
    Returns the recorded definition."""
    if not group_by:
        raise ValueError("group_by must name at least one column")
    for name, e in aggs.items():
        _agg_fn(e)  # validates decomposability
        if name in group_by:
            raise ValueError(f"aggregate output {name!r} collides with a group key")
    src_meta = metadata.read_sidecar(spark, src_path)
    head = _src_head(src_meta, src_path)
    full = _aggregate(fetch_path(spark, src_path), group_by, aggs)
    publish_path(spark, dst_path, full, [], mode="overwrite")
    defn = {
        "src": src_path,
        "group_by": list(group_by),
        "aggs": dict(aggs),
        "last_src_version": head,
        "last_src_ts": _snapshot_ts(src_meta, head),
    }
    _attach_definition(spark, dst_path, defn)
    return dict(defn)


def refresh_aggregate(
    spark: SparkSession, dst_path: str, src_path: Optional[str] = None
) -> dict:
    """Bring a continuous aggregate up to the source's current head.

    Incremental path: aggregate ONLY the delta versions
    (``fetch_changes(last, head)`` — the same partial shape as the
    definition), union with the existing aggregate rows, fold by each
    aggregate's merge function, rewrite ``dst`` (small), stamp the new
    head. Falls back to a FULL recompute — reported via ``mode`` — when
    the delta is not replayable as appends: a merge-on-read tombstone in
    the range, or the recorded version expired/rewritten out of the
    source history. ``src_path`` overrides the recorded source location
    (dataset moved); the definition itself never changes on refresh.

    Returns ``{"mode": "noop"|"incremental"|"full", "from_version",
    "to_version"}``."""
    dst_meta = metadata.read_sidecar(spark, dst_path)
    if dst_meta is None or not dst_meta.aggregate:
        raise ValueError(
            f"{dst_path} is not a continuous aggregate "
            "(create_aggregate records the definition in the sidecar)"
        )
    defn = dict(dst_meta.aggregate)
    src = src_path or defn["src"]
    group_by, aggs = defn["group_by"], defn["aggs"]
    src_meta = metadata.read_sidecar(spark, src)
    head = _src_head(src_meta, src)
    last = defn["last_src_version"]
    report = {"from_version": last, "to_version": head}
    if (
        head == last
        and "last_src_ts" in defn
        and defn["last_src_ts"] == _snapshot_ts(src_meta, head)
    ):
        # same version AND the same snapshot (restore + re-appends reuse
        # version numbers; a lookalike head must fall through to a full
        # recompute, not a noop)
        report["mode"] = "noop"
        return report

    src_versions = [
        s["version"] for s in src_meta.snapshots if not s.get("staged")
    ]
    # the baseline snapshot must be the SAME snapshot the definition saw,
    # not merely the same version number: restore_dataset + re-appends
    # reuse version numbers, and an incremental fold from a lookalike
    # baseline would silently keep rolled-back contributions. Definitions
    # stamped before the ts field existed have no way to prove identity
    # and take the reported full path once (which re-stamps them).
    baseline_intact = (
        "last_src_ts" in defn
        and defn["last_src_ts"] == _snapshot_ts(src_meta, last)
    )
    merged: Optional[DataFrame] = None
    if last in src_versions and head > last and baseline_intact:
        try:
            delta = fetch_changes(spark, src, last, head)
            partial = _aggregate(delta, group_by, aggs)
            current = fetch_path(spark, dst_path)
            merged = (
                current.unionByName(partial)
                .groupBy(*group_by)
                .agg(*_merge_exprs(aggs))
            )
            report["mode"] = "incremental"
        except ValueError:
            # a tombstone inside the range: the delta is not append-only
            merged = None
    if merged is None:
        # full recompute: history rewritten/expired past the recorded
        # version, source restored BELOW it, or a non-append delta
        merged = _aggregate(fetch_path(spark, src), group_by, aggs)
        report["mode"] = "full"
    # the merged plan READS dst, so it cannot overwrite dst in place:
    # write to a sibling temp dir and swap with two renames (the compact
    # pattern) — no driver-side materialization, the aggregate never has
    # to fit on the driver, and a failed refresh never corrupts dst
    from . import fs

    tmp = dst_path.rstrip("/") + ".refreshing"
    fs.delete(spark, tmp)
    publish_path(spark, tmp, merged, [], mode="overwrite")
    defn["last_src_version"] = head
    defn["last_src_ts"] = _snapshot_ts(src_meta, head)
    _attach_definition(spark, tmp, defn)
    old = dst_path.rstrip("/") + ".prerefresh"
    fs.delete(spark, old)
    if not fs.rename(spark, dst_path, old):
        raise IOError(f"refresh_aggregate: could not move {dst_path} aside")
    if not fs.rename(spark, tmp, dst_path):
        fs.rename(spark, old, dst_path)  # roll back
        raise IOError("refresh_aggregate: could not swap in the refresh")
    fs.delete(spark, old)
    return report
