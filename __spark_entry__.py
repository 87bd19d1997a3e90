"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps every
implemented SURVEY §2 operator (plus the large-scale pipeline extensions) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the DuckDB
equivalent for the hash-match correctness gate. Implementations live in
``s3parq_spark.workload``.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from s3parq_spark.workload import ORACLE_SQL, QUERIES  # noqa: E402


def _pin_session_confs(spark: SparkSession) -> None:
    """The driver owns the SparkSession; results must not depend on its
    config. UTC makes timestamp collection timezone-independent (matching
    the naive-timestamp DuckDB oracle); nanosAsLong lets the events table's
    TIMESTAMP(NANOS) column load; MILLIS output is reference write parity."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _pin_session_confs(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _pin_session_confs(spark)
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Driver-row rotation (automatic).
#
# The driver records only the first 50 entries of queries() into
# CORRECTNESS_r{N}.json, so registration order IS verification coverage.
# Rather than hand-maintaining a frozenset of already-verified queries (which
# went stale twice across rounds 4-5), the verified set is computed from the
# CORRECTNESS_r*.json files that live next to this file: a query is
# "verified" iff some recorded round has err==null and hash_match==true for
# it, and its recency is the latest such round. Ordering:
#   1. the two sentinel parity queries (always re-rowed — canary for
#      environment drift),
#   2. queries listed in _NEW_THIS_ROUND (added or semantically changed this
#      round — they must get a row in their first round),
#   3. queries with no green row in any recorded round (the backlog),
#   4. everything else, least-recently-verified first (the 50-row window
#      becomes a rolling regression net once the backlog is empty).
# ---------------------------------------------------------------------------

_SENTINELS = ("fetch_filter_eq", "pricing_summary")

# Queries added or semantically changed this round, promoted right after the
# sentinels so they get a CORRECTNESS row in their first round instead of
# waiting out the rotation. Keep this list short (the r5 verdict's budget
# arithmetic: sentinels + new + backlog must stay <= 50).
#
# ROUND-7 HANDOFF: reset this tuple at the start of the round (stale
# entries only waste window slots on re-rows); after r06's rows land, the
# never-rowed backlog should be EMPTY — every registered query will have a
# green row in some round — and the window becomes a pure regression net:
# sentinels + new/changed + least-recently-verified, all computed
# automatically from the CORRECTNESS files by _driver_order below.
_NEW_THIS_ROUND: tuple[str, ...] = (
    # Round 15 additions (reset at round start per the r14 verdict #2;
    # keep <= 4 so the 50-row window drains the r10/r11-era tail):
    "text_crash_repair_search",  # new: the text family's cap-crossing
                                 # crash window end-to-end — the
                                 # manufactured copy-without-tombstone
                                 # state REFUSES (TextIndexEpochError),
                                 # maintain surfaces and suspends, the
                                 # policy loop repairs on opt-in;
                                 # search == capped-BM25 full-scan SQL
    "partition_stats_spilled",   # new: the spilled partition-stats
                                 # record end-to-end — pointer present,
                                 # incremental fold through it, the
                                 # compaction carry re-homes it; stored
                                 # record + fetch == full-scan SQL
)


def _green_rounds() -> dict[str, int]:
    """Latest round with a green (hash-matched) driver row, per query,
    parsed from the CORRECTNESS_r*.json files the driver writes next to
    this module. Malformed or missing files are skipped: a query whose
    history can't be read is simply treated as never-verified and re-rowed,
    which is the safe direction."""
    latest: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("err") is None
                and row.get("hash_match") is True
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _driver_order(names: list[str]) -> list[str]:
    green = _green_rounds()
    head = [*_SENTINELS, *(n for n in _NEW_THIS_ROUND if n in names)]
    backlog = [n for n in names if n not in green and n not in head]
    rest = sorted(
        (n for n in names if n in green and n not in head),
        key=lambda n: (green[n], n),
    )
    return [*head, *backlog, *rest]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(QUERIES[name]) for name in _driver_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
