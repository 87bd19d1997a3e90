"""Temporal and skew-aware join operators.

``asof_join`` is the standard distributed as-of (point-in-time) join: ONE
shuffle-sort on ``(key, ts)`` and a carry-forward window — no range
explosion, no per-key driver loops, state O(1) per row. This is the shape
that survives 100 TB: cost is the sort, which Spark does externally with
spills.

``salted_join`` is the classic hot-key mitigation for equi-joins: the big
side gets a deterministic salt in [0, k), the small side is exploded k×, and
the join key becomes (key, salt) — a hot key's rows spread over k tasks.
AQE's skew-join splitting handles moderate skew automatically; salting is
for the pathological case where one key dominates a whole stage.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_UNIT_US = {
    "second": 1_000_000, "seconds": 1_000_000,
    "minute": 60_000_000, "minutes": 60_000_000,
    "hour": 3_600_000_000, "hours": 3_600_000_000,
    "day": 86_400_000_000, "days": 86_400_000_000,
}


def _duration_us(s: str) -> int:
    num, unit = s.split()
    return int(num) * _UNIT_US[unit]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: List[str],
    left_ts: str,
    right_ts: str,
    tolerance: Optional[str] = None,
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right_ts <= left_ts`` for the same ``on`` keys (backward as-of, the
    pandas ``merge_asof`` / DuckDB ``ASOF LEFT JOIN`` semantics).

    Implementation: tag both inputs, union them with aligned schemas, sort
    per key by ``(ts, side)`` (right rows sort before left rows at equal
    timestamps, making the match inclusive), and carry the latest right
    row forward AS ONE STRUCT with ``last(..., ignorenulls=True)`` — the
    matched row travels wholesale, so a NULL inside its payload stays
    NULL instead of being backfilled from an OLDER right row (per-column
    carry would stitch columns from different rows into one that never
    existed). Right rows with a NULL timestamp are dropped (no position
    in as-of order — ``merge_asof``/ASOF semantics); left rows with a
    NULL timestamp emit with no match. ``tolerance`` (e.g. ``"30
    minutes"``) nulls out matches older than ``left_ts - tolerance`` —
    the whole struct at once, payload and ``right_ts`` together.
    """
    from pyspark.sql import types as T

    lcols = [c for c in left.columns if c not in on and c != left_ts]
    rcols = [c for c in right.columns if c not in on and c != right_ts]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"ambiguous payload columns, rename first: {sorted(overlap)}")

    r_struct_type = T.StructType(
        [T.StructField("__rts", right.schema[right_ts].dataType, True)]
        + [T.StructField(c, right.schema[c].dataType, True) for c in rcols]
    )
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in rcols]
        ).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        W.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        *on,
        "__ts",
        "__side",
        *[F.col(c) for c in lcols],
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        expired = F.col("__r.__rts") < F.col("__ts") - F.expr(
            f"INTERVAL {tolerance}"
        )
        out = out.withColumn(
            "__r",
            F.when(expired, F.lit(None).cast(r_struct_type)).otherwise(
                F.col("__r")
            ),
        )
    return out.select(
        *on,
        F.col("__ts").alias(left_ts),
        *lcols,
        F.col("__r.__rts").alias(right_ts),
        *[F.col(f"__r.{c}").alias(c) for c in rcols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: List[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
) -> DataFrame:
    """Big-big range join: left rows matched to right rows of the same keys
    with ``right_ts`` in ``[left_ts - lower, left_ts + upper]``.

    A plain theta-join here is a per-key cartesian (Spark plans
    BroadcastNestedLoop or a shuffled cartesian — both collapse at scale
    when NEITHER side is dim-sized). Instead both sides are bucketized to a
    coarse time grid of width ``lower+upper``: each left row is exploded
    into the exactly two buckets its window can touch, the right row lands
    in one, the join becomes an equi-join on ``(keys…, bucket)`` — one hash
    shuffle, AQE-skew-splittable — and the exact interval predicate remains
    as the residual filter. Each qualifying pair meets in exactly the
    bucket of the right row, so no dedup pass is needed.
    """
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        # same informative guard as asof_join: an ambiguous reference
        # would otherwise surface as a cryptic AnalysisException (or two
        # identically-named output columns)
        raise ValueError(f"ambiguous columns, rename first: {sorted(overlap)}")
    lower_us = _duration_us(lower)
    upper_us = _duration_us(upper)
    width_us = max(1, lower_us + upper_us)

    l_exploded = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"(unix_micros({left_ts}) - {lower_us}) div {width_us}"),
                F.expr(f"(unix_micros({left_ts}) + {upper_us}) div {width_us}"),
            )
        ),
    )
    r_bucketed = right.withColumn(
        "__bucket", F.expr(f"unix_micros({right_ts}) div {width_us}")
    )
    out = l_exploded.join(r_bucketed, on=[*on, "__bucket"], how="inner").filter(
        (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return out.drop("__bucket")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: List[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join with the left (big, possibly skewed) side salted per-row
    and the right side exploded ``salt_buckets``×. Semantically identical
    to ``left.join(right, on, how)`` for inner/left joins on equi-keys.

    Retry caveat (SPARK-23207 class): the salt includes
    ``monotonically_increasing_id()``, a nondeterministic expression, so if
    the left plan sits downstream of a shuffle and an executor is lost
    mid-stage, a re-computed map task can assign rows different salts than
    its first attempt — a reducer mixing old and new map outputs could then
    see a row twice or not at all. The salt never changes what a row JOINS
    TO (every salt value meets a full copy of the right side), only which
    reducer processes it, so any full-stage or full-job retry yields the
    correct result; the exposure is limited to partial-stage recovery.
    Deterministic alternatives all reintroduce the pathology this function
    exists to fix: hashing row content piles byte-identical duplicates of a
    hot key into one task (and crashes on map-typed columns), and a
    deterministic per-row ordinal needs a row_number window — a full extra
    sort-shuffle. Callers for whom partial-retry exactness matters more
    than skew should checkpoint/persist the left input first (pinning its
    row-to-partition assignment) or use AQE skew-join instead."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left equi-joins")
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        raise ValueError(f"ambiguous columns, rename first: {sorted(overlap)}")
    # salt routes rows, it never affects the result (the right side is
    # exploded across every salt value), so it can be per-ROW rather than
    # per-content: monotonically_increasing_id spreads even byte-identical
    # duplicate rows of a hot key across buckets — hashing the row content
    # would pile those duplicates into ONE task, the exact pathology this
    # function exists for (and crashes on map-typed columns besides)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in on], F.monotonically_increasing_id()),
        F.lit(salt_buckets),
    )
    l_salted = left.withColumn("__salt", salt.cast("int"))
    r_exploded = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = l_salted.join(r_exploded, on=[*on, "__salt"], how=how)
    return out.drop("__salt")
