"""Time-series operators over event streams: rolling time-range windows,
changelog compaction (latest state per key), and funnel conversion.

These extend the engine's query surface (SURVEY §7.4) for the event-log
side of a training-data platform: per-entity rolling features for model
inputs, upsert-view compaction of append-only logs, and conversion funnels.

100 TB design notes:

- ``rolling_window_agg`` shuffles once on the entity key and sorts within
  the partition — the canonical single-exchange window plan. Frame sums use
  exact DECIMAL (order-independent), never double folds.
- ``latest_state`` is ONE aggregate with a map-side partial: the winner
  row rides through ``max(struct(ts, tiebreak, payload...))`` so there is no
  join-back and no window sort. This is the same aggregate-winner pattern as
  ``dedup.dedup_keep_best`` and compacts a billion-row changelog with a
  single shuffle of pre-combined partials.
- ``funnel_next_within`` is one window over (key, time) — no self-join, no
  cross product; the "next matching event" is a min over the following
  frame, which Spark evaluates in a single reverse sweep per partition.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .joins import _duration_us


def rolling_window_agg(
    df: DataFrame,
    key: str,
    ts_col: str,
    window: str,
    sum_col: Optional[str] = None,
    sum_scale: int = 2,
) -> DataFrame:
    """Per-row rolling aggregates over a trailing time window (e.g. "each
    event's count/sum of the same user's events in the preceding hour").

    The frame is a RANGE frame on epoch seconds — all events whose timestamp
    lies in ``(t - window, t]`` — so ties (equal timestamps) are peers and
    the result is order-independent. The sum is computed in DECIMAL and
    surfaced as DOUBLE (exact, associative; see workload.py design notes).

    One shuffle on ``key``; within-partition sort by time. At 100 TB the
    state per task is bounded by the densest single entity, not the corpus.
    """
    win_s = _duration_us(window) // 1_000_000
    out = df.withColumn("__epoch", F.unix_timestamp(F.col(ts_col)))
    w = (
        Window.partitionBy(key)
        .orderBy("__epoch")
        .rangeBetween(-(win_s - 1), Window.currentRow)
    )
    out = out.withColumn("__n_window", F.count(F.lit(1)).over(w))
    if sum_col is not None:
        out = out.withColumn(
            "__sum_window",
            F.sum(F.col(sum_col).cast(f"decimal(18,{sum_scale})"))
            .over(w)
            .cast("double"),
        )
    return out.drop("__epoch")


def latest_state(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: str,
    payload: Sequence[str],
) -> DataFrame:
    """Changelog compaction: the most recent row per key — the "upsert view"
    of an append-only event log (the materialization a CDC/merge sink would
    produce).

    Winner = max over (ts, tiebreak); ``tiebreak`` must make the ordering
    total (a unique id). Implemented as ONE aggregate carrying the
    payload through ``max(struct(...))`` — map-side partials combine, so a
    key appearing in millions of rows still ships one candidate per map
    task. No window, no sort, no join-back.

    Output columns: ``keys + [ts_col, tiebreak] + payload``.
    """
    fields = [F.col(ts_col), F.col(tiebreak)] + [F.col(c) for c in payload]
    agg = df.groupBy(*keys).agg(F.max(F.struct(*fields)).alias("__w"))
    sel: List[Column] = [F.col(k) for k in keys]
    sel.append(F.col(f"__w.{ts_col}").alias(ts_col))
    sel.append(F.col(f"__w.{tiebreak}").alias(tiebreak))
    sel += [F.col(f"__w.{c}").alias(c) for c in payload]
    return agg.select(*sel)


def resample_counts(
    df: DataFrame, key: str, ts_col: str, unit: str = "hour"
) -> DataFrame:
    """Regularize an event series: per-``key`` event counts on a DENSE
    ``unit`` grid spanning [first, last] activity of that key — missing
    buckets become explicit zeros. Model features and anomaly detectors
    need the gaps, not just the hits.

    Plan: one hash aggregate buckets the events; per-key bounds come from a
    second tiny aggregate over the buckets; ``sequence(lo, hi, interval)``
    explodes each key's dense grid (bounded: keys × buckets, linear in
    output) and a left join pulls the observed counts back in. Both the
    bucket aggregate and the join hash-partition on the key columns, so the
    grid never shuffles the raw events a second time. No window sorts.

    Output: ``key, bucket (timestamp), n_events`` (0 where silent).
    """
    per = (
        df.select(F.col(key), F.date_trunc(unit, F.col(ts_col)).alias("__b"))
        .groupBy(key, "__b")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    bounds = per.groupBy(key).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = bounds.select(
        key,
        F.explode(
            F.expr(f"sequence(__lo, __hi, interval 1 {unit})")
        ).alias("__b"),
    )
    return (
        grid.join(per, [key, "__b"], "left")
        .select(
            key,
            F.col("__b").alias("bucket"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


def cohort_retention(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Weekly cohort retention: users grouped by first-active week, counted
    in each subsequent week they return — the standard engagement matrix
    ``(cohort_week, week_offset) -> n_users``.

    Plan: one hash aggregate assigns each user's cohort (min week — map-side
    partials), the event log joins back on the user key, and a second
    aggregate counts distinct users per (cohort, offset). Both the cohort
    aggregate and the join hash-partition on ``user_col``, so Catalyst
    plans ONE exchange of each input; the final distinct-count is Spark's
    two-phase Expand aggregate. No windows, no sorts, no driver state —
    every stage is a partial-aggregating shuffle that scales to a year of
    events.

    Week arithmetic is integer-exact and engine-portable: ISO Monday
    ``date_trunc('week')`` and ``datediff // 7``.
    """
    weeks = df.select(
        F.col(user_col).alias("__u"),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("__w"),
    )
    cohort = weeks.groupBy("__u").agg(F.min("__w").alias("cohort_week"))
    return (
        weeks.join(cohort, "__u")
        .select(
            "__u",
            "cohort_week",
            F.expr("datediff(__w, cohort_week) div 7").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col("__u")).alias("n_users"))
    )


def funnel_next_within(
    df: DataFrame,
    key: str,
    ts_col: str,
    step_col: str,
    from_step: str,
    to_step: str,
    horizon: str,
    order_tiebreak: str,
) -> DataFrame:
    """Funnel step: for every ``from_step`` event, whether the same entity
    performed a ``to_step`` event within ``horizon`` afterwards.

    Single-pass plan: one window over (key, time) computes, at each row, the
    minimum ``to_step`` timestamp among strictly-later events (min over the
    1-FOLLOWING → UNBOUNDED frame of a conditional column). No self-join —
    the classic funnel-as-join is quadratic per entity; this is linear after
    one sort. Returns the ``from_step`` rows with:

    - ``next_{to_step}_ts`` — timestamp of the next later ``to_step`` event
    - ``converted`` — whether it happened within ``horizon``
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col), F.col(order_tiebreak))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    to_ts = F.when(F.col(step_col) == to_step, F.col(ts_col))
    next_col = f"next_{to_step}_ts"
    horizon_us = _duration_us(horizon)
    return (
        df.withColumn(next_col, F.min(to_ts).over(w))
        .filter(F.col(step_col) == from_step)
        .withColumn(
            "converted",
            F.col(next_col).isNotNull()
            & (
                F.col(next_col)
                <= F.timestamp_micros(
                    F.unix_micros(F.col(ts_col)) + F.lit(horizon_us)
                )
            ),
        )
    )


def funnel_stages(
    df: DataFrame,
    key: str,
    ts_col: str,
    step_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Multi-stage ordered funnel: how many entities performed stage 1,
    then stage 2 STRICTLY after their first qualifying stage 1, then stage
    3 strictly after that, ... (the Amplitude/GA conversion-funnel shape;
    ``funnel_next_within`` answers the 2-step/horizon variant).

    Single-exchange plan: one shuffle on ``key`` + one sort on ``ts``,
    then a chain of running-min window phases over the SAME window spec
    (Spark stacks them on one Sort — no re-shuffle): ``m_i`` = earliest
    timestamp of a ``stages[i]`` event preceded by a qualifying
    ``m_{i-1}``. The strict ``<`` on timestamps makes the result
    independent of tie order among equal timestamps, so no tiebreak
    column is needed and a SQL oracle can mirror the windows verbatim.
    A per-key aggregate then one global fold (both map-side-combined)
    produce one row per stage: ``(stage_idx, stage, users)``.

    Reference analog: none (extension per SURVEY §7.4).
    """
    if not stages:
        raise ValueError("funnel_stages needs at least one stage")
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(key, ts_col, step_col)
    for i, stage in enumerate(stages):
        cond = F.col(step_col) == stage
        if i > 0:
            cond = cond & (F.col(f"__m{i - 1}") < F.col(ts_col))
        out = out.withColumn(
            f"__m{i}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
    per_key = out.groupBy(key).agg(
        *[
            F.max(F.col(f"__m{i}").isNotNull()).alias(f"__r{i}")
            for i in range(len(stages))
        ]
    )
    totals = per_key.agg(
        *[
            F.sum(F.col(f"__r{i}").cast("bigint")).alias(f"__n{i}")
            for i in range(len(stages))
        ]
    )
    melted = totals.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("stage_idx"),
                        F.lit(s).alias("stage"),
                        F.coalesce(F.col(f"__n{i}"), F.lit(0)).alias("users"),
                    )
                    for i, s in enumerate(stages)
                ]
            )
        ).alias("__f")
    )
    return melted.select("__f.stage_idx", "__f.stage", "__f.users")
