"""Dataset profiling: per-column quality statistics in one pass.

A data-quality profile (null counts, cardinality, value bounds) is the
first job any pipeline runs on a new 100 TB drop — it decides partition
keys, skew handling, and dedup strategy before the expensive work starts.

Design: ONE aggregate over the scan computes every column's stats
simultaneously (null count, distinct count, min, max), then the single
result row is exploded into the long (column_name, stats...) shape —
driver-side work is O(columns), data-side work is one pass. Exact
``count(distinct)`` compiles to Spark's Expand (one shuffle with an
n-columns multiplier); pass ``approx=True`` to swap in HLL++
``approx_count_distinct`` and keep the plan a plain partial-aggregate —
the right choice at 100 TB when exactness isn't required (the oracle gate
uses exact).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], approx: bool = False
) -> DataFrame:
    """Profile ``cols`` → one row per column: ``column_name, n_rows,
    n_nulls, n_distinct, min_value, max_value`` (bounds cast to string so
    mixed column types share one output schema; restrict to int/string
    columns when hash-exact portability matters — float/timestamp string
    renderings differ across engines)."""
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"__nn_{c}"),
            distinct(c).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__rows").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def numeric_histogram(df: DataFrame, col: str, nbins: int = 20) -> DataFrame:
    """Equi-width histogram of an integral column: ``bin_id, n_rows,
    bin_min, bin_max`` for ``nbins`` buckets spanning [min, max].

    The bounds come from one scalar aggregate broadcast back over the scan
    (a 1-row BroadcastNestedLoopJoin — no driver collect, the histogram
    stays a lazily-composable DataFrame), and the bucket formula is pure
    integer arithmetic::

        bin_id = least(nbins - 1, (v - lo) * nbins div (hi - lo + 1))

    so results are bit-identical across engines (no float edges) and the
    whole plan is two hash aggregates over one scan — at 100 TB the second
    pass groups into at most ``nbins`` cells, all map-side combined.
    Restrict to integer columns; float binning needs an epsilon contract.
    """
    bounds = df.agg(
        F.min(F.col(col)).alias("__lo"), F.max(F.col(col)).alias("__hi")
    )
    return (
        df.select(F.col(col).alias("__v"))
        .filter(F.col("__v").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            F.expr(
                f"least(cast({nbins} - 1 as bigint), "
                f"((__v - __lo) * {nbins}) div (__hi - __lo + 1))"
            ).alias("bin_id"),
            "__v",
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__v").alias("bin_min"),
            F.max("__v").alias("bin_max"),
        )
    )
