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

from typing import Optional, Sequence

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


def skew_profile(df: DataFrame, keys: Sequence[str], k: int = 20) -> DataFrame:
    """Heavy-hitter profile: the ``k`` most frequent key combinations with
    their row counts and corpus share — the diagnostic that decides whether
    a join/aggregate on ``keys`` needs salting before it runs at 100 TB.

    Plan: one hash aggregate (map-side partials) counts the keys, the total
    comes from a 1-row broadcast (no driver collect), and the top-k compiles
    to TakeOrderedAndProject — per-partition heaps of size k, never a global
    sort. Ties at the cut are broken by key value so the result set is
    deterministic and oracle-checkable. ``share`` is a single bigint/bigint
    double division — bit-identical across engines.
    """
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            (F.col("n_rows") / F.col("__total")).alias("share"),
        )
        .orderBy(F.desc("n_rows"), *[F.asc(c) for c in keys])
        .limit(k)
    )


def correlation_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlation over INTEGER columns in ONE aggregate
    pass: for every pair (i < j), ``col_x, col_y, n_pairs, corr``.

    Exactness contract: all moment sums (Σx, Σx², Σxy) accumulate in
    DECIMAL(38,0) — order-independent integer arithmetic, so partial
    aggregation and shuffle order can't perturb the result — and the
    float math happens only at the very edge in a fixed sequence
    (cast → sqrt → multiply → divide, each IEEE correctly-rounded), making
    the doubles bit-identical across engines. Null handling is pairwise-
    complete: a row contributes to (x, y) only when both are non-null.
    Integer columns only — float inputs need a quantization contract first.

    One scan, one reduce of O(|cols|²) counters; nothing else moves.
    """
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    aggs = []
    for x, y in pairs:
        both = F.col(x).isNotNull() & F.col(y).isNotNull()
        # try_cast: overflow of the decimal(18,0) domain becomes NULL in
        # BOTH ANSI modes (a plain cast raises a cryptic error under ANSI
        # and corrupts silently under non-ANSI) — counted and refused with
        # remediation below
        dx = F.when(both, F.expr(f"try_cast({x} AS DECIMAL(18,0))"))
        dy = F.when(both, F.expr(f"try_cast({y} AS DECIMAL(18,0))"))
        p = f"{x}__{y}"
        aggs += [
            F.count(F.when(both, F.lit(1))).alias(f"__n_{p}"),
            F.try_sum(dx).cast("decimal(38,0)").alias(f"__sx_{p}"),
            F.try_sum(dy).cast("decimal(38,0)").alias(f"__sy_{p}"),
            F.try_sum(dx * dx).cast("decimal(38,0)").alias(f"__sxx_{p}"),
            F.try_sum(dy * dy).cast("decimal(38,0)").alias(f"__syy_{p}"),
            F.try_sum(dx * dy).cast("decimal(38,0)").alias(f"__sxy_{p}"),
            F.count(
                F.when(both & (dx.isNull() | dy.isNull()), F.lit(1))
            ).alias(f"__ov_{p}"),
        ]
    row = df.agg(*aggs)
    out = []
    for x, y in pairs:
        p = f"{x}__{y}"
        n38 = f"cast(__n_{p} as decimal(38,0))"
        num = (
            f"try_subtract(try_multiply({n38}, __sxy_{p}), "
            f"try_multiply(__sx_{p}, __sy_{p}))"
        )
        varx = (
            f"try_subtract(try_multiply({n38}, __sxx_{p}), "
            f"try_multiply(__sx_{p}, __sx_{p}))"
        )
        vary = (
            f"try_subtract(try_multiply({n38}, __syy_{p}), "
            f"try_multiply(__sy_{p}, __sy_{p}))"
        )
        # nullif: a zero-variance column yields NULL, not an ANSI /0 error
        corr = (
            f"CAST({num} AS DOUBLE) / "
            f"NULLIF(SQRT(CAST({varx} AS DOUBLE))"
            f" * SQRT(CAST({vary} AS DOUBLE)), CAST(0 AS DOUBLE))"
        )
        # silent-corruption paths refused at execution: an input value
        # outside decimal(18,0), or any moment sum / combination
        # overflowing decimal(38,0) (all computed with try_* so they
        # surface as NULL instead of an ANSI exception or a wrapped value)
        moments_null = (
            F.col(f"__sx_{p}").isNull()
            | F.col(f"__sy_{p}").isNull()
            | F.col(f"__sxx_{p}").isNull()
            | F.col(f"__syy_{p}").isNull()
            | F.col(f"__sxy_{p}").isNull()
            | F.expr(num).isNull()
            | F.expr(varx).isNull()
            | F.expr(vary).isNull()
        )
        overflow = (F.col(f"__ov_{p}") > 0) | (
            (F.col(f"__n_{p}") > 0) & moments_null
        )
        guarded = F.when(
            overflow,
            F.expr(
                "raise_error('correlation_matrix: values exceed the "
                "decimal(18,0) exact-arithmetic domain (|v| < 1e18 and "
                "moment products within decimal(38,0)); rescale or bucket "
                f"the column first: {p}')"
            ).cast("double"),
        ).otherwise(F.expr(corr))
        out.append(
            F.struct(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                F.col(f"__n_{p}").alias("n_pairs"),
                guarded.alias("corr"),
            )
        )
    return row.select(F.explode(F.array(*out)).alias("p")).select("p.*")


def validate_expectations(df: DataFrame, rules) -> DataFrame:
    """Data-quality gate: evaluate declarative expectations in ONE
    aggregate pass; output one row per rule: ``rule, n_rows, n_violations``
    (publish gates on ``n_violations == 0``; reports feed monitoring).

    Rules (dicts):
    - ``{"rule": name, "type": "not_null", "col": c}``
    - ``{"rule": name, "type": "unique", "col": c}`` — duplicates among
      non-null values (``count(col) - count_distinct(col)``)
    - ``{"rule": name, "type": "range", "col": c, "min": x, "max": y}``
    - ``{"rule": name, "type": "in_set", "col": c, "values": [...]}``
    - ``{"rule": name, "type": "regex", "col": c, "pattern": p}``

    Every check compiles to a conditional count inside one hash aggregate
    over one scan (``unique`` rides the same aggregate through Spark's
    distinct-count Expand) — adding a rule adds a counter, never a pass.
    """
    # rules is iterated twice (aggregate build + output build): a generator
    # argument would be exhausted after the first pass and the gate would
    # return ZERO rows — vacuously passing every downstream check
    rules = list(rules)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, r in enumerate(rules):
        c, t = F.col(r["col"]), r["type"]
        if t == "not_null":
            bad = F.count(F.when(c.isNull(), F.lit(1)))
        elif t == "unique":
            bad = F.count(c) - F.count_distinct(c)
        elif t == "range":
            bad = F.count(
                F.when(
                    c.isNotNull()
                    & ((c < F.lit(r["min"])) | (c > F.lit(r["max"]))),
                    F.lit(1),
                )
            )
        elif t == "in_set":
            bad = F.count(
                F.when(c.isNotNull() & ~c.isin(*r["values"]), F.lit(1))
            )
        elif t == "regex":
            bad = F.count(
                F.when(c.isNotNull() & ~c.rlike(r["pattern"]), F.lit(1))
            )
        else:
            raise ValueError(f"unknown expectation type {t!r}")
        aggs.append(bad.alias(f"__v{i}"))
    row = df.agg(*aggs)
    out = F.array(
        *[
            F.struct(
                F.lit(r["rule"]).alias("rule"),
                F.col("__rows").alias("n_rows"),
                F.col(f"__v{i}").alias("n_violations"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return row.select(F.explode(out).alias("p")).select("p.*")


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
            # bin arithmetic in decimal(38,0): (v - lo) * nbins stays exact
            # for the FULL bigint range, where bigint math would wrap
            # negative for ranges past 2^63/nbins (identical values — and
            # oracle hashes — for all in-range data)
            F.expr(
                f"least(cast({nbins} - 1 as bigint), cast("
                f"((cast(__v as decimal(38,0)) - __lo) * {nbins}) div "
                f"(cast(__hi as decimal(38,0)) - __lo + 1) as bigint))"
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


def dataset_card(
    df: DataFrame,
    group_col: str,
    text_col: str,
    lang_col: Optional[str] = None,
) -> DataFrame:
    """Per-source dataset-card summary — the "Datasheets for Datasets"
    composition table produced before a corpus ships: document and token
    counts, token-length extremes and mean, language spread and the
    dominant language, and each source's share of the corpus.

    Output, one row per ``group_col`` value: ``(source, n_docs, n_tokens,
    min_tokens, max_tokens, mean_tokens, n_langs, top_lang,
    top_lang_docs, docs_share)``. ``mean_tokens`` and ``docs_share`` are
    the only float ops; ties for the dominant language break
    lexicographically (deterministic).

    Scale shape: one keyed aggregate per granularity — (group) for the
    counts, (group, lang) for the language table reduced by a per-group
    window over ≤ |langs| rows — and the corpus total joins back as a
    1-row broadcast. Group count bounds every post-aggregate frame.

    Empty / whitespace-only / NULL text counts 0 tokens (a bare
    ``split('')`` yields ``['']`` = 1, which would inflate the datasheet
    for exactly the degenerate docs it should surface), and a NULL group
    value keeps its row in the card (null-safe join) — a card whose
    shares don't sum to 1 is wrong by construction.
    """
    txt = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    nt = (
        F.when(F.length(txt) == 0, F.lit(0))
        .otherwise(F.size(F.split(txt, r"\s+")))
        .cast("bigint")
    )
    base = df.select(
        F.col(group_col).alias("__g"),
        nt.alias("__nt"),
        (F.col(lang_col) if lang_col else F.lit("und")).alias("__lang"),
    )
    per = base.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").alias("n_tokens"),
        F.min("__nt").alias("min_tokens"),
        F.max("__nt").alias("max_tokens"),
    )
    from pyspark.sql.window import Window

    lang_counts = base.groupBy("__g", "__lang").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.partitionBy("__g").orderBy(F.desc("__c"), F.asc("__lang"))
    langs = (
        lang_counts.withColumn("__rk", F.row_number().over(w))
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("n_langs"),
            F.max(F.when(F.col("__rk") == 1, F.col("__lang"))).alias(
                "top_lang"
            ),
            F.max(F.when(F.col("__rk") == 1, F.col("__c"))).alias(
                "top_lang_docs"
            ),
        )
    )
    total = per.agg(F.sum("n_docs").alias("__total"))
    langs = langs.withColumnRenamed("__g", "__gl")
    return (
        per.join(langs, per["__g"].eqNullSafe(langs["__gl"]))
        .drop("__gl")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("__g").alias(group_col),
            "n_docs",
            "n_tokens",
            "min_tokens",
            "max_tokens",
            (F.col("n_tokens").cast("double") / F.col("n_docs")).alias(
                "mean_tokens"
            ),
            "n_langs",
            "top_lang",
            "top_lang_docs",
            (F.col("n_docs").cast("double") / F.col("__total")).alias(
                "docs_share"
            ),
        )
    )


def clip_outliers(
    df: DataFrame,
    cols: Sequence[str],
    lower: float = 0.01,
    upper: float = 0.99,
    mode: str = "clip",
) -> DataFrame:
    """Percentile winsorization — the numeric-cleaning step before
    training-statistics or feature normalization: per column, the exact
    ``lower``/``upper`` percentiles (percentile_cont interpolation) become
    bounds, and each value is clamped to them (``mode='clip'``) or rows
    outside any bound are dropped (``mode='drop'``).

    NULLs are not outliers: in ``clip`` mode they pass through unchanged
    (Spark's ``least``/``greatest`` skip NULLs, which would silently
    rewrite a NULL to the upper bound), and in ``drop`` mode NULL rows
    are kept — missingness is a separate concern from magnitude.

    One global aggregate computes every column's two bounds in a single
    pass (exact percentile — at 100 TB swap for approx_percentile with an
    accuracy knob; the plan shape is identical), broadcast back as a
    1-row frame; the clamp itself is a pure projection. Deterministic and
    engine-replayable (percentile_cont semantics match across engines).
    """
    if mode not in ("clip", "drop"):
        raise ValueError(f"clip_outliers: unknown mode {mode!r}")
    aggs = []
    for c in cols:
        aggs.append(F.percentile(c, lower).alias(f"__lo_{c}"))
        aggs.append(F.percentile(c, upper).alias(f"__hi_{c}"))
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    if mode == "drop":
        pred = F.lit(True)
        for c in cols:
            pred = pred & (
                F.col(c).isNull()
                | F.col(c).between(F.col(f"__lo_{c}"), F.col(f"__hi_{c}"))
            )
        out = out.filter(pred)
    else:
        for c in cols:
            out = out.withColumn(
                c,
                F.when(F.col(c).isNull(), F.col(c)).otherwise(
                    F.greatest(
                        F.col(f"__lo_{c}"),
                        F.least(F.col(f"__hi_{c}"), F.col(c)),
                    )
                ),
            )
    return out.drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])


def normalize_by_group(
    df: DataFrame,
    group_col: str,
    cols: Sequence[str],
    suffix: str = "_z",
) -> DataFrame:
    """Group-wise z-score normalization: for each column in ``cols``,
    append ``col + suffix`` = (x − μ_g) / σ_g with mean and SAMPLE
    standard deviation computed per ``group_col`` value — the per-source
    feature scaling that keeps one source's scale from dominating a
    mixed-corpus statistic. Constant columns (σ = 0) and single-row
    groups (σ undefined) normalize to 0.0 rather than NULL/∞.

    One keyed aggregate produces every column's (μ, σ) per group; the
    group-stats frame is broadcast back (bounded by |groups|) and the
    normalization is a pure projection — the corpus itself is never
    reshuffled.
    """
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"__mu_{c}"))
        aggs.append(F.stddev_samp(c).alias(f"__sd_{c}"))
    stats = df.groupBy(group_col).agg(*aggs).withColumnRenamed(
        group_col, "__nbg_g"
    )
    # null-safe join: a NULL group is a real group (groupBy keeps it);
    # a plain equi-join would silently drop its rows
    out = df.join(
        F.broadcast(stats),
        F.col(group_col).eqNullSafe(F.col("__nbg_g")),
    ).drop("__nbg_g")
    for c in cols:
        sd = F.col(f"__sd_{c}")
        out = out.withColumn(
            c + suffix,
            F.when(
                sd.isNull() | (sd == 0), F.lit(0.0)
            ).otherwise((F.col(c) - F.col(f"__mu_{c}")) / sd),
        )
    return out.drop(
        *[f"__mu_{c}" for c in cols], *[f"__sd_{c}" for c in cols]
    )
