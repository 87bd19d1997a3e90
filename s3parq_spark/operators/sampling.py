"""Deterministic corpus sampling.

The property that matters at 100 TB: the SAME rows are selected regardless
of cluster size, partitioning, or run count — ``df.sample`` is seeded per
partition split and reshuffles between runs, so it cannot produce
reproducible corpus subsets. Here membership is a pure function of the row
id: ``pmod(hash60(id), RESOLUTION) < fraction·RESOLUTION``. The hash is the
first 60 bits of md5 of the id string — portable, so any engine (and the
correctness oracle) selects the identical subset.
"""

from __future__ import annotations

from typing import Dict, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: sampling granularity: fractions resolve to 1/10000
RESOLUTION = 10_000


def _hash60(col: Column) -> Column:
    """First 60 bits of md5 of the stringified id — engine-portable."""
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("bigint")


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fractions: Union[float, Dict[str, float]],
    strata_col: str = "",
) -> DataFrame:
    """Reproducible sample: keep a row iff
    ``pmod(hash60(id), RESOLUTION) < fraction * RESOLUTION``.

    ``fractions`` is a single float, or a ``{stratum value: fraction}`` dict
    with ``strata_col`` naming the stratum column (stratified sampling —
    e.g. downweight a crawl source, upweight a rare language). Unlisted
    strata fall to fraction 0. A filter, not a shuffle: it pushes into the
    scan and composes with partition pruning.

    The threshold is ``round(fraction * RESOLUTION)`` — truncation would
    misplace ~6% of three-decimal fractions whose product lands a hair
    under the integer (0.57 * 10000 = 5699.999...), breaking agreement
    with any engine that rounds. Rows whose ``id_col`` is NULL hash to
    NULL and are DROPPED whatever the fraction (membership is a pure
    function of the id; a NULL id has none) — feed a non-null key or
    coalesce ids upstream if those rows must participate.
    """
    bucket = F.pmod(_hash60(F.col(id_col)), F.lit(RESOLUTION))
    if isinstance(fractions, dict):
        if not strata_col:
            raise ValueError("per-stratum fractions require strata_col")
        thr: Column = F.lit(0)
        for value, frac in fractions.items():
            thr = F.when(
                F.col(strata_col) == value,
                F.lit(int(round(frac * RESOLUTION))),
            ).otherwise(thr)
    else:
        thr = F.lit(int(round(float(fractions) * RESOLUTION)))
    return df.filter(bucket < thr)


def stratified_fixed_n(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    n_per_stratum: int,
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), deterministically: rows are ranked inside each stratum by
    ``(hash60(id), id)`` and the first N kept. Fraction-based sampling
    (``deterministic_sample``) cannot hit exact counts — eval sets,
    per-source quotas, and balanced probes need "N per bucket", not "p% of
    bucket".

    Membership is a pure function of the ids in the stratum, so the same
    rows are chosen on any cluster size/partitioning and by the SQL oracle.
    Plan shape: one hash exchange on the stratum + per-stratum
    WindowGroupLimit (map-side partial top-N before the shuffle) — never a
    global sort; skew bounded by N per stratum post-filter.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        _hash60(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def corpus_upsample(
    df: DataFrame,
    id_col: str,
    weights: Dict[str, float],
    strata_col: str,
    default_weight: float = 1.0,
) -> DataFrame:
    """Epoch-weighted corpus mixing: replicate each row ``weight`` times,
    where fractional weights are resolved deterministically per row — a
    weight of 2.25 yields 2 copies always plus a 3rd for the 25% of rows
    whose portable id-hash bucket falls under the fraction. This is the
    standard training-mix upweighting (rare high-quality sources repeated,
    bulk crawl downsampled) with exact reproducibility: the multiset of
    (id, copy_idx) is a pure function of the data.

    Rows in strata with resolved 0 copies are dropped (weight < 1 acts as
    deterministic downsampling). Output = input columns + ``copy_idx``
    (1-based int). A 1→N ``explode`` with no shuffle: composes with the
    scan and scales linearly at any corpus size. Rows with a NULL
    ``id_col`` hash to NULL and are dropped regardless of weight (same
    pure-function-of-id contract as ``deterministic_sample``).
    """
    bucket = F.pmod(_hash60(F.col(id_col)), F.lit(RESOLUTION))

    def resolve(w: float) -> Column:
        whole = int(w)
        frac_thr = int(round((w - whole) * RESOLUTION))
        return F.lit(whole) + (bucket < F.lit(frac_thr)).cast("int")

    n_copies: Column = resolve(default_weight)
    for value, w in weights.items():
        n_copies = F.when(F.col(strata_col) == value, resolve(w)).otherwise(
            n_copies
        )
    return (
        df.withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") >= 1)  # sequence(1,0) would descend
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1), F.col("__n_copies"))))
        .withColumn("copy_idx", F.col("copy_idx").cast("int"))
        .drop("__n_copies")
    )


def percentile_band_filter(
    df: DataFrame, value_col: str, lo: float, hi: float
) -> DataFrame:
    """Keep rows whose ``value_col`` lies inside the [lo, hi] band of the
    empirical distribution (cume_dist) — the standard outlier trim for
    corpus curation (drop the shortest 5% and longest 5% of documents).

    Scale design: a naive ``cume_dist() OVER (ORDER BY v)`` is a GLOBAL
    window — one task sorts the whole corpus. Instead the distribution is
    computed on the *distinct values* (groupBy(value).count(), a map-side
    partial), the cumulative fraction is a window over that tiny by-value
    table, and the per-value verdict broadcast-joins back to the rows. The
    full corpus is never sorted and never shuffled: one hash aggregate +
    one broadcast join.

    cume_dist semantics match SQL engines exactly (rows_with_value<=x /
    total, ties are peers), and the single division of identical integers
    is bit-identical across engines — oracle-portable.

    NULL values are excluded from the distribution AND the output (a NULL
    can never match the band join anyway; counting it in the distribution
    would shift every band boundary by the null mass, so a 5% trim on a
    40%-null column would silently cut 8% of the real population).
    """
    from pyspark.sql import Window

    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    dist = counts.withColumn(
        "__cd",
        F.sum("__c").over(w) / F.sum("__c").over(Window.partitionBy()),
    )
    keep = dist.filter((F.col("__cd") >= lo) & (F.col("__cd") <= hi)).select("__v")
    return df.join(
        F.broadcast(keep), on=df[value_col] == keep["__v"], how="inner"
    ).drop("__v")


def corpus_shuffle(
    df: DataFrame, id_col: str, n_shards: int = 32
) -> DataFrame:
    """Deterministic global shuffle for training order: every row gets a
    ``(shard, position)`` that is a pure function of its id — the same
    corpus always yields the same training order, on any cluster size or
    partition layout (``df.orderBy(rand())`` cannot promise either).

    shard = portable hash60(id) mod ``n_shards``; position = rank of
    (hash, id) within the shard. The per-shard window is a per-key sort,
    parallel across shards — raise ``n_shards`` with corpus size so no
    single sort dominates. Output: input columns + shard int +
    position bigint (0-based).
    """
    from pyspark.sql import Window

    h = _hash60(F.col(id_col))
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int"))
        .withColumn("position", F.row_number().over(w).cast("bigint") - 1)
        .drop("__h")
    )

def assign_splits(
    df: DataFrame,
    id_col: str,
    splits: Dict[str, float],
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` string
    column that is a pure function of the row id — the membership contract
    every training pipeline needs (a document must land in the same split
    on every run, any cluster size, any partition layout, and must NOT
    migrate between splits when the corpus grows).

    ``splits`` maps name -> fraction (must sum to <= 1.0; any remainder is
    labelled NULL so callers see unassigned mass instead of silently
    inflating the last split). Assignment: ``bucket = hash60(id) mod
    RESOLUTION`` falls into consecutive half-open ranges in the given
    order. A projection, not a shuffle — composes with partition pruning
    and costs nothing at 100 TB.
    """
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1.0")
    bucket = F.pmod(_hash60(F.col(id_col)), F.lit(RESOLUTION))
    expr = F.lit(None).cast("string")
    hi = 0
    bounds = []
    for name, frac in splits.items():
        lo, hi = hi, hi + int(round(frac * RESOLUTION))
        bounds.append((name, lo, hi))
    for name, lo, hi in reversed(bounds):
        expr = F.when((bucket >= lo) & (bucket < hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def token_budget_select(
    df: DataFrame,
    id_col: str,
    group_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
    ascending: bool = False,
) -> DataFrame:
    """Per-group token-budget selection: within each ``group_col`` value
    (source, language, domain), rank rows by ``order_col`` (quality score;
    best-first by default) and keep rows while the running sum of
    ``tokens_col`` stays within ``budget`` — the "take the best N tokens
    per source" step that turns quality scores into an actual training
    mix. A row that would cross the budget is excluded (strict prefix).

    Deterministic: ties on ``order_col`` break by id. One window per
    group — a per-key sort, parallel across groups, no global sort; at
    100 TB the group count (sources) bounds per-task state, not the corpus.
    Output: input rows kept, plus ``cum_tokens`` (the running total
    including the row itself).
    """
    from pyspark.sql import Window

    order = [
        F.col(order_col).asc() if ascending else F.col(order_col).desc(),
        F.col(id_col).asc(),
    ]
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("cum_tokens", F.sum(F.col(tokens_col).cast("bigint")).over(w))
        .filter(F.col("cum_tokens") <= budget)
    )


def dsir_importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_col: str,
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR-style importance weighting (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): score every
    RAW document by how much a hashed-n-gram bag model of the TARGET
    distribution prefers it over a model of the raw distribution,

        log w(d) = Σ_g  [ ln p̂_target(bucket(g)) − ln p̂_raw(bucket(g)) ]

    over ``d``'s word unigrams + bigrams hashed into ``n_buckets`` buckets
    (md5-derived, engine-portable), with add-one smoothing on both bag
    models. ``target_col`` is a boolean column marking the target docs
    (e.g. a trusted high-quality subset); the output ranks the remaining
    raw docs — highest ``logw`` = most target-like, the DSIR selection
    order (the paper resamples with Gumbel noise; deterministic top-rank
    is the reproducible variant).

    Exactness: bucket counts are exact integers; each bucket's
    log-likelihood ratio is ONE fixed float expression rounded to
    ``decimal(28,12)``, and the per-doc sum is a decimal sum —
    order-independent, so the result hash-matches a SQL oracle (the
    ``bm25_scores`` recipe).

    Scale shape: one n-gram explode feeding a single ``n_buckets``-bounded
    aggregate (map-side combine; output ≤ ``n_buckets`` rows no matter the
    corpus), totals as a 1-row broadcast, and the λ table broadcast back
    onto the raw-side n-gram stream — the corpus is scanned twice and
    shuffled only on the bucket key and the doc id. No vocabulary, no
    driver-side model state.
    """
    u = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n1 = F.greatest(F.size(u) - 1, F.lit(0))
    big = F.zip_with(
        F.slice(u, 1, n1),
        F.slice(u, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    ex = df.select(
        F.col(id_col).alias("__id"),
        F.col(target_col).alias("__t"),
        F.explode(F.concat(u, big)).alias("__g"),
    ).withColumn(
        "__b",
        F.conv(F.substring(F.md5(F.col("__g")), 1, 8), 16, 10).cast("bigint")
        % F.lit(n_buckets),
    )
    tbl = ex.groupBy("__b").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("tc"),
        F.sum(F.when(~F.col("__t"), 1).otherwise(0)).alias("rc"),
    )
    tot = tbl.agg(
        F.sum("tc").alias("__T"), F.sum("rc").alias("__R")
    )
    lam = tbl.crossJoin(F.broadcast(tot)).select(
        "__b",
        (
            F.log((F.col("tc") + F.lit(1.0)) / (F.col("__T") + F.lit(n_buckets)))
            - F.log((F.col("rc") + F.lit(1.0)) / (F.col("__R") + F.lit(n_buckets)))
        )
        .cast("decimal(28,12)")
        .alias("__lam"),
    )
    return (
        ex.filter(~F.col("__t"))
        .join(F.broadcast(lam), "__b")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum("__lam").cast("double").alias("logw"),
        )
        .select(F.col("__id").alias(id_col), "n_ngrams", "logw")
    )


def gumbel_topk_sample(
    df: DataFrame,
    id_col: str,
    score_col: str,
    n: int,
    temperature: float = 1.0,
) -> DataFrame:
    """Deterministic Gumbel top-k sampling — the resampling half of DSIR
    (sampling WITHOUT replacement proportional to ``exp(score/T)`` is
    exactly "add Gumbel noise to score/T and take the top k"; Gumbel-max
    trick, Vieira 2014). The noise is derandomized: each row's uniform is
    derived from the md5 hash of its id,

        u = (hash60(id) + 0.5) / 2^60,   g = −ln(−ln(u)),
        key = score/T + g,

    so the SAME rows are selected regardless of partitioning, cluster
    size, or rerun — reproducible corpus subsets (the [[deterministic
    sampling]] contract), while still being a faithful Gumbel draw across
    ids (md5 is uniform). ``temperature`` sharpens (→0: plain top-k by
    score) or flattens (→∞: uniform sampling) the draw.

    Output: the selected rows plus ``gumbel_key`` (ties break by id).
    Selection is TakeOrderedAndProject — per-partition top-k then a
    k-row merge, no global sort; the score column is the only input, no
    shuffle of payload columns before the limit.
    """
    if temperature <= 0:
        raise ValueError("gumbel_topk_sample: temperature must be > 0")
    u = (_hash60(F.col(id_col)) + F.lit(0.5)) / F.lit(float(1 << 60))
    g = -F.log(-F.log(u))
    key = F.col(score_col).cast("double") / F.lit(float(temperature)) + g
    return (
        df.withColumn("gumbel_key", key)
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(n)
    )
