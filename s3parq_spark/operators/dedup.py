"""Deduplication operators for document corpora at 100 TB scale.

All stages are linear scans + key-partitioned shuffles — no driver-side state,
no O(n²) step: candidate generation always goes through an equi-join on a
bucket key (exact hash, LSH band, or shared shingle), so Spark shuffles on
that key and each bucket is processed independently across executors. Skewed
buckets (stop-shingle pathologies) are handled by AQE skew-join splitting.

Everything is deterministic: hashes are Spark's ``xxhash64`` (fixed seed),
so results are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import weakref
from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _unpersist_with(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Tie the lifetime of ``cached`` (persisted intermediates) to ``result``:
    when the returned DataFrame is garbage-collected, the intermediates are
    unpersisted — no cached partitions accumulate across repeated operator
    calls in a long-lived session. (At 100 TB you would materialize the
    intermediate to durable storage instead of executor cache; the lifecycle
    contract here is the same either way.)"""
    def _safe_unpersist(df: DataFrame) -> None:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped

    for c in cached:
        f = weakref.finalize(result, _safe_unpersist, c)
        f.atexit = False  # interpreter exit tears the cache down anyway
    return result


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame,
    keys: List[str],
    id_col: Optional[str] = None,
) -> DataFrame:
    """Exact deduplication on ``keys``.

    With ``id_col``, keeps the FULL row with the MINIMUM id per key group
    (deterministic winner — ``dropDuplicates`` keeps an arbitrary row, which
    is not reproducible across runs) and adds ``n_copies``. One shuffle on
    ``keys``: both window functions share the partitioning, so the group
    count and the winner rank ride the same exchange.
    """
    if id_col is None:
        return df.dropDuplicates(keys)
    from pyspark.sql import Window

    w = Window.partitionBy(*keys)
    return (
        df.withColumn("n_copies", F.count(F.lit(1)).over(w))
        .withColumn("__rn", F.row_number().over(w.orderBy(id_col)))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_against_corpus(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str,
    broadcast: bool = False,
) -> DataFrame:
    """Incremental ingest dedup: drop ``batch`` rows whose normalized-text
    fingerprint already exists in ``corpus`` — the batch form of streaming
    cross-batch dedup, and the standard shape for appending a new crawl to
    an existing 100 TB corpus. One left-anti equi-join on a fixed-width md5
    key (never the text itself): shuffles hash+id only; ``broadcast=True``
    when the corpus fingerprint set fits in executor memory."""
    from .text import document_fingerprint

    bf = document_fingerprint(batch, text_col, "__fp")
    cf = (
        document_fingerprint(corpus.select(text_col), text_col, "__fp")
        .select("__fp")
        .distinct()
    )
    if broadcast:
        cf = F.broadcast(cf)
    return bf.join(cf, "__fp", "left_anti").drop("__fp")


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected edge list → ``(node, cluster)``
    with ``cluster = min node id in the component`` — the step that turns
    near-dup PAIRS into dedup CLUSTERS (pick one canonical doc per cluster).

    Min-label propagation to fixpoint: each iteration joins labels across
    edges and takes ``min`` per node — one key-partitioned shuffle per
    iteration, converging in O(component diameter) rounds (near-dup
    clusters are near-cliques, so 2-3 rounds in practice; ``max_iter``
    bounds pathological chains). Each round ``localCheckpoint``s to sever
    the growing lineage — the standard pattern for iterative DataFrame
    algorithms. At extreme graph sizes swap in large-star/small-star
    (Kiveris et al., SoCC'14) — same interface, fewer rounds.
    """
    # materialize the edge list ONCE: every iteration's joins would
    # otherwise re-run the full upstream pipeline (LSH + exact verify)
    # per action through lineage recompute
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("cluster", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = sym.join(
            labels, sym.b == labels.node
        ).select(F.col("a").alias("node"), "cluster")
        new_labels = (
            labels.union(neigh)
            .groupBy("node")
            .agg(F.min("cluster").alias("cluster"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def neardup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    broadcast_verify: bool = False,
) -> DataFrame:
    """Full near-dup dedup pipeline: MinHash-LSH candidates → exact-Jaccard
    verified pairs → connected components. Returns ``(id, cluster)`` for
    every document participating in a near-dup cluster; keeping
    ``id == cluster`` rows (plus all unclustered docs) is the canonical
    dedup selection."""
    pairs = minhash_neardup_pairs(
        df, id_col, text_col, num_hashes, bands, shingle_n, threshold,
        broadcast_verify,
    )
    return connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias(id_col), "cluster"
    )


def normalized_text(col, lowercase: bool = True):
    """Whitespace-collapsed (and optionally lowercased) text — the usual
    normalization applied before exact-hash dedup."""
    c = F.regexp_replace(F.trim(col), r"\s+", " ")
    return F.lower(c) if lowercase else c


def _spread(df: DataFrame, key: str = None) -> DataFrame:
    """Spread a narrow input (one small file = one scan partition) to the
    session's default parallelism so downstream hashing parallelizes.
    Shared by the shingle/signature builders — one place to swap in a
    cheaper partition-count probe later.

    ``key``: hash-repartition on this column instead of round-robin — a
    deterministic row→partition mapping, so the exchange skips the local
    sort every keyless ``repartition(n)`` pays for retry reproducibility
    (guide §2.5) and stays safe under task retries. Callers pass their
    unique id column; keyless callers keep round-robin."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        if key is not None:
            return df.repartition(parallelism, F.col(key))
        return df.repartition(parallelism)
    return df


def _band_rows(num_hashes: int, bands: int) -> int:
    """Rows per LSH band, validated: ``num_hashes`` must split evenly into
    ``bands`` — a remainder's signature positions would be computed,
    shuffled, and silently never banded, quietly de-calibrating the
    documented collision probability (bands of ``num_hashes/bands`` rows)
    while ``est_jaccard`` still divides by the full ``num_hashes``."""
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes={num_hashes} must be a positive multiple of "
            f"bands={bands}: equal-rows bands are what calibrate the LSH "
            "collision probability"
        )
    return num_hashes // bands


# ---------------------------------------------------------------------------
# shingling (shared by minhash / jaccard)
# ---------------------------------------------------------------------------

def word_shingles(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Adds ``shingles: array<string>`` — distinct word n-grams, computed
    entirely JVM-side.

    Implementation note: built as a chain of ``zip_with`` over shifted slices
    of the word array — each element is touched O(n) times. The obvious
    ``transform(sequence(...), i -> slice(words, i+1, n))`` form re-evaluates
    its argument per index (O(words²) per doc — measured 3.5× slower even
    after hoisting the split)."""
    expr = "__ws"
    for j in range(2, n + 1):
        expr = (
            f"zip_with({expr}, slice(__ws, {j}, size(__ws)), "
            "(a, b) -> CASE WHEN a IS NULL OR b IS NULL THEN NULL "
            "ELSE concat(a, ' ', b) END)"
        )
    return (
        df.withColumn("__ws", F.split(F.trim(F.col(text_col)), r"\s+"))
        .withColumn(
            "shingles", F.array_distinct(F.expr(f"filter({expr}, x -> x IS NOT NULL)"))
        )
        .drop("__ws")
    )


def duplicated_ngram_ratio(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Per-document duplication pressure: the fraction of a doc's distinct
    word ``n``-grams that also appear in at least one OTHER document — the
    RefinedWeb/MassiveText-style signal for ranking documents by how much
    boilerplate/duplicated content they carry (dedup the high-ratio tail
    first; a 1.0 ratio is a near-copy of the corpus).

    Output ``(id_col, n_ngrams, n_dup, dup_ratio)``; docs with fewer than
    ``n`` words have no n-grams and drop out.

    Scale shape: one shingle explode → one hash aggregate on the n-gram
    (document frequency) → join back on the n-gram key → per-doc aggregate.
    Every exchange is on a key; the ratio is a single double division.
    """
    sh = word_shingles(df.select(F.col(id_col), F.col(text_col)), text_col, n)
    pairs = sh.select(F.col(id_col), F.explode("shingles").alias("__g"))
    # (doc, g) pairs are distinct (word_shingles dedups per doc), so the
    # per-gram row count IS its document frequency
    dfreq = pairs.groupBy("__g").agg(F.count(F.lit(1)).alias("__df_g"))
    return (
        pairs.join(dfreq, "__g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum((F.col("__df_g") >= 2).cast("bigint")).alias("n_dup"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_dup",
            (F.col("n_dup").cast("double") / F.col("n_ngrams")).alias(
                "dup_ratio"
            ),
        )
    )


def word_shingle_hashes(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Adds ``shingle_hashes: array<bigint>`` — distinct 64-bit hashes of the
    word n-grams, never materializing the n-gram strings: each word is
    xxhash64'd once, then consecutive hashes fold pairwise
    (``xxhash64(acc, next)`` inside ``zip_with``). Order-sensitive (unlike a
    commutative mix), collision odds ~2^-64 per pair. This is the shingle
    representation the join/minhash stages should consume — the shuffle and
    hash work is O(words · n) over fixed-width longs instead of re-walking
    concatenated strings."""
    expr = "__wh"
    for j in range(2, n + 1):
        expr = f"zip_with({expr}, slice(__wh, {j}, size(__wh)), (a, b) -> xxhash64(a, b))"
    n_words = f"size(__wh) - {n - 1}"
    return (
        df.withColumn("__wh", F.expr(
            f"transform(split(trim({text_col}), '\\\\s+'), w -> xxhash64(w))"
        ))
        .withColumn(
            "shingle_hashes",
            F.array_distinct(F.expr(f"slice({expr}, 1, greatest({n_words}, 0))")),
        )
        .drop("__wh")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (exact, bucket-joined on shared shingles)
# ---------------------------------------------------------------------------

def _shingle_schema(df: DataFrame, id_col: str, with_sig: bool = False):
    from pyspark.sql import types as T

    fields = [
        T.StructField("doc", df.schema[id_col].dataType, True),
        T.StructField("sh", T.ArrayType(T.LongType()), True),
        T.StructField("n", T.IntegerType(), True),
    ]
    if with_sig:
        fields.append(T.StructField("sig", T.ArrayType(T.LongType()), True))
    return T.StructType(fields)


def _sized_shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Per-doc sorted shingle-hash array + its size — the shared input of
    candidate generation (prefix/LSH) and exact verification. A
    single-partition input (one small file) is spread first so the hashing
    parallelizes.

    Stays the JVM expression pipeline: an equivalent vectorized numpy
    formulation exists (``_nphash.sized_shingle_batches``, bit-identical —
    the r15 parity tests pin it) and wins when fused with the minhash
    signature (see ``minhash_neardup_pairs``), but for THIS table alone it
    measured a wash on compute (0.54 s both ways at sf0.1 quiet) while
    adding one Python-boundary latency per SUBTREE RE-EVALUATION — the
    prefix join and the verify evaluate this plan up to 4×, concurrently,
    and the JVM re-evals are free of that latency (full neardup 1.53 s JVM
    vs 1.94 s numpy). Measured, not assumed — guide §1.1."""
    return _sized_shingle_table_jvm(df, id_col, text_col, n)


def _sized_shingle_table_np(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """The vectorized numpy formulation of ``_sized_shingle_table``
    (one ``mapInArrow`` pass, ``_nphash``) — bit-identical output, pinned
    by the r15 parity tests; fused with the signature computation inside
    ``minhash_neardup_pairs`` where it is the measured win."""
    from ._nphash import sized_shingle_batches

    src = _spread(df.select(id_col, text_col), key=id_col)

    def body(it):
        yield from sized_shingle_batches(it, n)

    return src.mapInArrow(body, _shingle_schema(df, id_col))


def _sized_shingle_table_jvm(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """The JVM expression formulation of ``_sized_shingle_table`` — the
    parity reference for the vectorized path."""
    src = _spread(df.select(id_col, text_col), key=id_col)
    return (
        word_shingle_hashes(src, text_col, n)
        .select(
            F.col(id_col).alias("doc"),
            F.array_sort("shingle_hashes").alias("sh"),
            F.size("shingle_hashes").alias("n"),
        )
        .filter(F.col("n") > 0)
    )


def _exact_jaccard_verify(
    cand: DataFrame,
    sized: DataFrame,
    threshold: float,
    broadcast: bool = False,
) -> DataFrame:
    """Exact Jaccard on candidate pairs only: ``|A∩B|`` via
    ``array_intersect`` (JVM-side) against the sized shingle table, then the
    threshold filter. ``cand`` needs columns (doc_a, doc_b)."""
    # NOTE (r15): the candidate set is BYTES-small but each row's verify is
    # array_intersect over two shingle arrays — the most expensive per-row
    # work in the pipeline. It parallelizes through the PARTITIONING OF THE
    # CANDIDATE LINEAGE: with `_spread(key=id_col)` upstream, the candidate
    # join's stream side is hash-partitioned by doc_a, which satisfies the
    # distinct's clustering requirement — the distinct runs exchange-free
    # and the verify pipelines in the same 32-way stage. (An explicit
    # repartition here was tried and measured 0.3 s SLOWER: it re-adds an
    # exchange + an AQE stage the keyed lineage had eliminated.)
    sa = sized.select(
        F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("n").alias("n_a")
    )
    sb = sized.select(
        F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("n").alias("n_b")
    )
    if broadcast:
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    broadcast_verify: bool = False,
) -> DataFrame:
    """Exact word-``n``-gram Jaccard similarity for every pair of documents
    sharing at least one shingle; returns pairs with ``jaccard >= threshold``.

    Plan shape — the canonical prefix-filtered exact set-similarity join
    (PPJoin-style), in the hash domain (see ``word_shingle_hashes``):

    1. per doc: globally-sorted array of shingle hashes + its size ``n``;
    2. **prefix filter**: only the first ``n - ceil(t·n) + 1`` hashes are
       exploded into the candidate join — any pair with ``J >= t`` provably
       shares a prefix element under a global sort order, so no qualifying
       pair is lost while the join input shrinks by ~t;
    3. **length filter** inside the join condition (``t·|A| <= |B|`` both
       ways) — a pair whose sizes differ by more than t can never qualify;
    4. **exact verify** on the distinct candidate pairs only:
       ``|A∩B|`` via ``array_intersect`` (JVM-side), then
       ``|A∩B| / (|A| + |B| - |A∩B|)``.

    Candidates are bounded by prefix co-occurrence (≪ all shingle
    co-occurrence), never a cross join; rows of ``df`` must be unique per
    ``id_col``. A hash collision (~2^-64 per pair) is the only deviation
    from string-exactness — far below at-scale concern.

    ``broadcast_verify=True`` broadcasts the per-doc sorted-hash table into
    the two verify joins — right when the corpus's shingle arrays fit in
    executor memory (measured ~2× on a 5k-doc corpus); leave False at real
    scale, where the verify stays a key-partitioned shuffle join.
    """
    sized = _sized_shingle_table(df, id_col, text_col, n).persist()
    prefix_len = (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1).cast("int")
    pre = sized.select(
        "doc", "n", F.explode(F.slice("sh", F.lit(1), prefix_len)).alias("p")
    )
    a, b = pre.alias("a"), pre.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p"))
            & (F.col("a.doc") < F.col("b.doc"))
            & (F.col("a.n") >= threshold * F.col("b.n"))
            & (F.col("b.n") >= threshold * F.col("a.n")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    result = _exact_jaccard_verify(cand, sized, threshold, broadcast_verify)
    return _unpersist_with(result, sized)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """Adds ``signature: array<bigint>`` — ``num_hashes`` independent minhash
    values per document, as hash-family member ``xxhash64(i, shingle)``.

    Implementation note: explode shingle HASHES (fixed-width longs, see
    ``word_shingle_hashes`` — the n-gram strings are never built) → ONE
    hash-aggregate with ``num_hashes`` codegen'd ``min(xxhash64(i, h))``
    columns (map-side partial min, one shuffle on the id); each family
    member hashes 2 longs, not a multi-word string. Higher-order
    ``array_min(transform(...))`` formulations run interpreted per element
    and measured 5-200× slower. A single-partition input (one small file)
    is spread first so the hashing parallelizes."""
    df = _spread(df, key=id_col)
    sh = word_shingle_hashes(df, text_col, shingle_n)
    other_cols = [c for c in df.columns if c != text_col]
    ex = sh.select(*other_cols, F.explode("shingle_hashes").alias("__shingle"))
    agg = ex.groupBy(*other_cols).agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("__shingle"))).alias(f"__h{i}")
            for i in range(num_hashes)
        ]
    )
    return agg.select(
        *other_cols,
        F.array(*[f"__h{i}" for i in range(num_hashes)]).alias("signature"),
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    min_est_jaccard: float = 0.8,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs.

    banding: signature split into ``bands`` bands of ``num_hashes/bands``
    rows; documents colliding in ANY band become candidates (equi-join on
    ``(band_id, band_hash)``); the estimated Jaccard is the fraction of equal
    signature positions (``zip_with`` + ``aggregate``, JVM-side).
    """
    rows = _band_rows(num_hashes, bands)
    # persist: the signature column feeds `bands` band-hash expressions AND
    # both sides of the candidate self-join; without a materialization
    # barrier, projection collapse would recompute the minhash per use.
    sig = (
        minhash_signatures(
            df.select(id_col, text_col), id_col, text_col, num_hashes, shingle_n
        )
        .select(F.col(id_col).alias("doc"), "signature")
        .persist()
    )
    banded = sig.select(
        "doc",
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.hash(F.slice("signature", b * rows + 1, rows)).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc", "signature", "band.band_id", "band.band_hash")

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(num_hashes)
    result = (
        cand.withColumn("est_jaccard", est.cast("double"))
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .select("doc_a", "doc_b", "est_jaccard")
    )
    return _unpersist_with(result, sig)


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    broadcast_verify: bool = False,
) -> DataFrame:
    """MinHash-LSH candidate generation + EXACT Jaccard verification — the
    production near-dup pipeline, and (unlike raw candidates) an
    oracle-checkable result: with ``bands`` tuned so a pair at ``threshold``
    collides in ≥1 band with probability ≈ 1 (here 16 bands of 4 rows →
    miss ≈ 2·10⁻⁴ at J=0.8, ≈ 10⁻²³ at J=0.99), the emitted set equals the
    exact all-pairs Jaccard join while candidate generation stays an
    equi-join on (band_id, band_hash).

    One pass builds the sorted shingle-hash table; the minhash signature is
    derived from it (explode → ``num_hashes`` codegen'd min-aggregates, one
    shuffle on the doc id) and the verify stage reuses the same table —
    shingling runs once, not twice.
    """
    from ._nphash import sized_shingle_batches

    rows = _band_rows(num_hashes, bands)
    src = _spread(df.select(id_col, text_col), key=id_col)

    def body(it):
        yield from sized_shingle_batches(it, shingle_n, num_hashes)

    # ONE vectorized pass computes the sorted shingle table AND the minhash
    # signature per doc (_nphash — bit-identical to the former explode +
    # num_hashes min-aggregates, but with no explode, no signature shuffle,
    # and no duplicate evaluation across the self-join/verify subtrees:
    # the persisted table carries everything each side needs)
    sized = src.mapInArrow(
        body, _shingle_schema(df, id_col, with_sig=True)
    ).persist()
    banded = sized.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.hash(
                            F.slice("sig", b * rows + 1, rows)
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc", "band.band_id", "band.band_hash")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    result = _exact_jaccard_verify(cand, sized, threshold, broadcast_verify)
    return _unpersist_with(result, sized)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    portable_hash: bool = False,
) -> DataFrame:
    """Adds ``simhash: bigint`` — the classic Charikar fingerprint: each token
    hashes to ``bits`` bits; bit *b* of the fingerprint is 1 iff the sum of
    ±1 contributions over tokens is positive. One explode + one groupBy(id)
    with ``bits`` conditional sums, all codegen'd.

    ``portable_hash=True`` hashes tokens as the first 60 bits of md5 instead
    of ``xxhash64`` — bit-identical in any engine with md5 (used by the
    correctness oracle, which replicates the whole pipeline in SQL); pass
    ``bits<=60`` with it. Default stays xxhash64 (faster, 64 full bits)."""
    src = _spread(df.select(id_col, text_col), key=id_col)
    tok_hash = (
        F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 15), 16, 10).cast(
            "bigint"
        )
        if portable_hash
        else F.xxhash64("tok")
    )
    toks = src.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("h", tok_hash)
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    fp = None
    for b in range(bits):
        term = F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("bigint"), b)
        ).otherwise(F.lit(0).cast("bigint"))
        fp = term if fp is None else fp + term
    return agg.select(F.col(id_col), fp.alias("simhash"))


def banded_hamming_pairs(
    fps: DataFrame,
    hash_col: str,
    bits: int,
    bands: int,
    max_hamming: int,
) -> DataFrame:
    """Shared banded-LSH Hamming pair engine: ``fps`` is ``(doc,
    <hash_col>)``; the fingerprint is split into ``bands`` chunks, pairs
    sharing any (band, chunk) become candidates via ONE equi-join (never
    the all-pairs product), and exact ``bit_count(xor)`` verifies.
    Returns ``(doc_a, doc_b, hamming)`` with ``doc_a < doc_b``.

    Recall contract (pigeonhole): COMPLETE for pairs with Hamming ≤
    bands-1 — such a pair always shares an untouched band. Pairs beyond
    that are found only if some band happens to match (the documented
    bounded-recall stance of ``simhash_neardup_pairs``). Used by both
    the simhash text fingerprint and the perceptual-hash media
    fingerprint — one copy of the plan shape."""
    if not 1 <= bands <= bits:
        raise ValueError(f"bands must be in [1, {bits}], got {bands}")
    if max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    width = bits // bands
    mask = (1 << width) - 1
    banded = fps.select(
        "doc",
        hash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftrightunsigned(hash_col, b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc", hash_col, "band.band_id", "band.chunk")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(
                F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}"))
            )
            .cast("int")
            .alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
    portable_hash: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the fingerprint into ``bands`` chunks
    (pigeonhole: distance ≤ bands-1 guarantees one identical chunk), equi-join
    on (band, chunk), verify with exact Hamming distance (``bit_count``)."""
    fps = simhash_fingerprints(df, id_col, text_col, bits, portable_hash).select(
        F.col(id_col).alias("doc"), "simhash"
    )
    return banded_hamming_pairs(fps, "simhash", bits, bands, max_hamming)


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 6,
    shingle_n: int = 3,
    threshold: float = 0.8,
    broadcast_verify: bool = False,
) -> DataFrame:
    """SimHash candidate generation + EXACT Jaccard verification: precision
    is exact (every emitted pair truly has ``jaccard >= threshold``) but
    recall is bounded by the banding — simhash Hamming distance of a pair at
    J=0.8 routinely exceeds the pigeonhole guarantee (observed up to 9/64 on
    the test corpus), so pairs can be missed. Use ``minhash_neardup_pairs``
    when Jaccard-calibrated recall matters; simhash's advantage is the
    constant-size per-doc state (one bigint, no signature array)."""
    cand = simhash_candidate_pairs(
        df, id_col, text_col, bits, bands, max_hamming
    ).select("doc_a", "doc_b")
    sized = _sized_shingle_table(df, id_col, text_col, shingle_n).persist()
    result = _exact_jaccard_verify(cand, sized, threshold, broadcast_verify)
    return _unpersist_with(result, sized)


def dedup_keep_best(
    df: DataFrame,
    key_cols: List[str],
    order_cols: List[Column],
    payload_cols: List[str],
) -> DataFrame:
    """Exact dedup with an explicit winner policy: one row per ``key_cols``
    group, the row minimizing the ``order_cols`` tuple (e.g. source
    priority then id — "prefer the curated copy of this text"), plus
    ``n_copies``.

    ONE aggregate of ``min(struct(order..., payload...))`` — struct min is
    lexicographic, so the winner is chosen with map-side partial
    aggregation (SortAggregate: struct buffers aren't fixed-width) and no
    window shuffle of the full payload.
    """
    ordered = [c.alias(f"__o{i}") for i, c in enumerate(order_cols)]
    w = F.min(F.struct(*ordered, *[F.col(c) for c in payload_cols])).alias("__w")
    out = df.groupBy(*key_cols).agg(w, F.count(F.lit(1)).alias("n_copies"))
    return out.select(
        *key_cols,
        *[F.col(f"__w.{c}").alias(c) for c in payload_cols],
        "n_copies",
    )

def fuzzy_dedup_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    broadcast_verify: bool = False,
) -> DataFrame:
    """End-to-end fuzzy dedup: the input corpus MINUS near-duplicates —
    the SlimPajama/BigCode pipeline as one operator. MinHash-LSH
    candidates → exact-Jaccard verify → connected components → keep the
    min-id document of every cluster plus every unclustered document.

    Returns the kept rows with all input columns. The join against the
    cluster assignment is on the id key; cluster labels are tiny relative
    to the corpus (only docs participating in a near-dup pair), so at
    100 TB the removal join broadcasts.
    """
    clusters = neardup_clusters(
        df, id_col, text_col, num_hashes, bands, shingle_n, threshold,
        broadcast_verify,
    )
    losers = clusters.filter(F.col(id_col) != F.col("cluster")).select(id_col)
    return df.join(F.broadcast(losers), id_col, "left_anti")


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: drop training documents sharing at least
    ``min_hits`` distinct word ``n``-grams with the benchmark corpus (the
    GPT-3/PaLM 13-gram rule). Returns the CLEAN training rows, all
    columns intact.

    Plan shape: both sides explode to per-doc DISTINCT shingles (the same
    prefix dedup as the contamination report), one string equi-join
    against the benchmark's distinct shingle set, per-doc hit count, then
    a broadcast left-anti of the contaminated id list. The benchmark's
    distinct shingles are the small side at 100 TB — eval sets are
    megabytes against terabytes of training text — so the join broadcasts
    and the training corpus is never reshuffled.
    """
    t_sh = word_shingles(
        train.select(F.col(id_col), F.col(text_col)), text_col, n
    ).select(F.col(id_col), F.explode("shingles").alias("__g"))
    b_sh = (
        word_shingles(bench.select(F.col(text_col)), text_col, n)
        .select(F.explode("shingles").alias("__g"))
        .distinct()
    )
    hits = (
        t_sh.join(F.broadcast(b_sh), "__g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__hits"))
        .filter(F.col("__hits") >= min_hits)
        .select(id_col)
    )
    return train.join(F.broadcast(hits), id_col, "left_anti")

def build_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """The at-rest fuzzy-dedup index: one row per document carrying its
    minhash ``signature`` (array<bigint>, for LSH candidate banding) and
    its distinct ``shingle_hashes`` (array<bigint>, for exact-Jaccard
    verification) — publish this once, and every future batch dedups
    against the corpus WITHOUT recomputing anything over it. The index is
    O(docs) rows of fixed-ish width (num_hashes longs + shingle hashes);
    at 100 TB the text never needs to be read again for dedup.

    Shingles are computed ONCE (persisted) and feed both columns; the
    signature aggregate is the same codegen'd min-of-xxhash64 shape as
    ``minhash_signatures``.
    """
    sh = (
        word_shingle_hashes(
            df.select(id_col, text_col), text_col, shingle_n
        )
        .select(id_col, "shingle_hashes")
        .persist()
    )
    ex = sh.select(id_col, F.explode("shingle_hashes").alias("__s"))
    sig = ex.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("__s"))).alias(f"__h{i}")
            for i in range(num_hashes)
        ]
    ).select(
        id_col,
        F.array(*[f"__h{i}" for i in range(num_hashes)]).alias("signature"),
    )
    out = sh.join(sig, id_col).select(id_col, "signature", "shingle_hashes")
    return _unpersist_with(out, sh)


def fuzzy_dedup_incremental(
    new_df: DataFrame,
    index_df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Incremental fuzzy dedup against an indexed corpus: keep the rows of
    ``new_df`` that near-duplicate NOTHING in ``index_df`` (a
    ``build_minhash_index`` table, typically fetched from storage). The
    production shape of continuous corpus ingestion: the existing corpus
    costs zero text reads and zero recompute per batch — candidates come
    from ONE (band_id, band_hash) equi-join between the new batch's bands
    and the stored signatures' bands, then exact Jaccard over the stored
    shingle-hash sets verifies (array_intersect on fixed-width longs).

    Both banding and verification use the same hash family as the batch
    pipeline (``minhash_neardup_pairs``), so AGAINST THE INDEX the two
    agree exactly, up to LSH's standard near-threshold recall trade.

    Boundary (deliberate): the new batch is screened against the INDEX
    only — two near-duplicates that are both new to the corpus BOTH
    survive this call. That is the right unit cost for a streaming ingest
    (one equi-join against stored bands, no batch self-join); when
    within-batch duplicates matter, run ``fuzzy_dedup_corpus`` over the
    batch first and feed its survivors here — the composition then equals
    re-running the batch pipeline over the union.
    """
    rows = _band_rows(num_hashes, bands)

    def banded(d, idn):
        return d.select(
            F.col(id_col).alias(idn),
            F.col("shingle_hashes").alias(f"__sh_{idn}"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_id"),
                            F.hash(
                                F.slice("signature", b * rows + 1, rows)
                            ).alias("band_hash"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("__band"),
        ).select(
            idn, f"__sh_{idn}", "__band.band_id", "__band.band_hash"
        )

    new_idx = build_minhash_index(
        new_df.select(id_col, text_col), id_col, text_col, num_hashes, shingle_n
    )
    nb = banded(new_idx, "__nid")
    cb = banded(index_df, "__cid")
    cand = (
        nb.join(cb, ["band_id", "band_hash"])
        .dropDuplicates(["__nid", "__cid"])
    )
    a, b = F.col("__sh___nid"), F.col("__sh___cid")
    inter = F.size(F.array_intersect(a, b))
    jac = inter / (F.size(a) + F.size(b) - inter)
    dirty = (
        cand.filter(jac.cast("double") >= threshold)
        .select(F.col("__nid").alias(id_col))
        .distinct()
    )
    return new_df.join(F.broadcast(dirty), id_col, "left_anti")


def corpus_overlap(
    df: DataFrame,
    group_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """Pairwise corpus-overlap report: for every pair of groups (sources,
    dumps, dataset versions), the EXACT shingle-set Jaccard and the
    MinHash estimate of it, side by side — the mixture-design diagnostic
    run before committing to a source blend ("how much of source B is
    already in source A?"), and a live calibration of the same MinHash
    machinery the document-level dedup relies on.

    Output: ``(src_a, src_b, n_a, n_b, n_common, exact_jaccard,
    est_jaccard)``, one row per unordered group pair (``src_a < src_b``),
    including zero-overlap pairs. Hashing is md5-derived (engine-portable,
    so a SQL oracle replays the estimate bit-for-bit — xxhash64 would not
    be), and both Jaccards are one float division at the edge.

    Scale shape: the corpus collapses to a distinct ``(group, shingle)``
    table (keyed aggregate — the heavy step, linear in corpus shingles);
    exact intersection is an equi-join ON THE SHINGLE key of that
    deduplicated table (never doc×doc); signatures are ``num_hashes``
    partial min-aggregates in one pass, yielding one row per group — the
    pair spine is a broadcast join of two O(groups) frames. Group count,
    not corpus size, bounds everything after the distinct.
    """
    groups = df.select(F.col(group_col).alias("__g")).distinct()
    sh = (
        word_shingles(df.select(group_col, text_col), text_col, shingle_n)
        .select(
            F.col(group_col).alias("__g"), F.explode("shingles").alias("__s")
        )
        .distinct()
        .persist()
    )
    sizes = sh.groupBy("__g").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.__s") == F.col("b.__s"))
            & (F.col("a.__g") < F.col("b.__g")),
        )
        .groupBy(
            F.col("a.__g").alias("src_a"), F.col("b.__g").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )

    def _h(i: int):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), F.col("__s"))), 1, 15
                ),
                16,
                10,
            ).cast("bigint")
        )

    mh = sh.groupBy("__g").agg(
        *[F.min(_h(i)).alias(f"__h{i}") for i in range(num_hashes)]
    )
    eq = sum(
        (F.col(f"ma.__h{i}") == F.col(f"mb.__h{i}")).cast("int")
        for i in range(num_hashes)
    )
    # the pair spine comes from ALL groups — a group whose docs are all
    # shorter than shingle_n words has no shingles (and no signature) but
    # must still appear in the report, as zero-overlap rows
    spine = (
        groups.alias("ga")
        .join(F.broadcast(groups.alias("gb")), F.col("ga.__g") < F.col("gb.__g"))
        .select(
            F.col("ga.__g").alias("src_a"), F.col("gb.__g").alias("src_b")
        )
    )
    pairs = (
        spine.join(
            F.broadcast(mh.alias("ma")),
            F.col("src_a") == F.col("ma.__g"),
            "left",
        )
        .join(
            F.broadcast(mh.alias("mb")),
            F.col("src_b") == F.col("mb.__g"),
            "left",
        )
        .select(
            "src_a",
            "src_b",
            F.when(
                F.col("ma.__h0").isNotNull() & F.col("mb.__h0").isNotNull(),
                eq.cast("double") / F.lit(num_hashes),
            )
            .otherwise(F.lit(0.0))
            .alias("est_jaccard"),
        )
    )
    n_common = F.coalesce(F.col("n_common"), F.lit(0))
    denom = F.col("n_a") + F.col("n_b") - n_common
    result = (
        pairs.join(F.broadcast(inter), ["src_a", "src_b"], "left")
        .join(
            F.broadcast(sizes.withColumnRenamed("__g", "src_a")
                        .withColumnRenamed("n_sh", "n_a")),
            "src_a",
            "left",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("__g", "src_b")
                        .withColumnRenamed("n_sh", "n_b")),
            "src_b",
            "left",
        )
        .select(
            "src_a",
            "src_b",
            F.coalesce(F.col("n_a"), F.lit(0)).alias("n_a"),
            F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b"),
            n_common.alias("n_common"),
            F.when(denom > 0, n_common.cast("double") / denom)
            .otherwise(F.lit(0.0))
            .alias("exact_jaccard"),
            "est_jaccard",
        )
    )
    return _unpersist_with(result, sh)


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.9,
    broadcast_verify: bool = False,
) -> DataFrame:
    """Asymmetric set-containment near-dup: pairs where the SMALLER
    document's word-``n``-gram set is ``threshold``-contained in the
    larger's (``|A∩B| / |A| >= t`` with ``|A| <= |B|``) — the
    sub-document duplicate case symmetric Jaccard structurally misses (a
    paragraph quoted inside a 100× larger page has J ≈ 0.01 but
    containment 1.0; quote farms and wrapper pages are exactly this).

    Output: ``(doc_small, doc_big, n_small, n_big, n_common,
    containment)`` for qualifying pairs; equal-size pairs orient by id.

    Plan shape — the prefix-filter argument adapts from Jaccard
    (``ngram_jaccard_pairs``) to containment: if ``|A∩B| >= t·|A|``, fewer
    than ``|A| − t·|A| + 1`` of A's globally-sorted shingle hashes fall
    outside B, so A explodes only its first ``|A| − ceil(t·|A|) + 1``
    hashes while the B side indexes ALL its hashes (asymmetric probing —
    there is no length filter to exploit because containment does not
    bound the size ratio). Candidates stay an equi-join on the shingle
    hash; verify is exact ``array_intersect`` on the distinct candidates
    only. At 100 TB the B-side full index is the cost driver — the same
    trade the overlap-join literature (PPJoin's containment variant)
    accepts.
    """
    sized = _sized_shingle_table(df, id_col, text_col, n).persist()
    prefix_len = (
        F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    ).cast("int")
    small = sized.select(
        "doc", "n", F.explode(F.slice("sh", F.lit(1), prefix_len)).alias("p")
    )
    full = sized.select(
        F.col("doc").alias("doc_f"),
        F.col("n").alias("n_f"),
        F.explode("sh").alias("pf"),
    )
    cand = (
        small.join(
            full,
            (F.col("p") == F.col("pf"))
            & (
                (F.col("n") < F.col("n_f"))
                | ((F.col("n") == F.col("n_f")) & (F.col("doc") < F.col("doc_f")))
            ),
        )
        .select(
            F.col("doc").alias("doc_small"), F.col("doc_f").alias("doc_big")
        )
        .distinct()
    )
    sa = sized.select(
        F.col("doc").alias("doc_small"),
        F.col("sh").alias("sh_a"),
        F.col("n").alias("n_small"),
    )
    sb = sized.select(
        F.col("doc").alias("doc_big"),
        F.col("sh").alias("sh_b"),
        F.col("n").alias("n_big"),
    )
    if broadcast_verify:
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    result = (
        cand.join(sa, "doc_small")
        .join(sb, "doc_big")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "containment", F.col("n_common") / F.col("n_small")
        )
        .filter(F.col("containment") >= threshold)
        .select(
            "doc_small", "doc_big", "n_small", "n_big", "n_common",
            "containment",
        )
    )
    return _unpersist_with(result, sized)


def split_leakage_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Cross-split leakage report — the eval-hygiene check run after split
    assignment: near-duplicate document pairs (exact ``n``-gram Jaccard
    ≥ ``threshold``, the ``ngram_jaccard_pairs`` machinery) whose two
    sides landed in DIFFERENT splits. Any row here is an eval document
    whose near-copy sits in train — benchmark contamination created by
    the split itself, invisible to per-corpus dedup.

    Output: ``(doc_a, doc_b, split_a, split_b, jaccard)``, only
    differing-split pairs. Same scale shape as the underlying near-dup
    join (prefix-filtered candidates, exact verify) plus two keyed
    id-joins to attach splits; the split column never enters the
    candidate generation, so the report costs the same as the dedup scan
    it usually rides along with.
    """
    pairs = ngram_jaccard_pairs(
        df.select(F.col(id_col), F.col(text_col)),
        id_col,
        text_col,
        n=n,
        threshold=threshold,
    )
    sa = df.select(
        F.col(id_col).alias("doc_a"), F.col(split_col).alias("split_a")
    )
    sb = df.select(
        F.col(id_col).alias("doc_b"), F.col(split_col).alias("split_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            ~F.col("split_a").eqNullSafe(F.col("split_b"))
        )
        .select("doc_a", "doc_b", "split_a", "split_b", "jaccard")
    )


def cluster_exemplars(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Pick each near-dup cluster's EXEMPLAR — the member most similar to
    the rest (maximum summed Jaccard over the cluster's verified edges;
    ties by id) — instead of the arbitrary min-id the plain dedup keeps.
    The canonical-version selection for near-dup groups where variants
    differ in quality (truncations, boilerplate-wrapped copies, partial
    scrapes): the most-central member is the best-connected one.

    Output: ``(cluster, exemplar, n_members, centrality)`` with
    ``centrality`` = the exemplar's summed edge Jaccard as an
    order-independent ``decimal(28,12)`` sum (hash-stable cross-engine).

    Scale shape: the pair list and components come from the standard
    LSH → verify → label-propagation pipeline; per-doc centrality is one
    keyed aggregate over the incident edges (each edge contributes to
    both endpoints); the per-cluster argmax is a max-struct aggregate —
    no window, no sort, everything keyed on doc or cluster.
    """
    # the LSH-candidate + exact-verify pipeline is the dominant cost and
    # feeds BOTH the components and the centrality aggregate — persist it
    pairs = minhash_neardup_pairs(
        df, id_col, text_col, num_hashes, bands, shingle_n, threshold
    ).persist()
    comp = connected_components(pairs, "doc_a", "doc_b")
    incident = (
        pairs.select(
            F.col("doc_a").alias("node"),
            F.col("jaccard").cast("decimal(28,12)").alias("__j"),
        )
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("node"),
                F.col("jaccard").cast("decimal(28,12)").alias("__j"),
            )
        )
        .groupBy("node")
        .agg(F.sum("__j").alias("__cent"))
    )
    joined = comp.join(incident, "node")
    best = joined.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("__cent").alias("__cmax"),
    )
    # argmax via exact-decimal equality then MIN id: id-type generic
    # (negating the id would break string/hash ids and ANSI mode)
    result = (
        joined.join(best, "cluster")
        .filter(F.col("__cent") == F.col("__cmax"))
        .groupBy("cluster", "n_members", "__cmax")
        .agg(F.min("node").alias("exemplar"))
        .select(
            "cluster",
            "exemplar",
            "n_members",
            F.col("__cmax").cast("double").alias("centrality"),
        )
    )
    return _unpersist_with(result, pairs)
