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

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame,
    keys: List[str],
    id_col: Optional[str] = None,
) -> DataFrame:
    """Exact deduplication on ``keys``.

    With ``id_col``, keeps the row with the MINIMUM id per key group
    (deterministic winner — ``dropDuplicates`` keeps an arbitrary row, which
    is not reproducible across runs) and adds ``n_copies``. This is one
    hash-aggregate: map-side partial min/count, then one shuffle on ``keys``.
    """
    if id_col is None:
        return df.dropDuplicates(keys)
    keep = (
        df.groupBy(*keys).agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
    return keep


def normalized_text(col, lowercase: bool = True):
    """Whitespace-collapsed (and optionally lowercased) text — the usual
    normalization applied before exact-hash dedup."""
    c = F.regexp_replace(F.trim(col), r"\s+", " ")
    return F.lower(c) if lowercase else c


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
    src = df.select(id_col, text_col)
    parallelism = src.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < parallelism:
        src = src.repartition(parallelism)
    sized = (
        word_shingle_hashes(src, text_col, n)
        .select(
            F.col(id_col).alias("doc"),
            F.array_sort("shingle_hashes").alias("sh"),
            F.size("shingle_hashes").alias("n"),
        )
        .filter(F.col("n") > 0)
        .persist()
    )
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
    sa = sized.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("n").alias("n_a"))
    sb = sized.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("n").alias("n_b"))
    if broadcast_verify:
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
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism)
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
    rows = num_hashes // bands
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
    return (
        cand.withColumn("est_jaccard", est.cast("double"))
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .select("doc_a", "doc_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """Adds ``simhash: bigint`` — the classic Charikar fingerprint: each token
    hashes to ``bits`` bits; bit *b* of the fingerprint is 1 iff the sum of
    ±1 contributions over tokens is positive. One explode + one groupBy(id)
    with ``bits`` conditional sums, all codegen'd."""
    src = df.select(id_col, text_col)
    parallelism = src.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < parallelism:
        src = src.repartition(parallelism)
    toks = src.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
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


def simhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the fingerprint into ``bands`` chunks
    (pigeonhole: distance ≤ bands-1 guarantees one identical chunk), equi-join
    on (band, chunk), verify with exact Hamming distance (``bit_count``)."""
    width = bits // bands
    mask = (1 << width) - 1
    fps = simhash_fingerprints(df, id_col, text_col, bits).select(
        F.col(id_col).alias("doc"), "simhash"
    )
    banded = fps.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftrightunsigned("simhash", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc", "simhash", "band.band_id", "band.chunk")
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
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
