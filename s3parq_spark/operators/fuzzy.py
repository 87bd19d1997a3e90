"""Fuzzy string matching: edit-distance pair generation at scale.

Typo-level near-duplicate detection (product titles, entity names, OCR'd
text) needs all string pairs within a small Levenshtein distance. The
naive plan is the O(n²) cross join — the one shape that never survives a
100 TB corpus. This module implements the FastSS / deletion-neighborhood
algorithm (Bocek et al., "Fast Similarity Search in Large Dictionaries",
2007) as a pure equi-join:

1. For every distinct string ``s`` emit its deletion neighborhood
   ``D_k(s)`` — every string obtainable by deleting up to ``k``
   characters. Two strings with ``levenshtein(s, t) ≤ k`` ALWAYS share a
   neighborhood member (each edit is covered by deleting the touched
   character from one or both sides), so the blocking has zero false
   negatives at radius ``k``.
2. Equi-join the neighborhoods on a 64-bit ``xxhash64`` of the variant —
   the shuffle carries longs, not strings — and verify survivors with one
   JVM-side ``levenshtein`` call.

Cost: O(n·L^k) variant rows (L = string length, k = radius) through one
hash-partitioned equi-join; candidate groups are bounded by the bucket
population, never n². Radius 1 and 2 are supported (L² variants per
string at k=2 is the practical ceiling — k=3 multiplies another L and a
phonetic or q-gram blocker is the better tool). The variant expansion,
hashing, join, and verification are all whole-stage-codegen built-ins —
no Python in the pipeline.

The reference engine has no fuzzy-matching surface; this extends the
dedup family (``operators/dedup.py``) to the edit-distance metric the
same way MinHash extends it to Jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _one_char_deletions(v):
    """``array<string>`` of every single-character deletion of ``v``; empty
    array for the empty string (Spark's ``sequence(1, 0)`` DESCENDS, so the
    empty case must never reach the transform)."""
    return F.coalesce(
        F.when(
            F.length(v) > 0,
            F.transform(
                F.sequence(F.lit(1), F.length(v)),
                lambda i: F.concat(
                    v.substr(F.lit(1), i - F.lit(1)),
                    v.substr(i + F.lit(1), F.length(v)),
                ),
            ),
        ),
        F.array().cast("array<string>"),
    )


def edit_distance_pairs(
    df: DataFrame, col: str, max_distance: int = 1
) -> DataFrame:
    """All distinct-value pairs of ``col`` within ``max_distance`` edits
    (1 or 2): the radius-``k`` deletion neighborhood is built by recursing
    the single-deletion expansion ``k`` times, deduplicated per string.

    Returns ``(s1, s2)`` with ``s1 < s2``, each pair exactly once.
    """
    if not 1 <= max_distance <= 2:
        raise NotImplementedError(
            "edit_distance_pairs supports radius 1 or 2; beyond that the "
            "L^k deletion-neighborhood blow-up makes q-gram or phonetic "
            "blocking the right tool"
        )
    strings = (
        df.select(F.col(col).alias("s")).filter(F.col("s").isNotNull()).distinct()
    )
    cur = strings.withColumn("__vars", F.array(F.col("s")))
    for _ in range(max_distance):
        cur = cur.withColumn(
            "__vars",
            F.array_distinct(
                F.array_union(
                    F.col("__vars"),
                    F.flatten(F.transform(F.col("__vars"), _one_char_deletions)),
                )
            ),
        )
    variants = cur.select(
        "s", F.explode("__vars").alias("__v")
    ).select("s", F.xxhash64("__v").alias("__vh"))
    a, b = variants.alias("a"), variants.alias("b")
    return (
        a.join(b, "__vh")
        .filter(F.col("a.s") < F.col("b.s"))
        .select(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        # verify BEFORE the distinct: a string pair sharing many deletion
        # variants (up to ~L² at radius 2) appears once per shared variant,
        # and the cheap JVM levenshtein (also discarding xxhash64 collisions)
        # runs map-side on the join output — so the distinct's exchange
        # carries only true pairs instead of the full candidate stream
        .filter(F.levenshtein("s1", "s2") <= max_distance)
        .distinct()
    )
