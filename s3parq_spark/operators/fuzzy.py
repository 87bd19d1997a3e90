"""Fuzzy string matching: edit-distance pair generation at scale.

Typo-level near-duplicate detection (product titles, entity names, OCR'd
text) needs all string pairs within a small Levenshtein distance. The
naive plan is the O(n²) cross join — the one shape that never survives a
100 TB corpus. This module implements the FastSS / deletion-neighborhood
algorithm (Bocek et al., "Fast Similarity Search in Large Dictionaries",
2007) as a pure equi-join:

1. For every distinct string ``s`` emit its deletion neighborhood — ``s``
   itself plus each string obtained by deleting one character. Two strings
   with ``levenshtein ≤ 1`` ALWAYS share a neighborhood member (a
   substitution meets at the both-deleted variant; an insert/delete meets
   at the shorter string itself), so the blocking has zero false
   negatives for distance 1.
2. Equi-join the neighborhoods on a 64-bit ``xxhash64`` of the variant —
   the shuffle carries longs, not strings — and verify survivors with one
   JVM-side ``levenshtein`` call.

Cost: O(n·L) variant rows (L = string length) through one hash-partitioned
equi-join; candidate groups are bounded by the bucket population, never
n². The variant expansion, hashing, join, and verification are all
whole-stage-codegen built-ins — no Python in the pipeline.

The reference engine has no fuzzy-matching surface; this extends the
dedup family (``operators/dedup.py``) to the edit-distance metric the
same way MinHash extends it to Jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_pairs(
    df: DataFrame, col: str, max_distance: int = 1
) -> DataFrame:
    """All distinct-value pairs of ``col`` within ``max_distance`` edits
    (currently distance 1 — the dominant fuzzy-dedup case; deeper
    distances compose by recursing the deletion neighborhood).

    Returns ``(s1, s2)`` with ``s1 < s2``, each pair exactly once.
    """
    if max_distance != 1:
        raise NotImplementedError(
            "edit_distance_pairs implements the depth-1 deletion "
            "neighborhood; recurse the variant expansion for larger radii"
        )
    strings = (
        df.select(F.col(col).alias("s")).filter(F.col("s").isNotNull()).distinct()
    )
    # s itself + every single-character deletion. Spark's sequence(1, 0)
    # DESCENDS, so the empty string must bypass the transform().
    deletions = F.expr(
        "transform(sequence(1, length(s)), "
        "i -> concat(substr(s, 1, i - 1), substr(s, i + 1)))"
    )
    variants = strings.select(
        "s",
        F.explode(
            F.when(F.length("s") == 0, F.array(F.col("s"))).otherwise(
                F.array_union(F.array(F.col("s")), deletions)
            )
        ).alias("__v"),
    ).select("s", F.xxhash64("__v").alias("__vh"))
    a, b = variants.alias("a"), variants.alias("b")
    return (
        a.join(b, "__vh")
        .filter(F.col("a.s") < F.col("b.s"))
        .select(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .distinct()
        # exact verify also discards xxhash64 collisions between variants
        .filter(F.levenshtein("s1", "s2") <= max_distance)
    )
