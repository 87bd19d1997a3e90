"""Parity pins for the vectorized numpy shingle/minhash pipeline
(`operators/_nphash.py`) against the JVM expression pipeline it replaced:
the r15 optimization is only valid because the two are bit-identical —
same xxhash64 values, same Java split(trim(...), '\\s+') tokenization
(leading/trailing empty tokens included), same signed sort order, same
signature minima."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s3parq_spark.operators.dedup import (
    _sized_shingle_table_jvm,
    _sized_shingle_table_np,
    minhash_neardup_pairs,
    ngram_jaccard_pairs,
)

EDGE_TEXTS = [
    (1, "alpha beta gamma delta"),
    (2, "  alpha   beta\tgamma  "),
    (3, ""),
    (4, "   "),
    (5, "\talpha beta\t"),
    (6, "\t"),
    (7, "one"),
    (8, "one two"),
    (9, "é– 漢字 texte unicode mélangé ünïcôdé"),
    (10, None),
    (11, "a \t b\nc d e"),
    (12, "word " * 50),
    (13, "averyveryverylongword" * 3 + " short tail words here"),
    (14, "\xa0nbsp is not whitespace in java regex"),
    (15, "dup dup dup dup dup"),
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGE_TEXTS, "doc_id bigint, text string")


def _rows(df):
    return sorted(
        (r["doc"], tuple(r["sh"]), r["n"]) for r in df.collect()
    )


def test_xxhash64_primitives_match_spark(spark):
    from s3parq_spark.operators import _nphash as H

    words = ["hello", "", "a", "abcdefgh", "abcdefghi", "é–漢字",
             "x" * 40, "y" * 31, "z" * 32, "w" * 100]
    got = spark.range(1).select(
        *[F.xxhash64(F.lit(w)).alias(f"s{i}") for i, w in enumerate(words)],
        *[F.xxhash64(F.lit(v).cast("bigint")).alias(f"l{i}")
          for i, v in enumerate([0, -1, 12345, 2**62])],
        F.xxhash64(F.lit(7), F.lit(999).cast("bigint")).alias("chain"),
    ).collect()[0]
    for i, w in enumerate(words):
        b = np.frombuffer(w.encode("utf8"), dtype=np.uint8)
        mine = int(np.int64(H.hash_bytes_ranges(
            b, [0], [len(b)], 42)[0]))
        assert mine == got[f"s{i}"], w
    for i, v in enumerate([0, -1, 12345, 2**62]):
        mine = int(np.int64(H.hash_long(np.uint64(np.int64(v)), 42)))
        assert mine == got[f"l{i}"], v
    chain = int(np.int64(H.hash_long(
        np.uint64(999), H.hash_int(7, 42))))
    assert chain == got["chain"]


@pytest.mark.parametrize("n", [2, 3])
def test_sized_shingle_table_matches_jvm(spark, edge_df, n):
    got = _rows(_sized_shingle_table_np(edge_df, "doc_id", "text", n))
    want = _rows(_sized_shingle_table_jvm(edge_df, "doc_id", "text", n))
    assert got == want


def test_sized_shingle_table_matches_jvm_on_corpus(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    got = _rows(_sized_shingle_table_np(docs, "doc_id", "text", 3))
    want = _rows(_sized_shingle_table_jvm(docs, "doc_id", "text", 3))
    assert got == want


def test_minhash_signature_matches_jvm_aggregate(spark, edge_df):
    from s3parq_spark.operators.dedup import _shingle_schema, _spread
    from s3parq_spark.operators._nphash import sized_shingle_batches

    src = _spread(edge_df.select("doc_id", "text"))
    table = src.mapInArrow(
        lambda it: sized_shingle_batches(it, 3, 16),
        _shingle_schema(edge_df, "doc_id", with_sig=True),
    )
    got = {r["doc"]: list(r["sig"]) for r in table.collect()}

    jvm = _sized_shingle_table_jvm(edge_df, "doc_id", "text", 3)
    ex = jvm.select("doc", F.explode("sh").alias("__s"))
    agg = ex.groupBy("doc").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("__s"))).alias(f"h{i}")
            for i in range(16)
        ]
    )
    want = {r["doc"]: [r[f"h{i}"] for i in range(16)]
            for r in agg.collect()}
    assert got == want


def test_neardup_operators_end_to_end_unchanged(spark):
    """The two headline near-dup operators still emit the exact pair set
    with exact jaccard values over the real corpus."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    a = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    )
    b = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in minhash_neardup_pairs(
            docs, "doc_id", "text", threshold=0.8
        ).collect()
    )
    assert a == b
    assert len(a) > 0
